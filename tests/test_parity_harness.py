"""The released-weights parity harness must be runnable today (VERDICT
round 2, next #8): its selftest fabricates a synthetic region + 5-member
.pth quintet through the exporter and runs converter -> evaluator ->
census metrics end-to-end."""

import pytest


@pytest.mark.slow
def test_parity_harness_selftest(capsys):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import parity_released

    parity_released.selftest()
    out = capsys.readouterr().out
    assert "selftest OK" in out
    # VERDICT r3 #8: the selftest matrix must also exercise the --spatial
    # and --quantize int8s inference surfaces
    assert "--spatial surface" in out
    assert "--quantize int8s surface" in out
