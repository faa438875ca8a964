import pytest
"""tools/run_dda_train.py CLI end-to-end on the synthetic DDA manifest."""

import os
import subprocess
import sys

from popcorn_tpu.dda.datasets import make_synthetic_dda_manifest


@pytest.mark.slow
def test_run_dda_train_cli(tmp_path):
    manifest = make_synthetic_dda_manifest(str(tmp_path / "d"), n_labeled=4,
                                           n_unlabeled=2, size=32)
    out = str(tmp_path / "ck")
    r = subprocess.run(
        [sys.executable, "tools/run_dda_train.py", "--manifest", manifest,
         "--epochs", "2", "--labeled-per-batch", "2",
         "--unlabeled-per-batch", "1", "--out", out, "--test"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        timeout=1200,  # hermetic-CPU budget: a hang here means the CLI
        # touched the ambient accelerator (utils.apply_platform_env)
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epoch 1" in r.stdout and "eval:" in r.stdout
    assert os.path.exists(out)
    # --test printed the per-site report (aggregate bucket + all 3 heads)
    assert "test" in r.stdout and "fusion" in r.stdout
    assert "boundary_iou" in r.stdout
