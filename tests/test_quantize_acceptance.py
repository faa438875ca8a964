"""Quantization acceptance bounds (VERDICT round 3 #7, extended r4 #4).

`--quantize int8s` (static-scale W8A8 member fold) trades bit-parity for
speed: on-chip it measured +14% patches/s at map correlation 0.9997 and a
census-level R2 delta of ~0.0008 vs bf16 (PERF_NOTES.md rounds 3-4). This
test pins the acceptance bound so a regression in the quantized kernels
is caught: every census-level R2 (MainCensus and AdjCensus, all levels)
must stay within QUANT_R2_BOUND of the unquantized run on the synthetic
verify region. The bound is documented in README.md.

Round 5 extensions (VERDICT r4 #4):
* `w4a8` — the int8s kernels with int4-grid weights in int8 carriers —
  is held to the SAME bound (v5e's MXU int mode is int8x int8, so w4a8
  cannot be faster; it exists so the trade is measured, not guessed).
* the BUILDER network quantized too (pallas_stream=True routes the
  building extractor through the dynamic-int8 fused kernels) is held to
  the same bound — covering the one network the int8s fold left in bf16.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

QUANT_R2_BOUND = 0.02  # documented bound; on-chip measured delta ~8e-4


@pytest.fixture(scope="module")
def quant_region(tmp_path_factory):
    """Synthetic region + 2 saved members + the unquantized baseline."""
    import jax

    from popcorn_tpu.compat.torch_convert import save_popcorn_checkpoint
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.data.synthetic import make_synthetic_region
    from popcorn_tpu.nn.init import init_popcorn

    import parity_released

    tmp_path = tmp_path_factory.mktemp("quant_acc")
    paths = make_synthetic_region(
        str(tmp_path / "data"), "rwa", height=192, width=256, seed=47
    )
    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(1601), mcfg)
    members = []
    for s in range(2):  # 2 members keep the CPU cost down; fold math is the same
        member = jax.tree.map(lambda x, s=s: x * (1.0 + 0.01 * s), params)
        p = str(tmp_path / f"m{s + 1}.pth")
        save_popcorn_checkpoint(p, member, consts, epoch=s, iteration=s)
        members.append(p)

    kw = dict(paths=paths, patchsize=96, overlap=16, fourseasons=False)
    base = parity_released.evaluate(members, None, "rwa", "coarse", **kw)
    return members, kw, base


def _assert_within_bound(base, quant, tag):
    r2_keys = [k for k in base if k.endswith("/r2")]
    assert any("AdjCensus" in k for k in r2_keys), sorted(base)
    assert any("MainCensus" in k for k in r2_keys), sorted(base)
    for k in r2_keys:
        assert k in quant, f"{tag} run missing metric {k}"
        assert np.isfinite(quant[k]), (k, quant[k])
        delta = abs(quant[k] - base[k])
        assert delta <= QUANT_R2_BOUND, (
            f"{k}: {tag} R2 {quant[k]:.5f} vs bf16 {base[k]:.5f} "
            f"(delta {delta:.5f} > bound {QUANT_R2_BOUND})"
        )


@pytest.mark.slow
@pytest.mark.parametrize(
    "tag,ekw",
    [
        ("int8s", dict(quantize="int8s")),
        ("w4a8", dict(quantize="w4a8")),
        # dynamic-int8 member fold WITH the builder network quantized too
        # (pallas_stream=True is the builder's quantization vehicle,
        # nn/popcorn.py::builder_use_pallas)
        ("int8+qbuilder", dict(quantize="int8", pallas_stream=True)),
    ],
)
def test_census_r2_within_bound(quant_region, tag, ekw):
    import parity_released

    members, kw, base = quant_region
    quant = parity_released.evaluate(members, None, "rwa", "coarse", **ekw, **kw)
    _assert_within_bound(base, quant, tag)
