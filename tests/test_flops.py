"""FLOP accounting (utils/flops.py) pinned against XLA's own cost model.

The analytic ``useful`` counts must match what the plain-layout engine
actually executes (XLA counts the same convs), and the per-engine
``executed`` probes must order as documented: plain ~= useful,
wide < packed (the space-to-depth lift's 16x lane-fill blowup vs the
wide band's (fw+2)/3).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from popcorn_tpu.config import ModelConfig
from popcorn_tpu.data.normalize import NormStats
from popcorn_tpu.nn.init import init_head, init_popcorn
from popcorn_tpu.utils import flops as F


def _setup(layout, h=64, w=64):
    mcfg = ModelConfig(pretrained=True, layout=layout, compute_dtype="float32")
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    params = dict(params)
    params["head"] = init_head(jax.random.PRNGKey(1), biasinit=0.5)
    rng = np.random.default_rng(0)
    batch = {
        "S2": jnp.asarray(rng.uniform(0, 4000, (1, h, w, 4)).astype(np.uint16)),
        "S1": jnp.asarray(rng.uniform(-25, 0, (1, h, w, 2)), jnp.float32),
    }
    return mcfg, params, consts, batch


def test_analytic_matches_xla_plain():
    """Useful (analytic) ~= executed (XLA cost model) for the plain engine.

    Compares the MEMBER pass only: prep's builder auto-selects a lifted
    engine even under layout='plain' (create_building_score), so its
    executed count is deliberately above the analytic useful count.
    """
    h = w = 64
    mcfg, params, consts, batch = _setup("plain", h, w)
    probe = F.eval_executed_probe(mcfg, consts, NormStats(), params, batch)
    if probe is None:
        pytest.skip("backend exposes no cost analysis")
    assert probe["engine"] == "plain"
    useful = F.member_flops_per_px() * h * w
    # XLA counts elementwise work on top of the conv MACs and rates some
    # ops slightly differently; the analytic count is a tight bound.
    assert probe["member"] / useful == pytest.approx(1.0, abs=0.2)


def test_engine_executed_ordering():
    """wide executes fewer FLOPs than packed; both exceed useful."""
    h = w = 64
    stats = NormStats()
    useful_member = F.member_flops_per_px() * h * w
    per_engine = {}
    for layout in ("wide", "packed"):
        mcfg, params, consts, batch = _setup(layout, h, w)
        probe = F.eval_executed_probe(mcfg, consts, stats, params, batch)
        if probe is None:
            pytest.skip("backend exposes no cost analysis")
        assert probe["engine"] == layout
        per_engine[layout] = probe["member"]
    assert useful_member < per_engine["wide"] < per_engine["packed"]
    # the documented ~2-3x executed-FLOP advantage of the wide band over
    # the space-to-depth lift (nn/wide.py module doc)
    assert per_engine["packed"] / per_engine["wide"] > 1.5


def test_eval_patch_flops_scaling():
    one = F.eval_patch_flops(2048, 2048, 1)
    five = F.eval_patch_flops(2048, 2048, 5)
    # builder runs once; members add linearly
    member = F.member_flops_per_px() * 2048 * 2048
    assert five - one == pytest.approx(4 * member, rel=1e-12)
    # headline magnitude: ~0.85 TFLOP per 5-member 2048^2 patch
    assert 0.5e12 < five < 1.5e12


def test_train_step_flops_convention():
    # 3x fwd for the trainable path + 1x builder
    px = 2.0 * 1024 * 1024 * 2
    expected = (3 * F.member_flops_per_px() + F.builder_flops_per_px()) * px / 2
    assert F.train_step_flops(1024, 1024, 2) == pytest.approx(expected)


def test_device_peak_table():
    class D:
        device_kind = "TPU v5 lite"

    assert F.device_peak_flops(D()) == pytest.approx(197e12)
    assert F.device_peak_flops(D(), "int8") == pytest.approx(394e12)

    class C:
        device_kind = "cpu"

    assert F.device_peak_flops(C()) is None


def test_mfu_line():
    line = F.mfu_line(10.0, 1e12, 200e12)
    assert line["tflops"] == pytest.approx(10.0)
    assert line["mfu"] == pytest.approx(0.05)
    assert "mfu" not in F.mfu_line(10.0, 1e12, None)
