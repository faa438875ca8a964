"""Fused Pallas UNet-block kernels == the XLA packed path (interpret mode
on CPU; the same asserts run compiled on the real chip via bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from popcorn_tpu.nn import packed as K
from popcorn_tpu.nn.pallas_conv import fused_double_conv, fused_up_block


def _mk(rng, shape, scale=0.3):
    return jnp.asarray(rng.normal(size=shape), jnp.float32) * scale


@pytest.fixture(scope="module")
def rngk():
    return np.random.default_rng(7)


@pytest.mark.parametrize("f,h,w", [(4, 24, 40), (4, 16, 16), (2, 24, 40), (4, 19, 37)])
def test_fused_double_conv_matches_xla(rngk, f, h, w):
    p = {
        "conv1": {"w": _mk(rngk, (3, 3, 2, 8)), "b": _mk(rngk, (8,), 1.0)},
        "conv2": {"w": _mk(rngk, (3, 3, 8, 8)), "b": _mk(rngk, (8,), 1.0)},
    }
    bn = {
        "bn1": {"scale": _mk(rngk, (8,), 1.0), "shift": _mk(rngk, (8,), 1.0)},
        "bn2": {"scale": _mk(rngk, (8,), 1.0), "shift": _mk(rngk, (8,), 1.0)},
    }
    x = _mk(rngk, (2, h, w, f * f * 2), 1.0)
    ref = K.packed_double_conv(p, bn, x, f, dtype=None)
    got = K.packed_double_conv(p, bn, x, f, dtype=None, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("h,w", [(24, 40), (19, 37)])
def test_fused_up_block_matches_xla(rngk, h, w):
    f, c_skip = 4, 8
    p_up = {
        "tconv": {"w": _mk(rngk, (16, 2, 2, 8)), "b": _mk(rngk, (8,), 1.0)},
        "conv": {
            "conv1": {"w": _mk(rngk, (3, 3, 16, 8)), "b": _mk(rngk, (8,), 1.0)},
            "conv2": {"w": _mk(rngk, (3, 3, 8, 8)), "b": _mk(rngk, (8,), 1.0)},
        },
    }
    bn_up = {
        "bn1": {"scale": _mk(rngk, (8,), 1.0), "shift": _mk(rngk, (8,), 1.0)},
        "bn2": {"scale": _mk(rngk, (8,), 1.0), "shift": _mk(rngk, (8,), 1.0)},
    }
    x1 = _mk(rngk, (1, h, w, 4 * 16), 1.0)  # coarse, packed at f/2
    x2 = _mk(rngk, (1, h, w, 16 * c_skip), 1.0)  # skip, packed at f
    ref = K._packed_up(p_up, bn_up, x1, x2, f, c_skip=c_skip, dtype=None)
    got = K._packed_up(
        p_up, bn_up, x1, x2, f, c_skip=c_skip, dtype=None, use_pallas=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_stream_matches_xla_stream(rngk):
    """The whole packed UNet stream with every block fused == XLA blocks."""
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.init import init_popcorn

    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(2), mcfg)
    f = 4
    x = _mk(rngk, (1, 16, 24, f * f * 2), 1.0)
    ref = K.packed_unet_stream(
        params["unet"]["sar"], consts["unet_bn"]["sar"], x, f, dtype=None
    )
    got = K.packed_unet_stream(
        params["unet"]["sar"], consts["unet_bn"]["sar"], x, f, dtype=None,
        use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_popcorn_forward_pallas_stream_matches(rngk):
    """popcorn_forward with cfg.pallas_stream=True == the XLA packed path
    (exercises the builder score + both streams + the Pallas packed head
    auto-gate following the stream gate)."""
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.init import init_popcorn
    from popcorn_tpu.nn.popcorn import popcorn_forward

    mcfg = ModelConfig(pretrained=False, occupancy_model=True)
    params, consts = init_popcorn(jax.random.PRNGKey(3), mcfg)
    x = _mk(rngk, (1, 64, 64, 6), 1.0)
    inputs = {"input": x}
    ref = popcorn_forward(
        params, consts, inputs, mcfg, train=False, padding=False, sparse=False
    )
    mcfg_p = ModelConfig(
        pretrained=False, occupancy_model=True, pallas_stream=True
    )
    got = popcorn_forward(
        params, consts, inputs, mcfg_p, train=False, padding=False, sparse=False
    )
    np.testing.assert_allclose(
        np.asarray(got["popdensemap"]), np.asarray(ref["popdensemap"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["popcount"]), np.asarray(ref["popcount"]), rtol=2e-4
    )


def test_int8_double_conv_close_to_f32(rngk):
    """int8 W8A8 double conv within quantization error of f32 (per-slab
    dynamic activation scales + per-channel weight scales keep relative
    error at the int8 rounding level)."""
    p = {
        "conv1": {"w": _mk(rngk, (3, 3, 2, 8)), "b": _mk(rngk, (8,), 0.3)},
        "conv2": {"w": _mk(rngk, (3, 3, 8, 8)), "b": _mk(rngk, (8,), 0.3)},
    }
    bn = {
        "bn1": {"scale": 1.0 + _mk(rngk, (8,), 0.2), "shift": _mk(rngk, (8,), 0.3)},
        "bn2": {"scale": 1.0 + _mk(rngk, (8,), 0.2), "shift": _mk(rngk, (8,), 0.3)},
    }
    f = 4
    x = _mk(rngk, (1, 24, 40, f * f * 2), 1.0)
    ref = K.packed_double_conv(p, bn, x, f, dtype=None)
    got = K.packed_double_conv(p, bn, x, f, dtype=None, use_pallas=True,
                               quantized=True)
    scale = float(np.abs(np.asarray(ref)).max())
    err = float(np.abs(np.asarray(got) - np.asarray(ref)).max())
    assert err < 0.05 * scale, f"int8 error {err} vs scale {scale}"
    # correlation of the maps stays ~1
    a, b = np.asarray(ref).ravel(), np.asarray(got).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr


@pytest.mark.slow
def test_int8_popcorn_forward_close(rngk):
    """End-to-end popcorn_forward with cfg.quantize='int8': population
    maps correlate >0.99 with the f32 path and popcount within ~2%."""
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.init import init_popcorn
    from popcorn_tpu.nn.popcorn import popcorn_forward

    mcfg = ModelConfig(pretrained=False, occupancy_model=True)
    params, consts = init_popcorn(jax.random.PRNGKey(3), mcfg)
    x = _mk(rngk, (1, 64, 64, 6), 1.0)
    inputs = {"input": x}
    ref = popcorn_forward(
        params, consts, inputs, mcfg, train=False, padding=False, sparse=False
    )
    mcfg_q = ModelConfig(pretrained=False, occupancy_model=True, quantize="int8")
    got = popcorn_forward(
        params, consts, inputs, mcfg_q, train=False, padding=False, sparse=False
    )
    a = np.asarray(ref["popdensemap"]).ravel()
    b = np.asarray(got["popdensemap"]).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99
    pc_ref = float(ref["popcount"][0])
    pc_got = float(got["popcount"][0])
    assert abs(pc_got - pc_ref) <= 0.03 * max(abs(pc_ref), 1.0), (pc_ref, pc_got)


def test_int8_static_stream_close_to_f32(rngk):
    """STATIC-scale int8 stream (int8 block I/O end-to-end, calibrated
    scales, one fused requant pass per layer) stays within quantization
    error of the f32 XLA stream when calibrated on the same input."""
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.init import init_popcorn

    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(5), mcfg)
    f = 4
    x = _mk(rngk, (1, 16, 24, f * f * 2), 1.0)
    p, bn = params["unet"]["sar"], consts["unet_bn"]["sar"]
    ref = K.packed_unet_stream(p, bn, x, f, dtype=None)
    scales = K.calibrate_packed_stream(p, bn, x, f)
    assert set(scales) == {
        "in", "inc_y1", "inc_out", "down1_y1", "down1_out", "down2_y1",
        "down2_out", "up2_up", "up2_y1", "up2_out", "up1_up", "up1_y1",
    }
    got = K.packed_unet_stream_qs(p, bn, x, f, scales, dtype=None)
    a, b = np.asarray(ref).ravel(), np.asarray(got).ravel()
    scale = float(np.abs(a).max())
    assert float(np.abs(a - b).max()) < 0.08 * scale
    assert np.corrcoef(a, b)[0, 1] > 0.995


def test_int8_static_member_maps_close(rngk):
    """packed_member_maps with calibrated static scales == the f32 member
    maps up to int8 error (the eval-fold integration of 'int8s')."""
    import dataclasses

    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.init import init_popcorn
    from popcorn_tpu.nn.popcorn import (
        calibrate_member_scales,
        packed_member_maps,
    )

    mcfg = ModelConfig(pretrained=False, occupancy_model=True)
    params, consts = init_popcorn(jax.random.PRNGKey(6), mcfg)
    f = 4
    sar_p = _mk(rngk, (1, 16, 24, f * f * 2), 1.0)
    opt_p = _mk(rngk, (1, 16, 24, f * f * 4), 1.0)
    score_p = jnp.abs(_mk(rngk, (1, 16, 24 * f * f), 0.5))
    dense_ref, scale_ref = packed_member_maps(
        params, consts, sar_p, opt_p, f, score_p, mcfg
    )
    scales = calibrate_member_scales(params, consts, sar_p, opt_p, f)
    mcfg_qs = dataclasses.replace(mcfg, quantize="int8s")
    dense_q, scale_q = packed_member_maps(
        params, consts, sar_p, opt_p, f, score_p, mcfg_qs, scales=scales
    )
    a, b = np.asarray(dense_ref).ravel(), np.asarray(dense_q).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99
    s = float(np.abs(a).max())
    assert float(np.abs(a - b).max()) < 0.1 * max(s, 1e-6)
