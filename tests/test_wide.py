"""Wide-lane engine (nn/wide.py) equivalence vs the plain NHWC UNet.

Every op and the full stream/head/builder must match nn.unet / nn.popcorn
numerics up to float summation order (f32, rtol ~1e-5) — the same
contract tests/test_packed.py pins for the space-to-depth engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from popcorn_tpu.nn import wide as W
from popcorn_tpu.nn.init import (
    init_dual_stream,
    init_dual_stream_bn,
    init_head,
    init_stream,
    init_stream_bn,
)
from popcorn_tpu.nn.ops import conv3x3, conv_transpose_2x2, max_pool_2x2
from popcorn_tpu.nn.unet import building_logits, dual_stream_features, unet_stream

RTOL = 2e-5
ATOL = 1e-5


def _x(rng, b, h, w, c):
    return jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))


def test_wpack_roundtrip(rng):
    x = _x(rng, 2, 8, 64, 8)
    for fw in (1, 2, 8, 16):
        p = W.wpack(x, fw)
        assert p.shape == (2, 8, 64 // fw, fw * 8)
        np.testing.assert_array_equal(np.asarray(W.wunpack(p, fw, 8)), np.asarray(x))
    # (j, c) lane order: block 0's lanes are columns 0..fw-1 interleaved c
    p = W.wpack(x, 16)
    np.testing.assert_array_equal(
        np.asarray(p[0, 0, 0]).reshape(16, 8), np.asarray(x[0, 0, :16, :])
    )


@pytest.mark.parametrize("cin,cout,fw", [(2, 8, 16), (8, 8, 16), (8, 16, 8), (16, 16, 8)])
def test_wconv3x3_matches_plain(rng, cin, cout, fw):
    x = _x(rng, 1, 12, 64, cin)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)) * 0.3
    ref = conv3x3(x, {"w": w, "b": jnp.zeros((cout,))})
    got = W.wunpack(W.wconv3x3(W.wpack(x, fw), w, fw), fw, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=RTOL, atol=ATOL)


def test_wpool_matches_plain(rng):
    x = _x(rng, 2, 8, 64, 8)
    ref = max_pool_2x2(x)
    got = W.wunpack(W.wpool(W.wpack(x, 16), 16, 8), 8, 8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("fwi,fw_out,c", [(8, 16, 8), (8, 8, 16)])
def test_wtconv_matches_plain(rng, fwi, fw_out, c):
    x = _x(rng, 1, 6, 8 * fwi, c)
    p = {
        "w": jnp.asarray(rng.standard_normal((c, 2, 2, c)).astype(np.float32)) * 0.3,
        "b": jnp.asarray(rng.standard_normal((c,)).astype(np.float32)),
    }
    ref = conv_transpose_2x2(x, p)
    got = W.wunpack(W.wtconv(W.wpack(x, fwi), p, fwi, fw_out), fw_out, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=RTOL, atol=ATOL)


def _stream_inputs(rng, cin, h=16, w=64):
    key = jax.random.PRNGKey(7)
    p = init_stream(key, cin)
    bn = init_stream_bn()
    # non-identity BN so the affine path is really exercised
    bn = jax.tree.map(
        lambda v: v + jnp.asarray(rng.uniform(-0.2, 0.2, v.shape), v.dtype), bn
    )
    x = _x(rng, 2, h, w, cin)
    return p, bn, x


@pytest.mark.parametrize("cin", [2, 4])
def test_wide_stream_matches_plain(rng, cin):
    p, bn, x = _stream_inputs(rng, cin)
    ref = unet_stream(p, bn, x)
    got = W.wunpack(W.wide_unet_stream(p, bn, W.wpack(x, W.FW0)), W.FW0, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=RTOL, atol=ATOL)


@pytest.mark.slow
def test_wide_stream_encoder_stop_grad(rng):
    """stop-grad parity: grads through the wide stream must vanish on the
    encoder blocks exactly as in the plain stream."""
    p, bn, x = _stream_inputs(rng, 2, h=8, w=32)

    def loss_wide(pp):
        f = W.wide_unet_stream(pp, bn, W.wpack(x, W.FW0), encoder_stop_grad=True)
        return jnp.sum(f**2)

    g = jax.grad(loss_wide)(p)
    for blk in ("inc", "down1", "down2"):
        assert float(jnp.abs(g[blk]["conv1"]["w"]).max()) == 0.0
    assert float(jnp.abs(g["up1"]["conv"]["conv1"]["w"]).max()) > 0.0


@pytest.mark.slow
def test_wide_dual_features_and_builder(rng):
    # quick-gate representatives: the per-op wconv/wpool/wtconv/stream
    # equivalences above; the full wide forward is pinned by the slow
    # test_popcorn_forward_wide_matches_packed and exercised e2e by the
    # spatial-layout tests (test_spatial.py)
    key = jax.random.PRNGKey(3)
    p = init_dual_stream(key)
    bn = init_dual_stream_bn()
    x6 = _x(rng, 1, 16, 64, 6)

    ref = dual_stream_features(p, bn, x6)
    sar_f, opt_f = W.wide_dual_stream_features(p, bn, x6)
    got = jnp.concatenate(
        [W.wunpack(sar_f, W.FW0, 8), W.wunpack(opt_f, W.FW0, 8)], axis=-1
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=RTOL, atol=ATOL)

    ref_log = building_logits(p, bn, x6)[..., 0]
    got_log = W.wide_building_logits(p, bn, x6)
    np.testing.assert_allclose(
        np.asarray(got_log), np.asarray(ref_log), rtol=RTOL, atol=ATOL
    )
    # single-stream variants
    for s1, s2 in ((True, False), (False, True)):
        ref_log = building_logits(p, bn, x6, s1=s1, s2=s2)[..., 0]
        got_log = W.wide_building_logits(p, bn, x6, s1=s1, s2=s2)
        np.testing.assert_allclose(
            np.asarray(got_log), np.asarray(ref_log), rtol=RTOL, atol=ATOL
        )


def test_wide_head_matches_plain(rng):
    from popcorn_tpu.nn.popcorn import head_apply

    key = jax.random.PRNGKey(5)
    head = init_head(key)
    feats = _x(rng, 1, 8, 64, 16)
    ref = head_apply(head, feats)[..., 0]
    sar_f = W.wpack(feats[..., :8], W.FW0)
    opt_f = W.wpack(feats[..., 8:], W.FW0)
    got = W.wide_head_apply(head, sar_f, opt_f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=RTOL, atol=ATOL)
    # single-stream head (8-feature input): weights sliced like the
    # two-part form
    got1 = W.wide_head_apply(
        {**head, "l1": {"w": head["l1"]["w"][:8], "b": head["l1"]["b"]}},
        sar_f, None,
    )
    ref1 = np.asarray(
        head_apply(
            {**head, "l1": {"w": head["l1"]["w"][:8], "b": head["l1"]["b"]}},
            feats[..., :8],
        )[..., 0]
    )
    np.testing.assert_allclose(np.asarray(got1), ref1, rtol=RTOL, atol=ATOL)


def test_scalar_matmul_layouts(rng):
    """scalar_matmul must be exact for every W that passes choose_wide,
    including W not divisible by 128."""
    for wtot in (32, 96, 160, 256):
        h = _x(rng, 1, 4, wtot, 8)
        wv = jnp.asarray(rng.standard_normal((8, 1)).astype(np.float32))
        ref = np.asarray(jnp.einsum("bhwc,co->bhwo", h, wv))[..., 0]
        got = W.scalar_matmul(W.wpack(h, 16), wv, 16)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=RTOL, atol=ATOL)


def test_choose_wide_gate():
    assert W.choose_wide(2048, 2048)
    assert W.choose_wide(16, 64)
    assert not W.choose_wide(15, 64)  # H % 4
    assert not W.choose_wide(16, 48)  # W % 32


@pytest.mark.slow
def test_popcorn_forward_wide_matches_packed(rng):
    """popcorn_forward must produce the same maps through layout='wide'
    and layout='packed' (summation-order tolerance)."""
    import dataclasses

    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.init import init_popcorn
    from popcorn_tpu.nn.popcorn import popcorn_forward, select_engine

    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(11), mcfg)
    x = _x(rng, 1, 32, 64, 6)
    inputs = {"input": x}
    outs = {}
    for layout in ("wide", "packed", "plain"):
        cfg = dataclasses.replace(mcfg, layout=layout)
        outs[layout] = popcorn_forward(
            params, consts, inputs, cfg, train=False, padding=False
        )
    for k in ("popdensemap", "scale"):
        ref = np.asarray(outs["plain"][k])
        for layout in ("wide", "packed"):
            np.testing.assert_allclose(
                np.asarray(outs[layout][k]), ref, rtol=5e-4, atol=5e-5,
                err_msg=f"{layout}/{k}",
            )
    # auto prefers the packed lift (its K=1152 convs measured ~2.4x the
    # MXU throughput of wide's K=384 bands on v5e — PERF_NOTES round 4);
    # wide is explicit or spatial
    assert select_engine(mcfg, 2048, 2048) == "packed"
    assert select_engine(dataclasses.replace(mcfg, layout="wide"), 2048, 2048) == "wide"
    assert select_engine(dataclasses.replace(mcfg, layout="spatial"), 2048, 2048) == "wide"
    assert (
        select_engine(dataclasses.replace(mcfg, layout="spatial"), 2048, 2048 + 16)
        == "plain"
    )  # spatial never packs (W % 32 != 0 -> plain)
    assert select_engine(mcfg, 2048, 2048 + 16) == "packed"
    assert select_engine(dataclasses.replace(mcfg, quantize="int8s"), 2048, 2048) == "packed"
    assert select_engine(dataclasses.replace(mcfg, layout="plain"), 2048, 2048) == "plain"


@pytest.mark.slow
def test_wide_member_maps_matches_forward(rng):
    """wide_member_maps (the fold body) == popcorn_forward eval semantics.
    (slow tier: the fold body is exercised per-op by the fast tests above
    and e2e by the spatial eval tests, which run wide member maps.)"""
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.popcorn import (
        popcorn_forward,
        prepare_wide_streams,
        wide_member_maps,
    )

    mcfg = ModelConfig(pretrained=False, sentinel_buildings=False)
    from popcorn_tpu.nn.init import init_popcorn

    params, consts = init_popcorn(jax.random.PRNGKey(12), mcfg)
    # H=32 so popcorn_forward(padding=False) stays pad-free (the reference's
    # pad-to-64 rule fires on H%32!=0, which would change border numerics)
    x = _x(rng, 1, 32, 64, 6)
    score = jnp.asarray(rng.random((1, 32, 64)).astype(np.float32))
    ref = popcorn_forward(
        params, consts, {"input": x, "building_counts": score}, mcfg,
        train=False, padding=False,
    )
    sar_w, opt_w = prepare_wide_streams(x, mcfg)
    dense3, scale3 = wide_member_maps(params, consts, sar_w, opt_w, score, mcfg)
    np.testing.assert_allclose(
        np.asarray(dense3), np.asarray(ref["popdensemap"]), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(scale3), np.asarray(ref["scale"]), rtol=5e-4, atol=5e-5
    )


def test_select_engine_wide_fallback_warns():
    """ADVICE r4 #3: explicit layout='wide' on a W%32-failing bucket falls
    back to packed/plain with a one-time warning instead of crashing
    mid-epoch."""
    import warnings

    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn import popcorn as pc

    cfg = ModelConfig(layout="wide")
    pc._WIDE_FALLBACK_WARNED.discard((100, 100))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng = pc.select_engine(cfg, 100, 100)
    assert eng in ("packed", "plain")
    assert any("falling back" in str(x.message) for x in w)
    # eligible shapes still select wide
    assert pc.select_engine(cfg, 64, 64) == "wide"
