"""Packed (space-to-depth) engine == plain layout, bit-close, incl. grads."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popcorn_tpu.config import ModelConfig
from popcorn_tpu.nn import packed as pk
from popcorn_tpu.nn.init import init_dual_stream, init_dual_stream_bn, init_head, init_popcorn
from popcorn_tpu.nn.popcorn import head_apply, popcorn_forward
from popcorn_tpu.nn.unet import building_logits, dual_stream_features


@pytest.fixture(scope="module")
def dual():
    params = init_dual_stream(jax.random.PRNGKey(0))
    bn = init_dual_stream_bn()
    # non-identity BN consts to exercise the lifted affine
    bn = jax.tree.map(lambda x: x + 0.1, bn)
    return params, bn


def test_pack_unpack_roundtrip(rng):
    x = rng.standard_normal((2, 16, 24, 8)).astype(np.float32)
    for f in (1, 2, 4):
        xp = pk.pack(jnp.asarray(x), f)
        back = np.asarray(pk.unpack(xp, f, 8))
        np.testing.assert_array_equal(back, x)
        np.testing.assert_array_equal(pk.unpack_np(np.asarray(xp), f, 8), x)


@pytest.mark.parametrize("f", [2, 4])
def test_lifted_conv_equivalence(rng, f):
    from popcorn_tpu.nn.ops import conv3x3

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)).astype(np.float32))
    p = {"w": jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32)),
         "b": jnp.zeros((16,), jnp.float32)}
    ref = np.asarray(conv3x3(x, p))
    got_p = pk.conv_packed(pk.pack(x, f), pk.lift_conv3x3(p["w"], f))
    got = np.asarray(pk.unpack(got_p, f, 16))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pool_packed_equivalence(rng):
    from popcorn_tpu.nn.ops import max_pool_2x2

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)).astype(np.float32))
    ref = np.asarray(max_pool_2x2(x))
    got = np.asarray(pk.unpack(pk.pool_packed(pk.pack(x, 4), 4, 8), 2, 8))
    np.testing.assert_array_equal(got, ref)


def test_lift_tconv_equivalence(rng):
    from popcorn_tpu.nn.ops import conv_transpose_2x2

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16)).astype(np.float32))
    p = {"w": jnp.asarray(rng.standard_normal((16, 2, 2, 16)).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal(16).astype(np.float32))}
    ref = np.asarray(conv_transpose_2x2(x, p))
    for f_out, f_in in ((2, 1), (4, 2)):
        xin = pk.pack(x, f_in)
        got_p = pk.matmul_lanes(xin, pk.lift_tconv(p["w"], f_out)) + pk.lift_vec(p["b"], f_out)
        got = np.asarray(pk.unpack(got_p, f_out, 16))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [(64, 64), (32, 48), (36, 36)])  # f=4,4,4
def test_packed_features_match_plain(dual, rng, hw):
    params, bn = dual
    h, w = hw
    x = jnp.asarray(rng.standard_normal((2, h, w, 6)).astype(np.float32))
    ref = np.asarray(dual_stream_features(params, bn, x))
    f = pk.choose_pack_factor(h, w)
    got_p = pk.packed_dual_stream_features(params, bn, x, f)
    # [sar | opt] packed halves -> unpack each and concat
    c = got_p.shape[-1] // 2
    got = np.concatenate(
        [np.asarray(pk.unpack(got_p[..., :c], f, 8)),
         np.asarray(pk.unpack(got_p[..., c:], f, 8))],
        axis=-1,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_packed_f2_path(dual, rng):
    """H%4 != 0 but %2 == 0 exercises the f=2 fallback levels."""
    params, bn = dual
    x = jnp.asarray(rng.standard_normal((1, 36, 44, 6)).astype(np.float32))
    h, w = 36, 44
    assert pk.choose_pack_factor(h, w) == 4
    # force f=2
    ref = np.asarray(dual_stream_features(params, bn, x))
    got_p = pk.packed_dual_stream_features(params, bn, x, 2)
    c = got_p.shape[-1] // 2
    got = np.concatenate(
        [np.asarray(pk.unpack(got_p[..., :c], 2, 8)),
         np.asarray(pk.unpack(got_p[..., c:], 2, 8))],
        axis=-1,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_packed_building_logits(dual, rng):
    params, bn = dual
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    ref = np.asarray(building_logits(params, bn, x))
    got = np.asarray(pk.unpack(pk.packed_building_logits(params, bn, x, 4), 4, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_packed_head_matches_dense(dual, rng):
    params, bn = dual
    head = init_head(jax.random.PRNGKey(4), biasinit=0.3)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    feats_plain = dual_stream_features(params, bn, x)
    ref = np.asarray(head_apply(head, feats_plain))[..., 0]
    feats_p = pk.packed_dual_stream_features(params, bn, x, 4)
    got = np.asarray(pk.unpack(pk.packed_head_apply(head, feats_p, 4), 4, 1))[..., 0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_full_forward_packed_vs_plain(rng):
    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(7), mcfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    admin = jnp.ones((1, 64, 64), jnp.float32)
    inputs = {"input": x, "admin_mask": admin, "census_idx": jnp.asarray([1.0])}

    out_auto = popcorn_forward(params, consts, inputs, mcfg, padding=False)
    mcfg_plain = dataclasses.replace(mcfg, layout="plain")
    out_plain = popcorn_forward(params, consts, inputs, mcfg_plain, padding=False)
    np.testing.assert_allclose(
        np.asarray(out_auto["popdensemap"]),
        np.asarray(out_plain["popdensemap"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_auto["popcount"]), np.asarray(out_plain["popcount"]),
        rtol=1e-4,
    )


@pytest.mark.slow
def test_packed_gradients_match_plain(rng):
    """Training through the packed path: grads w.r.t. params match plain."""
    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(8), mcfg)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
    admin = jnp.ones((1, 32, 32), jnp.float32)
    inputs = {"input": x, "admin_mask": admin, "census_idx": jnp.asarray([1.0])}

    def loss(p, cfg):
        out = popcorn_forward(p, consts, inputs, cfg, padding=False)
        return jnp.sum(out["popcount"])

    g_auto = jax.grad(lambda p: loss(p, mcfg))(params)
    g_plain = jax.grad(lambda p: loss(p, dataclasses.replace(mcfg, layout="plain")))(
        params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        ),
        g_auto,
        g_plain,
    )
