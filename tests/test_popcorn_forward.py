"""POPCORN forward-path tests: channel reorder, building score vs the
torch oracle, occupancy/popcount semantics, dense==sparse equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_available
from popcorn_tpu.config import ModelConfig
from popcorn_tpu.nn.init import init_popcorn
from popcorn_tpu.nn.popcorn import (
    create_building_score,
    popcorn_forward,
    reorder_to_dda,
)


def test_reorder_to_dda(rng):
    x = rng.standard_normal((1, 4, 4, 6)).astype(np.float32)
    out = np.asarray(reorder_to_dda(jnp.asarray(x), s1=True, s2=True, nir=True))
    # input [R,G,B,NIR,VV,VH] -> [VV,VH,B,G,R,NIR] (popcorn.py:129-134)
    np.testing.assert_array_equal(out[..., 0], x[..., 4])
    np.testing.assert_array_equal(out[..., 1], x[..., 5])
    np.testing.assert_array_equal(out[..., 2], x[..., 2])
    np.testing.assert_array_equal(out[..., 3], x[..., 1])
    np.testing.assert_array_equal(out[..., 4], x[..., 0])
    np.testing.assert_array_equal(out[..., 5], x[..., 3])

    # S1-only: zeros for the optical stream (popcorn.py:135-139)
    xs1 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    o = np.asarray(reorder_to_dda(jnp.asarray(xs1), s1=True, s2=False, nir=False))
    np.testing.assert_array_equal(o[..., :2], xs1)
    assert (o[..., 2:] == 0).all()

    # S2-only (no NIR): B08 slot zero-filled
    xs2 = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    o = np.asarray(reorder_to_dda(jnp.asarray(xs2), s1=False, s2=True, nir=False))
    assert (o[..., :2] == 0).all() and (o[..., 5] == 0).all()
    np.testing.assert_array_equal(o[..., 2], xs2[..., 2])


@pytest.mark.skipif(not reference_available(), reason="no reference tree")
def test_building_score_vs_oracle(rng):
    """create_building_score == sigmoid(oracle fusion logits with pad-14)."""
    torch = pytest.importorskip("torch")
    from oracle import load_reference_dda_model

    from popcorn_tpu.compat.torch_convert import load_dda_tree

    net = load_reference_dda_model()
    params, bn = load_dda_tree()
    builder = {"params": params, "bn": bn}

    # our assembled input [R,G,B,NIR,VV,VH]
    x = rng.standard_normal((1, 60, 76, 6)).astype(np.float32)
    score = np.asarray(
        create_building_score(builder, jnp.asarray(x), s1=True, s2=True, nir=True)
    )
    assert score.shape == (1, 60, 76)

    # oracle path: pad reflect 14, reorder, fusion logits, sigmoid, unpad
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    xt = torch.nn.functional.pad(xt, (14, 14, 14, 14), mode="reflect")
    xt = torch.cat([xt[:, 4:6], torch.flip(xt[:, :3], dims=(1,)), xt[:, 3:4]], dim=1)
    with torch.no_grad():
        _, _, logits, _, _ = net(xt, alpha=0, return_features=False, S1=True, S2=True)
        ref = torch.sigmoid(logits)[:, :, 14:-14, 14:-14].numpy()
    np.testing.assert_allclose(
        score, np.transpose(ref, (0, 2, 3, 1))[..., 0], rtol=1e-3, atol=1e-5
    )


@pytest.fixture(scope="module")
def model():
    mcfg = ModelConfig(pretrained=False, biasinit=0.75)
    params, consts = init_popcorn(jax.random.PRNGKey(9), mcfg)
    return mcfg, params, consts


def test_forward_occupancy_popcount(model, rng):
    mcfg, params, consts = model
    b, h, w = 2, 64, 64
    admin = np.zeros((b, h, w), np.float32)
    admin[0, :32] = 1.0
    admin[1, 16:48] = 2.0
    inputs = {
        "input": jnp.asarray(rng.standard_normal((b, h, w, 6)).astype(np.float32)),
        "admin_mask": jnp.asarray(admin),
        "census_idx": jnp.asarray([1.0, 2.0]),
    }
    out = popcorn_forward(params, consts, inputs, mcfg, padding=False)
    dense = np.asarray(out["popdensemap"])
    scale = np.asarray(out["scale"])
    bc = np.asarray(out["building_counts"])
    assert (scale >= 0).all()
    np.testing.assert_allclose(dense, scale * bc, rtol=1e-6)
    # popcount = sum over own admin region
    np.testing.assert_allclose(
        np.asarray(out["popcount"]),
        [(dense[0] * (admin[0] == 1)).sum(), (dense[1] * (admin[1] == 2)).sum()],
        rtol=1e-5,
    )


def test_sparse_popcount_equals_dense(model, rng):
    """The TPU dense-masked formulation == reference sparse semantics:
    popcount must be identical with and without the sparsity mask."""
    mcfg, params, consts = model
    b, h, w = 1, 64, 64
    admin = np.ones((b, h, w), np.float32)
    inputs = {
        "input": jnp.asarray(rng.standard_normal((b, h, w, 6)).astype(np.float32)),
        "admin_mask": jnp.asarray(admin),
        "census_idx": jnp.asarray([1.0]),
    }
    out_dense = popcorn_forward(params, consts, inputs, mcfg, padding=False)
    out_sparse = popcorn_forward(
        params, consts, inputs, mcfg, padding=False, sparse=True,
        key=jax.random.PRNGKey(3), train=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_dense["popcount"]), np.asarray(out_sparse["popcount"]),
        rtol=1e-6,
    )
    # masked scale mean differs from full mean (it's restricted to the mask)
    assert out_sparse["scale_abs_mean"] is not None


def test_padding_modes(model, rng):
    mcfg, params, consts = model
    x = jnp.asarray(rng.standard_normal((1, 50, 70, 6)).astype(np.float32))
    out_p = popcorn_forward(params, consts, {"input": x}, mcfg, padding=True)
    out_np = popcorn_forward(params, consts, {"input": x}, mcfg, padding=False)
    assert out_p["popdensemap"].shape == (1, 50, 70)
    assert out_np["popdensemap"].shape == (1, 50, 70)


def test_fused_head_forward_consistency(model, rng):
    """cfg.fused_head=True must not change the forward result (CPU interpret)."""
    mcfg, params, consts = model
    import dataclasses

    mcfg_fused = dataclasses.replace(mcfg, fused_head=True)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
    a = popcorn_forward(params, consts, {"input": x}, mcfg, padding=False)
    b = popcorn_forward(params, consts, {"input": x}, mcfg_fused, padding=False)
    np.testing.assert_allclose(
        np.asarray(a["popdensemap"]), np.asarray(b["popdensemap"]),
        rtol=1e-4, atol=1e-5,
    )
