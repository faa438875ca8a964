"""Fused Pallas head vs the dense reference head: forward and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popcorn_tpu.nn.init import init_head
from popcorn_tpu.nn.pallas_head import fused_head
from popcorn_tpu.nn.popcorn import head_apply


@pytest.fixture(scope="module")
def head_params():
    return init_head(jax.random.PRNGKey(3), biasinit=0.42)


def test_fused_forward_matches_dense(head_params, rng):
    feats = jnp.asarray(rng.standard_normal((2, 40, 52, 16)).astype(np.float32))
    dense = head_apply(head_params, feats)
    fused = fused_head(head_params, feats)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense), rtol=1e-5, atol=1e-5)


def test_fused_grads_match_dense(head_params, rng):
    feats = jnp.asarray(rng.standard_normal((1, 32, 36, 16)).astype(np.float32))

    def loss_dense(p, x):
        return jnp.sum(jnp.tanh(head_apply(p, x)))

    def loss_fused(p, x):
        return jnp.sum(jnp.tanh(fused_head(p, x)))

    gd_p, gd_x = jax.grad(loss_dense, argnums=(0, 1))(head_params, feats)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(head_params, feats)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gd_x), rtol=1e-4, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        ),
        gd_p,
        gf_p,
    )


def test_fused_nonaligned_pixel_count(head_params, rng):
    """N not a multiple of TILE exercises the pad/slice path."""
    feats = jnp.asarray(rng.standard_normal((1, 7, 13, 16)).astype(np.float32))
    dense = head_apply(head_params, feats)
    fused = fused_head(head_params, feats)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense), rtol=1e-5, atol=1e-5)


def test_fused_packed_head_matches_xla(head_params, rng):
    """Pallas packed head == XLA block-diag packed head (CPU interpret)."""
    import jax

    from popcorn_tpu.nn.packed import (
        pack,
        packed_head_apply,
        unpack_scalar,
    )
    from popcorn_tpu.nn.pallas_packed_head import fused_packed_head

    feats16 = jnp.asarray(rng.standard_normal((1, 32, 32, 16)).astype(np.float32))
    # build packed [sar|opt] layout from a 16ch plain map
    fp = jnp.concatenate([pack(feats16[..., :8], 4), pack(feats16[..., 8:], 4)], -1)
    ref = np.asarray(unpack_scalar(packed_head_apply(head_params, fp, 4), 4))
    got = np.asarray(unpack_scalar(fused_packed_head(head_params, fp, 4), 4))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_packed_head_flat_matches_xla(head_params, rng):
    """flat=True output (B,Hp,Wp*ff) == XLA path reshaped (CPU interpret)."""
    from popcorn_tpu.nn.packed import pack, packed_head_apply
    from popcorn_tpu.nn.pallas_packed_head import fused_packed_head

    feats16 = jnp.asarray(rng.standard_normal((1, 32, 32, 16)).astype(np.float32))
    fp = jnp.concatenate([pack(feats16[..., :8], 4), pack(feats16[..., 8:], 4)], -1)
    ref = np.asarray(packed_head_apply(head_params, fp, 4)).reshape(1, 8, 8 * 16)
    got = np.asarray(fused_packed_head(head_params, fp, 4, flat=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
