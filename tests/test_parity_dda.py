"""Golden parity tests: TPU-native DualStreamUNet vs the PyTorch reference.

Compares features, building logits and padding behaviour against the
reference implementation run with the released checkpoint (the oracle is
imported from /root/reference, never copied). Target tolerance: rtol 1e-3
(BASELINE.json); on CPU float32 we expect far tighter agreement.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import reference_available
from oracle import load_reference_dda_model

import jax
import jax.numpy as jnp

from popcorn_tpu.compat.torch_convert import load_dda_tree
from popcorn_tpu.nn.unet import building_logits, dual_stream_features
from popcorn_tpu.nn import ops

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def oracle_model():
    return load_reference_dda_model()


@pytest.fixture(scope="module")
def jax_tree():
    return load_dda_tree()


def _rand_input(rng, b=1, h=96, w=64):
    # 6ch DDA order [VV,VH,B02,B03,B04,B08], roughly normalized scale
    return rng.standard_normal((b, h, w, 6)).astype(np.float32)


def test_features_parity(oracle_model, jax_tree, rng):
    x = _rand_input(rng)
    params, bn = jax_tree

    with torch.no_grad():
        ref = oracle_model(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            alpha=0,
            return_features=True,
            S1=True,
            S2=True,
        ).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    ours = np.asarray(dual_stream_features(params, bn, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
    # much tighter in practice
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_fusion_logits_parity(oracle_model, jax_tree, rng):
    x = _rand_input(rng, h=64, w=96)
    params, bn = jax_tree

    with torch.no_grad():
        _, _, logits_fusion, _, _ = oracle_model(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            alpha=0,
            return_features=False,
            S1=True,
            S2=True,
        )
    ref = np.transpose(logits_fusion.numpy(), (0, 2, 3, 1))

    ours = np.asarray(building_logits(params, bn, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_single_stream_logits_parity(oracle_model, jax_tree, rng):
    x = _rand_input(rng, h=64, w=64)
    params, bn = jax_tree

    with torch.no_grad():
        ref_sar = oracle_model(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            alpha=0,
            return_features=False,
            S1=True,
            S2=False,
        ).numpy()
    ours_sar = np.asarray(building_logits(params, bn, jnp.asarray(x), s1=True, s2=False))
    np.testing.assert_allclose(
        ours_sar, np.transpose(ref_sar, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )


def test_odd_shape_parity(oracle_model, jax_tree, rng):
    """Odd spatial sizes exercise the Up-block pad_to_match path."""
    x = _rand_input(rng, h=37, w=53)
    params, bn = jax_tree
    with torch.no_grad():
        ref = oracle_model(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            alpha=0,
            return_features=True,
            S1=True,
            S2=True,
        ).numpy()
    ours = np.asarray(dual_stream_features(params, bn, jnp.asarray(x)))
    np.testing.assert_allclose(
        ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )


def test_conv_transpose_matches_torch(rng):
    """conv_transpose_2x2 (matmul + pixel shuffle) == torch ConvTranspose2d."""
    cin, cout = 16, 16
    x = rng.standard_normal((2, 7, 9, cin)).astype(np.float32)
    tc = torch.nn.ConvTranspose2d(cin, cout, 2, stride=2)
    with torch.no_grad():
        ref = tc(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    w = tc.weight.detach().numpy()  # (I,O,2,2)
    p = {"w": jnp.asarray(np.transpose(w, (0, 2, 3, 1))), "b": jnp.asarray(tc.bias.detach().numpy())}
    ours = np.asarray(ops.conv_transpose_2x2(jnp.asarray(x), p))
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-4, atol=1e-5)


def test_padding_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 50, 70, 3)).astype(np.float32))
    xp, pad = ops.add_padding(x, force=True)
    assert xp.shape == (1, 78, 98, 3)
    back = ops.revert_padding(xp, pad)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    xp2, pad2 = ops.add_padding(x, force=False)
    assert xp2.shape[1] % 64 == 0 and xp2.shape[2] % 64 == 0
    back2 = ops.revert_padding(xp2, pad2)
    np.testing.assert_array_equal(np.asarray(back2), np.asarray(x))

    # already 32-divisible dims are left alone (reference quirk)
    x32 = jnp.zeros((1, 96, 96, 3))
    xp3, pad3 = ops.add_padding(x32, force=False)
    assert xp3.shape == x32.shape and pad3 == (None, None, None, None)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((1, 9, 11, 4)).astype(np.float32)
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), 2
    ).numpy()
    ours = np.asarray(ops.max_pool_2x2(jnp.asarray(x)))
    np.testing.assert_array_equal(ours, np.transpose(ref, (0, 2, 3, 1)))
