"""Losses/metrics golden tests vs torch formulas, augmentation semantics,
sparsity-mask semantics, and the stitching std math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from popcorn_tpu.aug.augment import (
    GeneralAugParams,
    PhotometricParams,
    apply_geometric,
    apply_photometric_s2,
)
from popcorn_tpu.data.normalize import photometric_s2_traced
from popcorn_tpu.losses.losses import get_loss, mape, pearson_corr, r2


def test_losses_match_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    pred = rng.uniform(0, 1000, 64).astype(np.float32)
    gt = rng.uniform(0, 1000, 64).astype(np.float32)
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)

    loss, aux = get_loss(
        jnp.asarray(pred), jnp.asarray(gt),
        loss=("log_l1_loss",), lam=(1.0,),
        scale_abs_mean=jnp.asarray(0.37), scale_regularization=0.01, tag="weak",
    )
    ref_log_l1 = F.l1_loss(torch.log(tp + 1), torch.log(tg + 1)).item()
    assert abs(float(aux["Population_weak/log_l1_loss"]) - ref_log_l1) < 1e-5
    assert abs(float(loss) - (ref_log_l1 + 0.01 * 0.37)) < 1e-5

    # r2 (reference utils/losses.py:101-127)
    gt_mean = gt.mean()
    ref_r2 = 1 - ((gt - pred) ** 2).sum() / (((gt - gt_mean) ** 2).sum() + 1e-8)
    assert abs(float(r2(jnp.asarray(pred), jnp.asarray(gt))) - ref_r2) < 1e-4

    # mape over gt>0.1 (utils/losses.py:91-97)
    pos = gt > 0.1
    ref_mape = 100 * (np.abs(pred[pos] - gt[pos]) / (gt[pos] + 1e-8)).mean()
    assert abs(float(mape(jnp.asarray(pred), jnp.asarray(gt))) - ref_mape) < 1e-2

    ref_corr = np.corrcoef(pred, gt)[0, 1]
    assert abs(float(pearson_corr(jnp.asarray(pred), jnp.asarray(gt))) - ref_corr) < 1e-5


def test_geometric_aug_sync(rng):
    """Image and mask transform identically (flips + rot90)."""
    img = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    mask = rng.integers(0, 5, (2, 6, 8)).astype(np.float32)
    p = GeneralAugParams(vflip=True, hflip=True, rot_k=1)
    ai = apply_geometric(img, p, hw_axes=(1, 2))
    am = apply_geometric(mask, p, hw_axes=(1, 2))
    assert ai.shape == (2, 8, 6, 3)  # rot90 swaps H/W
    # invariant: value colocation — pick a marker pixel
    img2 = np.zeros((1, 4, 6, 1), np.float32)
    mask2 = np.zeros((1, 4, 6), np.float32)
    img2[0, 1, 2, 0] = 7.0
    mask2[0, 1, 2] = 7.0
    bi = apply_geometric(img2, p, (1, 2))
    bm = apply_geometric(mask2, p, (1, 2))
    pos_i = np.argwhere(bi[0, :, :, 0] == 7.0)
    pos_m = np.argwhere(bm[0] == 7.0)
    np.testing.assert_array_equal(pos_i, pos_m)


def test_photometric_numpy_vs_traced(rng):
    """Host (numpy) and device (traced) photometric paths agree."""
    for c in (3, 4):
        x = rng.uniform(0, 10000, (2, 16, 16, c)).astype(np.float32)
        p = PhotometricParams(apply_brightness=True, beta=1.3, apply_gamma=True, gamma=0.8)
        a = apply_photometric_s2(x.copy(), p, xp=np)
        b = np.asarray(
            photometric_s2_traced(
                jnp.asarray(x), jnp.asarray([1.0, 1.3, 1.0, 0.8], jnp.float32)
            )
        )
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-2)
        # clamps at 10000
        assert a.max() <= 10000.0 + 1e-3


def test_photometric_brightness_semantics():
    x = np.full((1, 4, 4, 4), 8000.0, np.float32)
    p = PhotometricParams(apply_brightness=True, beta=1.5, apply_gamma=False, gamma=1.0)
    out = apply_photometric_s2(x, p)
    # 8000*1.5=12000 -> clamps to 10000
    np.testing.assert_allclose(out, 10000.0)


def test_sparsity_mask_semantics(rng):
    from popcorn_tpu.nn.popcorn import sparsity_mask

    b, h, w = 2, 80, 90
    buildings = jnp.asarray(
        (rng.random((b, h, w, 1)) > 0.7).astype(np.float32)
    )
    admin = jnp.asarray(rng.integers(0, 3, (b, h, w)).astype(np.float32))
    idx = jnp.asarray([1.0, 2.0])
    m = sparsity_mask(jax.random.PRNGKey(0), buildings, admin, idx, occupancy=True)
    m = np.asarray(m)
    admin_sel = np.asarray(admin) == np.asarray(idx)[:, None, None]
    # mask within admin region
    assert not m[~admin_sel].any()
    # every building pixel inside the admin region is in the mask
    bsel = (np.asarray(buildings)[..., 0] > 0) & admin_sel
    assert m[bsel].all()
    # the lattice adds some empty pixels too
    assert m.sum() > bsel.sum()


def test_stitch_std_math(rng):
    """Finalize math equals the reference formula on a tiny case."""
    from popcorn_tpu.infer.sliding import StitchAccumulators

    acc = StitchAccumulators((4, 4))
    vals = rng.random((3, 4, 4)).astype(np.float32)  # 3 "members"
    res = {
        "dense_sum": vals.sum(0, keepdims=True),
        "dense_sq": (vals**2).sum(0, keepdims=True),
        "scale_sum": vals.sum(0, keepdims=True),
        "scale_sq": (vals**2).sum(0, keepdims=True),
        "count": np.full((1, 4, 4), 3.0, np.float32),
    }
    acc.add(0, 0, res, 0)
    out = acc.finalize()
    np.testing.assert_allclose(out["map"], vals.mean(0), rtol=1e-5)
    ref_std = vals.std(0, ddof=1)
    np.testing.assert_allclose(out["map_std"], ref_std, rtol=1e-3, atol=1e-5)
    # count <= 1 pixels are left as raw sums with zero std
    acc2 = StitchAccumulators((2, 2))
    res1 = {
        "dense_sum": np.full((1, 2, 2), 5.0, np.float32),
        "dense_sq": np.full((1, 2, 2), 25.0, np.float32),
        "scale_sum": np.zeros((1, 2, 2), np.float32),
        "scale_sq": np.zeros((1, 2, 2), np.float32),
        "count": np.ones((1, 2, 2), np.float32),
    }
    acc2.add(0, 0, res1, 0)
    out2 = acc2.finalize()
    np.testing.assert_allclose(out2["map"], 5.0)
    np.testing.assert_allclose(out2["map_std"], 0.0)
