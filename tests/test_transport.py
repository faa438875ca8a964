"""--transport bf16: float image modalities ride bfloat16 on the data
plane (data/feed.py::transport_cast) — half the host->device bytes and
HBM residency for S1 (S2 already rides lossless uint16). Opt-in and
lossy; these tests pin (a) the cast rule and host/device feed parity per
mode, (b) the budget halving, and (c) the census-level accuracy bound.
"""

import numpy as np
import pytest

import jax

import ml_dtypes

from popcorn_tpu.data.dataset import PopulationDataset
from popcorn_tpu.data.device_weaksup import DeviceWeaksupFeed, Ineligible
from popcorn_tpu.data.feed import (
    TRANSPORT_KEYS,
    InferenceFeed,
    WeaksupFeed,
    transport_cast,
)
from popcorn_tpu.data.synthetic import make_synthetic_region

BF16 = np.dtype(ml_dtypes.bfloat16)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("transport_data"))
    return make_synthetic_region(
        root, "rwa", height=320, width=448, seed=7,
        with_viirs=True, with_buildings=True,
    )


def _ds(synth, mode="weaksup", **kw):
    if mode == "weaksup":
        return PopulationDataset(
            synth, "rwa", mode="weaksup", train_level="coarse",
            patchsize=None, overlap=None, fourseasons=True, **kw,
        )
    return PopulationDataset(
        synth, "rwa", mode="test", patchsize=96, overlap=16,
        fourseasons=False, **kw,
    )


def test_transport_cast_rule():
    batch = {
        "S2": np.arange(6, dtype=np.uint16).reshape(1, 2, 3),
        "S1": np.linspace(-30.0, 5.0, 6, dtype=np.float32).reshape(1, 2, 3),
        "VIIRS": np.ones((1, 2, 3), np.float32),
        "building_counts": np.ones((1, 2, 3), np.float32),
        "admin_mask": np.zeros((1, 2, 3), np.float32),
    }
    out = transport_cast(dict(batch), "bf16")
    assert out["S2"].dtype == np.uint16  # lossless u16 beats bf16: kept
    assert out["S1"].dtype == BF16
    assert out["VIIRS"].dtype == BF16
    # masks/counts/targets always ride exact
    assert out["building_counts"].dtype == np.float32
    assert out["admin_mask"].dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(out["S1"], np.float32),
        batch["S1"].astype(ml_dtypes.bfloat16).astype(np.float32),
    )
    # exact is a no-op; unknown transports are rejected
    same = transport_cast(dict(batch), "exact")
    assert same["S1"].dtype == np.float32
    with pytest.raises(ValueError):
        transport_cast(dict(batch), "fp8")
    with pytest.raises(ValueError):
        WeaksupFeed([], transport="fp8")


def test_host_feed_bf16_batches(synth):
    ds = _ds(synth)
    kw = dict(batch_size=2, seed=1600, prefetch=0, augment=True)
    exact = list(WeaksupFeed([ds], **kw).epoch(0))
    bf16 = list(WeaksupFeed([ds], transport="bf16", **kw).epoch(0))
    assert len(exact) == len(bf16) > 0
    for be, bb in zip(exact, bf16):
        assert set(be) == set(bb)
        for k in TRANSPORT_KEYS:
            if k not in be:
                continue
            if be[k].dtype == np.float32:
                assert bb[k].dtype == BF16, k
                # cast commutes with the (index-permutation) augs
                np.testing.assert_array_equal(
                    np.asarray(bb[k]),
                    be[k].astype(ml_dtypes.bfloat16),
                    err_msg=k,
                )
            else:  # lossless-u16 S2 stays u16 under both transports
                assert bb[k].dtype == be[k].dtype, k
    ds.close()


def test_device_feed_bf16_parity(synth):
    """Host and device feeds must agree batch-for-batch under bf16, the
    same bit-parity contract the exact transport has."""
    ds = _ds(synth)
    kw = dict(batch_size=2, seed=1600, prefetch=0, augment=True,
              transport="bf16")
    host = list(WeaksupFeed([ds], **kw).epoch(1))
    dev = list(DeviceWeaksupFeed([ds], **kw).epoch(1))
    assert len(host) == len(dev) > 0
    for bh, bd in zip(host, dev):
        assert set(bh) == set(bd)
        for k in bh:
            a, b = np.asarray(bh[k]), np.asarray(bd[k])
            assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
            np.testing.assert_array_equal(a, b, err_msg=k)
    ds.close()


def test_device_feed_bf16_residency_halved(synth):
    ds = _ds(synth)
    kw = dict(batch_size=2, seed=1600, prefetch=0)
    f32 = DeviceWeaksupFeed([ds], **kw)
    b16 = DeviceWeaksupFeed([ds], transport="bf16", **kw)
    assert f32._mos["S1"].dtype == np.float32
    assert b16._mos["S1"].dtype == jax.numpy.bfloat16
    assert b16._mos["S1"].nbytes * 2 == f32._mos["S1"].nbytes
    # a validation feed cannot adopt stacks of a different transport
    with pytest.raises(Ineligible):
        DeviceWeaksupFeed([ds], resident_from=f32, transport="bf16", **kw)
    ds.close()


def test_inference_feed_bf16(synth):
    ds = _ds(synth, mode="test")
    exact = next(iter(InferenceFeed(ds, batch_size=1, prefetch=0)))
    bf16 = next(iter(InferenceFeed(ds, batch_size=1, prefetch=0,
                                   transport="bf16")))
    assert bf16["S1"].dtype == BF16
    np.testing.assert_array_equal(
        np.asarray(bf16["S1"]), exact["S1"].astype(ml_dtypes.bfloat16)
    )
    for k in ("mask", "img_coords", "valid", "season"):
        np.testing.assert_array_equal(np.asarray(exact[k]), np.asarray(bf16[k]))
    ds.close()


TRANSPORT_R2_BOUND = 0.02  # documented in README.md


@pytest.mark.slow
def test_bf16_transport_census_r2_within_bound(tmp_path):
    """End-to-end acceptance: census-level R2 of a bf16-transport eval
    stays within TRANSPORT_R2_BOUND of the exact-transport run (the same
    acceptance shape as the int8s bound, test_quantize_acceptance.py)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import parity_released

    from popcorn_tpu.compat.torch_convert import save_popcorn_checkpoint
    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.init import init_popcorn

    paths = make_synthetic_region(
        str(tmp_path / "data"), "rwa", height=192, width=256, seed=47
    )
    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(1601), mcfg)
    members = []
    for s in range(2):
        member = jax.tree.map(lambda x, s=s: x * (1.0 + 0.01 * s), params)
        p = str(tmp_path / f"m{s + 1}.pth")
        save_popcorn_checkpoint(p, member, consts, epoch=s, iteration=s)
        members.append(p)

    kw = dict(paths=paths, patchsize=96, overlap=16, fourseasons=False)
    base = parity_released.evaluate(members, None, "rwa", "coarse", **kw)
    b16 = parity_released.evaluate(
        members, None, "rwa", "coarse", transport="bf16", **kw
    )
    r2_keys = [k for k in base if k.endswith("/r2")]
    assert any("AdjCensus" in k for k in r2_keys), sorted(base)
    for k in r2_keys:
        assert k in b16, f"bf16-transport run missing metric {k}"
        assert np.isfinite(b16[k]), (k, b16[k])
        delta = abs(b16[k] - base[k])
        assert delta <= TRANSPORT_R2_BOUND, (
            f"{k}: bf16-transport R2 {b16[k]:.5f} vs exact {base[k]:.5f} "
            f"(delta {delta:.5f} > bound {TRANSPORT_R2_BOUND})"
        )
