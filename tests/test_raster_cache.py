"""Pre-decoded mmap sidecar cache (io/raster_cache.py, VERDICT r4 #3):
byte-equality of served windows vs the direct native reader, staleness
invalidation, and pickup by the dataset's _RasterSource / the uint16
transport fast path.
"""

import os

import numpy as np
import pytest

from popcorn_tpu.io.geotiff import GeoTIFF, write_geotiff
from popcorn_tpu.io.raster_cache import (
    build_cache,
    cache_path,
    drop_cache,
    open_cache,
)


@pytest.fixture()
def u16_tif(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 10_000, (4, 96, 130), dtype=np.uint16)
    p = str(tmp_path / "s2.tif")
    write_geotiff(p, arr.astype(np.float32), transform=(30.0, 1e-4, -1.5, 1e-4),
                  dtype=np.uint16)
    return p, arr


@pytest.fixture()
def f32_tif(tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.standard_normal((2, 96, 130)).astype(np.float32)
    arr[0, 5, 7] = np.nan
    p = str(tmp_path / "s1.tif")
    write_geotiff(p, arr, transform=(30.0, 1e-4, -1.5, 1e-4),
                  nodata=float("nan"))
    return p, arr


def test_build_and_byte_equality_u16(u16_tif):
    p, arr = u16_tif
    out = build_cache(p)
    assert out == cache_path(p) and os.path.exists(out)
    mm = open_cache(p)
    assert mm is not None and mm.dtype == np.uint16
    np.testing.assert_array_equal(np.asarray(mm), arr)
    # windowed reads byte-equal the direct reader, raw and float paths
    with GeoTIFF(p) as g:
        win = ((10, 60), (17, 101))
        np.testing.assert_array_equal(
            np.asarray(mm[[2, 0], 10:60, 17:101]),
            g.read((3, 1), window=win, raw=True),
        )
        np.testing.assert_array_equal(
            np.asarray(mm[[0, 1, 2, 3], 10:60, 17:101]).astype(np.float32),
            g.read(None, window=win),
        )


def test_build_preserves_nan_f32(f32_tif):
    p, arr = f32_tif
    build_cache(p)
    mm = open_cache(p)
    assert mm.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(mm), arr)


def test_stale_cache_is_ignored(u16_tif):
    p, arr = u16_tif
    build_cache(p)
    assert open_cache(p) is not None
    # rewrite the source with different content: size/mtime change
    write_geotiff(p, (arr + 1).astype(np.float32),
                  transform=(30.0, 1e-4, -1.5, 1e-4), dtype=np.uint16)
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 10**9))
    assert open_cache(p) is None
    # a rebuild revalidates
    build_cache(p)
    mm = open_cache(p)
    np.testing.assert_array_equal(np.asarray(mm), arr + 1)


def test_env_disable(u16_tif, monkeypatch):
    p, _ = u16_tif
    build_cache(p)
    monkeypatch.setenv("POPCORN_RASTER_CACHE", "0")
    assert open_cache(p) is None


def test_drop_cache(u16_tif):
    p, _ = u16_tif
    build_cache(p)
    drop_cache(p)
    assert open_cache(p) is None
    assert not os.path.exists(cache_path(p))


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from popcorn_tpu.data.synthetic import make_synthetic_region

    root = str(tmp_path_factory.mktemp("cache_region"))
    return make_synthetic_region(root, "rwa", height=256, width=320, seed=11)


def _cache_region(paths):
    from popcorn_tpu.config import SEASONS

    for season in SEASONS:
        for mod in ("S2", "S1"):
            build_cache(paths.modality_path("rwa", mod, season))


def test_raster_source_serves_from_cache(synth):
    """_RasterSource picks the sidecar up and serves IDENTICAL windows
    (read and read_raw) to the direct reader."""
    from popcorn_tpu.data.dataset import PopulationDataset

    _cache_region(synth)
    ds = PopulationDataset(
        synth, "rwa", mode="weaksup", train_level="coarse",
        patchsize=None, overlap=None, fourseasons=True,
    )
    try:
        src = ds._source("S2", 1, False)
        assert src._cache is not None
        win = ((3, 130), (40, 200))
        with GeoTIFF(synth.modality_path("rwa", "S2", "summer")) as g:
            np.testing.assert_array_equal(
                src.read((3, 2, 1, 4), win), g.read((3, 2, 1, 4), window=win)
            )
            np.testing.assert_array_equal(
                src.read_raw((3, 2, 1, 4), win),
                g.read((3, 2, 1, 4), window=win, raw=True),
            )
        s1 = ds._source("S1", 0, False)
        assert s1._cache is not None
        with GeoTIFF(synth.modality_path("rwa", "S1", "spring")) as g:
            np.testing.assert_array_equal(
                s1.read((1, 2), win), g.read((1, 2), window=win)
            )
    finally:
        ds.close()


def test_u16_transport_eligibility_through_cache(synth, monkeypatch):
    """The uint16 transport fast path (device feeds) stays eligible when
    windows come from the sidecar instead of the native decoder."""
    from popcorn_tpu.data.dataset import PopulationDataset
    from popcorn_tpu.data.device_weaksup import _is_raw_u16_source
    from popcorn_tpu.infer.device_feed import _read_raw_u16

    _cache_region(synth)
    ds = PopulationDataset(
        synth, "rwa", mode="weaksup", train_level="coarse",
        patchsize=None, overlap=None, fourseasons=True,
    )
    try:
        src = ds._source("S2", 0, False)
        assert src._cache is not None
        assert _is_raw_u16_source(src)
        raw = _read_raw_u16(src, (3, 2, 1, 4), ((0, 64), (0, 64)))
        assert raw is not None and raw.dtype == np.uint16
        s1 = ds._source("S1", 0, False)
        assert not _is_raw_u16_source(s1)  # float32 mosaic
    finally:
        ds.close()


def test_feed_parity_with_cache(synth):
    """Host-feed batches are bit-identical with and without sidecars."""
    from popcorn_tpu.data.dataset import PopulationDataset
    from popcorn_tpu.data.feed import WeaksupFeed

    def batches(env_off):
        if env_off:
            os.environ["POPCORN_RASTER_CACHE"] = "0"
        try:
            ds = PopulationDataset(
                synth, "rwa", mode="weaksup", train_level="coarse",
                patchsize=None, overlap=None, fourseasons=True,
            )
            feed = WeaksupFeed([ds], batch_size=2, seed=1600, prefetch=0)
            out = list(feed.epoch(0))
            ds.close()
            return out
        finally:
            os.environ.pop("POPCORN_RASTER_CACHE", None)

    _cache_region(synth)
    a, b = batches(False), batches(True)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(
                np.asarray(ba[k]), np.asarray(bb[k]), err_msg=k
            )
            assert np.asarray(ba[k]).dtype == np.asarray(bb[k]).dtype, k
