"""Native GeoTIFF library tests: roundtrip + cross-validation against PIL."""

import os

import numpy as np
import pytest

from popcorn_tpu.io.geotiff import GeoTIFF, write_geotiff


def test_roundtrip_float32(tmp_path, rng):
    data = rng.standard_normal((3, 100, 131)).astype(np.float32)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, data, transform=(30.0, 1e-4, -1.5, 1e-4), nodata=-9999.0)
    with GeoTIFF(p) as g:
        assert g.shape == (100, 131)
        assert g.count == 3
        assert g.nodata == -9999.0
        ox, pw, _, oy, _, ph = g.transform
        assert abs(ox - 30.0) < 1e-12 and abs(pw - 1e-4) < 1e-15
        assert abs(oy - (-1.5)) < 1e-12 and abs(ph - (-1e-4)) < 1e-15
        out = g.read()
        np.testing.assert_array_equal(out, data)
        # windowed read
        win = g.read(bands=[2], window=((10, 60), (5, 101)))
        np.testing.assert_array_equal(win[0], data[1, 10:60, 5:101])


def test_roundtrip_uint16(tmp_path, rng):
    data = rng.integers(0, 10000, size=(4, 77, 53)).astype(np.uint16)
    p = str(tmp_path / "u16.tif")
    write_geotiff(p, data.astype(np.float32), dtype=np.uint16)
    with GeoTIFF(p) as g:
        assert g.dtype == np.uint16
        np.testing.assert_array_equal(g.read(), data.astype(np.float32))


def test_raw_read_native_dtype(tmp_path, rng):
    """raw=True returns the file's native dtype bit-for-bit (the
    device-feed transport path skips the float32 detour entirely)."""
    data = rng.integers(0, 10000, size=(4, 90, 70)).astype(np.uint16)
    p = str(tmp_path / "raw16.tif")
    write_geotiff(p, data.astype(np.float32), dtype=np.uint16)
    with GeoTIFF(p) as g:
        r = g.read(raw=True)
        assert r.dtype == np.uint16
        np.testing.assert_array_equal(r, data)
        # windowed + band-subset raw read, tile-crossing window
        win = g.read(bands=(3, 1), window=((7, 66), (13, 70)), raw=True)
        assert win.dtype == np.uint16
        np.testing.assert_array_equal(win[0], data[2, 7:66, 13:70])
        np.testing.assert_array_equal(win[1], data[0, 7:66, 13:70])
    # float path: raw read of an f32 file is the identity
    fdata = rng.standard_normal((2, 50, 40)).astype(np.float32)
    pf = str(tmp_path / "rawf.tif")
    write_geotiff(pf, fdata)
    with GeoTIFF(pf) as g:
        np.testing.assert_array_equal(g.read(raw=True), fdata)


def test_template_geo_copy(tmp_path, rng):
    a = rng.standard_normal((1, 40, 40)).astype(np.float32)
    p1 = str(tmp_path / "a.tif")
    write_geotiff(p1, a, transform=(7.25, 0.5, 46.5, 0.5), nodata=0.0)
    p2 = str(tmp_path / "b.tif")
    write_geotiff(p2, a * 2, template=p1)
    with GeoTIFF(p2) as g:
        ox, pw, _, oy, _, ph = g.transform
        assert (ox, pw, oy, ph) == (7.25, 0.5, 46.5, -0.5)


@pytest.mark.parametrize("compression", ["raw", "tiff_lzw", "tiff_adobe_deflate", "packbits"])
def test_read_pil_written(tmp_path, rng, compression):
    """Cross-check: files written by an independent implementation (PIL)."""
    from PIL import Image

    data = rng.integers(0, 255, size=(57, 91)).astype(np.uint8)
    p = str(tmp_path / f"pil_{compression}.tif")
    Image.fromarray(data).save(p, compression=None if compression == "raw" else compression)
    with GeoTIFF(p) as g:
        assert g.shape == (57, 91)
        np.testing.assert_array_equal(g.read(squeeze=True, bands=1), data.astype(np.float32))


def test_pil_reads_ours(tmp_path, rng):
    """Cross-check: PIL can read the files we write."""
    from PIL import Image

    data = (rng.standard_normal((64, 64)) * 100).astype(np.float32)
    p = str(tmp_path / "ours.tif")
    write_geotiff(p, data)
    img = np.array(Image.open(p))
    np.testing.assert_array_equal(img, data)


def test_big_window_many_tiles(tmp_path, rng):
    """Reads spanning multiple 256px tiles, non-aligned window."""
    data = rng.standard_normal((2, 700, 610)).astype(np.float32)
    p = str(tmp_path / "big.tif")
    write_geotiff(p, data)
    with GeoTIFF(p) as g:
        np.testing.assert_array_equal(
            g.read(window=((130, 645), (99, 500))), data[:, 130:645, 99:500]
        )


def test_out_of_bounds_window(tmp_path, rng):
    data = rng.standard_normal((1, 32, 32)).astype(np.float32)
    p = str(tmp_path / "oob.tif")
    write_geotiff(p, data)
    with GeoTIFF(p) as g:
        with pytest.raises(IOError):
            g.read(window=((0, 64), (0, 32)))


# ---- native NaN scans (gt_nan_tile_any / gt_has_nan_f32) --------------------
# One streaming pass replacing the numpy isnan->any->pool detour the mosaic
# feeds used (device_weaksup._nan_tile_integral, device_feed.season_arrays).


def _ref_tiles(arr, tile):
    if arr.ndim == 2:
        arr = arr[None]
    mask = np.isnan(arr).any(axis=0)
    h, w = mask.shape
    th, tw = -(-h // tile), -(-w // tile)
    pad = np.zeros((th * tile, tw * tile), bool)
    pad[:h, :w] = mask
    return pad.reshape(th, tile, tw, tile).any(axis=(1, 3))


@pytest.mark.parametrize("shape", [(2, 200, 321), (1, 32, 32), (3, 65, 31), (70, 45)])
@pytest.mark.parametrize("tile", [32, 17])
def test_nan_tile_any_matches_numpy(rng, shape, tile):
    from popcorn_tpu.io.geotiff import nan_tile_any

    arr = rng.standard_normal(shape).astype(np.float32)
    # sprinkle NaNs, incl. the very last element (partial-tile edge)
    flat = arr.reshape(-1)
    idx = rng.integers(0, flat.size, size=max(1, flat.size // 97))
    flat[idx] = np.nan
    flat[-1] = np.nan
    got = nan_tile_any(arr, tile)
    np.testing.assert_array_equal(got, _ref_tiles(arr, tile))


def test_nan_tile_any_clean_and_integer(rng):
    from popcorn_tpu.io.geotiff import nan_tile_any

    clean = rng.standard_normal((2, 64, 64)).astype(np.float32)
    assert not nan_tile_any(clean).any()
    u16 = (clean * 100).astype(np.uint16)
    assert not nan_tile_any(u16).any()  # integer data cannot hold NaN


def test_nan_tile_any_noncontiguous_fallback(rng):
    from popcorn_tpu.io.geotiff import nan_tile_any

    arr = rng.standard_normal((64, 64, 2)).astype(np.float32)
    arr[3, 7, 1] = np.nan
    v = np.transpose(arr, (2, 0, 1))  # non-contiguous view
    np.testing.assert_array_equal(nan_tile_any(v, 32), _ref_tiles(v, 32))


def test_has_nan_paths(rng):
    from popcorn_tpu.io.geotiff import has_nan

    a = rng.standard_normal((3, 40, 50)).astype(np.float32)
    assert not has_nan(a)
    a[2, 39, 49] = np.nan
    assert has_nan(a)
    # transpose view scans its contiguous base (order-independent)
    assert has_nan(np.transpose(a, (1, 2, 0)))
    assert not has_nan(np.transpose(np.zeros((2, 8, 8), np.float32), (1, 2, 0)))
    # sliced view does NOT cover the base: must fall back, stay correct
    b = np.full((4, 4), np.nan, np.float32)
    b[1:3, 1:3] = 0.0
    assert not has_nan(b[1:3, 1:3])
    assert not has_nan(np.zeros((4, 4), np.int32))
    assert has_nan(np.array([1.0, np.nan], np.float64))


def test_nan_tile_integral_equivalence(rng):
    from popcorn_tpu.data.device_weaksup import (
        _nan_tile_integral,
        _tile_integral,
    )

    arr = rng.standard_normal((2, 150, 222)).astype(np.float32)
    assert _nan_tile_integral(arr) is None
    arr[0, 77, 191] = np.nan
    arr[1, 0, 0] = np.nan
    ref = _tile_integral(np.isnan(arr).any(axis=0))
    np.testing.assert_array_equal(_nan_tile_integral(arr), ref)


def test_has_nan_bf16_and_overlapping_views(rng):
    """ADVICE r4 #2: ml_dtypes bfloat16 (kind 'V') must be scanned, not
    silently reported clean; stride-tricks views that do not cover their
    base must not take the base shortcut."""
    import ml_dtypes

    from popcorn_tpu.io.geotiff import _covers_base, has_nan, nan_tile_any

    a = rng.standard_normal((2, 9, 11)).astype(np.float32)
    a[1, 3, 4] = np.nan
    b = a.astype(ml_dtypes.bfloat16)
    assert has_nan(b)
    assert not has_nan(np.zeros((3, 3), ml_dtypes.bfloat16))
    assert nan_tile_any(b, 4).any()
    assert not nan_tile_any(np.zeros((8, 8), ml_dtypes.bfloat16), 4).any()

    # overlapping stride-tricks view: size equals base size but elements
    # repeat — the shortcut predicate must reject it
    base = np.zeros(8, np.float32)
    base[0] = np.nan
    ov = np.lib.stride_tricks.as_strided(
        base[1:], shape=(7,), strides=(4,)
    )
    assert not _covers_base(ov, base)
    # transpose/reshape views that DO cover the base still qualify
    full = rng.standard_normal((3, 5, 7)).astype(np.float32)
    assert _covers_base(np.transpose(full, (2, 0, 1)), full)
    assert _covers_base(full.reshape(5, 21), full)


def test_threaded_write_byte_identical(tmp_path, rng, monkeypatch):
    """VERDICT r4 #5: the block-parallel tile encoder produces a file
    byte-for-byte identical to the sequential writer (same tile order,
    same compress2 output), and PIL still reads it."""
    from popcorn_tpu.io.geotiff import GeoTIFF, write_geotiff

    data = rng.uniform(0, 4000, (3, 700, 930)).astype(np.float32)
    outs = {}
    for tag, threads in (("seq", "1"), ("par", "4")):
        monkeypatch.setenv("POPCORN_GT_WRITE_THREADS", threads)
        p = str(tmp_path / f"{tag}.tif")
        write_geotiff(
            p, data, transform=(30.0, 1e-4, -1.5, 1e-4), dtype=np.uint16
        )
        outs[tag] = open(p, "rb").read()
    assert outs["seq"] == outs["par"]
    with GeoTIFF(str(tmp_path / "par.tif")) as g:
        np.testing.assert_array_equal(
            g.read(), data.astype(np.uint16).astype(np.float32)
        )
