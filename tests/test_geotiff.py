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
