"""Acquisition-layer tests (the network-free parts): seasonal windows,
retry/backoff, bbox splitting, SCL masking, temporal median, tile merge."""

import os

import numpy as np
import pytest

from popcorn_tpu.acquisition.common import (
    retry_submit,
    season_windows,
    split_bbox,
    tile_grid,
)
from popcorn_tpu.acquisition.mpc import (
    SCL_CLOUD_CLASSES,
    masked_temporal_median,
    scl_cloud_mask,
    to_uint16,
)


def test_season_windows():
    w = season_windows(2020)
    assert w["spring"] == ("2020-03-01", "2020-06-01")
    assert w["winter"] == ("2020-12-01", "2021-03-01")


def test_retry_submit():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 4:
            raise RuntimeError("too many jobs")

    slept = []
    n = retry_submit(flaky, sleep=slept.append)
    assert n == 3 and len(slept) == 3 and all(s == 15.0 for s in slept)

    def always_fails():
        raise RuntimeError("no")

    with pytest.raises(RuntimeError):
        retry_submit(always_fails, max_trials=3, sleep=lambda *_: None)


def test_split_bbox():
    # 1 deg at 1e-4 deg/px = 10000 px -> must split into <=2500px tiles
    tiles = split_bbox((0, 0, 1, 1), 1e-4, max_pixels=2500)
    assert len(tiles) == 16
    for minx, miny, maxx, maxy in tiles:
        assert (maxx - minx) / 1e-4 <= 2500 + 1e-9
    # coverage: areas sum to the original
    area = sum((t[2] - t[0]) * (t[3] - t[1]) for t in tiles)
    assert abs(area - 1.0) < 1e-9
    assert split_bbox((0, 0, 0.1, 0.1), 1e-4) == [(0, 0, 0.1, 0.1)]


def test_tile_grid():
    tiles = tile_grid((0, 0, 2.5, 1.2), 1.0)
    assert len(tiles) == 6
    assert tiles[0] == (0, 0, 1.0, 1.0)
    assert tiles[-1] == (2.0, 1.0, 2.5, 1.2)


def test_scl_mask_and_median():
    scl = np.array([[0, 4, 8], [9, 10, 5]])
    m = scl_cloud_mask(scl)
    assert m.tolist() == [[True, False, True], [True, True, False]]

    # 3 dates, 1 band, 2x2: median ignores cloudy dates
    stack = np.zeros((3, 1, 2, 2), np.float32)
    stack[0] = 10
    stack[1] = 20
    stack[2] = 90
    mask = np.zeros((3, 2, 2), bool)
    mask[2, 0, 0] = True  # the 90 at (0,0) is cloud
    med = masked_temporal_median(stack, mask)
    assert med[0, 0, 0] == 15.0  # median of {10,20}
    assert med[0, 0, 1] == 20.0  # median of {10,20,90}
    # all-cloud pixel -> 0
    mask[:, 1, 1] = True
    med = masked_temporal_median(stack, mask)
    assert med[0, 1, 1] == 0.0

    assert to_uint16(np.array([-5.0, 3.7, 70000.0])).tolist() == [0, 4, 65535]


def test_merge_tiffs_tool(tmp_path):
    """End-to-end: raw tiles -> merged uint16 mosaic via the CLI."""
    import subprocess
    import sys

    from popcorn_tpu.config import DataPaths
    from popcorn_tpu.io.geotiff import GeoTIFF, write_geotiff

    paths = DataPaths(str(tmp_path))
    rng = np.random.default_rng(0)
    full = rng.integers(0, 10000, (4, 64, 96)).astype(np.float32)
    tdir = paths.raw_tile_dir("rwa", "S2", "spring")
    os.makedirs(tdir, exist_ok=True)
    for j, (c0, c1) in enumerate([(0, 48), (48, 96)]):
        write_geotiff(
            os.path.join(tdir, f"t{j}.tif"),
            full[:, :, c0:c1],
            transform=(10.0 + c0 * 1e-4, 1e-4, 5.0, 1e-4),
            dtype=np.uint16,
        )
    subprocess.run(
        [sys.executable, "tools/merge_tiffs.py", "--data_root", str(tmp_path),
         "--region", "rwa"],
        check=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    merged = paths.modality_path("rwa", "S2", "spring")
    assert os.path.exists(merged)
    with GeoTIFF(merged) as g:
        assert g.dtype == np.uint16
        np.testing.assert_array_equal(g.read(), full)
