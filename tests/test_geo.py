"""geo subpackage tests: shapefile/dbf/geojson readers, rasterization,
IoU matching, census preprocessing tool end-to-end."""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from popcorn_tpu.geo.rasterize import (
    block_pool_sum,
    match_regions_by_iou,
    rasterize_polygon,
    rasterize_regions,
    region_bbox_counts,
)
from popcorn_tpu.geo.shapefile import read_dbf, read_geojson, read_shp


def write_minimal_shapefile(base, polygons):
    """Write a tiny .shp (+.dbf with an 'ID' N field) for tests."""
    recs = []
    for i, rings in enumerate(polygons):
        pts = np.concatenate(rings)
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
        content = struct.pack("<i", 5)
        content += struct.pack(
            "<4d", pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()
        )
        content += struct.pack("<ii", len(rings), len(pts))
        content += parts.tobytes()
        content += np.asarray(pts, "<f8").tobytes()
        recs.append(content)
    body = b""
    for i, c in enumerate(recs):
        body += struct.pack(">ii", i + 1, len(c) // 2) + c
    filelen = (100 + len(body)) // 2
    hdr = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0) + struct.pack(">i", filelen)
    hdr += struct.pack("<ii", 1000, 5) + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    with open(base + ".shp", "wb") as f:
        f.write(hdr + body)
    # dbf
    nrec = len(polygons)
    field = b"ID".ljust(11, b"\x00") + b"N" + b"\x00" * 4 + bytes([10, 0]) + b"\x00" * 14
    dbf_hdr = bytes([3, 124, 1, 1]) + struct.pack("<I", nrec) + struct.pack(
        "<HH", 32 + 32 + 1, 1 + 10
    ) + b"\x00" * 20
    records = b"".join(b" " + str(i + 1).rjust(10).encode() for i in range(nrec))
    with open(base + ".dbf", "wb") as f:
        f.write(dbf_hdr + field + b"\x0d" + records + b"\x1a")


def square(x0, y0, s):
    return [np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float)]


def test_shp_dbf_roundtrip(tmp_path):
    base = str(tmp_path / "poly")
    polys = [square(0, 0, 1), square(2, 0, 1.5)]
    write_minimal_shapefile(base, polys)
    geoms = read_shp(base + ".shp")
    assert len(geoms) == 2
    np.testing.assert_allclose(geoms[0][0], polys[0][0])
    attrs = read_dbf(base + ".dbf")
    assert [a["ID"] for a in attrs] == [1, 2]


def test_geojson_reader(tmp_path):
    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"ID": 7},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                },
            }
        ],
    }
    p = str(tmp_path / "a.geojson")
    json.dump(gj, open(p, "w"))
    geoms, attrs = read_geojson(p)
    assert len(geoms) == 1 and attrs[0]["ID"] == 7


def test_rasterize_square():
    # grid: origin (0, 10), 1x1 px, 10x10; square covering x[2,6) y[3,7)
    t = (0.0, 1.0, 10.0, -1.0)
    rings = [np.array([[2, 3], [6, 3], [6, 7], [2, 7]], float)]
    m = rasterize_polygon(rings, (10, 10), t)
    assert m.sum() == 16
    # y=7 -> row 3; y=3 -> row 7 (north-up)
    assert m[3:7, 2:6].all()


def test_rasterize_with_hole():
    t = (0.0, 1.0, 10.0, -1.0)
    outer = np.array([[1, 1], [9, 1], [9, 9], [1, 9]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)
    m = rasterize_polygon([outer, hole], (10, 10), t)
    assert m.sum() == 64 - 4
    assert not m[4:6, 4:6].any()


def test_iou_matching():
    t = (0.0, 1.0, 20.0, -1.0)
    a = [square(1, 1, 8), square(11, 1, 8)]
    b = [square(11.5, 1, 8), square(1, 1.5, 8)]  # slightly shifted copies
    matches = match_regions_by_iou(a, b, (20, 20), t)
    assert matches == {0: 1, 1: 0}


def test_bbox_counts_and_pool():
    ids = np.zeros((10, 10), np.float32)
    ids[2:5, 3:9] = 4.0
    bc = region_bbox_counts(ids, [4.0, 9.0])
    assert bc[4.0] == ("[2, 5, 3, 9]", 18)
    assert bc[9.0] == (None, 0)
    arr = np.arange(16, dtype=np.float32).reshape(4, 4)
    p = block_pool_sum(arr, 2)
    assert p.shape == (2, 2) and p[0, 0] == 0 + 1 + 4 + 5


def test_preprocess_tool_end_to_end(tmp_path):
    from popcorn_tpu.io.geotiff import write_geotiff, GeoTIFF

    template = str(tmp_path / "grid.tif")
    write_geotiff(
        template, np.zeros((40, 40), np.float32), transform=(0.0, 1.0, 40.0, 1.0)
    )
    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"ADM": "a"},
                "geometry": {"type": "Polygon",
                             "coordinates": [[[2, 2], [18, 2], [18, 18], [2, 18], [2, 2]]]},
            },
            {
                "type": "Feature",
                "properties": {"ADM": "b"},
                "geometry": {"type": "Polygon",
                             "coordinates": [[[22, 22], [38, 22], [38, 38], [22, 38], [22, 22]]]},
            },
        ],
    }
    bpath = str(tmp_path / "adm.geojson")
    json.dump(gj, open(bpath, "w"))
    cpath = str(tmp_path / "census.csv")
    pd.DataFrame([{"ADM": "a", "POP20": 100.0}, {"ADM": "b", "POP20": 250.0}]).to_csv(
        cpath, index=False
    )
    outdir = str(tmp_path / "out")
    subprocess.run(
        [
            sys.executable, "tools/preprocess_census.py",
            "--boundaries", bpath, "--census", cpath, "--join-col", "ADM",
            "--pop-col", "POP20", "--template", template,
            "--out-dir", outdir, "--level", "coarse",
        ],
        check=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    df = pd.read_csv(os.path.join(outdir, "census_coarse.csv"))
    assert len(df) == 2
    assert set(df["POP20"]) == {100.0, 250.0}
    with GeoTIFF(os.path.join(outdir, "boundaries_coarse.tif")) as g:
        ids = g.read(1, squeeze=True)
    assert set(np.unique(ids)) == {0.0, 1.0, 2.0}
    # bbox/count consistency
    from popcorn_tpu.data.dataset import parse_bbox

    for _, row in df.iterrows():
        xmin, xmax, ymin, ymax = parse_bbox(row["bbox"])
        assert (ids[xmin:xmax, ymin:ymax] == row["idx"]).sum() == row["count"]


def test_pool_census_grid_tool(tmp_path):
    """Grid-pooling tool: cell populations and ids consistent with the
    fine raster (the Kigali 100m->coarser workflow)."""
    import subprocess
    import sys

    from popcorn_tpu.io.geotiff import GeoTIFF, write_geotiff

    rng = np.random.default_rng(3)
    pop = rng.random((40, 60)).astype(np.float32)
    fine = str(tmp_path / "pop.tif")
    write_geotiff(fine, pop, transform=(30.0, 1e-4, -1.5, 1e-4))
    outdir = str(tmp_path / "lv")
    subprocess.run(
        [sys.executable, "tools/pool_census_grid.py", "--fine-grid", fine,
         "--cell-px", "10", "--factors", "1", "2", "--out-dir", outdir,
         "--prefix", "k"],
        check=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    df10 = pd.read_csv(os.path.join(outdir, "census_k10.csv"))
    assert len(df10) == 4 * 6
    np.testing.assert_allclose(df10["POP20"].sum(), pop.sum(), rtol=1e-5)
    with GeoTIFF(os.path.join(outdir, "boundaries_k10.tif")) as g:
        ids = g.read(1, squeeze=True)
    # region sums over the id raster equal the census values
    row = df10.iloc[7]
    np.testing.assert_allclose(
        pop[ids == row["idx"]].sum(), row["POP20"], rtol=1e-5
    )
    df20 = pd.read_csv(os.path.join(outdir, "census_k20.csv"))
    assert len(df20) == 2 * 3
    np.testing.assert_allclose(df20["POP20"].sum(), pop.sum(), rtol=1e-5)
