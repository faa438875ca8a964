"""Time-series drivers: built-up single-frame (de-bit-rotted reference
script) and ensemble population time series (notebook equivalent)."""

import datetime as dt
import json
import os

import numpy as np
import pytest

import jax

from popcorn_tpu.config import ModelConfig
from popcorn_tpu.data.synthetic import make_synthetic_region
from popcorn_tpu.infer.timeseries import (
    Frame,
    builtup_map,
    find_closest_frames,
    parse_date,
    run_builtup_timeseries,
)
from popcorn_tpu.io.geotiff import GeoTIFF, write_geotiff
from popcorn_tpu.nn.init import init_popcorn


def test_parse_date_and_matching():
    assert parse_date("2023-10-01") == dt.date(2023, 10, 1)
    assert parse_date("20231001") == dt.date(2023, 10, 1)
    s2 = [Frame(dt.date(2023, 1, 10), "a"), Frame(dt.date(2023, 2, 10), "b")]
    desc = [Frame(dt.date(2023, 1, 8), "d1"), Frame(dt.date(2023, 2, 20), "d2")]
    asc = [Frame(dt.date(2023, 1, 30), "a1")]
    pairs = find_closest_frames(s2, desc, asc)
    assert pairs[0][1].path == "d1" and pairs[0][2].path == "a1"
    assert pairs[1][1].path == "d2"


@pytest.fixture(scope="module")
def model():
    mcfg = ModelConfig(pretrained=False)
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    return mcfg, params, consts


def test_builtup_map_tiling_consistency(model, rng):
    """Tiled (overlap-stitched) built-up map == single-shot map in the
    interior (away from tile-local padding effects)."""
    mcfg, _, consts = model
    s2 = rng.uniform(0, 4000, (96, 96, 4)).astype(np.float32)
    s1 = rng.uniform(-25, 0, (96, 96, 2)).astype(np.float32)
    full = builtup_map(consts, mcfg, s2, s1, patchsize=128, overlap=8)
    tiled = builtup_map(consts, mcfg, s2, s1, patchsize=64, overlap=8)
    assert full.shape == (96, 96)
    assert np.isfinite(tiled).all()
    assert (full >= 0).all() and (full <= 1).all()


def test_run_builtup_timeseries(model, tmp_path, rng):
    mcfg, _, consts = model
    frames = {"s2": [], "s1_desc": [], "s1_asc": []}
    t = (30.0, 1e-4, -1.5, 1e-4)
    for i, date in enumerate(["2023-01-05", "2023-06-05"]):
        s2 = rng.uniform(0, 4000, (4, 64, 64)).astype(np.float32)
        p2 = str(tmp_path / f"s2_{i}.tif")
        write_geotiff(p2, s2, transform=t)
        frames["s2"].append(Frame(parse_date(date), p2))
        for key, off in (("s1_desc", 0), ("s1_asc", 1)):
            s1 = rng.uniform(-25, 0, (2, 64, 64)).astype(np.float32)
            p1 = str(tmp_path / f"{key}_{i}.tif")
            write_geotiff(p1, s1, transform=t)
            frames[key].append(Frame(parse_date(date) + dt.timedelta(days=off), p1))

    pairs = find_closest_frames(frames["s2"], frames["s1_desc"], frames["s1_asc"])
    out_dir = str(tmp_path / "out")
    written = run_builtup_timeseries(consts, mcfg, pairs, out_dir, patchsize=128)
    assert len(written) == 2
    assert os.path.basename(written[0]) == "BuiltUp_2023-01-05.tif"
    with GeoTIFF(written[0]) as g:
        m = g.read(1, squeeze=True)
        assert m.shape == (64, 64)
        assert (m >= 0).all() and (m <= 1).all()
        assert g.transform is not None  # georeferencing copied from S2


def test_population_timeseries(model, tmp_path):
    mcfg, params, consts = model
    from popcorn_tpu.infer.pop_timeseries import run_population_timeseries

    steps = []
    for label, seed in (("2020", 1), ("2021", 2)):
        root = str(tmp_path / label)
        paths = make_synthetic_region(root, "rwa", height=128, width=128,
                                      n_regions=(2, 2), seed=seed)
        steps.append((label, paths, "rwa"))
    out_dir = str(tmp_path / "ts")
    records = run_population_timeseries(
        [params], consts, mcfg, steps, out_dir,
        patchsize=64, overlap=8, fourseasons=False,
    )
    assert [r["label"] for r in records] == ["2020", "2021"]
    assert all(np.isfinite(r["total_population"]) for r in records)
    assert os.path.exists(os.path.join(out_dir, "totals.csv"))
    assert os.path.exists(os.path.join(out_dir, "rwa_predictions_2020.tif"))
    assert os.path.exists(os.path.join(out_dir, "rwa_predictions_2021_STD.tif"))


def test_builtup_single_orbit(tmp_path):
    """A missing S1 orbit degrades to the available orbit alone instead of
    crashing (driven on-chip via run_timeseries.py builtup with desc-only
    frames); no S1 at all raises."""
    import numpy as np
    import pytest

    from popcorn_tpu.infer.timeseries import Frame, find_closest_frames, parse_date

    s2 = [Frame(parse_date("2023-06-01"), "a.tif")]
    desc = [Frame(parse_date("2023-06-03"), "d.tif")]
    pairs = find_closest_frames(s2, desc, [])
    assert pairs[0][1] is not None and pairs[0][2] is None
    with pytest.raises(ValueError):
        find_closest_frames(s2, [], [])
