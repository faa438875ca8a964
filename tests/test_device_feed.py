"""Device-resident mosaic feed (infer/device_feed.py): bit-parity with the
host-patch feed, NaN-season fallback, and the device-finalized map path.

The reference streams every eval patch host->GPU (run_eval.py:71-135);
the device feed uploads each season's mosaics once and crops on device —
these tests pin that the two traversals produce identical maps (same
compiled prep/members executables, same stitch adds, same finalize math).
"""

import os

import numpy as np
import pytest

import jax

from popcorn_tpu.config import SEASONS, ModelConfig
from popcorn_tpu.data.dataset import PopulationDataset
from popcorn_tpu.data.normalize import NormStats
from popcorn_tpu.data.synthetic import make_synthetic_region
from popcorn_tpu.infer.sliding import run_sliding_inference
from popcorn_tpu.io.geotiff import GeoTIFF, write_geotiff
from popcorn_tpu.nn.init import init_head, init_popcorn


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("devfeed_data"))
    # 198 is NOT a multiple of the pack factor 4: the bottom border patch
    # starts at x=70, exercising the misaligned packed stitch-add inside
    # the device pass
    paths = make_synthetic_region(root, "rwa", height=198, width=204, seed=31)
    mcfg = ModelConfig(pretrained=False, fused_head=False, compute_dtype="float32")
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    members = [params, dict(params, head=init_head(jax.random.PRNGKey(1), biasinit=0.9))]
    return paths, mcfg, members, consts


def _dataset(paths):
    return PopulationDataset(
        paths, "rwa", mode="test", patchsize=128, overlap=16,
        s1=True, s2=True, nir=True, fourseasons=True,
    )


def test_device_feed_matches_host_feed(setup):
    paths, mcfg, members, consts = setup
    ds = _dataset(paths)
    t_host, t_dev = {}, {}
    host = run_sliding_inference(
        members, consts, mcfg, ds, stats=NormStats(),
        device_feed="off", timings=t_host,
    )
    dev = run_sliding_inference(
        members, consts, mcfg, ds, stats=NormStats(),
        device_feed="on", timings=t_dev,
    )
    assert t_dev["n_patches"] == t_host["n_patches"] > 0
    assert t_dev["upload_s"] > 0  # seasons were uploaded, not patches
    for k in host:
        np.testing.assert_array_equal(np.asarray(dev[k]), np.asarray(host[k]))
    ds.close()


@pytest.mark.slow
def test_device_feed_return_device(setup):
    paths, mcfg, members, consts = setup
    ds = _dataset(paths)
    dev = run_sliding_inference(
        members, consts, mcfg, ds, stats=NormStats(),
        device_feed="auto", return_device=True,
    )
    assert all(isinstance(v, jax.Array) for v in dev.values())
    host = run_sliding_inference(
        members, consts, mcfg, ds, stats=NormStats(), device_feed="off",
    )
    np.testing.assert_array_equal(np.asarray(dev["map"]), host["map"])
    ds.close()


@pytest.mark.slow
def test_device_feed_nan_season_falls_back(setup, tmp_path):
    """A season whose S1 mosaic contains NaNs takes the host feed's healing
    path (PopulationDataset.py:418-441); other seasons stay on device. The
    stitched result must equal the pure host-feed run."""
    paths, mcfg, members, consts = setup
    import shutil

    s1_path = paths.modality_path("rwa", "S1", SEASONS[1])
    template = str(tmp_path / "template.tif")
    shutil.copy(s1_path, template)
    with GeoTIFF(s1_path) as g:
        arr = g.read()
    backup = arr.copy()
    arr[:, 40:44, 50:54] = np.nan  # <5% of any patch -> interpolate path
    write_geotiff(s1_path, arr, template=template)
    try:
        ds = _dataset(paths)
        t_dev = {}
        dev = run_sliding_inference(
            members, consts, mcfg, ds, stats=NormStats(),
            device_feed="auto", timings=t_dev,
        )
        host = run_sliding_inference(
            members, consts, mcfg, ds, stats=NormStats(), device_feed="off",
        )
        # tile-level hybrid: ONLY the patch overlapping the NaN tile takes
        # the healing path; the NaN season's other patches stay on device
        assert t_dev["n_patches"] == len(ds.patch_indices)
        assert t_dev["n_device_patches"] == len(ds.patch_indices) - 1
        # the healed season is stitched AFTER the device seasons, so the
        # f32 accumulation order differs -> ulp-level tolerance (count is
        # order-invariant and stays exact)
        np.testing.assert_array_equal(np.asarray(dev["count"]), np.asarray(host["count"]))
        # atol covers the sqrt(sum_sq - n*mean^2) cancellation on
        # near-zero-std pixels, where an ulp of reordering is amplified
        for k in ("map", "map_std", "scale", "scale_std"):
            np.testing.assert_allclose(
                np.asarray(dev[k]), np.asarray(host[k]), rtol=1e-5, atol=1e-5
            )
        ds.close()
    finally:
        write_geotiff(s1_path, backup, template=template)


def test_device_census_matches_host(setup):
    """DeviceCensus (device segment-sum aggregation + gather adjust) agrees
    with the host-path census functions on the same map."""
    import pandas as pd

    from popcorn_tpu.agg.census_agg import (
        DeviceCensus,
        adjust_map_to_census,
        convert_popmap_to_census,
    )

    paths, _, _, _ = setup
    ds = _dataset(paths)
    with GeoTIFF(ds.boundary_paths["coarse"]) as g:
        boundary = g.read(1, squeeze=True)
    census = pd.read_csv(ds.census_paths["coarse"])
    rng = np.random.default_rng(3)
    pred = rng.uniform(0, 5, boundary.shape).astype(np.float32)
    pred_dev = jax.device_put(pred)

    dc = DeviceCensus(boundary, census)
    pc_d, gt_d = dc.convert(pred_dev)
    pc_h, gt_h = convert_popmap_to_census(pred, boundary, census)
    np.testing.assert_array_equal(gt_d, gt_h)
    np.testing.assert_allclose(pc_d, pc_h, rtol=1e-5)

    adj_d = np.asarray(dc.adjust(pred_dev))
    adj_h = adjust_map_to_census(pred, boundary, census)
    np.testing.assert_allclose(adj_d, adj_h, rtol=1e-4, atol=1e-5)
    ds.close()


def test_device_feed_on_requires_device_stitch(setup):
    paths, mcfg, members, consts = setup
    ds = _dataset(paths)
    with pytest.raises(ValueError, match="device_feed='on'"):
        run_sliding_inference(
            members, consts, mcfg, ds, stats=NormStats(),
            device_feed="on", device_stitch="host",
        )
    ds.close()
