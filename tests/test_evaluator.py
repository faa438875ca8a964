"""Evaluator (run_eval driver) end-to-end on the synthetic region (CPU):
ensemble load from orbax checkpoints, map writes (mean/STD/SCALE/ADJ),
census + adjusted metrics, detail maps with --full."""

import glob
import os

import numpy as np
import pytest

import jax

from popcorn_tpu.config import EvalConfig, ModelConfig
from popcorn_tpu.data.synthetic import make_synthetic_region
from popcorn_tpu.infer.evaluator import Evaluator, load_member
from popcorn_tpu.nn.init import init_popcorn
from popcorn_tpu.train.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("eval_data"))
    paths = make_synthetic_region(root, "rwa", height=192, width=256, seed=21)
    mcfg = ModelConfig(pretrained=False)
    members_dir = tmp_path_factory.mktemp("members")
    cks = []
    consts = None
    for i in range(2):
        params, consts = init_popcorn(jax.random.PRNGKey(100 + i), mcfg)
        p = str(members_dir / f"m{i}")
        save_checkpoint(p, {"params": params, "epoch": 1, "iter": 10})
        cks.append(p)
    return paths, mcfg, cks, consts


def test_load_member_orbax(setup):
    _, _, cks, _ = setup
    params, consts = load_member(cks[0])
    assert "head" in params and "unet" in params
    assert consts is None  # orbax member carries no consts


def test_evaluator_end_to_end(setup, monkeypatch):
    paths, mcfg, cks, consts = setup
    ecfg = EvalConfig(
        target_regions=("rwa",), train_level=("coarse",),
        checkpoints=tuple(cks), fourseasons=False,
    )
    ev = Evaluator(paths, mcfg, ecfg, consts=consts)
    # shrink the patch geometry for the tiny synthetic raster
    from popcorn_tpu.data.dataset import PopulationDataset

    ev.datasets = [
        PopulationDataset(paths, "rwa", mode="test", patchsize=96, overlap=16,
                          fourseasons=False, train_level="coarse")
    ]
    out = ev.test_target(save=True, full=True)

    # metrics at both registered levels, raw and adjusted
    assert any(k.startswith("Population_MainCensus_rwa_coarse") for k in out)
    assert any(k.startswith("Population_MainCensus_rwa_fine100") for k in out)
    assert any(k.startswith("Population_AdjCensus_rwa_coarse") for k in out)
    # adjusted map must match census totals at the train level; not exactly
    # 1.0 because regions falling inside the never-visited halo border
    # (count==0, a faithful reference quirk) cannot be adjusted
    assert out["Population_AdjCensus_rwa_coarse/r2"] > 0.98

    f = ev.experiment_folder
    for tag in ("", "STD", "SCALE_rwa", "SCALE_STD", "ADJ_rwa"):
        assert os.path.exists(os.path.join(f, f"rwa_predictions{tag}.tif")), tag
    # detail maps (--full)
    det = glob.glob(os.path.join(f, "rwa_coarse", "*_totals.tif"))
    assert det, "detail maps missing"


def test_evaluator_spatial_matches_stitched_interior(setup):
    """--spatial (whole-region spatially-partitioned inference) against the
    stitched sliding window on the same members: interiors agree wherever
    the stitch's halo geometry guarantees uncontaminated coverage, the
    stitched map's border ring is zero while the spatial map holds true
    model output, and the census products/metrics come out finite."""
    paths, mcfg, cks, consts = setup
    from popcorn_tpu.data.dataset import PopulationDataset
    from popcorn_tpu.dist.mesh import make_mesh
    from popcorn_tpu.infer.evaluator import load_member
    from popcorn_tpu.infer.sliding import run_sliding_inference
    from popcorn_tpu.infer.spatial import run_spatial_inference

    members = [load_member(p)[0] for p in cks]
    # overlap 32 > the extractor's ~22 px receptive radius: stitched
    # interiors are exact
    ds = PopulationDataset(paths, "rwa", mode="test", patchsize=128,
                           overlap=32, fourseasons=False,
                           train_level="coarse")
    stitched = run_sliding_inference(members, consts, mcfg, ds)
    mesh = make_mesh(8)
    spatial = run_spatial_inference(members, consts, mcfg, ds, mesh=mesh)

    h, w = ds.shape()
    assert spatial["map"].shape == (h, w)
    ov = 32
    assert (stitched["map"][:ov] == 0).all()
    assert np.abs(spatial["map"][:ov]).max() > 0
    m = 2 * ov
    for k in ("map", "map_std", "scale", "scale_std"):
        np.testing.assert_allclose(
            spatial[k][m:-m, m:-m], stitched[k][m:-m, m:-m],
            rtol=2e-4, atol=2e-5, err_msg=k,
        )
    assert (spatial["count"] == 2).all()  # 2 members x 1 season


def test_evaluator_end_to_end_spatial(setup):
    """The --spatial evaluator produces the full product set + metrics."""
    paths, mcfg, cks, consts = setup
    ecfg = EvalConfig(
        target_regions=("rwa",), train_level=("coarse",),
        checkpoints=tuple(cks), fourseasons=False, spatial=True,
    )
    ev = Evaluator(paths, mcfg, ecfg, consts=consts)
    from popcorn_tpu.data.dataset import PopulationDataset

    ev.datasets = [
        PopulationDataset(paths, "rwa", mode="test", patchsize=96, overlap=16,
                          fourseasons=False, train_level="coarse")
    ]
    out = ev.test_target(save=True)
    assert np.isfinite(out["Population_AdjCensus_rwa_coarse/r2"])
    # no zeroed border ring -> every census region is adjustable; totals
    # match the census exactly at the train level
    assert out["Population_AdjCensus_rwa_coarse/r2"] > 0.999
    f = ev.experiment_folder
    for tag in ("", "STD", "SCALE_rwa", "SCALE_STD", "ADJ_rwa"):
        assert os.path.exists(os.path.join(f, f"rwa_predictions{tag}.tif")), tag


@pytest.mark.slow
def test_spatial_inference_2d_mesh_matches_1d(setup):
    """run_spatial_inference on the 2-D (data=2, ensemble=4) mesh — members
    vmapped with the member axis sharded over 'ensemble', rows over 'data'
    — must match the 1-D scan fold (summation order differs: allclose)."""
    paths, mcfg, cks, consts = setup
    from popcorn_tpu.data.dataset import PopulationDataset
    from popcorn_tpu.dist.mesh import make_mesh
    from popcorn_tpu.infer.evaluator import load_member
    from popcorn_tpu.infer.spatial import run_spatial_inference

    members = [load_member(p)[0] for p in cks]
    ds = PopulationDataset(paths, "rwa", mode="test", patchsize=128,
                           overlap=32, fourseasons=False,
                           train_level="coarse")
    m1 = run_spatial_inference(members, consts, mcfg, ds, mesh=make_mesh(8))
    m2 = run_spatial_inference(
        members, consts, mcfg, ds, mesh=make_mesh(2, n_ensemble=4)
    )
    for k in ("map", "map_std", "scale", "scale_std"):
        np.testing.assert_allclose(m2[k], m1[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)


@pytest.mark.slow
def test_spatial_inference_fourseasons_viirs(tmp_path_factory):
    """Spatial eval folds all four seasons and carries VIIRS: count is
    members x seasons everywhere and the maps stay finite; interiors
    match the stitched path per season-averaged semantics."""
    root = str(tmp_path_factory.mktemp("eval_fs"))
    paths = make_synthetic_region(root, "rwa", height=192, width=256,
                                  seed=33, with_viirs=True)
    mcfg = ModelConfig(pretrained=False, viirs=True)
    params, consts = init_popcorn(jax.random.PRNGKey(7), mcfg)

    from popcorn_tpu.data.dataset import PopulationDataset
    from popcorn_tpu.dist.mesh import make_mesh
    from popcorn_tpu.infer.sliding import run_sliding_inference
    from popcorn_tpu.infer.spatial import run_spatial_inference

    ds = PopulationDataset(paths, "rwa", mode="test", patchsize=128,
                           overlap=32, fourseasons=True, viirs=True,
                           train_level="coarse")
    spatial = run_spatial_inference([params], consts, mcfg, ds,
                                    mesh=make_mesh(8))
    assert (spatial["count"] == 4).all()  # 1 member x 4 seasons
    assert np.isfinite(spatial["map"]).all()

    stitched = run_sliding_inference([params], consts, mcfg, ds)
    m = 64
    np.testing.assert_allclose(
        spatial["map"][m:-m, m:-m], stitched["map"][m:-m, m:-m],
        rtol=2e-4, atol=2e-5,
    )
