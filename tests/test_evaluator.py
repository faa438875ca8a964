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
