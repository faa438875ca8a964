"""End-to-end training/eval on the synthetic region (CPU, tiny shapes):
train step runs, loss is finite and improves, memory tiers engage,
checkpoint round-trips, and the in-training sliding-window test produces
census metrics — the full run_train.py capability in miniature."""

import os

import numpy as np
import pytest

from popcorn_tpu.config import ModelConfig, TrainConfig
from popcorn_tpu.data.synthetic import make_synthetic_region
from popcorn_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("popdata_e2e"))
    return make_synthetic_region(
        root, "rwa", height=256, width=384, n_regions=(3, 4), seed=11
    )


@pytest.fixture(scope="module")
def trainer(synth, tmp_path_factory):
    mcfg = ModelConfig(pretrained=True, biasinit=0.9407)
    tcfg = TrainConfig(
        target_regions=("rwa",),
        target_regions_train=("rwa",),
        train_level=("coarse",),
        num_epochs=2,
        bucket_ladder=(128, 256, 512),
        logstep_train=2,
        lam_weak=100.0,
        save_dir=str(tmp_path_factory.mktemp("outputs")),
        val_every_n_epochs=100,  # don't auto-test during .train()
    )
    return Trainer(synth, mcfg, tcfg, inference_patch=128, inference_overlap=16)


@pytest.mark.slow
def test_train_epoch_runs_and_improves(trainer):
    import jax

    p0 = jax.tree.map(np.array, trainer.params)
    losses = []
    for _ in range(2):
        stats = trainer.train_epoch()
        trainer.info["epoch"] += 1
    # parameters changed
    p1 = trainer.params
    diff = np.max(np.abs(p1["head"]["l4"]["b"] - p0["head"]["l4"]["b"]))
    assert diff > 0, "head params did not update"
    # frozen consts untouched by construction (not in optimizer); loss logged
    log = os.path.join(trainer.experiment_folder, "metrics.jsonl")
    assert os.path.exists(log)
    import json

    recs = [json.loads(l) for l in open(log)]
    tr = [r for r in recs if "optimization_loss/train" in r]
    assert tr and all(np.isfinite(r["optimization_loss/train"]) for r in tr)
    # r2 ring buffer produced a value
    assert any("Population_weak/r2/train" in r for r in recs)


def test_memory_tiers(trainer):
    batch = {"S2": np.zeros((2, 256, 256, 4), np.float32)}
    assert trainer._tier_flags(batch) == {
        "encoder_no_grad": False, "unet_no_grad": False,
    }
    trainer.tcfg.limit1 = 1000
    trainer.tcfg.limit2 = 100_000
    trainer.tcfg.limit3 = 120_000
    assert trainer._tier_flags(batch) is None  # skip: 131k > 120k limit3
    trainer.tcfg.limit3 = 13_000_000
    assert trainer._tier_flags(batch) == {
        "encoder_no_grad": True, "unet_no_grad": True,
    }
    trainer.tcfg.limit1 = trainer.tcfg.limit2 = 9_000_000


def test_checkpoint_roundtrip(trainer, tmp_path):
    import jax

    trainer.save_model("last")
    path = os.path.join(trainer.experiment_folder, "last_model")
    assert os.path.exists(path)
    before = jax.tree.map(np.array, trainer.params)
    # perturb, then resume
    trainer.params = jax.tree.map(lambda x: x + 1.0, trainer.params)
    trainer.resume(path)
    after = trainer.params
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert trainer.info["epoch"] >= 1


def test_target_test_and_maps(trainer):
    out = trainer.test_target(save=True)
    keys = [k for k in out if k.endswith("/r2")]
    assert keys, f"no census metrics produced: {list(out)}"
    for k, v in out.items():
        assert np.isfinite(v), f"{k} not finite"
    pred_tif = os.path.join(trainer.experiment_folder, "rwa_predictions.tif")
    assert os.path.exists(pred_tif)
    from popcorn_tpu.io.geotiff import GeoTIFF

    with GeoTIFF(pred_tif) as g:
        assert g.shape == (256, 384)
        m = g.read(1, squeeze=True)
        assert np.isfinite(m).all() and (m >= 0).all()


def test_lr_schedule(trainer):
    from popcorn_tpu.train.state import step_lr

    assert step_lr(1e-4, 0, 5, 0.75) == 1e-4
    assert step_lr(1e-4, 4, 5, 0.75) == 1e-4
    assert abs(step_lr(1e-4, 5, 5, 0.75) - 0.75e-4) < 1e-12
    assert abs(step_lr(1e-4, 10, 5, 0.75) - 0.5625e-4) < 1e-12


def test_spatial_train_epoch(synth, tmp_path_factory):
    """--spatial_train end-to-end: the trainer builds a mesh over all
    devices, commits each batch with rows sharded over 'data', and an
    epoch runs to finite losses (CPU mesh, 8 virtual devices)."""
    mcfg = ModelConfig(pretrained=True, biasinit=0.9407)
    tcfg = TrainConfig(
        target_regions=("rwa",),
        target_regions_train=("rwa",),
        train_level=("coarse",),
        num_epochs=1,
        weak_batch_size=1,
        bucket_ladder=(128, 256, 512),
        logstep_train=2,
        save_dir=str(tmp_path_factory.mktemp("outputs_sp")),
        val_every_n_epochs=100,
        spatial_train=True,
        max_samples=2,
    )
    tr = Trainer(synth, mcfg, tcfg, inference_patch=128, inference_overlap=16)
    assert tr.mesh is not None and tr.mesh.shape["data"] == 8
    import jax

    # the batch really is row-sharded on device
    dev, host, _ = next(tr._lookahead_batches(0))
    sh = dev["S2"].sharding
    spec = getattr(sh, "spec", None)
    assert spec is not None and tuple(spec)[:2] == (None, "data"), spec
    stats = tr.train_epoch()
    assert np.isfinite(stats["optimization_loss/train"])
