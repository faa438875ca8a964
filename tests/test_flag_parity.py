"""Flag/dataset parity round 2: -binp/-sinp end-to-end, VIIRS modality,
--skip-first, -ms, --save-model best (VERDICT round 1 items 4 and 7).

The reference parses --skip-first/-ms/'best' but never implements them
(arguments/train.py:42,53,58); we implement the stated intent and test it.
"""

import os

import numpy as np
import pytest

import jax

from popcorn_tpu.config import ModelConfig, TrainConfig
from popcorn_tpu.data.dataset import PopulationDataset
from popcorn_tpu.data.feed import WeaksupFeed
from popcorn_tpu.data.normalize import NormStats, normalize_and_assemble
from popcorn_tpu.data.synthetic import make_synthetic_region
from popcorn_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("popdata_flags"))
    return make_synthetic_region(
        root, "rwa", height=256, width=384, n_regions=(3, 4), seed=13,
        with_buildings=True, with_viirs=True,
    )


# -- VIIRS modality -----------------------------------------------------------


def test_viirs_read_weaksup_and_test(synth):
    rng = np.random.default_rng(0)
    ds = PopulationDataset(
        synth, "rwa", mode="weaksup", train_level="coarse", viirs=True,
        patchsize=None, overlap=None,
    )
    item = ds.get_admin_item(0, rng)
    assert "VIIRS" in item and item["VIIRS"].ndim == 3 and item["VIIRS"].shape[-1] == 1
    assert item["VIIRS"].shape[:2] == item["S2"].shape[:2]

    ds_t = PopulationDataset(
        synth, "rwa", mode="test", patchsize=128, overlap=16, viirs=True
    )
    t = ds_t.get_test_item(0)
    assert t["VIIRS"].shape == (128, 128, 1)
    ds.close(), ds_t.close()


def test_viirs_flows_to_model_input(synth):
    rng = np.random.default_rng(0)
    ds = PopulationDataset(
        synth, "rwa", mode="weaksup", train_level="coarse", viirs=True,
        patchsize=None, overlap=None,
    )
    feed = WeaksupFeed([ds], batch_size=1, bucket_ladder=(128, 256, 512),
                       seed=0, augment=False, drop_last=False)
    batch = next(iter(feed.epoch(0)))
    assert "VIIRS" in batch and batch["VIIRS"].shape[-1] == 1
    x = normalize_and_assemble(
        {"S2": batch["S2"], "S1": batch["S1"], "VIIRS": batch["VIIRS"]},
        NormStats(),
    )
    assert x.shape[-1] == 7  # 4 S2 + 2 S1 + 1 VIIRS
    # the DDA reorder ignores the trailing VIIRS channel (reference evident
    # semantics: calculate_input_channels never counts VIIRS)
    from popcorn_tpu.nn.popcorn import reorder_to_dda

    x6 = reorder_to_dda(x, s1=True, s2=True, nir=True)
    assert x6.shape[-1] == 6
    ds.close()


@pytest.mark.slow
def test_viirs_train_step(synth, tmp_path_factory):
    mcfg = ModelConfig(pretrained=False, viirs=True)
    tcfg = TrainConfig(
        num_epochs=1, bucket_ladder=(128, 256, 512), logstep_train=100,
        save_dir=str(tmp_path_factory.mktemp("out_viirs")),
        val_every_n_epochs=100, max_samples=2, save_model="no",
    )
    tr = Trainer(synth, mcfg, tcfg, inference_patch=128, inference_overlap=16)
    stats = tr.train_epoch()
    assert np.isfinite(stats.get("optimization_loss", np.nan))


# -- -binp / -sinp end-to-end -------------------------------------------------


def test_binp_dataset_reads_buildings(synth):
    rng = np.random.default_rng(0)
    ds = PopulationDataset(
        synth, "rwa", mode="weaksup", train_level="coarse",
        sentinelbuildings=False, patchsize=None, overlap=None,
    )
    item = ds.get_admin_item(0, rng)
    assert "building_counts" in item and "building_segmentation" in item
    ds.close()


def test_sinp_segmentation_policy(synth):
    rng = np.random.default_rng(0)
    ds = PopulationDataset(
        synth, "rwa", mode="weaksup", train_level="coarse",
        sentinelbuildings=False, patchsize=None, overlap=None,
    )
    # -binp without -sinp: segmentation dropped (utils/utils.py:158-159)
    feed = WeaksupFeed([ds], batch_size=1, bucket_ladder=(128, 256, 512),
                       seed=0, augment=False, drop_last=False,
                       building_input=True, segmentation_input=False)
    b = next(iter(feed.epoch(0)))
    assert "building_counts" in b and "building_segmentation" not in b
    # -binp -sinp: segmentation kept
    feed2 = WeaksupFeed([ds], batch_size=1, bucket_ladder=(128, 256, 512),
                        seed=0, augment=False, drop_last=False,
                        building_input=True, segmentation_input=True)
    b2 = next(iter(feed2.epoch(0)))
    assert "building_segmentation" in b2
    ds.close()


@pytest.mark.slow
def test_binp_train_and_eval_end_to_end(synth, tmp_path_factory):
    """Train + sliding eval with pre-rasterised buildings and NO on-the-fly
    building score — the wiring that crashed with KeyError in round 1
    (VERDICT weak #3)."""
    mcfg = ModelConfig(
        pretrained=False, occupancy_model=True, sentinel_buildings=False,
        building_input=True,
    )
    tcfg = TrainConfig(
        num_epochs=1, bucket_ladder=(128, 256, 512), logstep_train=100,
        save_dir=str(tmp_path_factory.mktemp("out_binp")),
        val_every_n_epochs=100, max_samples=4, save_model="no",
    )
    tr = Trainer(synth, mcfg, tcfg, inference_patch=128, inference_overlap=16)
    stats = tr.train_epoch()
    assert np.isfinite(stats.get("optimization_loss", np.nan))
    # in-training sliding test reads counts from the gb raster
    out = tr.test_target(save=False)
    assert any("MainCensus" in k for k in out)
    assert all(np.isfinite(v) for v in out.values())


def test_missing_counts_clear_error(synth):
    """occupancy without -senbuilds and without counts in the batch must
    raise a clear error, not KeyError (round-1 infer/sliding.py:88-94)."""
    from popcorn_tpu.infer.sliding import make_patch_forward
    from popcorn_tpu.nn.init import init_popcorn

    mcfg = ModelConfig(
        pretrained=False, occupancy_model=True, sentinel_buildings=False
    )
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    fwd = make_patch_forward(mcfg, consts, NormStats(), 1)
    from popcorn_tpu.infer.sliding import stack_ensemble

    batch = {
        "S2": np.zeros((1, 64, 64, 4), np.float32),
        "S1": np.zeros((1, 64, 64, 2), np.float32),
        "mask": np.ones((1, 64, 64), np.float32),
        "valid": np.ones((1,), np.float32),
    }
    with pytest.raises(ValueError, match="building_counts"):
        fwd(stack_ensemble([params]), batch)


# -- --skip-first / -ms / --save-model best ------------------------------------


@pytest.mark.slow
def test_skip_first_epoch_does_not_update(synth, tmp_path_factory):
    mcfg = ModelConfig(pretrained=False)
    tcfg = TrainConfig(
        num_epochs=2, bucket_ladder=(128, 256, 512), logstep_train=1,
        save_dir=str(tmp_path_factory.mktemp("out_skip")),
        val_every_n_epochs=100, skip_first=True, max_samples=2,
        save_model="no", weak_batch_size=1,
    )
    tr = Trainer(synth, mcfg, tcfg, inference_patch=128, inference_overlap=16)
    p0 = jax.tree.map(np.array, tr.params)
    tr.train_epoch()  # epoch 0: no optimization
    assert np.array_equal(np.asarray(tr.params["head"]["l4"]["b"]), p0["head"]["l4"]["b"])
    tr.info["epoch"] += 1
    tr.train_epoch()  # epoch 1: optimizes
    assert not np.array_equal(
        np.asarray(tr.params["head"]["l4"]["b"]), p0["head"]["l4"]["b"]
    )


def test_max_samples_caps_epoch(synth):
    ds = PopulationDataset(
        synth, "rwa", mode="weaksup", train_level="coarse",
        patchsize=None, overlap=None,
    )
    feed = WeaksupFeed([ds], batch_size=1, bucket_ladder=(128, 256, 512),
                       seed=0, augment=False, drop_last=False, max_samples=3)
    n = sum(len(b["y"]) for b in feed.epoch(0))
    assert n <= 3
    ds.close()


def test_save_model_best(synth, tmp_path_factory):
    mcfg = ModelConfig(pretrained=False)
    tcfg = TrainConfig(
        num_epochs=1, bucket_ladder=(128, 256, 512), logstep_train=100,
        save_dir=str(tmp_path_factory.mktemp("out_best")),
        val_every_n_epochs=100, weak_validation=True, save_model="best",
        max_samples=2,
    )
    tr = Trainer(synth, mcfg, tcfg, inference_patch=128, inference_overlap=16)
    out = tr.validate_weak()
    assert "optimization_loss" in out and np.isfinite(out["optimization_loss"])
    assert os.path.isdir(os.path.join(tr.experiment_folder, "best_model"))
    assert tr.best_optimization_loss == out["optimization_loss"]
    # a worse re-validation must not overwrite best
    tr.best_optimization_loss = -1.0
    tr.validate_weak()
    assert tr.best_optimization_loss == -1.0


# -- CLI round-trip -------------------------------------------------------------


def test_cli_flags_roundtrip():
    from popcorn_tpu.cli.args import (
        model_config_from_args,
        train_config_from_args,
        train_parser,
    )

    a = train_parser().parse_args(
        "-S2 -NIR -S1 -VIIRS -treg rwa -tregtrain rwa -occmodel -binp -sinp "
        "--skip-first -ms 7 --save-model best".split()
    )
    m = model_config_from_args(a)
    assert m.viirs and m.building_input and m.segmentation_input
    assert not m.sentinel_buildings
    t = train_config_from_args(a)
    assert t.skip_first and t.max_samples == 7 and t.save_model == "best"


def test_eval_config_validates_patch_geometry():
    """ADVICE round 2: patchsize <= 2*overlap degenerates the halo mask;
    an odd patchsize silently drops the packed engine — validate/warn."""
    import warnings

    import pytest as _pytest

    from popcorn_tpu.config import EvalConfig

    with _pytest.raises(ValueError, match="patchsize"):
        EvalConfig(patchsize=256, overlap=128)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        EvalConfig(patchsize=2046, overlap=128)
    assert any("packed" in str(x.message) for x in w)
    EvalConfig(patchsize=2048, overlap=128)  # canonical: no complaint


def test_quantize_conflicts_with_pallas_stream_off():
    """ADVICE round 2: quantize='int8' runs through the fused Pallas
    kernels; an explicit pallas_stream=False must raise, not be ignored."""
    import pytest as _pytest

    from popcorn_tpu.config import ModelConfig
    from popcorn_tpu.nn.popcorn import use_pallas_stream

    with _pytest.raises(ValueError, match="pallas_stream"):
        use_pallas_stream(ModelConfig(quantize="int8", pallas_stream=False))
    assert use_pallas_stream(ModelConfig(quantize="int8"))
    assert not use_pallas_stream(ModelConfig(quantize="int8"), train=True)


def test_quantize_train_cli_is_explicit_eval_only():
    """ADVICE round 2 / VERDICT r4 #4: the eval CLI's --quantize selects
    quantized inference; the train CLI never quantizes the TRAIN steps —
    its only quantization surface is the EXPLICIT --quantize_eval, which
    feeds ModelConfig.quantize for the in-training evaluation paths (the
    inference-only gates in nn/popcorn.py keep train steps f32 either
    way)."""
    from popcorn_tpu.cli.args import (
        eval_parser,
        model_config_from_args,
        train_parser,
    )

    ev = eval_parser().parse_args(
        ["-r", "x", "--quantize", "int8"]
    )
    assert ev.quantize == "int8"
    tr = train_parser().parse_args([])
    assert not hasattr(tr, "quantize")
    assert tr.quantize_eval is None
    tr = train_parser().parse_args(["--quantize_eval", "int8s"])
    assert model_config_from_args(tr).quantize == "int8s"


# -- examples/commands.md doc-drift guard --------------------------------------


def _doc_commands():
    """Yield (program, merged command string) for every code line in
    examples/commands.md, with backslash continuations joined."""
    path = os.path.join(os.path.dirname(__file__), "..", "examples", "commands.md")
    with open(path) as f:
        lines = f.read().splitlines()
    buf = ""
    for ln in lines:
        if not ln.startswith("    "):  # markdown code blocks are indented
            # ADVICE r3: a prose/blank line ends any pending backslash
            # continuation — never splice two unrelated code blocks.
            buf = ""
            continue
        buf += " " + ln.strip()
        if buf.endswith("\\"):
            buf = buf[:-1]
            continue
        cmd, buf = buf.strip(), ""
        for prog in ("run_train.py", "run_eval.py", "run_timeseries.py"):
            if f"python {prog}" in cmd:
                yield prog, cmd


def _flags_in(cmd):
    for tok in cmd.split():
        if not tok.startswith("-") or tok in ("-", "--"):
            continue
        try:
            float(tok)  # skip negative numbers (bbox coords)
            continue
        except ValueError:
            pass
        yield tok.split("=")[0]


def _source_flags(py_path, start=None, stop=None):
    """Option strings declared via add_argument in a CLI module's source
    (the builtup parser is constructed inline in main()).  ``start``/``stop``
    scope the scan to the source between those two markers so per-subcommand
    flag sets don't bleed into each other (ADVICE round 3)."""
    import re

    with open(py_path) as f:
        src = f.read()
    if start is not None:
        src = src.split(start, 1)[1]
    if stop is not None:
        src = src.split(stop, 1)[0]
    return set(re.findall(r'add_argument\(\s*"(-[^"]+)"(?:,\s*"(-[^"]+)")?', src))


def test_examples_commands_flags_exist():
    """Every flag shown in examples/commands.md must be accepted by the
    parser of the CLI it documents — the command-doc analogue of the
    round-2 citation-drift finding."""
    from popcorn_tpu.cli.args import eval_parser, train_parser

    known = {
        "run_train.py": {
            s for a in train_parser()._actions for s in a.option_strings
        },
        "run_eval.py": {
            s for a in eval_parser()._actions for s in a.option_strings
        },
    }
    ts_src = os.path.join(
        os.path.dirname(__file__), "..", "popcorn_tpu", "cli", "timeseries.py"
    )
    # ADVICE r3: validate each run_timeseries.py subcommand against ITS
    # parser's flags only — the builtup inline parser vs the population
    # eval_parser extension — so a builtup-only flag documented on a
    # population command (or vice versa) fails the guard.
    known["run_timeseries.py builtup"] = {
        f
        for pair in _source_flags(
            ts_src, start='mode == "builtup"', stop='mode == "population"'
        )
        for f in pair
        if f
    }
    known["run_timeseries.py population"] = {
        s for a in eval_parser()._actions for s in a.option_strings
    } | {
        f
        for pair in _source_flags(ts_src, start='mode == "population"')
        for f in pair
        if f
    }

    checked = 0
    for prog, cmd in _doc_commands():
        key = prog
        if prog == "run_timeseries.py":
            mode = next(
                (m for m in ("builtup", "population") if f" {m}" in cmd), None
            )
            assert mode is not None, (
                f"examples/commands.md run_timeseries.py command lacks a "
                f"builtup/population subcommand: {cmd!r}"
            )
            key = f"{prog} {mode}"
        for flag in _flags_in(cmd):
            assert flag in known[key], (
                f"examples/commands.md documents {flag!r} for {key}, "
                f"which its parser does not accept"
            )
            checked += 1
    assert checked > 40  # the doc really was parsed
