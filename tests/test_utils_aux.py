"""Aux subsystem smoke tests: visualization, profiling, logging."""

import json
import os

import numpy as np
import pytest

from popcorn_tpu.utils.log import MetricsLogger, NumberList, new_log
from popcorn_tpu.utils.profiling import Stopwatch, device_memory_stats
from popcorn_tpu.utils.viz import save_quicklook


def test_quicklook(tmp_path, rng):
    s2 = rng.uniform(0, 4000, (32, 32, 3)).astype(np.float32)
    s1 = rng.uniform(-25, 0, (32, 32)).astype(np.float32)
    prob = rng.random((32, 32)).astype(np.float32)
    pop = rng.random((32, 32)).astype(np.float32) * 5
    p = str(tmp_path / "ql.png")
    save_quicklook(p, s2=s2, s1=s1, builtup=prob, pop=pop)
    assert os.path.getsize(p) > 1000


def test_stopwatch_and_memstats():
    sw = Stopwatch()
    with sw.section("a"):
        sum(range(1000))
    with sw.section("a"):
        pass
    s = sw.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0
    # CPU devices have no memory_stats -> {}
    assert isinstance(device_memory_stats(), dict)


def test_new_log_and_metrics(tmp_path):
    folder, n, randn = new_log(str(tmp_path / "out"), {"lr": 1e-4})
    assert os.path.exists(os.path.join(folder, "args.csv"))
    lg = MetricsLogger(folder)
    lg.log({"loss": 1.5, "tag": "x"}, step=3)
    rec = json.loads(open(os.path.join(folder, "metrics.jsonl")).read())
    assert rec["loss"] == 1.5 and rec["step"] == 3

    nl = NumberList(3)
    nl.add([1, 2, 3, 4])
    assert nl.get() == [2.0, 3.0, 4.0]


def test_log_histogram(tmp_path):
    folder, _, _ = new_log(str(tmp_path))
    lg = MetricsLogger(folder)
    lg.log_histogram("param/head/l1/w", np.random.default_rng(0).normal(size=256), 7)
    path = os.path.join(folder, "histograms.jsonl")
    rec = json.loads(open(path).read().strip())
    assert rec["name"] == "param/head/l1/w" and rec["step"] == 7
    assert sum(rec["counts"]) == 256 and len(rec["counts"]) == 64
    # empty / non-finite input is a no-op, not a crash
    lg.log_histogram("x", np.asarray([np.nan, np.inf]), 8)
    assert len(open(path).read().strip().splitlines()) == 1


def test_train_step_watch_aux():
    """watch_every>0 puts per-layer grad norms into the step aux
    (the wandb.watch equivalent, reference run_train.py:75)."""
    import jax

    from popcorn_tpu.config import ModelConfig, TrainConfig
    from popcorn_tpu.data.normalize import NormStats
    from popcorn_tpu.nn.init import init_popcorn
    from popcorn_tpu.train.state import make_optimizer, make_train_step

    mcfg = ModelConfig(pretrained=False)
    tcfg = TrainConfig(watch_every=5)
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(mcfg, tcfg, consts, NormStats(), optimizer)
    rng = np.random.default_rng(0)
    b, h, w = 2, 64, 64
    ids = np.tile(np.arange(1, b + 1, dtype=np.float32)[:, None, None], (1, h, w))
    batch = {
        "S2": rng.uniform(0, 4000, (b, h, w, 4)).astype(np.float32),
        "S1": rng.uniform(-25, 0, (b, h, w, 2)).astype(np.float32),
        "admin_mask": ids,
        "census_idx": np.arange(1, b + 1, dtype=np.float32),
        "y": rng.uniform(10, 1000, (b,)).astype(np.float32),
        "photometric": np.asarray([0.0, 1.0, 0.0, 1.0], np.float32),
    }
    # hot path: no watch collection compiled in
    _, _, aux0 = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert "watch" not in aux0
    # logging step: collect_watch=True (a static arg -> its own executable)
    _, _, aux = step(
        params, opt_state, batch, jax.random.PRNGKey(1), collect_watch=True
    )
    assert "watch" in aux and len(aux["watch"]) > 10
    assert all(np.isfinite(float(v)) for v in aux["watch"].values())
    # head gradients must be nonzero
    assert any("head" in k and float(v) > 0 for k, v in aux["watch"].items())


def test_train_step_remat_matches():
    """--remat (ModelConfig.remat_unet: jax.checkpoint around each UNet
    DoubleConv) changes memory, not math: one train step produces the
    same updated params and loss as the unrematted step. TPU-first
    replacement for the reference's freeze-above-pixel-limit tiers
    (run_train.py:190-198)."""
    import jax

    from popcorn_tpu.config import ModelConfig, TrainConfig
    from popcorn_tpu.data.normalize import NormStats
    from popcorn_tpu.nn.init import init_popcorn
    from popcorn_tpu.train.state import make_optimizer, make_train_step

    tcfg = TrainConfig()
    rng = np.random.default_rng(2)
    b, h, w = 1, 64, 64
    ids = np.ones((b, h, w), np.float32)
    batch = {
        "S2": rng.uniform(0, 4000, (b, h, w, 4)).astype(np.float32),
        "S1": rng.uniform(-25, 0, (b, h, w, 2)).astype(np.float32),
        "admin_mask": ids,
        "census_idx": np.ones((b,), np.float32),
        "y": np.asarray([300.0], np.float32),
        "photometric": np.asarray([0.0, 1.0, 0.0, 1.0], np.float32),
    }
    outs = {}
    for remat in (False, True):
        mcfg = ModelConfig(pretrained=False, remat_unet=remat)
        params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
        optimizer = make_optimizer(tcfg)
        opt_state = optimizer.init(params)
        step = make_train_step(mcfg, tcfg, consts, NormStats(), optimizer)
        p1, _, aux = step(params, opt_state, batch, jax.random.PRNGKey(1))
        outs[remat] = (p1, float(aux["optimization_loss"]))
    assert outs[False][1] == pytest.approx(outs[True][1], rel=1e-6)
    flat0 = jax.tree_util.tree_leaves(outs[False][0])
    flat1 = jax.tree_util.tree_leaves(outs[True][0])
    for a, b_ in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=1e-7)


def test_enable_compile_cache(tmp_path):
    """enable_compile_cache points XLA's persistent cache at the given dir
    (CLI --compile_cache / $POPCORN_COMPILE_CACHE); a jit after enabling
    writes executable entries there, and a disabled call is a no-op."""
    from popcorn_tpu.utils import enable_compile_cache

    env = dict(os.environ)
    env.pop("POPCORN_COMPILE_CACHE", None)
    os.environ.pop("POPCORN_COMPILE_CACHE", None)
    try:
        assert enable_compile_cache(None) is None  # disabled: no path anywhere
        cache = tmp_path / "xla"
        resolved = enable_compile_cache(str(cache))
        assert resolved == str(cache)

        import jax
        import jax.numpy as jnp

        jax.jit(lambda x: (x * 2.0).sum())(jnp.ones((8, 8))).block_until_ready()
        assert any(cache.iterdir()), "no cache entries written"
    finally:
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
        os.environ.update(env)
