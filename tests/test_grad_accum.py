"""Gradient accumulation (TrainConfig.grad_accum / --grad_accum).

The accumulated step must equal the hand-computed average of per-microbatch
gradients followed by one optimizer update (same keys, same order), and the
indivisible-tail fallback must equal the plain step exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from popcorn_tpu.config import ModelConfig, TrainConfig
from popcorn_tpu.data.normalize import NormStats
from popcorn_tpu.nn.init import init_popcorn
from popcorn_tpu.train.state import make_optimizer, make_train_step


def _batch(b, h=64, w=64, seed=2):
    rng = np.random.default_rng(seed)
    ids = np.tile(np.arange(1, b + 1, dtype=np.float32)[:, None, None], (1, h, w))
    return {
        "S2": rng.uniform(0, 4000, (b, h, w, 4)).astype(np.float32),
        "S1": rng.uniform(-25, 0, (b, h, w, 2)).astype(np.float32),
        "admin_mask": ids,
        "census_idx": np.arange(1, b + 1, dtype=np.float32),
        "y": rng.uniform(10, 1000, (b,)).astype(np.float32),
        "photometric": np.asarray([0.0, 1.0, 0.0, 1.0], np.float32),
    }


@pytest.fixture(scope="module")
def model():
    mcfg = ModelConfig(pretrained=False, fused_head=False)
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    return mcfg, params, consts


@pytest.mark.slow
def test_accum_equals_manual_microbatch_average(model):
    """grad_accum=2 over B=4 == mean of the two B=2 microbatch grads
    (keys split the same way) -> one optimizer update."""
    mcfg, params, consts = model
    batch = _batch(4)
    key = jax.random.PRNGKey(11)

    tcfg_a = TrainConfig(grad_accum=2)
    optimizer = make_optimizer(tcfg_a)
    opt_state = optimizer.init(params)
    step_a = make_train_step(mcfg, tcfg_a, consts, NormStats(), optimizer)
    pa, _, aux_a = step_a(params, opt_state, batch, key)

    # Manual: per-microbatch gradients (extracted via an SGD(1.0) probe
    # step: updated = params - grad), averaged, then the same optax update.
    keys = jax.random.split(key, 2)
    grads = []
    losses = []
    for i in range(2):
        mb = {
            k: (v[2 * i: 2 * i + 2] if np.ndim(v) >= 1 and np.shape(v)[0] == 4
                else v)
            for k, v in batch.items()
        }
        mb["photometric"] = batch["photometric"]
        sgd = optax.sgd(1.0)
        sgd_state = sgd.init(params)
        tcfg_sgd = TrainConfig(grad_accum=1, gradient_clip=0.0, weight_decay=0.0)
        step_sgd = make_train_step(mcfg, tcfg_sgd, consts, NormStats(), sgd)
        p1, _, aux = step_sgd(params, sgd_state, mb, keys[i])
        g = jax.tree.map(lambda p0, p1_: np.asarray(p0) - np.asarray(p1_),
                         params, p1)
        grads.append(g)
        losses.append(float(aux["optimization_loss"]))

    g_avg = jax.tree.map(lambda a, b: (a + b) / 2.0, grads[0], grads[1])
    updates, _ = optimizer.update(
        jax.tree.map(jnp.asarray, g_avg), optimizer.init(params), params
    )
    p_manual = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        float(aux_a["optimization_loss"]), np.mean(losses), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(p_manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_accum_popcount_order_and_scalars(model):
    """aux['popcount'] restacks to input order: each sample's popcount is
    a per-sample function of the forward (sparse==dense parity), so it
    must match the plain step's popcount element-by-element."""
    mcfg, params, consts = model
    batch = _batch(4, seed=5)
    pops = {}
    for accum in (1, 2):
        tcfg = TrainConfig(grad_accum=accum)
        optimizer = make_optimizer(tcfg)
        opt_state = optimizer.init(params)
        step = make_train_step(mcfg, tcfg, consts, NormStats(), optimizer)
        _, _, aux = step(params, opt_state, batch, jax.random.PRNGKey(3))
        pops[accum] = np.asarray(aux["popcount"])
        assert pops[accum].shape == (4,)
        assert np.isfinite(float(aux["optimization_loss"]))
    # an order-scrambling restack (e.g. transpose-then-reshape) would
    # attribute popcounts to the wrong samples
    np.testing.assert_allclose(pops[2], pops[1], rtol=1e-5)


def test_accum_photometric_not_split(model):
    """B == grad_accum^2-style collisions: a NON-identity length-4
    'photometric' vector must reach every microbatch whole. A shape
    heuristic that splits any leading-axis-B array would scatter it
    (JAX's clamped indexing then reads gamma from beta silently); pin the
    accumulated loss to the manual microbatch average under a photometric
    that actually changes the input."""
    mcfg, params, consts = model
    batch = _batch(4, seed=9)
    batch["photometric"] = np.asarray([1.0, 0.8, 1.0, 1.3], np.float32)
    key = jax.random.PRNGKey(21)

    tcfg = TrainConfig(grad_accum=2)
    optimizer = make_optimizer(tcfg)
    step = make_train_step(mcfg, tcfg, consts, NormStats(), optimizer)
    _, _, aux = step(params, optimizer.init(params), batch, key)

    keys = jax.random.split(key, 2)
    losses = []
    for i in range(2):
        mb = {
            k: (v[2 * i: 2 * i + 2] if k != "photometric" else v)
            for k, v in batch.items()
        }
        tcfg_p = TrainConfig(grad_accum=1)
        opt_p = make_optimizer(tcfg_p)
        step_p = make_train_step(mcfg, tcfg_p, consts, NormStats(), opt_p)
        _, _, aux_p = step_p(params, opt_p.init(params), mb, keys[i])
        losses.append(float(aux_p["optimization_loss"]))
    np.testing.assert_allclose(
        float(aux["optimization_loss"]), np.mean(losses), rtol=1e-6
    )


def test_grad_accum_must_divide_batch_size():
    from popcorn_tpu.cli.args import train_config_from_args, train_parser

    a = train_parser().parse_args(
        ["-treg", "rwa", "-tregtrain", "rwa", "-wb", "8", "--grad_accum", "3"]
    )
    with pytest.raises(SystemExit, match="does not divide"):
        train_config_from_args(a)


@pytest.mark.slow
def test_accum_tail_batch_falls_back(model):
    """B=3 with grad_accum=2 (indivisible): the step must behave exactly
    like the plain step (same key, same math)."""
    mcfg, params, consts = model
    batch = _batch(3, seed=7)
    key = jax.random.PRNGKey(9)
    outs = {}
    for accum in (1, 2):
        tcfg = TrainConfig(grad_accum=accum)
        optimizer = make_optimizer(tcfg)
        opt_state = optimizer.init(params)
        step = make_train_step(mcfg, tcfg, consts, NormStats(), optimizer)
        p1, _, aux = step(params, opt_state, batch, key)
        outs[accum] = (p1, float(aux["optimization_loss"]))
    assert outs[1][1] == outs[2][1]
    for a, b in zip(jax.tree.leaves(outs[1][0]), jax.tree.leaves(outs[2][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_cli_flag():
    from popcorn_tpu.cli.args import train_config_from_args, train_parser

    a = train_parser().parse_args(
        ["-treg", "rwa", "-tregtrain", "rwa", "-wb", "8", "--grad_accum", "4"]
    )
    tcfg = train_config_from_args(a)
    assert tcfg.grad_accum == 4
