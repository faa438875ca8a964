"""Training state, optimizer chain and the jitted train step.

Optimizer semantics replicate the reference exactly
(run_train.py:82-93, arguments/train.py:29,38-41):

  * Adam lr 1e-4 over three param groups — here one optax chain with a
    weight-decay *mask* excluding the head's final layer (the reference's
    params_without_decay = head.6.{weight,bias});
  * torch-Adam-style decoupling: weight decay is added to the raw
    gradient *before* the Adam moments (optax.add_decayed_weights placed
    before scale_by_adam matches torch.optim.Adam's weight_decay);
  * global-norm gradient clipping 0.01 applied before everything
    (run_train.py:233-234 clips before optimizer.step);
  * StepLR(step_size=5, gamma=0.75) stepped per *epoch* — the learning
    rate lives in the optimizer state via optax.inject_hyperparams, so
    the trainer updates it between epochs without recompiling.

The train step is one jitted function: device-side photometric
augmentation -> normalization/assembly -> POPCORN forward (sparse mask) ->
log-L1 census loss * lam_weak -> grads -> optax update. Memory-tier flags
(encoder/unet stop-gradient, run_train.py:190-198) are static arguments —
each tier is its own XLA specialisation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, TrainConfig
from ..data.normalize import NormStats, normalize_and_assemble, photometric_s2_traced
from ..losses.losses import get_loss
from ..nn.popcorn import popcorn_forward

Tree = Dict[str, Any]

# Batch keys carrying one row per sample (everything else — 'photometric'
# and future batch-level leaves — replicates across microbatches).
PER_SAMPLE_KEYS = (
    "S2", "S1", "VIIRS", "admin_mask", "census_idx", "y", "building_counts"
)


@dataclasses.dataclass
class TrainState:
    params: Tree
    opt_state: Any
    step: int
    epoch: int


def decay_mask(params: Tree) -> Tree:
    """True where weight decay applies: everywhere except head.l4
    (the reference's no-decay group head.6.{weight,bias}, run_train.py:85-89)."""

    def f(path, _leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        return not ("head" in keys and "l4" in keys)

    return jax.tree_util.tree_map_with_path(f, params)


def make_optimizer(tc: TrainConfig):
    """optax chain mirroring torch Adam + clip + StepLR (see module doc)."""

    @optax.inject_hyperparams
    def tx(learning_rate):
        chain = []
        if tc.gradient_clip > 0:
            chain.append(optax.clip_by_global_norm(tc.gradient_clip))
        if tc.weight_decay > 0:
            chain.append(
                optax.add_decayed_weights(tc.weight_decay, mask=decay_mask)
            )
        chain.append(optax.scale_by_adam())
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    return tx(learning_rate=tc.learning_rate)


def step_lr(base_lr: float, epoch: int, step_size: int, gamma: float) -> float:
    """StepLR schedule value at `epoch` (torch semantics)."""
    return base_lr * (gamma ** (epoch // step_size))


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr in-place-ish (returns new state)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def make_train_step(
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    consts: Tree,
    stats: NormStats,
    optimizer,
):
    """Build the jitted train step.

    Signature: step(params, opt_state, batch, key, *, encoder_no_grad,
    unet_no_grad) -> (params, opt_state, aux).
    batch: {'S2','S1' (B,H,W,C) raw, 'admin_mask' (B,H,W),
            'census_idx','y' (B,), 'photometric' (4,)}.
    """

    def loss_fn(params, batch, key, encoder_no_grad, unet_no_grad):
        sample = {}
        if mcfg.s2 and "S2" in batch:
            # S2 may arrive uint16 (half the transfer bytes, data/feed.py);
            # upcast before the photometric aug, fused by XLA
            sample["S2"] = photometric_s2_traced(
                batch["S2"].astype(jnp.float32), batch["photometric"]
            )
        if mcfg.s1 and "S1" in batch:
            sample["S1"] = batch["S1"]
        if mcfg.viirs and "VIIRS" in batch:
            sample["VIIRS"] = batch["VIIRS"]
        inputs = {
            "input": normalize_and_assemble(sample, stats),
            "admin_mask": batch["admin_mask"],
            "census_idx": batch["census_idx"],
        }
        if "building_counts" in batch:
            inputs["building_counts"] = batch["building_counts"]
        out = popcorn_forward(
            params,
            consts,
            inputs,
            mcfg,
            train=True,
            padding=False,
            encoder_no_grad=encoder_no_grad,
            unet_no_grad=unet_no_grad,
            sparse=True,
            key=key,
        )
        loss, aux = get_loss(
            out["popcount"],
            batch["y"],
            scale_abs_mean=out["scale_abs_mean"],
            loss=tcfg.loss,
            lam=tcfg.lam,
            scale_regularization=tcfg.scale_regularization,
            tag="weak",
        )
        optim_loss = loss * tcfg.lam_weak
        aux["optimization_loss"] = optim_loss
        aux["popcount"] = out["popcount"]
        return optim_loss, aux

    def accum_grads(params, batch, key, encoder_no_grad, unet_no_grad, n_micro):
        """Average value_and_grad over n_micro microbatches via lax.scan.

        Each batch-leading array reshapes (B, ...) -> (n_micro, B/n_micro,
        ...); one microbatch's activations live at a time, so peak HBM
        drops ~n_micro x while the averaged gradient equals the big-batch
        gradient (the loss is a mean over samples). Scalar aux averages;
        per-sample aux (popcount) restacks to (B,) in input order. Batch-
        level diagnostics (mCorrelation/mr2) are computed per microbatch
        and averaged — degenerate (0) when B/n_micro == 1.
        """
        b = batch["y"].shape[0]
        mb = b // n_micro

        # Split ONLY the known per-sample keys — a shape heuristic would
        # wrongly scatter the length-4 'photometric' vector across
        # microbatches whenever B == 4 (JAX's clamped indexing then reads
        # gamma from beta silently: corrupted gradients, no error).
        stacked = {
            k: batch[k].reshape((n_micro, mb) + batch[k].shape[1:])
            for k in PER_SAMPLE_KEYS
            if k in batch
        }
        shared = {k: v for k, v in batch.items() if k not in stacked}
        keys = jax.random.split(key, n_micro)

        def micro(g_sum, xs):
            mb_batch, k = xs
            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, {**mb_batch, **shared}, k, encoder_no_grad, unet_no_grad
            )
            g_sum = jax.tree.map(jnp.add, g_sum, g)
            return g_sum, aux

        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        g_sum, auxs = jax.lax.scan(micro, zeros, (stacked, keys))
        grads = jax.tree.map(lambda g: g / n_micro, g_sum)
        aux = {
            k: v.reshape((b,) + v.shape[2:]) if v.ndim >= 2 and v.shape[1] == mb
            else v.mean(axis=0)
            for k, v in auxs.items()
        }
        return grads, aux

    @functools.partial(
        jax.jit,
        static_argnames=("encoder_no_grad", "unet_no_grad", "collect_watch"),
    )
    def step(params, opt_state, batch, key, *, encoder_no_grad=False,
             unet_no_grad=False, collect_watch=False):
        n_micro = max(1, int(getattr(tcfg, "grad_accum", 1)))
        b = batch["y"].shape[0]
        if n_micro > 1 and b >= n_micro and b % n_micro == 0:
            grads, aux = accum_grads(
                params, batch, key, encoder_no_grad, unet_no_grad, n_micro
            )
        else:
            # indivisible tail batch: single microbatch (trace-time branch;
            # each batch shape is its own XLA specialization anyway)
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key, encoder_no_grad, unet_no_grad
            )
        if collect_watch:
            # per-layer gradient norms for the wandb.watch equivalent
            # (reference run_train.py:75). Static arg: the norms compile
            # only into the 1-in-watch_every logging step, keeping the
            # hot-path executable free of the ~100 reductions + transfer.
            flat, _ = jax.tree_util.tree_flatten_with_path(grads)
            aux["watch"] = {
                jax.tree_util.keystr(path): jnp.sqrt(
                    jnp.sum(leaf.astype(jnp.float32) ** 2)
                )
                for path, leaf in flat
            }
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return step


def make_eval_popcount(mcfg: ModelConfig, consts: Tree, stats: NormStats):
    """Jitted no-grad popcount for weak validation (run_train.py:289-312)."""

    @jax.jit
    def fn(params, batch):
        sample = {}
        if mcfg.s2 and "S2" in batch:
            sample["S2"] = batch["S2"].astype(jnp.float32)
        if mcfg.s1 and "S1" in batch:
            sample["S1"] = batch["S1"]
        if mcfg.viirs and "VIIRS" in batch:
            sample["VIIRS"] = batch["VIIRS"]
        inputs = {
            "input": normalize_and_assemble(sample, stats),
            "admin_mask": batch["admin_mask"],
            "census_idx": batch["census_idx"],
        }
        if "building_counts" in batch:
            inputs["building_counts"] = batch["building_counts"]
        out = popcorn_forward(
            params, consts, inputs, mcfg, train=False, padding=False, sparse=False
        )
        return out["popcount"]

    return fn
