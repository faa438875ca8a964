"""Fusion-DA consistency training of the dual-stream built-up extractor.

The released DDA checkpoint ("fusionda_*_lossweight0.5") comes from
semi-supervised domain-adaptation training: supervised segmentation loss
on labeled sites for the SAR, optical and fusion heads, plus a
consistency loss between the two streams' probabilities on unlabeled
target-domain sites, weighted by CONSISTENCY_TRAINER.LOSS_FACTOR (0.5,
utils/constants.py:174). This module provides that trainer TPU-natively
so the extractor can be (re)trained from scratch; the result exports
directly into the POPCORN frozen-extractor format.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import load_dataset_stats
from ..nn.init import init_dual_stream
from .datasets import UrbanExtractionDataset, labeled_unlabeled_batches
from .losses import get_criterion, mse_prob_loss
from .metrics import MultiThresholdMetric
from .network import dual_stream_train_forward, init_bn, to_frozen_consts

Tree = Dict[str, Any]


@dataclasses.dataclass
class DDAConfig:
    """The subset of the reference's fvcore config actually used
    (experiment_manager.py:36-74, utils/constants.py:169-179)."""

    topology: Tuple[int, int] = (8, 16)
    loss_type: str = "SoftDiceLoss"
    consistency_loss_type: str = "MeanSquareErrorLoss"
    loss_factor: float = 0.5
    lr: float = 1e-4
    weight_decay: float = 0.01
    epochs: int = 10
    labeled_per_batch: int = 4
    unlabeled_per_batch: int = 4
    seed: int = 7


def normalize_dda_input(x: np.ndarray, stats=None) -> np.ndarray:
    """z-score the [S1|S2] 6ch input with the dataset stats."""
    stats = stats or load_dataset_stats()
    s1m = np.asarray(stats["sen1"]["mean"], np.float32)
    s1s = np.asarray(stats["sen1"]["std"], np.float32)
    s2m = np.asarray(stats["sen2springNIR"]["mean"], np.float32)
    s2s = np.asarray(stats["sen2springNIR"]["std"], np.float32)
    out = x.copy()
    out[..., :2] = (x[..., :2] - s1m) / s1s
    out[..., 2:] = (x[..., 2:] - s2m) / s2s
    return out


class DDATrainer:
    def __init__(self, manifest: str, cfg: Optional[DDAConfig] = None):
        self.cfg = cfg or DDAConfig()
        self.ds = UrbanExtractionDataset(manifest)
        key = jax.random.PRNGKey(self.cfg.seed)
        self.params = init_dual_stream(key, self.cfg.topology)
        self.bn_params, self.bn_state = init_bn(self.cfg.topology)
        self.tx = optax.adamw(self.cfg.lr, weight_decay=self.cfg.weight_decay)
        self.opt_state = self.tx.init((self.params, self.bn_params))
        self._step = self._build_step()
        self._rng = np.random.default_rng(self.cfg.seed)

    def _build_step(self):
        sup = get_criterion(self.cfg.loss_type)
        cons = (
            mse_prob_loss
            if self.cfg.consistency_loss_type == "MeanSquareErrorLoss"
            else get_criterion(self.cfg.consistency_loss_type)
        )
        factor = self.cfg.loss_factor

        def loss_fn(trainable, bn_state, xl, yl, xu):
            params, bn_params = trainable
            sar, opt, fus, st = dual_stream_train_forward(
                params, bn_params, bn_state, xl, train=True
            )
            y = yl[..., None]
            loss = sup(sar, y) + sup(opt, y) + sup(fus, y)
            if xu is not None:
                sar_u, opt_u, _, st = dual_stream_train_forward(
                    params, bn_params, st, xu, train=True
                )
                loss = loss + factor * cons(
                    jax.nn.sigmoid(sar_u), jax.nn.sigmoid(opt_u)
                )
            return loss, st

        @jax.jit
        def step(trainable, bn_state, opt_state, xl, yl, xu):
            (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, bn_state, xl, yl, xu
            )
            updates, opt_state = self.tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, new_bn, opt_state, loss

        @jax.jit
        def step_no_unl(trainable, bn_state, opt_state, xl, yl):
            (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, bn_state, xl, yl, None
            )
            updates, opt_state = self.tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, new_bn, opt_state, loss

        return step, step_no_unl

    def train_epoch(self) -> float:
        step, step_no_unl = self._step
        losses = []
        for lab, unl in labeled_unlabeled_batches(
            self.ds,
            self._rng,
            labeled_per_batch=self.cfg.labeled_per_batch,
            unlabeled_per_batch=self.cfg.unlabeled_per_batch,
        ):
            xl = jnp.asarray(normalize_dda_input(lab["x"]))
            yl = jnp.asarray(lab["y"])
            trainable = (self.params, self.bn_params)
            if unl is not None:
                xu = jnp.asarray(normalize_dda_input(unl["x"]))
                trainable, self.bn_state, self.opt_state, loss = step(
                    trainable, self.bn_state, self.opt_state, xl, yl, xu
                )
            else:
                trainable, self.bn_state, self.opt_state, loss = step_no_unl(
                    trainable, self.bn_state, self.opt_state, xl, yl
                )
            self.params, self.bn_params = trainable
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else float("nan")

    def train(self) -> float:
        last = float("nan")
        for _ in range(self.cfg.epochs):
            last = self.train_epoch()
        return last

    def evaluate(self, thresholds=None) -> Dict[str, float]:
        """Threshold-sweep F1 on the labeled samples (fusion head)
        (reference: evaluation.py:64-224)."""
        thresholds = thresholds if thresholds is not None else np.linspace(0, 1, 101)
        m = MultiThresholdMetric(np.asarray(thresholds))
        for i in self.ds.labeled_idx:
            it = self.ds[int(i)]
            x = jnp.asarray(normalize_dda_input(it["x"][None]))
            _, _, fus, _ = dual_stream_train_forward(
                self.params, self.bn_params, self.bn_state, x, train=False
            )
            m.add_sample(it["y"], np.asarray(jax.nn.sigmoid(fus))[0, ..., 0])
        return m.best()

    def export_for_popcorn(self) -> Tuple[Tree, Tree]:
        """(unet_params, frozen_bn_consts) for the POPCORN extractor."""
        return self.params, to_frozen_consts(self.bn_params, self.bn_state)
