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
    # AUGMENTATION.* (reference DDA_model/utils/augmentations.py:11-31):
    # flip + rot90 + per-channel color shift + per-channel gamma, plus an
    # optional random crop, composed into every training sample.
    random_flip: bool = True
    random_rotate: bool = True
    color_shift: bool = True
    gamma_correction: bool = True
    crop_size: int = 0  # 0 = no crop (reference: cfg.AUGMENTATION.CROP_SIZE)


def dda_augment(
    rng: np.random.Generator, x: np.ndarray, y: Optional[np.ndarray], cfg: DDAConfig
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """One sample's DDA training augmentation draw.

    Reproduces the reference's compose_transformations pipeline
    (DDA_model/utils/augmentations.py:11-31) on HWC float arrays:

      * ImageCrop(crop_size): random aligned crop of image+label.
      * RandomFlip: independent p=0.5 horizontal (axis 1) and vertical
        (axis 0) flips, image+label in sync.
      * RandomRotate: always k in {1,2,3} quarter-turns when enabled.
      * ColorShift: per-channel uniform factor in [0.5, 1.5], clipped to
        [0, 1] in the reference's [0,1]-scaled image space.
      * GammaCorrection: per-channel gamma in [0.25, 2], clipped to [0,1].

    Adaptation (documented): the reference's DDA data plane pre-scales all
    six channels to [0,1], so color/gamma apply to SAR too. This data
    plane keeps physical units (S1 in dB, S2 in reflectance counts), so
    the photometric ops act on S2 scaled by 1/10000 into [0,1] and are
    skipped for the dB-valued S1 channels (a multiplicative jitter on dB
    is a power law, not a brightness shift).
    """
    if y is not None:
        y = np.asarray(y)
    if cfg.crop_size and (
        x.shape[0] > cfg.crop_size or x.shape[1] > cfg.crop_size
    ):
        m, n = x.shape[:2]
        i = 0 if m == cfg.crop_size else int(rng.integers(0, m - cfg.crop_size))
        j = 0 if n == cfg.crop_size else int(rng.integers(0, n - cfg.crop_size))
        x = x[i : i + cfg.crop_size, j : j + cfg.crop_size]
        if y is not None:
            y = y[i : i + cfg.crop_size, j : j + cfg.crop_size]
    if cfg.random_flip:
        if rng.random() < 0.5:  # horizontal (axis 1)
            x = np.flip(x, axis=1)
            y = np.flip(y, axis=1) if y is not None else None
        if rng.random() < 0.5:  # vertical (axis 0)
            x = np.flip(x, axis=0)
            y = np.flip(y, axis=0) if y is not None else None
    if cfg.random_rotate:
        k = int(rng.integers(1, 4))
        x = np.rot90(x, k, axes=(0, 1))
        y = np.rot90(y, k, axes=(0, 1)) if y is not None else None
    x = np.ascontiguousarray(x, dtype=np.float32)
    if cfg.color_shift or cfg.gamma_correction:
        s2 = np.clip(x[..., 2:] / 10000.0, 0.0, 1.0)
        if cfg.color_shift:
            factors = rng.uniform(0.5, 1.5, s2.shape[-1]).astype(np.float32)
            s2 = np.clip(s2 * factors[None, None, :], 0.0, 1.0)
        if cfg.gamma_correction:
            gamma = rng.uniform(0.25, 2.0, s2.shape[-1]).astype(np.float32)
            s2 = np.clip(np.power(s2, gamma[None, None, :]), 0.0, 1.0)
        x = np.concatenate([x[..., :2], s2 * 10000.0], axis=-1)
    return x, (np.ascontiguousarray(y, dtype=np.float32) if y is not None else None)


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

    def _augment_batch(self, batch, labeled: bool):
        """Per-sample DDA training augmentation of a stacked batch
        (reference applies compose_transformations inside __getitem__ for
        both the labeled and unlabeled pools, datasets.py:123-227)."""
        xs, ys = [], []
        for b in range(batch["x"].shape[0]):
            x, y = dda_augment(
                self._rng,
                batch["x"][b],
                batch["y"][b] if labeled else None,
                self.cfg,
            )
            xs.append(x)
            if labeled:
                ys.append(y)
        out = {"x": np.stack(xs)}
        if labeled:
            out["y"] = np.stack(ys)
        return out

    def train_epoch(self, augment: bool = True) -> float:
        step, step_no_unl = self._step
        losses = []
        for lab, unl in labeled_unlabeled_batches(
            self.ds,
            self._rng,
            labeled_per_batch=self.cfg.labeled_per_batch,
            unlabeled_per_batch=self.cfg.unlabeled_per_batch,
        ):
            if augment:
                lab = self._augment_batch(lab, labeled=True)
                if unl is not None:
                    unl = self._augment_batch(unl, labeled=False)
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

    def test_per_site(self, manifest: Optional[str] = None) -> Dict[str, Dict]:
        """Per-site test report — see :func:`model_testing`."""
        ds = UrbanExtractionDataset(manifest) if manifest else self.ds
        return model_testing(self.params, self.bn_params, self.bn_state, ds)


HEADS = ("sar", "optical", "fusion")


def model_testing(
    params: Tree,
    bn_params: Tree,
    bn_state: Tree,
    ds: UrbanExtractionDataset,
    *,
    threshold: float = 0.5,
) -> Dict[str, Dict]:
    """Per-site test loop over the labeled samples of a manifest.

    TPU-native equivalent of the reference's ``model_testing``
    (DDA_model/utils/evaluation.py:252-453): every labeled sample is run
    through all three heads (SAR / optical / fusion); per head it reports

      * pixel-pooled precision / recall / F1 / IoU at ``threshold``
        (the reference rounds sigmoid probabilities, metrics.py:80-106),
        pooled per site AND over all sites under the key ``"test"``
        (the reference's per-region dict is commented out at
        evaluation.py:306-317 — this implements that evident intent);
      * sample-mean morphology metrics: boundary/closed/opened/gradient
        IoU + SSIM (evaluation.py:280-299; Hausdorff is computed too —
        the reference carries it but comments the calls out).

    Returns ``{site_or_"test": {head: {metric: value}}}``.
    """
    from .metrics import MultiThresholdMetric, morphology_metrics

    if not ds.labeled_idx:
        raise ValueError("model_testing needs at least one labeled sample")

    sites: Dict[str, Dict[str, Dict]] = {}

    def _bucket(site: str):
        if site not in sites:
            sites[site] = {
                h: {
                    "pix": MultiThresholdMetric(np.asarray([threshold])),
                    "morph": [],
                }
                for h in HEADS
            }
        return sites[site]

    fwd = jax.jit(
        lambda x: dual_stream_train_forward(
            params, bn_params, bn_state, x, train=False
        )[:3]
    )
    for i in ds.labeled_idx:
        it = ds[int(i)]
        x = jnp.asarray(normalize_dda_input(it["x"][None]))
        sar, opt, fus = fwd(x)
        probs = {
            h: np.asarray(jax.nn.sigmoid(v))[0, ..., 0]
            for h, v in zip(HEADS, (sar, opt, fus))
        }
        for bucket in (_bucket(it.get("site") or "test"), _bucket("test")):
            for h in HEADS:
                bucket[h]["pix"].add_sample(it["y"], probs[h])
                bucket[h]["morph"].append(
                    morphology_metrics(it["y"], probs[h], threshold)
                )

    report: Dict[str, Dict] = {}
    for site, heads in sites.items():
        report[site] = {}
        for h in HEADS:
            pix = heads[h]["pix"]
            morph = heads[h]["morph"]
            entry = {
                "precision": float(pix.precision[0]),
                "recall": float(pix.recall[0]),
                "f1": float(pix.f1()[0]),
                "iou": float(pix.iou[0]),
                "n_samples": len(morph),
            }
            for k in (
                "boundary_iou",
                "closed_iou",
                "opened_iou",
                "gradient_iou",
                "ssim",
                "hausdorff",
            ):
                vals = [m[k] for m in morph if np.isfinite(m[k])]
                entry[k] = float(np.mean(vals)) if vals else float("nan")
            report[site][h] = entry
    return report


def format_site_report(report: Dict[str, Dict]) -> str:
    """Human-readable table of a model_testing report."""
    lines = []
    metrics = ("f1", "precision", "recall", "iou", "boundary_iou",
               "closed_iou", "opened_iou", "gradient_iou", "ssim")
    for site in sorted(report, key=lambda s: (s != "test", s)):
        for h in HEADS:
            e = report[site][h]
            vals = " ".join(f"{m}={e[m]:.4f}" for m in metrics)
            lines.append(f"{site:>12} {h:>8} n={e['n_samples']:<3} {vals}")
    return "\n".join(lines)
