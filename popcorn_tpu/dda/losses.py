"""Segmentation losses for training the DDA built-up extractor.

JAX re-implementation of the reference's criterion factory and dice /
jaccard loss family (model/DDA_model/utils/loss_functions.py:10-200).
All losses take (logits, targets) of any matching shape.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

EPS = 1e-6


def bce_with_logits(logits, y):
    p = jax.nn.log_sigmoid(logits)
    q = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(y * p + (1.0 - y) * q)


def weighted_cross_entropy(negative_weight: float = 1.0, positive_weight: float = 1.0):
    """2-class CE over a (B,2,...)-style channel pair — torch
    CrossEntropyLoss(weight=[neg, pos]) equivalent for logits (...,2)."""

    w = jnp.asarray([negative_weight, positive_weight], jnp.float32)

    def f(logits, y):
        # logits (..., 2), y integer {0,1} (...)
        logp = jax.nn.log_softmax(logits, axis=-1)
        y = y.astype(jnp.int32)
        picked = jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        wy = w[y]
        return -jnp.sum(wy * picked) / jnp.maximum(jnp.sum(wy), EPS)

    return f


def soft_dice_loss(logits, y):
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = y.reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter + EPS) / (jnp.sum(p) + jnp.sum(t) + EPS)


def dice_like_loss(logits, y):
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = y.reshape(-1)
    inter = jnp.sum(p * t)
    return 1.0 - (2.0 * inter) / (jnp.sum(p**2) + jnp.sum(t**2) + EPS)


def jaccard_like_loss(logits, y):
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = y.reshape(-1)
    inter = jnp.sum(p * t)
    denom = jnp.sum(p**2) + jnp.sum(t**2) - inter + EPS
    return 1.0 - (2.0 * inter) / denom


def power_jaccard_loss(logits, y):
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = y.reshape(-1)
    inter = jnp.sum(p * t)
    denom = jnp.sum(p**2) + jnp.sum(t**2) - inter + EPS
    return 1.0 - inter / denom


def iou_loss(logits, y):
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = y.reshape(-1)
    inter = jnp.sum(p * t)
    union = jnp.sum(p) + jnp.sum(t) - inter + EPS
    return 1.0 - inter / union


def soft_dice_loss_balanced(logits, y):
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = y.reshape(-1)
    inter = jnp.sum(p * t)
    dice_pos = (2.0 * inter) / (jnp.sum(p) + jnp.sum(t) + EPS)
    n_inter = jnp.sum((1 - p) * (1 - t))
    dice_neg = (2.0 * n_inter) / (jnp.sum(1 - p) + jnp.sum(1 - t) + EPS)
    return 2.0 - dice_pos - dice_neg


def jaccard_like_balanced_loss(logits, y):
    p = jax.nn.sigmoid(logits).reshape(-1)
    t = y.reshape(-1)
    inter = jnp.sum(p * t)
    denom = jnp.sum(p**2) + jnp.sum(t**2) - inter + EPS
    piccard = 2.0 * inter / denom
    n_p, n_t = 1 - p, 1 - t
    n_inter = jnp.sum(n_p * n_t)
    n_denom = jnp.sum(n_p**2) + jnp.sum(n_t**2) - n_inter + EPS
    return 1.0 - piccard - 2.0 * n_inter / n_denom


def mse_prob_loss(p, q):
    """MSE between two probability maps (the consistency loss)."""
    return jnp.mean((p - q) ** 2)


_CRITERIA = {
    "BCEWithLogitsLoss": lambda **kw: bce_with_logits,
    "CrossEntropyLoss": lambda negative_weight=1.0, positive_weight=1.0, **kw:
        weighted_cross_entropy(negative_weight, positive_weight),
    "SoftDiceLoss": lambda **kw: soft_dice_loss,
    "SoftDiceSquaredSumLoss": lambda **kw: soft_dice_loss,  # ref alias (loss_functions.py:53)
    "SoftDiceBalancedLoss": lambda **kw: soft_dice_loss_balanced,
    "PowerJaccardLoss": lambda **kw: power_jaccard_loss,
    "MeanSquareErrorLoss": lambda **kw: (lambda a, b: jnp.mean((a - b) ** 2)),
    "IoULoss": lambda **kw: iou_loss,
    "DiceLikeLoss": lambda **kw: dice_like_loss,
    "JaccardLikeLoss": lambda **kw: jaccard_like_loss,
    "JaccardLikeBalancedLoss": lambda **kw: jaccard_like_balanced_loss,
}


def get_criterion(loss_type: str, negative_weight: float = 1.0,
                  positive_weight: float = 1.0) -> Callable:
    """Name -> loss fn (reference: loss_functions.py:10-36)."""
    if loss_type not in _CRITERIA:
        raise ValueError(f"unknown loss {loss_type}")
    return _CRITERIA[loss_type](
        negative_weight=negative_weight, positive_weight=positive_weight
    )
