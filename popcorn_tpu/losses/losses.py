"""Census-count regression losses and metrics.

Reproduces the reference loss system (utils/losses.py:12-127): a weighted
sum of name-selected population losses plus an occupancy-scale L1
regularisation, along with the monitored metrics (r2, mape, correlation).
Pure JAX, jit-friendly (fixed metric set; selection happens at trace time).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp

EPS = 1e-8


def r2(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """R2 score (reference: utils/losses.py:101-127)."""
    gt_mean = jnp.mean(gt)
    ss_tot = jnp.sum((gt - gt_mean) ** 2)
    ss_res = jnp.sum((gt - pred) ** 2)
    return 1.0 - ss_res / (ss_tot + eps)


def mape(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Mean absolute percentage error over gt>0.1 (utils/losses.py:91-97).

    jit-friendly masked form of the reference's boolean indexing.
    """
    pos = gt > 0.1
    n = jnp.maximum(jnp.sum(pos), 1)
    rel = jnp.where(pos, jnp.abs(pred - gt) / (gt + eps), 0.0)
    return 100.0 * jnp.sum(rel) / n


def pearson_corr(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Pearson correlation (torch.corrcoef equivalent)."""
    pm = pred - jnp.mean(pred)
    gm = gt - jnp.mean(gt)
    denom = jnp.sqrt(jnp.sum(pm**2) * jnp.sum(gm**2))
    return jnp.sum(pm * gm) / (denom + eps)


def _metric_dict(pred: jnp.ndarray, gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """All monitored metrics (reference utils/losses.py:51-59)."""
    log_p = jnp.log(pred + 1.0)
    log_g = jnp.log(gt + 1.0)
    many = pred.shape[0] > 1
    return {
        "l1_loss": jnp.mean(jnp.abs(pred - gt)),
        "log_l1_loss": jnp.mean(jnp.abs(log_p - log_g)),
        "mse_loss": jnp.mean((pred - gt) ** 2),
        "log_mse_loss": jnp.mean((log_p - log_g) ** 2),
        "mr2": r2(pred, gt) if many else jnp.asarray(0.0),
        "mape": mape(pred, gt),
        "mCorrelation": pearson_corr(pred, gt) if many else jnp.asarray(0.0),
    }


def get_loss(
    popcount: jnp.ndarray,
    census_gt: jnp.ndarray,
    *,
    scale_abs_mean: Optional[jnp.ndarray] = None,
    loss: Sequence[str] = ("log_l1_loss",),
    lam: Sequence[float] = (1.0,),
    scale_regularization: float = 0.0,
    tag: str = "",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted loss + aux log dict (reference: utils/losses.py:12-88).

    scale_abs_mean is the (masked) mean |scale| already computed inside the
    model forward — equivalent to the reference's scale[mask].abs().mean().
    """
    popcount = popcount.astype(jnp.float32)
    census_gt = census_gt.astype(jnp.float32)
    metrics = _metric_dict(popcount, census_gt)

    optimization_loss = jnp.asarray(0.0, jnp.float32)
    for lo, la in zip(loss, lam):
        if lo in metrics:
            optimization_loss = optimization_loss + metrics[lo] * la

    if scale_abs_mean is not None:
        metrics["scale"] = scale_abs_mean
        if scale_regularization > 0.0:
            optimization_loss = (
                optimization_loss + scale_regularization * scale_abs_mean
            )

    prefix = "Population" if tag == "" else f"Population_{tag}"
    aux = {f"{prefix}/{k}": v for k, v in metrics.items()}
    aux["optimization_loss"] = optimization_loss
    return optimization_loss, aux
