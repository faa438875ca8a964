"""Census-level test metrics (reference: utils/metrics.py:12-25)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .losses import mape, pearson_corr, r2


def get_test_metrics(pred, y, tag: str = "") -> Dict[str, jnp.ndarray]:
    pred = jnp.asarray(pred, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    log_p = jnp.log(pred + 1.0)
    log_y = jnp.log(y + 1.0)
    d = {
        "l1_loss": jnp.mean(jnp.abs(pred - y)),
        "r2": r2(pred, y),
        "mape": mape(pred, y),
        "log_l1_loss": jnp.mean(jnp.abs(log_p - log_y)),
        "mse_loss": jnp.mean((pred - y) ** 2),
        "log_mse_loss": jnp.mean((log_p - log_y) ** 2),
        "Correlation": pearson_corr(pred, y),
    }
    return {f"Population_{tag}/{k}": float(v) for k, v in d.items()}
