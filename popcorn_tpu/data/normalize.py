"""Device-side normalization and input assembly.

Reproduces apply_normalize / apply_transformations_and_normalize
(reference: utils/utils.py:105-214): per-modality z-score with the
dataset_stats JSON, then channel concatenation into the model input
[S2(R,G,B[,NIR]), S1(VV,VH), VIIRS?]. Runs inside jit — XLA fuses it with
the photometric augmentation and the first conv's input pipeline.

Note the stats key choice mirrors the reference exactly: S2 uses
'sen2springNIR' when 4 channels else 'sen2spring' (utils.py:114-117) —
the *spring* statistics are applied to every season.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..config import load_dataset_stats


class NormStats:
    """Per-modality mean/std as jnp arrays, built once from the JSON."""

    def __init__(self, stats: Optional[Dict] = None):
        stats = stats or load_dataset_stats()
        self.s2_mean = jnp.asarray(stats["sen2spring"]["mean"], jnp.float32)
        self.s2_std = jnp.asarray(stats["sen2spring"]["std"], jnp.float32)
        self.s2nir_mean = jnp.asarray(stats["sen2springNIR"]["mean"], jnp.float32)
        self.s2nir_std = jnp.asarray(stats["sen2springNIR"]["std"], jnp.float32)
        self.s1_mean = jnp.asarray(stats["sen1"]["mean"], jnp.float32)
        self.s1_std = jnp.asarray(stats["sen1"]["std"], jnp.float32)
        self.viirs_mean = jnp.asarray(stats["viirs"]["mean"], jnp.float32)
        self.viirs_std = jnp.asarray(stats["viirs"]["std"], jnp.float32)


def normalize_and_assemble(
    sample: Dict[str, jnp.ndarray],
    stats: NormStats,
) -> jnp.ndarray:
    """Normalize S2/S1/VIIRS (NHWC) and concat into the model input."""
    parts = []
    if "S2" in sample:
        x = sample["S2"].astype(jnp.float32)
        if x.shape[-1] == 4:
            x = (x - stats.s2nir_mean) / stats.s2nir_std
        else:
            x = (x - stats.s2_mean) / stats.s2_std
        parts.append(x)
    if "S1" in sample:
        x = (sample["S1"].astype(jnp.float32) - stats.s1_mean) / stats.s1_std
        parts.append(x)
    if "VIIRS" in sample:
        x = (sample["VIIRS"].astype(jnp.float32) - stats.viirs_mean) / stats.viirs_std
        parts.append(x)
    if not parts:
        raise ValueError("no modalities to assemble")
    return jnp.concatenate(parts, axis=-1)


def photometric_s2_traced(
    s2: jnp.ndarray, params: jnp.ndarray
) -> jnp.ndarray:
    """Jit-friendly S2 brightness+gamma augmentation.

    ``params`` is a length-4 float32 array [apply_brightness, beta,
    apply_gamma, gamma] (traced — no recompiles across draws). Semantics
    match aug.augment.apply_photometric_s2 / the reference
    utils/transform.py:175-276, including the 3-channel gamma->multiply
    quirk and the [0,1] clamps of torchvision.
    """
    s2max = 10000.0
    apply_b = params[0] > 0.5
    beta = params[1]
    apply_g = params[2] > 0.5
    gamma = params[3]
    c = s2.shape[-1]

    xb = jnp.clip(s2 / s2max * beta, 0.0, 1.0) * s2max
    x = jnp.where(apply_b, xb, s2)

    x01 = jnp.clip(x, 0.0, None) / s2max
    if c == 3:
        xg = jnp.clip(x01 * gamma, 0.0, 1.0) * s2max
    else:
        xg = jnp.clip(x01**gamma, 0.0, 1.0) * s2max
    x = jnp.where(apply_g, xg, x)
    return x
