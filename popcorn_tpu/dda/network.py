"""Trainable-BatchNorm dual-stream UNet for DDA training.

The POPCORN runtime always freezes BatchNorm (nn/unet.py), but *training*
the DDA extractor itself needs live batch statistics. This module runs
the same architecture with explicit BN parameters (gamma/beta) and
running-stat state (mean/var, torch momentum 0.1 semantics), and exports
a trained model into the frozen scale/shift constants the POPCORN
extractor consumes.

BN tree layout per DoubleConv: {'bn1'|'bn2': {'gamma','beta'}} (params)
and {'bn1'|'bn2': {'mean','var'}} (state), mirroring nn/init trees.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import BN_EPS
from ..nn.ops import conv3x3, conv_transpose_2x2, conv1x1, max_pool_2x2, pad_to_match
from ..nn.unet import SAR_IN

Tree = Dict[str, Any]
MOMENTUM = 0.1  # torch BatchNorm2d default


def _bn_apply(x, gamma, beta, mean, var):
    inv = gamma / jnp.sqrt(var + BN_EPS)
    return x * inv + (beta - mean * inv)


def batch_norm(x, bp: Tree, bs: Tree, train: bool):
    """Returns (y, new_state)."""
    if not train:
        return _bn_apply(x, bp["gamma"], bp["beta"], bs["mean"], bs["var"]), bs
    axes = (0, 1, 2)
    mean = jnp.mean(x, axes)
    var = jnp.var(x, axes)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = var * n / max(n - 1, 1)
    new = {
        "mean": (1 - MOMENTUM) * bs["mean"] + MOMENTUM * mean,
        "var": (1 - MOMENTUM) * bs["var"] + MOMENTUM * unbiased,
    }
    return _bn_apply(x, bp["gamma"], bp["beta"], mean, var), new


def _dc(p, bp, bs, x, train):
    y, s1 = batch_norm(conv3x3(x, p["conv1"]), bp["bn1"], bs["bn1"], train)
    y = jax.nn.relu(y)
    y, s2 = batch_norm(conv3x3(y, p["conv2"]), bp["bn2"], bs["bn2"], train)
    return jax.nn.relu(y), {"bn1": s1, "bn2": s2}


def _stream(p, bp, bs, x, train):
    x1, s_inc = _dc(p["inc"], bp["inc"], bs["inc"], x, train)
    d1, s_d1 = _dc(p["down1"], bp["down1"], bs["down1"], max_pool_2x2(x1), train)
    d2, s_d2 = _dc(p["down2"], bp["down2"], bs["down2"], max_pool_2x2(d1), train)

    u = conv_transpose_2x2(d2, p["up2"]["tconv"])
    u = pad_to_match(u, d1)
    u2, s_u2 = _dc(
        p["up2"]["conv"], bp["up2"], bs["up2"],
        jnp.concatenate([d1, u], -1), train,
    )
    u = conv_transpose_2x2(u2, p["up1"]["tconv"])
    u = pad_to_match(u, x1)
    u1, s_u1 = _dc(
        p["up1"]["conv"], bp["up1"], bs["up1"],
        jnp.concatenate([x1, u], -1), train,
    )
    state = {"inc": s_inc, "down1": s_d1, "down2": s_d2, "up2": s_u2, "up1": s_u1}
    return u1, state


def dual_stream_train_forward(
    params: Tree, bn_params: Tree, bn_state: Tree, x6: jnp.ndarray, train: bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tree]:
    """(sar_logits, opt_logits, fusion_logits, new_bn_state)."""
    sar, s_sar = _stream(params["sar"], bn_params["sar"], bn_state["sar"], x6[..., :SAR_IN], train)
    opt, s_opt = _stream(params["opt"], bn_params["opt"], bn_state["opt"], x6[..., SAR_IN:], train)
    fused = jnp.concatenate([sar, opt], -1)
    sar_logits = conv1x1(sar, params["sar_out"])
    opt_logits = conv1x1(opt, params["opt_out"])
    fusion_logits = conv1x1(fused, params["fusion_out"])
    return sar_logits, opt_logits, fusion_logits, {"sar": s_sar, "opt": s_opt}


def init_bn(topology=(8, 16)) -> Tuple[Tree, Tree]:
    """(bn_params, bn_state) with torch defaults (gamma=1, beta=0, var=1)."""
    t0, t1 = topology
    chans = {"inc": t0, "down1": t1, "down2": t1, "up2": t0, "up1": t0}

    def blocks():
        return {
            k: {
                "bn1": {"gamma": jnp.ones(c), "beta": jnp.zeros(c)},
                "bn2": {"gamma": jnp.ones(c), "beta": jnp.zeros(c)},
            }
            for k, c in chans.items()
        }

    def states():
        return {
            k: {
                "bn1": {"mean": jnp.zeros(c), "var": jnp.ones(c)},
                "bn2": {"mean": jnp.zeros(c), "var": jnp.ones(c)},
            }
            for k, c in chans.items()
        }

    return (
        {"sar": blocks(), "opt": blocks()},
        {"sar": states(), "opt": states()},
    )


def to_frozen_consts(bn_params: Tree, bn_state: Tree) -> Tree:
    """Export trained BN to POPCORN's frozen scale/shift constants."""

    def conv(bp, bs):
        scale = bp["gamma"] / jnp.sqrt(bs["var"] + BN_EPS)
        return {"scale": scale, "shift": bp["beta"] - bs["mean"] * scale}

    return jax.tree.map(
        conv,
        bn_params,
        bn_state,
        is_leaf=lambda t: isinstance(t, dict) and "gamma" in t,
    )
