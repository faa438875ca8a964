"""Dual-stream UNet built-up-area extractor, TPU-native.

Re-implements the *behaviour* of the reference's DDA dual-stream UNet
(model/DDA_model/utils/networks.py:72-248, topology [8, 16]) as pure
functions over explicit parameter pytrees:

  - two independent UNet streams (SAR: 2ch, optical: 4ch), each
    inc -> down1 -> down2 -> up2(skip=down1) -> up1(skip=inc), where every
    block is DoubleConv = (conv3x3 -> frozen BN -> ReLU) x 2
    (networks.py:253-271);
  - feature output = concat(sar 8ch, optical 8ch) = 16ch, i.e. the
    ``return_features=True`` path (networks.py:192-211);
  - building logits = fusion_out_conv (1x1, 16->1) over the fused features
    when both streams are active, else the per-stream out conv
    (networks.py:213-237).

BatchNorm is always frozen in POPCORN (popcorn.py:128), so it lives in a
separate non-trainable ``bn`` constants pytree as per-channel scale/shift
(see ops.frozen_bn). All tensors NHWC.

Parameter pytree layout per stream:
  {'inc'|'down1'|'down2': {'conv1': {w,b}, 'conv2': {w,b}},
   'up2'|'up1': {'tconv': {w,b}, 'conv': {'conv1': {w,b}, 'conv2': {w,b}}}}
BN constants mirror the structure with {'bn1'|'bn2': {scale, shift}} per
DoubleConv. The dual-stream tree is
  {'sar': stream, 'opt': stream, 'sar_out': {w,b}, 'opt_out': {w,b},
   'fusion_out': {w,b}}  /  bn: {'sar': ..., 'opt': ...}.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from .ops import (
    conv1x1,
    conv3x3,
    conv_transpose_2x2,
    frozen_bn,
    max_pool_2x2,
    pad_to_match,
)

Tree = Dict[str, Any]


def double_conv(p: Tree, bn: Tree, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """(conv3x3 -> frozen BN -> ReLU) x 2 (reference: networks.py:253-271)."""
    x = jax.nn.relu(frozen_bn(conv3x3(x, p["conv1"], dtype), bn["bn1"]))
    x = jax.nn.relu(frozen_bn(conv3x3(x, p["conv2"], dtype), bn["bn2"]))
    return x


def _up_block(p: Tree, bn: Tree, x1: jnp.ndarray, x2: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Up = tconv(x1) -> pad to x2 -> concat[x2, x1] -> DoubleConv.

    Channel order concat([skip, upsampled]) matches networks.py:318.
    """
    x1 = conv_transpose_2x2(x1, p["tconv"], dtype)
    x1 = pad_to_match(x1, x2)
    x = jnp.concatenate([x2.astype(x1.dtype), x1], axis=-1)
    return double_conv(p["conv"], bn, x, dtype)


def unet_stream(
    p: Tree,
    bn: Tree,
    x: jnp.ndarray,
    *,
    encoder_stop_grad: bool = False,
    dtype=None,
    remat: bool = False,
) -> jnp.ndarray:
    """One UNet stream, returning pre-outconv 8ch features.

    encoder_stop_grad reproduces the reference's ``encoder_no_grad``
    (networks.py:124-133): the downward path runs without gradient.
    remat wraps each DoubleConv in jax.checkpoint to trade FLOPs for HBM
    on large training crops (TPU equivalent of the reference's
    memory-tiered grad freezing motivation).
    """
    dc = double_conv
    if remat:
        dc = jax.checkpoint(double_conv, static_argnums=(3,))

    x1 = dc(p["inc"], bn["inc"], x, dtype)
    d1 = dc(p["down1"], bn["down1"], max_pool_2x2(x1), dtype)
    d2 = dc(p["down2"], bn["down2"], max_pool_2x2(d1), dtype)
    if encoder_stop_grad:
        x1 = lax.stop_gradient(x1)
        d1 = lax.stop_gradient(d1)
        d2 = lax.stop_gradient(d2)
    u2 = _up_block(p["up2"], bn["up2"], d2, d1, dtype)
    u1 = _up_block(p["up1"], bn["up1"], u2, x1, dtype)
    return u1


SAR_IN = 2  # VV, VH (utils/constants.py:176)
OPT_IN = 4  # B02, B03, B04, B08


def dual_stream_features(
    p: Tree,
    bn: Tree,
    x6: jnp.ndarray,
    *,
    s1: bool = True,
    s2: bool = True,
    encoder_stop_grad: bool = False,
    dtype=None,
    remat: bool = False,
) -> jnp.ndarray:
    """Fused features: concat of active-stream outputs (networks.py:192-211).

    x6 is the 6-channel DDA-ordered input [VV, VH, B02, B03, B04, B08].
    """
    feats = []
    if s1:
        feats.append(
            unet_stream(
                p["sar"], bn["sar"], x6[..., :SAR_IN],
                encoder_stop_grad=encoder_stop_grad, dtype=dtype, remat=remat,
            )
        )
    if s2:
        feats.append(
            unet_stream(
                p["opt"], bn["opt"], x6[..., SAR_IN:],
                encoder_stop_grad=encoder_stop_grad, dtype=dtype, remat=remat,
            )
        )
    return jnp.concatenate(feats, axis=-1)


def building_logits(
    p: Tree,
    bn: Tree,
    x6: jnp.ndarray,
    *,
    s1: bool = True,
    s2: bool = True,
    dtype=None,
) -> jnp.ndarray:
    """Built-up logits (networks.py:213-237).

    Both streams: fusion_out_conv over fused 16ch features; single stream:
    that stream's own out conv over its 8ch features.
    """
    if s1 and s2:
        feats = dual_stream_features(p, bn, x6, s1=True, s2=True, dtype=dtype)
        return conv1x1(feats, p["fusion_out"], dtype)
    if s1:
        feats = unet_stream(p["sar"], bn["sar"], x6[..., :SAR_IN], dtype=dtype)
        return conv1x1(feats, p["sar_out"], dtype)
    feats = unet_stream(p["opt"], bn["opt"], x6[..., SAR_IN:], dtype=dtype)
    return conv1x1(feats, p["opt_out"], dtype)
