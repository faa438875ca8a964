"""Random parameter initialisation for the POPCORN model.

Matches the reference's init scheme (model/popcorn.py:59-66, 78-88):
UNet convs get Kaiming-normal (fan_out, relu) weights; the head's 1x1
convs keep torch's default Conv2d init (Kaiming-uniform bound
1/sqrt(fan_in) for both weight and bias); the final head bias is set to
``biasinit`` to avoid dying ReLUs (popcorn.py:88).

Deviation (documented): when pretrained=False the reference still loads
the DDA checkpoint and only overwrites conv weights, keeping checkpoint
BatchNorm running stats (popcorn.py:57-66). Our random init uses identity
BN constants instead when no checkpoint is supplied; training-from-scratch
users normally pass the DDA checkpoint anyway (its BN constants are then
used verbatim).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .unet import OPT_IN, SAR_IN

Tree = Dict[str, Any]


def _kaiming_normal_conv(key, kh, kw, cin, cout):
    # torch kaiming_normal_(mode='fan_out', nonlinearity='relu'):
    # std = sqrt(2 / fan_out), fan_out = cout * kh * kw
    std = (2.0 / (cout * kh * kw)) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _uniform_bias(key, cin_fan, cout):
    bound = 1.0 / (cin_fan**0.5)
    return jax.random.uniform(key, (cout,), jnp.float32, -bound, bound)


def _conv(key, kh, kw, cin, cout) -> Tree:
    kw_, kb = jax.random.split(key)
    return {
        "w": _kaiming_normal_conv(kw_, kh, kw, cin, cout),
        "b": _uniform_bias(kb, cin * kh * kw, cout),
    }


def _double_conv(key, cin, cout) -> Tree:
    k1, k2 = jax.random.split(key)
    return {"conv1": _conv(k1, 3, 3, cin, cout), "conv2": _conv(k2, 3, 3, cout, cout)}


def _tconv(key, c) -> Tree:
    # torch ConvTranspose2d default init: kaiming_uniform(a=sqrt(5)) ->
    # bound 1/sqrt(fan_in); fan_in = c * 2 * 2.
    kw_, kb = jax.random.split(key)
    bound = 1.0 / ((c * 4) ** 0.5)
    return {
        "w": jax.random.uniform(kw_, (c, 2, 2, c), jnp.float32, -bound, bound),
        "b": _uniform_bias(kb, c * 4, c),
    }


def _bn_identity(c) -> Tree:
    return {"scale": jnp.ones((c,), jnp.float32), "shift": jnp.zeros((c,), jnp.float32)}


def init_stream(key, cin, topology=(8, 16)) -> Tree:
    t0, t1 = topology
    keys = jax.random.split(key, 7)
    return {
        "inc": _double_conv(keys[0], cin, t0),
        "down1": _double_conv(keys[1], t0, t1),
        "down2": _double_conv(keys[2], t1, t1),
        "up2": {"tconv": _tconv(keys[3], t1), "conv": _double_conv(keys[4], 2 * t1, t0)},
        "up1": {"tconv": _tconv(keys[5], t0), "conv": _double_conv(keys[6], 2 * t0, t0)},
    }


def init_stream_bn(topology=(8, 16)) -> Tree:
    t0, t1 = topology
    dc = lambda c: {"bn1": _bn_identity(c), "bn2": _bn_identity(c)}
    return {
        "inc": dc(t0),
        "down1": dc(t1),
        "down2": dc(t1),
        "up2": dc(t0),
        "up1": dc(t0),
    }


def _out_conv(key, cin, cout=1) -> Tree:
    kw_, kb = jax.random.split(key)
    bound = 1.0 / (cin**0.5)
    return {
        "w": jax.random.uniform(kw_, (cin, cout), jnp.float32, -bound, bound),
        "b": _uniform_bias(kb, cin, cout),
    }


def init_dual_stream(key, topology=(8, 16)) -> Tree:
    ks = jax.random.split(key, 5)
    t0 = topology[0]
    return {
        "sar": init_stream(ks[0], SAR_IN, topology),
        "opt": init_stream(ks[1], OPT_IN, topology),
        "sar_out": _out_conv(ks[2], t0),
        "opt_out": _out_conv(ks[3], t0),
        "fusion_out": _out_conv(ks[4], 2 * t0),
    }


def init_dual_stream_bn(topology=(8, 16)) -> Tree:
    return {"sar": init_stream_bn(topology), "opt": init_stream_bn(topology)}


def init_head(key, cin=16, hidden=64, biasinit=0.75) -> Tree:
    """Head init (popcorn.py:78-88): torch-default 1x1 convs, lifted final bias."""
    ks = jax.random.split(key, 4)
    dims = [(cin, hidden), (hidden, hidden), (hidden, hidden), (hidden, 2)]
    head = {}
    for i, ((ci, co), k) in enumerate(zip(dims, ks)):
        kw_, kb = jax.random.split(k)
        bound = 1.0 / (ci**0.5)
        head[f"l{i + 1}"] = {
            "w": jax.random.uniform(kw_, (ci, co), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (co,), jnp.float32, -bound, bound),
        }
    head["l4"]["b"] = jnp.full((2,), biasinit, jnp.float32)
    return head


def init_popcorn(key, cfg: ModelConfig):
    """Random params + identity-BN consts (no pretrained checkpoint).

    Use compat.torch_convert.load_popcorn_from_dda for the pretrained path.
    """
    k_unet, k_head, k_builder = jax.random.split(key, 3)
    params = {
        "unet": init_dual_stream(k_unet),
        "head": init_head(k_head, biasinit=cfg.biasinit),
    }
    consts = {
        "unet_bn": init_dual_stream_bn(),
        "builder": {
            "params": init_dual_stream(k_builder),
            "bn": init_dual_stream_bn(),
        },
    }
    return params, consts
