"""Low-level TPU-friendly NN ops used by the POPCORN model.

All tensors are NHWC (TPU/XLA's preferred convolution layout, unlike the
reference's NCHW torch layout). Convolutions accumulate in float32 on the
MXU via ``preferred_element_type`` regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def conv3x3(x: jnp.ndarray, p: Params, dtype=None) -> jnp.ndarray:
    """3x3 same-padding convolution (+bias). p['w']: (3,3,Cin,Cout)."""
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_CONV_DIMS,
        # bf16 mode: output in bf16 (MXU accumulates f32 internally); the
        # AD transpose rule requires cotangent/operand dtypes to match, so
        # explicit f32 accumulation is only used in the f32 (parity) mode.
        preferred_element_type=None if dtype is not None else jnp.float32,
        precision=None if dtype is not None else lax.Precision.HIGHEST,
    )
    return y + p["b"].astype(y.dtype)


def conv1x1(x: jnp.ndarray, p: Params, dtype=None) -> jnp.ndarray:
    """1x1 convolution as a channel matmul. p['w']: (Cin, Cout)."""
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jnp.einsum(
        "bhwc,co->bhwo",
        x,
        w,
        # bf16 mode: output in bf16 (MXU accumulates f32 internally); the
        # AD transpose rule requires cotangent/operand dtypes to match, so
        # explicit f32 accumulation is only used in the f32 (parity) mode.
        preferred_element_type=None if dtype is not None else jnp.float32,
        precision=None if dtype is not None else lax.Precision.HIGHEST,
    )
    return y + p["b"].astype(y.dtype)


def frozen_bn(x: jnp.ndarray, bn: Params) -> jnp.ndarray:
    """Frozen BatchNorm as a per-channel affine.

    The reference freezes every BatchNorm2d on every forward pass
    (model/popcorn.py:128 via networks.py:184-189), so BN is *always* in
    inference mode with fixed running stats. We precompute
      scale = gamma / sqrt(running_var + eps)
      shift = beta - running_mean * scale
    at weight-conversion time; XLA fuses this affine into the conv epilogue.
    """
    return x * bn["scale"].astype(x.dtype) + bn["shift"].astype(x.dtype)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool, floor semantics (torch MaxPool2d(2))."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def conv_transpose_2x2(x: jnp.ndarray, p: Params, dtype=None) -> jnp.ndarray:
    """2x2 stride-2 transposed convolution as matmul + pixel shuffle.

    Equivalent to torch ConvTranspose2d(Cin, Cout, 2, stride=2)
    (reference: networks.py:302): every input pixel expands into a 2x2
    output block, y[2i+di, 2j+dj, o] = sum_c x[i,j,c] * W[c,di,dj,o] + b[o].
    Lowering it as one (B*H*W, Cin) @ (Cin, 4*Cout) matmul plus a reshape
    is MXU-friendly and avoids XLA's generic conv-transpose path.

    p['w']: (Cin, 2, 2, Cout).
    """
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    b, h, wi, cin = x.shape
    cout = w.shape[-1]
    y = jnp.einsum(
        "bhwc,cijo->bhwijo",
        x,
        w,
        # bf16 mode: output in bf16 (MXU accumulates f32 internally); the
        # AD transpose rule requires cotangent/operand dtypes to match, so
        # explicit f32 accumulation is only used in the f32 (parity) mode.
        preferred_element_type=None if dtype is not None else jnp.float32,
        precision=None if dtype is not None else lax.Precision.HIGHEST,
    )
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wi, cout)
    return y + p["b"].astype(y.dtype)


def pad_to_match(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad x1 spatially to x2's H/W (torch F.pad in Up, networks.py:309-312).

    Shapes are static under jit, so this is plain Python control flow.
    """
    dy = x2.shape[1] - x1.shape[1]
    dx = x2.shape[2] - x1.shape[2]
    if dy == 0 and dx == 0:
        return x1
    return jnp.pad(
        x1,
        ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
    )


def reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Reflect-pad H and W by p pixels on each side (torch 'reflect')."""
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


PadSpec = Tuple[Optional[int], Optional[int], Optional[int], Optional[int]]


def add_padding(x: jnp.ndarray, force: bool = True) -> Tuple[jnp.ndarray, PadSpec]:
    """Input padding before the UNet (reference: model/popcorn.py:231-258).

    force=True: reflect-pad 14 px on every side.
    force=False: pad H (then W) up to a multiple of 64 with reflect padding,
    but only when the dim is not already a multiple of 32 — reproducing the
    reference's exact (quirky) rule, which is sufficient for the 2-level UNet.
    Returns the padded array and (px1, px2, py1, py2) for revert_padding.
    """
    px1 = px2 = py1 = py2 = None
    if force:
        p = 14
        x = reflect_pad(x, p)
        px1 = px2 = py1 = py2 = p
    else:
        h, w = x.shape[1], x.shape[2]
        if h % 32 != 0:
            px1 = (64 - h % 64) // 2
            px2 = (64 - h % 64) - px1
            x = jnp.pad(x, ((0, 0), (px1, px2), (0, 0), (0, 0)), mode="reflect")
        if w % 32 != 0:
            py1 = (64 - w % 64) // 2
            py2 = (64 - w % 64) - py1
            x = jnp.pad(x, ((0, 0), (0, 0), (py1, py2), (0, 0)), mode="reflect")
    return x, (px1, px2, py1, py2)


def revert_padding(x: jnp.ndarray, pad: PadSpec) -> jnp.ndarray:
    """Undo add_padding (reference: model/popcorn.py:261-276)."""
    px1, px2, py1, py2 = pad
    if px1 is not None or px2 is not None:
        x = x[:, px1 : x.shape[1] - px2, :, :]
    if py1 is not None or py2 is not None:
        x = x[:, :, py1 : x.shape[2] - py2, :]
    return x
