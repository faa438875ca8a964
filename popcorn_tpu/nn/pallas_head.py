"""Pallas TPU kernel: fused 4-layer 1x1-conv POPCORN head.

The head (16 -> 64 -> 64 -> 64 -> 2 with ReLUs, model/popcorn.py:80-85) is
bandwidth-bound when evaluated densely: on a 2048x2048 patch each
64-channel intermediate is a 1 GiB float32 HBM round-trip, and XLA does
not fuse matmul chains. This kernel keeps all intermediates in VMEM:

  HBM traffic per pixel = read 16ch + write 2ch (vs 16+2+6x64 unfused),
  an ~8x reduction on the dominant term.

Pixels are independent, so the (B,H,W,16) input is flattened to (N,16),
padded to a tile multiple, and processed in (TILE,16) blocks; the four
weight matrices live in VMEM for the whole grid. A custom VJP recomputes
the hidden activations in the backward kernel (input is the only
residual) and accumulates weight gradients across grid steps in revisited
VMEM output blocks (the TPU grid is sequential).

Falls back to interpreter mode off-TPU so the same code path is tested on
CPU (tests/test_pallas_head.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Tree = Dict[str, Any]

TILE = 1024
_DIMS = (16, 64, 64, 64, 2)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, out_ref):
    x = x_ref[:].astype(jnp.float32)
    h = jnp.maximum(
        jnp.dot(x, w1[:], preferred_element_type=jnp.float32) + b1[:], 0.0
    )
    h = jnp.maximum(
        jnp.dot(h, w2[:], preferred_element_type=jnp.float32) + b2[:], 0.0
    )
    h = jnp.maximum(
        jnp.dot(h, w3[:], preferred_element_type=jnp.float32) + b3[:], 0.0
    )
    out_ref[:] = jnp.dot(h, w4[:], preferred_element_type=jnp.float32) + b4[:]


def _bwd_kernel(
    x_ref, g_ref, w1, b1, w2, b2, w3, b3, w4,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref, dw4_ref, db4_ref,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        db3_ref[:] = jnp.zeros_like(db3_ref)
        dw4_ref[:] = jnp.zeros_like(dw4_ref)
        db4_ref[:] = jnp.zeros_like(db4_ref)

    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    # recompute forward activations (residual = input only)
    h1 = jnp.maximum(jnp.dot(x, w1[:], preferred_element_type=jnp.float32) + b1[:], 0.0)
    h2 = jnp.maximum(jnp.dot(h1, w2[:], preferred_element_type=jnp.float32) + b2[:], 0.0)
    h3 = jnp.maximum(jnp.dot(h2, w3[:], preferred_element_type=jnp.float32) + b3[:], 0.0)

    g3 = jnp.dot(g, w4[:].T, preferred_element_type=jnp.float32) * (h3 > 0)
    g2 = jnp.dot(g3, w3[:].T, preferred_element_type=jnp.float32) * (h2 > 0)
    g1 = jnp.dot(g2, w2[:].T, preferred_element_type=jnp.float32) * (h1 > 0)
    dx_ref[:] = jnp.dot(g1, w1[:].T, preferred_element_type=jnp.float32).astype(
        dx_ref.dtype
    )

    dw4_ref[:] += jnp.dot(h3.T, g, preferred_element_type=jnp.float32)
    db4_ref[:] += jnp.sum(g, axis=0, keepdims=True)
    dw3_ref[:] += jnp.dot(h2.T, g3, preferred_element_type=jnp.float32)
    db3_ref[:] += jnp.sum(g3, axis=0, keepdims=True)
    dw2_ref[:] += jnp.dot(h1.T, g2, preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(g2, axis=0, keepdims=True)
    dw1_ref[:] += jnp.dot(x.T, g1, preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(g1, axis=0, keepdims=True)


def _weights_tuple(p: Tree):
    return (
        p["l1"]["w"], p["l1"]["b"].reshape(1, -1),
        p["l2"]["w"], p["l2"]["b"].reshape(1, -1),
        p["l3"]["w"], p["l3"]["b"].reshape(1, -1),
        p["l4"]["w"], p["l4"]["b"].reshape(1, -1),
    )


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM)


def _w_specs(n):
    # whole-array blocks resident in VMEM for every grid step
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _head_flat(x2d: jnp.ndarray, wts: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    return _head_flat_fwd(x2d, wts)[0]


def _head_flat_fwd(x2d, wts):
    n = x2d.shape[0]
    grid = n // TILE
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, _DIMS[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_w_specs(8),
        ],
        out_specs=pl.BlockSpec(
            (TILE, _DIMS[4]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, _DIMS[4]), jnp.float32),
        interpret=_interpret(),
    )(x2d, *wts)
    return out, (x2d, wts)


def _head_flat_bwd(res, g):
    x2d, wts = res
    n = x2d.shape[0]
    grid = n // TILE
    w1, b1, w2, b2, w3, b3, w4, b4 = wts
    out_shapes = (
        jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),  # dx
        jax.ShapeDtypeStruct(w1.shape, jnp.float32),
        jax.ShapeDtypeStruct(b1.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        jax.ShapeDtypeStruct(b2.shape, jnp.float32),
        jax.ShapeDtypeStruct(w3.shape, jnp.float32),
        jax.ShapeDtypeStruct(b3.shape, jnp.float32),
        jax.ShapeDtypeStruct(w4.shape, jnp.float32),
        jax.ShapeDtypeStruct(b4.shape, jnp.float32),
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, _DIMS[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, _DIMS[4]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_w_specs(7),
        ],
        out_specs=(
            pl.BlockSpec((TILE, _DIMS[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full, full, full, full, full, full, full, full,
        ),
        out_shape=out_shapes,
        interpret=_interpret(),
    )(x2d, g, w1, b1, w2, b2, w3, b3, w4)
    dx, dw1, db1, dw2, db2, dw3, db3, dw4, db4 = outs
    return dx, (dw1, db1, dw2, db2, dw3, db3, dw4, db4)


_head_flat.defvjp(_head_flat_fwd, _head_flat_bwd)


def fused_head(p: Tree, feats: jnp.ndarray) -> jnp.ndarray:
    """Apply the fused head to (B,H,W,16) features -> (B,H,W,2) float32.

    Differentiable w.r.t. both feats and params (custom VJP).
    """
    b, h, w, c = feats.shape
    assert c == _DIMS[0], f"expected {_DIMS[0]} input channels, got {c}"
    n = b * h * w
    n_pad = (-n) % TILE
    x2d = feats.reshape(n, c)
    if n_pad:
        x2d = jnp.pad(x2d, ((0, n_pad), (0, 0)))
    wts = _weights_tuple(p)
    out = _head_flat(x2d, wts)
    if n_pad:
        out = out[:n]
    return out.reshape(b, h, w, _DIMS[4])
