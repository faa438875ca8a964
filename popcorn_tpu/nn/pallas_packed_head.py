"""Pallas TPU kernel: fused POPCORN head on space-to-depth packed features.

The packed head (nn/packed.py::packed_head_apply) runs the 4-layer 1x1-conv
head as block-diagonal kron(I_16, W) matmuls; in plain XLA each 1024-lane
intermediate is a ~0.5 GB HBM round-trip per 2048^2 patch. This kernel
fuses all four layers in VMEM: HBM traffic drops to read-256 + write-16
lanes per packed pixel.

Inference-path only (popcorn_forward uses it when fused_head is on and
train=False); the training path keeps the XLA block-diag matmuls, whose
autodiff is free. Equality with the XLA path is tested in
tests/test_pallas_head.py (interpret mode on CPU).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed import kron_blockdiag, lift_vec

Tree = Dict[str, Any]

TILE = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref,
            b4_ref, out_ref):
    x = x_ref[:]
    w1 = w1_ref[:]
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(h, 0.0)
    h = jnp.dot(h.astype(w1.dtype), w2_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[:], 0.0)
    h = jnp.dot(h.astype(w1.dtype), w3_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b3_ref[:], 0.0)
    out = jnp.dot(h.astype(w1.dtype), w4_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = out + b4_ref[:]


def fused_packed_head(
    head: Tree, feats_packed: jnp.ndarray, f: int, dtype=None,
    two_stream: bool = True,
) -> jnp.ndarray:
    """(B,Hp,Wp,f^2*16) packed features -> (B,Hp,Wp,f^2) packed channel-0.

    Weight lifting (kron block-diagonals, two-part first layer for the
    [sar|opt] lane split) happens outside the kernel in XLA; the kernel
    sees one fused (f^2*16, f^2*64) first-layer matrix.
    """
    ff = f * f
    w1 = head["l1"]["w"]  # (16, 64)
    if two_stream and f > 1:
        # [sar | opt] packed halves: block-diag each half then stack rows
        w1k = jnp.concatenate(
            [kron_blockdiag(w1[:8], f), kron_blockdiag(w1[8:], f)], axis=0
        )  # (2*ff*8, ff*64)
    else:
        w1k = kron_blockdiag(w1, f)
    b1 = lift_vec(head["l1"]["b"], f)
    w2k = kron_blockdiag(head["l2"]["w"], f)
    b2 = lift_vec(head["l2"]["b"], f)
    w3k = kron_blockdiag(head["l3"]["w"], f)
    b3 = lift_vec(head["l3"]["b"], f)
    w4k = kron_blockdiag(head["l4"]["w"][:, :1], f)
    b4 = lift_vec(head["l4"]["b"][:1], f)

    cdt = dtype or jnp.float32
    w1k, w2k, w3k, w4k = (m.astype(cdt) for m in (w1k, w2k, w3k, w4k))
    b1, b2, b3, b4 = (
        v.astype(jnp.float32).reshape(1, -1) for v in (b1, b2, b3, b4)
    )

    b, hp, wp, cin = feats_packed.shape
    n = b * hp * wp
    x2d = feats_packed.reshape(n, cin).astype(cdt)
    n_pad = (-n) % TILE
    if n_pad:
        x2d = jnp.pad(x2d, ((0, n_pad), (0, 0)))

    grid = x2d.shape[0] // TILE
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full, full, full, full, full, full, full, full,
        ],
        out_specs=pl.BlockSpec((TILE, ff), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2d.shape[0], ff), jnp.float32),
        interpret=_interpret(),
    )(x2d, w1k, b1, w2k, b2, w3k, b3, w4k, b4)
    if n_pad:
        out = out[:n]
    return out.reshape(b, hp, wp, ff)
