"""Pallas TPU kernel: fused POPCORN head on space-to-depth packed features.

The packed head (nn/packed.py::packed_head_apply) runs the 4-layer 1x1-conv
head as block-diagonal kron(I_ff, W) matmuls; in plain XLA each 1024-lane
intermediate is a ~0.5 GB HBM round-trip per 2048^2 patch (measured ~8 ms
per ensemble member on v5e). This kernel fuses all four layers in VMEM —
HBM traffic drops to read-256 + write-16 lanes per packed pixel — AND
exploits the block-diagonal structure: kron(I_16, W64) has only 8 nonzero
128x128 MXU blocks out of 64, so the middle layers run as 8 per-block
(TM,128)@(128,128) matmuls instead of one dense (TM,1024)@(1024,1024).

MXU passes per 128 rows: 16 (L1 dense 256->1024) + 8 + 8 + 8 = 40,
vs 152 for the round-1 dense-in-VMEM kernel (which measured SLOWER than
the XLA block-diag path for exactly this reason).

Inference-path only; the training path keeps the XLA block-diag matmuls,
whose autodiff is free. Equality with the XLA path is tested in
tests/test_pallas_head.py (interpret mode on CPU and on the real chip).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed import kron_blockdiag, lift_vec

Tree = Dict[str, Any]

TILE = 4096  # packed pixels per grid step (VMEM-bounded; 8192 OOMs)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _blockdiag_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                      w4_ref, b4_ref, out_ref):
    """x (TM, Cin) -> out (TM, ff) float32.

    w1 (Cin, ff*64) dense; w2/w3 (nb, 128, 128) diagonal blocks of the
    kron; w4 (nb, 128, ff) row-blocks of the final kron column-slice.
    """
    nb = w2_ref.shape[0]
    x = x_ref[:]
    cdt = x.dtype
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    # fully per-block pipeline: the (TM, ff*64) h1 intermediate is never
    # materialised (at TM=2048/f=4 it would be 8 MB f32 of VMEM)
    for j in range(nb):
        h1 = jnp.dot(
            x, w1_ref[:, j * 128 : (j + 1) * 128],
            preferred_element_type=jnp.float32,
        )
        h1 = jnp.maximum(h1 + b1_ref[:, j * 128 : (j + 1) * 128], 0.0).astype(cdt)
        h2 = jnp.dot(h1, w2_ref[j], preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2_ref[:, j * 128 : (j + 1) * 128], 0.0).astype(cdt)
        h3 = jnp.dot(h2, w3_ref[j], preferred_element_type=jnp.float32)
        h3 = jnp.maximum(h3 + b3_ref[:, j * 128 : (j + 1) * 128], 0.0).astype(cdt)
        acc = acc + jnp.dot(h3, w4_ref[j], preferred_element_type=jnp.float32)
    out_ref[:] = acc + b4_ref[:]


def _dense_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  w4_ref, b4_ref, out_ref):
    """Fallback: all layers as dense VMEM matmuls (small f / one stream)."""
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


def _blockdiag_kernel_cdt(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                          b3_ref, w4_ref, b4_ref, out_ref):
    """_blockdiag_kernel variant writing in the compute dtype (halves the
    lane-padded output write in bf16 mode; matches the XLA block-diag
    path's precision, whose matmuls also produce bf16)."""
    nb = w2_ref.shape[0]
    x = x_ref[:]
    cdt = x.dtype
    acc = jnp.zeros((x.shape[0], out_ref.shape[1]), jnp.float32)
    for j in range(nb):
        h1 = jnp.dot(
            x, w1_ref[:, j * 128 : (j + 1) * 128],
            preferred_element_type=jnp.float32,
        )
        h1 = jnp.maximum(h1 + b1_ref[:, j * 128 : (j + 1) * 128], 0.0).astype(cdt)
        h2 = jnp.dot(h1, w2_ref[j], preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2_ref[:, j * 128 : (j + 1) * 128], 0.0).astype(cdt)
        h3 = jnp.dot(h2, w3_ref[j], preferred_element_type=jnp.float32)
        h3 = jnp.maximum(h3 + b3_ref[:, j * 128 : (j + 1) * 128], 0.0).astype(cdt)
        acc = acc + jnp.dot(h3, w4_ref[j], preferred_element_type=jnp.float32)
    out_ref[:] = (acc + b4_ref[:]).astype(out_ref.dtype)


def fused_packed_head(
    head: Tree, feats_packed: jnp.ndarray, f: int, dtype=None,
    two_stream: bool = True, flat: bool = False,
) -> jnp.ndarray:
    """(B,Hp,Wp,f^2*16) packed features -> (B,Hp,Wp,f^2) packed channel-0,
    or — with flat=True — (B,Hp,Wp*f^2) in the dense-lane flat layout
    (no 128-lane padding of the size-16 minor dim).

    Weight lifting (kron block-diagonals, two-part first layer for the
    [sar|opt] lane split) happens outside the kernel in XLA.
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

    hidden = ff * 64
    if hidden % 128 == 0:
        # block-diagonal scheme: slice out the nb nonzero 128x128 diagonal
        # blocks of w2k/w3k and the matching row-blocks of w4k
        nb = hidden // 128
        w2b = jnp.stack(
            [w2k[j * 128 : (j + 1) * 128, j * 128 : (j + 1) * 128] for j in range(nb)]
        ).astype(cdt)
        w3b = jnp.stack(
            [w3k[j * 128 : (j + 1) * 128, j * 128 : (j + 1) * 128] for j in range(nb)]
        ).astype(cdt)
        w4b = jnp.stack(
            [w4k[j * 128 : (j + 1) * 128, :] for j in range(nb)]
        ).astype(cdt)
        if flat:
            # Mosaic cannot shape-cast (TM,ff)->(rows, wp*ff) in VMEM, so
            # the kernel writes (N, ff) in the compute dtype (bf16 halves
            # the lane-padded write) and one XLA relayout per call lands
            # the dense-lane flat layout the ensemble fold accumulates in.
            out = pl.pallas_call(
                _blockdiag_kernel_cdt,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(
                        (TILE, cin), lambda i: (i, 0), memory_space=pltpu.VMEM
                    ),
                    full, full, full, full, full, full, full, full,
                ],
                out_specs=pl.BlockSpec(
                    (TILE, ff), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((x2d.shape[0], ff), cdt),
                interpret=_interpret(),
            )(x2d, w1k.astype(cdt), b1, w2b, b2, w3b, b3, w4b, b4)
            if n_pad:
                out = out[:n]
            return out.reshape(b, hp, wp * ff)
        out = pl.pallas_call(
            _blockdiag_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
                full, full, full, full, full, full, full, full,
            ],
            out_specs=pl.BlockSpec(
                (TILE, ff), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((x2d.shape[0], ff), jnp.float32),
            interpret=_interpret(),
        )(x2d, w1k.astype(cdt), b1, w2b, b2, w3b, b3, w4b, b4)
    else:
        out = pl.pallas_call(
            _dense_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
                full, full, full, full, full, full, full, full,
            ],
            out_specs=pl.BlockSpec(
                (TILE, ff), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((x2d.shape[0], ff), jnp.float32),
            interpret=_interpret(),
        )(
            x2d, w1k.astype(cdt), b1, w2k.astype(cdt), b2,
            w3k.astype(cdt), b3, w4k.astype(cdt), b4,
        )
    if n_pad:
        out = out[:n]
    return out.reshape(b, hp, wp, ff)
