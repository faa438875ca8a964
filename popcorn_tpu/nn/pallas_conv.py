"""Pallas TPU kernels: fused packed double-conv blocks for the DDA UNets.

The space-to-depth packed engine (nn/packed.py) turns every UNet conv into
a 128-lane 3x3 conv; XLA runs each at ~90% of its (lifted-formulation) MXU
roofline, but a DoubleConv still round-trips its 67 MB intermediate through
HBM and the bias/BN/relu epilogues each re-read the activation. These
kernels fuse an entire UNet block in VMEM:

  * ``fused_double_conv``   — conv3x3 + affine + relu, twice (Inc/Down
    blocks, nn/packed.py::packed_double_conv);
  * ``fused_up_block``      — 1x1 packed tconv on the coarse input, the
    two-part lifted conv1 over [skip | up] (no channel concat is ever
    materialised), then conv2 (nn/packed.py::_packed_up).

HBM traffic per block drops from 6-8 tensor round-trips to read-inputs +
write-output, and the MXU stays hot because the 3x3 taps stream from VMEM
row slabs. Halo rows are fetched by explicit async DMA (the input lives in
HBM; each grid step copies rows [i*TR-2, i*TR+TR+2) of the width-padded
input), since BlockSpec blocks cannot overlap.

The bias+BN epilogue is pre-folded into one affine (scale, shift) pair per
conv outside the kernel: relu((x*W + b) * s + t) == relu(x*W * s + (b*s+t)).

Inference-path only (the training path keeps the XLA convs, whose autodiff
is free). Equality with the XLA packed path is covered by
tests/test_pallas_conv.py (interpret mode on CPU + the real chip).

Reference numerics preserved: model/DDA_model/utils/networks.py:253-330
(DoubleConv / Down / Up blocks of the dual-stream UNet).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Tree = Dict[str, Any]

# output rows computed per grid step (VMEM-bounded: the f32 conv
# accumulators are the largest live values; 16 rows OOMs the 16 MB VMEM at
# Wp=512 x 128 lanes)
TR = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fold_affine(b, scale, shift):
    """(conv + b) * scale + shift  ->  conv * s + t."""
    s = scale.astype(jnp.float32)
    t = b.astype(jnp.float32) * s + shift.astype(jnp.float32)
    return s.reshape(1, 1, -1), t.reshape(1, 1, -1)


def _conv_rows(slab, w9, n_rows, wout, acc=None):
    """3x3 conv over a VMEM row slab.

    slab: (>= n_rows+2, >= wout+2, Cin) ref; w9: (9, Cin, Cout) VMEM ref.
    Returns (n_rows, wout, Cout) float32. Static-unrolled taps; each tap is
    one MXU matmul over the whole (n_rows, wout) tile.
    """
    for dy in range(3):
        for dx in range(3):
            x = slab[dy : dy + n_rows, dx : dx + wout, :]
            y = jax.lax.dot_general(
                x,
                w9[dy * 3 + dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc


def _edge_mask(i, tr, n_rows, n_cols, hp, wp, row_off, col_off):
    """True where a slab position maps inside the global (hp, wp) image.

    Slab row rr maps to global row i*tr + rr + row_off; col cc to
    cc + col_off. Positions outside must be ZERO before feeding the next
    conv — they stand in for that conv's SAME zero padding (the XLA path
    zero-pads the true intermediate; computing relu(shift) in the halo
    would leak a nonzero boundary, nn/packed.py::conv_packed).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols, 1), 1)
    g_rows = rows + i * tr + row_off
    g_cols = cols + col_off
    return (g_rows >= 0) & (g_rows < hp) & (g_cols >= 0) & (g_cols < wp)


def _double_conv_kernel(tr, hp, xp_hbm, w1_ref, s1_ref, t1_ref, w2_ref,
                        s2_ref, t2_ref, out_ref, xt2, y1_ref, sems):
    """One tr-row chunk of relu(a2(conv2(relu(a1(conv1(x)))))).

    xp_hbm: (Hp_pad+4, Wp+4, Cin) in HBM (input pre-padded in XLA);
    xt2: (2, tr+4, Wp+4, Cin) double-buffered VMEM slabs (slab i+1 is
    DMA'd while slab i computes); y1_ref: (tr+2, y1w, Cm) scratch;
    out_ref: (tr, Wp, Cout) VMEM block (auto-pipelined by pallas).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(step, slot):
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(step * tr, tr + 4)], xt2.at[slot], sems.at[slot]
        )

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(i + 1, nxt).start()

    dma(i, slot).wait()
    xt = xt2[slot]
    cdt = xt.dtype
    wp = out_ref.shape[1]
    y1w = y1_ref.shape[1]  # wp+16, sublane-aligned scratch width
    y1 = _conv_rows(xt, w1_ref, tr + 2, y1w)
    y1 = jnp.maximum(y1 * s1_ref[:] + t1_ref[:], 0.0)
    # y1 slab row rr is global y1 row i*tr+rr-1, col cc-1: the halo ring
    # outside the image is conv2's SAME zero padding
    mask = _edge_mask(i, tr, tr + 2, y1w, hp, wp, row_off=-1, col_off=-1)
    y1_ref[:] = jnp.where(mask, y1, 0.0).astype(cdt)
    y2 = _conv_rows(y1_ref, w2_ref, tr, wp)
    y2 = jnp.maximum(y2 * s2_ref[:] + t2_ref[:], 0.0)
    out_ref[:] = y2.astype(out_ref.dtype)


def _pad_rows(hp: int, tr: int) -> int:
    return -(-hp // tr) * tr


def _cpad(c: int) -> int:
    """Channel dims padded to the 128-lane tile: Mosaic DMA slices require
    the lane dim to be a multiple of the (8,128) tiling. Zero lane padding
    is exact (zero inputs x zero weights contribute nothing)."""
    return -(-c // 128) * 128


def _pad_last(a, c_to):
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, c_to - a.shape[-1])])


def fused_double_conv(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    bn1: Tree,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    bn2: Tree,
    dtype=None,
) -> jnp.ndarray:
    """relu(bn2(conv2(relu(bn1(conv1(x)))))) fused in VMEM.

    x: (B, Hp, Wp, Cin) packed activation; w1 (3,3,Cin,Cm), w2 (3,3,Cm,Cout)
    LIFTED packed kernels; bn: {'scale','shift'} lifted vectors.
    """
    cdt = dtype or x.dtype
    b, hp, wp, cin = x.shape
    cm, cout = w1.shape[3], w2.shape[3]
    s1, t1 = _fold_affine(b1, bn1["scale"], bn1["shift"])
    s2, t2 = _fold_affine(b2, bn2["scale"], bn2["shift"])
    cinp, cmp_, coutp = _cpad(cin), _cpad(cm), _cpad(cout)
    w1 = _pad_last(jnp.pad(w1, ((0, 0), (0, 0), (0, cinp - cin), (0, 0))), cmp_)
    w2 = _pad_last(jnp.pad(w2, ((0, 0), (0, 0), (0, cmp_ - cm), (0, 0))), coutp)
    s1, t1 = _pad_last(s1, cmp_), _pad_last(t1, cmp_)
    s2, t2 = _pad_last(s2, coutp), _pad_last(t2, coutp)

    tr = min(TR, hp)
    hp_pad = _pad_rows(hp, tr)
    # +2 halo top / +2+grid-pad bottom; width slab overallocated to a
    # sublane-aligned width ([2 zeros][wp][rest zeros]) so the DMA into
    # the VMEM slab never slices the (8,128)-tiled sublane dim (Mosaic
    # requires 8-aligned slice shapes there); zeros = SAME conv padding
    y1w = _pad_rows(wp + 2, 8)
    xw = y1w + 16
    xp = jnp.pad(
        x.astype(cdt),
        ((0, 0), (2, 2 + hp_pad - hp), (2, xw - wp - 2), (0, cinp - cin)),
    )
    w19 = w1.reshape(9, cinp, cmp_).astype(cdt)
    w29 = w2.reshape(9, cmp_, coutp).astype(cdt)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    import functools

    kernel = functools.partial(_double_conv_kernel, tr, hp)

    def run(xpb):
        return pl.pallas_call(
            kernel,
            grid=(hp_pad // tr,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                full, full, full, full, full, full,
            ],
            out_specs=pl.BlockSpec(
                (tr, wp, coutp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((hp_pad, wp, coutp), cdt),
            scratch_shapes=[
                pltpu.VMEM((2, tr + 4, xw, cinp), cdt),
                pltpu.VMEM((tr + 2, y1w, cmp_), cdt),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=_interpret(),
        )(xpb, w19, s1, t1, w29, s2, t2)

    outs = [run(xp[bb]) for bb in range(b)]
    return jnp.stack(outs)[:, :hp, :, :cout]


def _up_block_kernel(tr, hp, x2p_hbm, x1p_hbm, wt_ref, tt_ref, wa_ref,
                     wb_ref, s1_ref, t1_ref, w2_ref, s2_ref, t2_ref, out_ref,
                     x2t, x1t, up_ref, y1_ref, sems):
    """Up block chunk: up = x1 @ Wt + bt (1x1 packed tconv — no BN/relu in
    the reference Up block's tconv, networks.py:317-319); y1 =
    relu(a1(conv(x2, wa) + conv(up, wb))); out = relu(a2(conv2(y1))).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma2(step, slot):
        return pltpu.make_async_copy(
            x2p_hbm.at[pl.ds(step * tr, tr + 4)], x2t.at[slot], sems.at[slot]
        )

    def dma1(step, slot):
        return pltpu.make_async_copy(
            x1p_hbm.at[pl.ds(step * tr, tr + 4)], x1t.at[slot], sems.at[2 + slot]
        )

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        dma2(0, 0).start()
        dma1(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma2(i + 1, nxt).start()
        dma1(i + 1, nxt).start()

    dma1(i, slot).wait()
    x1s = x1t[slot]
    cdt = x1s.dtype
    wp = out_ref.shape[1]
    xw = x1s.shape[1]
    y1w = y1_ref.shape[1]
    up = jax.lax.dot_general(
        x1s, wt_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # the halo ring outside the image must be conv1's SAME zero padding,
    # not 0 @ Wt + bt = bt (slab row rr is global row i*tr+rr-2)
    mask_up = _edge_mask(i, tr, tr + 4, xw, hp, wp, row_off=-2, col_off=-2)
    up_ref[:] = jnp.where(mask_up, up + tt_ref[:], 0.0).astype(cdt)
    dma2(i, slot).wait()
    y1 = _conv_rows(x2t[slot], wa_ref, tr + 2, y1w)
    y1 = _conv_rows(up_ref, wb_ref, tr + 2, y1w, acc=y1)
    y1 = jnp.maximum(y1 * s1_ref[:] + t1_ref[:], 0.0)
    mask = _edge_mask(i, tr, tr + 2, y1w, hp, wp, row_off=-1, col_off=-1)
    y1_ref[:] = jnp.where(mask, y1, 0.0).astype(cdt)
    y2 = _conv_rows(y1_ref, w2_ref, tr, wp)
    y2 = jnp.maximum(y2 * s2_ref[:] + t2_ref[:], 0.0)
    out_ref[:] = y2.astype(out_ref.dtype)


def fused_up_block(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    wt: jnp.ndarray,
    bt: jnp.ndarray,
    wa: jnp.ndarray,
    wb: jnp.ndarray,
    b1: jnp.ndarray,
    bn1: Tree,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    bn2: Tree,
    dtype=None,
) -> jnp.ndarray:
    """The packed Up block fused in VMEM (nn/packed.py::_packed_up).

    x1: coarse input (B,Hp,Wp,Cin1); x2: skip (B,Hp,Wp,Cskip);
    wt: (Cin1, Cup) lifted 1x1 packed tconv, bt its lifted bias;
    wa/wb: (3,3,Cskip,Cm)/(3,3,Cup,Cm) two-part lifted conv1;
    w2: (3,3,Cm,Cout).
    """
    cdt = dtype or x2.dtype
    b, hp, wp, cskip = x2.shape
    cin1 = x1.shape[3]
    cup, cm, cout = wt.shape[1], wa.shape[3], w2.shape[3]

    s1, t1 = _fold_affine(b1, bn1["scale"], bn1["shift"])
    s2, t2 = _fold_affine(b2, bn2["scale"], bn2["shift"])
    tt = bt.astype(jnp.float32).reshape(1, 1, -1)
    cskipp, cin1p = _cpad(cskip), _cpad(cin1)
    cupp, cmp_, coutp = _cpad(cup), _cpad(cm), _cpad(cout)
    wt = _pad_last(jnp.pad(wt, ((0, cin1p - cin1), (0, 0))), cupp)
    tt = _pad_last(tt, cupp)
    wa = _pad_last(jnp.pad(wa, ((0, 0), (0, 0), (0, cskipp - cskip), (0, 0))), cmp_)
    wb = _pad_last(jnp.pad(wb, ((0, 0), (0, 0), (0, cupp - cup), (0, 0))), cmp_)
    w2 = _pad_last(jnp.pad(w2, ((0, 0), (0, 0), (0, cmp_ - cm), (0, 0))), coutp)
    s1, t1 = _pad_last(s1, cmp_), _pad_last(t1, cmp_)
    s2, t2 = _pad_last(s2, coutp), _pad_last(t2, coutp)

    tr = min(TR, hp)
    hp_pad = _pad_rows(hp, tr)
    y1w = _pad_rows(wp + 2, 8)
    xw = y1w + 16
    x1p = jnp.pad(
        x1.astype(cdt),
        ((0, 0), (2, 2 + hp_pad - hp), (2, xw - wp - 2), (0, cin1p - cin1)),
    )
    x2p = jnp.pad(
        x2.astype(cdt),
        ((0, 0), (2, 2 + hp_pad - hp), (2, xw - wp - 2), (0, cskipp - cskip)),
    )
    wa9 = wa.reshape(9, cskipp, cmp_).astype(cdt)
    wb9 = wb.reshape(9, cupp, cmp_).astype(cdt)
    w29 = w2.reshape(9, cmp_, coutp).astype(cdt)
    wtc = wt.astype(cdt)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    import functools

    kernel = functools.partial(_up_block_kernel, tr, hp)

    def run(x2b, x1b):
        return pl.pallas_call(
            kernel,
            grid=(hp_pad // tr,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                full, full, full, full, full, full, full, full, full,
            ],
            out_specs=pl.BlockSpec(
                (tr, wp, coutp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((hp_pad, wp, coutp), cdt),
            scratch_shapes=[
                pltpu.VMEM((2, tr + 4, xw, cskipp), cdt),
                pltpu.VMEM((2, tr + 4, xw, cin1p), cdt),
                pltpu.VMEM((tr + 4, xw, cupp), cdt),
                pltpu.VMEM((tr + 2, y1w, cmp_), cdt),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=_interpret(),
        )(x2b, x1b, wtc, tt, wa9, wb9, s1, t1, w29, s2, t2)

    outs = [run(x2p[bb], x1p[bb]) for bb in range(b)]
    return jnp.stack(outs)[:, :hp, :, :cout]
