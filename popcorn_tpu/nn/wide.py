"""Wide-lane (W-only packed) execution engine for the POPCORN UNets.

Round-4 answer to the space-to-depth engine's 16x lane-fill FLOP blowup
(nn/packed.py, PERF_NOTES.md): instead of folding a 4x4 *spatial block*
into lanes (which forces every 3x3 conv through a 1/16-dense lifted
kernel the MXU cannot skip), fold ``fw`` *columns* into lanes with lane
order (column j, channel c):

    (B, H, W, C)  ->  (B, H, W/fw, fw*C)        # a pure reshape!

Because (j, c) lane order is exactly the row-major flattening of (W, C),
EVERY layout change in this engine — packing, unpacking, re-choosing fw
between UNet levels, merging/splitting blocks, extracting the scalar
output map — is a contiguous reshape: zero data movement, in contrast to
the space-to-depth engine's transposes (measured ~13 ms of stream prep +
~10 ms of fold epilogue per 2048^2 patch).

A 3x3 stride-1 conv then decomposes into
  * a BANDED dense conv, kernel (3, 1, fw*Cin, fw*Cout), spatial window 3
    over H only: the three in-block column taps (s = -1, 0, +1) ride the
    contraction dimension as a band, so at Cin=8/fw=16 the conv costs
    ceil(3*128/128) = 3 MXU pass-sets instead of the lifted kernel's 9 —
    and the band's zeros are *layout padding at the block edge only*
    (2/fw of the matrix), not a 15/16-sparse mask;
  * a tiny EDGE conv, kernel (3, 1, 2*Cin, fw*Cout), consuming the two
    cross-block-boundary columns (last column of the left neighbour,
    first of the right) — 1 pass-set.

Per-conv executed MXU work drops ~9/4 = 2.25x vs the lifted formulation;
the 1x1-conv head drops further (see wide_head_apply: the (j, c) layout
re-packs for free to fw=2 where the 64-channel layers are dense 128x128
matmuls — ~4x fewer passes than the f=16 block-diagonal kron form).

Exactness: identical arithmetic to nn.unet up to float summation order
(tests/test_wide.py pins rtol ~1e-5 in f32 against the plain stream).
Everything is standard XLA (convs, matmuls, reshapes) — differentiable,
shardable, no custom calls.

MEASURED OUTCOME on v5e (round 4, PERF_NOTES): despite the ~2.7x lower
executed-FLOP count, the member fold runs 0.857x the packed engine
(5.67 vs 6.62 ensemble-patches/s at 2048^2 bf16) — the band's K=384
contractions achieve ~21 TFLOP/s where the packed lift's K=1152 convs
achieve ~51, so the lift's extra FLOPs are effectively free on the MXU.
The wide engine is therefore NOT the default patch engine; it is the
engine for layout="spatial" (row-sharded whole frames, where the s2d
pack would reshape the sharded axis and plain NHWC measured ~5x slower
and 16x more activation HBM per conv), and available via layout="wide".

Divisibility: requires H % 4 == 0 and W % 32 == 0 (the packed engine's
f=4 constraint is the same; callers fall back to nn.packed / nn.unet
otherwise, see choose_wide).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .unet import SAR_IN

Tree = Dict[str, Any]

FW0 = 16  # L0 pack factor: 16 columns x 8ch = 128 lanes


def choose_wide(h: int, w: int) -> bool:
    """True when the wide-lane engine's divisibility constraints hold."""
    return h % 4 == 0 and w % 32 == 0


def wpack(x: jnp.ndarray, fw: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W/fw,fw*C). Lane order (j, c) — a pure reshape."""
    if fw == 1:
        return x
    b, h, w, c = x.shape
    return x.reshape(b, h, w // fw, fw * c)


def wunpack(x: jnp.ndarray, fw: int, c: int) -> jnp.ndarray:
    if fw == 1:
        return x
    b, h, wb, _ = x.shape
    return x.reshape(b, h, wb * fw, c)


# ------------------------------------------------------------- weight lifts


@functools.lru_cache(maxsize=None)
def _band_eyes(fw: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Selection matrices E_s (fw, fw) with E_s[j', j] = 1 iff the in-block
    input column j' feeds output column j through tap s (in = out + s - 1),
    i.e. j - j' == 1 - s."""
    return tuple(np.eye(fw, k=1 - s, dtype=np.float32) for s in range(3))


def lift_band(w: jnp.ndarray, fw: int) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> banded (3, 1, fw*Cin, fw*Cout).

    out[(j,co)] of H-tap r accumulates w[r, s, ci, co] * in[(j+s-1, ci)]
    for the in-block taps; the band is kron(E_s, w[r, s]) summed over s.
    """
    es = _band_eyes(fw)
    taps = []
    for r in range(3):
        m = sum(
            jnp.kron(jnp.asarray(es[s], w.dtype), w[r, s]) for s in range(3)
        )
        taps.append(m)
    return jnp.stack(taps)[:, None]  # (3, 1, fw*Cin, fw*Cout)


def lift_edge(w: jnp.ndarray, fw: int) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> edge kernel (3, 1, 2*Cin, fw*Cout).

    Input lane group 0 = the left neighbour block's LAST column (feeds
    out j=0 via tap s=0); group 1 = the right neighbour's FIRST column
    (feeds out j=fw-1 via tap s=2).
    """
    cin, cout = w.shape[2], w.shape[3]
    taps = []
    for r in range(3):
        m = jnp.zeros((2 * cin, fw * cout), w.dtype)
        m = m.at[:cin, :cout].set(w[r, 0])
        m = m.at[cin:, (fw - 1) * cout :].set(w[r, 2])
        taps.append(m)
    return jnp.stack(taps)[:, None]


def lift_vec_w(v: jnp.ndarray, fw: int) -> jnp.ndarray:
    """Per-channel vector tiled over the fw column groups."""
    return jnp.tile(v, fw) if fw > 1 else v


@functools.lru_cache(maxsize=None)
def _tconv_sel(fwi: int) -> Tuple[np.ndarray, np.ndarray]:
    """P_dj (fwi, 2*fwi) with P[j', 2j'+dj] = 1, for dj in {0, 1}."""
    sel = []
    for dj in range(2):
        p = np.zeros((fwi, 2 * fwi), np.float32)
        p[np.arange(fwi), 2 * np.arange(fwi) + dj] = 1.0
        sel.append(p)
    return tuple(sel)


def lift_tconv_w(w: jnp.ndarray, fwi: int, dy: int) -> jnp.ndarray:
    """2x2/stride-2 tconv weight (Cin,2,2,Cout) -> lane matmul for output
    row parity dy: (fwi*Cin, 2*fwi*Cout). Output column 2j'+dj comes from
    input column j' with tap (dy, dj)."""
    p0, p1 = _tconv_sel(fwi)
    return jnp.kron(jnp.asarray(p0, w.dtype), w[:, dy, 0]) + jnp.kron(
        jnp.asarray(p1, w.dtype), w[:, dy, 1]
    )


# ------------------------------------------------------------- core ops


def _conv_h3(x: jnp.ndarray, k: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Conv with spatial window (3,1) over (H, Wb), SAME in H."""
    if dtype is not None:
        x = x.astype(dtype)
        k = k.astype(dtype)
    return lax.conv_general_dilated(
        x,
        k,
        (1, 1),
        ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=None if dtype is not None else jnp.float32,
        precision=None if dtype is not None else lax.Precision.HIGHEST,
    )


def edge_tensor(x: jnp.ndarray, cin: int) -> jnp.ndarray:
    """(B,H,Wb,fw*Cin) -> (B,H,Wb,2*Cin): per block, the left neighbour's
    last column and the right neighbour's first column (zero at borders —
    the conv's SAME zero padding in W)."""
    prev_last = jnp.pad(x[:, :, :-1, -cin:], ((0, 0), (0, 0), (1, 0), (0, 0)))
    next_first = jnp.pad(x[:, :, 1:, :cin], ((0, 0), (0, 0), (0, 1), (0, 0)))
    return jnp.concatenate([prev_last, next_first], axis=-1)


def wconv3x3(
    x: jnp.ndarray, w: jnp.ndarray, fw: int, dtype=None
) -> jnp.ndarray:
    """3x3 SAME conv in wide-lane space: banded main + edge conv."""
    cin = w.shape[2]
    y = _conv_h3(x, lift_band(w, fw), dtype)
    e = edge_tensor(x, cin)
    return y + _conv_h3(e, lift_edge(w, fw), dtype)


def wpool(x: jnp.ndarray, fw: int, c: int) -> jnp.ndarray:
    """2x2 max-pool: rows by split-reshape max, columns by lane-pair max.
    (B,H,Wb,fw*C) -> (B,H/2,Wb,(fw/2)*C); fw halves, Wb unchanged.

    The row pool is a reshape-split of H (not a strided slice) so XLA's
    SPMD partitioner keeps a row-sharded H axis local (spatial
    partitioning, infer/spatial.py) — per-shard rows stay even because
    spatial callers pad rows to multiples of 4 * n_shards."""
    b, h, wb, _ = x.shape
    x = x.reshape(b, h // 2, 2, wb, fw // 2, 2, c)
    return jnp.max(x, axis=(2, 5)).reshape(b, h // 2, wb, (fw // 2) * c)


def wtconv(
    x: jnp.ndarray, p: Tree, fwi: int, fw_out: int, dtype=None
) -> jnp.ndarray:
    """2x2/stride-2 transposed conv: two lane matmuls (output row parity)
    + free block split + row interleave.

    Input (B,Hi,Wbi,fwi*Cin) -> output (B,2*Hi, Wbi*2*fwi/fw_out, fw_out*Cout).
    """
    w, bias = p["w"], p["b"]
    cout = w.shape[3]
    rows = []
    for dy in range(2):
        t = lift_tconv_w(w, fwi, dy)
        if dtype is not None:
            xx, t = x.astype(dtype), t.astype(dtype)
        else:
            xx, t = x, t
        y = jnp.einsum(
            "bhwc,co->bhwo",
            xx,
            t,
            preferred_element_type=None if dtype is not None else jnp.float32,
            precision=None if dtype is not None else lax.Precision.HIGHEST,
        )
        rows.append(y + lift_vec_w(bias, 2 * fwi).astype(y.dtype))
    b, hi, wbi, _ = rows[0].shape
    y = jnp.stack(rows, axis=2).reshape(b, 2 * hi, wbi, 2 * fwi * cout)
    # split blocks to the caller's fw_out (pure reshape: j-major lanes)
    ratio = (2 * fwi) // fw_out
    return y.reshape(b, 2 * hi, wbi * ratio, fw_out * cout)


def _affine_relu(y, b, scale, shift, fw):
    y = y + lift_vec_w(b, fw).astype(y.dtype)
    return jax.nn.relu(
        y * lift_vec_w(scale, fw).astype(y.dtype)
        + lift_vec_w(shift, fw).astype(y.dtype)
    )


def wdouble_conv(p: Tree, bn: Tree, x: jnp.ndarray, fw: int, dtype=None):
    y = wconv3x3(x, p["conv1"]["w"], fw, dtype)
    y = _affine_relu(y, p["conv1"]["b"], bn["bn1"]["scale"], bn["bn1"]["shift"], fw)
    y = wconv3x3(y, p["conv2"]["w"], fw, dtype)
    return _affine_relu(y, p["conv2"]["b"], bn["bn2"]["scale"], bn["bn2"]["shift"], fw)


def _wup(
    p_up: Tree,
    bn_up: Tree,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    fwi: int,
    fw: int,
    c_skip: int,
    dtype=None,
) -> jnp.ndarray:
    """Up block: tconv(x1) to the skip level + two-part DoubleConv over
    concat([x2, up]) (the split conv avoids materialising the concat)."""
    up = wtconv(x1, p_up["tconv"], fwi, fw, dtype)
    w1 = p_up["conv"]["conv1"]["w"]  # (3, 3, c_skip + c_up, cout)
    y = wconv3x3(x2, w1[:, :, :c_skip], fw, dtype) + wconv3x3(
        up.astype(x2.dtype), w1[:, :, c_skip:], fw, dtype
    )
    y = _affine_relu(
        y, p_up["conv"]["conv1"]["b"],
        bn_up["bn1"]["scale"], bn_up["bn1"]["shift"], fw,
    )
    y = wconv3x3(y, p_up["conv"]["conv2"]["w"], fw, dtype)
    return _affine_relu(
        y, p_up["conv"]["conv2"]["b"],
        bn_up["bn2"]["scale"], bn_up["bn2"]["shift"], fw,
    )


def wide_unet_stream(
    p: Tree,
    bn: Tree,
    x: jnp.ndarray,
    *,
    encoder_stop_grad: bool = False,
    dtype=None,
    t0: int = 8,
    t1: int = 16,
) -> jnp.ndarray:
    """One UNet stream in wide-lane space.

    x: wide-packed input at FW0 (B, H, W/16, 16*Cin). Returns t0-channel
    features at FW0: (B, H, W/16, 16*t0) = 128 lanes for t0=8.

    Level factors: L0 fw=16 (Wb=W/16), L1 fw=8 (Wb=W/16, half rows),
    L2 fw=8 after a free block merge (Wb=W/32, quarter rows) — every
    conv's lane count is 64..128, never the 16x-padded plain layout.
    """
    f0, f1, f2 = FW0, FW0 // 2, FW0 // 2

    x1 = wdouble_conv(p["inc"], bn["inc"], x, f0, dtype)  # (H, W/16, 16*t0)
    d1_in = wpool(x1, f0, t0)  # (H/2, W/16, 8*t0)
    d1 = wdouble_conv(p["down1"], bn["down1"], d1_in, f1, dtype)  # 8*t1 lanes
    d2_in = wpool(d1, f1, t1)  # (H/4, W/16, 4*t1)
    b, h4, wb, _ = d2_in.shape
    d2_in = d2_in.reshape(b, h4, wb // 2, 2 * (f1 // 2) * t1)  # merge -> fw=8
    d2 = wdouble_conv(p["down2"], bn["down2"], d2_in, f2, dtype)

    if encoder_stop_grad:
        x1 = lax.stop_gradient(x1)
        d1 = lax.stop_gradient(d1)
        d2 = lax.stop_gradient(d2)

    u2 = _wup(p["up2"], bn["up2"], d2, d1, f2, f1, c_skip=t1, dtype=dtype)
    u1 = _wup(p["up1"], bn["up1"], u2, x1, f1, f0, c_skip=t0, dtype=dtype)
    return u1  # (B, H, W/16, 16*t0)


def prepare_wide_streams(x6: jnp.ndarray):
    """Wide-pack the DDA input's two streams (free reshapes).

    x6: (B,H,W,6) DDA-ordered [VV,VH,B,G,R,NIR]. Returns (sar, opt) at FW0.
    """
    return wpack(x6[..., :SAR_IN], FW0), wpack(x6[..., SAR_IN:], FW0)


def wide_dual_stream_features(
    p: Tree,
    bn: Tree,
    x6: jnp.ndarray,
    *,
    s1: bool = True,
    s2: bool = True,
    encoder_stop_grad: bool = False,
    dtype=None,
):
    """Active-stream features at FW0, returned SEPARATELY (not lane-
    interleaved — consumers take two-part matmuls, as nn.packed does)."""
    sar_f = opt_f = None
    if s1:
        sar_f = wide_unet_stream(
            p["sar"], bn["sar"], wpack(x6[..., :SAR_IN], FW0),
            encoder_stop_grad=encoder_stop_grad, dtype=dtype,
        )
    if s2:
        opt_f = wide_unet_stream(
            p["opt"], bn["opt"], wpack(x6[..., SAR_IN:], FW0),
            encoder_stop_grad=encoder_stop_grad, dtype=dtype,
        )
    return sar_f, opt_f


def scalar_matmul(h: jnp.ndarray, w: jnp.ndarray, fw: int, dtype=None):
    """Per-pixel linear map to ONE output channel, emitted as a dense 3-D
    (B, H, W) map — never materialising a lane-padded (…, small) tensor.

    h: (B, H, Wb, fw*C); w: (C, 1) or (C,). Re-packs (free reshape) to
    fw' = min(128, W) so the output block is a full 128-lane vector of
    pure column values, then one block-diagonal kron matmul.
    """
    b, hh, wb, lanes = h.shape
    c = lanes // fw
    wtot = wb * fw
    fwp = 128
    while wtot % fwp:  # largest power-of-two block width <= 128 dividing W
        fwp //= 2
    hp = h.reshape(b, hh, wtot // fwp, fwp * c)
    ww = w.reshape(c, 1)
    m = jnp.kron(jnp.eye(fwp, dtype=ww.dtype), ww)  # (fwp*C, fwp)
    if dtype is not None:
        hp, m = hp.astype(dtype), m.astype(dtype)
    y = jnp.einsum(
        "bhwc,co->bhwo",
        hp,
        m,
        preferred_element_type=None if dtype is not None else jnp.float32,
        precision=None if dtype is not None else lax.Precision.HIGHEST,
    )
    return y.reshape(b, hh, wtot)  # (B, H, W)


def wide_building_logits(
    p: Tree,
    bn: Tree,
    x6: jnp.ndarray,
    *,
    s1: bool = True,
    s2: bool = True,
    dtype=None,
) -> jnp.ndarray:
    """Built-up logits as a dense 3-D (B, H, W) map (networks.py:213-237)."""
    sar_f, opt_f = wide_dual_stream_features(p, bn, x6, s1=s1, s2=s2, dtype=dtype)
    if s1 and s2:
        w = p["fusion_out"]["w"]  # (16, 1)
        y = scalar_matmul(sar_f, w[:8], FW0, dtype) + scalar_matmul(
            opt_f, w[8:], FW0, dtype
        )
        return y + p["fusion_out"]["b"][0].astype(y.dtype)
    if s1:
        y = scalar_matmul(sar_f, p["sar_out"]["w"], FW0, dtype)
        return y + p["sar_out"]["b"][0].astype(y.dtype)
    y = scalar_matmul(opt_f, p["opt_out"]["w"], FW0, dtype)
    return y + p["opt_out"]["b"][0].astype(y.dtype)


def _kron2(w: jnp.ndarray) -> jnp.ndarray:
    return jnp.kron(jnp.eye(2, dtype=w.dtype), w)


def _mm(x, m, dtype):
    if dtype is not None:
        x, m = x.astype(dtype), m.astype(dtype)
    return jnp.einsum(
        "bhwc,co->bhwo",
        x,
        m,
        preferred_element_type=None if dtype is not None else jnp.float32,
        precision=None if dtype is not None else lax.Precision.HIGHEST,
    )


def wide_head_apply(
    head: Tree,
    sar_f: jnp.ndarray,
    opt_f: jnp.ndarray,
    dtype=None,
) -> jnp.ndarray:
    """The POPCORN 1x1-conv head (16->64->64->64->2) on wide-lane features,
    returning channel 0 as a dense (B, H, W) map.

    The features re-pack (free reshape) from fw=16 to fw=2, where the
    64-channel hidden layers are dense (128,128) matmuls — ~4x fewer MXU
    passes than the f=16 block-diagonal form (nn/packed.py::
    packed_head_apply), because only 2 column copies of each weight ride
    the lanes instead of 16.
    """
    w1 = head["l1"]["w"]  # (16, 64)

    def to2(f):
        b, hh, wb, _ = f.shape  # (B,H,W/16,128) -> (B,H,W/2,16)
        return f.reshape(b, hh, wb * 8, 16)

    if sar_f is not None and opt_f is not None:
        h = _mm(to2(sar_f), _kron2(w1[:8]), dtype) + _mm(
            to2(opt_f), _kron2(w1[8:]), dtype
        )
    else:
        f = sar_f if sar_f is not None else opt_f
        h = _mm(to2(f), _kron2(w1), dtype)
    h = jax.nn.relu(h + lift_vec_w(head["l1"]["b"], 2).astype(h.dtype))
    h = _mm(h, _kron2(head["l2"]["w"]), dtype)
    h = jax.nn.relu(h + lift_vec_w(head["l2"]["b"], 2).astype(h.dtype))
    h = _mm(h, _kron2(head["l3"]["w"]), dtype)
    h = jax.nn.relu(h + lift_vec_w(head["l3"]["b"], 2).astype(h.dtype))
    out = scalar_matmul(h, head["l4"]["w"][:, :1], 2, dtype)
    return out + head["l4"]["b"][0].astype(out.dtype)
