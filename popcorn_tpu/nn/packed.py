"""Space-to-depth packed execution engine for the POPCORN UNets.

Why this exists: the DDA UNet's 8/16-channel feature maps are a worst
case for TPU layouts — with channels minor, an 8-channel bf16 tensor is
padded to 128 lanes, so every conv moves ~16x the real bytes and uses
<7% of the VPU/MXU lanes. Measured on a v5e chip, one full-res
3x3/8->8 conv costs ~3.8 ms in the naive layout.

The packed engine runs the network in a space-to-depth layout instead:
a 4x4 spatial block's pixels are folded into the channel dimension, so
8 channels become 8*16 = 128 lanes exactly. The same conv then costs
~0.4 ms (~9x). Crucially, every UNet operation maps to packed space
*exactly* (identical arithmetic up to float summation order):

  * 3x3 stride-1 conv -> 3x3 packed conv whose kernel is "lifted" from
    the original weights by a static gather (each packed (in,out) channel
    pair corresponds to at most one original tap, zero-masked otherwise).
    The lift is differentiable, so training uses the packed path too.
  * 2x2 max-pool with pack factor f -> f/2: pure lane-group max on the
    SAME spatial grid — no spatial data movement at all.
  * 2x2 stride-2 transposed conv from pack f/2 -> f: a 1x1 packed conv
    (each packed output pixel depends on exactly one packed input pixel).
  * skip concat: handled by lifting the consumer conv's kernel in two
    parts (skip and upsampled inputs convolved separately and summed),
    so no channel permutation is ever materialised.
  * 1x1 convs / the POPCORN head: block-diagonal kron(I_{f^2}, W)
    matmuls (f^2 x FLOPs, still ~nothing next to the MXU headroom).

Pack factors per UNet level are (f, f/2, f/4 floored to 1) so all the
inter-level ops stay pure-lane; f is the largest of {4,2,1} dividing the
input's H and W. Odd shapes fall back to the plain layout (nn.unet).

Equivalence against the plain implementation is covered by
tests/test_packed.py (rtol ~1e-5 in f32).
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


# ---------------------------------------------------------------- layout ops


def choose_pack_factor(h: int, w: int) -> int:
    for f in (4, 2):
        if h % f == 0 and w % f == 0:
            return f
    return 1


def pack(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/f,W/f,f*f*C); lane order (dy, dx, c)."""
    if f == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def unpack(x: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    """Inverse of pack."""
    if f == 1:
        return x
    b, hp, wp, _ = x.shape
    x = x.reshape(b, hp, wp, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * f, wp * f, c)


def unpack_scalar(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Packed single-channel map (B,Hp,Wp,f*f) -> (B,H,W) 3-D.

    Critical for performance: a (B,H,W,1) 4-D array puts the size-1
    channel in the minor (lane) dimension and gets padded to 128 lanes —
    a 2048^2 float32 score would occupy ~2 GB of HBM. The 3-D form keeps
    W minor (no padding).
    """
    if f == 1:
        return x[..., 0]
    b, hp, wp, _ = x.shape
    x = x.reshape(b, hp, wp, f, f)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, hp * f, wp * f)


def unpack_np(x: np.ndarray, f: int, c: int) -> np.ndarray:
    """Host-side unpack (numpy), used after device->host transfers."""
    if f == 1:
        return x
    b, hp, wp, _ = x.shape
    x = x.reshape(b, hp, wp, f, f, c)
    return np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5)).reshape(
        b, hp * f, wp * f, c
    )


# ------------------------------------------------------------ kernel lifting


@functools.lru_cache(maxsize=None)
def _lift_indices(f: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static gather maps for lifting a 3x3 kernel to pack factor f.

    For packed output offset (oy,ox), packed input offset (iy,ix) and
    packed-kernel tap (dy,dx) in {-1,0,1}^2, the original tap is
      ky = dy*f + iy - oy + 1,  kx = dx*f + ix - ox + 1,
    valid iff both lie in [0,3). Returns (KY, KX, VALID) with shape
    (3, 3, f, f, f, f) ordered (dy, dx, iy, ix, oy, ox).
    """
    ky = np.zeros((3, 3, f, f, f, f), np.int32)
    kx = np.zeros_like(ky)
    valid = np.zeros(ky.shape, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            for iy in range(f):
                for ix in range(f):
                    for oy in range(f):
                        for ox in range(f):
                            a = dy * f + iy - oy + 1
                            b = dx * f + ix - ox + 1
                            ok = 0 <= a <= 2 and 0 <= b <= 2
                            ky[dy + 1, dx + 1, iy, ix, oy, ox] = min(max(a, 0), 2)
                            kx[dy + 1, dx + 1, iy, ix, oy, ox] = min(max(b, 0), 2)
                            valid[dy + 1, dx + 1, iy, ix, oy, ox] = ok
    return ky, kx, valid


def lift_conv3x3(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """Lift (3,3,Cin,Cout) to the packed kernel (3,3,f^2*Cin,f^2*Cout)."""
    if f == 1:
        return w
    cin, cout = w.shape[2], w.shape[3]
    ky, kx, valid = _lift_indices(f)
    # gather: (3,3,f,f,f,f,cin,cout), ordered (dy,dx,iy,ix,oy,ox,ci,co)
    wp = w[ky, kx] * jnp.asarray(valid, w.dtype)[..., None, None]
    # -> (dy,dx, iy,ix,ci, oy,ox,co)
    wp = wp.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return wp.reshape(3, 3, f * f * cin, f * f * cout)


def lift_vec(v: jnp.ndarray, f: int) -> jnp.ndarray:
    """Per-channel vector (bias / BN scale,shift) tiled to packed lanes."""
    return jnp.tile(v, f * f) if f > 1 else v


def kron_blockdiag(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """1x1-conv weight (Cin,Cout) -> block-diag (f^2*Cin, f^2*Cout)."""
    if f == 1:
        return w
    eye = jnp.eye(f * f, dtype=w.dtype)
    return jnp.kron(eye, w)


def lift_tconv(w: jnp.ndarray, f_out: int) -> jnp.ndarray:
    """Lift a 2x2/stride-2 tconv (Cin,2,2,Cout) from pack f_out/2 to f_out,
    as a 1x1 packed conv (f_in^2*Cin, f_out^2*Cout).

    Packed output offset (oy,ox) at factor f_out pulls from packed input
    offset (oy//2, ox//2) at factor f_in=f_out//2 with tconv tap
    (oy%2, ox%2).
    """
    f_in = f_out // 2
    cin, cout = w.shape[0], w.shape[3]
    out = jnp.zeros((f_in * f_in * cin, f_out * f_out * cout), w.dtype)
    for oy in range(f_out):
        for ox in range(f_out):
            iy, ix = oy // 2, ox // 2
            pin = iy * f_in + ix
            pout = oy * f_out + ox
            out = out.at[
                pin * cin : (pin + 1) * cin, pout * cout : (pout + 1) * cout
            ].set(w[:, oy % 2, ox % 2, :])
    return out


# ------------------------------------------------------------ packed ops


def conv_packed(x: jnp.ndarray, wp: jnp.ndarray, dtype=None) -> jnp.ndarray:
    if dtype is not None:
        x = x.astype(dtype)
        wp = wp.astype(dtype)
    return lax.conv_general_dilated(
        x,
        wp,
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # bf16 mode: output in bf16 (MXU accumulates f32 internally); the
        # AD transpose rule requires cotangent/operand dtypes to match, so
        # explicit f32 accumulation is only used in the f32 (parity) mode.
        preferred_element_type=None if dtype is not None else jnp.float32,
        precision=None if dtype is not None else lax.Precision.HIGHEST,
    )


def matmul_lanes(x: jnp.ndarray, m: jnp.ndarray, dtype=None) -> jnp.ndarray:
    if dtype is not None:
        x = x.astype(dtype)
        m = m.astype(dtype)
    return jnp.einsum(
        "bhwc,co->bhwo",
        x,
        m,
        # bf16 mode: output in bf16 (MXU accumulates f32 internally); the
        # AD transpose rule requires cotangent/operand dtypes to match, so
        # explicit f32 accumulation is only used in the f32 (parity) mode.
        preferred_element_type=None if dtype is not None else jnp.float32,
        precision=None if dtype is not None else lax.Precision.HIGHEST,
    )


def pool_packed(x: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    """2x2 max-pool, pack f -> f//2, SAME spatial grid: pure lane max.

    Input (B,Hp,Wp,f*f*c) at factor f over HxW; output
    (B,Hp,Wp,(f/2)^2*c) at factor f/2 over (H/2)x(W/2).
    """
    b, hp, wp, _ = x.shape
    g = f // 2
    x = x.reshape(b, hp, wp, g, 2, g, 2, c)
    x = jnp.max(x, axis=(4, 6))
    return x.reshape(b, hp, wp, g * g * c)


def packed_double_conv(
    p: Tree, bn: Tree, x: jnp.ndarray, f: int, dtype=None,
    use_pallas: bool = False, quantized: bool = False,
) -> jnp.ndarray:
    if use_pallas:
        from .pallas_conv import fused_double_conv

        return fused_double_conv(
            x,
            lift_conv3x3(p["conv1"]["w"], f), lift_vec(p["conv1"]["b"], f),
            {"scale": lift_vec(bn["bn1"]["scale"], f),
             "shift": lift_vec(bn["bn1"]["shift"], f)},
            lift_conv3x3(p["conv2"]["w"], f), lift_vec(p["conv2"]["b"], f),
            {"scale": lift_vec(bn["bn2"]["scale"], f),
             "shift": lift_vec(bn["bn2"]["shift"], f)},
            dtype=dtype, quantized=quantized,
        )
    y = conv_packed(x, lift_conv3x3(p["conv1"]["w"], f), dtype)
    y = y + lift_vec(p["conv1"]["b"], f).astype(y.dtype)
    y = jax.nn.relu(
        y * lift_vec(bn["bn1"]["scale"], f).astype(y.dtype)
        + lift_vec(bn["bn1"]["shift"], f).astype(y.dtype)
    )
    y = conv_packed(y, lift_conv3x3(p["conv2"]["w"], f), dtype)
    y = y + lift_vec(p["conv2"]["b"], f).astype(y.dtype)
    y = jax.nn.relu(
        y * lift_vec(bn["bn2"]["scale"], f).astype(y.dtype)
        + lift_vec(bn["bn2"]["shift"], f).astype(y.dtype)
    )
    return y


def _packed_up(
    p_up: Tree,
    bn_up: Tree,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    f: int,
    c_skip: int,
    dtype=None,
    use_pallas: bool = False,
    quantized: bool = False,
) -> jnp.ndarray:
    """Up block: tconv(x1, f/2 -> f) + two-part lifted DoubleConv over
    concat([x2, up]) without materialising the channel permutation."""
    if use_pallas:
        from .pallas_conv import fused_up_block

        w1 = p_up["conv"]["conv1"]["w"]
        return fused_up_block(
            x1, x2,
            lift_tconv(p_up["tconv"]["w"], f), lift_vec(p_up["tconv"]["b"], f),
            lift_conv3x3(w1[:, :, :c_skip], f), lift_conv3x3(w1[:, :, c_skip:], f),
            lift_vec(p_up["conv"]["conv1"]["b"], f),
            {"scale": lift_vec(bn_up["bn1"]["scale"], f),
             "shift": lift_vec(bn_up["bn1"]["shift"], f)},
            lift_conv3x3(p_up["conv"]["conv2"]["w"], f),
            lift_vec(p_up["conv"]["conv2"]["b"], f),
            {"scale": lift_vec(bn_up["bn2"]["scale"], f),
             "shift": lift_vec(bn_up["bn2"]["shift"], f)},
            dtype=dtype, quantized=quantized,
        )
    up = matmul_lanes(x1, lift_tconv(p_up["tconv"]["w"], f), dtype)
    up = up + lift_vec(p_up["tconv"]["b"], f).astype(up.dtype)
    w1 = p_up["conv"]["conv1"]["w"]  # (3,3, c_skip + c_up, cout)
    wa = lift_conv3x3(w1[:, :, :c_skip], f)
    wb = lift_conv3x3(w1[:, :, c_skip:], f)
    y = conv_packed(x2, wa, dtype) + conv_packed(up.astype(x2.dtype), wb, dtype)
    y = y + lift_vec(p_up["conv"]["conv1"]["b"], f).astype(y.dtype)
    y = jax.nn.relu(
        y * lift_vec(bn_up["bn1"]["scale"], f).astype(y.dtype)
        + lift_vec(bn_up["bn1"]["shift"], f).astype(y.dtype)
    )
    y = conv_packed(y, lift_conv3x3(p_up["conv"]["conv2"]["w"], f), dtype)
    y = y + lift_vec(p_up["conv"]["conv2"]["b"], f).astype(y.dtype)
    y = jax.nn.relu(
        y * lift_vec(bn_up["bn2"]["scale"], f).astype(y.dtype)
        + lift_vec(bn_up["bn2"]["shift"], f).astype(y.dtype)
    )
    return y


def packed_unet_stream(
    p: Tree,
    bn: Tree,
    x: jnp.ndarray,
    f0: int,
    *,
    encoder_stop_grad: bool = False,
    dtype=None,
    t0: int = 8,
    t1: int = 16,
    use_pallas: bool = False,
    quantized: bool = False,
) -> jnp.ndarray:
    """One UNet stream fully in packed space. Input x is already packed at
    f0; returns 8ch features packed at f0. Requires f0 in {2,4}.

    Level pack factors: L0=f0, L1=f0/2, L2=f0/4 (>=1). When f0=2, L1 runs
    at f=1 (plain layout on the half-res grid) and L2 likewise.

    use_pallas: run every DoubleConv/Up block as a fused VMEM kernel
    (nn/pallas_conv.py) — inference path only (no autodiff).
    """
    f1 = max(f0 // 2, 1)
    f2 = max(f0 // 4, 1)
    pk = use_pallas and not encoder_stop_grad
    q = quantized and pk

    x1 = packed_double_conv(p["inc"], bn["inc"], x, f0, dtype, use_pallas=pk,
                            quantized=q)
    d1_in = pool_packed(x1, f0, t0)  # L1 at f1 (grid Hp when f0=4)
    if f0 == 2:
        # pool_packed produced f=1 on the L0 grid == plain half-res. ok.
        pass
    d1 = packed_double_conv(p["down1"], bn["down1"], d1_in, f1, dtype,
                            use_pallas=pk, quantized=q)
    if f1 >= 2:
        d2_in = pool_packed(d1, f1, t1)
    else:
        from .ops import max_pool_2x2

        d2_in = max_pool_2x2(d1)
    d2 = packed_double_conv(p["down2"], bn["down2"], d2_in, f2, dtype,
                            use_pallas=pk, quantized=q)

    if encoder_stop_grad:
        x1 = lax.stop_gradient(x1)
        d1 = lax.stop_gradient(d1)
        d2 = lax.stop_gradient(d2)

    if f1 >= 2:
        u2 = _packed_up(p["up2"], bn["up2"], d2, d1, f1, c_skip=t1, dtype=dtype,
                        use_pallas=pk, quantized=q)
    else:
        # f2==f1==1: plain tconv via packed 1x1 with f_out=2 then unpack? No:
        # f1==1 means L1 is plain; use the plain up block from nn.unet.
        from .unet import _up_block

        u2 = _up_block(p["up2"], bn["up2"], d2, d1, dtype)
    u1 = _packed_up(p["up1"], bn["up1"], u2, x1, f0, c_skip=t0, dtype=dtype,
                    use_pallas=pk, quantized=q)
    return u1  # packed f0, 8ch


def calibrate_packed_stream(
    p: Tree,
    bn: Tree,
    x: jnp.ndarray,
    f0: int,
    *,
    t0: int = 8,
    t1: int = 16,
    margin: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Per-block activation scales for the STATIC int8 path ('int8s').

    Mirrors packed_unet_stream in plain f32 XLA and records amax/127 for
    every quantized tensor: the stream input, each DoubleConv's mid (y1)
    and output, each Up block's tconv output and mid. Runs ONCE per
    member on a calibration patch (infer/sliding.py); the scalars then
    fold into the pallas kernels' e/g vectors (pallas_conv.py::
    fused_double_conv_qs). ``margin`` > 1 trades clipping for step size.
    """
    f1, f2 = f0 // 2, max(f0 // 4, 1)
    sc: Dict[str, jnp.ndarray] = {}

    def amax(v, k):
        sc[k] = jnp.maximum(jnp.max(jnp.abs(v.astype(jnp.float32))), 1e-6) \
            / 127.0 * margin

    def aff(y, b, s, t, f):
        y = y + lift_vec(b, f).astype(y.dtype)
        return jax.nn.relu(
            y * lift_vec(s, f).astype(y.dtype) + lift_vec(t, f).astype(y.dtype)
        )

    def dc(pp, bb, xx, f, k):
        y1 = aff(
            conv_packed(xx, lift_conv3x3(pp["conv1"]["w"], f)),
            pp["conv1"]["b"], bb["bn1"]["scale"], bb["bn1"]["shift"], f,
        )
        amax(y1, f"{k}_y1")
        y2 = aff(
            conv_packed(y1, lift_conv3x3(pp["conv2"]["w"], f)),
            pp["conv2"]["b"], bb["bn2"]["scale"], bb["bn2"]["shift"], f,
        )
        amax(y2, f"{k}_out")
        return y2

    def up(pu, bu, x1_, x2_, f, c_skip, k, last):
        u = matmul_lanes(x1_, lift_tconv(pu["tconv"]["w"], f))
        u = u + lift_vec(pu["tconv"]["b"], f).astype(u.dtype)
        amax(u, f"{k}_up")
        w1 = pu["conv"]["conv1"]["w"]
        y1 = aff(
            conv_packed(x2_, lift_conv3x3(w1[:, :, :c_skip], f))
            + conv_packed(u, lift_conv3x3(w1[:, :, c_skip:], f)),
            pu["conv"]["conv1"]["b"],
            bu["bn1"]["scale"], bu["bn1"]["shift"], f,
        )
        amax(y1, f"{k}_y1")
        y2 = aff(
            conv_packed(y1, lift_conv3x3(pu["conv"]["conv2"]["w"], f)),
            pu["conv"]["conv2"]["b"],
            bu["bn2"]["scale"], bu["bn2"]["shift"], f,
        )
        if not last:
            amax(y2, f"{k}_out")
        return y2

    x = x.astype(jnp.float32)
    amax(x, "in")
    x1 = dc(p["inc"], bn["inc"], x, f0, "inc")
    d1 = dc(p["down1"], bn["down1"], pool_packed(x1, f0, t0), f1, "down1")
    d2 = dc(p["down2"], bn["down2"], pool_packed(d1, f1, t1), f2, "down2")
    u2 = up(p["up2"], bn["up2"], d2, d1, f1, t1, "up2", last=False)
    up(p["up1"], bn["up1"], u2, x1, f0, t0, "up1", last=True)
    return sc


def packed_unet_stream_qs(
    p: Tree,
    bn: Tree,
    x: jnp.ndarray,
    f0: int,
    scales: Dict[str, jnp.ndarray],
    *,
    t0: int = 8,
    t1: int = 16,
    dtype=None,
    wbits: int = 8,
) -> jnp.ndarray:
    """One UNet stream END-TO-END in static int8 (inference only).

    Every block is a fused pallas kernel with int8 HBM I/O (half the
    inter-block DMA bytes of the dynamic path), int8 MXU dots, and one
    fused dequant+affine+relu+requant VPU pass per layer. Max-pooling
    commutes with quantization (max of int8 codes = code of max), so the
    XLA glue between blocks never dequantizes; only the final up1 block
    emits float features for the head. Requires f0 == 4 (the production
    2048/4096-patch layout)."""
    assert f0 == 4, "static int8 stream requires pack factor 4"
    from .pallas_conv import fused_double_conv_qs, fused_up_block_qs, quantize_static

    f1, f2 = f0 // 2, max(f0 // 4, 1)
    s = scales
    xq = quantize_static(x, s["in"])

    def dc_args(pp, bb, f):
        return (
            lift_conv3x3(pp["conv1"]["w"], f), lift_vec(pp["conv1"]["b"], f),
            {"scale": lift_vec(bb["bn1"]["scale"], f),
             "shift": lift_vec(bb["bn1"]["shift"], f)},
            lift_conv3x3(pp["conv2"]["w"], f), lift_vec(pp["conv2"]["b"], f),
            {"scale": lift_vec(bb["bn2"]["scale"], f),
             "shift": lift_vec(bb["bn2"]["shift"], f)},
        )

    x1 = fused_double_conv_qs(
        xq, *dc_args(p["inc"], bn["inc"], f0),
        s_x=s["in"], s_y1=s["inc_y1"], s_out=s["inc_out"], dtype=dtype,
        wbits=wbits,
    )
    d1 = fused_double_conv_qs(
        pool_packed(x1, f0, t0), *dc_args(p["down1"], bn["down1"], f1),
        s_x=s["inc_out"], s_y1=s["down1_y1"], s_out=s["down1_out"],
        dtype=dtype, wbits=wbits,
    )
    d2 = fused_double_conv_qs(
        pool_packed(d1, f1, t1), *dc_args(p["down2"], bn["down2"], f2),
        s_x=s["down1_out"], s_y1=s["down2_y1"], s_out=s["down2_out"],
        dtype=dtype, wbits=wbits,
    )

    def up_args(pu, bu, f, c_skip):
        w1 = pu["conv"]["conv1"]["w"]
        return (
            lift_tconv(pu["tconv"]["w"], f), lift_vec(pu["tconv"]["b"], f),
            lift_conv3x3(w1[:, :, :c_skip], f), lift_conv3x3(w1[:, :, c_skip:], f),
            lift_vec(pu["conv"]["conv1"]["b"], f),
            {"scale": lift_vec(bu["bn1"]["scale"], f),
             "shift": lift_vec(bu["bn1"]["shift"], f)},
            lift_conv3x3(pu["conv"]["conv2"]["w"], f),
            lift_vec(pu["conv"]["conv2"]["b"], f),
            {"scale": lift_vec(bu["bn2"]["scale"], f),
             "shift": lift_vec(bu["bn2"]["shift"], f)},
        )

    u2 = fused_up_block_qs(
        d2, d1, *up_args(p["up2"], bn["up2"], f1, t1),
        s_x1=s["down2_out"], s_x2=s["down1_out"],
        s_up=s["up2_up"], s_y1=s["up2_y1"], s_out=s["up2_out"], dtype=dtype,
        wbits=wbits,
    )
    u1 = fused_up_block_qs(
        u2, x1, *up_args(p["up1"], bn["up1"], f0, t0),
        s_x1=s["up2_out"], s_x2=s["inc_out"],
        s_up=s["up1_up"], s_y1=s["up1_y1"], s_out=None, dtype=dtype,
        wbits=wbits,
    )
    return u1  # float features, packed f0, 8ch


def packed_dual_stream_features(
    p: Tree,
    bn: Tree,
    x6: jnp.ndarray,
    f: int,
    *,
    s1: bool = True,
    s2: bool = True,
    encoder_stop_grad: bool = False,
    dtype=None,
    use_pallas: bool = False,
    quantized: bool = False,
) -> jnp.ndarray:
    """Fused 16ch features, packed at f. x6 is the UNPACKED 6ch DDA input.

    Output lane layout: [sar packed (f^2*8) | opt packed (f^2*8)] — i.e.
    the two streams are concatenated at the packed level (NOT interleaved
    per-pixel); downstream consumers handle the two parts separately.
    """
    feats = []
    if s1:
        feats.append(
            packed_unet_stream(
                p["sar"], bn["sar"], pack(x6[..., :SAR_IN], f), f,
                encoder_stop_grad=encoder_stop_grad, dtype=dtype,
                use_pallas=use_pallas, quantized=quantized,
            )
        )
    if s2:
        feats.append(
            packed_unet_stream(
                p["opt"], bn["opt"], pack(x6[..., SAR_IN:], f), f,
                encoder_stop_grad=encoder_stop_grad, dtype=dtype,
                use_pallas=use_pallas, quantized=quantized,
            )
        )
    return jnp.concatenate(feats, axis=-1)


def packed_building_logits(
    p: Tree,
    bn: Tree,
    x6: jnp.ndarray,
    f: int,
    *,
    s1: bool = True,
    s2: bool = True,
    dtype=None,
    use_pallas: bool = False,
    quantized: bool = False,
) -> jnp.ndarray:
    """Built-up logits, packed at f (1 unpacked channel -> f^2 lanes)."""
    if s1 and s2:
        feats = packed_dual_stream_features(
            p, bn, x6, f, s1=True, s2=True, dtype=dtype, use_pallas=use_pallas,
            quantized=quantized,
        )
        w = p["fusion_out"]["w"]  # (16, 1)
        c = feats.shape[-1] // 2
        ya = matmul_lanes(feats[..., :c], kron_blockdiag(w[:8], f), dtype)
        yb = matmul_lanes(feats[..., c:], kron_blockdiag(w[8:], f), dtype)
        return ya + yb + lift_vec(p["fusion_out"]["b"], f).astype(ya.dtype)
    if s1:
        feats = packed_unet_stream(
            p["sar"], bn["sar"], pack(x6[..., :SAR_IN], f), f, dtype=dtype,
            use_pallas=use_pallas, quantized=quantized,
        )
        y = matmul_lanes(feats, kron_blockdiag(p["sar_out"]["w"], f), dtype)
        return y + lift_vec(p["sar_out"]["b"], f).astype(y.dtype)
    feats = packed_unet_stream(
        p["opt"], bn["opt"], pack(x6[..., SAR_IN:], f), f, dtype=dtype,
        use_pallas=use_pallas, quantized=quantized,
    )
    y = matmul_lanes(feats, kron_blockdiag(p["opt_out"]["w"], f), dtype)
    return y + lift_vec(p["opt_out"]["b"], f).astype(y.dtype)


def packed_head_apply(
    head: Tree, feats_packed: jnp.ndarray, f: int, dtype=None, two_stream: bool = True
) -> jnp.ndarray:
    """The POPCORN head on packed features -> packed channel-0 output.

    feats_packed: [sar f^2*8 | opt f^2*8] (two_stream) or f^2*16.
    Only head output channel 0 is ever consumed by the model
    (popcorn.py:162-164), so the final matmul uses W4[:, :1].
    Returns (B,Hp,Wp,f^2) — the packed (H,W) scalar map.
    """
    w1 = head["l1"]["w"]  # (16, 64)
    if two_stream and f > 1:
        c = feats_packed.shape[-1] // 2
        h = matmul_lanes(feats_packed[..., :c], kron_blockdiag(w1[:8], f), dtype)
        h = h + matmul_lanes(feats_packed[..., c:], kron_blockdiag(w1[8:], f), dtype)
    else:
        h = matmul_lanes(feats_packed, kron_blockdiag(w1, f), dtype)
    h = jax.nn.relu(h + lift_vec(head["l1"]["b"], f).astype(h.dtype))
    h = matmul_lanes(h, kron_blockdiag(head["l2"]["w"], f), dtype)
    h = jax.nn.relu(h + lift_vec(head["l2"]["b"], f).astype(h.dtype))
    h = matmul_lanes(h, kron_blockdiag(head["l3"]["w"], f), dtype)
    h = jax.nn.relu(h + lift_vec(head["l3"]["b"], f).astype(h.dtype))
    out = matmul_lanes(h, kron_blockdiag(head["l4"]["w"][:, :1], f), dtype)
    return out + lift_vec(head["l4"]["b"][:1], f).astype(out.dtype)
