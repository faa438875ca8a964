"""The POPCORN population-mapping model, TPU-native.

Re-implements the behaviour of the reference's POPCORN module
(model/popcorn.py:13-377) as pure functions:

  popdensemap = scale * building_score        (occupancy model, :167-178)
  popcount    = sum over the admin region     (:183-190)

with a frozen dual-stream UNet feature extractor, a second frozen
dual-stream UNet as on-the-fly building extractor (:279-322), and a
trainable 4-layer 1x1-conv head (16->64->64->64->2, :78-88).

TPU-first deviations (behaviour-preserving):
  * NHWC layout everywhere; channels reordered once for the DDA streams.
  * The reference's *sparse head* (popcorn.py:195-228) is a GPU-memory
    trick: it evaluates the head only at masked pixels via data-dependent
    fancy indexing, which is hostile to XLA's static shapes. We evaluate
    the dense head (pure MXU matmuls, optionally a fused Pallas kernel)
    and apply the mask to the *statistics*: popcount and the scale
    regularisation are mathematically identical because every pixel that
    can contribute to popcount (building_score > 0 inside the admin
    region) is in the reference's sparsity mask by construction
    (popcorn.py:361-372), and masked pixels outside it contribute zero.
    Gradients are therefore identical too.
  * Frozen BatchNorm is folded to per-channel scale/shift constants.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelConfig
from .ops import add_padding, conv1x1, revert_padding
from .unet import building_logits, dual_stream_features

Tree = Dict[str, Any]

HEAD_HIDDEN = 64
HEAD_LAYERS = ("l1", "l2", "l3", "l4")


def reorder_to_dda(
    x: jnp.ndarray, *, s1: bool, s2: bool, nir: bool
) -> jnp.ndarray:
    """Reorder the concatenated input into DDA's 6-channel order.

    Our assembled input is [S2: R,G,B(,NIR)][S1: VV,VH] (see data.normalize);
    DDA expects [VV, VH, B02(B), B03(G), B04(R), B08(NIR)]. Mirrors the
    channel shuffle + zero-fill of model/popcorn.py:129-145 (the
    ``torch.flip`` of the first three channels converts stored RGB to the
    BGR order the DDA checkpoint was trained on). Missing modalities are
    zero-filled. When NIR is absent with S2 present the reference would
    mis-index (its canonical runs always pass -NIR); we zero-fill B08,
    which is the evident intent.
    """
    b, h, w, _ = x.shape
    zeros = lambda c: jnp.zeros((b, h, w, c), dtype=x.dtype)
    if s2:
        n_s2 = 4 if nir else 3
        bgr = x[..., 2::-1]  # R,G,B -> B,G,R
        nir_c = x[..., 3:4] if nir else zeros(1)
        s1_c = x[..., n_s2 : n_s2 + 2] if s1 else zeros(2)
        return jnp.concatenate([s1_c, bgr, nir_c], axis=-1)
    if s1:
        return jnp.concatenate([x[..., :2], zeros(4)], axis=-1)
    raise ValueError("at least one of S1/S2 must be enabled")


def head_apply(
    p: Tree, feats: jnp.ndarray, dtype=None, fused: bool = False
) -> jnp.ndarray:
    """The 4x (1x1 conv) head with ReLUs (model/popcorn.py:80-85).

    Dense evaluation: four channel-matmuls on the MXU. With fused=True a
    Pallas kernel evaluates all four layers in VMEM without materialising
    the 64-channel intermediates in HBM (see nn.pallas_head).
    """
    if fused:
        from .pallas_head import fused_head

        return fused_head(p, feats)
    x = feats
    for i, name in enumerate(HEAD_LAYERS):
        x = conv1x1(x, p[name], dtype)
        if i < len(HEAD_LAYERS) - 1:
            x = jax.nn.relu(x)
    return x


def use_pallas_stream(cfg: ModelConfig, train: bool = False) -> bool:
    """Gate for the fused Pallas UNet-block kernels (nn/pallas_conv.py).

    Default OFF: measured on v5e at 2048^2, the fused double-buffered
    kernels run the member fold at parity with XLA (107.9 vs 107.4 ms for
    the 5-member scan) because XLA's lifted packed convs are already ~92%
    MXU-bound — the 16x lane-fill FLOP blowup of the space-to-depth lift,
    not HBM traffic, is the binding constraint (PERF_NOTES.md). The flag
    remains for experimentation and as the vehicle for a future int8 path.
    """
    if train:
        return False
    v = getattr(cfg, "pallas_stream", None)
    if getattr(cfg, "quantize", None):
        if v is False:
            raise ValueError(
                "quantize='int8' requires the fused Pallas kernels; "
                "pallas_stream=False conflicts with it — drop one of the two"
            )
        return True  # the int8 path runs through these kernels
    if v is None:
        return False
    return bool(v)


def quantize_int8(cfg: ModelConfig, train: bool = False) -> bool:
    """Gate for int8 W8A8 inference (cfg.quantize == 'int8'): the fused
    Pallas UNet-block kernels run int8 MXU dots (2x the bf16 peak on v5e)
    with dynamic per-slab activation scales and per-channel weight scales.
    Opt-in: int8 rounding breaks bit-parity with the f32/bf16 path (map
    R^2 vs f32 validated in tests/test_pallas_conv.py and on-chip)."""
    return not train and getattr(cfg, "quantize", None) == "int8"


def builder_use_pallas(cfg: ModelConfig, train: bool = False) -> bool:
    """Pallas gate for the BUILDING EXTRACTOR specifically.

    The builder runs outside the member scan (computed once per patch in
    its own jit, infer/sliding.py::prep), and standalone — without a scan
    context forcing relayouts around XLA's lifted convs — plain XLA bf16
    is the fastest measured path on v5e (8.40 ms/stream vs 9.84 pallas
    bf16, 10.35 pallas dynamic int8, 9.00 pallas static int8;
    PERF_NOTES.md round 3). The quantize modes therefore do NOT imply
    pallas for the builder; only the explicit pallas_stream=True flag
    (experimentation) does."""
    if train:
        return False
    return getattr(cfg, "pallas_stream", None) is True


def quantize_static_int8(cfg: ModelConfig, train: bool = False) -> bool:
    """Gate for STATIC-scale int8 inference (cfg.quantize == 'int8s'):
    per-member activation scales calibrated once on the first patch, int8
    block I/O end-to-end through each UNet stream, one fused requant pass
    per layer (nn/pallas_conv.py::_double_conv_kernel_qs). Coarser than
    the dynamic per-slab scales — opt-in, accuracy vs f32 validated in
    tests/test_pallas_conv.py.

    'w4a8' routes through the SAME kernels with int4-grid weights in
    int8 carriers (nn/pallas_conv.py::_quantize_weight wbits=4): v5e's
    MXU int mode is int8 x int8, so w4a8 cannot be faster here — it
    exists to measure that trade (VERDICT r4 #4; PERF_NOTES round 5)."""
    return not train and getattr(cfg, "quantize", None) in ("int8s", "w4a8")


def weight_bits(cfg: ModelConfig) -> int:
    return 4 if getattr(cfg, "quantize", None) == "w4a8" else 8


def create_building_score(
    builder: Tree,
    x_input: jnp.ndarray,
    *,
    s1: bool,
    s2: bool,
    nir: bool,
    dtype=None,
    layout: str = "auto",
    use_pallas: bool = False,
    quantized: bool = False,
) -> jnp.ndarray:
    """On-the-fly built-up probability (model/popcorn.py:279-322).

    Reflect-pads 14px, runs the frozen building-extractor UNet, sigmoid,
    unpads. Always under stop_gradient (reference runs it in no_grad).
    When the padded shape is 4-divisible the packed space-to-depth engine
    is used (see nn.packed) — identical numerics, ~an order of magnitude
    less HBM traffic.
    """
    xp, pad = add_padding(x_input, force=True)
    x6 = reorder_to_dda(xp, s1=s1, s2=s2, nir=nir)
    hp, wp = x6.shape[1], x6.shape[2]
    from .packed import choose_pack_factor, packed_building_logits, unpack_scalar
    from .wide import choose_wide, wide_building_logits

    if (
        layout in ("wide", "spatial")
        and not use_pallas
        and not quantized
        and choose_wide(hp, wp)
    ):
        logits3 = wide_building_logits(
            builder["params"], builder["bn"], x6, s1=s1, s2=s2, dtype=dtype
        )
        score3 = jax.nn.sigmoid(logits3.astype(jnp.float32))
        score3 = revert_padding(score3[..., None], pad)[..., 0]
        return lax.stop_gradient(score3)

    # 'spatial' never packs: space-to-depth reshapes the sharded row axis
    f = choose_pack_factor(hp, wp) if layout not in ("plain", "spatial") else 1
    if f > 1:
        logits_p = packed_building_logits(
            builder["params"], builder["bn"], x6, f, s1=s1, s2=s2, dtype=dtype,
            use_pallas=use_pallas, quantized=quantized,
        )
        score3 = unpack_scalar(jax.nn.sigmoid(logits_p.astype(jnp.float32)), f)
    else:
        logits = building_logits(
            builder["params"], builder["bn"], x6, s1=s1, s2=s2, dtype=dtype
        )
        # 3-D scalar map (lanes = W): a (B,H,W,1) layout would lane-pad 128x
        score3 = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
    score3 = revert_padding(score3[..., None], pad)[..., 0]
    return lax.stop_gradient(score3)


def sparsity_mask(
    key: jax.Array,
    building_counts: jnp.ndarray,
    admin_mask: jnp.ndarray,
    census_idx: jnp.ndarray,
    *,
    occupancy: bool,
) -> jnp.ndarray:
    """The training sparsity mask (model/popcorn.py:361-377).

    mask = (buildings > 0 [if occupancy]) AND (admin == census_idx),
    plus a random 60x60 row/column lattice (one draw shared across the
    batch, as in the reference) clipped to the admin region, falling back
    to the full admin region if the whole batch mask is empty.
    """
    admin_sel = admin_mask == census_idx[:, None, None]
    if building_counts is not None and building_counts.ndim == 4:
        building_counts = building_counts[..., 0]
    if occupancy:
        m = (building_counts > 0) & admin_sel
    else:
        m = admin_sel
    _, h, w = m.shape
    kx, ky = jax.random.split(key)
    nx, ny = min(60, h), min(60, w)
    xi = jax.random.choice(kx, h, shape=(nx,), replace=False)
    yi = jax.random.choice(ky, w, shape=(ny,), replace=False)
    rows = jnp.zeros((h,), bool).at[xi].set(True)
    cols = jnp.zeros((w,), bool).at[yi].set(True)
    lattice = rows[:, None] & cols[None, :]
    m = (m | lattice[None]) & admin_sel
    empty = ~jnp.any(m)
    return jnp.where(empty, admin_sel, m)


def select_engine(cfg: ModelConfig, h: int, w: int, train: bool = False) -> str:
    """Pick the UNet execution engine for an (h, w) input.

    "packed" — space-to-depth lift (nn/packed.py): the DEFAULT on
               4-divisible shapes, and required by the Pallas kernel /
               int8 paths (their kernels are written against the s2d
               layout). Its lifted convs execute ~16x the model FLOPs,
               but their K=1152 contractions run ~2.4x closer to MXU
               peak than any lower-K alternative measured on v5e
               (PERF_NOTES round 4): wide measured 0.857x end-to-end.
    "wide"   — W-only packed lanes (nn/wide.py): ~2.7x fewer executed
               FLOPs but K=384 band convs (measured ~21 vs ~51 TFLOP/s).
               Not the default; it IS the right engine wherever packed
               cannot run: layout="spatial" (packed's space-to-depth
               reshapes the row-sharded H axis; wide never touches H and
               measured ~5x faster than plain) — and its lane-dense
               activations cut the whole-frame HBM footprint.
    "plain"  — direct NHWC (nn/unet.py): odd shapes / layout="plain".
    """
    layout = getattr(cfg, "layout", "auto")
    if layout == "plain":
        return "plain"
    from .packed import choose_pack_factor
    from .wide import choose_wide

    if layout == "spatial":
        # row-sharded whole-frame path (infer/spatial.py): the wide
        # engine's W-only lanes never touch the sharded H axis, so it
        # partitions with local halo exchanges like plain NHWC does; the
        # space-to-depth engine would reshape H (a resharding gather) and
        # is never allowed here.
        return "wide" if choose_wide(h, w) else "plain"
    # the Pallas fused kernels + both int8 modes are s2d-layout programs
    if getattr(cfg, "quantize", None) or getattr(cfg, "pallas_stream", None):
        layout = "packed" if layout in ("auto", "wide") else layout

    if layout == "wide":
        if choose_wide(h, w):
            return "wide"
        # nn/wide.py's documented contract: shapes failing H%4/W%32 fall
        # back to packed/plain instead of crashing mid-epoch on the first
        # non-conforming bucket (ADVICE r4 #3). One-time warning per shape.
        if (h, w) not in _WIDE_FALLBACK_WARNED:
            _WIDE_FALLBACK_WARNED.add((h, w))
            import warnings

            warnings.warn(
                f"layout='wide' requires H%4==0 and W%32==0; falling back "
                f"to packed/plain for shape {(h, w)}",
                stacklevel=2,
            )
    return "packed" if choose_pack_factor(h, w) > 1 else "plain"


_WIDE_FALLBACK_WARNED: set = set()


def prepare_wide_streams(x: jnp.ndarray, cfg: ModelConfig):
    """Wide-lane input prep: reorder to DDA order + free reshapes.

    Returns (sar_w, opt_w) at nn.wide.FW0 (either may be None when its
    stream is disabled)."""
    from .wide import FW0, wpack

    x6 = reorder_to_dda(x, s1=cfg.s1, s2=cfg.s2, nir=cfg.nir)
    sar_w = wpack(x6[..., :2], FW0) if cfg.s1 else None
    opt_w = wpack(x6[..., 2:], FW0) if cfg.s2 else None
    return sar_w, opt_w


def wide_member_maps(
    params: Tree,
    consts: Tree,
    sar_w: Optional[jnp.ndarray],
    opt_w: Optional[jnp.ndarray],
    score3: jnp.ndarray,
    cfg: ModelConfig,
):
    """One ensemble member's (popdensemap, scale) through the wide-lane
    engine — maps are dense 3-D (B, H, W) float32 end-to-end (no flat-
    packed accumulators needed: the wide layout never lane-pads scalars)."""
    from .wide import wide_head_apply, wide_unet_stream

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    sar_f = opt_f = None
    if sar_w is not None:
        sar_f = wide_unet_stream(
            params["unet"]["sar"], consts["unet_bn"]["sar"], sar_w, dtype=dtype
        )
    if opt_w is not None:
        opt_f = wide_unet_stream(
            params["unet"]["opt"], consts["unet_bn"]["opt"], opt_w, dtype=dtype
        )
    # single-stream configs ship an 8-in head (l1 w is (8,64)); the dual
    # head splits (16,64) two-part inside wide_head_apply
    out = wide_head_apply(params["head"], sar_f, opt_f, dtype).astype(jnp.float32)
    if cfg.occupancy_model:
        scale3 = jax.nn.relu(out)
        dense3 = scale3 * score3.astype(jnp.float32)
    else:
        scale3 = jnp.zeros_like(out)
        dense3 = jax.nn.relu(out)
    return dense3, scale3


def prepare_packed_streams(x: jnp.ndarray, cfg: ModelConfig):
    """Pack the DDA input streams once for reuse across ensemble members.

    The pack relayouts are member-invariant but XLA does not hoist them out
    of a member scan (measured ~8-10 ms per member at 2048^2), so the
    inference engine prepares them explicitly. Returns
    (sar_packed, opt_packed, f) with f==1 meaning 'use the plain path'.
    """
    from .packed import choose_pack_factor, pack

    h, w = x.shape[1], x.shape[2]
    f = choose_pack_factor(h, w) if getattr(cfg, "layout", "auto") != "plain" else 1
    if f == 1 or not (cfg.s1 and cfg.s2):
        return None, None, 1
    x6 = reorder_to_dda(x, s1=cfg.s1, s2=cfg.s2, nir=cfg.nir)
    return pack(x6[..., :2], f), pack(x6[..., 2:], f), f


def use_pallas_packed_head(cfg: ModelConfig, train: bool) -> bool:
    """Auto gate for the Pallas fused packed head: inference on TPU only
    (training keeps the XLA block-diag matmuls, whose autodiff is free;
    on CPU the kernel would run in slow interpret mode)."""
    if train:
        return False
    v = getattr(cfg, "pallas_packed_head", None)
    if v is None:
        # auto: standalone the kernel is 2.6x the XLA block-diag matmuls,
        # but next to XLA convs its custom-call layout constraint degrades
        # them (measured: the 0.4 ms lifted convs become 2.4 ms in a
        # T(2,128) layout) — so it follows the Pallas stream gate: when the
        # UNet blocks are Pallas kernels there are no adjacent XLA convs
        # left to poison.
        return use_pallas_stream(cfg, train)
    return bool(v)


def calibrate_member_scales(
    params: Tree,
    consts: Tree,
    sar_p: jnp.ndarray,
    opt_p: jnp.ndarray,
    f: int,
) -> Tree:
    """Static-int8 activation scales for one member's two UNet streams,
    computed from a calibration patch (nn/packed.py::
    calibrate_packed_stream). Called once per region eval on the first
    patch batch (infer/sliding.py); the scalars then ride the member scan
    alongside the stacked params."""
    from .packed import calibrate_packed_stream

    return {
        "sar": calibrate_packed_stream(
            params["unet"]["sar"], consts["unet_bn"]["sar"], sar_p, f
        ),
        "opt": calibrate_packed_stream(
            params["unet"]["opt"], consts["unet_bn"]["opt"], opt_p, f
        ),
    }


def packed_member_maps(
    params: Tree,
    consts: Tree,
    sar_p: jnp.ndarray,
    opt_p: jnp.ndarray,
    f: int,
    score_packed: jnp.ndarray,
    cfg: ModelConfig,
    scales: Optional[Tree] = None,
):
    """One ensemble member's (popdensemap, scale) — ENTIRELY in packed
    space (the member-dependent tail of popcorn_forward, eval semantics:
    no padding, dense head, occupancy).

    score_packed: the building score in the dense-lane FLAT packed layout
    (B, Hp, Wp*f^2) — packed at f, with the size-f^2 minor dim folded into
    the lane dim so no tensor in the fold carries 128-lane padding.
    Returns flat-packed (dense_p, scale_p) float32 — the caller accumulates
    in this layout and unpacks ONCE after the ensemble fold (per-member
    unpack relayouts cost ~5 ms each at 2048^2, measured round 2)."""
    from .packed import packed_head_apply, packed_unet_stream, packed_unet_stream_qs

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    pk = use_pallas_stream(cfg)
    q = quantize_int8(cfg)
    if quantize_static_int8(cfg) and scales is not None and f == 4:
        wb = weight_bits(cfg)
        sar_f = packed_unet_stream_qs(
            params["unet"]["sar"], consts["unet_bn"]["sar"], sar_p, f,
            scales["sar"], dtype=dtype, wbits=wb,
        )
        opt_f = packed_unet_stream_qs(
            params["unet"]["opt"], consts["unet_bn"]["opt"], opt_p, f,
            scales["opt"], dtype=dtype, wbits=wb,
        )
    else:
        sar_f = packed_unet_stream(
            params["unet"]["sar"], consts["unet_bn"]["sar"], sar_p, f, dtype=dtype,
            use_pallas=pk, quantized=q,
        )
        opt_f = packed_unet_stream(
            params["unet"]["opt"], consts["unet_bn"]["opt"], opt_p, f, dtype=dtype,
            use_pallas=pk, quantized=q,
        )
    feats_p = jnp.concatenate([sar_f, opt_f], axis=-1)
    b, hp, wp = feats_p.shape[0], feats_p.shape[1], feats_p.shape[2]
    if use_pallas_packed_head(cfg, train=False):
        from .pallas_packed_head import fused_packed_head

        out_p = fused_packed_head(
            params["head"], feats_p, f, dtype, two_stream=True, flat=True
        )
    else:
        out_p = packed_head_apply(
            params["head"], feats_p, f, dtype, two_stream=True
        ).reshape(b, hp, wp * f * f)
    out_p = out_p.astype(jnp.float32)
    if cfg.occupancy_model:
        scale_p = jax.nn.relu(out_p)
        dense_p = scale_p * score_packed.astype(jnp.float32)
    else:
        scale_p = jnp.zeros_like(out_p)
        dense_p = jax.nn.relu(out_p)
    return dense_p, scale_p


def popcorn_forward(
    params: Tree,
    consts: Tree,
    inputs: Dict[str, jnp.ndarray],
    cfg: ModelConfig,
    *,
    train: bool = False,
    padding: bool = True,
    encoder_no_grad: bool = False,
    unet_no_grad: bool = False,
    sparse: bool = False,
    key: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Full POPCORN forward pass (model/popcorn.py:100-193).

    params: {'unet': dual-stream tree, 'head': {'l1'..'l4': {w,b}}}
    consts: {'unet_bn': BN constants, 'builder': {'params','bn'} frozen
             building extractor}
    inputs: {'input': (B,H,W,C) normalized modality concat,
             optional 'building_counts': (B,H,W) or (B,H,W,1),
             optional 'admin_mask': (B,H,W), 'census_idx': (B,)}

    Returns {'popcount': (B,), 'popdensemap': (B,H,W),
             'scale': (B,H,W) or None,
             'scale_abs_mean': () masked mean |scale| for regularisation}.
    """
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    x = inputs["input"]

    layout = getattr(cfg, "layout", "auto")

    # Building score: computed on the fly when absent or sentinel_buildings
    # (model/popcorn.py:112-115).
    if "building_counts" not in inputs or cfg.sentinel_buildings:
        bp = builder_use_pallas(cfg, train)
        building_counts = create_building_score(
            consts["builder"], x, s1=cfg.s1, s2=cfg.s2, nir=cfg.nir,
            dtype=dtype, layout=layout,
            use_pallas=bp,
            quantized=quantize_int8(cfg, train) and bp,
        )
    else:
        building_counts = inputs["building_counts"]
        if building_counts.ndim == 4:
            building_counts = building_counts[..., 0]

    mask = None
    if sparse:
        if key is None:
            raise ValueError("sparse=True requires a PRNG key")
        mask = sparsity_mask(
            key,
            building_counts,
            inputs["admin_mask"],
            inputs["census_idx"],
            occupancy=cfg.occupancy_model,
        )

    # Main feature extractor + head.
    xp, pad = add_padding(x, force=padding)
    x6 = reorder_to_dda(xp, s1=cfg.s1, s2=cfg.s2, nir=cfg.nir)

    from .packed import (
        choose_pack_factor,
        packed_dual_stream_features,
        packed_head_apply,
        unpack_scalar,
    )
    from .wide import FW0, choose_wide, wide_head_apply, wide_unet_stream, wpack

    hp, wp = x6.shape[1], x6.shape[2]
    no_pad = pad == (None, None, None, None)
    engine = (
        select_engine(cfg, hp, wp, train)
        if (layout != "plain" and no_pad)
        else "plain"
    )
    if engine == "wide":
        dt = dtype
        sar_f = opt_f = None
        if cfg.s1:
            sar_f = wide_unet_stream(
                params["unet"]["sar"], consts["unet_bn"]["sar"],
                wpack(x6[..., :2], FW0),
                encoder_stop_grad=encoder_no_grad, dtype=dt,
            )
        if cfg.s2:
            opt_f = wide_unet_stream(
                params["unet"]["opt"], consts["unet_bn"]["opt"],
                wpack(x6[..., 2:], FW0),
                encoder_stop_grad=encoder_no_grad, dtype=dt,
            )
        if unet_no_grad:
            sar_f = lax.stop_gradient(sar_f) if sar_f is not None else None
            opt_f = lax.stop_gradient(opt_f) if opt_f is not None else None
        out = wide_head_apply(params["head"], sar_f, opt_f, dt).astype(
            jnp.float32
        )
        f = -1  # handled; skip the packed/plain branches below
    else:
        f = choose_pack_factor(hp, wp) if engine == "packed" else 1
    if f > 1:
        # packed fast path: features and head stay in space-to-depth layout,
        # only the scalar channel-0 map is unpacked at the end.
        feats_p = packed_dual_stream_features(
            params["unet"], consts["unet_bn"], x6, f,
            s1=cfg.s1, s2=cfg.s2,
            encoder_stop_grad=encoder_no_grad, dtype=dtype,
            use_pallas=use_pallas_stream(cfg, train),
            quantized=quantize_int8(cfg, train),
        )
        if unet_no_grad:
            feats_p = lax.stop_gradient(feats_p)
        if use_pallas_packed_head(cfg, train):
            # Pallas fused packed head: the block-diagonal VMEM pipeline is
            # ~2.6x the XLA block-diag matmuls on v5e (round-1's dense
            # kernel was slower; see nn/pallas_packed_head.py docstring)
            from .pallas_packed_head import fused_packed_head

            out_p = fused_packed_head(
                params["head"], feats_p, f, dtype, two_stream=(cfg.s1 and cfg.s2)
            )
        else:
            out_p = packed_head_apply(
                params["head"], feats_p, f, dtype, two_stream=(cfg.s1 and cfg.s2)
            )
        out = unpack_scalar(out_p, f).astype(jnp.float32)
    elif f == 1:
        feats = dual_stream_features(
            params["unet"],
            consts["unet_bn"],
            x6,
            s1=cfg.s1,
            s2=cfg.s2,
            encoder_stop_grad=encoder_no_grad,
            dtype=dtype,
            remat=cfg.remat_unet and train,
        )
        if unet_no_grad:
            feats = lax.stop_gradient(feats)
        feats = revert_padding(feats, pad)
        use_fused = cfg.fused_head and feats.shape[-1] == 16  # kernel is 16ch-only
        out = head_apply(params["head"], feats, dtype, fused=use_fused)[..., 0]
        out = out.astype(jnp.float32)

    if cfg.occupancy_model:
        scale = jax.nn.relu(out)
        popdensemap = scale * building_counts.astype(jnp.float32)
    else:
        scale = None
        popdensemap = jax.nn.relu(out)

    if "admin_mask" in inputs:
        sel = inputs["admin_mask"] == inputs["census_idx"][:, None, None]
        popcount = jnp.sum(popdensemap * sel, axis=(1, 2))
    else:
        popcount = jnp.sum(popdensemap, axis=(1, 2))

    result: Dict[str, Any] = {
        "popcount": popcount,
        "popdensemap": popdensemap,
        "scale": scale,
    }
    if scale is not None:
        if mask is not None:
            # |scale| mean over the sparsity mask — identical to the
            # reference's mean over aux["scale"] = scale[sparsity_mask].
            msum = jnp.sum(jnp.abs(scale) * mask)
            result["scale_abs_mean"] = msum / jnp.maximum(jnp.sum(mask), 1)
        else:
            result["scale_abs_mean"] = jnp.mean(jnp.abs(scale))
    else:
        result["scale_abs_mean"] = None
    if mask is not None:
        result["sparsity_mask"] = mask
    result["building_counts"] = building_counts
    return result
