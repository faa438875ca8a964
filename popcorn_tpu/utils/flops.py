"""Analytic FLOP accounting and MFU reporting for the POPCORN pipeline.

Makes the bench's performance claims auditable (VERDICT r3 #6): every
headline rate is accompanied by

  * ``useful`` TFLOP/s — the model-math FLOPs per patch/step, counted
    analytically from the architecture (this module), i.e. the FLOPs any
    implementation of the reference's math must perform;
  * ``executed`` TFLOP/s — what the compiled XLA module actually runs,
    read from XLA's own cost model (``compiled.cost_analysis()['flops']``),
    which includes layout-lift overheads (the packed engine's space-to-depth
    kernel blowup, the wide engine's band padding) and elementwise work;
  * ``mfu`` — each of those as a fraction of the chip's published bf16
    peak (``device_peak_flops``).

Architecture being counted (reference: model/DDA_model/utils/networks.py
topology [8, 16]; model/popcorn.py head + occupancy):

  per UNet stream (cin -> t0=8, t1=16), resolutions relative to (H, W):
    inc   @ 1    : conv3x3 cin->t0, conv3x3 t0->t0
    down1 @ 1/2  : conv3x3 t0->t1, conv3x3 t1->t1
    down2 @ 1/4  : conv3x3 t1->t1, conv3x3 t1->t1
    up2   @ 1/2  : tconv2x2 t1->t1, conv3x3 2*t1->t0, conv3x3 t0->t0
    up1   @ 1    : tconv2x2 t0->t0, conv3x3 2*t0->t0, conv3x3 t0->t0
  dual-stream features = sar(cin=2) + opt(cin=4) streams (16ch concat);
  builder = dual-stream + fusion 1x1 16->1 (run ONCE per eval patch —
  infer/sliding.py prep);
  head = 1x1 chain 16->64->64->64->2 per member (popcorn.py:78-88).

Conventions: 1 MAC = 2 FLOPs; elementwise/BN/pool work is excluded from
the *analytic* counts (it is <1% of the conv MACs and XLA fuses it) but
present in the *executed* counts — so executed > useful even for a
perfect-layout engine. A training step is counted as 3x forward for the
gradient path (standard fwd + grad-wrt-input + grad-wrt-weight
convention) plus 1x forward for the frozen builder.
"""

from __future__ import annotations

from typing import Optional

SAR_IN = 2
OPT_IN = 4


def _stream_flops_per_px(cin: int, t0: int = 8, t1: int = 16) -> float:
    """Conv FLOPs per full-res pixel for one UNet stream (see module doc)."""
    c33 = lambda ci, co: 18.0 * ci * co  # 2 * 3*3 MACs per output px
    inc = c33(cin, t0) + c33(t0, t0)
    down1 = (c33(t0, t1) + c33(t1, t1)) / 4.0
    down2 = (c33(t1, t1) + c33(t1, t1)) / 16.0
    # tconv 2x2 stride 2: each output px receives exactly one 2x2 tap
    up2 = (2.0 * t1 * t1 + c33(2 * t1, t0) + c33(t0, t0)) / 4.0
    up1 = 2.0 * t0 * t0 + c33(2 * t0, t0) + c33(t0, t0)
    return inc + down1 + down2 + up2 + up1


def features_flops_per_px(s1: bool = True, s2: bool = True) -> float:
    """Dual-stream 16ch feature FLOPs per pixel (networks.py:192-211)."""
    total = 0.0
    if s1:
        total += _stream_flops_per_px(SAR_IN)
    if s2:
        total += _stream_flops_per_px(OPT_IN)
    return total


def builder_flops_per_px(s1: bool = True, s2: bool = True) -> float:
    """Building-score extractor: features + fusion 1x1 (n_streams*8 -> 1)."""
    cin = 8 * (int(s1) + int(s2))
    return features_flops_per_px(s1, s2) + 2.0 * cin


def head_flops_per_px(cin: int = 16, hidden: int = 64) -> float:
    """1x1 conv chain cin->hidden->hidden->hidden->2 (popcorn.py:78-88)."""
    return 2.0 * (cin * hidden + hidden * hidden * 2 + hidden * 2)


def member_flops_per_px(s1: bool = True, s2: bool = True) -> float:
    """One ensemble member's forward: features + head (occupancy mults excl.)."""
    return features_flops_per_px(s1, s2) + head_flops_per_px()


def eval_patch_flops(
    h: int,
    w: int,
    n_members: int,
    *,
    s1: bool = True,
    s2: bool = True,
    sentinel_buildings: bool = True,
) -> float:
    """Useful FLOPs for one eval patch through the ensemble fold.

    Mirrors infer/sliding.py::make_patch_forward: the builder runs once
    per patch (the reference recomputes it per member, run_eval.py:108-115
    — we count OUR math, which is the cheaper equivalent), then n_members
    feature+head passes.
    """
    px = float(h) * float(w)
    total = n_members * member_flops_per_px(s1, s2) * px
    if sentinel_buildings:
        total += builder_flops_per_px(s1, s2) * px
    return total


def train_step_flops(
    h: int,
    w: int,
    batch: int,
    *,
    s1: bool = True,
    s2: bool = True,
    sentinel_buildings: bool = True,
) -> float:
    """Useful FLOPs for one fwd+bwd training step (3x fwd convention).

    The builder (building score) is frozen and under stop_gradient, so it
    contributes 1x forward; the trainable extractor+head path contributes
    3x (fwd, dL/dx, dL/dw).
    """
    px = float(h) * float(w) * batch
    total = 3.0 * member_flops_per_px(s1, s2) * px
    if sentinel_buildings:
        total += builder_flops_per_px(s1, s2) * px
    return total


# Published per-chip dense peaks (TFLOP/s). Sources: Google Cloud TPU
# system-architecture docs / the public scaling book. Keyed by substrings
# of jax Device.device_kind.
_PEAKS_TFLOPS = {
    "v6": {"bf16": 918.0, "int8": 1836.0},      # v6e Trillium
    "v5p": {"bf16": 459.0, "int8": 918.0},
    "v5 lite": {"bf16": 197.0, "int8": 394.0},  # v5e; device_kind "TPU v5 lite"
    "v5e": {"bf16": 197.0, "int8": 394.0},
    "v4": {"bf16": 275.0, "int8": 275.0},       # v4 has no int8 doubling
}


def device_peak_flops(device, dtype: str = "bf16") -> Optional[float]:
    """Peak FLOP/s for a jax Device, or None when the kind is unknown (CPU)."""
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in _PEAKS_TFLOPS.items():
        if key in kind:
            return peaks.get(dtype, peaks["bf16"]) * 1e12
    return None


def executed_flops(jitted, *args, **kwargs) -> Optional[float]:
    """XLA-cost-model FLOPs of one call of a jitted function.

    Returns None when the backend does not expose a cost analysis (some
    PJRT plugins) — callers must treat the executed count as optional.
    Uses lower().compile(), which hits the persistent compile cache when
    the same executable was already built this process/run.
    """
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0] if ca else None
        if not ca:
            return None
        flops = ca.get("flops")
        return float(flops) if flops and flops > 0 else None
    except Exception:
        return None


def mfu_line(rate_per_sec: float, flops_per_unit: float, peak: Optional[float]) -> dict:
    """A JSON-ready {tflops, mfu} pair; mfu omitted when peak is unknown."""
    tflops = rate_per_sec * flops_per_unit / 1e12
    out = {"tflops": round(tflops, 3)}
    if peak:
        out["mfu"] = round(tflops * 1e12 / peak, 4)
    return out


def eval_executed_probe(mcfg, consts, stats, params_member, batch) -> Optional[dict]:
    """Measured executed FLOPs of the eval patch pipeline, per stage.

    XLA's cost model counts a ``lax.scan`` body ONCE regardless of trip
    count, so the production member fold (infer/sliding.py) cannot be
    cost-analysed directly. This probe builds scan-free jits of the same
    computations — prep (normalize + builder score) and one member pass
    through the engine ``select_engine`` picks for the batch shape — and
    returns ``{"prep": F, "member": F, "engine": name}``. Total executed
    per patch = prep + n_members * member.

    Compiles two small AOT executables (persistent-cache hits on repeat
    runs); returns None when the backend exposes no cost analysis.
    """
    import jax
    import jax.numpy as jnp

    from ..data.normalize import normalize_and_assemble
    from ..nn.popcorn import (
        builder_use_pallas,
        create_building_score,
        packed_member_maps,
        prepare_packed_streams,
        prepare_wide_streams,
        quantize_int8,
        select_engine,
        wide_member_maps,
    )

    dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else None

    def prep(b):
        sample = {}
        if mcfg.s2 and "S2" in b:
            sample["S2"] = b["S2"].astype(jnp.float32)
        if mcfg.s1 and "S1" in b:
            sample["S1"] = b["S1"]
        if mcfg.viirs and "VIIRS" in b:
            sample["VIIRS"] = b["VIIRS"]
        x = normalize_and_assemble(sample, stats)
        if mcfg.sentinel_buildings or not mcfg.occupancy_model:
            bp = builder_use_pallas(mcfg)
            score = create_building_score(
                consts["builder"], x, s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir,
                dtype=dtype, use_pallas=bp,
                quantized=quantize_int8(mcfg) and bp,
            )
        else:
            score = b["building_counts"]
        return x, score

    import dataclasses

    ref = batch["S2"] if "S2" in batch else batch["S1"]
    h, w = ref.shape[1], ref.shape[2]
    # member passes never recompute the building score (sliding.py:82)
    mcfg_member = dataclasses.replace(mcfg, sentinel_buildings=False)
    engine = select_engine(mcfg_member, h, w)

    def member(params, x, score):
        score3 = score if score.ndim == 3 else score[..., 0]
        if engine == "wide":
            sar_w, opt_w = prepare_wide_streams(x, mcfg_member)
            return wide_member_maps(
                params, consts, sar_w, opt_w, score3, mcfg_member
            )
        sar_p, opt_p, f = prepare_packed_streams(x, mcfg_member)
        if f > 1:
            from ..nn.packed import pack

            bp_, hp, wpf = sar_p.shape[0], sar_p.shape[1], sar_p.shape[2]
            score_p = pack(score3[..., None].astype(jnp.float32), f).reshape(
                bp_, hp, wpf * f * f
            )
            return packed_member_maps(
                params, consts, sar_p, opt_p, f, score_p, mcfg_member
            )
        from ..nn.popcorn import popcorn_forward  # plain path

        out = popcorn_forward(
            params, consts, {"input": x, "building_counts": score3},
            mcfg_member, train=False, padding=False, sparse=False,
        )
        return out["popdensemap"], out["scale"]

    sub = {k: batch[k] for k in ("S2", "S1", "VIIRS", "building_counts") if k in batch}
    prep_j = jax.jit(prep)
    f_prep = executed_flops(prep_j, sub)
    x0, score0 = jax.block_until_ready(prep_j(sub))
    f_member = executed_flops(jax.jit(member), params_member, x0, score0)
    if f_prep is None or f_member is None:
        return None
    return {"prep": f_prep, "member": f_member, "engine": engine}
