"""Country-scale sliding-window inference with ensemble stitching.

Re-implements the reference's eval driver (run_eval.py:71-203 and the
in-training test_target, run_train.py:314-370) TPU-first:

  * the Bag-of-POPCORN ensemble (5 members evaluated sequentially in a
    Python loop on the reference GPU, run_eval.py:108-115) becomes ONE
    compiled function: member params are stacked and vmapped, so all
    members run per patch in a single device launch;
  * patches are batched (and optionally sharded over a 'data' mesh axis —
    the spatial analogue of sequence parallelism, SURVEY.md §2.2);
  * the halo-validity mask is applied on device, so the host only adds
    dense slices into the country-scale accumulators;
  * ensemble mean + std use the identical sum/sum-of-squares math
    (std = sqrt((sum_sq - n*mean^2)/(n-1)), run_eval.py:137-154),
    including the count>1 divide mask quirk.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.dataset import PopulationDataset
from ..data.feed import InferenceFeed
from ..data.normalize import NormStats, normalize_and_assemble
from ..dist.mesh import batch_sharding, ensemble_size, replicated
from ..nn.popcorn import popcorn_forward

Tree = Dict[str, Any]


def stack_ensemble(params_list: Sequence[Tree]) -> Tree:
    """Stack N member param trees along a new leading axis for vmap."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def pad_stacked_members(stacked: Tree, n_members: int, multiple: int) -> Tree:
    """Pad the stacked member axis up to a multiple of the mesh's
    'ensemble' size (padding repeats member 0; the fold discards padded
    members by slicing the gathered per-member maps to ``n_members``)."""
    n_pad = -(-n_members // multiple) * multiple
    if n_pad == n_members:
        return stacked
    rep = n_pad - n_members
    return jax.tree.map(
        lambda a: jnp.concatenate([a, jnp.repeat(a[:1], rep, axis=0)], axis=0),
        stacked,
    )


def make_patch_forward(
    mcfg: ModelConfig,
    consts: Tree,
    stats: NormStats,
    n_members: int,
    mesh=None,
    single_dispatch: bool = False,
    packed_output: bool = False,
):
    """Jitted ensemble patch forward.

    Returns fn(stacked_params, batch) -> dict of (B,H,W) float32 maps:
    popdense_sum/sq over members, scale_sum/sq, all pre-multiplied by the
    validity mask so the host does dense adds only.
    """

    import dataclasses

    from ..nn.popcorn import create_building_score

    # All ensemble members share the same frozen building extractor, so the
    # building score is computed ONCE per patch (the reference recomputes it
    # inside every member forward, run_eval.py:108-115 via popcorn.py:112-115
    # — identical result, 5x the compute). Members are then folded with
    # lax.scan, keeping single-member activation memory on HBM instead of
    # vmapping all members' activations simultaneously.
    mcfg_member = dataclasses.replace(mcfg, sentinel_buildings=False)
    dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else None

    def member_forward(params, inputs):
        out = popcorn_forward(
            params, consts, inputs, mcfg_member,
            train=False, padding=False, sparse=False,
        )
        scale = out["scale"]
        if scale is None:
            scale = jnp.zeros_like(out["popdensemap"])
        return out["popdensemap"].astype(jnp.float32), scale.astype(jnp.float32)

    def prep(batch):
        """Normalize + building score: one jit (compiled once per shape)."""
        sample = {}
        if mcfg.s2 and "S2" in batch:
            # S2 may arrive uint16 (half the host->device bytes, feed.py);
            # the upcast fuses into the normalize subtract/divide
            sample["S2"] = batch["S2"].astype(jnp.float32)
        if mcfg.s1 and "S1" in batch:
            sample["S1"] = batch["S1"]
        if mcfg.viirs and "VIIRS" in batch:
            sample["VIIRS"] = batch["VIIRS"]
        x = normalize_and_assemble(sample, stats)
        if mcfg.sentinel_buildings or not mcfg.occupancy_model:
            from ..nn.popcorn import builder_use_pallas, quantize_int8

            # the builder sits outside the member scan: plain XLA bf16 is
            # its fastest path even in the quantize modes (see
            # nn.popcorn.builder_use_pallas)
            bp = builder_use_pallas(mcfg)
            score = create_building_score(
                consts["builder"], x, s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir,
                dtype=dtype,
                use_pallas=bp,
                quantized=quantize_int8(mcfg) and bp,
            )
        else:
            score = batch["building_counts"]
        return x, score

    def members(stacked_params, x, score, mask, valid, stacked_scales=None):
        """Member fold + masking: a second, separately-compiled jit.

        Splitting prep/members keeps each XLA module small enough to
        compile quickly through the remote-compile tunnel; the extra
        dispatch is ~30 ms per batch. The packed input streams are
        prepared ONCE (member-invariant relayouts are not hoisted out of
        the scan by XLA — measured ~40 ms per 5-member patch), and the
        whole fold — head output, relu, score multiply, square, masking —
        stays in the space-to-depth packed layout; the four accumulator
        maps are unpacked ONCE at the end (per-member unpack relayouts
        cost ~5 ms each at 2048^2).
        """
        from ..nn.packed import pack, unpack_scalar
        from ..nn.popcorn import (
            packed_member_maps,
            prepare_packed_streams,
            prepare_wide_streams,
            select_engine,
            wide_member_maps,
        )

        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        m = mask.astype(jnp.float32) * valid.astype(jnp.float32)[:, None, None]

        if select_engine(mcfg_member, h, w) == "wide":
            # wide-lane fold (nn/wide.py): inputs prepare as free reshapes,
            # every map is a dense 3-D (B,H,W) — no flat-packed accumulators
            # or unpack epilogue needed
            sar_w, opt_w = prepare_wide_streams(x, mcfg_member)
            score3 = score if score.ndim == 3 else score[..., 0]
            zeros = jnp.zeros((b, h, w), jnp.float32)

            def wbody(carry, params):
                ds, dsq, ss, ssq = carry
                dense, scale = wide_member_maps(
                    params, consts, sar_w, opt_w, score3, mcfg_member
                )
                return (ds + dense, dsq + dense**2, ss + scale, ssq + scale**2), None

            (ds, dsq, ss, ssq), _ = jax.lax.scan(
                wbody, (zeros, zeros, zeros, zeros), stacked_params
            )
            return {
                "dense_sum": ds * m,
                "dense_sq": dsq * m,
                "scale_sum": ss * m,
                "scale_sq": ssq * m,
                "count": m * n_members,
            }

        sar_p, opt_p, f = prepare_packed_streams(x, mcfg_member)
        if f > 1:
            # everything in the dense-lane FLAT packed layout (B,Hp,Wp*f^2):
            # a (B,Hp,Wp,f^2) f32 tensor would pad its size-16 minor dim to
            # 128 lanes — 8x the HBM bytes on every accumulator op
            bp, hp, wpf = sar_p.shape[0], sar_p.shape[1], sar_p.shape[2]
            ff = f * f

            def to_flat(a3):  # (B,H,W) scalar map -> flat packed
                return pack(a3[..., None].astype(jnp.float32), f).reshape(
                    bp, hp, wpf * ff
                )

            def from_flat(a):  # flat packed -> (B,H,W)
                return unpack_scalar(a.reshape(bp, hp, wpf, ff), f)

            score3 = score if score.ndim == 3 else score[..., 0]
            score_p = to_flat(score3)
            zeros_p = jnp.zeros(score_p.shape, jnp.float32)

            def body(carry, ps):
                params, scales = ps
                ds, dsq, ss, ssq = carry
                dense, scale = packed_member_maps(
                    params, consts, sar_p, opt_p, f, score_p, mcfg_member,
                    scales=scales,
                )
                return (ds + dense, dsq + dense**2, ss + scale, ssq + scale**2), None

            (ds, dsq, ss, ssq), _ = jax.lax.scan(
                body, (zeros_p, zeros_p, zeros_p, zeros_p),
                (stacked_params, stacked_scales),
            )
            m_p = to_flat(m)
            if packed_output:
                # the accumulator maps NEVER leave the flat packed layout:
                # the device stitcher adds them into packed country-scale
                # accumulators and one unpack runs at finalize (the four
                # per-patch unpack relayouts cost ~10 ms at 2048^2)
                return {
                    "dense_sum": ds * m_p,
                    "dense_sq": dsq * m_p,
                    "scale_sum": ss * m_p,
                    "scale_sq": ssq * m_p,
                    "count": m_p * n_members,
                }
            return {
                "dense_sum": from_flat(ds * m_p),
                "dense_sq": from_flat(dsq * m_p),
                "scale_sum": from_flat(ss * m_p),
                "scale_sq": from_flat(ssq * m_p),
                "count": m * n_members,
            }

        zeros = jnp.zeros((b, h, w), jnp.float32)
        inputs = {"input": x, "building_counts": score}

        def body(carry, params):
            ds, dsq, ss, ssq = carry
            dense, scale = member_forward(params, inputs)
            return (ds + dense, dsq + dense**2, ss + scale, ssq + scale**2), None

        (ds, dsq, ss, ssq), _ = jax.lax.scan(
            body, (zeros, zeros, zeros, zeros), stacked_params
        )
        return {
            "dense_sum": ds * m,
            "dense_sq": dsq * m,
            "scale_sum": ss * m,
            "scale_sq": ssq * m,
            "count": m * n_members,
        }

    def members_ens(stacked_params, x, score, mask, valid):
        """Member fold with the Bag sharded over the mesh's 'ensemble' axis
        (runs under shard_map: ``stacked_params`` is this shard's members,
        ``x``/``score``/``mask``/``valid`` this shard's patches).

        Each shard computes its local members' per-member maps, the maps
        are all_gathered over 'ensemble' (so member order is restored),
        and the first ``n_members`` are folded SEQUENTIALLY — the same
        addition order as the single-device lax.scan, so results are
        bit-identical to the scan fold (tests/test_multichip.py)."""
        from ..nn.packed import pack, unpack_scalar
        from ..nn.popcorn import (
            packed_member_maps,
            prepare_packed_streams,
            prepare_wide_streams,
            select_engine,
            wide_member_maps,
        )

        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        wide = select_engine(mcfg_member, h, w) == "wide"
        sar_p = opt_p = None
        f = 0
        if not wide:
            sar_p, opt_p, f = prepare_packed_streams(x, mcfg_member)
        m = mask.astype(jnp.float32) * valid.astype(jnp.float32)[:, None, None]

        def fold(dense_all, scale_all, zeros):
            def body(carry, ms):
                d, s = ms
                ds, dsq, ss, ssq = carry
                return (ds + d, dsq + d**2, ss + s, ssq + s**2), None

            (ds, dsq, ss, ssq), _ = jax.lax.scan(
                body, (zeros, zeros, zeros, zeros),
                (dense_all[:n_members], scale_all[:n_members]),
            )
            return ds, dsq, ss, ssq

        if wide:
            sar_w, opt_w = prepare_wide_streams(x, mcfg_member)
            score3 = score if score.ndim == 3 else score[..., 0]

            def one_w(params):
                return wide_member_maps(
                    params, consts, sar_w, opt_w, score3, mcfg_member
                )

            local_d, local_s = jax.lax.map(one_w, stacked_params)
            dense_all = jax.lax.all_gather(local_d, "ensemble", axis=0, tiled=True)
            scale_all = jax.lax.all_gather(local_s, "ensemble", axis=0, tiled=True)
            zeros = jnp.zeros((b, h, w), jnp.float32)
            ds, dsq, ss, ssq = fold(dense_all, scale_all, zeros)
            return {
                "dense_sum": ds * m,
                "dense_sq": dsq * m,
                "scale_sum": ss * m,
                "scale_sq": ssq * m,
                "count": m * n_members,
            }

        if f > 1:
            bp, hp, wpf = sar_p.shape[0], sar_p.shape[1], sar_p.shape[2]
            ff = f * f

            def to_flat(a3):
                return pack(a3[..., None].astype(jnp.float32), f).reshape(
                    bp, hp, wpf * ff
                )

            def from_flat(a):
                return unpack_scalar(a.reshape(bp, hp, wpf, ff), f)

            score3 = score if score.ndim == 3 else score[..., 0]
            score_p = to_flat(score3)

            def one(params):
                return packed_member_maps(
                    params, consts, sar_p, opt_p, f, score_p, mcfg_member
                )

            local_d, local_s = jax.lax.map(one, stacked_params)
            dense_all = jax.lax.all_gather(local_d, "ensemble", axis=0, tiled=True)
            scale_all = jax.lax.all_gather(local_s, "ensemble", axis=0, tiled=True)
            zeros_p = jnp.zeros(score_p.shape, jnp.float32)
            ds, dsq, ss, ssq = fold(dense_all, scale_all, zeros_p)
            m_p = to_flat(m)
            return {
                "dense_sum": from_flat(ds * m_p),
                "dense_sq": from_flat(dsq * m_p),
                "scale_sum": from_flat(ss * m_p),
                "scale_sq": from_flat(ssq * m_p),
                "count": m * n_members,
            }

        inputs = {"input": x, "building_counts": score}

        def one(params):
            return member_forward(params, inputs)

        local_d, local_s = jax.lax.map(one, stacked_params)
        dense_all = jax.lax.all_gather(local_d, "ensemble", axis=0, tiled=True)
        scale_all = jax.lax.all_gather(local_s, "ensemble", axis=0, tiled=True)
        zeros = jnp.zeros((b, h, w), jnp.float32)
        ds, dsq, ss, ssq = fold(dense_all, scale_all, zeros)
        return {
            "dense_sum": ds * m,
            "dense_sq": dsq * m,
            "scale_sum": ss * m,
            "scale_sq": ssq * m,
            "count": m * n_members,
        }

    needs_counts = mcfg.occupancy_model and not mcfg.sentinel_buildings
    _PREP_KEYS = ("S2", "S1", "VIIRS", "building_counts")

    def _check_counts(batch):
        if needs_counts and "building_counts" not in batch:
            raise ValueError(
                "occupancy model without sentinel buildings (-occmodel without "
                "-senbuilds) requires 'building_counts' in every batch: open "
                "the dataset with sentinelbuildings=False so the pre-rasterised "
                "Google/Swiss building rasters are read "
                "(reference PopulationDataset.py:269-287), or pass -senbuilds."
            )

    # STATIC int8 ('int8s'): per-member activation scales are calibrated
    # ONCE on the first patch batch (plain f32 XLA mirror of the stream,
    # nn/packed.py::calibrate_packed_stream) and then ride the member scan
    # as small scalar arrays. Lazy (data-dependent), so the calibration
    # lives here rather than at fwd construction.
    from ..nn.popcorn import quantize_static_int8

    # mesh-sharded folds keep the dynamic kernels (the scales argument
    # does not thread through the fixed shard_map/in_shardings signatures)
    _static_q = quantize_static_int8(mcfg) and mesh is None
    _cal: Dict[str, Any] = {}

    def _member_scales(stacked_params, x):
        if not _static_q:
            return None
        if "scales" not in _cal:
            from ..nn.popcorn import calibrate_member_scales, prepare_packed_streams

            def calibrate(sp, xx):
                sar_p, opt_p, f = prepare_packed_streams(xx, mcfg_member)
                if f != 4:
                    return None
                return jax.lax.map(
                    lambda p: calibrate_member_scales(p, consts, sar_p, opt_p, f),
                    sp,
                )

            sc = jax.jit(calibrate)(stacked_params, x)
            _cal["scales"] = None if sc is None else jax.block_until_ready(sc)
        return _cal["scales"]

    def fn_factory(prep_j, members_j):
        def fn(stacked_params, batch):
            _check_counts(batch)
            x, score = prep_j(
                {k: batch[k] for k in _PREP_KEYS if k in batch}
            )
            if _static_q:
                return members_j(
                    stacked_params, x, score, batch["mask"], batch["valid"],
                    _member_scales(stacked_params, x),
                )
            return members_j(stacked_params, x, score, batch["mask"], batch["valid"])

        return fn

    def fused(stacked_params, batch, stacked_scales=None):
        _check_counts(batch)
        x, score = prep(
            {k: batch[k] for k in _PREP_KEYS if k in batch}
        )
        return members(
            stacked_params, x, score, batch["mask"], batch["valid"], stacked_scales
        )

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        keys = []
        if mcfg.s2:
            keys.append("S2")
        if mcfg.s1:
            keys.append("S1")
        if mcfg.viirs:
            keys.append("VIIRS")
        if needs_counts:
            keys.append("building_counts")
        prep_j = jax.jit(prep, in_shardings=({k: bs for k in keys},), out_shardings=bs)
        if ensemble_size(mesh) > 1:
            # 2-D ('data','ensemble') mesh: members shard over 'ensemble',
            # patches over 'data'. check_vma=False because the gathered
            # fold is replicated over 'ensemble' by construction (the VMA
            # system conservatively keeps all_gather outputs 'varying').
            members_j = jax.jit(
                jax.shard_map(
                    members_ens,
                    mesh=mesh,
                    in_specs=(P("ensemble"), P("data"), P("data"), P("data"), P("data")),
                    out_specs=P("data"),
                    check_vma=False,
                )
            )
        else:
            members_j = jax.jit(
                members,
                in_shardings=(rep, bs, bs, bs, bs),
                out_shardings=bs,
            )
        return fn_factory(prep_j, members_j)
    if single_dispatch:
        # one fused jit per patch: slower first compile (persistent-cached),
        # one less dispatch per batch afterwards
        fused_j = jax.jit(fused)
        if not _static_q:
            return fused_j
        prep_j = jax.jit(prep)

        def fn_single(stacked_params, batch):
            _check_counts(batch)
            x, _ = prep_j({k: batch[k] for k in _PREP_KEYS if k in batch})
            return fused_j(stacked_params, batch, _member_scales(stacked_params, x))

        return fn_single
    return fn_factory(jax.jit(prep), jax.jit(members))


class StitchAccumulators:
    """Host-side country-scale accumulators + the reference's finalize math."""

    def __init__(self, shape: Tuple[int, int]):
        h, w = shape
        self.out = np.zeros((h, w), np.float32)
        self.out_sq = np.zeros((h, w), np.float32)
        self.scale = np.zeros((h, w), np.float32)
        self.scale_sq = np.zeros((h, w), np.float32)
        self.count = np.zeros((h, w), np.int32)

    def add(self, x: int, y: int, res: Dict[str, np.ndarray], b: int):
        p = res["dense_sum"].shape[-1]
        sl = (slice(x, x + p), slice(y, y + p))
        self.out[sl] += res["dense_sum"][b]
        self.out_sq[sl] += res["dense_sq"][b]
        self.scale[sl] += res["scale_sum"][b]
        self.scale_sq[sl] += res["scale_sq"][b]
        self.count[sl] += res["count"][b].astype(np.int32)

    def finalize(self) -> Dict[str, np.ndarray]:
        """Visit-count averaging + sum-of-squares std (run_eval.py:137-154).

        Reproduces the reference's div_mask = count > 1 exactly: pixels
        visited once by a single model keep their raw sum (identical value)
        and get std 0.
        """
        cnt = self.count.astype(np.float32)
        div = self.count > 1
        safe = np.where(div, cnt, 1.0)
        mean = np.where(div, self.out / safe, self.out)
        var = np.where(
            div,
            (self.out_sq - mean**2 * cnt) / np.maximum(cnt - 1.0, 1.0),
            0.0,
        )
        std = np.sqrt(np.maximum(var, 0.0))
        smean = np.where(div, self.scale / safe, self.scale)
        svar = np.where(
            div,
            (self.scale_sq - smean**2 * cnt) / np.maximum(cnt - 1.0, 1.0),
            0.0,
        )
        sstd = np.sqrt(np.maximum(svar, 0.0))
        return {
            "map": mean,
            "map_std": std,
            "scale": smean,
            "scale_std": sstd,
            "count": self.count,
        }


_ACC_KEYS = ("dense_sum", "dense_sq", "scale_sum", "scale_sq", "count")

# device accumulators: 5 float32 maps; stay on-device below this budget
_DEVICE_STITCH_BUDGET_BYTES = 6e9


def _make_stitch_add(batch_size: int):
    """Jitted device-side scatter-add of patch results into the
    country-scale accumulators (donated, so updates are in-place).

    TPU-native replacement for the host accumulation loop: per-patch
    results never leave the device (run_eval.py:127-135 moves every patch
    through the CPU)."""

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def add(accs, res, xy):
        for b in range(batch_size):
            x, y = xy[b, 0], xy[b, 1]
            for k in _ACC_KEYS:
                ph, pw = res[k].shape[-2], res[k].shape[-1]
                cur = jax.lax.dynamic_slice(accs[k], (x, y), (ph, pw))
                accs[k] = jax.lax.dynamic_update_slice(
                    accs[k], cur + res[k][b], (x, y)
                )
        return accs

    return add


def _make_packed_stitch_adds(f: int):
    """Adds into FLAT PACKED country accumulators (B, Hc/f, Wc/f*f^2).

    Aligned patches (x, y both multiples of f) land as contiguous packed
    slabs. Border-clamped patches with misaligned starts (the reference
    grid's tail rows/columns, PopulationDataset.py:294-334) are unpacked,
    placed into an f-aligned canvas at their (x%f, y%f) offset, re-packed
    and added at the floored coords — one jit specialisation per offset
    pair (<= f^2-1 of them), touching only the handful of border patches.
    """

    import functools

    from ..nn.packed import pack, unpack_scalar

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def add_aligned(accs, res, xy, b):
        x, y = xy[0], xy[1]
        for k in _ACC_KEYS:
            ph, pw = res[k].shape[-2], res[k].shape[-1]
            cur = jax.lax.dynamic_slice(accs[k], (x, y), (ph, pw))
            accs[k] = jax.lax.dynamic_update_slice(
                accs[k], cur + res[k][b], (x, y)
            )
        return accs

    @functools.partial(
        jax.jit, donate_argnums=(0,), static_argnums=(3, 4, 5)
    )
    def add_misaligned(accs, res, xy, ox, oy, b):
        x, y = xy[0], xy[1]
        ff = f * f
        for k in _ACC_KEYS:
            php, pwf = res[k].shape[-2], res[k].shape[-1]
            p = php * f  # square patches: pwf == php * ff / f... unpack below
            m3 = unpack_scalar(res[k][b][None].reshape(1, php, pwf // ff, ff), f)
            canvas = jnp.zeros((1, p + f, (pwf // ff) * f + f), jnp.float32)
            canvas = jax.lax.dynamic_update_slice(canvas, m3, (0, ox, oy))
            repacked = pack(canvas[..., None], f).reshape(
                1, php + 1, (pwf // ff + 1) * ff
            )[0]
            ph2, pw2 = repacked.shape
            cur = jax.lax.dynamic_slice(accs[k], (x, y), (ph2, pw2))
            accs[k] = jax.lax.dynamic_update_slice(accs[k], cur + repacked, (x, y))
        return accs

    return add_aligned, add_misaligned


import functools


@functools.lru_cache(maxsize=None)
def _device_finalize_fn(f: int, h: int, w: int, acc_shape: Tuple[int, ...]):
    """Fused on-device finalize: unpack (when the accumulators live in the
    flat packed layout) + the reference's visit-count mean / sum-of-squares
    std math (run_eval.py:137-154, mirroring StitchAccumulators.finalize
    bit-for-bit including the count>1 divide-mask quirk). Keyed by layout so
    repeated regions of the same geometry reuse one executable."""
    from ..nn.packed import unpack_scalar

    @jax.jit
    def fin(accs):
        if f > 1:
            hcp, wcpf = acc_shape
            ff = f * f

            def unp(a):
                return unpack_scalar(a[None].reshape(1, hcp, wcpf // ff, ff), f)[
                    0, :h, :w
                ]

            a = {k: unp(v) for k, v in accs.items()}
            cnt_i = jnp.rint(a["count"]).astype(jnp.int32)
        else:
            a = accs
            cnt_i = a["count"].astype(jnp.int32)
        cnt = cnt_i.astype(jnp.float32)
        div = cnt_i > 1
        safe = jnp.where(div, cnt, 1.0)
        mean = jnp.where(div, a["dense_sum"] / safe, a["dense_sum"])
        var = jnp.where(
            div,
            (a["dense_sq"] - mean**2 * cnt) / jnp.maximum(cnt - 1.0, 1.0),
            0.0,
        )
        smean = jnp.where(div, a["scale_sum"] / safe, a["scale_sum"])
        svar = jnp.where(
            div,
            (a["scale_sq"] - smean**2 * cnt) / jnp.maximum(cnt - 1.0, 1.0),
            0.0,
        )
        return {
            "map": mean,
            "map_std": jnp.sqrt(jnp.maximum(var, 0.0)),
            "scale": smean,
            "scale_std": jnp.sqrt(jnp.maximum(svar, 0.0)),
            "count": cnt_i,
        }

    return fin


def _run_device_feed_pass(
    dataset,
    fwd,
    stacked,
    dev_accs,
    *,
    f_eval: int,
    packed_stitch: bool,
    add_aligned,
    add_misaligned,
    stitch_add,
    batch_size: int,
    timings,
    progress: bool,
    transport: str = "exact",
):
    """Run the sliding window from HBM-resident season mosaics.

    Returns (remaining_patch_indices, dev_accs): an empty list when every
    patch was visited on device; otherwise the indices (into
    dataset.patch_indices) that still need the host feed — seasons whose
    mosaics contain NaNs take the reference's per-patch healing path
    (PopulationDataset.py:418-441), which is host-side data repair.
    """
    import threading as _threading
    import time as _time

    from ..data.dataset import validity_mask
    from .device_feed import make_device_crop, season_arrays

    p = dataset.patchsize
    coords = np.asarray(dataset.patch_indices)
    order: list = []
    for s in coords[:, 2]:
        if int(s) not in order:
            order.append(int(s))
    by_season = {s: np.nonzero(coords[:, 2] == s)[0] for s in order}
    crop = make_device_crop(p)
    mask_dev = jax.device_put(validity_mask(p, p, dataset.overlap)[None])
    valid_dev = jnp.ones((1,), bool)
    s_add1 = None
    if not packed_stitch:
        s_add1 = stitch_add if batch_size == 1 else _make_stitch_add(1)

    holder: Dict = {}

    def _assemble(s):
        t0 = _time.perf_counter()
        holder[s] = season_arrays(dataset, s, transport=transport)
        holder[f"t{s}"] = _time.perf_counter() - t0

    bar = None
    if progress:
        from tqdm import tqdm

        bar = tqdm(total=len(coords), leave=False, desc="device-feed")

    # Three-stage season pipeline: host read/assemble (A), H2D upload (U),
    # device compute (C). Uploads always run on a dedicated worker — a
    # device_put is DMA/tunnel work that releases the GIL, so U(s)
    # overlaps both A(s+1) and the still-draining C(s-1) even on a 1-core
    # host. Assembly of the NEXT season additionally moves to its own
    # thread when a spare core exists (on a 1-core host the assembly
    # thread's numpy passes starve the dispatch thread — measured 2x
    # slowdown on BOTH sides — so there A(s+1) runs inline in the main
    # thread WHILE U(s) transfers, which is still fully overlapped).
    # timings keys: *_s are pipeline-stage spans wherever they ran;
    # feed_wait_s / upload_s count only MAIN-THREAD BLOCKED time, so
    # steady wall ~= warmup + feed_wait + upload + dispatch and the spans
    # show what the pipeline hid (read_span_s, upload_span_s).
    import os as _os
    from concurrent.futures import ThreadPoolExecutor as _TPE

    overlap = (_os.cpu_count() or 1) > 2

    def _upload(mos_host):
        t0 = _time.perf_counter()
        dev = jax.device_put(mos_host)
        jax.block_until_ready(dev)
        return dev, _time.perf_counter() - t0

    _assemble(order[0])
    accs = dev_accs
    remaining: list = []
    first_visit = True
    up_pool = _TPE(max_workers=1)
    try:
        for si, s in enumerate(order):
            if s not in holder:
                # pipeline bubble: this season's assembly did not finish
                # ahead of time (first season, or serial 1-core mode)
                _assemble(s)
            mos_host, nan_q = holder.pop(s)
            t_asm = holder.pop(f"t{s}")
            if timings is not None:
                timings["read_span_s"] = timings.get("read_span_s", 0.0) + t_asm
                if si == 0 or not overlap:
                    # time the main thread actually stood still for A(s);
                    # in threaded mode later seasons assemble off-thread
                    timings["feed_wait_s"] += t_asm
            season_idxs = [int(i) for i in by_season[s]]
            if nan_q:
                # tile-level hybrid: only patches whose window overlaps a
                # NaN tile need the reference's per-patch healing (host
                # feed); the rest still crop from the resident mosaics —
                # their windows provably hold no NaN. Filter BEFORE the
                # upload so a season with no clean patches never pays its
                # mosaic transfer (ADVICE r4 #4).
                from ..data.device_weaksup import _window_has_nan

                clean = []
                for idx in season_idxs:
                    x, y = (int(v) for v in coords[idx][:2])
                    if any(
                        _window_has_nan(q, x, y, p, p) for q in nan_q.values()
                    ):
                        remaining.append(idx)
                        if bar is not None:
                            bar.update(1)
                    else:
                        clean.append(idx)
                season_idxs = clean
            up_fut = (
                up_pool.submit(_upload, mos_host) if season_idxs else None
            )
            del mos_host
            th = None
            if si + 1 < len(order):
                if overlap:
                    th = _threading.Thread(
                        target=_assemble, args=(order[si + 1],)
                    )
                    th.start()
                else:
                    # 1-core: assemble the next season NOW — U(s) is in
                    # flight on the worker, so the link and the CPU work
                    # concurrently (and C(s-1) is still draining on device)
                    _assemble(order[si + 1])
            if up_fut is not None:
                t0 = _time.perf_counter()
                mos_dev, t_up = up_fut.result()
                if timings is not None:
                    # blocked = what the upload actually cost the pipeline;
                    # span = the transfer itself (overlapped with A(s+1))
                    timings["upload_s"] += _time.perf_counter() - t0
                    timings["upload_span_s"] = (
                        timings.get("upload_span_s", 0.0) + t_up
                    )
                t0 = _time.perf_counter()
                booked_warmup = first_visit
                for idx in season_idxs:
                    if first_visit:
                        t_fv = _time.perf_counter()
                    x, y = (int(v) for v in coords[idx][:2])
                    batch = crop(mos_dev, jnp.asarray((x, y), jnp.int32))
                    batch["mask"] = mask_dev
                    batch["valid"] = valid_dev
                    res = fwd(stacked, batch)
                    if packed_stitch:
                        ff = f_eval * f_eval
                        xy = jnp.asarray(
                            (x // f_eval, (y // f_eval) * ff), jnp.int32
                        )
                        if x % f_eval == 0 and y % f_eval == 0:
                            accs = add_aligned(accs, res, xy, 0)
                        else:
                            accs = add_misaligned(
                                accs, res, xy, x % f_eval, y % f_eval, 0
                            )
                    else:
                        accs = s_add1(accs, res, jnp.asarray([[x, y]], jnp.int32))
                    if first_visit:
                        # drain the first visit and book its WHOLE wall time
                        # (trace + executable load/compile — one-time, tens
                        # of seconds through a remote-compile tunnel — plus
                        # the first run) as timings['warmup_s'], so
                        # steady-state throughput is attributable
                        accs = dict(jax.block_until_ready(accs))
                        if timings is not None:
                            timings["warmup_s"] = _time.perf_counter() - t_fv
                        first_visit = False
                    if timings is not None:
                        timings["n_patches"] += 1
                        timings["n_device_patches"] = (
                            timings.get("n_device_patches", 0) + 1
                        )
                    if bar is not None:
                        bar.update(1)
                if timings is not None:
                    seg = _time.perf_counter() - t0
                    if booked_warmup:
                        seg -= timings.get("warmup_s", 0.0)
                    timings["dispatch_s"] += seg
            if th is not None:
                th.join()
    finally:
        up_pool.shutdown(wait=True)
        if bar is not None:
            bar.close()
    return sorted(remaining), accs


def run_sliding_inference(
    members: Sequence[Tree],
    consts: Tree,
    mcfg: ModelConfig,
    dataset: PopulationDataset,
    *,
    stats: Optional[NormStats] = None,
    batch_size: int = 1,
    mesh=None,
    progress: bool = False,
    device_stitch: str = "auto",
    device_feed: str = "auto",
    return_device: bool = False,
    num_workers: int = 1,
    timings: Optional[Dict[str, float]] = None,
    transport: str = "exact",
) -> Dict[str, np.ndarray]:
    """Full-region ensemble inference -> stitched mean/std maps.

    device_stitch: "auto" keeps the 5 country-scale accumulators in device
    HBM when they fit the budget (one transfer at the end instead of ~80 MB
    of per-patch result maps); "host"/"device" force the mode. Mesh-sharded
    runs always stitch on host (results are device-sharded).

    device_feed: "auto" uploads each season's mosaics to HBM once and runs
    the sliding window as on-device crops (infer/device_feed.py) whenever
    the run is single-process, the accumulators are device-resident and the
    mosaics are NaN-free; "on"/"off" force the mode. Per-patch host->device
    transfers (~48-64 MB each, the pipeline bottleneck on any host link
    slower than ~400 MB/s) disappear; patches whose data needs the
    reference's NaN-healing path fall back to the host feed automatically.
    The feed's batch dimension is 1 in this mode (there is no host
    round-trip to amortise).

    return_device: return the finalized maps as device arrays instead of
    numpy (callers that aggregate/adjust on device avoid fetching
    country-scale maps they never touch on host).

    timings: optional dict filled with the wall-clock split of the run —
    'feed_wait_s' (host blocked obtaining the next patch batch / season
    mosaic from the feed: raster reads + decompress + assembly),
    'upload_s' (host blocked in season-mosaic device_put, device-feed
    mode only), 'dispatch_s' (issuing the forward + stitch work; device
    compute is async behind it), 'finalize_s' (drain + fetch + mean/std
    math), 'total_s', 'n_patches' (valid patch visits). Used by bench.py's
    measured ``full_pipeline`` metric (VERDICT round 2, next #4).
    """
    stats = stats or NormStats()
    stacked = stack_ensemble(list(members))
    ne = ensemble_size(mesh)
    if ne > 1:
        stacked = pad_stacked_members(stacked, len(members), ne)
    if mesh is not None:
        # commit the member stack to its mesh sharding ONCE (otherwise the
        # jit resharding transfer repeats on every patch batch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..dist.mesh import device_put_global

        _sh = NamedSharding(mesh, P("ensemble") if ne > 1 else P())
        stacked = jax.tree.map(lambda a: device_put_global(a, _sh), stacked)
    h, w = dataset.shape()

    use_device = device_stitch == "device" or (
        device_stitch == "auto"
        and mesh is None
        and h * w * 4 * len(_ACC_KEYS) < _DEVICE_STITCH_BUDGET_BYTES
    )
    if mesh is not None:
        use_device = False

    # packed-space stitching: when the patch fold runs in the
    # space-to-depth layout AND the accumulators live on device, the maps
    # never leave packed space — the four per-patch unpack relayouts
    # (~10 ms at 2048^2) are replaced by one unpack at finalize
    from ..nn.packed import choose_pack_factor, unpack_scalar
    from ..nn.popcorn import select_engine

    p_sz = dataset.patchsize or 0
    # the wide-lane engine emits dense 3-D maps — the plain (f_eval=1)
    # stitch path applies; only the s2d-packed engine needs the flat-packed
    # device stitcher
    _engine = select_engine(mcfg, p_sz or 32, p_sz or 32) if p_sz else "plain"
    f_eval = (
        choose_pack_factor(p_sz, p_sz)
        if (
            _engine == "packed"
            and getattr(mcfg, "layout", "auto") != "plain"
            and mcfg.s1 and mcfg.s2 and p_sz
        )
        else 1
    )
    packed_stitch = use_device and f_eval > 1
    fwd = make_patch_forward(
        mcfg, consts, stats, len(members), mesh=mesh,
        packed_output=packed_stitch,
    )

    acc = StitchAccumulators((h, w))
    dev_accs = None
    stitch_add = None
    if use_device and not packed_stitch:
        dev_accs = {k: jnp.zeros((h, w), jnp.float32) for k in _ACC_KEYS}
        stitch_add = _make_stitch_add(batch_size)
    elif packed_stitch:
        f = f_eval
        hc = -(-h // f) * f + f  # +f slack for misaligned border re-packs
        wc = -(-w // f) * f + f
        dev_accs = {
            k: jnp.zeros((hc // f, (wc // f) * f * f), jnp.float32)
            for k in _ACC_KEYS
        }
        add_aligned, add_misaligned = _make_packed_stitch_adds(f)

    if timings is not None:
        import time as _time

        for k in ("feed_wait_s", "upload_s", "dispatch_s", "finalize_s", "total_s"):
            timings.setdefault(k, 0.0)
        timings.setdefault("n_patches", 0)
        _t_run0 = _time.perf_counter()

    # ---- device-resident mosaic feed (infer/device_feed.py) -----------------
    # Upload each season's mosaics to HBM once; the sliding window becomes
    # on-device dynamic_slice crops feeding the SAME prep/members
    # executables. Per-patch host->device transfers disappear entirely.
    remaining = None  # None -> every patch goes through the host feed
    dev_feed_on = device_feed == "on" or (
        device_feed == "auto"
        and mesh is None
        and use_device
        and dataset.mode == "test"
        and bool(dataset.patchsize)
    )
    if device_feed == "on" and (mesh is not None or not use_device):
        raise ValueError(
            "device_feed='on' requires a single-process run with "
            "device-resident stitch accumulators (mesh=None and the region "
            "under the device-stitch budget); use device_feed='auto'"
        )
    if dev_feed_on and mesh is None and use_device:
        remaining, dev_accs = _run_device_feed_pass(
            dataset, fwd, stacked, dev_accs,
            f_eval=f_eval, packed_stitch=packed_stitch,
            add_aligned=add_aligned if packed_stitch else None,
            add_misaligned=add_misaligned if packed_stitch else None,
            stitch_add=(stitch_add if (use_device and not packed_stitch) else None),
            batch_size=batch_size, timings=timings, progress=progress,
            transport=transport,
        )

    feed = InferenceFeed(
        dataset, batch_size=batch_size, prefetch=2, num_workers=num_workers,
        indices=remaining, transport=transport,
    )
    it = feed
    if progress and len(feed):
        from tqdm import tqdm

        it = tqdm(feed, total=len(feed), leave=False)

    if timings is not None:
        _fw_before_host = timings["feed_wait_s"]

        def _timed_feed(source):
            src = iter(source)
            while True:
                t0 = _time.perf_counter()
                try:
                    b = next(src)
                except StopIteration:
                    return
                timings["feed_wait_s"] += _time.perf_counter() - t0
                timings["n_patches"] += int(np.sum(b["valid"]))
                yield b

        it = _timed_feed(it)

    _DEV_KEYS = ("S2", "S1", "VIIRS", "building_counts", "mask", "valid")

    # The halo-validity mask is the SAME geometric array for every patch
    # (validity_mask(patchsize, patchsize, overlap), dataset.py:415; padded
    # batch rows carry a zero mask, but the fold multiplies by
    # valid=False for those rows anyway), so transfer it ONCE per shape
    # instead of ~16 MB with every batch.
    _mask_cache: Dict[Tuple, Any] = {}

    def _dev_mask(host_mask):
        key = (host_mask.shape, str(host_mask.dtype))
        m = _mask_cache.get(key)
        if m is None:
            m = jax.block_until_ready(
                jnp.broadcast_to(
                    jax.device_put(np.ascontiguousarray(host_mask[0])),
                    host_mask.shape,
                )
            )
            _mask_cache[key] = m
        return m

    def _put(batch):
        dev_batch = {k: batch[k] for k in _DEV_KEYS if k in batch}
        if mesh is None:
            # explicit bulk transfer (jit's implicit conversion is slow);
            # issued one batch AHEAD so the ~60-80 ms host->device DMA of a
            # 2048^2 patch overlaps the previous patch's compute instead of
            # serialising with it (measured on the axon tunnel)
            host_mask = dev_batch.pop("mask", None)
            dev_batch = jax.device_put(dev_batch)
            if host_mask is not None:
                dev_batch["mask"] = _dev_mask(host_mask)
        elif jax.process_count() > 1:
            # multihost: jit's implicit conversion can't commit host arrays
            # to a sharding that spans processes — every key is per-patch,
            # so all are batch-sharded (feeds are deterministic: each host
            # materializes the identical global batch)
            from ..dist.mesh import device_put_global

            bs = batch_sharding(mesh)
            dev_batch = {k: device_put_global(v, bs) for k, v in dev_batch.items()}
        return dev_batch

    def _lookahead(source):
        prev = None
        for b in source:
            nxt = (_put(b), b)
            if prev is not None:
                yield prev
            prev = nxt
        if prev is not None:
            yield prev

    if timings is not None:
        import time as _time

        _t_loop0 = _time.perf_counter()
    for dev_batch, batch in _lookahead(it):
        res = fwd(stacked, dev_batch)
        if packed_stitch:
            f = f_eval
            ff = f * f
            for b in range(len(batch["valid"])):
                if not batch["valid"][b]:
                    continue
                x, y = (int(v) for v in batch["img_coords"][b])
                xy = jnp.asarray((x // f, (y // f) * ff), jnp.int32)
                if x % f == 0 and y % f == 0:
                    dev_accs = add_aligned(dev_accs, res, xy, b)
                else:
                    dev_accs = add_misaligned(dev_accs, res, xy, x % f, y % f, b)
        elif use_device:
            # invalid (padding) rows are already zeroed by the valid mask,
            # so adding them at their (repeated) coords is a no-op
            xy = jnp.asarray(batch["img_coords"], jnp.int32)
            dev_accs = stitch_add(dev_accs, res, xy)
        else:
            # under a multihost mesh the patch-result shards span processes:
            # gather the global maps so every process stitches the full
            # accumulators (replicated stitch; ADVICE round 2)
            from ..dist.mesh import fetch_to_host

            res = fetch_to_host(res)
            for b in range(len(batch["valid"])):
                if not batch["valid"][b]:
                    continue
                x, y = (int(v) for v in batch["img_coords"][b])
                acc.add(x, y, res, b)
    if timings is not None:
        _t_fin0 = _time.perf_counter()
        timings["dispatch_s"] += (_t_fin0 - _t_loop0) - (
            timings["feed_wait_s"] - _fw_before_host
        )
    if use_device:
        # finalize ON DEVICE: one fused unpack + visit-count mean/std jit.
        # The country-scale accumulators (5 maps) are never fetched; the
        # host receives finished maps — or, with return_device, nothing at
        # all until a consumer (census agg / GeoTIFF write) asks.
        fin = _device_finalize_fn(
            f_eval if packed_stitch else 1, h, w,
            tuple(dev_accs["dense_sum"].shape),
        )
        dev_maps = fin(dev_accs)
        dev_maps = dict(jax.block_until_ready(dev_maps))
        out = dev_maps if return_device else {
            k: np.asarray(v) for k, v in dev_maps.items()
        }
    else:
        out = acc.finalize()
    if timings is not None:
        t1 = _time.perf_counter()
        timings["finalize_s"] += t1 - _t_fin0
        timings["total_s"] += t1 - _t_run0
    return out
