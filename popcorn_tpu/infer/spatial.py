"""Spatially-partitioned whole-frame inference (the 'sp' sharding axis).

The reference processes large frames as overlap-stitched patches on one
GPU (run_eval.py:71-203, time_series_inference_single_frame.py) — every
patch re-computes its overlap band and the stitch runs on the host. On a
TPU pod the idiomatic alternative for ONE huge frame is spatial
partitioning: shard the frame's row axis across the mesh's 'data' axis
and let XLA's SPMD partitioner insert the halo exchanges for every
conv / pool / transposed conv in the dual-stream UNet. One jit call then
computes the whole frame —

  * no overlap recomputation (halo exchange moves a few boundary rows
    over ICI instead of re-running the model on 2*overlap-wide bands);
  * no host stitching (the map materializes sharded in HBM);
  * per-device activation memory is 1/n of the frame, so frames n× larger
    than single-chip HBM fit.

Correctness is XLA's: spatial partitioning is semantics-preserving, so
the sharded map matches the single-device map to ULP (the partitioner
tiles each conv's reduction differently; asserted at rtol 1e-5 in
tests/test_spatial.py on the virtual CPU mesh). Scalar reductions
(popcount) additionally differ by psum reduction order.

It is also an ACCURACY feature at any chip count: the patch-stitched
path inherits the reference's halo-mask convention, which leaves the
frame's outer `overlap`-px ring with stitch count 0 and hard-zeroes it
(interior pixels match the exact whole-frame output to 3e-7 — measured
on-chip, PERF_NOTES.md round 3 cont. 2). The spatial path computes the
true model output in the border ring too.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..data.normalize import NormStats, normalize_and_assemble
from ..data.feed import TRANSPORT_KEYS
from ..dist.mesh import device_put_global, fetch_to_host
from ..io.geotiff import has_nan
from ..nn.popcorn import create_building_score, popcorn_forward

Tree = Dict


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape["data"]


def _spatial_cfg(mcfg: ModelConfig) -> ModelConfig:
    """Config variant safe under SPMD spatial partitioning.

    Pallas kernels are opaque custom calls with no sharding rule — SPMD
    would gather the whole frame onto every device — and the packed
    space-to-depth engine reshapes the sharded row axis (a resharding
    gather). layout='spatial' (select_engine) picks the WIDE engine when
    the frame divides (H%4, W%32 — spatial callers pad columns to 32):
    its W-only lane packing never touches the sharded H axis (wpool's
    row reduction is a local reshape-split by construction, nn/wide.py),
    so it partitions with the same local halo exchanges as plain NHWC
    while executing ~2.5x fewer lifted FLOPs and keeping every
    activation lane-dense — which is what lifts the single-chip
    whole-frame HBM ceiling (VERDICT r3 #3). Falls back to plain NHWC
    on non-dividing shapes.
    """
    return dataclasses.replace(
        mcfg,
        layout="spatial",
        fused_head=False,
        pallas_stream=False,
        pallas_packed_head=False,
        quantize=None,
    )


def _row_sharding(mesh: Mesh, rank: int) -> NamedSharding:
    """Shard a (B, H, ...) array's H axis over the mesh's 'data' axis."""
    spec = [None] * rank
    spec[1] = "data"
    return NamedSharding(mesh, P(*spec))


def _pad_frame(a: np.ndarray, mh: int, mw: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Edge-pad an HWC frame so H % mh == 0 and W % mw == 0.

    Edge replication keeps the padded band in-distribution for the UNet
    (zeros would bleed a false 'dark' border through the 3x3 convs); the
    pad is cropped off the output, so only the count must exclude it —
    callers sum the cropped map instead of trusting the model's popcount.
    """
    h, w = a.shape[:2]
    ph, pw = (-h) % mh, (-w) % mw
    if ph == 0 and pw == 0:
        return a, (0, 0)
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (a.ndim - 2)
    return np.pad(a, pad, mode="edge"), (ph, pw)


def make_spatial_builtup(
    consts: Tree,
    mcfg: ModelConfig,
    mesh: Mesh,
    stats: Optional[NormStats] = None,
):
    """Jitted built-up score over a row-sharded whole frame.

    Returns fn(s2, s1) -> (B,H,W) score map, inputs (B,H,W,C) with the H
    axis sharded over 'data'. The frozen builder UNet runs under XLA
    spatial partitioning; halo exchanges ride ICI.
    """
    stats = stats or NormStats()
    mcfg = _spatial_cfg(mcfg)
    sp4 = _row_sharding(mesh, 4)
    sp3 = _row_sharding(mesh, 3)
    dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else None

    def fn(s2, s1):
        x = normalize_and_assemble({"S2": s2, "S1": s1}, stats)
        return create_building_score(
            consts["builder"], x, s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir,
            dtype=dtype, layout="spatial",
        )

    return jax.jit(fn, in_shardings=(sp4, sp4), out_shardings=sp3)


def make_spatial_popcorn(
    params: Tree,
    consts: Tree,
    mcfg: ModelConfig,
    mesh: Mesh,
    stats: Optional[NormStats] = None,
):
    """Jitted POPCORN density forward over a row-sharded whole frame.

    Returns fn(params, s2, s1) -> (B,H,W) density map (row-sharded).
    Params replicate; XLA partitions every conv spatially and inserts the
    halo exchanges. The popcount is NOT returned — padded frames would
    count the pad band; callers sum the cropped map (spatial_density_map).
    """
    stats = stats or NormStats()
    mcfg = _spatial_cfg(mcfg)
    sp4 = _row_sharding(mesh, 4)
    sp3 = _row_sharding(mesh, 3)
    rep = NamedSharding(mesh, P())

    def fn(p, s2, s1):
        inputs = {"input": normalize_and_assemble({"S2": s2, "S1": s1}, stats)}
        out = popcorn_forward(
            p, consts, inputs, mcfg, train=False, padding=False, sparse=False
        )
        return out["popdensemap"]

    return jax.jit(fn, in_shardings=(rep, sp4, sp4), out_shardings=sp3)


def spatial_builtup_map(
    consts: Tree,
    mcfg: ModelConfig,
    s2: np.ndarray,
    s1: np.ndarray,
    mesh: Mesh,
    *,
    stats: Optional[NormStats] = None,
    _fn=None,
) -> np.ndarray:
    """Whole-frame built-up probability, spatially sharded. HWC inputs.

    Pads rows to a multiple of 4*n_data (each shard stays 4-divisible
    through the two maxpools), columns to a multiple of 32 (the wide
    engine's lane-block width), crops after.
    """
    nd = data_axis_size(mesh)
    fn = _fn or make_spatial_builtup(consts, mcfg, mesh, stats)
    h, w = s2.shape[:2]
    s2p, _ = _pad_frame(s2, 4 * nd, 32)
    s1p, _ = _pad_frame(s1, 4 * nd, 32)
    sp4 = _row_sharding(mesh, 4)
    # device_put_global / fetch_to_host: when the 'data' axis spans
    # processes (multihost pod), commit per-host shards and allgather the
    # result; single-process they are plain device_put / asarray.
    out = fn(
        device_put_global(s2p[None], sp4), device_put_global(s1p[None], sp4)
    )
    return fetch_to_host(out)[0, :h, :w]


_BUILDER_HALO = 64  # rows of true context per strip: > the builder's
# ~45 px receptive field incl. its reflect-14 pad (measured exact to
# 3e-7 — PERF_NOTES round 3 cont. 2, the same bound the patch stitch uses)
_CHUNK_MIN_H = 3072  # below this the whole-frame builder fits comfortably
_MEMBER_CHUNK_MIN_H = 5120  # above this the member fold also row-chunks
# (single device): measured member-wide temp is ~256 B/px, so a 6144^2
# whole-frame fold needs ~9.7 GB and 8192^2 would exceed HBM
_MEMBER_CHUNK_ROWS = 2048  # kept rows per member strip (6% halo recompute)


def chunked_building_score(
    consts: Tree,
    x: jnp.ndarray,
    mcfg: ModelConfig,
    dtype,
    rows_per_chunk: int = 512,
) -> jnp.ndarray:
    """Row-chunked building score for SINGLE-DEVICE whole frames.

    The builder cannot use the wide engine on member-padded frames (its
    forced reflect-14 pad breaks W%32), and its plain-engine convs
    materialise 128-lane relayout temporaries of the FULL frame —
    measured as the dominant term in the spatial fold's temp memory.
    Chunking bounds those temporaries to one strip of ``rows_per_chunk``
    (+2*_BUILDER_HALO) rows. Each strip window carries >=_BUILDER_HALO
    rows of true context, beyond the builder's receptive field, so kept
    rows equal the whole-frame computation to ~3e-7; at the true frame
    edges the window boundary IS the frame boundary, preserving the
    reference's reflect-pad semantics exactly (model/popcorn.py:279-322).

    Single-device only: under SPMD row sharding the fori_loop's dynamic
    row slices would gather across shards — sharded callers run the
    whole-frame builder (per-device rows are already 1/n).
    """
    b, H, W, C = x.shape
    # largest strip <= rows_per_chunk dividing H (H is a multiple of 4),
    # capped so the haloed window fits the frame
    S = min(rows_per_chunk, max(4, H - 2 * _BUILDER_HALO))
    while H % S:
        S -= 4
    n = H // S
    win_h = min(S + 2 * _BUILDER_HALO, H)

    def body(i, score):
        r0 = i * S
        start = jnp.clip(r0 - _BUILDER_HALO, 0, H - win_h)
        win = lax.dynamic_slice(x, (0, start, 0, 0), (b, win_h, W, C))
        s = create_building_score(
            consts["builder"], win, s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir,
            dtype=dtype, layout="spatial",
        )
        strip = lax.dynamic_slice(s, (0, r0 - start, 0), (b, S, W))
        return lax.dynamic_update_slice(score, strip, (0, r0, 0))

    return lax.fori_loop(0, n, body, jnp.zeros((b, H, W), jnp.float32))


def make_spatial_ensemble(
    mcfg: ModelConfig,
    consts: Tree,
    stats: NormStats,
    n_members: int,
    n_ensemble: int = 1,
    mesh: Optional[Mesh] = None,
):
    """Jitted whole-region ensemble fold for ONE season.

    fn(stacked_params, sample, acc) -> acc with this season's per-member
    density/scale sums and sums-of-squares added. ``sample`` holds
    (1,H,W,C) modality arrays (row-sharded by the caller); ``acc`` holds
    four (H,W) float32 maps. The builder score is computed once; members
    fold with lax.scan — the same member math as the patch fold
    (sliding.py::member_forward), just over the whole frame with no mask.

    n_ensemble > 1 (2-D ``(data, ensemble)`` mesh, requires ``mesh``):
    the member fold runs under ``jax.shard_map`` MANUAL over 'ensemble'
    (each shard lax.maps its local members, one index-masked partial sum,
    one psum) while 'data' stays AUTO — the conv rows keep their SPMD
    spatial partitioning inside the manual region. NOTE this is
    deliberately NOT the pure-SPMD formulation (member-sharded vmap):
    that lowers through an "involuntary full rematerialization" in XLA's
    partitioner and produced WRONG maps at ensemble=4 on the 8-device CPU
    mesh (maxdiff 0.16 with no padding in play) — the manual-ensemble
    shard_map is exact (tests/test_evaluator.py::
    test_spatial_inference_2d_mesh_matches_1d). Padded member slots
    (pad_stacked_members) are masked by global index; member summation
    order differs from the scan fold (allclose, not bit-equal).
    """
    mcfg_sp = _spatial_cfg(mcfg)
    mcfg_member = dataclasses.replace(mcfg_sp, sentinel_buildings=False)
    dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else None

    def member_maps(params, inputs):
        out = popcorn_forward(
            params, consts, inputs, mcfg_member,
            train=False, padding=False, sparse=False,
        )
        d = out["popdensemap"].astype(jnp.float32)
        scale = out["scale"]
        sc = d * 0.0 if scale is None else scale.astype(jnp.float32)
        return d, sc

    def local_fold(stacked_local, x, score):
        """One 'ensemble' shard: fold its local members, mask padded
        slots by GLOBAL index, psum the four partial sums."""
        inputs = {"input": x, "building_counts": score}
        d_loc, s_loc = jax.lax.map(
            lambda p: member_maps(p, inputs), stacked_local
        )
        m_local = d_loc.shape[0]
        idx = jax.lax.axis_index("ensemble") * m_local + jnp.arange(m_local)
        v = (idx < n_members).astype(jnp.float32)[:, None, None, None]
        d_loc = d_loc * v
        s_loc = s_loc * v
        sums = (
            d_loc.sum(0),
            (d_loc * d_loc).sum(0),
            s_loc.sum(0),
            (s_loc * s_loc).sum(0),
        )
        return tuple(jax.lax.psum(t, "ensemble") for t in sums)

    if n_ensemble > 1:
        if mesh is None:
            raise ValueError("n_ensemble > 1 requires the mesh")
        ens_fold = jax.shard_map(
            local_fold, mesh=mesh,
            in_specs=(P("ensemble"), P(), P()),
            out_specs=P(),
            axis_names={"ensemble"},
            check_vma=False,
        )

    def _member_scan(stacked_params, x, score):
        inputs = {"input": x, "building_counts": score}
        zeros = jnp.zeros(x.shape[:3], jnp.float32)

        def body(carry, params):
            d, sc = member_maps(params, inputs)
            ds, dsq, ss, ssq = carry
            return (ds + d, dsq + d * d, ss + sc, ssq + sc * sc), None

        sums, _ = jax.lax.scan(
            body, (zeros, zeros, zeros, zeros), stacked_params
        )
        return sums

    _ACC4 = ("dense_sum", "dense_sq", "scale_sum", "scale_sq")

    def _strip_fold(stacked_params, x, score, acc):
        """Single-device big frames: the member scan runs per row strip
        (kept rows + 2*_BUILDER_HALO of true context — the same
        halo-exactness bound as the builder chunking and the patch
        stitch), so per-strip temporaries replace whole-frame ones.
        Measured member-fold temp is ~256 B/px; whole-frame 8192^2 would
        need ~17 GB where strips need ~5."""
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        S = min(_MEMBER_CHUNK_ROWS, max(4, h - 2 * _BUILDER_HALO))
        while h % S:
            S -= 4
        win_h = min(S + 2 * _BUILDER_HALO, h)
        n = h // S

        def strip(i, acc4):
            r0 = i * S
            start = jnp.clip(r0 - _BUILDER_HALO, 0, h - win_h)
            xw = lax.dynamic_slice(
                x, (0, start, 0, 0), (b, win_h, w, x.shape[3])
            )
            sw = lax.dynamic_slice(score, (0, start, 0), (b, win_h, w))
            sums = _member_scan(stacked_params, xw, sw)
            off = r0 - start
            out = []
            for a, sarr in zip(acc4, sums):
                kept = lax.dynamic_slice(sarr[0], (off, 0), (S, w))
                cur = lax.dynamic_slice(a, (r0, 0), (S, w))
                out.append(lax.dynamic_update_slice(a, cur + kept, (r0, 0)))
            return tuple(out)

        acc4 = lax.fori_loop(0, n, strip, tuple(acc[k] for k in _ACC4))
        return dict(zip(_ACC4, acc4))

    def fn(stacked_params, sample, acc):
        s = {}
        if mcfg.s2 and "S2" in sample:
            s["S2"] = sample["S2"].astype(jnp.float32)
        if mcfg.s1 and "S1" in sample:
            s["S1"] = sample["S1"]
        if mcfg.viirs and "VIIRS" in sample:
            s["VIIRS"] = sample["VIIRS"]
        x = normalize_and_assemble(s, stats)
        single_dev = mesh is None or mesh.shape.get("data", 1) == 1
        if mcfg.sentinel_buildings or not mcfg.occupancy_model:
            # single-device big frames: row-chunk the builder so its
            # plain-engine relayout temporaries stay strip-sized (the
            # measured HBM ceiling term: 13.8 GB whole-frame at 4608^2,
            # compile failure at 6144^2); sharded meshes keep the
            # whole-frame call (per-device rows are already 1/n and the
            # chunk loop's row slices would gather across shards)
            if single_dev and x.shape[1] >= _CHUNK_MIN_H:
                score = chunked_building_score(consts, x, mcfg_sp, dtype)
            else:
                score = create_building_score(
                    consts["builder"], x, s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir,
                    dtype=dtype, layout="spatial",
                )
        else:
            score = sample["building_counts"]
            if score.ndim == 4:
                score = score[..., 0]

        if n_ensemble > 1:
            ds, dsq, ss, ssq = ens_fold(stacked_params, x, score)
        elif single_dev and x.shape[1] >= _MEMBER_CHUNK_MIN_H:
            return _strip_fold(stacked_params, x, score, acc)
        else:
            ds, dsq, ss, ssq = _member_scan(stacked_params, x, score)
        return {
            "dense_sum": acc["dense_sum"] + ds[0],
            "dense_sq": acc["dense_sq"] + dsq[0],
            "scale_sum": acc["scale_sum"] + ss[0],
            "scale_sq": acc["scale_sq"] + ssq[0],
        }

    return jax.jit(fn, donate_argnums=(2,))


def run_spatial_inference(
    members,
    consts: Tree,
    mcfg: ModelConfig,
    dataset,
    *,
    stats: Optional[NormStats] = None,
    mesh: Mesh,
    progress: bool = False,
    transport: str = "exact",
) -> Dict[str, np.ndarray]:
    """Whole-region ensemble inference, spatially partitioned — the
    stitch-free counterpart of sliding.run_sliding_inference.

    Each season's full mosaics upload once (rows sharded over 'data');
    every member runs over the entire region in one sharded forward (XLA
    halo exchange instead of overlap recompute), and the mean/std maps
    finalize from exact per-pixel member*season statistics. Differences
    vs the patch path, both by construction: the frame's outer overlap
    ring holds true model output (the stitched path zeroes it — reference
    convention), and NaN-bearing mosaics are healed whole-frame rather
    than per patch window.

    Returns the same dict as the stitched path: map, map_std, scale,
    scale_std, count (numpy, full resolution, cropped to the region).
    """
    from ..data.dataset import interpolate_nan
    from ..dist.mesh import ensemble_size
    from .device_feed import season_arrays
    from .sliding import pad_stacked_members, stack_ensemble

    stats = stats or NormStats()
    nd = data_axis_size(mesh)
    ne = ensemble_size(mesh)
    h, w = dataset.shape()
    rep = NamedSharding(mesh, P())
    sp4 = _row_sharding(mesh, 4)
    row2 = NamedSharding(mesh, P("data", None))

    stacked = stack_ensemble(list(members))
    if ne > 1:
        # 2-D (data, ensemble) mesh: member axis shards over 'ensemble',
        # every member runs concurrently over its devices' row shards
        stacked = pad_stacked_members(stacked, len(members), ne)
        mem_sh = NamedSharding(mesh, P("ensemble"))
        stacked = jax.tree.map(
            lambda a: device_put_global(a, mem_sh), stacked
        )
    else:
        stacked = jax.tree.map(
            lambda a: device_put_global(a, rep), stacked
        )
    fold = make_spatial_ensemble(
        mcfg, consts, stats, len(members), n_ensemble=ne, mesh=mesh
    )

    hp = h + ((-h) % (4 * nd))
    wp = w + ((-w) % 32)
    acc = {
        k: jax.device_put(jnp.zeros((hp, wp), jnp.float32), row2)
        for k in ("dense_sum", "dense_sq", "scale_sum", "scale_sq")
    }

    seasons = range(4) if dataset.fourseasons else (0,)
    n_seasons = 0
    for si in seasons:
        mosaics, _nan_q = season_arrays(dataset, si)
        sample = {}
        for k, arr in mosaics.items():
            a = np.transpose(arr, (1, 2, 0))  # CHW -> HWC
            if a.dtype.kind == "f" and has_nan(a):
                # whole-frame healing (the patch path heals per window;
                # identical wherever a window holds the NaN's full
                # interpolation neighbourhood)
                a = interpolate_nan(np.ascontiguousarray(a, np.float32))
            a, _ = _pad_frame(a, 4 * nd, 32)
            if transport == "bf16" and k in TRANSPORT_KEYS and a.dtype == np.float32:
                # transport rule (data/feed.py::transport_cast), applied
                # AFTER healing — interpolate_nan runs in float32
                import ml_dtypes

                a = a.astype(ml_dtypes.bfloat16)
            sample[k] = device_put_global(a[None], sp4)
        acc = fold(stacked, sample, acc)
        n_seasons += 1
        if progress:
            print(f"spatial season {si}: folded {len(members)} members")

    maps = {k: fetch_to_host(v)[:h, :w] for k, v in acc.items()}
    cnt = len(members) * n_seasons
    if cnt > 1:
        mean = maps["dense_sum"] / cnt
        var = (maps["dense_sq"] - mean**2 * cnt) / (cnt - 1.0)
        smean = maps["scale_sum"] / cnt
        svar = (maps["scale_sq"] - smean**2 * cnt) / (cnt - 1.0)
    else:
        mean, smean = maps["dense_sum"], maps["scale_sum"]
        var = svar = np.zeros_like(mean)
    return {
        "map": mean.astype(np.float32),
        "map_std": np.sqrt(np.maximum(var, 0.0), dtype=np.float32),
        "scale": smean.astype(np.float32),
        "scale_std": np.sqrt(np.maximum(svar, 0.0), dtype=np.float32),
        "count": np.full((h, w), cnt, np.int32),
    }


def spatial_density_map(
    params: Tree,
    consts: Tree,
    mcfg: ModelConfig,
    s2: np.ndarray,
    s1: np.ndarray,
    mesh: Mesh,
    *,
    stats: Optional[NormStats] = None,
    _fn=None,
) -> Tuple[np.ndarray, float]:
    """Whole-frame POPCORN density map + total count, spatially sharded.

    HWC inputs; returns (H,W) float32 map cropped to the input extent and
    its sum (the popcount over the true frame, excluding the pad band).
    """
    nd = data_axis_size(mesh)
    fn = _fn or make_spatial_popcorn(params, consts, mcfg, mesh, stats)
    h, w = s2.shape[:2]
    s2p, _ = _pad_frame(s2, 4 * nd, 32)
    s1p, _ = _pad_frame(s1, 4 * nd, 32)
    sp4 = _row_sharding(mesh, 4)
    rep = NamedSharding(mesh, P())
    out = fn(
        jax.tree.map(lambda a: device_put_global(a, rep), params),
        device_put_global(s2p[None], sp4),
        device_put_global(s1p[None], sp4),
    )
    m = fetch_to_host(out)[0, :h, :w].astype(np.float32)
    return m, float(m.sum())
