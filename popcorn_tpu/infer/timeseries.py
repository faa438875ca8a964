"""Built-up-probability time series from dated single frames.

Implements the *intended* behaviour of the reference's
time_series_inference_single_frame.py (which is bit-rotted: it imports a
missing utils.plot and calls nonexistent load_checkpoint(no_disc=True) /
unetmodel.sparse_forward — SURVEY.md §3.5): for each dated Sentinel-2
frame, pair it with the nearest-dated Sentinel-1 ascending and descending
frames, compute the frozen DDA built-up probability for each orbit, average
the two, and write ``BuiltUp_<date>.tif`` — monitoring construction or
destruction (e.g. conflict damage) over time.

Large frames are processed in overlap-stitched patches reusing the
sliding-window machinery.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.dataset import interpolate_nan, patch_grid, validity_mask
from ..data.normalize import NormStats, normalize_and_assemble
from ..io.geotiff import GeoTIFF, has_nan, write_geotiff
from ..nn.popcorn import create_building_score

Tree = Dict


@dataclasses.dataclass
class Frame:
    date: dt.date
    path: str


def parse_date(s: str) -> dt.date:
    for fmt in ("%Y-%m-%d", "%Y%m%d"):
        try:
            return dt.datetime.strptime(s, fmt).date()
        except ValueError:
            continue
    raise ValueError(f"unparseable date {s!r}")


def find_closest_frames(
    s2_frames: Sequence[Frame],
    s1_desc_frames: Sequence[Frame],
    s1_asc_frames: Sequence[Frame],
) -> List[Tuple[Frame, Optional[Frame], Optional[Frame]]]:
    """Pair each S2 frame with its nearest-dated S1 desc and asc frames
    (reference intent: time_series_inference_single_frame.py:104-148).
    A missing orbit pairs as None — the built-up score then uses the
    available orbit alone instead of the two-orbit average."""

    def closest(frames: Sequence[Frame], date: dt.date) -> Optional[Frame]:
        if not frames:
            return None
        return min(frames, key=lambda f: abs((f.date - date).days))

    pairs = [
        (s2, closest(s1_desc_frames, s2.date), closest(s1_asc_frames, s2.date))
        for s2 in s2_frames
    ]
    if any(d is None and a is None for _, d, a in pairs):
        raise ValueError("no S1 frames given (need s1_desc and/or s1_asc)")
    return pairs


def _read_frame(path: str, bands) -> np.ndarray:
    with GeoTIFF(path) as g:
        arr = g.read(bands)
    arr = np.transpose(arr, (1, 2, 0)).astype(np.float32)
    if has_nan(arr):
        arr = interpolate_nan(arr)
    return arr


def _make_score_fn(consts: Tree, mcfg: ModelConfig, stats: NormStats):
    @jax.jit
    def fn(s2, s1):
        inputs = {"S2": s2, "S1": s1}
        x = normalize_and_assemble(inputs, stats)
        dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else None
        # create_building_score returns a 3-D (B,H,W) scalar map
        return create_building_score(
            consts["builder"], x, s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir, dtype=dtype
        )

    return fn


def builtup_map(
    consts: Tree,
    mcfg: ModelConfig,
    s2: np.ndarray,
    s1: np.ndarray,
    *,
    stats: Optional[NormStats] = None,
    patchsize: int = 1024,
    overlap: int = 64,
    mesh=None,
    _score_fn=None,
) -> np.ndarray:
    """Built-up probability for one frame (HWC inputs), tiled if large.

    With ``mesh`` (a 1-D 'data' mesh), the whole frame runs in ONE
    spatially-partitioned jit call — rows sharded over the mesh, XLA halo
    exchange instead of overlap-stitched patches (infer/spatial.py)."""
    stats = stats or NormStats()
    if mesh is not None:
        from .spatial import spatial_builtup_map

        return spatial_builtup_map(
            consts, mcfg, s2, s1, mesh, stats=stats, _fn=_score_fn
        )
    fn = _score_fn or _make_score_fn(consts, mcfg, stats)
    h, w = s2.shape[:2]
    if h <= patchsize and w <= patchsize:
        out = fn(jnp.asarray(s2[None]), jnp.asarray(s1[None]))
        return np.asarray(out[0])

    grid = patch_grid((h, w), patchsize, overlap, fourseasons=False)
    acc = np.zeros((h, w), np.float32)
    cnt = np.zeros((h, w), np.float32)
    mask = validity_mask(patchsize, patchsize, overlap).astype(np.float32)
    for x, y, _ in grid:
        x, y = int(x), int(y)
        sl = (slice(x, x + patchsize), slice(y, y + patchsize))
        out = np.asarray(
            fn(jnp.asarray(s2[sl][None]), jnp.asarray(s1[sl][None]))
        )[0]
        acc[sl] += out * mask
        cnt[sl] += mask
    return np.where(cnt > 0, acc / np.maximum(cnt, 1), 0.0)


def run_builtup_timeseries(
    consts: Tree,
    mcfg: ModelConfig,
    pairs: Sequence[Tuple[Frame, Frame, Frame]],
    output_dir: str,
    *,
    stats: Optional[NormStats] = None,
    patchsize: int = 1024,
    overlap: int = 64,
    mesh=None,
) -> List[str]:
    """Produce BuiltUp_<date>.tif per (S2, S1desc, S1asc) triple, averaging
    the two orbits' probabilities (reference intent :340-372).

    ``mesh``: spatially partition each whole frame over the mesh's 'data'
    axis instead of patch-stitching (see builtup_map)."""
    os.makedirs(output_dir, exist_ok=True)
    stats = stats or NormStats()
    if mesh is not None:
        from .spatial import make_spatial_builtup

        fn = make_spatial_builtup(consts, mcfg, mesh, stats)
    else:
        fn = _make_score_fn(consts, mcfg, stats)
    s2_bands = (3, 2, 1, 4) if mcfg.nir else (3, 2, 1)
    written = []
    for s2f, descf, ascf in pairs:
        s2 = _read_frame(s2f.path, s2_bands)
        scores = []
        for s1f in (descf, ascf):
            if s1f is None:
                continue  # orbit absent: use the available one alone
            s1 = _read_frame(s1f.path, (1, 2))
            if s1.shape[:2] != s2.shape[:2]:
                raise ValueError(
                    f"S1 {s1f.path} and S2 {s2f.path} shapes differ"
                )
            scores.append(
                builtup_map(
                    consts, mcfg, s2, s1, stats=stats,
                    patchsize=patchsize, overlap=overlap, mesh=mesh,
                    _score_fn=fn,
                )
            )
        avg = sum(scores) / float(len(scores))
        out = os.path.join(output_dir, f"BuiltUp_{s2f.date.isoformat()}.tif")
        write_geotiff(out, avg, template=s2f.path)
        written.append(out)
    return written
