"""Census-level aggregation and dasymmetric adjustment, TPU-native.

The reference aggregates a country-scale prediction map to census regions
with a per-region Python loop over bbox crops and boolean masks
(data/PopulationDataset.py:675-820) and adjusts the map region-by-region
(:823-852). Here both become single vectorised passes:

  * region IDs in the boundary raster are remapped to a compact [0..K)
    range on the host (np.searchsorted over the sorted census ids, with a
    dump bucket K for non-census pixels);
  * aggregation is one ``jax.ops.segment_sum`` over row-chunks of the
    raster, executed on device — the TPU equivalent of the reference's
    gpu_mode (:696-712);
  * adjustment is a per-pixel gather of the per-region scale followed by
    one multiply (:844-850).

Equivalence to the reference loop is covered by the census-aggregation
tests in tests/test_data_pipeline.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np
import pandas as pd


@functools.lru_cache(maxsize=None)
def _segment_sum_fn(num_segments: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(values, seg_ids):
        return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments)

    return f


def compact_ids(boundary: np.ndarray, census_idx: np.ndarray) -> Tuple[np.ndarray, int]:
    """Map float region-ID raster values to compact int32 [0..K], where K
    (the last bucket) collects pixels whose ID is not in the census."""
    sorted_idx = np.sort(census_idx.astype(np.float64))
    k = len(sorted_idx)
    b = boundary.astype(np.float64)
    pos = np.searchsorted(sorted_idx, b)
    pos = np.clip(pos, 0, k - 1)
    hit = sorted_idx[pos] == b
    comp = np.where(hit, pos, k).astype(np.int32)
    order = np.argsort(census_idx.astype(np.float64), kind="stable")
    return comp, k, order


def region_sums(
    pred: np.ndarray,
    boundary: np.ndarray,
    census_idx: np.ndarray,
    *,
    chunk_rows: int = 2048,
) -> np.ndarray:
    """Sum `pred` over each census region: one device segment-sum pass.

    Returns sums aligned with ``census_idx`` order.
    """
    import jax.numpy as jnp

    comp, k, order = compact_ids(boundary, census_idx)
    f = _segment_sum_fn(k + 1)
    total = np.zeros(k + 1, np.float64)
    h = pred.shape[0]
    for r0 in range(0, h, chunk_rows):
        r1 = min(h, r0 + chunk_rows)
        vals = jnp.asarray(pred[r0:r1].reshape(-1), jnp.float32)
        segs = jnp.asarray(comp[r0:r1].reshape(-1))
        total += np.asarray(f(vals, segs), np.float64)
    sums_sorted = total[:k]
    # un-sort back to census row order
    out = np.empty(k, np.float64)
    out[order] = sums_sorted
    return out.astype(np.float32)


def convert_popmap_to_census(
    pred: np.ndarray,
    boundary: np.ndarray,
    census: pd.DataFrame,
    *,
    chunk_rows: int = 2048,
) -> Tuple[np.ndarray, np.ndarray]:
    """Aggregate a prediction map to census counts
    (reference: PopulationDataset.py:675-729).

    Rows with a null bbox are excluded, matching the reference's -1
    initialise-and-filter semantics (:705-729).
    """
    valid = ~census["bbox"].isna().to_numpy()
    sums = region_sums(
        pred, boundary, census["idx"].to_numpy(), chunk_rows=chunk_rows
    )
    census_pred = sums[valid]
    census_gt = census["POP20"].to_numpy(np.float32)[valid]
    return census_pred.astype(np.float32), census_gt


def adjust_map_to_census(
    pred: np.ndarray,
    boundary: np.ndarray,
    census: pd.DataFrame,
    *,
    chunk_rows: int = 2048,
) -> np.ndarray:
    """Dasymmetric adjustment: rescale each region so its total matches the
    census count (reference: PopulationDataset.py:823-852). Regions whose
    predicted total is 0 (and non-census pixels) are left unchanged."""
    idx = census["idx"].to_numpy()
    valid = ~census["bbox"].isna().to_numpy()
    sums = region_sums(pred, boundary, idx, chunk_rows=chunk_rows)
    pop = census["POP20"].to_numpy(np.float64)
    scale = np.ones(len(idx) + 1, np.float32)
    nz = (sums > 0) & valid
    scale[: len(idx)][nz] = (pop[nz] / sums[nz]).astype(np.float32)

    comp, k, order = compact_ids(boundary, idx)
    # scale is in census-row order; comp indexes sorted order -> reorder
    scale_sorted = np.ones(k + 1, np.float32)
    scale_sorted[:k] = scale[:k][order]
    out = pred.astype(np.float32) * scale_sorted[comp]
    return out


class DeviceCensus:
    """Census aggregation against a DEVICE-resident prediction map.

    The host path (region_sums above) re-uploads the country map chunk by
    chunk and runs several full-raster numpy passes; when the map already
    lives in HBM (run_sliding_inference(..., return_device=True)), that is
    wasted link traffic and single-core host time. This class uploads the
    compact per-pixel region index ONCE (uint16 when it fits — a country
    rarely has >65k census regions) and then every aggregation is one
    device segment-sum and every dasymmetric adjustment one gather+multiply
    (reference semantics: PopulationDataset.py:675-729, 823-852).

    Accumulation differs from the host path only in summation order/width
    (device f32 segment-sum vs host chunked float64) — immaterial for the
    census metrics, and the ADJ map agrees to f32 roundoff.
    """

    def __init__(self, boundary: np.ndarray, census: pd.DataFrame):
        import jax
        import jax.numpy as jnp

        idx = census["idx"].to_numpy()
        comp, k, order = compact_ids(boundary, idx)
        self.k = k
        self.order = order
        self.valid = ~census["bbox"].isna().to_numpy()
        self.pop = census["POP20"].to_numpy(np.float64)
        dt = np.uint16 if k + 1 < 65536 else np.int32
        self._comp_dev = jax.device_put(comp.astype(dt))
        self._seg = _segment_sum_fn(k + 1)

        @jax.jit
        def _adjust(pred, comp_d, scale_sorted):
            return pred * scale_sorted[comp_d.astype(jnp.int32)]

        self._adjust = _adjust

    def sums(self, pred) -> np.ndarray:
        """Per-region sums of a device map, in census row order."""
        import jax.numpy as jnp

        total = np.asarray(
            self._seg(
                jnp.reshape(pred, (-1,)),
                jnp.reshape(self._comp_dev, (-1,)).astype(jnp.int32),
            ),
            np.float64,
        )
        out = np.empty(self.k, np.float64)
        out[self.order] = total[: self.k]
        return out.astype(np.float32)

    def convert(self, pred) -> Tuple[np.ndarray, np.ndarray]:
        """Device counterpart of convert_popmap_to_census."""
        sums = self.sums(pred)
        return (
            sums[self.valid].astype(np.float32),
            self.pop.astype(np.float32)[self.valid],
        )

    def adjust(self, pred):
        """Device counterpart of adjust_map_to_census; returns a DEVICE map."""
        import jax

        sums = self.sums(pred)
        scale = np.ones(self.k + 1, np.float32)
        nz = (sums > 0) & self.valid
        scale[: self.k][nz] = (self.pop[nz] / sums[nz]).astype(np.float32)
        # scale is in census-row order; comp indexes sorted-id order
        scale_sorted = np.ones(self.k + 1, np.float32)
        scale_sorted[: self.k] = scale[: self.k][self.order]
        return self._adjust(pred, self._comp_dev, jax.device_put(scale_sorted))


def detail_maps(
    pred: np.ndarray,
    boundary: np.ndarray,
    census: pd.DataFrame,
) -> Dict[str, np.ndarray]:
    """Per-region diagnostic maps (reference: PopulationDataset.py:731-814):
    predicted/gt densities and totals, residuals, per-pixel-relative
    residuals — painted back onto the raster via one gather each."""
    idx = census["idx"].to_numpy()
    valid = ~census["bbox"].isna().to_numpy()
    sums = region_sums(pred, boundary, idx)
    pop = census["POP20"].to_numpy(np.float64)
    cnt = np.maximum(census["count"].to_numpy(np.float64), 1)

    comp, k, order = compact_ids(boundary, idx)

    def paint(per_region: np.ndarray) -> np.ndarray:
        lut = np.zeros(k + 1, np.float32)
        lut[:k] = per_region.astype(np.float32)[order]
        return lut[comp]

    res_rel = (sums - pop) / cnt
    res_rel[~np.isfinite(res_rel)] = 0
    return {
        "densities": paint(sums / cnt),
        "totals": paint(sums),
        "densities_gt": paint(pop / cnt),
        "totals_gt": paint(pop),
        "residuals": paint(sums - pop),
        "residuals_rel": paint(res_rel),
    }
