"""Device-resident weakly-supervised training feed.

The host training feed (data/feed.py::WeaksupFeed, mirroring the
reference's ConcatDataset + DataLoader stack, run_train.py:423-431) crops
every census-region sample from the season mosaics on the host and ships
it to the device — tens of MB per step, every step, every epoch; the
same pixels are re-read and re-sent whenever a region is revisited.

TPU-first alternative (the training twin of infer/device_feed.py): the
season mosaics and the admin-boundary raster are uploaded to HBM ONCE,
and each batch is assembled on device — a vmapped ``lax.dynamic_slice``
per sample, beyond-crop masking with iota compares, and the reference's
geometric augmentations (flips + k*90 rotations, utils/transform.py) as
``lax.rev``/transpose on device. Steady-state training then moves ZERO
image bytes between host and device; the host streams only coordinates.

Bit-parity: item order, rng streams (per-item season/orbit draws and
per-batch augmentation draws) and bucket grouping reuse the host feed's
code paths verbatim (WeaksupFeed hooks); the assembled batches are
pinned equal to the host feed's in tests/test_device_weaksup.py.

Multi-region training (``-tregtrain reg1 reg2 ...``) concatenates the
regions' mosaics row-wise into one resident stack — the per-item
validity mask makes inter-region padding unnecessary (see __init__).

Ascending-orbit augmentation (``-ascAug``) keeps BOTH S1 orbit stacks
resident (leading dim interleaves season and orbit); the per-item orbit
draw selects the slice on device.

NaN-bearing mosaics run HYBRID: a tile-level summed-area table answers
"does this window overlap NaN data" in O(1); such items take the
reference's host healing path (interpolate / ascending refetch,
PopulationDataset.py:418-441) and are spliced into the assembled device
batch, everything else stays device-resident — still bit-equal to the
host feed.

Eligibility: same modality config across regions and the resident stack
must fit ``hbm_budget_bytes`` (capped by actually-free device memory).
Construction raises ``Ineligible`` otherwise; the trainer falls back to
the host feed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .dataset import PopulationDataset
from .feed import TRANSPORT_KEYS, WeaksupFeed, bucket_dim
from ..aug.augment import draw_general, draw_photometric
from ..io.geotiff import has_nan, nan_tile_any


class Ineligible(Exception):
    """This dataset cannot be served from device-resident mosaics."""


def _is_raw_u16_source(src) -> bool:
    """True when a _RasterSource can serve raw uint16 windows (uint16
    GeoTIFF or its pre-decoded sidecar, not in-memory) — mirrors
    infer/device_feed.py::_read_raw_u16's eligibility without reading
    any pixels."""
    from ..io.geotiff import GeoTIFF

    g = getattr(src, "_g", None)
    return (
        getattr(src, "_mem", None) is None
        and np.dtype(getattr(src, "dtype", np.float32)) == np.uint16
        and (getattr(src, "_cache", None) is not None or isinstance(g, GeoTIFF))
    )


def _effective_budget(hbm_budget_bytes: float) -> float:
    """The paper budget capped by what the default device actually has
    free: 60% of (bytes_limit - bytes_in_use) when the backend reports
    memory stats (TPUs do; CPU returns None), leaving headroom for
    params, optimizer state, activations and the stitch accumulators."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    limit = stats.get("bytes_limit")
    if limit:
        free = limit - stats.get("bytes_in_use", 0)
        return min(hbm_budget_bytes, 0.6 * free)
    return hbm_budget_bytes


def _season_chw(
    ds: PopulationDataset, modality: str, season_idx: int, asc: bool = False
):
    """One season's mosaic as (C, H, W) in transport dtype, or raises
    Ineligible on NaNs."""
    from ..infer.device_feed import _read_raw_u16

    h, w = ds.cr_shape
    window = ((0, h), (0, w))
    src = ds._source(modality, season_idx, asc)
    if modality == "S2":
        bands = (3, 2, 1, 4) if ds.nir else (3, 2, 1)
        arr = _read_raw_u16(src, bands, window)
        if arr is not None:
            return arr
        arr = src.read(bands, window)
    else:  # S1
        arr = src.read((1, 2), window)
    if modality == "S2" and not has_nan(arr):
        # same lossless-uint16 transport rule as the host feed
        # (data/feed.py) and infer/device_feed.py::season_arrays — keeps
        # the dtype parity contract and halves the resident S2 bytes.
        # NaN-bearing mosaics stay float32; items whose windows touch the
        # NaNs take the host healing path (_fetch_item).
        u16 = arr.astype(np.uint16)
        if np.array_equal(u16, arr):
            return np.ascontiguousarray(u16)
    return np.ascontiguousarray(arr, np.float32)


_NAN_TILE = 32  # granularity of the window-has-NaN query (conservative)


def _integral_of_tiles(t: np.ndarray) -> np.ndarray:
    """Summed-area table of a 2-D tile-level bool grid: O(1) conservative
    "does this window overlap any True tile" queries."""
    th, tw = t.shape
    integ = np.zeros((th + 1, tw + 1), np.int32)
    integ[1:, 1:] = np.cumsum(np.cumsum(t, 0), 1)
    return integ


def _tile_integral(mask: np.ndarray, tile: int = _NAN_TILE) -> np.ndarray:
    """Summed-area table over ``tile``-sized blocks of a 2-D bool mask:
    O(1) conservative "does this window overlap any True pixel" queries
    at 1/tile^2 the memory of a pixel-level integral image."""
    h, w = mask.shape
    th, tw = -(-h // tile), -(-w // tile)
    pad = np.zeros((th * tile, tw * tile), bool)
    pad[:h, :w] = mask
    return _integral_of_tiles(pad.reshape(th, tile, tw, tile).any(axis=(1, 3)))


def _nan_tile_integral(arr: np.ndarray, tile: int = _NAN_TILE):
    """NaN-query table for a (C, H, W) float mosaic, or None when clean.

    Same table ``_tile_integral(isnan(arr).any(axis=0))`` builds, but the
    NaN scan runs as one native streaming pass (io/geotiff.py::
    nan_tile_any) with no full-size bool temporaries — ~5x faster at
    country-season size and no allocation spike on a loaded host."""
    t = nan_tile_any(arr, tile)
    return _integral_of_tiles(t) if t.any() else None


def _window_has_nan(
    integ: np.ndarray, x0: int, y0: int, dx: int, dy: int,
    tile: int = _NAN_TILE,
) -> bool:
    t0, u0 = x0 // tile, y0 // tile
    t1 = min((x0 + dx - 1) // tile + 1, integ.shape[0] - 1)
    u1 = min((y0 + dy - 1) // tile + 1, integ.shape[1] - 1)
    s = integ[t1, u1] - integ[t0, u1] - integ[t1, u0] + integ[t0, u0]
    return bool(s)


def resident_layout(datasets, ladder, transport: str) -> Dict:
    """Shapes, dtypes and byte costs of the concatenated resident stack —
    pure metadata (census tables + raster headers, NO pixel IO), shared by
    :class:`DeviceWeaksupFeed` and the trainer's feed cost gate
    (data/feed_select.py), which must estimate the rotating feed's
    per-epoch upload bytes BEFORE paying the construction's full-stack
    host read. Raises :class:`Ineligible` for configs the device feed
    cannot serve (non-weaksup datasets, mismatched modality configs)."""
    from .dataset import max_census_window

    dss = list(datasets)
    if any(d.mode != "weaksup" for d in dss):
        raise Ineligible("weaksup datasets only")
    d0 = dss[0]
    for d in dss[1:]:
        if (
            (d.s2, d.s1, d.nir, d.viirs, d.fourseasons, d.asc_aug)
            != (d0.s2, d0.s1, d0.nir, d0.viirs, d0.fourseasons, d0.asc_aug)
            or (d._gb_counts is None) != (d0._gb_counts is None)
            or (d._gb_seg is None) != (d0._gb_seg is None)
        ):
            raise Ineligible("training regions differ in modality config")

    # Multi-region layout: regions concatenate ROW-WISE with no gap —
    # a crop's beyond-(dx,dy) pixels are replaced by the validity mask
    # regardless of what the slice read, so slices that run past a
    # region's rows (into the next region) or columns (into the width
    # pad of a narrower region) cannot contaminate the sample. The
    # only hard requirement is that dynamic_slice never CLAMPS its
    # start, so a single global tail/right pad of the largest bucket
    # any census table can request suffices.
    wins = [max_census_window(d) for d in dss]
    ph = bucket_dim(max(x for x, _ in wins), ladder)
    pw = bucket_dim(max(y for _, y in wins), ladder)
    offs: List[int] = []
    rows = 0
    for d in dss:
        offs.append(rows)
        rows += d.cr_shape[0]
    width = max(d.cr_shape[1] for d in dss)
    hp, wp = rows + ph, width + pw

    seasons = list(range(4)) if d0.fourseasons else [0]
    # float image modalities resident dtype under the transport rule:
    # bf16 halves their budget cost (and the upload), see feed.py
    if transport == "bf16":
        import ml_dtypes

        fdt = np.dtype(ml_dtypes.bfloat16)
    else:
        fdt = np.dtype(np.float32)
    planes: Dict[str, Tuple[np.dtype, int]] = {}
    if d0.s2:
        # costed as the float transport dtype unless every season of
        # every region is raw-uint16-readable: the lossless-u16
        # fallback conversion may still land on u16, but budgeting
        # must never undercount
        s2_u16 = all(
            _is_raw_u16_source(d._source("S2", s, False))
            for d in dss for s in seasons
        )
        planes["S2"] = (
            np.uint16 if s2_u16 else fdt,
            len(seasons) * (4 if d0.nir else 3),
        )
    n_orb = 2 if d0.asc_aug else 1  # -ascAug: both orbit stacks resident
    if d0.s1:
        planes["S1"] = (fdt, len(seasons) * n_orb * 2)
    if d0.viirs:
        planes["VIIRS"] = (fdt, 1)
    if d0._gb_counts is not None:
        planes["building_counts"] = (np.float32, 1)
    if d0._gb_seg is not None:
        planes["building_segmentation"] = (np.float32, 1)
    need_full = hp * wp * 4  # boundary
    need_active = hp * wp * 4
    slice_bytes = 0  # one season's swappable S2/S1 slice bytes
    for k, (dt, nchan) in planes.items():
        need_full += hp * wp * nchan * np.dtype(dt).itemsize
        per = nchan
        if k in ("S2", "S1"):
            per = nchan // len(seasons)
            # only the seasonal slices swap; statics (VIIRS/counts/
            # segmentation) upload once and stay (ADVICE r4 #5: counting
            # them in the transient over-reserved and pushed fitting
            # regions to the host feed)
            slice_bytes += hp * wp * per * np.dtype(dt).itemsize
        need_active += hp * wp * per * np.dtype(dt).itemsize
    return {
        "offs": offs, "rows": rows, "width": width, "hp": hp, "wp": wp,
        "seasons": seasons, "n_orb": n_orb, "planes": planes,
        "need_full": need_full, "need_active": need_active,
        "slice_bytes": slice_bytes,
    }


class DeviceWeaksupFeed(WeaksupFeed):
    """WeaksupFeed whose pixel assembly runs on device from HBM-resident
    mosaics. Yields batches whose image keys are jax device arrays (the
    trainer's device_put passes them through untouched)."""

    def __init__(
        self,
        datasets,
        *,
        hbm_budget_bytes: float = 9e9,
        resident_from: "Optional[DeviceWeaksupFeed]" = None,
        rotate: bool = False,
        mesh=None,
        **kw,
    ):
        super().__init__(datasets, **kw)
        import jax

        # Data-parallel mode (VERDICT r4 #1): with a 1-D 'data' mesh the
        # resident stacks replicate onto every device (same per-device HBM
        # as single-chip) and the assembly jit emits the batch ALREADY
        # sharded over 'data' — each device slices only its own samples
        # from its local copy, zero collectives, so DP training keeps the
        # device feed instead of falling back to the ~16x-slower host path.
        if mesh is not None and "data" not in mesh.axis_names:
            raise Ineligible("device feed needs a mesh with a 'data' axis")
        if mesh is not None and jax.process_count() > 1:
            raise Ineligible(
                "device-resident feed supports single-process meshes only"
            )
        self._mesh = mesh
        self._rotating = False
        self._mos_host: Optional[Dict[str, np.ndarray]] = None
        self._active_season: Optional[int] = None
        self._next_slices = None  # (season, Future) from _prefetch_season
        self._up_pool = None

        dss = self.datasets
        self._ds = dss[0] if dss else None
        if resident_from is not None:
            if any(d.mode != "weaksup" for d in dss):
                raise Ineligible("weaksup datasets only")
            d0 = self._ds
            for d in dss[1:]:
                if (
                    (d.s2, d.s1, d.nir, d.viirs, d.fourseasons, d.asc_aug)
                    != (d0.s2, d0.s1, d0.nir, d0.viirs, d0.fourseasons,
                        d0.asc_aug)
                    or (d._gb_counts is None) != (d0._gb_counts is None)
                    or (d._gb_seg is None) != (d0._gb_seg is None)
                ):
                    raise Ineligible(
                        "training regions differ in modality config"
                    )
            # Share another feed's HBM-resident stacks (the weak-validation
            # feed over the same region(s): same mosaic files, different
            # census split — one upload serves both; reference re-reads
            # every val crop per validation pass, run_train.py:289-312).
            self._adopt_resident(resident_from)
            return

        lay = resident_layout(dss, self.ladder, self.transport)
        d0 = self._ds
        offs, hp, wp, rows = lay["offs"], lay["hp"], lay["wp"], lay["rows"]
        seasons, n_orb, planes = lay["seasons"], lay["n_orb"], lay["planes"]
        budget = _effective_budget(hbm_budget_bytes)
        if lay["need_full"] > budget and not rotate:
            raise Ineligible(
                f"resident stack needs {lay['need_full'] / 1e9:.1f} GB > budget "
                f"{budget / 1e9:.1f} GB"
            )
        if rotate:
            # Season-rotation middle path (VERDICT r3 #4): only ONE
            # season's S2/S1 slices are HBM-resident at a time (statics +
            # boundary stay); the full stacks live in host RAM and each
            # epoch visits its samples season-grouped (see _epoch_batches)
            # so every slice uploads once per epoch. Per-sample tensors
            # are bit-identical to the full-resident/host feeds (same
            # per-item RNG draws, per-item bucket shapes); what changes is
            # the visitation ORDER (season-major) and therefore batch
            # composition / per-batch augmentation draws.
            # Swap transient: old + new season slices resident during the
            # switch (prefetch holds the next slice alongside the active).
            if lay["need_active"] + lay["slice_bytes"] > budget:
                raise Ineligible(
                    f"rotating resident slice needs "
                    f"{lay['need_active'] / 1e9:.1f} GB "
                    f"(+swap) > budget {budget / 1e9:.1f} GB"
                )

        def _blocks(read_one, nchan, idxs, dtype_from_parts=False):
            """(len(idxs), C, hp, wp) stack with each region's rows at its
            offset; dtype unions to float32 unless every part agrees."""
            parts = {
                (di, i): read_one(d, i)
                for di, d in enumerate(dss) for i in range(len(idxs))
            }
            dt = np.float32
            if dtype_from_parts and all(
                a.dtype == np.uint16 for a in parts.values()
            ):
                dt = np.uint16
            stack = np.zeros((len(idxs), nchan, hp, wp), dt)
            for (di, i), a in parts.items():
                h_d, w_d = dss[di].cr_shape
                stack[i, :, offs[di]:offs[di] + h_d, :w_d] = a
            return stack

        mos: Dict[str, np.ndarray] = {}
        if d0.s2:
            mos["S2"] = _blocks(
                lambda d, s: _season_chw(d, "S2", s),
                4 if d0.nir else 3, seasons, dtype_from_parts=True,
            )
        if d0.s1:
            # leading dim interleaves orbits: index = season * n_orb + orb
            # (orb 0 = descending, 1 = ascending), matching one()'s lookup
            mos["S1"] = _blocks(
                lambda d, i: _season_chw(
                    d, "S1", i // n_orb, asc=bool(i % n_orb)
                ),
                2, [s * n_orb + o for s in seasons for o in range(n_orb)],
            )

        def _static(read_one):
            stat = np.zeros((1, hp, wp), np.float32)
            for di, d in enumerate(dss):
                h_d, w_d = d.cr_shape
                stat[0, offs[di]:offs[di] + h_d, :w_d] = read_one(d)
            return stat

        if d0.viirs:
            mos["VIIRS"] = _static(
                lambda d: d._source("viirs", 0, False).read(
                    (1,), ((0, d.cr_shape[0]), (0, d.cr_shape[1]))
                )[0]
            )
        if d0._gb_counts is not None:
            mos["building_counts"] = _static(
                lambda d: d._gb_counts.read(
                    1, window=((0, d.cr_shape[0]), (0, d.cr_shape[1]))
                )[0]
            )
        if d0._gb_seg is not None:
            mos["building_segmentation"] = _static(
                lambda d: d._gb_seg.read(
                    1, window=((0, d.cr_shape[0]), (0, d.cr_shape[1]))
                )[0]
            )

        bnd_p = np.full((hp, wp), -1.0, np.float32)
        for di, d in enumerate(dss):
            h_d, w_d = d.cr_shape
            bnd_p[offs[di]:offs[di] + h_d, :w_d] = d._boundary(
                d.train_level
            ).read(1, window=((0, h_d), (0, w_d)))[0]

        # window-has-NaN query tables (tile-level, conservative): items
        # whose drawn windows overlap a NaN tile take the host healing
        # path; everything else assembles from the (NaN-bearing) resident
        # stacks, whose NaNs then sit only in masked/overwritten areas
        self._nan_q: Dict[str, list] = {}
        for k, a in mos.items():
            if a.dtype == np.uint16:
                continue  # uint16 cannot hold NaN
            per = a if a.ndim == 4 else a[None]
            qs = [_nan_tile_integral(per[i]) for i in range(per.shape[0])]
            if any(q is not None for q in qs):
                self._nan_q[k] = qs

        if self.transport == "bf16":
            # transport rule on the resident stacks (data/feed.py::
            # transport_cast): float32 image modalities ride bfloat16 —
            # half the HBM residency and upload bytes for S1. Cast AFTER
            # the NaN tables (bf16 keeps NaN, but the tables scan f32).
            # Host-healed fallback items get the same cast in
            # WeaksupFeed._make_batch, so per-sample dtypes stay equal.
            import ml_dtypes

            for k in TRANSPORT_KEYS:
                if k in mos and mos[k].dtype == np.float32:
                    mos[k] = mos[k].astype(ml_dtypes.bfloat16)

        self._seasonal = {"S2", "S1"}
        self._n_seasons = len(seasons)
        if rotate:
            self._rotating = True
            self._mos_host = mos
            # statics (VIIRS/counts/seg) are season-invariant: resident once
            self._mos_static = {
                k: self._dev_put(v)
                for k, v in mos.items() if k not in self._seasonal
            }
            self._mos = None  # set per active season (_set_active_season)
        else:
            self._mos = {k: self._dev_put(v) for k, v in mos.items()}
        self._bnd = self._dev_put(bnd_p)
        self._asm_cache: Dict[Tuple, object] = {}
        self._x_off = list(offs)
        self._s1_orb = n_orb
        self._resident_meta = {
            "regions": tuple(
                (d.region, d.train_level, d.cr_shape, off)
                for d, off in zip(dss, offs)
            ),
            "rows_total": rows, "hp": hp, "wp": wp,
            "s2": d0.s2, "s1": d0.s1, "nir": d0.nir,
            "fourseasons": d0.fourseasons, "s1_orbits": n_orb,
            "keys": frozenset(mos), "transport": self.transport,
        }

    def _dev_put(self, v):
        """device_put replicated over the mesh (every device holds a full
        mosaic copy so batch assembly never communicates); plain put when
        single-device."""
        import jax

        if self._mesh is None:
            return jax.device_put(v)
        from ..dist.mesh import replicated

        return jax.device_put(v, replicated(self._mesh))

    def _adopt_resident(self, donor: "DeviceWeaksupFeed") -> None:
        """Reuse ``donor``'s HBM-resident stacks for this feed's census
        tables. Valid only when both feeds window the same mosaic files
        the same way; raises Ineligible otherwise (caller falls back to
        the host feed)."""
        meta = getattr(donor, "_resident_meta", None)
        if meta is None:
            raise Ineligible("donor feed carries no resident stacks")
        if getattr(donor, "_rotating", False):
            # a rotating donor's HBM contents change under the adoptee's
            # feet mid-epoch; the validation feed falls back to host reads
            raise Ineligible("donor feed rotates its resident stacks")
        if meta.get("transport", "exact") != self.transport:
            raise Ineligible("donor feed uses a different transport dtype")
        d0 = self._ds
        want_keys = set()
        if d0.s2:
            want_keys.add("S2")
        if d0.s1:
            want_keys.add("S1")
        if d0.viirs:
            want_keys.add("VIIRS")
        if d0._gb_counts is not None:
            want_keys.add("building_counts")
        if d0._gb_seg is not None:
            want_keys.add("building_segmentation")
        if not (
            meta["s2"] == d0.s2 and meta["s1"] == d0.s1
            and meta["nir"] == d0.nir
            and meta["fourseasons"] == d0.fourseasons
            and meta["keys"] == want_keys
        ):
            raise Ineligible("donor resident stacks cover a different region/config")
        from .dataset import max_census_window

        by_region = {
            (reg, lvl, shape): off for reg, lvl, shape, off in meta["regions"]
        }
        x_off = []
        for d in self.datasets:
            key = (d.region, d.train_level, d.cr_shape)
            if key not in by_region:
                raise Ineligible("donor resident stacks cover a different region/config")
            # dynamic_slice must never clamp: this census table's largest
            # window must fit the donor's global tail/right padding
            dx_max, dy_max = max_census_window(d)
            if (
                bucket_dim(dx_max, self.ladder) > meta["hp"] - meta["rows_total"]
                or bucket_dim(dy_max, self.ladder) > meta["wp"] - d.cr_shape[1]
            ):
                raise Ineligible("donor resident padding too small for this census")
            x_off.append(by_region[key])
        self._seasonal = donor._seasonal
        self._mesh = donor._mesh  # shared _asm_cache ⇒ same out_shardings
        self._mos = donor._mos
        self._bnd = donor._bnd
        # stacks are jit args, so sharing the cache reuses the donor's
        # compiled executables (same stack shapes/dtypes by construction)
        self._asm_cache = donor._asm_cache
        self._x_off = x_off
        # a non-ascAug adoptee reads orb=0 (descending) slots of an
        # orbit-interleaved donor stack correctly; the reverse (ascAug
        # adoptee, single-orbit donor) has no asc data to read
        if d0.asc_aug and meta["s1_orbits"] == 1 and d0.s1:
            raise Ineligible("donor stacks carry no ascending-orbit data")
        self._s1_orb = meta["s1_orbits"]
        self._nan_q = donor._nan_q
        self._resident_meta = meta

    # ---- WeaksupFeed hooks --------------------------------------------------

    def _fetch_item(self, j: int, epoch: int) -> Optional[Dict]:
        from .feed import _item_rng

        d, i = self.index[j]
        meta = self.datasets[d].get_admin_meta(i, _item_rng(self.seed, epoch, j))
        off = self._x_off[d]
        if off:
            # region d's rows live at this offset in the concatenated stack
            meta = dict(meta, x0=meta["x0"] + off)
        if self._nan_q and self._window_needs_healing(meta):
            # the drawn window overlaps NaN data: take the reference's
            # host healing path (PopulationDataset.py:418-441) for this
            # item; _item_rng is a fresh per-item generator, so the item
            # draws exactly the same season/orbit as the meta did
            try:
                return self.datasets[d].get_admin_item(
                    i, _item_rng(self.seed, epoch, j)
                )
            except ValueError:
                return None  # unhealable ("No data here!"), skip
        return meta

    def _window_needs_healing(self, meta: Dict) -> bool:
        x0, y0, dx, dy = meta["x0"], meta["y0"], meta["dx"], meta["dy"]
        season = meta["season"]
        orb = 0 if meta["descending"] else 1
        for k, qs in self._nan_q.items():
            if k == "S1":
                idx = season * self._s1_orb + orb
            elif k == "S2":
                idx = season
            else:
                idx = 0
            q = qs[idx] if idx < len(qs) else None
            if q is not None and _window_has_nan(q, x0, y0, dx, dy):
                return True
        return False

    def _item_hw(self, item: Dict) -> Tuple[int, int]:
        if "dx" in item:
            return item["dx"], item["dy"]
        return item["admin_mask"].shape  # host-healed item

    # ---- season rotation (middle path for over-HBM regions) -----------------

    def _upload_slices(self, s: int) -> Dict:
        """device_put season ``s``'s S2/S1 slices; blocks until resident."""
        import jax

        sl = {}
        if "S2" in self._mos_host:
            sl["S2"] = self._dev_put(self._mos_host["S2"][s : s + 1])
        if "S1" in self._mos_host:
            no = self._s1_orb
            sl["S1"] = self._dev_put(
                self._mos_host["S1"][s * no : (s + 1) * no]
            )
        return jax.block_until_ready(sl)

    def _prefetch_season(self, s: int) -> None:
        """Start uploading season ``s``'s slices on a worker thread while
        the current season trains — device_put releases the GIL, so the
        transfer rides under device compute and host batch assembly. The
        constructor's budget gate already reserves the two-slice
        transient this holds (prefetched + active)."""
        if self._active_season == s:
            return
        pending = self._next_slices
        if pending is not None and pending[0] == s:
            return
        if pending is not None:
            pending[1].result()  # discard a stale prefetch (bounds HBM)
        if self._up_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._up_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="season-prefetch"
            )
        self._next_slices = (s, self._up_pool.submit(self._upload_slices, s))

    def _set_active_season(self, s: int) -> None:
        """Swap the HBM-resident S2/S1 slices to season ``s`` (rotating
        mode). Statics and the boundary stay resident; the constructor's
        budget gate reserved room for one slice plus the swap transient.
        Uses the prefetched slices when ``_prefetch_season(s)`` ran."""
        if self._active_season == s:
            return
        pending, self._next_slices = self._next_slices, None
        if pending is not None and pending[0] == s:
            sl = pending[1].result()
        else:
            if pending is not None:
                pending[1].result()  # stale prefetch: drop it
            sl = self._upload_slices(s)
        mos = dict(self._mos_static)
        mos.update(sl)
        self._mos = mos  # drops the previous slice's references
        self._active_season = s

    def _epoch_batches(self, epoch: int):
        if not self._rotating:
            yield from super()._epoch_batches(epoch)
            return
        # Season-major visitation: the SAME per-sample draws as the host
        # feed (identical _item_rng streams -> identical season/orbit/
        # window per sample, identical per-sample tensors), regrouped so
        # each season's resident slice uploads exactly once per epoch.
        # Batch composition therefore differs from the host feed (and so
        # do the per-batch augmentation draws) — an explicit trade,
        # pinned in tests/test_device_weaksup.py.
        from .feed import _batch_rng, _item_rng, _ordered_map, bucket_dim

        rng = np.random.default_rng(self.seed + 1000 * epoch)
        order = rng.permutation(len(self.index))
        if self.max_samples is not None:
            order = order[: self.max_samples]
        # Two passes so host RAM stays bounded (ADVICE r4 #1): the first
        # groups by season from METAS ONLY (get_admin_meta does no pixel
        # IO and replays the same _item_rng stream _fetch_item will), the
        # second fetches/heals each season group lazily through
        # _ordered_map's bounded window — a NaN-heavy region no longer
        # buffers every healed item of the epoch at once.
        groups: Dict[int, list] = {}
        for j in order:
            d, i = self.index[j]
            meta = self.datasets[d].get_admin_meta(
                i, _item_rng(self.seed, epoch, int(j))
            )
            groups.setdefault(int(meta["season"]), []).append(int(j))

        def _to_host_item(j):
            """Exact host fallback for a meta whose season slice is gone
            (group-boundary leftovers): same rng stream -> same draws."""
            d, i = self.index[j]
            try:
                return self.datasets[d].get_admin_item(
                    i, _item_rng(self.seed, epoch, int(j))
                )
            except ValueError:
                return None

        pending: Dict[Tuple[int, int], list] = {}
        nb = 0
        season_order = sorted(groups)
        for si, s in enumerate(season_order):
            self._set_active_season(s)
            # upload the NEXT slice on a worker while this season trains;
            # at the epoch's last season, prefetch its first (the epochs'
            # season order is deterministic), hiding the next epoch's
            # opening swap under validation/checkpoint host work
            nxt = season_order[(si + 1) % len(season_order)]
            if nxt != s:
                self._prefetch_season(nxt)
            season_keys = set()
            fetched = _ordered_map(
                lambda j: (j, self._fetch_item(j, epoch)), groups[s],
                self.num_workers,
                window=self.num_workers + max(2, self.prefetch),
            )
            for j, item in fetched:
                if item is None:
                    continue
                h, w = self._item_hw(item)
                key = (bucket_dim(h, self.ladder), bucket_dim(w, self.ladder))
                season_keys.add(key)
                pending.setdefault(key, []).append((j, item))
                if len(pending[key]) == self.batch_size:
                    items = [it for _, it in pending.pop(key)]
                    yield self._make_batch(
                        items, _batch_rng(self.seed, epoch, nb)
                    )
                    nb += 1
            # group boundary: metas still pending reference this season's
            # slice, which is about to rotate out — convert them to exact
            # host items (they then batch with any future same-bucket item)
            for key in season_keys:
                kept = []
                for j, item in pending.get(key, []):
                    if "dx" not in item:
                        kept.append((j, item))
                        continue
                    hi = _to_host_item(j)
                    if hi is not None:
                        kept.append((j, hi))
                if kept:
                    pending[key] = kept
                elif key in pending:
                    del pending[key]
        if not self.drop_last:
            for key, pairs in pending.items():
                items = [it for _, it in pairs]
                if items:
                    yield self._make_batch(
                        items, _batch_rng(self.seed, epoch, nb)
                    )
                    nb += 1

    # ---- device assembly ----------------------------------------------------

    def _assemble_fn(self, bh: int, bw: int, rot_odd: bool, n: int):
        key = (bh, bw, rot_odd, n)
        fn = self._asm_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        seasonal = self._seasonal
        s1_orb = self._s1_orb  # 2 with -ascAug (desc/asc interleaved), else 1

        # The resident stacks (mos, bnd) MUST be jit ARGUMENTS, never
        # closed-over device arrays: jax inlines closure constants into
        # the lowered module, so every bucket specialization would embed
        # the full region stacks (hundreds of MB) in its HLO — bloating
        # compiles and overflowing remote-compile transports outright
        # (observed: HTTP 413 through the TPU tunnel).
        def one(mos, bnd, x0, y0, dx, dy, season, orb):
            ri = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
            valid = (ri < dx) & (ci < dy)
            item = {}
            for k, a in mos.items():
                if k in seasonal:
                    idx = season * s1_orb + orb if k == "S1" else season
                    c = a.shape[1]
                    sl = jax.lax.dynamic_slice(
                        a, (idx, 0, x0, y0), (1, c, bh, bw)
                    )[0]
                else:
                    sl = jax.lax.dynamic_slice(a, (0, x0, y0), (a.shape[0], bh, bw))
                sl = jnp.transpose(sl, (1, 2, 0))
                zero = jnp.zeros((), sl.dtype)
                item[k] = jnp.where(valid[..., None], sl, zero)
            adm = jax.lax.dynamic_slice(bnd, (x0, y0), (bh, bw))
            item["admin_mask"] = jnp.where(valid, adm, jnp.float32(-1.0))
            return item

        def geo(a, vf, hf, rk):
            # reference transform order: vflip, hflip, then k*90 CCW
            # rotation (aug/augment.py::apply_geometric; exact index
            # permutations, so u16/f32 content is preserved bitwise)
            a = jax.lax.cond(vf, lambda t: jnp.flip(t, 1), lambda t: t, a)
            a = jax.lax.cond(hf, lambda t: jnp.flip(t, 2), lambda t: t, a)
            if rot_odd:
                t = jnp.swapaxes(a, 1, 2)
                # np.rot90(m, 1, (1,2)) == flip(swapaxes(m,1,2), 1)
                # np.rot90(m, 3, (1,2)) == flip(swapaxes(m,1,2), 2)
                a = jax.lax.cond(
                    rk == 1, lambda t_: jnp.flip(t_, 1), lambda t_: jnp.flip(t_, 2), t
                )
            else:
                a = jax.lax.cond(
                    rk == 2, lambda t_: jnp.flip(jnp.flip(t_, 1), 2), lambda t_: t_, a
                )
            return a

        def asm(mos, bnd, x0, y0, dx, dy, season, orb, vf, hf, rk):
            items = jax.vmap(one, in_axes=(None, None, 0, 0, 0, 0, 0, 0))(
                mos, bnd, x0, y0, dx, dy, season, orb
            )
            return {k: geo(v, vf, hf, rk) for k, v in items.items()}

        if self._mesh is not None:
            # emit the batch sharded over 'data' (mosaics are replicated,
            # so each device assembles only its own samples — no
            # collectives); odd tail batches come out replicated and the
            # trainer's shard_batch reshards them
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P("data") if n % self._mesh.shape["data"] == 0 else P()
            asm = jax.jit(asm, out_shardings=NamedSharding(self._mesh, spec))
        else:
            asm = jax.jit(asm)

        self._asm_cache[key] = asm
        return asm

    def _make_batch(self, items: List[Dict], rng: np.random.Generator) -> Dict:
        import jax.numpy as jnp

        hosts = [i for i, it in enumerate(items) if "dx" not in it]
        if len(hosts) == len(items):
            # every member took the healing path: assemble exactly like
            # the host feed (same rng draw order -> bit-identical batch)
            return WeaksupFeed._make_batch(self, items, rng)

        dims = [self._item_hw(it) for it in items]
        h = max(d[0] for d in dims)
        w = max(d[1] for d in dims)
        bh, bw = bucket_dim(h, self.ladder), bucket_dim(w, self.ladder)

        if self.augment:
            g = draw_general(rng)
            vf, hf, rk = g.vflip, g.hflip, g.rot_k
        else:
            g = None
            vf = hf = False
            rk = 0
        asm = self._assemble_fn(bh, bw, rk % 2 == 1, len(items))

        def _m(key):
            # host-healed items ride along with empty device crops (their
            # slots are overwritten below)
            return np.asarray([it.get(key, 0) for it in items], np.int32)

        orb = np.asarray(
            [0 if it.get("descending", True) else 1 for it in items], np.int32
        )
        season_asm = _m("season")
        if self._rotating:
            # the active resident stacks hold exactly ONE season at index
            # 0 (S2: (1,C,hp,wp); S1: (n_orb,2,hp,wp)) — _epoch_batches
            # guarantees every device item in the batch drew that season
            season_asm = np.zeros_like(season_asm)
        dev = asm(
            self._mos, self._bnd,
            _m("x0"), _m("y0"), _m("dx"), _m("dy"), season_asm,
            orb, np.bool_(vf), np.bool_(hf), np.int32(rk),
        )
        batch: Dict = dict(dev)

        if hosts:
            batch = self._splice_host_items(batch, items, hosts, bh, bw, g)
        # -binp/-sinp segmentation policy (reference utils/utils.py:153-159)
        if self.building_input and self.segmentation_input:
            if "building_segmentation" not in batch and "building_counts" in batch:
                batch["building_segmentation"] = (
                    batch["building_counts"][..., 0] > 0.5
                ).astype(jnp.float32)
        elif not self.segmentation_input:
            batch.pop("building_segmentation", None)
        # squeeze static single-channel keys to the host feed's (B, H, W)
        for k in ("building_counts", "building_segmentation"):
            if k in batch and getattr(batch[k], "ndim", 3) == 4:
                batch[k] = batch[k][..., 0]
        batch["y"] = np.asarray([it["y"] for it in items], np.float32)
        batch["census_idx"] = np.asarray(
            [it["census_idx"] for it in items], np.float32
        )
        batch["season"] = np.asarray([it["season"] for it in items], np.int32)
        return self._finish_batch(batch, rng)

    def _splice_host_items(self, batch, items, hosts, bh, bw, g):
        """Overwrite host-healed items' slots in the assembled device
        batch: pad to the bucket, apply the SAME geometric draw host-side
        (index permutations — bitwise identical to the on-device geo),
        and match the host feed's per-batch S2 transport dtype (healed
        values are fractional, so such batches ship float32)."""
        import jax.numpy as jnp

        from ..aug.augment import apply_geometric
        from .feed import pad_item_to

        if "S2" in batch and batch["S2"].dtype == jnp.uint16:
            for i in hosts:
                a = items[i].get("S2")
                if a is not None and not np.array_equal(
                    a.astype(np.uint16), a
                ):
                    # healed fractional values: leave uint16 for the batch's
                    # float transport dtype (matches the host feed's rule)
                    if self.transport == "bf16":
                        batch["S2"] = batch["S2"].astype(jnp.bfloat16)
                    else:
                        batch["S2"] = batch["S2"].astype(jnp.float32)
                    break
        s2_u16 = "S2" in batch and batch["S2"].dtype == jnp.uint16
        for i in hosts:
            it = pad_item_to(items[i], bh, bw)
            for k in list(batch):
                if k not in it:
                    continue
                a = it[k]
                if k == "S2" and s2_u16:
                    a = a.astype(np.uint16)
                if g is not None:
                    a = np.ascontiguousarray(apply_geometric(a, g, hw_axes=(0, 1)))
                tgt = batch[k]
                if tgt.ndim == a.ndim + 1 and tgt.shape[-1] == 1:
                    a = a[..., None]
                if a.dtype != tgt.dtype:
                    # explicit transport cast (f32 healed item into a bf16
                    # batch): the host feed casts at the same point, and
                    # jax scatter will reject the implicit downcast soon
                    a = np.asarray(a).astype(tgt.dtype)
                batch[k] = tgt.at[i].set(a)
        return batch

    def _finish_batch(self, batch, rng):
        if self.augment:
            p = draw_photometric(rng)
            batch["photometric"] = np.asarray(
                [float(p.apply_brightness), p.beta, float(p.apply_gamma), p.gamma],
                np.float32,
            )
        else:
            batch["photometric"] = np.asarray([0.0, 1.0, 0.0, 1.0], np.float32)
        return batch
