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

Eligibility: single dataset, NaN-free mosaics (NaN healing is host-side
data repair, PopulationDataset.py:418-441), no ascending-orbit
augmentation, and the resident stack must fit ``hbm_budget_bytes``.
Construction raises ``Ineligible`` otherwise; the trainer falls back to
the host feed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .dataset import PopulationDataset
from .feed import WeaksupFeed, bucket_dim
from ..aug.augment import draw_general, draw_photometric


class Ineligible(Exception):
    """This dataset cannot be served from device-resident mosaics."""


def _is_raw_u16_source(src) -> bool:
    """True when a _RasterSource can serve raw uint16 windows (native
    uint16 GeoTIFF, not in-memory) — mirrors infer/device_feed.py::
    _read_raw_u16's eligibility without reading any pixels."""
    from ..io.geotiff import GeoTIFF

    g = getattr(src, "_g", None)
    return (
        getattr(src, "_mem", None) is None
        and isinstance(g, GeoTIFF)
        and g.dtype == np.uint16
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


def _season_chw(ds: PopulationDataset, modality: str, season_idx: int):
    """One season's mosaic as (C, H, W) in transport dtype, or raises
    Ineligible on NaNs."""
    from ..infer.device_feed import _read_raw_u16

    h, w = ds.cr_shape
    window = ((0, h), (0, w))
    src = ds._source(modality, season_idx, False)
    if modality == "S2":
        bands = (3, 2, 1, 4) if ds.nir else (3, 2, 1)
        arr = _read_raw_u16(src, bands, window)
        if arr is not None:
            return arr
        arr = src.read(bands, window)
    else:  # S1
        arr = src.read((1, 2), window)
    if np.isnan(arr).any():
        raise Ineligible(f"{modality} season {season_idx} has NaNs")
    if modality == "S2":
        # same lossless-uint16 transport rule as the host feed
        # (data/feed.py) and infer/device_feed.py::season_arrays — keeps
        # the dtype parity contract and halves the resident S2 bytes
        u16 = arr.astype(np.uint16)
        if np.array_equal(u16, arr):
            return np.ascontiguousarray(u16)
    return np.ascontiguousarray(arr, np.float32)


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
        **kw,
    ):
        super().__init__(datasets, **kw)
        import jax

        if len(self.datasets) != 1:
            raise Ineligible("device feed supports a single training region")
        ds = self.datasets[0]
        if ds.asc_aug:
            raise Ineligible("ascending-orbit augmentation needs both orbit stacks")
        if ds.mode != "weaksup":
            raise Ineligible("weaksup datasets only")
        self._ds = ds

        h, w = ds.cr_shape
        if resident_from is not None:
            # Share another feed's HBM-resident stacks (the weak-validation
            # feed over the same region: same mosaic files, different census
            # split — one upload serves both; reference re-reads every val
            # crop per validation pass, run_train.py:289-312).
            self._adopt_resident(resident_from)
            return
        # padding: dynamic_slice must never clamp, so pad the resident
        # stacks by the largest bucket this census table can request
        from .dataset import max_census_window

        dx_max, dy_max = max_census_window(ds)
        ph = bucket_dim(dx_max, self.ladder)
        pw = bucket_dim(dy_max, self.ladder)
        hp, wp = h + ph, w + pw

        seasons = list(range(4)) if ds.fourseasons else [0]
        need = 0
        planes: Dict[str, Tuple[np.dtype, int]] = {}
        if ds.s2:
            # costed as float32 unless every season is raw-uint16-readable:
            # the lossless-u16 fallback conversion may still land on u16,
            # but budgeting must never undercount
            s2_u16 = all(
                _is_raw_u16_source(ds._source("S2", s, False)) for s in seasons
            )
            planes["S2"] = (
                np.uint16 if s2_u16 else np.float32,
                len(seasons) * (4 if ds.nir else 3),
            )
        if ds.s1:
            planes["S1"] = (np.float32, len(seasons) * 2)
        if ds.viirs:
            planes["VIIRS"] = (np.float32, 1)
        if ds._gb_counts is not None:
            planes["building_counts"] = (np.float32, 1)
        if ds._gb_seg is not None:
            planes["building_segmentation"] = (np.float32, 1)
        for k, (dt, nchan) in planes.items():
            need += hp * wp * nchan * np.dtype(dt).itemsize
        need += hp * wp * 4  # boundary
        budget = _effective_budget(hbm_budget_bytes)
        if need > budget:
            raise Ineligible(
                f"resident stack needs {need / 1e9:.1f} GB > budget "
                f"{budget / 1e9:.1f} GB"
            )

        mos: Dict[str, np.ndarray] = {}
        if ds.s2:
            per = [_season_chw(ds, "S2", s) for s in seasons]
            if any(a.dtype != per[0].dtype for a in per):
                per = [a.astype(np.float32) for a in per]
            stack = np.zeros((len(per), per[0].shape[0], hp, wp), per[0].dtype)
            for i, a in enumerate(per):
                stack[i, :, :h, :w] = a
            mos["S2"] = stack
        if ds.s1:
            per = [_season_chw(ds, "S1", s) for s in seasons]
            stack = np.zeros((len(per), 2, hp, wp), np.float32)
            for i, a in enumerate(per):
                stack[i, :, :h, :w] = a
            mos["S1"] = stack
        if ds.viirs:
            arr = ds._source("viirs", 0, False).read((1,), ((0, h), (0, w)))
            stat = np.zeros((1, hp, wp), np.float32)
            stat[:, :h, :w] = arr
            mos["VIIRS"] = stat
        if ds._gb_counts is not None:
            arr = ds._gb_counts.read(1, window=((0, h), (0, w)))
            stat = np.zeros((1, hp, wp), np.float32)
            stat[:, :h, :w] = arr
            mos["building_counts"] = stat
        if ds._gb_seg is not None:
            arr = ds._gb_seg.read(1, window=((0, h), (0, w)))
            stat = np.zeros((1, hp, wp), np.float32)
            stat[:, :h, :w] = arr
            mos["building_segmentation"] = stat

        bnd = ds._boundary(ds.train_level).read(1, window=((0, h), (0, w)))[0]
        bnd_p = np.full((hp, wp), -1.0, np.float32)
        bnd_p[:h, :w] = bnd

        self._seasonal = {"S2", "S1"}
        self._mos = {k: jax.device_put(v) for k, v in mos.items()}
        self._bnd = jax.device_put(bnd_p)
        self._asm_cache: Dict[Tuple, object] = {}
        self._resident_meta = {
            "region": ds.region, "train_level": ds.train_level,
            "cr_shape": (h, w), "hp": hp, "wp": wp,
            "s2": ds.s2, "s1": ds.s1, "nir": ds.nir,
            "fourseasons": ds.fourseasons, "keys": frozenset(self._mos),
        }

    def _adopt_resident(self, donor: "DeviceWeaksupFeed") -> None:
        """Reuse ``donor``'s HBM-resident stacks for this feed's census
        table. Valid only when both feeds window the same mosaic files
        the same way; raises Ineligible otherwise (caller falls back to
        the host feed)."""
        ds = self._ds
        meta = getattr(donor, "_resident_meta", None)
        if meta is None:
            raise Ineligible("donor feed carries no resident stacks")
        h, w = ds.cr_shape
        want_keys = set()
        if ds.s2:
            want_keys.add("S2")
        if ds.s1:
            want_keys.add("S1")
        if ds.viirs:
            want_keys.add("VIIRS")
        if ds._gb_counts is not None:
            want_keys.add("building_counts")
        if ds._gb_seg is not None:
            want_keys.add("building_segmentation")
        same = (
            meta["region"] == ds.region
            and meta["train_level"] == ds.train_level
            and meta["cr_shape"] == (h, w)
            and meta["s2"] == ds.s2 and meta["s1"] == ds.s1
            and meta["nir"] == ds.nir
            and meta["fourseasons"] == ds.fourseasons
            and meta["keys"] == want_keys
        )
        if not same:
            raise Ineligible("donor resident stacks cover a different region/config")
        # dynamic_slice must never clamp: this census table's largest
        # window must fit the donor's padding
        from .dataset import max_census_window

        dx_max, dy_max = max_census_window(ds)
        if (
            bucket_dim(dx_max, self.ladder) > meta["hp"] - h
            or bucket_dim(dy_max, self.ladder) > meta["wp"] - w
        ):
            raise Ineligible("donor resident padding too small for this census")
        self._seasonal = donor._seasonal
        self._mos = donor._mos
        self._bnd = donor._bnd
        self._asm_cache = donor._asm_cache  # same arrays -> same executables
        self._resident_meta = meta

    # ---- WeaksupFeed hooks --------------------------------------------------

    def _fetch_item(self, j: int, epoch: int) -> Optional[Dict]:
        from .feed import _item_rng

        d, i = self.index[j]
        return self.datasets[d].get_admin_meta(i, _item_rng(self.seed, epoch, j))

    def _item_hw(self, item: Dict) -> Tuple[int, int]:
        return item["dx"], item["dy"]

    # ---- device assembly ----------------------------------------------------

    def _assemble_fn(self, bh: int, bw: int, rot_odd: bool, n: int):
        key = (bh, bw, rot_odd, n)
        fn = self._asm_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        mos = self._mos
        bnd = self._bnd
        seasonal = self._seasonal

        def one(x0, y0, dx, dy, season):
            ri = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
            valid = (ri < dx) & (ci < dy)
            item = {}
            for k, a in mos.items():
                if k in seasonal:
                    c = a.shape[1]
                    sl = jax.lax.dynamic_slice(
                        a, (season, 0, x0, y0), (1, c, bh, bw)
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

        @jax.jit
        def asm(x0, y0, dx, dy, season, vf, hf, rk):
            items = jax.vmap(one)(x0, y0, dx, dy, season)
            return {k: geo(v, vf, hf, rk) for k, v in items.items()}

        self._asm_cache[key] = asm
        return asm

    def _make_batch(self, items: List[Dict], rng: np.random.Generator) -> Dict:
        import jax.numpy as jnp

        h = max(it["dx"] for it in items)
        w = max(it["dy"] for it in items)
        bh, bw = bucket_dim(h, self.ladder), bucket_dim(w, self.ladder)

        if self.augment:
            g = draw_general(rng)
            vf, hf, rk = g.vflip, g.hflip, g.rot_k
        else:
            vf = hf = False
            rk = 0
        asm = self._assemble_fn(bh, bw, rk % 2 == 1, len(items))
        arrs = {
            k: np.asarray([it[k] for it in items], np.int32)
            for k in ("x0", "y0", "dx", "dy", "season")
        }
        dev = asm(
            arrs["x0"], arrs["y0"], arrs["dx"], arrs["dy"], arrs["season"],
            np.bool_(vf), np.bool_(hf), np.int32(rk),
        )
        batch: Dict = dict(dev)
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
        if self.augment:
            p = draw_photometric(rng)
            batch["photometric"] = np.asarray(
                [float(p.apply_brightness), p.beta, float(p.apply_gamma), p.gamma],
                np.float32,
            )
        else:
            batch["photometric"] = np.asarray([0.0, 1.0, 0.0, 1.0], np.float32)
        return batch
