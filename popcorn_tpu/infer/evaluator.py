"""Bag-of-POPCORN ensemble evaluation driver.

TPU-native counterpart of run_eval.py:29-269: loads N checkpoints (ours,
or released PyTorch .pth via the compat converter), runs vmapped-ensemble
sliding-window inference per region, writes the mean/STD/SCALE/SCALE_STD
GeoTIFFs, evaluates census metrics per level, then applies the
dasymmetric adjustment and re-evaluates (ADJ maps).
"""

from __future__ import annotations

import os
import threading
import time
from typing import Dict

import numpy as np
import pandas as pd

from ..agg.census_agg import (
    DeviceCensus,
    adjust_map_to_census,
    convert_popmap_to_census,
    detail_maps,
)
from ..compat.torch_convert import load_popcorn_checkpoint
from ..config import (
    NEED_ASCENDING_FILL,
    TESTLEVELS_EVAL,
    DataPaths,
    EvalConfig,
    ModelConfig,
)
from ..data.dataset import PopulationDataset
from ..data.normalize import NormStats
from ..io.geotiff import GeoTIFF
from ..losses.metrics import get_test_metrics
from ..train.checkpoint import restore_params
from ..utils.log import MetricsLogger
from .sliding import run_sliding_inference


def load_member(path: str):
    """Load one ensemble member: an Orbax dir (ours) or a torch .pth."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"No checkpoint found at '{path}'")
    if path.endswith(".pth") or path.endswith(".pt"):
        params, consts = load_popcorn_checkpoint(path)
        return params, consts
    return restore_params(path), None


class _MapWriter:
    """One background writer: fetches a (possibly device-resident) map and
    writes its GeoTIFF while the caller proceeds with census aggregation —
    the device->host transfer of one country map overlaps the disk write
    of the previous one and the device segment-sums of the metrics."""

    def __init__(self, dataset):
        self._ds = dataset
        self._items: list = []
        self._thread: threading.Thread = None

    def put(self, arr, folder: str, tag: str = ""):
        self._items.append((arr, folder, tag))
        if self._thread is None or not self._thread.is_alive():
            self._drain()

    def _drain(self):
        items, self._items = self._items, []

        def work():
            for arr, folder, tag in items:
                self._ds.save(np.asarray(arr), folder, tag=tag)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def join(self):
        while self._items or (self._thread is not None and self._thread.is_alive()):
            if self._thread is not None:
                self._thread.join()
            if self._items:
                self._drain()


class Evaluator:
    def __init__(
        self,
        paths: DataPaths,
        mcfg: ModelConfig,
        ecfg: EvalConfig,
        *,
        consts=None,
        mesh=None,
        use_wandb: bool = False,
    ):
        if not ecfg.checkpoints:
            raise ValueError("EvalConfig.checkpoints is empty")
        self.paths = paths
        self.mcfg = mcfg
        self.ecfg = ecfg
        self.mesh = mesh

        first_dir = os.path.dirname(os.path.abspath(ecfg.checkpoints[0]))
        self.experiment_folder = os.path.join(
            first_dir,
            "eval_outputs_ensemble_{}_members_{}".format(
                time.strftime("%Y%m%d-%H%M%S"), len(ecfg.checkpoints)
            ),
        )
        os.makedirs(self.experiment_folder, exist_ok=True)
        self.logger = MetricsLogger(self.experiment_folder, use_wandb=use_wandb)

        self.members = []
        self.consts = consts
        for p in ecfg.checkpoints:
            params, member_consts = load_member(p)
            self.members.append(params)
            if self.consts is None and member_consts is not None:
                self.consts = member_consts
        if self.consts is None:
            from ..compat.torch_convert import load_popcorn_from_dda

            _, self.consts = load_popcorn_from_dda(mcfg)

        self.datasets = [
            PopulationDataset(
                paths, reg, mode="test",
                patchsize=ecfg.patchsize, overlap=ecfg.overlap,
                s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir, viirs=mcfg.viirs,
                fourseasons=ecfg.fourseasons,
                ascfill=reg in NEED_ASCENDING_FILL,
                train_level=lvl,
                in_memory=ecfg.in_memory,
                sentinelbuildings=mcfg.sentinel_buildings,
            )
            for reg, lvl in zip(ecfg.target_regions, ecfg.train_level)
        ]
        self.stats = NormStats()

    def test_target(self, save: bool = True, full: bool = False) -> Dict[str, float]:
        import jax

        out: Dict[str, float] = {}
        for ds in self.datasets:
            # single-process runs keep the finalized maps ON DEVICE: census
            # aggregation / dasymmetric adjustment are device segment-sums
            # and gathers (agg/census_agg.py::DeviceCensus), and the host
            # only ever receives the maps it writes to GeoTIFF
            if getattr(self.ecfg, "spatial", False):
                # whole-region spatially-partitioned path (--spatial):
                # exact model output, no stitch (infer/spatial.py)
                from ..dist.mesh import make_mesh
                from .spatial import run_spatial_inference

                maps = run_spatial_inference(
                    self.members, self.consts, self.mcfg, ds,
                    stats=self.stats,
                    mesh=self.mesh if self.mesh is not None else make_mesh(),
                    progress=True,
                    transport=getattr(self.ecfg, "transport", "exact"),
                )
            else:
                maps = run_sliding_inference(
                    self.members, self.consts, self.mcfg, ds,
                    stats=self.stats, batch_size=self.ecfg.patch_batch,
                    mesh=self.mesh, progress=True,
                    num_workers=self.ecfg.num_workers,
                    device_feed=getattr(self.ecfg, "device_feed", "auto"),
                    return_device=self.mesh is None,
                    transport=getattr(self.ecfg, "transport", "exact"),
                )
            is_dev = isinstance(maps["map"], jax.Array)
            writer = _MapWriter(ds) if save else None
            if save:
                writer.put(maps["map"], self.experiment_folder)
                writer.put(maps["map_std"], self.experiment_folder, tag="STD")
                if self.mcfg.occupancy_model:
                    writer.put(
                        maps["scale"], self.experiment_folder,
                        tag=f"SCALE_{ds.region}",
                    )
                    writer.put(maps["scale_std"], self.experiment_folder, tag="SCALE_STD")

            boundaries: Dict[str, object] = {}
            dcs: Dict[str, DeviceCensus] = {}
            censuses: Dict[str, pd.DataFrame] = {}

            def _level_census(level):
                if level not in boundaries:
                    with GeoTIFF(ds.boundary_paths[level]) as g:
                        boundaries[level] = g.read(1, squeeze=True)
                    censuses[level] = pd.read_csv(ds.census_paths[level])
                    if is_dev:
                        dcs[level] = DeviceCensus(boundaries[level], censuses[level])
                return censuses[level]

            def _convert(pred, level):
                if is_dev and isinstance(pred, jax.Array):
                    return dcs[level].convert(pred)
                return convert_popmap_to_census(
                    np.asarray(pred), boundaries[level], censuses[level]
                )

            for level in TESTLEVELS_EVAL.get(ds.region, ["coarse"]):
                census = _level_census(level)
                pred_c, gt_c = _convert(maps["map"], level)
                out.update(
                    get_test_metrics(pred_c, gt_c, tag=f"MainCensus_{ds.region}_{level}")
                )
                if full:
                    det = detail_maps(
                        np.asarray(maps["map"]), boundaries[level], census
                    )
                    ddir = os.path.join(
                        self.experiment_folder, f"{ds.region}_{level}"
                    )
                    for name, m in det.items():
                        ds.save(m, ddir, tag=f"_{name}")

            # dasymmetric adjustment at the train level (run_eval.py:181-200)
            lvl = ds.train_level
            census_train = _level_census(lvl)
            if is_dev:
                adj = dcs[lvl].adjust(maps["map"])
            else:
                adj = adjust_map_to_census(
                    maps["map"], boundaries[lvl], census_train
                )
            if save:
                writer.put(adj, self.experiment_folder, tag=f"ADJ_{ds.region}")
            for level in TESTLEVELS_EVAL.get(ds.region, ["coarse"]):
                _level_census(level)
                pred_c, gt_c = _convert(adj, level)
                out.update(
                    get_test_metrics(pred_c, gt_c, tag=f"AdjCensus_{ds.region}_{level}")
                )
            if writer is not None:
                writer.join()
        self.logger.log({f"{k}/targettest": v for k, v in out.items()}, 0)
        return out
