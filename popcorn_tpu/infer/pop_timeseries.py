"""Ensemble population time series over dated/seasonal frame sets.

Re-implements the intent of the reference's time_series_inference.ipynb
(which is bit-rotted — it imports a POMELO-era class that no longer
exists): for each time step (year/season) run the Bag-of-POPCORN ensemble
over that step's S1/S2 mosaics, write mean and std population maps,
aggregate the regional totals, and emit a totals time-series table/plot
(cells 7-13 of the notebook).

A "time step" is simply a PopMapData-layout region directory per date —
the driver takes a list of (label, DataPaths/region) entries so yearly
mosaics can live side by side.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple


from ..config import DataPaths, ModelConfig
from ..data.dataset import PopulationDataset
from ..data.normalize import NormStats
from .sliding import run_sliding_inference


def run_population_timeseries(
    members: Sequence,
    consts,
    mcfg: ModelConfig,
    steps: Sequence[Tuple[str, DataPaths, str]],
    output_dir: str,
    *,
    patchsize: int = 2048,
    overlap: int = 128,
    fourseasons: bool = True,
    patch_batch: int = 1,
    mesh=None,
) -> List[Dict]:
    """steps: [(label, paths, region), ...] ordered in time.

    Writes <region>_predictions_<label>.tif (+_STD) per step and a
    totals.csv; returns the totals records.
    """
    os.makedirs(output_dir, exist_ok=True)
    stats = NormStats()
    records = []
    for label, paths, region in steps:
        ds = PopulationDataset(
            paths, region, mode="test", patchsize=patchsize, overlap=overlap,
            s1=mcfg.s1, s2=mcfg.s2, nir=mcfg.nir, fourseasons=fourseasons,
        )
        maps = run_sliding_inference(
            members, consts, mcfg, ds, stats=stats,
            batch_size=patch_batch, mesh=mesh,
        )
        ds.save(maps["map"], output_dir, tag=f"_{label}")
        ds.save(maps["map_std"], output_dir, tag=f"_{label}_STD")
        records.append(
            {
                "label": label,
                "total_population": float(maps["map"].sum()),
                "total_std": float(maps["map_std"].sum()),
            }
        )
        ds.close()

    import pandas as pd

    df = pd.DataFrame(records)
    df.to_csv(os.path.join(output_dir, "totals.csv"), index=False)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        ax.errorbar(df["label"], df["total_population"], yerr=df["total_std"],
                    marker="o")
        ax.set_ylabel("total population")
        ax.set_xlabel("time step")
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, "totals.png"), dpi=120)
        plt.close(fig)
    except Exception:
        pass
    return records
