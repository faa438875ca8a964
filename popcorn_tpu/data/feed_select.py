"""Measured cost gate for training-feed auto-selection (VERDICT r4 #2).

The trainer's feed fallback chain is full-resident device feed ->
season-rotating device feed -> host feed. Full residency, when it fits,
is strictly fastest (one upload for the whole run; measured 75.6 vs 4.8
samples/s, BENCH_r04). Rotation vs host is a genuine trade, though: the
rotating feed re-uploads every season's S2/S1 slice once per epoch, so
its per-epoch cost is dominated by ``swap_bytes / link_rate`` — a FIXED
cost per epoch — while the host feed's cost scales with the number of
samples. Small (bench-scale) epochs sit on the host side of the
crossover: BENCH_r04 measured the auto-picked rotation at 1.74 samples/s
vs host 4.76 on a 124-sample epoch. Country-scale epochs (thousands of
admin regions, reference run_train.py:431's DataLoader over the full
census table) sit far past it.

This module makes the choice MEASURED instead of unconditional:

* :func:`measure_link_bytes_per_s` — one small ``device_put`` probe of
  the actual host->device rate (the tunnel link here swings over two
  orders of magnitude between sessions, PERF_NOTES.md).
* :func:`measure_host_items_per_s` — times a couple of real host-feed
  item fetches (windowed raster read + NaN scan + assembly, the per-step
  cost the reference pays in its DataLoader workers) and adds the
  per-sample upload at the measured link rate.
* :func:`prefer_rotation` — the pure decision function, unit-tested on
  both sides of the crossover (tests/test_feed_select.py).

Env overrides (tests / operators):

* ``POPCORN_FEED_GATE=off``    — skip the gate (legacy behavior: rotation
  whenever it fits).
* ``POPCORN_FEED_GATE=host``   — force the host side.
* ``POPCORN_FEED_GATE_LINK_MBPS`` / ``POPCORN_FEED_GATE_HOST_SPS`` —
  inject measured rates instead of probing.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class FeedGateInputs:
    """Everything the rotation-vs-host decision depends on.

    ``host_items_per_s`` must already include the host feed's own
    per-sample upload cost; ``dev_items_per_s`` is the rotating feed's
    steady assembly rate BETWEEN swaps (on-device crops — fast; the
    conservative default is well under the measured 75 samples/s of the
    full-resident path so the gate never flatters rotation)."""

    n_samples: int
    swap_bytes: int
    link_bytes_per_s: float
    host_items_per_s: float
    dev_items_per_s: float = 40.0

    def rotation_epoch_s(self) -> float:
        """Per-epoch cost of the rotating feed: every seasonal slice
        uploads once per epoch (device_weaksup._epoch_batches is
        season-major), then samples assemble on device. Prefetch can hide
        part of a swap under the previous season's compute, but at the
        epoch sizes where the gate matters there is little compute to
        hide under — counted in full (conservative toward the host
        feed, the side that loses nothing when wrong)."""
        return self.swap_bytes / max(self.link_bytes_per_s, 1e-6) + (
            self.n_samples / max(self.dev_items_per_s, 1e-6)
        )

    def host_epoch_s(self) -> float:
        return self.n_samples / max(self.host_items_per_s, 1e-9)


def prefer_rotation(g: FeedGateInputs) -> bool:
    """True when the rotating device feed's estimated epoch is faster
    than the host feed's. Pure function of measured inputs."""
    return g.rotation_epoch_s() < g.host_epoch_s()


def gate_report(g: FeedGateInputs) -> str:
    return (
        f"rotation {g.rotation_epoch_s():.1f}s/epoch "
        f"({g.swap_bytes / 1e6:.0f} MB swaps @ "
        f"{g.link_bytes_per_s / 1e6:.1f} MB/s) vs host "
        f"{g.host_epoch_s():.1f}s/epoch "
        f"({g.n_samples} samples @ {g.host_items_per_s:.2f}/s)"
    )


# -- probes -------------------------------------------------------------------

_link_cache: dict = {}


def measure_link_bytes_per_s(nbytes: int = 16 << 20) -> float:
    """Host->device upload rate from one timed ``device_put``. Cached per
    process (the probe itself costs a transfer)."""
    ov = os.environ.get("POPCORN_FEED_GATE_LINK_MBPS")
    if ov:
        return float(ov) * 1e6
    if nbytes in _link_cache:
        return _link_cache[nbytes]
    import jax

    a = np.random.default_rng(0).random(nbytes // 4).astype(np.float32)
    t0 = time.time()
    jax.block_until_ready(jax.device_put(a))
    rate = nbytes / max(time.time() - t0, 1e-9)
    _link_cache[nbytes] = rate
    return rate


def measure_host_items_per_s(
    feed,
    *,
    link_bytes_per_s: float,
    n_probe: int = 2,
    epoch: int = 0,
) -> float:
    """Measured host-feed sample rate: times ``n_probe`` real item
    fetches through the feed's own hook (windowed read + healing +
    assembly — the exact epoch-0 items, so the probe work is a prefix of
    work the host feed would redo anyway), scales by the fetch
    parallelism actually available (num_workers threads, bounded by host
    cores — the reference's DataLoader workers, run_train.py:431), and
    adds the per-sample transport bytes at the measured link rate."""
    ov = os.environ.get("POPCORN_FEED_GATE_HOST_SPS")
    if ov:
        return float(ov)
    rng = np.random.default_rng(feed.seed + 1000 * epoch)
    order = rng.permutation(len(feed.index))[:n_probe]
    t0 = time.time()
    items = [feed._fetch_item(int(j), epoch) for j in order]
    items = [it for it in items if it is not None]
    fetch_s = max(time.time() - t0, 1e-9) / max(len(items), 1)
    workers = max(1, min(feed.num_workers, os.cpu_count() or 1))
    item_bytes = max(
        (
            sum(
                a.nbytes
                for a in it.values()
                if isinstance(a, np.ndarray)
            )
            for it in items
        ),
        default=0,
    )
    per_item_s = fetch_s / workers + item_bytes / max(link_bytes_per_s, 1e-6)
    return 1.0 / max(per_item_s, 1e-9)


def gate_mode() -> str:
    """'auto' (measure + decide), 'off' (legacy: rotation when it fits),
    or 'host' (forced host side)."""
    return os.environ.get("POPCORN_FEED_GATE", "auto")


def gather_gate_inputs(
    feed_or_datasets,
    *,
    n_samples: int,
    swap_bytes: int,
) -> FeedGateInputs:
    """Run both probes and assemble :class:`FeedGateInputs`."""
    link = measure_link_bytes_per_s()
    host_sps = measure_host_items_per_s(
        feed_or_datasets, link_bytes_per_s=link
    )
    return FeedGateInputs(
        n_samples=n_samples,
        swap_bytes=swap_bytes,
        link_bytes_per_s=link,
        host_items_per_s=host_sps,
    )
