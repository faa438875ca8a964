"""Measured rotation-vs-host feed cost gate (data/feed_select.py).

VERDICT r4 #2: the trainer's auto fallback previously preferred the
season-rotating device feed unconditionally, but its per-epoch slice
re-uploads are a FIXED cost that only amortizes past a few hundred
samples/epoch (BENCH_r04 measured the ungated pick 2.7x slower at bench
scale). These tests pin the pure decision function on both sides of the
crossover and the trainer's use of it.
"""

import pytest

from popcorn_tpu.data.feed_select import (
    FeedGateInputs,
    gate_report,
    prefer_rotation,
)


def _g(n_samples, **kw):
    # BENCH_r04's measured configuration: the 4608^2 bench region's four
    # seasonal S2(u16)+S1(f32) slices are ~420 MB each (resident_layout
    # slice_bytes at hp=wp~5120), the degraded tunnel ran ~27 MB/s up,
    # and the host feed delivered 4.76 samples/s.
    kw.setdefault("swap_bytes", 1_680_000_000)
    kw.setdefault("link_bytes_per_s", 27e6)
    kw.setdefault("host_items_per_s", 4.76)
    return FeedGateInputs(n_samples=n_samples, **kw)


def test_host_wins_at_bench_scale():
    """124 samples/epoch at BENCH_r04's measured rates: the host epoch
    (26 s) beats rotation's ~62 s of fixed swap uploads — the exact
    configuration the round-4 bench showed the ungated choice losing
    (1.74 vs 4.76 samples/s)."""
    g = _g(124)
    assert g.host_epoch_s() == pytest.approx(124 / 4.76)
    assert g.rotation_epoch_s() > g.host_epoch_s()
    assert not prefer_rotation(g)


def test_rotation_wins_at_country_scale():
    """Thousands of samples/epoch (full census tables — rwa has ~400
    admin regions x revisits, che ~2500): the fixed swap cost amortizes
    and rotation's on-device assembly wins."""
    assert prefer_rotation(_g(4000))


def test_crossover_is_where_the_math_says():
    """The flip happens exactly where rotation_epoch_s == host_epoch_s:
    swap/link = n * (1/host - 1/dev)  =>  n* ~ 336 at these rates."""
    g0 = _g(1)
    per_sample_gain = 1 / g0.host_items_per_s - 1 / g0.dev_items_per_s
    n_star = g0.swap_bytes / g0.link_bytes_per_s / per_sample_gain
    assert not prefer_rotation(_g(int(n_star) - 2))
    assert prefer_rotation(_g(int(n_star) + 2))


def test_fast_link_prefers_rotation_even_small_epochs():
    """On a healthy PCIe-class link (10 GB/s) the swaps cost ~0.2 s and
    rotation wins even tiny epochs."""
    assert prefer_rotation(_g(32, link_bytes_per_s=1e10))


def test_gate_report_mentions_both_sides():
    r = gate_report(_g(124))
    assert "rotation" in r and "host" in r and "MB/s" in r


@pytest.fixture()
def gate_synth(tmp_path):
    from popcorn_tpu.data.synthetic import make_synthetic_region

    return make_synthetic_region(
        str(tmp_path / "d"), "rwa", height=320, width=448, seed=7,
    )


def _trainer(synth, tmp_path, **tkw):
    from popcorn_tpu.config import ModelConfig, TrainConfig
    from popcorn_tpu.train.trainer import Trainer

    tcfg = TrainConfig(
        target_regions=(), target_regions_train=("rwa",),
        train_level=("coarse",), save_dir=str(tmp_path / "out"),
        device_feed="auto", **tkw,
    )
    return Trainer(
        synth, ModelConfig(pretrained=False), tcfg,
        inference_patch=128, inference_overlap=16,
    )


def _starve_full_residency(monkeypatch):
    """Budget that admits one rotating slice (+swap transient) but not the
    full four-season stack, so the trainer's chain reaches the gate."""
    import popcorn_tpu.data.device_weaksup as dw

    monkeypatch.setattr(dw, "_effective_budget", lambda b: 20e6)


def test_trainer_gate_picks_host_on_slow_link(
    monkeypatch, gate_synth, tmp_path
):
    """Full residency budget-starved + a link so slow the per-epoch swap
    re-uploads dominate: the gate lands the trainer on the HOST feed
    (previously it would pick rotation unconditionally)."""
    from popcorn_tpu.data.device_weaksup import DeviceWeaksupFeed

    _starve_full_residency(monkeypatch)
    monkeypatch.setenv("POPCORN_FEED_GATE_LINK_MBPS", "0.5")
    monkeypatch.setenv("POPCORN_FEED_GATE_HOST_SPS", "4.76")
    tr = _trainer(gate_synth, tmp_path)
    assert not isinstance(tr.feed, DeviceWeaksupFeed)


def test_trainer_gate_lets_fast_link_rotate(monkeypatch, gate_synth, tmp_path):
    """Same starved budget, but a link fast enough that rotation's
    estimate wins: the trainer builds the rotating feed."""
    from popcorn_tpu.data.device_weaksup import DeviceWeaksupFeed

    _starve_full_residency(monkeypatch)
    monkeypatch.setenv("POPCORN_FEED_GATE_LINK_MBPS", "10000")
    monkeypatch.setenv("POPCORN_FEED_GATE_HOST_SPS", "4.76")
    tr = _trainer(gate_synth, tmp_path)
    assert isinstance(tr.feed, DeviceWeaksupFeed)
    assert tr.feed._rotating


def test_trainer_gate_off_restores_unconditional_rotation(
    monkeypatch, gate_synth, tmp_path
):
    """feed_gate=off keeps the legacy behavior: rotation whenever it
    fits, regardless of the measured rates."""
    from popcorn_tpu.data.device_weaksup import DeviceWeaksupFeed

    _starve_full_residency(monkeypatch)
    monkeypatch.setenv("POPCORN_FEED_GATE_LINK_MBPS", "0.5")
    monkeypatch.setenv("POPCORN_FEED_GATE_HOST_SPS", "4.76")
    tr = _trainer(gate_synth, tmp_path, feed_gate="off")
    assert isinstance(tr.feed, DeviceWeaksupFeed)
    assert tr.feed._rotating
