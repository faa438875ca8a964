"""bench.py sizing/budget helpers: the round-end benchmark must always
emit its one-line JSON, so the GB-moving country-scale stages are sized
to the measured host<->device link and a wall-clock budget (observed
tunnel rates span 1.4 GB/s to 2 MB/s between sessions)."""

import importlib.util
import time

_spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_gen_estimate_quadratic(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_BENCH_DATA", str(tmp_path))
    e9, e4, e2 = (bench._gen_estimate_s(s) for s in (9216, 4608, 2304))
    assert e9 == 3200.0 and abs(e4 - e9 / 4) < 1 and abs(e2 - e9 / 16) < 1
    # cached region -> zero cost
    d = tmp_path / "4608"
    d.mkdir()
    (d / "ready_4608").touch()
    assert bench._gen_estimate_s(4608) == 0.0


def test_pick_bench_size(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_BENCH_DATA", str(tmp_path))
    for s in (9216, 4608, 2304):
        d = tmp_path / str(s)
        d.mkdir()
        (d / f"ready_{s}").touch()
    now = time.time()
    # healthy link, full budget -> biggest region
    assert bench._pick_bench_size((300.0, 30.0), now + 3300) == 9216
    # sick down-link: the 3-map fetch dominates -> smaller region
    assert bench._pick_bench_size((300.0, 0.1), now + 3300) == 4608
    assert bench._pick_bench_size((300.0, 0.01), now + 3300) == 2304
    # exhausted budget -> smallest region (stage checks then skip)
    assert bench._pick_bench_size((300.0, 30.0), now - 10) == 2304
