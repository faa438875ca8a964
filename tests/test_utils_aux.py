"""Aux subsystem smoke tests: visualization, profiling, logging."""

import json
import os

import numpy as np

from popcorn_tpu.utils.log import MetricsLogger, NumberList, new_log
from popcorn_tpu.utils.profiling import Stopwatch, device_memory_stats
from popcorn_tpu.utils.viz import save_quicklook


def test_quicklook(tmp_path, rng):
    s2 = rng.uniform(0, 4000, (32, 32, 3)).astype(np.float32)
    s1 = rng.uniform(-25, 0, (32, 32)).astype(np.float32)
    prob = rng.random((32, 32)).astype(np.float32)
    pop = rng.random((32, 32)).astype(np.float32) * 5
    p = str(tmp_path / "ql.png")
    save_quicklook(p, s2=s2, s1=s1, builtup=prob, pop=pop)
    assert os.path.getsize(p) > 1000


def test_stopwatch_and_memstats():
    sw = Stopwatch()
    with sw.section("a"):
        sum(range(1000))
    with sw.section("a"):
        pass
    s = sw.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0
    # CPU devices have no memory_stats -> {}
    assert isinstance(device_memory_stats(), dict)


def test_new_log_and_metrics(tmp_path):
    folder, n, randn = new_log(str(tmp_path / "out"), {"lr": 1e-4})
    assert os.path.exists(os.path.join(folder, "args.csv"))
    lg = MetricsLogger(folder)
    lg.log({"loss": 1.5, "tag": "x"}, step=3)
    rec = json.loads(open(os.path.join(folder, "metrics.jsonl")).read())
    assert rec["loss"] == 1.5 and rec["step"] == 3

    nl = NumberList(3)
    nl.add([1, 2, 3, 4])
    assert nl.get() == [2.0, 3.0, 4.0]
