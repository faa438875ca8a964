"""Measure steady-state training-feed throughput per data plane.

Standalone slice of bench.py's ``train_e2e`` stage so a single feed
variant can be timed on the chip without paying for the whole bench
(reference hot loop this measures: run_train.py:146-269). Each feed
runs one warmup epoch (compiles per bucket) and one timed epoch with
recompile counting, identical to bench.py::train_e2e_bench.

Usage:
    python tools/feed_bench.py --size 4608 --samples 128 \
        --feeds device,rotating
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4608)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument(
        "--feeds", default="host,device,rotating",
        help="comma list of host|device|rotating",
    )
    ap.add_argument(
        "--transport", default="exact", choices=("exact", "bf16"),
        help="data-plane dtype for float image modalities (see "
             "data/feed.py::transport_cast)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("POPCORN_COMPILE_CACHE", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import bench
    from popcorn_tpu.config import ModelConfig, TrainConfig, find_dda_checkpoint
    from popcorn_tpu.data.dataset import PopulationDataset
    from popcorn_tpu.data.device_weaksup import DeviceWeaksupFeed
    from popcorn_tpu.data.feed import WeaksupFeed
    from popcorn_tpu.data.normalize import NormStats
    from popcorn_tpu.nn.init import init_popcorn
    from popcorn_tpu.train.state import make_optimizer, make_train_step

    backend, devices = bench._guarded_backend_init()
    print(f"backend: {backend}, devices: {devices}", flush=True)
    on_tpu = backend == "tpu"
    mcfg = ModelConfig(
        pretrained=True,
        fused_head=on_tpu,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    if find_dda_checkpoint():
        from popcorn_tpu.compat.torch_convert import load_popcorn_from_dda

        params0, consts = load_popcorn_from_dda(mcfg)
    else:
        params0, consts = init_popcorn(jax.random.PRNGKey(1600), mcfg)

    paths = bench._ensure_bench_region(args.size)
    ds = PopulationDataset(
        paths, "rwa", mode="weaksup", split="all", train_level="coarse",
        s1=True, s2=True, nir=True, fourseasons=True,
        max_pix=10_000_000, max_pix_box=12_000_000,
    )
    tcfg = TrainConfig(weak_batch_size=2)
    feed_kw = dict(
        batch_size=2, bucket_ladder=tcfg.bucket_ladder, seed=1600,
        num_workers=1, max_samples=args.samples, transport=args.transport,
    )
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params0)
    step = make_train_step(mcfg, tcfg, consts, NormStats(), optimizer)

    import numpy as np

    from jax._src import monitoring as _mon

    def measure(feed, tag):
        def run_epoch(epoch):
            n, t0 = 0, time.time()
            p, o = params0, opt_state
            key = jax.random.PRNGKey(epoch)
            for batch in feed.epoch(epoch):
                dev = jax.device_put(
                    {k: v for k, v in batch.items()
                     if isinstance(v, (np.ndarray, jax.Array))}
                )
                key, sub = jax.random.split(key)
                p, o, aux = step(p, o, dev, sub)
                n += batch["y"].shape[0]
            jax.block_until_ready(p)
            return n, time.time() - t0

        n_warm, t_warm = run_epoch(1)
        print(f"[{tag}] warmup epoch: {n_warm} samples in {t_warm:.1f}s",
              flush=True)
        compile_events = []

        def _listener(name, **kw):
            if "compile" in name:
                compile_events.append(name)

        _mon.register_event_listener(_listener)
        n, dt = run_epoch(1)
        _mon.unregister_event_listener(_listener)
        sps = n / dt
        print(
            f"[{tag}] epoch: {n} samples in {dt:.1f}s -> {sps:.2f} "
            f"samples/s, recompiles: {len(compile_events)}",
            flush=True,
        )
        return {
            "samples_per_sec": round(sps, 3),
            "epoch_s": round(dt, 2),
            "n_samples": n,
            "recompiles_after_warmup": len(compile_events),
        }

    out = {}
    for name in args.feeds.split(","):
        name = name.strip()
        try:
            if name == "host":
                out[name] = measure(WeaksupFeed([ds], **feed_kw), name)
            elif name == "device":
                out[name] = measure(DeviceWeaksupFeed([ds], **feed_kw), name)
            elif name == "rotating":
                out[name] = measure(
                    DeviceWeaksupFeed([ds], rotate=True, **feed_kw), name
                )
            else:
                raise ValueError(f"unknown feed {name!r}")
        except Exception as e:  # Ineligible/OOM: report, keep going
            print(f"[{name}] unavailable: {e}", flush=True)
            out[name] = {"error": str(e)[:200]}
    ds.close()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
