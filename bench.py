#!/usr/bin/env python
"""Benchmark: Bag-of-POPCORN ensemble inference throughput on one chip.

Headline metric: 2048x2048 S1+S2 patches/sec through the FULL 5-member
ensemble (vmapped members, fused Pallas head, bf16 conv compute) — the
unit of work that dominates country-scale map production (run_eval path,
BASELINE.md north star: full-Rwanda < 5 min on v5e-8).

vs_baseline: the reference evaluates the 5 members sequentially per patch
on a single 24 GB GPU (run_eval.py:108-115); from the published training
times (~8 h Rwanda, README.md:185) and the sequential-ensemble eval loop
we estimate the reference at ~1.2 ensemble-patches/sec. That estimate is
the denominator; >1.0 means faster than the reference pipeline.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

REFERENCE_ESTIMATE_PATCHES_PER_SEC = 1.2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compile cache: the packed-engine graphs are compile-heavy
    # through the remote-compile tunnel; cache them across runs.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from popcorn_tpu.config import ModelConfig, find_dda_checkpoint
    from popcorn_tpu.data.normalize import NormStats
    from popcorn_tpu.infer.sliding import make_patch_forward, stack_ensemble
    from popcorn_tpu.nn.init import init_head, init_popcorn

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")
    on_tpu = backend == "tpu"

    mcfg = ModelConfig(
        pretrained=True,
        fused_head=on_tpu,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )

    # 5 ensemble members: shared pretrained DDA extractor, per-seed heads
    # (the Bag-of-POPCORN seeds 1600-1604, README.md:200).
    if find_dda_checkpoint():
        from popcorn_tpu.compat.torch_convert import load_popcorn_from_dda

        params0, consts = load_popcorn_from_dda(mcfg)
    else:
        params0, consts = init_popcorn(jax.random.PRNGKey(1600), mcfg)
    members = []
    for seed in range(1600, 1605):
        m = dict(params0)
        m["head"] = init_head(jax.random.PRNGKey(seed), biasinit=0.9407)
        members.append(m)

    stats = NormStats()
    n_members = len(members)
    stacked = stack_ensemble(members)
    # the production eval path: packed member fold + packed-space device
    # stitch-add (maps never leave the space-to-depth layout; one unpack
    # runs per region at finalize — infer/sliding.py)
    from popcorn_tpu.infer.sliding import _ACC_KEYS, _make_packed_stitch_adds

    fwd = make_patch_forward(mcfg, consts, stats, n_members, packed_output=True)

    ips = 2048
    f = 4
    batch = 1
    rng = np.random.default_rng(0)
    dev_batch = {
        "S2": jnp.asarray(rng.uniform(0, 4000, (batch, ips, ips, 4)), jnp.float32),
        "S1": jnp.asarray(rng.uniform(-25, 0, (batch, ips, ips, 2)), jnp.float32),
        "mask": jnp.ones((batch, ips, ips), jnp.float32),
        "valid": jnp.ones((batch,), jnp.float32),
    }
    region = 4 * 2048  # a 4x4-patch region's accumulators stay on device
    accs = {
        k: jnp.zeros((region // f, (region // f) * f * f), jnp.float32)
        for k in _ACC_KEYS
    }
    add_aligned, _ = _make_packed_stitch_adds(f)
    xy0 = jnp.asarray((0, 0), jnp.int32)

    log("compiling...")
    t0 = time.time()
    res = fwd(stacked, dev_batch)
    accs = add_aligned(accs, res, xy0, 0)
    jax.block_until_ready(accs)
    log(f"first call (compile+run): {time.time() - t0:.1f}s")

    # warmup + timed
    for _ in range(2):
        accs = add_aligned(accs, fwd(stacked, dev_batch), xy0, 0)
    jax.block_until_ready(accs)
    iters = 10 if on_tpu else 2
    t0 = time.time()
    for _ in range(iters):
        res = fwd(stacked, dev_batch)
        accs = add_aligned(accs, res, xy0, 0)
    jax.block_until_ready(accs)
    dt = time.time() - t0
    pps = iters * batch / dt
    log(f"{iters} iters in {dt:.3f}s -> {pps:.3f} ensemble-patches/s")
    log(
        f"projected full-Rwanda (~330 patches x4 seasons): "
        f"{330 * 4 / pps / 60:.2f} min single-chip"
    )

    # ---- train-step benchmark (fwd+bwd at a training bucket shape) ----------
    from popcorn_tpu.config import TrainConfig
    from popcorn_tpu.train.state import make_optimizer, make_train_step

    tcfg = TrainConfig(weak_batch_size=2)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params0)
    step = make_train_step(mcfg, tcfg, consts, stats, optimizer)
    tb, th, tw = 2, 1024, 1024
    ids = np.tile(
        np.arange(1, tb + 1, dtype=np.float32)[:, None, None], (1, th, tw)
    )
    train_batch = jax.device_put({
        "S2": np.asarray(rng.uniform(0, 4000, (tb, th, tw, 4)), np.float32),
        "S1": np.asarray(rng.uniform(-25, 0, (tb, th, tw, 2)), np.float32),
        "admin_mask": ids,
        "census_idx": np.arange(1, tb + 1, dtype=np.float32),
        "y": np.asarray(rng.uniform(10, 1000, (tb,)), np.float32),
        "photometric": np.asarray([0.0, 1.0, 0.0, 1.0], np.float32),
    })
    key = jax.random.PRNGKey(0)
    p, o = params0, opt_state
    t0 = time.time()
    p, o, aux = step(p, o, train_batch, key)
    jax.block_until_ready(p)
    log(f"train-step first call (compile+run): {time.time() - t0:.1f}s")
    for _ in range(2):
        p, o, aux = step(p, o, train_batch, key)
    jax.block_until_ready(p)
    titers = 8 if on_tpu else 2
    t0 = time.time()
    for _ in range(titers):
        p, o, aux = step(p, o, train_batch, key)
    jax.block_until_ready(p)
    tdt = (time.time() - t0) / titers
    train_mpix = tb * th * tw / tdt / 1e6
    log(f"train step {tb}x{th}^2: {tdt * 1e3:.1f} ms ({train_mpix:.1f} Mpix/s fwd+bwd)")

    print(
        json.dumps(
            {
                "metric": "ensemble5_2048px_patches_per_sec",
                "value": round(pps, 4),
                "unit": "patches/s",
                # NOTE: estimate, not a measurement — derived from the
                # reference's published training times and its sequential
                # 5-member eval loop (see module docstring)
                "vs_baseline": round(pps / REFERENCE_ESTIMATE_PATCHES_PER_SEC, 3),
                "vs_baseline_is_estimate": True,
                "train_step_ms_2x1024": round(tdt * 1e3, 2),
                "train_mpix_per_sec": round(train_mpix, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
