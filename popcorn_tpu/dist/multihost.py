"""Real multi-process multihost execution: worker + launcher.

The reference has no distributed code at all (SURVEY.md §2.2); the
``--multihost`` CLI flag rides ``make_multihost_mesh`` (mesh.py), whose
DCN x ICI layout needs more than one process to exist. This module makes
that path executable and testable without a real pod:

  * ``worker_main`` — run inside each spawned process: hermetic CPU
    platform with N virtual local devices, ``jax.distributed.initialize``
    against a localhost coordinator, build the hybrid mesh, run ONE
    deterministic data-parallel train step, print the loss and the
    cross-process-gathered popcount sum;
  * ``launch_workers`` — spawn ``num_processes`` localhost workers and
    collect their printed results (used by ``__graft_entry__.
    dryrun_multihost`` and tests/test_multihost_procs.py).

The demo batch/model are identical to ``dryrun_multichip``'s, so the
2-process x 4-device result can be compared against the single-process
8-device step.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from typing import List, Tuple

import numpy as np

# one deterministic tiny workload, shared by the single-process dry run
# comparison and every worker
_B, _H, _W = 8, 64, 64


def demo_batch():
    rng = np.random.default_rng(0)
    ids = np.tile(
        np.arange(1, _B + 1, dtype=np.float32)[:, None, None], (1, _H, _W)
    )
    return {
        "S2": rng.uniform(0, 4000, (_B, _H, _W, 4)).astype(np.float32),
        "S1": rng.uniform(-25, 0, (_B, _H, _W, 2)).astype(np.float32),
        "admin_mask": ids,
        "census_idx": np.arange(1, _B + 1, dtype=np.float32),
        "y": rng.uniform(10, 1000, (_B,)).astype(np.float32),
        "photometric": np.asarray([0.0, 1.0, 0.0, 1.0], np.float32),
    }


def run_demo_step(mesh) -> Tuple[float, float]:
    """One data-parallel train step of the demo workload on ``mesh``.

    Returns (loss, popcount_sum); popcount is batch-sharded, so the sum is
    taken through the multihost-safe gather (exercising ``fetch_to_host``
    on a genuinely cross-process-sharded array when processes > 1)."""
    import jax

    from ..config import ModelConfig, TrainConfig
    from ..data.normalize import NormStats
    from ..nn.init import init_popcorn
    from ..train.state import make_optimizer, make_train_step
    from .mesh import device_put_global, fetch_to_host, replicated, shard_batch

    mcfg = ModelConfig(pretrained=False, fused_head=False)
    tcfg = TrainConfig(weak_batch_size=_B)
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = make_train_step(mcfg, tcfg, consts, NormStats(), optimizer)

    with mesh:
        dev_batch = shard_batch(
            demo_batch(), mesh,
            batch_keys=("S2", "S1", "admin_mask", "census_idx", "y"),
        )
        rep = replicated(mesh)
        params = jax.tree.map(lambda a: device_put_global(a, rep), params)
        opt_state = jax.tree.map(lambda a: device_put_global(a, rep), opt_state)
        new_params, _, aux = step(params, opt_state, dev_batch, jax.random.PRNGKey(7))
        jax.block_until_ready(new_params)
        loss = float(aux["optimization_loss"])
        pop_sum = float(fetch_to_host(aux["popcount"]).sum())
    return loss, pop_sum


def run_demo_eval(local_devices: int) -> float:
    """2-D (data x ensemble) Bag-of-POPCORN patch fold on the multihost
    mesh (VERDICT r4 #6): members shard over 'ensemble', patches over a
    'data' axis that SPANS the processes. Returns the global
    dense_sum total — identical on every worker when the cross-process
    fold is correct (asserted by dryrun_multihost). Mirrors the
    single-process 2-D section of __graft_entry__.dryrun_multichip;
    reference behavior being distributed: run_eval.py:102-135."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import ModelConfig
    from ..data.normalize import NormStats
    from ..infer.sliding import (
        make_patch_forward,
        pad_stacked_members,
        stack_ensemble,
    )
    from ..nn.init import init_popcorn
    from .mesh import device_put_global, fetch_to_host, make_multihost_mesh

    mcfg = ModelConfig(pretrained=False, fused_head=False)
    params, consts = init_popcorn(jax.random.PRNGKey(0), mcfg)
    ne = 2
    nd = max(1, local_devices // ne)
    mesh2 = make_multihost_mesh(n_data_per_host=nd, n_ensemble=ne)
    members = [
        jax.tree.map(lambda a, s=s: a * (1.0 + 0.01 * s), params)
        for s in range(3)
    ]
    stacked = pad_stacked_members(stack_ensemble(members), 3, ne)
    rng = np.random.default_rng(0)
    pb, ph, pw = mesh2.shape["data"], 64, 64
    with mesh2:
        bs = NamedSharding(mesh2, P("data"))
        es = NamedSharding(mesh2, P("ensemble"))
        batch = {
            "S2": device_put_global(
                rng.uniform(0, 4000, (pb, ph, pw, 4)).astype(np.float32), bs
            ),
            "S1": device_put_global(
                rng.uniform(-25, 0, (pb, ph, pw, 2)).astype(np.float32), bs
            ),
            "mask": device_put_global(np.ones((pb, ph, pw), np.float32), bs),
            "valid": device_put_global(np.ones((pb,), bool), bs),
        }
        stacked = jax.tree.map(lambda a: device_put_global(a, es), stacked)
        fwd = make_patch_forward(mcfg, consts, NormStats(), 3, mesh=mesh2)
        maps = fwd(stacked, batch)
        dense = fetch_to_host(maps["dense_sum"])
    return float(np.asarray(dense).sum())


def worker_main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    a = ap.parse_args(argv)

    # hermetic CPU, same discipline as __graft_entry__._provision_devices:
    # never initialize the ambient accelerator platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={a.local_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=a.coordinator,
        num_processes=a.num_processes,
        process_id=a.process_id,
    )
    assert jax.process_count() == a.num_processes
    assert jax.local_device_count() == a.local_devices

    from .mesh import make_multihost_mesh

    mesh = make_multihost_mesh(n_data_per_host=a.local_devices)
    assert mesh.shape["data"] == a.num_processes * a.local_devices
    loss, pop_sum = run_demo_step(mesh)
    ens_sum = run_demo_eval(a.local_devices)
    print(
        f"MULTIHOST_OK pid={a.process_id} loss={loss:.6f} popsum={pop_sum:.4f}"
        f" enssum={ens_sum:.4f}",
        flush=True,
    )
    jax.distributed.shutdown()


def launch_workers(
    num_processes: int = 2,
    local_devices: int = 4,
    port: int = 0,
    timeout: float = 1500.0,
) -> List[Tuple[float, float, float]]:
    """Spawn localhost worker processes; return [(loss, popsum, enssum), ...].

    Raises on any worker failure, with both workers' output attached."""
    import socket

    if port == 0:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    coordinator = f"127.0.0.1:{port}"
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        # each worker provisions its own virtual CPU devices; scrub any
        # inherited device-count flag so counts don't multiply
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "popcorn_tpu.dist.multihost",
                    "--coordinator", coordinator,
                    "--num-processes", str(num_processes),
                    "--process-id", str(pid),
                    "--local-devices", str(local_devices),
                ],
                cwd=repo_root,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    results = []
    for rc, out, err in outs:
        if rc != 0:
            raise RuntimeError(
                f"multihost worker failed (rc={rc}):\n{out}\n{err}"
            )
        m = re.search(
            r"MULTIHOST_OK pid=\d+ loss=([-\d.einf]+) popsum=([-\d.einf]+)"
            r" enssum=([-\d.einf]+)",
            out,
        )
        if not m:
            raise RuntimeError(f"worker produced no result line:\n{out}\n{err}")
        results.append((float(m.group(1)), float(m.group(2)), float(m.group(3))))
    return results


if __name__ == "__main__":
    worker_main()
