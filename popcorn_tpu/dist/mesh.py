"""Device mesh and sharding helpers — the collectives layer.

The reference is single-GPU with no distributed code (SURVEY.md §2.2); this
module supplies the idiomatic TPU equivalents:

  * a 1-D ``data`` mesh over ICI for data-parallel training and
    patch-sharded inference (SPMD via jit + NamedSharding — XLA inserts
    the psum for gradient sync automatically);
  * an optional ``ensemble`` axis for Bag-of-POPCORN members
    (run_eval.py:49-53 evaluates 5 members sequentially on one GPU; on a
    mesh each member/patch pair lands on its own chip);
  * spatial ('sp') sharding of a frame's row axis for whole-frame
    inference and over-HBM training crops (shard_batch_spatial,
    infer/spatial.py) — XLA inserts the conv halo exchanges.

Tensor and pipeline parallelism are deliberately ABSENT: the model's
widest layer is 64 channels (head 1x1 convs) and the UNet streams are
8/16 channels (SURVEY.md §2.4) — a channel shard would put <1 MXU tile
per chip and pay an all-reduce per layer, and a layer pipeline would
bubble on a 2-deep UNet. The scaling playbook's recipe for this shape
is exactly the composition shipped here: patches x members x rows
(data x ensemble x spatial) saturates a pod at ~1650-way parallelism on
a country eval before TP/PP could contribute; the reference's own
"model-parallel analogue" (memory-tier grad freezing, run_train.py:
190-198) is instead superseded by spatial training + --remat.

All helpers degrade gracefully to single-device when the mesh is None.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    devices: Optional[Sequence] = None,
    n_ensemble: int = 1,
) -> Mesh:
    """Device mesh over ICI.

    ``n_ensemble=1`` (default): 1-D ``('data',)`` mesh for data-parallel
    training / patch-sharded inference. ``n_ensemble>1``: 2-D
    ``('data','ensemble')`` mesh — Bag-of-POPCORN members shard over
    'ensemble' while the patch batch shards over 'data', so an 8-chip pod
    evaluates member x patch pairs concurrently (the reference runs the 5
    members sequentially on one GPU, run_eval.py:108-115). 'ensemble' is
    the minor (fastest-varying) axis so each member group's patch
    collectives ride contiguous ICI neighbours.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_ensemble <= 1:
        n = n_data or len(devices)
        if n > len(devices):
            raise ValueError(f"requested {n} devices, only {len(devices)} available")
        return Mesh(np.asarray(devices[:n]), axis_names=("data",))
    nd = n_data or max(1, len(devices) // n_ensemble)
    need = nd * n_ensemble
    if need > len(devices):
        raise ValueError(
            f"requested {nd}x{n_ensemble} mesh, only {len(devices)} devices available"
        )
    return Mesh(
        np.asarray(devices[:need]).reshape(nd, n_ensemble),
        axis_names=("data", "ensemble"),
    )


def ensemble_size(mesh: Optional[Mesh]) -> int:
    if mesh is None or "ensemble" not in mesh.axis_names:
        return 1
    return mesh.shape["ensemble"]


def make_multihost_mesh(
    n_data_per_host: Optional[int] = None, n_ensemble: int = 1
) -> Mesh:
    """Multi-host mesh: data-parallel over hosts (DCN) x data/ensemble
    within each host's slice (ICI).

    Call after ``jax.distributed.initialize()`` on every host. The
    gradient psum then runs hierarchically: XLA reduces within each ICI
    slice first and crosses DCN once per step, which is the layout the
    scaling playbook prescribes (data-parallel across the slow network,
    everything bandwidth-hungry on ICI). Degrades to a single-host
    ('data',)/('data','ensemble') mesh under one process, so the training
    CLI path is identical either way.
    """
    n_hosts = jax.process_count()
    local = jax.local_device_count()
    nd = n_data_per_host or max(1, local // n_ensemble)
    if n_hosts == 1:
        return make_mesh(nd, n_ensemble=n_ensemble)
    from jax.experimental import mesh_utils

    try:
        if n_ensemble > 1:
            devices = mesh_utils.create_hybrid_device_mesh(
                (nd, n_ensemble), (n_hosts, 1), devices=jax.devices()
            )
            # flatten the (host, data) axes into one global 'data' axis
            devices = devices.reshape(n_hosts * nd, n_ensemble)
            return Mesh(devices, axis_names=("data", "ensemble"))
        devices = mesh_utils.create_hybrid_device_mesh(
            (nd,), (n_hosts,), devices=jax.devices()
        )
        return Mesh(devices.reshape(-1), axis_names=("data",))
    except ValueError:
        # create_hybrid_device_mesh groups by the accelerator's
        # ``slice_index`` attribute, which CPU (and some single-slice)
        # platforms don't expose. Same layout by hand: group devices by
        # process so each host's ICI block is contiguous on the 'data'
        # axis — the gradient psum then reduces within each host's block
        # before crossing DCN once.
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        if len(devs) < n_hosts * nd * n_ensemble:
            raise ValueError(
                f"need {n_hosts}x{nd}x{n_ensemble} devices, have {len(devs)}"
            )
        arr = np.array(devs[: n_hosts * nd * n_ensemble])
        if n_ensemble > 1:
            return Mesh(
                arr.reshape(n_hosts * nd, n_ensemble),
                axis_names=("data", "ensemble"),
            )
        return Mesh(arr, axis_names=("data",))


def device_put_global(v, sharding):
    """``jax.device_put`` that also works when the sharding spans processes.

    Contract: every process passes the same GLOBAL host value (the feeds
    are deterministic, so each host materializes the identical batch); each
    process then transfers only its addressable shards. Single-process this
    is a plain device_put. Already-committed ``jax.Array``s reshard
    device-to-device (no host round-trip) in either case."""
    if isinstance(v, jax.Array) and v.committed:
        return jax.device_put(v, sharding)
    if jax.process_count() == 1:
        return jax.device_put(v, sharding)
    arr = np.asarray(v)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def fetch_to_host(x):
    """``np.asarray`` that is safe for cross-process-sharded arrays.

    Under a multihost mesh the 'data' axis spans processes, so outputs of
    the train/eval steps are sharded across non-addressable devices and a
    bare ``np.asarray`` raises RuntimeError on the first batch. Gather the
    global value first (``process_allgather`` is collective: every process
    must call it on the same arrays in the same order). Single-process
    (including the virtual CPU mesh) this is a plain asarray."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda a: np.asarray(multihost_utils.process_allgather(a, tiled=True)),
            x,
        )
    return jax.tree.map(np.asarray, x)


def batch_sharding(mesh: Optional[Mesh]):
    """NamedSharding that splits the leading (batch) axis across 'data'."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Optional[Mesh], *, batch_keys: Sequence[str]) -> Dict:
    """device_put a host batch: listed keys split on axis 0, rest replicated.

    Arrays already committed with the target sharding pass through — the
    device-resident training feed (data/device_weaksup.py) assembles its
    batches mesh-sharded, so the trainer's put is a no-op for them."""
    if mesh is None:
        return batch
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if not isinstance(v, (np.ndarray, jax.Array)):
            out[k] = v
            continue
        want = bs if k in batch_keys else rep
        if isinstance(v, jax.Array) and v.sharding == want:
            out[k] = v
            continue
        out[k] = device_put_global(v, want)
    return out


def shard_batch_spatial(
    batch: Dict, mesh: Optional[Mesh], *, row_keys: Sequence[str]
) -> Dict:
    """device_put a host batch for SPATIALLY-sharded training: listed
    (B,H,W[,C]) keys split on the ROW axis (axis 1) over 'data', the rest
    replicated. XLA's SPMD partitioner inserts the conv/pool halo
    exchanges and psums the spatial loss reductions — one census-region
    crop larger than a single chip's HBM trains across the mesh instead
    of being tier-skipped (the reference drops samples above -lim3,
    run_train.py:190-198)."""
    if mesh is None:
        return batch
    rows = NamedSharding(mesh, P(None, "data"))
    rep = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if not isinstance(v, (np.ndarray, jax.Array)):
            out[k] = v
            continue
        sh = rows if (k in row_keys and np.ndim(v) >= 3) else rep
        out[k] = device_put_global(v, sh)
    return out


def pad_batch_to_multiple(batch: Dict, multiple: int, batch_keys: Sequence[str]) -> Dict:
    """Pad the leading axis so it divides the mesh size; adds/extends a
    'valid' bool mask so padded rows are ignored downstream."""
    some = next(k for k in batch_keys if k in batch)
    b = batch[some].shape[0]
    rem = (-b) % multiple
    if rem == 0:
        if "valid" not in batch:
            batch = dict(batch)
            batch["valid"] = np.ones(b, bool)
        return batch
    out = dict(batch)
    for k in batch_keys:
        if k in batch:
            v = batch[k]
            pad = np.repeat(v[-1:], rem, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
    valid = batch.get("valid", np.ones(b, bool))
    out["valid"] = np.concatenate([valid, np.zeros(rem, bool)])
    return out
