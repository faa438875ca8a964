"""Checkpoint save/resume via Orbax.

TPU equivalent of the reference's torch.save/load of
{model, epoch, iter, optimizer, scheduler} (run_train.py:445-476): the
full train state (params, optax state incl. the injected learning rate,
epoch, step) round-trips through an Orbax PyTree checkpoint. Eval-side
resume restores only params (run_eval.py:243-257) — use
``restore_params``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Save a pytree state dict to `path` (a directory)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    state = jax.tree.map(np.asarray, state)
    ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    """Restore a pytree state dict; `template` pins structure/dtypes."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if template is not None:
        import orbax.checkpoint as ocp

        template = jax.tree.map(np.asarray, template)
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


def restore_params(path: str):
    """Restore only the 'params' subtree (ensemble-member load)."""
    state = restore_checkpoint(path)
    return state["params"] if "params" in state else state
