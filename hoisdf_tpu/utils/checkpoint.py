"""Checkpoint save/resume (orbax).

Parity target: ``common/base.py:113-150`` — per-eval-epoch snapshots of
{epoch, network, optimizer, lr_scheduler}, resume from the latest snapshot in
the model dir (same latest-glob semantics; LR schedule state is derived from
the step counter here, so only params/batch_stats/opt_state/step persist).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


_SNAP_RE = re.compile(r"snapshot_(\d+)$")


def _snap_dir(model_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(model_dir), f"snapshot_{epoch}")


def save_snapshot(
    model_dir: str, epoch: int, state: Dict[str, Any]
) -> str:
    """Save {params, batch_stats, opt_state, step, epoch} under
    model_dir/snapshot_<epoch>."""
    path = _snap_dir(model_dir, epoch)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    return path


def latest_epoch(model_dir: str) -> Optional[int]:
    if not os.path.isdir(model_dir):
        return None
    epochs = []
    for name in os.listdir(model_dir):
        m = _SNAP_RE.match(name)
        if m:
            epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None


def restore_snapshot(
    model_dir: str, target: Dict[str, Any], epoch: Optional[int] = None
) -> Optional[Dict[str, Any]]:
    """Restore the given (or latest) snapshot; returns None if none exist.
    ``target`` provides the pytree structure/shardings to restore into."""
    if epoch is None:
        epoch = latest_epoch(model_dir)
        if epoch is None:
            return None
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(_snap_dir(model_dir, epoch), item=target)
    restored["epoch"] = epoch
    return restored
