"""Full-state checkpointing with orbax.

The reference persists only a best-validation parameter state-dict
(src/models/simulators.py:278-289) — no optimizer state, no mid-epoch resume.
Here the msgpack params file keeps the reference's naming contract
(train.trainer.save_params/checkpoint_path), and this module adds full
``TrainState`` checkpoints (params + optimizer state + epoch/patience
counters) so an interrupted run resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    HAVE_ORBAX = True
except Exception:  # pragma: no cover
    HAVE_ORBAX = False


def _prune_old_steps(directory: str, keep: int) -> None:
    """Drop all but the newest ``keep`` step checkpoints — restore only ever
    reads the latest, so older full TrainStates (params + Adam moments) are
    dead weight that would otherwise grow a long resumable run by GBs."""
    import shutil

    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            stem = name[5:].removesuffix(".pkl")
            if stem.isdigit():
                steps.append((int(stem), name))
    for _, name in sorted(steps)[:-keep] if keep else []:
        path = os.path.join(directory, name)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.remove(path)
            except OSError:
                pass


def save_train_state(directory: str, step: int, params: Any, opt_state: Any,
                     extra: Optional[dict] = None, keep: int = 2) -> str:
    """Write a resumable checkpoint under ``directory/step_{step}``; the
    newest ``keep`` steps are retained (0 = keep all)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    payload = {
        "params": params,
        "opt_state": opt_state,
        "extra": dict(extra or {}),
    }
    if HAVE_ORBAX:
        with ocp.PyTreeCheckpointer() as ckptr:
            path = os.path.join(directory, f"step_{step}")
            ckptr.save(path, payload, force=True)
        _prune_old_steps(directory, keep)
        return path
    # flat-numpy fallback
    import pickle

    path = os.path.join(directory, f"step_{step}.pkl")
    host = jax.tree_util.tree_map(np.asarray, payload)
    with open(path, "wb") as f:
        pickle.dump(host, f)
    _prune_old_steps(directory, keep)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            stem = name[5:].removesuffix(".pkl")
            if stem.isdigit():
                steps.append(int(stem))
    return max(steps) if steps else None


def restore_train_state(directory: str, template: Any,
                        step: Optional[int] = None) -> Optional[Any]:
    """Restore the latest (or given) step; returns None if no checkpoint."""
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
    if step is None:
        return None
    if HAVE_ORBAX:
        path = os.path.join(directory, f"step_{step}")
        if os.path.exists(path):
            with ocp.PyTreeCheckpointer() as ckptr:
                return ckptr.restore(path, item=template)
    import pickle

    path = os.path.join(directory, f"step_{step}.pkl")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)
