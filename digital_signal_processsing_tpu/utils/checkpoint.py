"""Checkpoint / resume for long-running work.

The reference's only resume mechanism is the append-mode CSV
(gpu_utils.h:188) — kept in harness/csvlog.py. This module adds what a
framework needs beyond that: atomic save/restore of adaptive-filter training
state (taps + optimizer state + step counter) so interrupted runs resume
exactly. Plain ``.npz`` with atomic rename — no service dependencies; the
tree layout is orbax-compatible if a deployment later swaps it in.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np


def save_training_state(path, taps, opt_state, step: int) -> None:
    """Atomically persist (taps, optimizer state pytree, step)."""
    path = Path(path)
    leaves, treedef = jax.tree.flatten(opt_state)
    payload = {
        "taps": np.asarray(taps),
        "step": np.asarray(step, np.int64),
        "num_leaves": np.asarray(len(leaves), np.int64),
        "treedef": np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
    }
    for i, leaf in enumerate(leaves):
        payload[f"leaf_{i}"] = np.asarray(leaf)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_training_state(path, opt_state_template):
    """Restore (taps, opt_state, step); template supplies the tree structure."""
    with np.load(Path(path)) as z:
        taps = z["taps"]
        step = int(z["step"])
        n = int(z["num_leaves"])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    _, treedef = jax.tree.flatten(opt_state_template)
    if treedef.num_leaves != n:
        raise ValueError(
            f"checkpoint has {n} leaves, template has {treedef.num_leaves} — "
            "optimizer mismatch"
        )
    # structure check, not just leaf count: two different optimizers can
    # share a leaf count and silently unflatten into the wrong slots
    with np.load(Path(path)) as z:
        if "treedef" in z:
            saved = bytes(z["treedef"].tobytes()).decode(errors="replace")
            if saved != repr(treedef):
                raise ValueError(
                    "checkpoint optimizer-state structure differs from the "
                    f"template:\n  saved:    {saved}\n  template: {repr(treedef)}"
                )
    return taps, jax.tree.unflatten(treedef, leaves), step


def save_pytree(path, tree) -> None:
    """Atomically persist ANY pytree of arrays (streaming states, params).

    Generalizes the training-state format: leaves as npz entries, structure
    restored from a template at load time. Atomic via write-then-rename
    (resume never sees a torn file).
    """
    path = Path(path)
    leaves, _ = jax.tree.flatten(tree)
    payload = {"num_leaves": np.asarray(len(leaves), np.int64)}
    for i, leaf in enumerate(leaves):
        payload[f"leaf_{i}"] = np.asarray(leaf)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_pytree(path, template):
    """Restore a pytree saved by :func:`save_pytree`; ``template`` supplies
    the structure (e.g. a freshly-initialized streaming state)."""
    with np.load(Path(path)) as z:
        n = int(z["num_leaves"])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    t_leaves, treedef = jax.tree.flatten(template)
    if treedef.num_leaves != n:
        raise ValueError(
            f"checkpoint has {n} leaves, template has {treedef.num_leaves}"
        )
    # dtype must match exactly: a silent astype (e.g. float64 checkpoint into
    # a float32 state, int32 into int16) truncates values and breaks the
    # bit-exact-resume guarantee
    for i, (leaf, tl) in enumerate(zip(leaves, t_leaves)):
        if hasattr(tl, "dtype") and np.asarray(leaf).dtype != np.dtype(tl.dtype):
            raise ValueError(
                f"checkpoint leaf {i} has dtype {np.asarray(leaf).dtype}, "
                f"template expects {np.dtype(tl.dtype)} — refusing a lossy "
                "cast; re-save the checkpoint or fix the template"
            )
    return jax.tree.unflatten(treedef, leaves)
