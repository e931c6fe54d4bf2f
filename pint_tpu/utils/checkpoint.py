"""Checkpoint/resume for solver state.

The reference library is stateless (SURVEY.md section 5: no
checkpoint/resume subsystem); for this framework the persistent state is the
MPC iterate -- packed control words plus the quantized-QP description -- and
long batched sweeps want cheap periodic snapshots.

Format: a single ``.npz`` with the packed words (bit-exact uint words), the
lane widths, and solver metadata.  Orbax is intentionally not required: the
state is a flat pytree of integer arrays, np.savez is bit-exact, dependency-
free and multi-host friendly (each host saves its addressable shards with an
index suffix).
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np

from pint_tpu.layout import PackedLayout
from pint_tpu.packed import PackedArray

__all__ = ["save_packed", "load_packed", "save_solver_state", "load_solver_state"]


def save_packed(path, arr: PackedArray) -> None:
    """Snapshot a PackedArray (words + layout) to ``path``.npz."""
    np.savez(
        path,
        words=np.asarray(arr.word),
        widths=np.asarray(arr.layout.widths, np.int64),
    )


def load_packed(path) -> PackedArray:
    with np.load(path) as z:
        layout = PackedLayout(*[int(w) for w in z["widths"]])
        words = z["words"]
    import jax.numpy as jnp

    return PackedArray.from_words(layout, jnp.asarray(words))


def save_solver_state(
    path,
    u_words,
    g_pre,
    *,
    iters_done: int,
    meta: Optional[dict] = None,
) -> None:
    """Snapshot an in-flight PGD solve (iterate + linear term + progress).

    On multi-host runs, pass this host's addressable shard and a per-host
    path; the words are integer-exact so resume reproduces the exact
    trajectory the uninterrupted solve would have taken (the iteration is
    deterministic, tests/test_parallel.py).
    """
    np.savez(
        path,
        u_words=np.asarray(u_words),
        g_pre=np.asarray(g_pre),
        iters_done=np.int64(iters_done),
        meta=json.dumps(meta or {}),
    )


def load_solver_state(path) -> Tuple[np.ndarray, np.ndarray, int, dict]:
    with np.load(path) as z:
        return (
            z["u_words"],
            z["g_pre"],
            int(z["iters_done"]),
            json.loads(str(z["meta"])),
        )
