"""Checkpoint / resume for solver state.

The reference has no checkpointing at all — solver state lives only in
RAM/VRAM and dies with the process (SURVEY.md §5).  Here the full state is a
small pytree of arrays (x, g, the (m, d) ring, ring metadata, counters), so a
checkpoint is a single .npz file; resume feeds it straight back into
``solve_from_state`` and continues bit-for-bit (ring pointers and counters
are part of the state).

Plain numpy .npz (not orbax): the state is a handful of arrays, versioned
with an explicit schema key, and loadable without JAX.
"""
from __future__ import annotations

import io as _io
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..types import LBFGSState

_SCHEMA = "tpu-lbfgs-state-v1"
_FIELDS = LBFGSState._fields


def save_state(path, state: LBFGSState) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, __schema__=np.asarray(_SCHEMA), **arrays)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash


def load_state(path, dtype=None) -> LBFGSState:
    with np.load(Path(path), allow_pickle=False) as z:
        schema = str(z["__schema__"])
        if schema != _SCHEMA:
            raise ValueError(f"unknown checkpoint schema {schema!r}")
        vals = {}
        for f in _FIELDS:
            a = z[f]
            if dtype is not None and a.dtype.kind == "f":
                a = a.astype(dtype)
            vals[f] = jnp.asarray(a)
    return LBFGSState(**vals)
