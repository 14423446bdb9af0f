"""Checkpoint / resume for solver state.

The reference has no checkpointing at all — solver state lives only in
RAM/VRAM and dies with the process (SURVEY.md §5).  Here the full state is a
small pytree of arrays (x, g, the (m, d) ring, ring metadata, counters), so a
checkpoint is a single .npz file; resume feeds it straight back into
``solve_from_state`` and continues bit-for-bit (ring pointers and counters
are part of the state).

Plain numpy .npz (not orbax): the state is a handful of arrays, versioned
with an explicit schema key, and loadable without JAX.

Two layouts:

``save_state`` / ``load_state``
    Single .npz, state gathered to host.  Right for single-device and
    small sharded states; on a giant sharded state the gather is the cost
    (6.7 GB at d=2^26) and on a multi-host mesh it FAILS outright
    (non-addressable shards).

``save_state_sharded`` / ``load_state_sharded``
    Per-shard layout with NO host gather (VERDICT r3 weak #2): a directory
    holding one ``shard-<process>.npz`` per process — each process writes
    only its own addressable, replica-0 shards — plus an ``index.json``
    mapping every chunk to its global slice (written last; its presence is
    the commit point).  Restore rebuilds the distributed state with
    ``jax.make_array_from_callback``: each device's slice is assembled from
    the intersecting saved chunks, so the mesh layout may differ between
    save and restore (more devices, fewer, or a different axis split).
    Multi-host: every process writes its own file; restoring needs the files
    covering the reading process's addressable slices (a shared filesystem,
    or same-layout restore from per-host local disks).
"""
from __future__ import annotations

import io as _io
import json
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
    # np.savez writes ml_dtypes extension dtypes (bfloat16 history rings —
    # the recommended config at giant d) as raw void '|V2', which np.load
    # hands back as unloadable bytes.  Store them as float32 (an EXACT
    # upcast; the f32 -> bf16 cast on load restores identical bits) and
    # record the original dtype per field so resume stays bit-exact.
    arrays, casts = {}, {}
    for f in _FIELDS:
        a = np.asarray(getattr(state, f))
        if a.dtype.kind == "V":            # ml_dtypes extension (bfloat16)
            casts[f] = str(a.dtype)
            a = a.astype(np.float32)
        arrays[f] = a
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, __schema__=np.asarray(_SCHEMA),
                 __casts__=np.asarray(json.dumps(casts)), **arrays)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash


def load_state(path, dtype=None) -> LBFGSState:
    with np.load(Path(path), allow_pickle=False) as z:
        schema = str(z["__schema__"])
        if schema != _SCHEMA:
            raise ValueError(f"unknown checkpoint schema {schema!r}")
        casts = json.loads(str(z["__casts__"])) if "__casts__" in z else {}
        vals = {}
        for f in _FIELDS:
            if f == "guards":
                # Pre-guard-counter checkpoints lack the field; counters
                # saved before a Guard extension are shorter — zero-extend
                # (same schema otherwise).
                from ..types import Guard
                if f not in z:
                    vals[f] = jnp.zeros((Guard.N,), jnp.int32)
                    continue
                a = np.asarray(z[f])
                if a.shape[-1] < Guard.N:
                    pad = [(0, 0)] * (a.ndim - 1) + \
                        [(0, Guard.N - a.shape[-1])]
                    a = np.pad(a, pad)
                vals[f] = jnp.asarray(a)
                continue
            a = z[f]
            if dtype is not None and a.dtype.kind == "f":
                a = a.astype(dtype)
            v = jnp.asarray(a)
            if f in casts and dtype is None:
                v = v.astype(casts[f])     # exact round-trip (see save_state)
            vals[f] = v
    return LBFGSState(**vals)


# --- sharded (per-process, gather-free) layout ----------------------------------

_SCHEMA_SHARDED = "tpu-lbfgs-state-sharded-v1"


def _norm_index(index, shape):
    """Slice tuple -> [[start, stop], ...] with Nones resolved."""
    out = []
    for sl, dim in zip(index, shape):
        out.append([int(sl.start or 0),
                    int(dim if sl.stop is None else sl.stop)])
    return out


def save_state_sharded(dir_path, state: LBFGSState) -> None:
    """Write this process's addressable shards of a (possibly distributed)
    state under ``dir_path`` — no host gather, no non-addressable access.

    Every process of a multi-host job calls this with the SAME dir_path
    (the call is COLLECTIVE in multi-process jobs: a barrier orders every
    shard write before process 0 publishes ``index.json``, the commit
    marker).  Each process stores one copy of every DISTINCT slice it can
    address (duplicate replicas deduped within the process, not across), so
    replicated leaves (scalars, ring metadata) appear in every process's
    file — a same-layout restore works from per-host local disks — while
    vector/history leaves tile the global array across the job.
    """
    import jax

    dir_path = Path(dir_path)
    dir_path.mkdir(parents=True, exist_ok=True)
    proc = jax.process_index()
    arrays, casts, fields, chunk_map = {}, {}, {}, {}
    for fname in _FIELDS:
        arr = getattr(state, fname)
        jarr = jnp.asarray(arr)
        gdtype = str(np.dtype(jarr.dtype)) if np.dtype(jarr.dtype).kind != "V" \
            else str(jarr.dtype)
        chunks = []
        seen = set()
        for i, sh in enumerate(jarr.addressable_shards):
            idx = _norm_index(sh.index, jarr.shape)
            key_idx = tuple(map(tuple, idx))
            if key_idx in seen:                 # replica within this process
                continue
            seen.add(key_idx)
            data = np.asarray(sh.data)
            key = f"{fname}__p{proc}__{i}"
            if data.dtype.kind == "V":          # ml_dtypes (bfloat16 ring)
                casts[key] = str(jarr.dtype)
                data = data.astype(np.float32)  # exact upcast (see save_state)
            arrays[key] = data
            chunks.append({"key": key, "index": idx})
        # Per-PROCESS chunk map: travels inside this process's own npz (the
        # coordinator cannot enumerate other hosts' shards), unioned at load.
        chunk_map[fname] = chunks
        fields[fname] = {"shape": [int(s) for s in jarr.shape],
                         "dtype": gdtype}
    shard_path = dir_path / f"shard-{proc}.npz"
    tmp = shard_path.with_suffix(".npz.tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, __schema__=np.asarray(_SCHEMA_SHARDED),
                 __casts__=np.asarray(json.dumps(casts)),
                 __chunks__=np.asarray(json.dumps(chunk_map)), **arrays)
    os.replace(tmp, shard_path)
    if jax.process_count() > 1:
        # Commit-marker ordering: every process's shard file must be durable
        # BEFORE index.json appears (a crash in the window would otherwise
        # leave a directory that LOOKS committed but cannot cover the
        # d-sharded slices).  save_state_sharded is collective, so the
        # barrier is safe; a second barrier below keeps other processes from
        # loading before the marker exists.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tpu_lbfgs_ckpt_shards_written")
    if proc == 0:
        # Stale-shard cleanup BEFORE the commit marker: re-saving into a
        # directory previously written by a job with MORE processes would
        # otherwise leave shard-N.npz files whose chunks cover the same
        # global slices with old data — a restore unioning them could
        # silently mix iterations (round-4 advisor finding).
        nproc = int(jax.process_count())
        for stale in dir_path.glob("shard-*.npz"):
            try:
                idx_no = int(stale.stem.split("-", 1)[1])
            except ValueError:
                continue
            if idx_no >= nproc:
                stale.unlink()
        index = {"schema": _SCHEMA_SHARDED,
                 "num_processes": nproc,
                 "fields": fields}
        tmp_idx = dir_path / "index.json.tmp"
        tmp_idx.write_text(json.dumps(index, indent=1))
        os.replace(tmp_idx, dir_path / "index.json")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tpu_lbfgs_ckpt_committed")


def load_state_sharded(dir_path, mesh, d_axis: str = "d",
                       batch_axis=None) -> LBFGSState:
    """Rebuild a distributed LBFGSState from a ``save_state_sharded``
    directory directly onto ``mesh`` — each device's slice is assembled from
    the intersecting saved chunks (jax.make_array_from_callback), so no
    process ever materializes the full state and the restore mesh may differ
    from the save mesh.

    Note (multi-host): every committed shard file
    (``shard-0..{num_processes-1}.npz`` per ``index.json``) is opened up
    front to read its chunk map — all files must therefore be readable on
    every restoring process (shared filesystem, or same-layout restore from
    per-host local disks where each host's own file covers its slices, with
    the replicated leaves present in every file).  Only chunk DATA that a
    local slice actually intersects is copied.  Shard files beyond
    num_processes are an error: they are stale leftovers from an earlier
    larger-job save (save_state_sharded deletes them, but a directory
    written by an older version may still carry them) and unioning their
    chunks could silently mix iterations.
    """
    import jax

    from ..dist.mesh import state_shardings

    dir_path = Path(dir_path)
    index = json.loads((dir_path / "index.json").read_text())
    if index.get("schema") != _SCHEMA_SHARDED:
        raise ValueError(f"unknown sharded-checkpoint schema "
                         f"{index.get('schema')!r}")
    shardings = state_shardings(mesh, d_axis, batch_axis=batch_axis)

    # Lazy per-file handles: {path: (npz, casts)}
    handles = {}

    def _file(proc_file: Path):
        if proc_file not in handles:
            z = np.load(proc_file, allow_pickle=False)
            casts = json.loads(str(z["__casts__"])) if "__casts__" in z else {}
            handles[proc_file] = (z, casts)
        return handles[proc_file]

    # Exactly the committed set: shard-0..N-1 per the index (NOT a glob —
    # see the stale-file note in the docstring).
    nproc = int(index.get("num_processes", 1))
    shard_files = [dir_path / f"shard-{p}.npz" for p in range(nproc)]
    missing = [str(p) for p in shard_files if not p.exists()]
    if missing:
        raise FileNotFoundError(
            f"sharded checkpoint {dir_path} is missing committed shard "
            f"files {missing} (index.json says num_processes={nproc})")
    extras = sorted(set(dir_path.glob("shard-*.npz")) - set(shard_files))
    if extras:
        raise ValueError(
            f"sharded checkpoint {dir_path} contains shard files beyond "
            f"index.json's num_processes={nproc}: "
            f"{[p.name for p in extras]} — stale leftovers from an earlier "
            f"save with more processes; delete them (their chunks cover "
            f"the same global slices with old data)")

    # Union of every process's chunk map: {field: [(key, index, file), ...]}.
    # Keys are unique per (field, process, shard-position); replicated leaves
    # appear once per process with identical bytes — any copy serves.
    all_chunks = {}
    for pf in shard_files:
        z, _ = _file(pf)
        per_proc = json.loads(str(z["__chunks__"])) if "__chunks__" in z \
            else {}
        for fname, chunks in per_proc.items():
            all_chunks.setdefault(fname, []).extend(
                (c["key"], c["index"], pf) for c in chunks)

    def _chunk_data(key, pf, gdtype):
        z, casts = _file(pf)
        data = z[key]
        # jnp.dtype resolves extension names ('bfloat16') that plain
        # numpy's dtype constructor rejects.
        if key in casts:
            data = data.astype(jnp.dtype(casts[key]))      # exact bf16
        elif data.dtype != jnp.dtype(gdtype):
            data = data.astype(jnp.dtype(gdtype))
        return data

    vals = {}
    try:
        for fname in _FIELDS:
            meta = index["fields"].get(fname)
            if fname == "guards":
                from ..types import Guard

                # Pre-counter checkpoints lack the field; shorter counter
                # vectors from before a Guard extension zero-extend.  The
                # counters are tiny and replicated — assemble on host.
                if meta is None:
                    g = np.zeros((Guard.N,), np.int32)
                else:
                    chunks_g = all_chunks.get(fname, [])
                    g = np.zeros(tuple(meta["shape"]), np.int32)
                    for key, idx, pf in chunks_g:
                        g[tuple(slice(lo, hi) for lo, hi in idx)] = \
                            _chunk_data(key, pf, meta["dtype"])
                    if g.shape[-1] < Guard.N:
                        g = np.pad(g, [(0, 0)] * (g.ndim - 1)
                                   + [(0, Guard.N - g.shape[-1])])
                vals[fname] = jax.device_put(g, getattr(shardings, fname))
                continue
            if meta is None:
                raise KeyError(f"field {fname} missing from {dir_path}")
            shape = tuple(meta["shape"])
            gdtype = meta["dtype"]

            chunks = all_chunks.get(fname, [])

            def cb(req_index, chunks=chunks, shape=shape, gdtype=gdtype):
                req = _norm_index(req_index, shape)
                out = None
                for key, idx, pf in chunks:
                    inter = [[max(a0, b0), min(a1, b1)]
                             for (a0, a1), (b0, b1) in zip(idx, req)]
                    if any(lo >= hi for lo, hi in inter):
                        continue
                    data = _chunk_data(key, pf, gdtype)
                    if out is None:
                        out = np.empty([hi - lo for lo, hi in req],
                                       dtype=data.dtype)
                        filled = np.zeros(out.shape, dtype=bool)
                    src = tuple(slice(lo - c0, hi - c0) for (lo, hi), (c0, _)
                                in zip(inter, idx))
                    dst = tuple(slice(lo - r0, hi - r0) for (lo, hi), (r0, _)
                                in zip(inter, req))
                    out[dst] = data[src]
                    filled[dst] = True
                if out is None or not filled.all():
                    raise ValueError(
                        f"sharded checkpoint does not cover slice {req} of "
                        f"field with shape {shape} (saved with a layout "
                        f"whose chunks do not tile this restore mesh)")
                return out

            vals[fname] = jax.make_array_from_callback(
                shape, getattr(shardings, fname), cb)
    finally:
        for z, _ in handles.values():
            z.close()
    return LBFGSState(**vals)
