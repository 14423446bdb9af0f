#!/usr/bin/env python
"""Batch-workload roofline audit experiments (round-5 verdict item 1).

The BASELINE config-4 cell (B=4096 x d=1024, rosenbrock, bounded lockstep)
measured 5.23 ms/lockstep-iter in round 4 while the naive streaming model
bounds it at ~1.6 ms — nobody had located the other ~3.6 ms.  This script
runs, on the real TPU:

  end-to-end variants (200-iter bounded batch solve, best-of-3):
    base        round-4 configuration (f32 ring)
    bf16        bfloat16 ring (what the batch-aware auto rule would pick)
    compact     direction="compact" (recomputed products, no u1/u2 state)
    two_loop    scan-based direction (for scale)

  micro-benchmarks (200-step fori loops over live data, B=4096):
    tri         batched (10,10) jax.scipy solve_triangular pair
    tri_unroll  the same solves as unrolled forward/back substitution
    perm        SY[slots][:, slots] per-lane dynamic gather (direction.py)
    perm_onehot the same permutation as one-hot matmuls
    ringwrite   s_hist.at[slot].set(row) per-lane dynamic update
    ringwrite_where  the same as an iota==slot masked select
    combine     the direction's two (m,)x(m,R,L) dot_generals + u1/u2
    streams     bare elementwise stream at the cell's modeled traffic

Usage: python scripts/batch_opt.py [variant ...]   (default: all)
Emits one JSON line per cell to stdout.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, D, M, ITERS = 4096, 1024, 10, 200
R, L = 8, 128


def log(msg):
    print(f"[batch_opt {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def timeit(name, fn, *args, repeats=3):
    t0 = time.perf_counter()
    out = fn(*args)
    fence = float(jnp.sum(jax.tree.leaves(out)[0]))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        fence = float(jnp.sum(jax.tree.leaves(out)[0]))  # noqa: F841
        best = min(best, time.perf_counter() - t0)
    rec = {"cell": name, "wall_s": round(best, 4),
           "ms_per_iter": round(best / ITERS * 1e3, 4),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    log(f"{name}: {best / ITERS * 1e3:.3f} ms/iter (compile {compile_s:.0f}s)")
    return rec


# --- end-to-end variants ---------------------------------------------------------

def run_e2e(tag, **cfg_kw):
    from tpu_lbfgs.bench.harness import bench_batch
    from tpu_lbfgs.config import LBFGSConfig

    cfg = LBFGSConfig(line_search="backtracking",
                      direction="compact_incremental",
                      ls_eval="polynomial", fidelity="fixed",
                      pair_skip_threshold=1e-10, max_iters=ITERS,
                      tol=0.0).replace(**cfg_kw)
    t0 = time.perf_counter()
    r = bench_batch(problem="rosenbrock", batch=B, d=D, iters=ITERS, cfg=cfg)
    rec = {"cell": f"e2e_{tag}", "wall_s": round(r.wall_s, 4),
           "ms_per_iter": round(r.wall_s / ITERS * 1e3, 4),
           "instance_iters_per_s": round(r.iters_per_s, 0),
           "final_f_mean": r.final_f,
           "cell_total_s": round(time.perf_counter() - t0, 1),
           "cfg": {k: str(v) for k, v in cfg_kw.items()}}
    print(json.dumps(rec), flush=True)
    log(f"e2e_{tag}: {rec['ms_per_iter']:.3f} ms/iter "
        f"({rec['instance_iters_per_s']:,.0f} inst-it/s)")
    return rec


# --- micro-benchmarks ------------------------------------------------------------
# Each carries data through a fori_loop so nothing is DCE'd or hoisted.

def micro_tri(unrolled: bool):
    rng = np.random.default_rng(0)
    Rm = jnp.asarray(rng.uniform(0.5, 1.5, (B, M, M)), jnp.float32)
    Rm = jnp.triu(Rm) + 2.0 * jnp.eye(M)[None]
    b0 = jnp.asarray(rng.uniform(-1, 1, (B, M)), jnp.float32)

    if unrolled:
        def solve_upper(Rm, b):
            # x[i] = (b[i] - sum_{j>i} R[i,j] x[j]) / R[i,i], i = M-1..0
            xs = [None] * M
            for i in range(M - 1, -1, -1):
                acc = b[..., i]
                for j in range(i + 1, M):
                    acc = acc - Rm[..., i, j] * xs[j]
                xs[i] = acc / Rm[..., i, i]
            return jnp.stack(xs, axis=-1)

        def solve_lower_t(Rm, b):
            # R^T x = b with R upper -> forward substitution on rows of R^T
            xs = [None] * M
            for i in range(M):
                acc = b[..., i]
                for j in range(i):
                    acc = acc - Rm[..., j, i] * xs[j]
                xs[i] = acc / Rm[..., i, i]
            return jnp.stack(xs, axis=-1)
    else:
        st = jax.scipy.linalg.solve_triangular

        def solve_upper(Rm, b):
            return jax.vmap(lambda A, y: st(A, y, lower=False))(Rm, b)

        def solve_lower_t(Rm, b):
            return jax.vmap(lambda A, y: st(A.T, y, lower=True))(Rm, b)

    @jax.jit
    def run(b0):
        def body(_, b):
            u = solve_upper(Rm, b)
            v = solve_lower_t(Rm, u)
            return v * 0.999 + 0.001          # keep magnitudes bounded
        return jax.lax.fori_loop(0, ITERS, body, b0)

    return run, (b0,)


def micro_perm(onehot: bool):
    rng = np.random.default_rng(1)
    SY = jnp.asarray(rng.uniform(-1, 1, (B, M, M)), jnp.float32)
    npairs0 = jnp.asarray(rng.integers(1, 100, (B,)), jnp.int32)

    def slots_of(n_pairs):
        hist_len = jnp.minimum(n_pairs, M)
        j = jnp.arange(M, dtype=jnp.int32)
        return (n_pairs[..., None] - hist_len[..., None] + j) % M

    if onehot:
        def permute(SY, slots):
            P = (slots[..., :, None]
                 == jnp.arange(M, dtype=jnp.int32)).astype(SY.dtype)
            return jnp.einsum("blp,bpq,bmq->blm", P, SY, P)
    else:
        def permute(SY, slots):
            def one(sy, sl):
                return sy[sl][:, sl]
            return jax.vmap(one)(SY, slots)

    @jax.jit
    def run(npairs):
        def body(_, c):
            npairs, acc = c
            sl = slots_of(npairs)
            out = permute(SY, sl)
            return npairs + 1, acc + out[:, 0, 0]
        return jax.lax.fori_loop(0, ITERS, body,
                                 (npairs, jnp.zeros((B,), jnp.float32)))[1]

    return run, (npairs0,)


def micro_ringwrite_drop():
    """Conditional ring write via an out-of-bounds index + mode='drop'."""
    rng = np.random.default_rng(2)
    hist0 = jnp.asarray(rng.uniform(-1, 1, (B, M, R, L)), jnp.float32)
    npairs0 = jnp.asarray(rng.integers(0, 100, (B,)), jnp.int32)

    @jax.jit
    def run(c0):
        def body(i, c):
            hist, npairs = c
            store = (npairs % 7) != 0
            wslot = jnp.where(store, npairs % M, M)
            row = hist[:, 0] * 1.0001 + 1e-6 * i
            hist = jax.vmap(
                lambda h, s, r: h.at[s].set(r, mode="drop"))(hist, wslot, row)
            return hist, npairs + 1
        return jax.lax.fori_loop(0, ITERS, body, c0)

    return run, ((hist0, npairs0),)


def micro_onehot_chain():
    """The full _compact_core small-matrix chain (one-hot permutes, masked
    R build, unrolled solves, scatter-back) batched at B — everything except
    the d-sized streams, isolating the direction's small-op cost."""
    rng = np.random.default_rng(5)
    SYp = jnp.asarray(rng.uniform(0.5, 1.5, (B, M, M)), jnp.float32)
    Sgp = jnp.asarray(rng.uniform(-1, 1, (B, M)), jnp.float32)
    Ygp = jnp.asarray(rng.uniform(-1, 1, (B, M)), jnp.float32)
    npairs0 = jnp.asarray(rng.integers(1, 100, (B,)), jnp.int32)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tpu_lbfgs.core.direction import _perm_onehot, _ring_logical_slots

    # Local copies of the unrolled-substitution candidate (rejected from the
    # package: loses in-program despite winning in isolation — see
    # direction.py's solve comment); kept here so the micro stays runnable.
    def _solve_triu_unrolled(Rm, b):
        m = Rm.shape[-1]
        xs = [None] * m
        for i in range(m - 1, -1, -1):
            acc = b[..., i]
            for j in range(i + 1, m):
                acc = acc - Rm[..., i, j] * xs[j]
            xs[i] = acc / Rm[..., i, i]
        return jnp.stack(xs, axis=-1)

    def _solve_tril_t_unrolled(Rm, b):
        m = Rm.shape[-1]
        xs = [None] * m
        for i in range(m):
            acc = b[..., i]
            for j in range(i):
                acc = acc - Rm[..., j, i] * xs[j]
            xs[i] = acc / Rm[..., i, i]
        return jnp.stack(xs, axis=-1)

    def chain(npairs):
        slots, valid = jax.vmap(
            lambda n: _ring_logical_slots(n, M))(npairs)
        P = _perm_onehot(slots, M, jnp.float32)
        SY = P @ SYp @ jnp.swapaxes(P, -1, -2)
        p1 = jnp.where(valid, jnp.einsum("blp,bp->bl", P, Sgp), 0.0)
        p2 = jnp.where(valid, jnp.einsum("blp,bp->bl", P, Ygp), 0.0)
        vmask2 = valid[:, :, None] & valid[:, None, :]
        eye = jnp.eye(M, dtype=jnp.float32)
        Rm = jnp.where(vmask2, jnp.triu(SY), 0.0) \
            + jnp.where(valid, 0.0, 1.0)[..., None] * eye
        u = _solve_triu_unrolled(Rm, p1)
        t = u * 1.1 - 0.9 * p2
        v = _solve_tril_t_unrolled(Rm, t)
        v_phys = jnp.einsum("blp,bl->bp", P, jnp.where(valid, v, 0.0))
        return v_phys

    @jax.jit
    def run(npairs):
        def body(_, c):
            npairs, acc = c
            return npairs + 1, acc + chain(npairs)[:, 0]
        return jax.lax.fori_loop(0, ITERS, body,
                                 (npairs, jnp.zeros((B,), jnp.float32)))[1]

    return run, (npairs0,)


def micro_ringwrite(where_based: bool):
    rng = np.random.default_rng(2)
    hist0 = jnp.asarray(rng.uniform(-1, 1, (B, M, R, L)), jnp.float32)
    npairs0 = jnp.asarray(rng.integers(0, 100, (B,)), jnp.int32)

    if where_based:
        def write(hist, slot, row):
            mask = (jnp.arange(M, dtype=jnp.int32)[:, None, None]
                    == slot[..., None, None, None])
            return jnp.where(mask, row[:, None], hist)
    else:
        def write(hist, slot, row):
            return jax.vmap(lambda h, s, r: h.at[s].set(r))(hist, slot, row)

    @jax.jit
    def run(c0):
        def body(i, c):
            hist, npairs = c
            slot = npairs % M
            row = hist[:, 0] * 1.0001 + 1e-6 * i
            return write(hist, slot, row), npairs + 1
        return jax.lax.fori_loop(0, ITERS, body, c0)

    return run, ((hist0, npairs0),)


def micro_combine():
    rng = np.random.default_rng(3)
    S = jnp.asarray(rng.uniform(-1, 1, (B, M, R, L)), jnp.float32)
    Y = jnp.asarray(rng.uniform(-1, 1, (B, M, R, L)), jnp.float32)
    g0 = jnp.asarray(rng.uniform(-1, 1, (B, R, L)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1, 1, (B, M)), jnp.float32)

    dn_comb = (((1,), (1,)), ((0,), (0,)))   # (B,m) x (B,m,RL) -> (B,RL)
    dn_mv = (((2,), (1,)), ((0,), (0,)))     # (B,m,RL) x (B,RL) -> (B,m)

    # S/Y as jit ARGUMENTS, not closure constants: 335 MB of embedded
    # constants exceeds the remote-compile tunnel's request limit (HTTP 413).
    @jax.jit
    def run(g, S, Y):
        S2 = S.reshape(B, M, R * L)
        Y2 = Y.reshape(B, M, R * L)

        def body(_, g):
            gf = g.reshape(B, R * L)
            # combine: r = gamma*g + v@S - gamma*(v@Y)  (2m-pass stream)
            r = 0.9 * gf + jax.lax.dot_general(v, S2, dn_comb) \
                - 0.9 * jax.lax.dot_general(v, Y2, dn_comb)
            # u1/u2: S@y, Y@y (2m-pass stream)
            u1 = jax.lax.dot_general(S2, r, dn_mv)
            u2 = jax.lax.dot_general(Y2, r, dn_mv)
            g2 = r * (1.0 / (1.0 + jnp.abs(r))) \
                + 1e-6 * (u1[:, :1] + u2[:, :1])
            return g2.reshape(B, R, L)
        return jax.lax.fori_loop(0, ITERS, body, g)

    return run, (g0, S, Y)


def micro_streams():
    """Bare elementwise stream moving the cell's modeled bytes/iter: an
    upper-throughput sanity anchor (what a perfect fusion could reach)."""
    rng = np.random.default_rng(4)
    # ~216 KB/instance/iter modeled -> stream a (B, 54, 1024) f32 array
    # read+write = 2 passes x 27 slots... keep it simple: one array sized to
    # HALF the modeled traffic, read+written once per step.
    arr0 = jnp.asarray(rng.uniform(-1, 1, (B, 27, D)), jnp.float32)

    @jax.jit
    def run(a):
        def body(_, a):
            return a * 0.9999 + 1e-7
        return jax.lax.fori_loop(0, ITERS, body, a)

    return run, (arr0,)


def micro_onehot_chain_T():
    """The same small-matrix chain with B as the INNERMOST (lane) axis:
    (m, m, B) / (m, B) layouts instead of vmap's (B, m, m).  Tests the
    layout hypothesis for the batch cell's residual: a (B, 10, 10) array
    tiles HBM/VMEM as (B, 16, 128) — 12.8x padding waste and idle lanes —
    while (m, m, B) puts 128 instances per vector register."""
    rng = np.random.default_rng(5)
    SYp = jnp.asarray(rng.uniform(0.5, 1.5, (M, M, B)), jnp.float32)
    Sgp = jnp.asarray(rng.uniform(-1, 1, (M, B)), jnp.float32)
    Ygp = jnp.asarray(rng.uniform(-1, 1, (M, B)), jnp.float32)
    npairs0 = jnp.asarray(rng.integers(1, 100, (B,)), jnp.int32)

    def chain(npairs):
        hist_len = jnp.minimum(npairs, M)                      # (B,)
        j = jnp.arange(M, dtype=jnp.int32)[:, None]            # (M, 1)
        slots = (npairs[None, :] - hist_len[None, :] + j) % M  # (M, B)
        valid = j < hist_len[None, :]                          # (M, B)
        P = (slots[:, None, :]
             == jnp.arange(M, dtype=jnp.int32)[None, :, None]
             ).astype(jnp.float32)                             # (L, p, B)
        # SY_log[l, q, B] = sum_p P[l,p,B] * (sum_r SYp[p,r,B] * P[q,r,B])
        t1 = jnp.einsum("lpb,prb->lrb", P, SYp)
        SY = jnp.einsum("lrb,qrb->lqb", t1, P)
        p1 = jnp.where(valid, jnp.einsum("lpb,pb->lb", P, Sgp), 0.0)
        p2 = jnp.where(valid, jnp.einsum("lpb,pb->lb", P, Ygp), 0.0)
        vmask2 = valid[:, None, :] & valid[None, :, :]
        eyeb = jnp.eye(M, dtype=jnp.float32)[:, :, None]
        triu = jnp.triu(jnp.ones((M, M), jnp.float32))[:, :, None]
        Rm = jnp.where(vmask2, SY * triu, 0.0) \
            + jnp.where(valid, 0.0, 1.0)[:, None, :] * eyeb
        # unrolled substitution, each step a (B,)-vector op
        xs = [None] * M
        for i in range(M - 1, -1, -1):
            acc = p1[i]
            for jj in range(i + 1, M):
                acc = acc - Rm[i, jj] * xs[jj]
            xs[i] = acc / Rm[i, i]
        u = jnp.stack(xs)                                       # (M, B)
        t = u * 1.1 - 0.9 * p2
        ys = [None] * M
        for i in range(M):
            acc = t[i]
            for jj in range(i):
                acc = acc - Rm[jj, i] * ys[jj]
            ys[i] = acc / Rm[i, i]
        v = jnp.stack(ys)
        v_phys = jnp.einsum("lpb,lb->pb", P, jnp.where(valid, v, 0.0))
        return v_phys

    @jax.jit
    def run(npairs):
        def body(_, c):
            npairs, acc = c
            return npairs + 1, acc + chain(npairs)[0]
        return jax.lax.fori_loop(0, ITERS, body,
                                 (npairs, jnp.zeros((B,), jnp.float32)))[1]

    return run, (npairs0,)


MICROS = {
    "ringwrite_drop": micro_ringwrite_drop,
    "onehot_chain": micro_onehot_chain,
    "onehot_chain_T": micro_onehot_chain_T,
    "tri": partial(micro_tri, False),
    "tri_unroll": partial(micro_tri, True),
    "perm": partial(micro_perm, False),
    "perm_onehot": partial(micro_perm, True),
    "ringwrite": partial(micro_ringwrite, False),
    "ringwrite_where": partial(micro_ringwrite, True),
    "combine": micro_combine,
    "streams": micro_streams,
}
E2E = {
    "base": {},
    "bf16": {"history_dtype": "bfloat16"},
    "compact": {"direction": "compact"},
    "two_loop": {"direction": "two_loop"},
}


def main():
    which = sys.argv[1:] or (list(MICROS) + ["base", "bf16"])
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    for name in which:
        try:
            if name in MICROS:
                fn, args = MICROS[name]()
                timeit(name, fn, *args)
            elif name in E2E:
                run_e2e(name, **E2E[name])
            else:
                log(f"unknown cell {name!r}")
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"cell": name,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)
            log(f"{name} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
