"""Pallas kernels composed with sharding: per-device fused kernels inside
``shard_map``, boundary elements exchanged by one-element ``ppermute`` halos,
scalars finished with a single ``psum``.

This is SURVEY.md §2 native-code census item 2 ("Pallas reduction kernels
feeding ``jax.lax.psum`` across shards") completed: the reference's analogue
is the shared-memory reduction kernel whose per-block partials are finished
on the host (parallel-implementation/L-BFGS-Backtracking.cu:117-137,302-306);
here the per-SHARD partials are finished across ICI with no host involvement.

Design: each device runs the same single-device Pallas kernel on its local
(R_local, 128) row blocks, with three extra scalar inputs that make the
kernels location-aware:
  - ``start``  — the shard's global element offset (axis_index * d_local),
                 so the kernels' global-index masking (term ownership, tail
                 padding) is exact;
  - ``edges``  — the neighbouring shards' boundary elements of x (and d for
                 trial-point kernels), obtained with one ppermute each way,
                 seeding the kernels' backward SMEM carry and the forward
                 halo of the shard's last block;
  - ``n``      — the GLOBAL unpadded problem size: the kernels' own masking
                 then implements the zero-padded-tail semantics natively, so
                 the sharded solve needs no objective wrapper.

Communication per call: 2 (or 4) boundary scalars each way over ICI plus ONE
psum of the packed reduction vector — the minimum the chain coupling allows.
Halo-free problems (quadratic: no neighbour terms) skip the ppermutes
entirely and pay only the psum.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.pallas_ops import (
    LANES,
    TAIL_BODIES,
    _fused_tail_pallas,
    _multi_phi_dphi_pallas,
    _multi_phi_pallas,
    local_block_rows,
    local_fused_vg,
)

# Problems with shard-composable Pallas kernels.
SHARDED_PALLAS_PROBLEMS = frozenset(TAIL_BODIES)

# Pad the global d to a multiple of 128 * 8 * n_shards: every shard's local
# block is then whole (8, 128) tiles, which local_block_rows requires (the
# halo DMA reads 8-row tiles).
SHARD_ALIGN_ROWS = 8


def shard_alignment(n_shards: int) -> int:
    return LANES * SHARD_ALIGN_ROWS * n_shards


def _needs_halo(problem: str) -> bool:
    """Whether the problem's kernels read neighbour elements (chain terms).
    Halo-free kernels ignore their edge inputs, so the ppermutes would be
    pure dead ICI latency on the per-iteration critical path."""
    return TAIL_BODIES[problem][1]


def _edge_pair(v_local, axis: str):
    """(prev shard's last element, next shard's first element) via one
    ppermute each way; wraparound values at the global boundary are discarded
    by the kernels' index masks."""
    n = lax.axis_size(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # my last -> right neighbour
    bwd = [(i, (i - 1) % n) for i in range(n)]   # my first -> left neighbour
    prev_last = lax.ppermute(v_local[-1:], axis, fwd)[0]
    next_first = lax.ppermute(v_local[:1], axis, bwd)[0]
    return prev_last, next_first


def shardmap_fused_vg(problem: str, mesh: Mesh, n: int,
                      d_axis: str = "d") -> Callable:
    """vg(x) with x sharded on ``d_axis``: the fused Pallas value+gradient
    kernel on each device's local block, one psum for the value.  ``n`` is
    the global UNPADDED length (kernel-side masking handles any zero-padded
    tail)."""

    def impl(x_local):
        x_local = x_local.reshape(-1)
        d_local = x_local.shape[0]
        br = local_block_rows(d_local // LANES)
        start = lax.axis_index(d_axis) * d_local
        if _needs_halo(problem):
            prev_last, next_first = _edge_pair(x_local, d_axis)
            edges = jnp.stack([prev_last, next_first])
        else:
            edges = jnp.zeros((2,), x_local.dtype)
        f_part, g_local = local_fused_vg(problem, x_local, n, start,
                                         edges, br)
        return lax.psum(f_part, d_axis), g_local

    # check_vma=False: pallas_call out_shapes don't carry varying-mesh-axis
    # metadata, so shard_map's replication checker can't type them.
    return jax.shard_map(impl, mesh=mesh, in_specs=P(d_axis),
                         out_specs=(P(), P(d_axis)), check_vma=False)


def shardmap_fused_tail(problem: str, mesh: Mesh, n: int,
                        d_axis: str = "d",
                        with_matvec: bool = False,
                        accurate_dots: bool = False) -> Callable:
    """The fused post-line-search tail (kernels.make_fused_tail) running
    per-shard inside shard_map.

    Returns ``tail(x, d, alpha, g, s_hist, y_hist)`` with the solver's exact
    contract: vectors stay sharded, the 7 reduction scalars (and the history
    matvecs when with_matvec) are finished with ONE packed psum.

    accurate_dots: per-shard in-kernel Neumaier compensation
    (cfg.accurate_dots); the cross-shard psum is a tree over n_shards
    partials — negligible extra rounding next to the per-shard streams.
    """

    def impl(x_l, d_l, alpha, g_l, s_h_l, y_h_l):
        x_l, d_l, g_l = (v.reshape(-1) for v in (x_l, d_l, g_l))
        d_local = x_l.shape[0]
        br = local_block_rows(d_local // LANES)
        start = lax.axis_index(d_axis) * d_local
        if _needs_halo(problem):
            px, nx = _edge_pair(x_l, d_axis)
            pd, nd = _edge_pair(d_l, d_axis)
            edges = jnp.stack([px, pd, nx, nd])
        else:
            edges = jnp.zeros((4,), x_l.dtype)
        (xnew, f_new, gnew, srow, yrow, sy, yy, gg, dgn, ggn, ygn,
         t1, t2) = _fused_tail_pallas(problem, x_l, d_l, alpha, g_l,
                                      s_h_l, y_h_l, with_matvec,
                                      n=n, start=start, edges=edges, br=br,
                                      accurate=accurate_dots)
        scal = jnp.stack([f_new, sy, yy, gg, dgn, ggn, ygn])
        if with_matvec:
            packed = lax.psum(jnp.concatenate([scal, t1, t2]), d_axis)
            m = t1.shape[0]
            scal, t1, t2 = packed[:7], packed[7:7 + m], packed[7 + m:]
            return (xnew, scal[0], gnew, srow, yrow, scal[1], scal[2],
                    scal[3], scal[4], scal[5], scal[6], t1, t2)
        scal = lax.psum(scal, d_axis)
        return (xnew, scal[0], gnew, srow, yrow, scal[1], scal[2],
                scal[3], scal[4], scal[5], scal[6])

    vec, rep = P(d_axis), P()
    hist = P(None, d_axis, None)
    out_specs = (vec, rep, vec, vec, vec) + (rep,) * 6
    if with_matvec:
        out_specs = out_specs + (rep, rep)
    smapped = jax.shard_map(
        impl, mesh=mesh,
        in_specs=(vec, vec, rep, vec, hist, hist),
        out_specs=out_specs, check_vma=False)

    def tail(x, d, alpha, g, s_hist, y_hist):
        outs = smapped(x, d, alpha, g, s_hist, y_hist)
        if with_matvec:
            return outs
        return outs + (None, None)

    tail.accurate_dots = accurate_dots
    return tail


def shardmap_multi_phi(problem: str, mesh: Mesh, n: int,
                       d_axis: str = "d") -> Callable:
    """phi_batch(x, d, alphas) -> (K,): all K line-search trial objectives in
    one fused per-shard pass, finished with one psum of the (K,) partials."""

    def impl(x_l, d_l, alphas):
        x_l, d_l = x_l.reshape(-1), d_l.reshape(-1)
        d_local = x_l.shape[0]
        br = local_block_rows(d_local // LANES)
        start = lax.axis_index(d_axis) * d_local
        if _needs_halo(problem):
            _, nx = _edge_pair(x_l, d_axis)
            _, nd = _edge_pair(d_l, d_axis)
            edges = jnp.stack([nx, nd])
        else:
            edges = jnp.zeros((2,), x_l.dtype)
        phis = _multi_phi_pallas(problem, x_l, d_l, alphas, n=n,
                                 start=start, edges=edges, br=br)
        return lax.psum(phis, d_axis)

    return jax.shard_map(impl, mesh=mesh,
                         in_specs=(P(d_axis), P(d_axis), P()),
                         out_specs=P(), check_vma=False)


def shardmap_multi_phi_dphi(problem: str, mesh: Mesh, n: int,
                            d_axis: str = "d") -> Callable:
    """phi_dphi_batch(x, d, alphas) -> ((K,), (K,)): all K line-search trial
    (phi, phi') pairs in one fused per-shard pass — the speculative-Wolfe
    evaluator — finished with ONE psum of the stacked (2, K) partials."""

    def impl(x_l, d_l, alphas):
        x_l, d_l = x_l.reshape(-1), d_l.reshape(-1)
        d_local = x_l.shape[0]
        br = local_block_rows(d_local // LANES)
        start = lax.axis_index(d_axis) * d_local
        if _needs_halo(problem):
            px, nx = _edge_pair(x_l, d_axis)
            pd, nd = _edge_pair(d_l, d_axis)
            edges = jnp.stack([px, pd, nx, nd])
        else:
            edges = jnp.zeros((4,), x_l.dtype)
        phis, dphis = _multi_phi_dphi_pallas(problem, x_l, d_l, alphas, n=n,
                                             start=start, edges=edges, br=br)
        packed = lax.psum(jnp.stack([phis, dphis]), d_axis)
        return packed[0], packed[1]

    return jax.shard_map(impl, mesh=mesh,
                         in_specs=(P(d_axis), P(d_axis), P()),
                         out_specs=(P(), P()), check_vma=False)
