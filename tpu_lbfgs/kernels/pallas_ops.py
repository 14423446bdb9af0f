"""Pallas TPU kernels for the solver's hot memory-bound chains.

Reference counterparts (SURVEY.md §2 native-code census): the CUDA
element-wise kernels updateVectors/negateVector/updateSolution/scaleByRho
(L-BFGS.cu:19-73), the shared-memory reduction computeDotProduct
(L-BFGS-Backtracking.cu:117-137), and the cuBLAS Ddot/Daxpy calls
(L-BFGS.cu:219-274).  The reference launches each as a separate kernel with a
host sync per dot product; here each chain is ONE guaranteed single pass over
HBM with reductions accumulated on-chip (SMEM scratch persists across the
sequentially-executed grid steps) — no intermediate materialization, no host
involvement.

Kernel inventory:
  fused_vg_*          objective value AND analytic gradient in one read of x.
                      Rosenbrock/coupled-quadratic need x[i-1] and x[i+1]:
                      x[i-1] comes from a carry scalar (previous grid step's
                      last element, kept in SMEM), x[i+1] from an in-block
                      flattened shift plus a 1-row halo DMA of the next block.
  iteration_tail      x_new = x + alpha*d, s = alpha*d, y = g_new - g, and the
                      reductions s.y, y.y, ||g_new||^2 in one pass
  combine_direction   r = gamma*g + v@S - gamma*(u@Y): the compact
                      representation's second history pass as one stream

Every kernel has a jnp fallback with identical semantics (tests compare
them); dispatch is cfg.use_pallas + shape eligibility (f32, d % 128 == 0).
f64 callers always take the jnp path (TPU f64 is emulated; parity tests pin
fp64 to jnp).

Layout: vectors (d,) are viewed as (R, 128); the grid walks row-blocks.
Wrappers zero-pad R to a block multiple; padded elements are masked out of
every reduction and gradient by a global-index validity test.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Single-sourced from types: the (R, 128) history layout the state container
# builds MUST agree with the kernels' lane width.
from ..types import LANES  # noqa: E402
# Rows per grid step for the streaming kernels; 512*128*4B = 256 KiB per
# streamed buffer.  Env-overridable for block-size sweeps on real hardware
# (set before import; kernels read it at trace time).
BLOCK_ROWS = int(os.environ.get("TPU_LBFGS_BLOCK_ROWS", "512"))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(v2d: Array, br: int) -> Array:
    pad = (-v2d.shape[0]) % br
    return jnp.pad(v2d, ((0, pad), (0, 0))) if pad else v2d


def _ns_arg(n: int, start) -> Array:
    """SMEM scalar block [n_total, global_start] (start may be traced —
    shard_map passes axis_index * d_local)."""
    return jnp.stack([jnp.asarray(n, jnp.int32),
                      jnp.asarray(start, jnp.int32)])


def local_block_rows(rows: int, cap: int = BLOCK_ROWS) -> int:
    """Largest multiple-of-8 divisor of ``rows`` not exceeding ``cap`` — the
    per-shard grid block size.  Shard-local kernels must not row-pad (padded
    elements would alias valid global indices of the NEXT shard), so the
    block size must divide the local row count exactly; the multiple-of-8
    constraint comes from the (8, 128) halo DMA tiles."""
    best = 0
    for br in range(8, min(rows, cap) + 1, 8):
        if rows % br == 0:
            best = br
    if best == 0:
        raise ValueError(f"local rows={rows} has no multiple-of-8 divisor; "
                         "pad the sharded dimension to 1024*n_shards")
    return best


def _as2d(v: Array) -> Array:
    return v.reshape(-1, LANES)


def pallas_ok(*arrays: Array) -> bool:
    """Static eligibility: f32, 1-D-viewable, d divisible by the lane width."""
    return all(a.dtype == jnp.float32 and (a.shape[-1] % LANES == 0)
               for a in arrays)


# -----------------------------------------------------------------------------
# iteration_tail
# -----------------------------------------------------------------------------

def _neumaier_add(acc_ref, comp_base: int, i: int, b):
    """One Neumaier (improved Kahan) step folding block-partial ``b`` into
    SMEM accumulator i, with the running compensation at comp_base + i.
    The per-block partial itself is a plain f32 tree sum (error ~log2(block)
    ulps); the compensation removes the O(n_blocks)-growth term of the
    sequential cross-block accumulation — the dominant rounding source at
    giant d (1024 blocks at d=2^26)."""
    a = acc_ref[i]
    t = a + b
    comp = jnp.where(jnp.abs(a) >= jnp.abs(b), (a - t) + b, (b - t) + a)
    acc_ref[comp_base + i] += comp
    acc_ref[i] = t


def _make_iteration_tail_kernel(compensated: bool):
    def kernel(alpha_ref, x_ref, d_ref, g_ref, gn_ref,
               xnew_ref, s_ref, y_ref, sy_ref, yy_ref, gg_ref,
               dgn_ref, ggn_ref, acc_ref):
        j = pl.program_id(0)
        n_acc = 5

        @pl.when(j == 0)
        def _():
            for i in range(n_acc * (2 if compensated else 1)):
                acc_ref[i] = 0.0

        alpha = alpha_ref[0]
        s = alpha * d_ref[:]
        y = gn_ref[:] - g_ref[:]
        xnew_ref[:] = x_ref[:] + s
        s_ref[:] = s
        y_ref[:] = y
        partials = (jnp.sum(s * y),                      # s.y
                    jnp.sum(y * y),                      # y.y
                    jnp.sum(gn_ref[:] * gn_ref[:]),      # g_new.g_new
                    jnp.sum(d_ref[:] * gn_ref[:]),       # d.g_new
                    jnp.sum(g_ref[:] * gn_ref[:]))       # g.g_new
        for i, b in enumerate(partials):
            if compensated:
                _neumaier_add(acc_ref, n_acc, i, b)
            else:
                acc_ref[i] += b

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            outs = (sy_ref, yy_ref, gg_ref, dgn_ref, ggn_ref)
            for i, o in enumerate(outs):
                o[0, 0] = (acc_ref[i] + acc_ref[n_acc + i]) if compensated \
                    else acc_ref[i]

    return kernel


def _iteration_tail_pallas(x, d, alpha, g, g_new, accurate: bool = False):
    dd = x.shape[0]
    x2, d2, g2, gn2 = (_pad_rows(_as2d(v), BLOCK_ROWS)
                       for v in (x, d, g, g_new))
    rows = x2.shape[0]
    blk = pl.BlockSpec((BLOCK_ROWS, LANES), lambda j: (j, 0),
                       memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_scal = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    f32 = jnp.float32

    xnew, s, y, sy, yy, gg, dgn, ggn = pl.pallas_call(
        _make_iteration_tail_kernel(accurate),
        grid=(rows // BLOCK_ROWS,),
        in_specs=[scal, blk, blk, blk, blk],
        out_specs=(blk, blk, blk, out_scal, out_scal, out_scal, out_scal,
                   out_scal),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), f32),
            jax.ShapeDtypeStruct((rows, LANES), f32),
            jax.ShapeDtypeStruct((rows, LANES), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        scratch_shapes=[pltpu.SMEM((10 if accurate else 5,), f32)],
        interpret=_interpret(),
    )(jnp.reshape(alpha.astype(f32), (1,)), x2, d2, g2, gn2)

    unpad = lambda v: v.reshape(-1)[:dd]
    return (unpad(xnew), unpad(s), unpad(y), sy[0, 0], yy[0, 0], gg[0, 0],
            dgn[0, 0], ggn[0, 0])


def _iteration_tail_jnp(x, d, alpha, g, g_new):
    s = alpha * d
    y = g_new - g
    return (x + s, s, y, jnp.vdot(s, y), jnp.vdot(y, y),
            jnp.vdot(g_new, g_new), jnp.vdot(d, g_new), jnp.vdot(g, g_new))


def iteration_tail(x: Array, d: Array, alpha: Array, g: Array, g_new: Array,
                   use_pallas: bool = True, accurate: bool = False):
    """(x_new, s, y, s.y, y.y, ||g_new||^2, d.g_new, g.g_new) in one HBM pass.

    Replaces the reference's updateSolution + updateVectors kernels plus
    three separate cuBLAS Ddots (L-BFGS.cu:55-63,19-31,219-244,345-348); the
    last two scalars feed the incremental history-product updates
    (direction="compact_incremental").

    accurate: Neumaier-compensate the cross-block scalar accumulation
    (cfg.accurate_dots on the Pallas path — see _neumaier_add); the jnp
    fallback of an accurate call uses utils.accurate.compensated_dot."""
    if use_pallas and pallas_ok(x, d, g, g_new):
        return _iteration_tail_pallas(x, d, alpha, g, g_new,
                                      accurate=accurate)
    if accurate:
        from ..utils.accurate import compensated_dot
        s = alpha * d
        y = g_new - g
        return (x + s, s, y, compensated_dot(s, y), compensated_dot(y, y),
                compensated_dot(g_new, g_new), compensated_dot(d, g_new),
                compensated_dot(g, g_new))
    return _iteration_tail_jnp(x, d, alpha, g, g_new)


# -----------------------------------------------------------------------------
# combine_direction: r = gamma*g + v @ S - gamma * (u @ Y)
# -----------------------------------------------------------------------------

def _combine_kernel(gamma_ref, v_ref, u_ref, g_ref, s_ref, y_ref, r_ref):
    gamma = gamma_ref[0]
    acc = gamma * g_ref[:]
    f32 = jnp.float32
    for k in range(s_ref.shape[0]):  # m is small & static: unrolled FMA chain
        acc = acc + v_ref[k] * s_ref[k].astype(f32) \
            - (gamma * u_ref[k]) * y_ref[k].astype(f32)
    r_ref[:] = acc


def _combine_rows(m: int) -> int:
    """Block rows sized so both (m, rows, 128) history tiles fit in ~8 MiB of
    VMEM with double buffering."""
    budget = 8 * 1024 * 1024
    rows = budget // (m * LANES * 4 * 4)
    return max(64, min(1024, (rows // 64) * 64))


def _hist3(s_hist: Array) -> Array:
    """Normalize a history buffer to (m, R, L) (2D inputs accepted for
    API compatibility; the solver stores 3D natively — see types.hist_block)."""
    if s_hist.ndim == 2:
        from ..types import hist_block
        m, d = s_hist.shape
        return s_hist.reshape(m, *hist_block(d))
    return s_hist


def _combine_pallas(g, s_hist, y_hist, v, u, gamma):
    dd = g.shape[0]
    m = s_hist.shape[0]
    combine_rows = _combine_rows(m)
    g2 = _pad_rows(_as2d(g), combine_rows)
    rows = g2.shape[0]
    s3, y3 = s_hist, y_hist    # already (m, R, 128)
    pad = rows - s3.shape[1]
    if pad:
        s3 = jnp.pad(s3, ((0, 0), (0, pad), (0, 0)))
        y3 = jnp.pad(y3, ((0, 0), (0, pad), (0, 0)))
    blk = pl.BlockSpec((combine_rows, LANES), lambda j: (j, 0),
                       memory_space=pltpu.VMEM)
    hist_blk = pl.BlockSpec((m, combine_rows, LANES), lambda j: (0, j, 0),
                            memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32

    r = pl.pallas_call(
        _combine_kernel,
        grid=(rows // combine_rows,),
        in_specs=[scal, scal, scal, blk, hist_blk, hist_blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), f32),
        interpret=_interpret(),
    )(jnp.reshape(gamma.astype(f32), (1,)), v.astype(f32), u.astype(f32),
      g2, s3, y3)
    return r.reshape(-1)[:dd]


def _combine_jnp(g, s_hist, y_hist, v, u, gamma):
    # Coefficient vectors are cast DOWN to the history dtype so the
    # contraction operands match (bf16 x bf16 -> f32 accumulate is
    # MXU-native); identical to the f32 path when history is f32.
    hdtype = s_hist.dtype
    dn = (((0,), (0,)), ((), ()))           # (m,) x (m, R, L) -> (R, L)
    vs = jax.lax.dot_general(v.astype(hdtype), s_hist, dn,
                             preferred_element_type=g.dtype)
    uy = jax.lax.dot_general(u.astype(hdtype), y_hist, dn,
                             preferred_element_type=g.dtype)
    r3 = gamma * g.reshape(s_hist.shape[1:]) + vs - gamma * uy
    return r3.reshape(g.shape)


def combine_direction(g: Array, s_hist: Array, y_hist: Array, v: Array,
                      u: Array, gamma: Array, use_pallas: bool = True):
    """The compact representation's second pass over the history as one
    stream (SURVEY.md §7 layer 6 item b).  History is (m, R, L) (2D inputs
    normalized)."""
    s_hist, y_hist = _hist3(s_hist), _hist3(y_hist)
    hist_ok = s_hist.dtype in (jnp.float32, jnp.bfloat16) \
        and s_hist.shape[-1] % LANES == 0
    if use_pallas and pallas_ok(g) and hist_ok:
        return _combine_pallas(g, s_hist, y_hist, v, u, gamma)
    return _combine_jnp(g, s_hist, y_hist, v, u, gamma)


# -----------------------------------------------------------------------------
# fused value-and-grad kernels for the problem suite
# -----------------------------------------------------------------------------
# Chain-structured objectives need x[i+1] (forward halo: in-block flattened
# shift + the next block's first element, DMA'd as a 1-row halo) and x[i-1]
# (backward halo: the previous grid step's last element, carried in SMEM).

def _roll(blk: Array, shift: int, axis: int) -> Array:
    # pltpu.roll has no interpret-mode lowering; jnp.roll is equivalent and
    # Mosaic lowers it fine (unlike lane-dim concat/slice, which trips
    # VectorLayout inference).
    return jnp.roll(blk, shift, axis)


def _shift_left(blk: Array, next_first: Array) -> Array:
    """x[i+1] for each flattened element of a (BR, 128) block; the element
    after the block's last is ``next_first``.  Built from whole-array rolls +
    masked selects only — lane-dim slicing/concat breaks Mosaic layout
    inference."""
    br = blk.shape[0]
    rolled_l = _roll(blk, -1, 1)          # (r, c) <- (r, c+1 mod 128)
    rolled_u = _roll(blk, -1, 0)          # (r, c) <- (r+1 mod br, c)
    wrap_col = _roll(rolled_u, -1, 1)     # (r, 127) <- blk[r+1, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
    out = jnp.where(col < LANES - 1, rolled_l, wrap_col)
    is_last = (col == LANES - 1) & (row == br - 1)
    return jnp.where(is_last, next_first, out)


def _shift_right(blk: Array, prev_last: Array) -> Array:
    """x[i-1] for each flattened element of a (BR, 128) block; the element
    before the block's first is ``prev_last``."""
    br = blk.shape[0]
    rolled_r = _roll(blk, 1, 1)           # (r, c) <- (r, c-1 mod 128)
    rolled_d = _roll(blk, 1, 0)           # (r, c) <- (r-1 mod br, c)
    wrap_col = _roll(rolled_d, 1, 1)      # (r, 0) <- blk[r-1, 127]
    col = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
    out = jnp.where(col > 0, rolled_r, wrap_col)
    is_first = (col == 0) & (row == 0)
    return jnp.where(is_first, prev_last, out)


def _global_index(j, shape, start=0):
    """Global element index of each (row, col) in grid block j; ``start`` is
    the shard's global offset (0 unsharded, axis_index * d_local inside
    shard_map)."""
    br, lanes = shape
    row = jax.lax.broadcasted_iota(jnp.int32, (br, lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (br, lanes), 1)
    return start + (j * br + row) * lanes + col


# --- per-problem value+gradient bodies -------------------------------------------
# Shared between the fused_vg_* kernels (evaluate at the input x) and the
# fused-tail kernel (evaluate at the in-kernel trial point x + alpha*d).
# Signature: (xv, xp, xf, gidx, n) -> (f_blk, g_blk) where xp/xf are the
# chain neighbours xv[i-1]/xv[i+1] (ignored by separable problems) and all
# padded/boundary contributions are masked to zero.

def _body_quadratic(xv, xp, xf, gidx, n):
    valid = gidx < n
    r = jnp.where(valid, xv - 1.0, 0.0)
    return r * r, 2.0 * r


def _body_rosenbrock(xv, xp, xf, gidx, n):
    is_term = gidx < (n - 1)            # owns forward term i
    is_valid = gidx < n
    t = jnp.where(is_term, xf - xv * xv, 0.0)
    e = jnp.where(is_term, 1.0 - xv, 0.0)
    f_blk = 100.0 * t * t + e * e
    # Inbound contribution from term i-1: 200*(x[i] - x[i-1]^2), 1 <= i <= n-1.
    t_prev = jnp.where((gidx >= 1) & is_valid, xv - xp * xp, 0.0)
    g_blk = jnp.where(is_term, 2.0 * (xv - 1.0) - 400.0 * xv * t, 0.0) \
        + 200.0 * t_prev
    return f_blk, g_blk


def _body_coupled(xv, xp, xf, gidx, n):
    coeff = 1000.0
    is_term = gidx < (n - 1)
    is_valid = gidx < n
    xval = jnp.where(is_valid, xv, 0.0)
    cross = jnp.where(is_term, xv * xf, 0.0)
    f_blk = coeff * xval * xval + (coeff / 10.0) * cross
    g_blk = 2.0 * coeff * xval \
        + jnp.where(is_term, (coeff / 10.0) * xf, 0.0) \
        + jnp.where((gidx >= 1) & is_valid, (coeff / 10.0) * xp, 0.0)
    return f_blk, g_blk


# (body, needs_halo): halo-free bodies never read xp/xf.
TAIL_BODIES = {
    "quadratic": (_body_quadratic, False),
    "rosenbrock": (_body_rosenbrock, True),
    "coupled_quadratic": (_body_coupled, True),
}


# Value-only bodies for the multi-trial line-search kernel: only the FORWARD
# neighbour xf is needed (no backward carry), so K trial points share one
# stream of (x, d).

def _f_quadratic(xv, xf, gidx, n):
    valid = gidx < n
    r = jnp.where(valid, xv - 1.0, 0.0)
    return r * r


def _f_rosenbrock(xv, xf, gidx, n):
    is_term = gidx < (n - 1)
    t = jnp.where(is_term, xf - xv * xv, 0.0)
    e = jnp.where(is_term, 1.0 - xv, 0.0)
    return 100.0 * t * t + e * e


def _f_coupled(xv, xf, gidx, n):
    coeff = 1000.0
    is_term = gidx < (n - 1)
    is_valid = gidx < n
    xval = jnp.where(is_valid, xv, 0.0)
    cross = jnp.where(is_term, xv * xf, 0.0)
    return coeff * xval * xval + (coeff / 10.0) * cross


F_BODIES = {
    "quadratic": (_f_quadratic, False),
    "rosenbrock": (_f_rosenbrock, True),
    "coupled_quadratic": (_f_coupled, True),
}


def _vg_quadratic_kernel(ns_ref, x_ref, f_ref, g_ref, acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[0] = 0.0

    x = x_ref[:]
    f_blk, g_blk = _body_quadratic(
        x, x, x, _global_index(j, x.shape, ns_ref[1]), ns_ref[0])
    acc_ref[0] += jnp.sum(f_blk)
    g_ref[:] = g_blk

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        f_ref[0, 0] = acc_ref[0]


def _vg_rosenbrock_kernel(ns_ref, edge_ref, x_ref, halo_ref, f_ref, g_ref,
                          acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[0] = 0.0            # f accumulator
        acc_ref[1] = edge_ref[0]    # backward carry seed: previous shard's
        #                             last element (0 unsharded; masked away
        #                             at the true global boundary)

    x = x_ref[:]
    # Forward halo: next in-shard block's first element, except at the
    # shard's last block where it is the NEXT shard's first element.
    nf = jnp.where(j == pl.num_programs(0) - 1, edge_ref[1], halo_ref[0, 0])
    xf = _shift_left(x, nf)
    xp = _shift_right(x, acc_ref[1])
    acc_ref[1] = x[x.shape[0] - 1, LANES - 1]
    f_blk, g_blk = _body_rosenbrock(
        x, xp, xf, _global_index(j, x.shape, ns_ref[1]), ns_ref[0])
    acc_ref[0] += jnp.sum(f_blk)
    g_ref[:] = g_blk

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        f_ref[0, 0] = acc_ref[0]


def _vg_coupled_kernel(ns_ref, edge_ref, x_ref, halo_ref, f_ref, g_ref,
                       acc_ref):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[0] = 0.0
        acc_ref[1] = edge_ref[0]

    x = x_ref[:]
    nf = jnp.where(j == pl.num_programs(0) - 1, edge_ref[1], halo_ref[0, 0])
    xf = _shift_left(x, nf)
    xp = _shift_right(x, acc_ref[1])
    acc_ref[1] = x[x.shape[0] - 1, LANES - 1]
    f_blk, g_blk = _body_coupled(
        x, xp, xf, _global_index(j, x.shape, ns_ref[1]), ns_ref[0])
    acc_ref[0] += jnp.sum(f_blk)
    g_ref[:] = g_blk

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        f_ref[0, 0] = acc_ref[0]



def _halo_spec(br: int, rows: int) -> pl.BlockSpec:
    """BlockSpec for the forward-halo input: the first 8 rows of the NEXT
    block — an 8-row (4 KiB) DMA per grid step (TPU lowering requires
    >= (8, 128) blocks).  Kernels only read element [0, 0]; the index is
    min-clamped at the final block (no out-of-range DMA), where the
    next-shard edge scalar is used instead.  Shared by every halo-carrying
    kernel so the clamping subtlety lives in exactly one place."""
    halo_blocks = br // 8
    last_halo = rows // 8 - 1
    return pl.BlockSpec(
        (8, LANES),
        lambda j: (jnp.minimum((j + 1) * halo_blocks, last_halo), 0),
        memory_space=pltpu.VMEM)


def _run_vg(kernel, x: Array, needs_halo: bool, n: int = None, start=0,
            edges: Array = None, br: int = None) -> Tuple[Array, Array]:
    """Run a fused vg kernel over (a shard of) x.

    Unsharded: n/start/edges default to (len(x), 0, zeros).  Shard-local
    (inside shard_map): ``n`` is the GLOBAL unpadded length, ``start`` the
    shard's global offset, ``edges`` = [prev shard's last element, next
    shard's first element], and ``br`` a block size dividing the local rows
    exactly (local_block_rows) so no row padding aliases the next shard's
    index range.
    """
    dd = x.shape[0]
    n = dd if n is None else n
    if br is None:
        br = BLOCK_ROWS
        x2 = _pad_rows(_as2d(x), br)
    else:
        x2 = _as2d(x)
    rows = x2.shape[0]
    grid = rows // br
    blk = pl.BlockSpec((br, LANES), lambda j: (j, 0),
                       memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_scal = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    f32 = jnp.float32

    in_specs = [scal, blk]
    args = [_ns_arg(n, start), x2]
    if needs_halo:
        if edges is None:
            edges = jnp.zeros((2,), f32)
        in_specs.insert(1, scal)
        args.insert(1, edges.astype(f32))
        in_specs.append(_halo_spec(br, rows))
        args.append(x2)

    f, g = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(out_scal, blk),
        out_shape=(jax.ShapeDtypeStruct((1, 1), f32),
                   jax.ShapeDtypeStruct((rows, LANES), f32)),
        scratch_shapes=[pltpu.SMEM((2,), f32)],
        interpret=_interpret(),
    )(*args)
    return f[0, 0], g.reshape(-1)[:dd]


def fused_vg_quadratic(x: Array, use_pallas: bool = True):
    if use_pallas and pallas_ok(x):
        # Same plumbing as the sharded path (VG_KERNELS routes this kernel
        # through _run_vg too); the kernel ignores the halo machinery.
        return _run_vg(_vg_quadratic_kernel, x, needs_halo=False)
    r = x - 1.0
    return jnp.sum(r * r), 2.0 * r


def fused_vg_rosenbrock(x: Array, use_pallas: bool = True):
    if use_pallas and pallas_ok(x):
        return _run_vg(_vg_rosenbrock_kernel, x, needs_halo=True)
    xi, xn = x[:-1], x[1:]
    t1 = xn - xi * xi
    t2 = 1.0 - xi
    f = jnp.sum(100.0 * t1 * t1 + t2 * t2)
    g = jnp.zeros_like(x)
    g = g.at[:-1].add(2.0 * (xi - 1.0) - 400.0 * xi * t1)
    g = g.at[1:].add(200.0 * t1)
    return f, g


def fused_vg_coupled_quadratic(x: Array, use_pallas: bool = True):
    if use_pallas and pallas_ok(x):
        return _run_vg(_vg_coupled_kernel, x, needs_halo=True)
    coeff = 1000.0
    f = coeff * jnp.sum(x * x) + (coeff / 10.0) * jnp.sum(x[:-1] * x[1:])
    g = 2.0 * coeff * x
    g = g.at[:-1].add((coeff / 10.0) * x[1:])
    g = g.at[1:].add((coeff / 10.0) * x[:-1])
    return f, g


FUSED_VG = {
    "quadratic": fused_vg_quadratic,
    "rosenbrock": fused_vg_rosenbrock,
    "coupled_quadratic": fused_vg_coupled_quadratic,
}

# (kernel, needs_halo) per problem — the shard-local entry points used by
# dist.pallas_sharded to run these kernels on per-device blocks inside
# shard_map (SURVEY.md §2 native-code census item 2).
VG_KERNELS = {
    "quadratic": (_vg_quadratic_kernel, False),
    "rosenbrock": (_vg_rosenbrock_kernel, True),
    "coupled_quadratic": (_vg_coupled_kernel, True),
}


def local_fused_vg(problem: str, x_local: Array, n: int, start,
                   edges: Array, br: int) -> Tuple[Array, Array]:
    """Shard-local fused vg: f partial (caller psums) + local gradient block.
    ``n`` = global unpadded length, ``start`` = this shard's global offset,
    ``edges`` = [prev shard's last x, next shard's first x]."""
    kernel, needs_halo = VG_KERNELS[problem]
    return _run_vg(kernel, x_local, needs_halo, n=n, start=start,
                   edges=edges, br=br)


# -----------------------------------------------------------------------------
# fused_tail: the ENTIRE post-line-search iteration in one HBM stream.
#
# Replaces four separate chains (trial point x+alpha*d -> materialize; vg at
# x_new; iteration_tail; the compact_incremental matvecs S@g_new / Y@g_new)
# with a single kernel that reads x, d, g and the (m, d) history once and
# emits x_new, g_new, the (s, y) ring rows already in history dtype, all five
# pair/convergence scalars, f(x_new), and the two history matvecs.  At
# d=2^20, m=10, bf16 history this cuts per-iteration HBM traffic by ~25% and
# collapses ~5 kernel dispatches into 1.
#
# Reference counterpart: updateSolution + host f/grad eval + updateVectors +
# three cuBLAS Ddots + two more for the products, each a separate kernel
# launch with host syncs (L-BFGS.cu:309-348).
# -----------------------------------------------------------------------------

def _make_tail_kernel(body, needs_halo: bool, with_matvec: bool, m: int,
                      hdtype, br: int, compensated: bool = False):
    # SMEM scratch layout: [0..6] the seven scalar accumulators (f, s.y,
    # y.y, g.g, d.g_new, g.g_new, y.g_new); [7] the backward-carry seed;
    # with ``compensated``, [8..14] the Neumaier compensation terms
    # (cfg.accurate_dots — the t1/t2 history matvec lane-partials stay
    # plain: they feed only the SY/YY off-diagonals, never a curvature or
    # convergence decision, and each lane accumulates far fewer addends).
    def kernel(*refs):
        ns_ref, alpha_ref = refs[0], refs[1]
        k = 2
        if needs_halo:
            edge_ref = refs[k]          # [prev_x, prev_d, next_x, next_d]
            k += 1
        x_ref, d_ref, g_ref = refs[k:k + 3]
        k += 3
        if needs_halo:
            hx_ref, hd_ref = refs[k:k + 2]
            k += 2
        if with_matvec:
            sh_ref, yh_ref = refs[k:k + 2]
            k += 2
        xnew_ref, gnew_ref, srow_ref, yrow_ref = refs[k:k + 4]
        k += 4
        f_o, sy_o, yy_o, gg_o, dgn_o, ggn_o, ygn_o = refs[k:k + 7]
        k += 7
        if with_matvec:
            t1_ref, t2_ref = refs[k:k + 2]
            k += 2
        acc_ref = refs[k]

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            for i in range(7):
                acc_ref[i] = 0.0
            if compensated:
                for i in range(8, 15):
                    acc_ref[i] = 0.0
            # Backward-carry seed: previous shard's last x_new element
            # (zeros unsharded; the gidx >= 1 mask discards it at the true
            # global boundary).
            acc_ref[7] = (edge_ref[0] + alpha_ref[0] * edge_ref[1]) \
                if needs_halo else 0.0
            if with_matvec:
                t1_ref[:] = jnp.zeros((m, LANES), jnp.float32)
                t2_ref[:] = jnp.zeros((m, LANES), jnp.float32)

        alpha = alpha_ref[0]
        n = ns_ref[0]
        x = x_ref[:]
        dv = d_ref[:]
        g = g_ref[:]
        s = alpha * dv
        xn = x + s
        xnew_ref[:] = xn
        srow_ref[:] = s.astype(hdtype)
        gidx = _global_index(j, x.shape, ns_ref[1])
        if needs_halo:
            # Trial-point neighbours derived from the x/d halos: the carry
            # holds the previous block's last x_new element.  At the shard's
            # last block the forward neighbour is the NEXT shard's first
            # trial-point element, from the edge scalars.
            nxt = jnp.where(j == pl.num_programs(0) - 1,
                            edge_ref[2] + alpha * edge_ref[3],
                            hx_ref[0, 0] + alpha * hd_ref[0, 0])
            xf = _shift_left(xn, nxt)
            xp = _shift_right(xn, acc_ref[7])
            acc_ref[7] = xn[br - 1, LANES - 1]
        else:
            xf = xn
            xp = xn
        f_blk, g_new = body(xn, xp, xf, gidx, n)
        gnew_ref[:] = g_new
        y = g_new - g
        yrow_ref[:] = y.astype(hdtype)
        partials = (jnp.sum(f_blk), jnp.sum(s * y), jnp.sum(y * y),
                    jnp.sum(g_new * g_new), jnp.sum(dv * g_new),
                    jnp.sum(g * g_new), jnp.sum(y * g_new))
        for i, b in enumerate(partials):
            if compensated:
                _neumaier_add(acc_ref, 8, i, b)
            else:
                acc_ref[i] += b
        if with_matvec:
            # Contract against the NEW pair's y (no-cancellation incremental
            # updates; see solver).  Lane-partial accumulation: reduce
            # sublanes per block, keep the 128 lanes; the cross-lane finish
            # happens outside the kernel.
            for i in range(m):
                si = sh_ref[i].astype(jnp.float32)
                yi = yh_ref[i].astype(jnp.float32)
                t1_ref[i, :] += jnp.sum(si * y, axis=0)
                t2_ref[i, :] += jnp.sum(yi * y, axis=0)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            outs = (f_o, sy_o, yy_o, gg_o, dgn_o, ggn_o, ygn_o)
            for i, o in enumerate(outs):
                o[0, 0] = (acc_ref[i] + acc_ref[8 + i]) if compensated \
                    else acc_ref[i]

    return kernel


def _fused_tail_pallas(problem: str, x, d, alpha, g, s_hist, y_hist,
                       with_matvec: bool, n: int = None, start=0,
                       edges: Array = None, br: int = None,
                       accurate: bool = False):
    """Fused tail over (a shard of) x/d/g/history.  n/start/edges/br as in
    _run_vg; ``edges`` here is [prev_x, prev_d, next_x, next_d] — the
    neighbouring shards' boundary elements of x and d."""
    body, needs_halo = TAIL_BODIES[problem]
    s_hist, y_hist = _hist3(s_hist), _hist3(y_hist)
    dd = x.shape[0]
    n = dd if n is None else n
    m = s_hist.shape[0]
    hdtype = s_hist.dtype
    local = br is not None
    if not local:
        # f32 history doubles the streamed block bytes; halve rows to keep
        # the double-buffered VMEM footprint bounded.
        br = BLOCK_ROWS if (not with_matvec or hdtype == jnp.bfloat16) \
            else BLOCK_ROWS // 2
        x2, d2, g2 = (_pad_rows(_as2d(v), br) for v in (x, d, g))
    else:
        x2, d2, g2 = (_as2d(v) for v in (x, d, g))
    rows = x2.shape[0]
    grid = rows // br
    f32 = jnp.float32

    blk = pl.BlockSpec((br, LANES), lambda j: (j, 0),
                       memory_space=pltpu.VMEM)
    hblk = pl.BlockSpec((br, LANES), lambda j: (j, 0),
                        memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_scal = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [scal, scal]
    args = [_ns_arg(n, start), jnp.reshape(alpha.astype(f32), (1,))]
    if needs_halo:
        if edges is None:
            edges = jnp.zeros((4,), f32)
        in_specs.append(scal)
        args.append(edges.astype(f32))
    in_specs += [blk, blk, blk]
    args += [x2, d2, g2]
    if needs_halo:
        halo = _halo_spec(br, rows)
        in_specs += [halo, halo]
        args += [x2, d2]
    if with_matvec:
        s3, y3 = s_hist, y_hist    # (m, R, 128)
        pad = rows - s3.shape[1]
        if pad:
            s3 = jnp.pad(s3, ((0, 0), (0, pad), (0, 0)))
            y3 = jnp.pad(y3, ((0, 0), (0, pad), (0, 0)))
        hist_blk = pl.BlockSpec((m, br, LANES), lambda j: (0, j, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [hist_blk, hist_blk]
        args += [s3, y3]

    out_specs = [blk, blk, hblk, hblk] + [out_scal] * 7
    out_shape = [jax.ShapeDtypeStruct((rows, LANES), f32),
                 jax.ShapeDtypeStruct((rows, LANES), f32),
                 jax.ShapeDtypeStruct((rows, LANES), hdtype),
                 jax.ShapeDtypeStruct((rows, LANES), hdtype)] + \
        [jax.ShapeDtypeStruct((1, 1), f32)] * 7
    if with_matvec:
        part = pl.BlockSpec((m, LANES), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
        out_specs += [part, part]
        out_shape += [jax.ShapeDtypeStruct((m, LANES), f32)] * 2

    outs = pl.pallas_call(
        _make_tail_kernel(body, needs_halo, with_matvec, m, hdtype, br,
                          compensated=accurate),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.SMEM((15 if accurate else 8,), f32)],
        interpret=_interpret(),
    )(*args)

    unpad = lambda v: v.reshape(-1)[:dd]
    xnew, gnew, srow, yrow = (unpad(v) for v in outs[:4])
    f_new, sy, yy, gg, dgn, ggn, ygn = (v[0, 0] for v in outs[4:11])
    if with_matvec:
        t1 = jnp.sum(outs[11], axis=1)
        t2 = jnp.sum(outs[12], axis=1)
    else:
        t1 = t2 = None
    return xnew, f_new, gnew, srow, yrow, sy, yy, gg, dgn, ggn, ygn, t1, t2


def fused_tail_jnp(vg_fn, x, d, alpha, g, s_hist, y_hist,
                   with_matvec: bool, accurate: bool = False):
    """Identical-semantics fallback built from the plain ops.  ``accurate``
    uses Neumaier-compensated reductions for the seven scalars, matching the
    compensated Pallas kernel's contract."""
    hdtype = s_hist.dtype
    s = alpha * d
    x_new = x + s
    f_new, g_new = vg_fn(x_new)
    y = g_new - g
    if accurate:
        from ..utils.accurate import compensated_dot as _dot
    else:
        _dot = jnp.vdot
    sy = _dot(s, y)
    yy = _dot(y, y)
    gg = _dot(g_new, g_new)
    dgn = _dot(d, g_new)
    ggn = _dot(g, g_new)
    ygn = _dot(y, g_new)
    if with_matvec:
        s3, y3 = _hist3(s_hist), _hist3(y_hist)
        yv3 = y.reshape(s3.shape[1:])
        dn = (((1, 2), (0, 1)), ((), ()))
        t1 = jax.lax.dot_general(s3, yv3, dn,
                                 preferred_element_type=g_new.dtype)
        t2 = jax.lax.dot_general(y3, yv3, dn,
                                 preferred_element_type=g_new.dtype)
    else:
        t1 = t2 = None
    return (x_new, f_new, g_new, s.astype(hdtype), y.astype(hdtype),
            sy, yy, gg, dgn, ggn, ygn, t1, t2)


# -----------------------------------------------------------------------------
# multi_phi: K line-search trial points evaluated in ONE pass over (x, d).
#
# The reference's paper proposes parallel step-size evaluation; its code
# evaluates trials serially with a host round-trip each
# (L-BFGS-Backtracking.cu:314-341).  Here phi(alpha_k) = f(x + alpha_k * d)
# for all K candidates shares a single HBM stream: the VPU recomputes the
# trial point per candidate in registers (~K * body-flops per element, still
# under the v5e compute/bandwidth balance point at K <= ~8).
# -----------------------------------------------------------------------------

def _make_multi_phi_kernel(fbody, needs_halo: bool, K: int):
    def kernel(*refs):
        ns_ref, alphas_ref = refs[:2]
        k = 2
        if needs_halo:
            edge_ref = refs[k]          # [next_x, next_d]
            k += 1
        x_ref, d_ref = refs[k:k + 2]
        k += 2
        if needs_halo:
            hx_ref, hd_ref = refs[k:k + 2]
            k += 2
        out_ref = refs[k]
        acc_ref = refs[k + 1]

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            for i in range(K):
                acc_ref[i] = 0.0

        n = ns_ref[0]
        x = x_ref[:]
        dv = d_ref[:]
        gidx = _global_index(j, x.shape, ns_ref[1])
        last = pl.num_programs(0) - 1
        for i in range(K):
            a = alphas_ref[i]
            xn = x + a * dv
            if needs_halo:
                nxt = jnp.where(j == last,
                                edge_ref[0] + a * edge_ref[1],
                                hx_ref[0, 0] + a * hd_ref[0, 0])
                xf = _shift_left(xn, nxt)
            else:
                xf = xn
            acc_ref[i] += jnp.sum(fbody(xn, xf, gidx, n))

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            for i in range(K):
                out_ref[0, i] = acc_ref[i]

    return kernel


def _multi_phi_pallas(problem: str, x, d, alphas, n: int = None, start=0,
                      edges: Array = None, br: int = None):
    """K-trial phi over (a shard of) x/d; ``edges`` = [next_x, next_d]."""
    fbody, needs_halo = F_BODIES[problem]
    K = alphas.shape[0]
    dd = x.shape[0]
    n = dd if n is None else n
    f32 = jnp.float32
    if br is None:
        br = BLOCK_ROWS
        x2, d2 = (_pad_rows(_as2d(v), br) for v in (x, d))
    else:
        x2, d2 = (_as2d(v) for v in (x, d))
    rows = x2.shape[0]
    blk = pl.BlockSpec((br, LANES), lambda j: (j, 0),
                       memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_scal = pl.BlockSpec((1, K), lambda j: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [scal, scal]
    args = [_ns_arg(n, start), alphas.astype(f32)]
    if needs_halo:
        if edges is None:
            edges = jnp.zeros((2,), f32)
        in_specs.append(scal)
        args.append(edges.astype(f32))
    in_specs += [blk, blk]
    args += [x2, d2]
    if needs_halo:
        halo = _halo_spec(br, rows)
        in_specs += [halo, halo]
        args += [x2, d2]

    out = pl.pallas_call(
        _make_multi_phi_kernel(fbody, needs_halo, K),
        grid=(rows // br,),
        in_specs=in_specs,
        out_specs=out_scal,
        out_shape=jax.ShapeDtypeStruct((1, K), f32),
        scratch_shapes=[pltpu.SMEM((K,), f32)],
        interpret=_interpret(),
    )(*args)
    return out[0]


def make_multi_phi(problem: str, f_fallback, use_pallas: bool = True):
    """Build ``phi_batch(x, d, alphas) -> (K,)`` evaluating f at all K trial
    points x + alphas[k]*d in one fused pass (jnp fallback: vmap)."""
    def phi_batch(x, d, alphas):
        if (use_pallas and problem in F_BODIES and pallas_ok(x, d)
                and x.dtype == jnp.float32):
            return _multi_phi_pallas(problem, x, d, alphas)
        return jax.vmap(lambda a: f_fallback(x + a * d))(alphas)

    return phi_batch


# -----------------------------------------------------------------------------
# multi_phi_dphi: K trial (phi, phi') pairs in ONE pass over (x, d) — the
# speculative-Wolfe evaluator (VERDICT r3 missing #3): phi(a_k) AND
# phi'(a_k) = grad f(x + a_k d) . d for every candidate share a single HBM
# stream of (x, d), using the full value+gradient bodies (TAIL_BODIES) with
# per-trial chain halos reconstructed in registers (the trial point's
# neighbours are x_nb + a * d_nb, so one carried (x, d) boundary pair serves
# all K candidates).  The reference's Wolfe searches evaluate one host
# round-trip trial at a time (L-BFGS-Wolfe.cu:276-349).
# -----------------------------------------------------------------------------

def _make_multi_phi_dphi_kernel(body, needs_halo: bool, K: int):
    def kernel(*refs):
        ns_ref, alphas_ref = refs[:2]
        k = 2
        if needs_halo:
            edge_ref = refs[k]          # [prev_x, prev_d, next_x, next_d]
            k += 1
        x_ref, d_ref = refs[k:k + 2]
        k += 2
        if needs_halo:
            hx_ref, hd_ref = refs[k:k + 2]
            k += 2
        out_ref = refs[k]
        acc_ref = refs[k + 1]

        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            for i in range(2 * K):
                acc_ref[i] = 0.0
            if needs_halo:
                acc_ref[2 * K] = edge_ref[0]       # backward-carry x seed
                acc_ref[2 * K + 1] = edge_ref[1]   # backward-carry d seed

        n = ns_ref[0]
        x = x_ref[:]
        dv = d_ref[:]
        gidx = _global_index(j, x.shape, ns_ref[1])
        last = pl.num_programs(0) - 1
        if needs_halo:
            nx = jnp.where(j == last, edge_ref[2], hx_ref[0, 0])
            nd = jnp.where(j == last, edge_ref[3], hd_ref[0, 0])
            cx = acc_ref[2 * K]
            cd = acc_ref[2 * K + 1]
        for i in range(K):
            a = alphas_ref[i]
            xn = x + a * dv
            if needs_halo:
                xf = _shift_left(xn, nx + a * nd)
                xp = _shift_right(xn, cx + a * cd)
            else:
                xf = xp = xn
            f_blk, g_blk = body(xn, xp, xf, gidx, n)
            acc_ref[i] += jnp.sum(f_blk)
            # masked g_blk is 0 outside [0, n): d-padding cannot leak in.
            acc_ref[K + i] += jnp.sum(g_blk * dv)
        if needs_halo:
            acc_ref[2 * K] = x[x.shape[0] - 1, LANES - 1]
            acc_ref[2 * K + 1] = dv[dv.shape[0] - 1, LANES - 1]

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            for i in range(K):
                out_ref[0, i] = acc_ref[i]
                out_ref[1, i] = acc_ref[K + i]

    return kernel


def _multi_phi_dphi_pallas(problem: str, x, d, alphas, n: int = None,
                           start=0, edges: Array = None, br: int = None):
    """K-trial (phi, dphi) over (a shard of) x/d.
    ``edges`` = [prev_x, prev_d, next_x, next_d]."""
    body, needs_halo = TAIL_BODIES[problem]
    K = alphas.shape[0]
    dd = x.shape[0]
    n = dd if n is None else n
    f32 = jnp.float32
    if br is None:
        br = BLOCK_ROWS
        x2, d2 = (_pad_rows(_as2d(v), br) for v in (x, d))
    else:
        x2, d2 = (_as2d(v) for v in (x, d))
    rows = x2.shape[0]
    blk = pl.BlockSpec((br, LANES), lambda j: (j, 0),
                       memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_scal = pl.BlockSpec((2, K), lambda j: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [scal, scal]
    args = [_ns_arg(n, start), alphas.astype(f32)]
    if needs_halo:
        if edges is None:
            edges = jnp.zeros((4,), f32)
        in_specs.append(scal)
        args.append(edges.astype(f32))
    in_specs += [blk, blk]
    args += [x2, d2]
    if needs_halo:
        halo = _halo_spec(br, rows)
        in_specs += [halo, halo]
        args += [x2, d2]

    out = pl.pallas_call(
        _make_multi_phi_dphi_kernel(body, needs_halo, K),
        grid=(rows // br,),
        in_specs=in_specs,
        out_specs=out_scal,
        out_shape=jax.ShapeDtypeStruct((2, K), f32),
        scratch_shapes=[pltpu.SMEM((2 * K + 2,), f32)],
        interpret=_interpret(),
    )(*args)
    return out[0], out[1]


def make_multi_phi_dphi(problem: str, vg_fallback, use_pallas: bool = True):
    """Build ``phi_dphi_batch(x, d, alphas) -> ((K,), (K,))`` evaluating
    (f, grad.d) at all K trial points in one fused pass (jnp fallback:
    vmapped value_and_grad + per-trial vdot)."""
    def phi_dphi_batch(x, d, alphas):
        if (use_pallas and problem in TAIL_BODIES and pallas_ok(x, d)
                and x.dtype == jnp.float32):
            return _multi_phi_dphi_pallas(problem, x, d, alphas)

        def one(a):
            f_new, g_new = vg_fallback(x + a * d)
            return f_new, jnp.vdot(g_new, d)

        return jax.vmap(one)(alphas)

    return phi_dphi_batch


def make_fused_tail(problem: str, vg_fallback, with_matvec: bool = True,
                    use_pallas: bool = True, accurate_dots: bool = False):
    """Build the fused post-line-search tail for a suite problem.

    Returns ``tail(x, d, alpha, g, s_hist, y_hist) -> (x_new, f_new, g_new,
    s_row, y_row, sy, yy, gg, dgn, ggn, ygn, t1, t2)`` with s_row/y_row
    already in history dtype and t1/t2 = S@y_new, Y@y_new over the
    *pre-update* history (the slot entries are patched from exact scalars by
    the solver).  Dispatches to the Pallas kernel when eligible, else to the
    jnp composition.

    accurate_dots: Neumaier-compensate the scalar accumulation (in-kernel
    cross-block compensation on the Pallas path, compensated_dot on the jnp
    path) — pass True when cfg.accurate_dots is set; the solver checks the
    returned callable's ``accurate_dots`` attribute to reject a mismatched
    pairing rather than silently dropping the compensation.
    """
    def tail(x, d, alpha, g, s_hist, y_hist):
        eligible = (use_pallas and problem in TAIL_BODIES
                    and pallas_ok(x, d, g)
                    and s_hist.dtype in (jnp.float32, jnp.bfloat16))
        if eligible:
            return _fused_tail_pallas(problem, x, d, alpha, g,
                                      s_hist, y_hist, with_matvec,
                                      accurate=accurate_dots)
        return fused_tail_jnp(vg_fallback, x, d, alpha, g,
                              s_hist, y_hist, with_matvec,
                              accurate=accurate_dots)

    tail.accurate_dots = accurate_dots
    return tail
