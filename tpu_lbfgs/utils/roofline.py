"""Per-iteration memory-traffic model and roofline accounting.

The whole solver is memory-bound (SURVEY.md §5 tracing row: "roofline
accounting — bytes moved per two-loop step vs HBM BW").  This model counts
the HBM bytes each configuration streams per iteration so benchmarks can
report achieved fraction of roofline, and so regressions in pass count show
up as model-vs-measured gaps.

Pass counting (1 pass = d elements read or written once):

direction "two_loop" (lax.scan; reference semantics):
    first loop per pair: read s_i, q; write q; read y_i  -> 4 passes x m
    second loop per pair: read y_i, r; write r; read s_i -> 4 passes x m
    gamma scale + negate: ~2
direction "compact":
    contractions S.Y', Y.Y', S.g, Y.g: reads S twice, Y three times, g once
      (upper bound; XLA may share streams)                -> 5m + 1
    combine gamma*g + v@S - gamma*(u@Y): read S, Y, g; write r -> 2m + 2
line search "direct": per trial read x, d + objective read (fused trial
    point) ~2 passes; Wolfe trials add a gradient pass.
line search "polynomial": one coefficient pass (read x, d) total.
iteration tail: read x, d, g, g_new; write x_new, s, y   -> 7
post-search vg at x_new: read x_new, write g_new (+1 fused objective) -> 2-3
ring row writes: 2 rows = 2m/m... counted as 2 passes of d.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..config import LBFGSConfig

# Published peak HBM bandwidth per chip, GB/s.
HBM_BW_GBPS = {
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6e": 1640.0,
}


@dataclass
class TrafficModel:
    """Per-iteration HBM traffic, split by phase, in f32-pass equivalents
    (1.0 = d elements at 4 bytes read or written once; a bfloat16 history
    pass counts 0.5).

    ``batch``: vmapped instance count — passes are PER INSTANCE and the
    lockstep iteration streams them for every lane, so total bytes scale by
    batch.  The model counts d-sized streams only; the per-instance O(m^2)
    small-matrix work (triangular solves, SY/YY updates) is assumed
    compute-negligible — when a measured batch cell falls far below this
    bound, profile whether the batched small ops are the real limiter."""
    passes_direction: float
    passes_line_search: float
    passes_tail: float
    passes_vg: float
    d: int
    dtype_bytes: int
    batch: int = 1

    @property
    def passes_total(self) -> float:
        return (self.passes_direction + self.passes_line_search
                + self.passes_tail + self.passes_vg)

    @property
    def bytes_per_iter(self) -> float:
        """Total HBM bytes per lockstep iteration (all ``batch`` lanes)."""
        return self.passes_total * self.d * self.dtype_bytes * self.batch

    def peak_iters_per_s(self, chip: str = "v5e") -> float:
        """Roofline-bound lockstep iterations/s (one iteration advances
        every lane once)."""
        return HBM_BW_GBPS[chip] * 1e9 / self.bytes_per_iter

    def peak_instance_iters_per_s(self, chip: str = "v5e") -> float:
        """Roofline-bound instance-iterations/s = batch x lockstep rate —
        the unit the batch benchmarks report."""
        return self.peak_iters_per_s(chip) * self.batch

    def roofline_fraction(self, measured_iters_per_s: float,
                          chip: str = "v5e") -> float:
        """measured_iters_per_s in LOCKSTEP iterations/s (for batch cells,
        instance-it/s divided by batch — or use
        measured_instance_rate / peak_instance_iters_per_s, identical)."""
        return measured_iters_per_s / self.peak_iters_per_s(chip)


# Conservative bound on the history footprint XLA will keep VMEM-resident
# across the solver while_loop on current TPUs (measured on v5e: an 80 MB
# f32 m=10 history stays resident; a 160 MB m=20 one streams from HBM).
VMEM_RESIDENT_BYTES = 100e6


def history_streams(m: int, d: int, itemsize: float = 4,
                    batch: int = 1) -> bool:
    """True when the history ring exceeds the VMEM-resident bound and must
    stream from HBM.  THE single source of the measured residency rule —
    history_dtype="auto" (core.solver.resolve_history_dtype),
    with_matvec="auto" (problems.suite.auto_with_matvec) and the traffic
    model below all key on this predicate.

    ``batch``: number of instances live on the device at once (``vmap``
    lane count; on a 2-D (b, d) mesh, the PER-DEVICE lane count).  Residency
    is a property of the TOTAL live footprint: a B=4096 batch of d=1024
    instances carries an 80 KB ring per instance but a 335 MB ring in
    aggregate — fully streaming — which the per-instance size alone
    mispredicts as resident (round-4 verdict weak #2)."""
    return batch * 2 * m * d * itemsize >= VMEM_RESIDENT_BYTES


def traffic_model(cfg: LBFGSConfig, d: int, dtype_bytes: int = 4,
                  avg_ls_trials: float = 2.2,
                  obj_passes: float = 1.0,
                  fused_tail: bool = None,
                  hist_resident: bool = None,
                  batch: int = 1) -> TrafficModel:
    """Estimate HBM passes per iteration for a configuration.

    avg_ls_trials: measured average line-search trials per iteration
    (n_fev / iterations from a run); obj_passes: passes one objective
    evaluation costs beyond reading its input (1 for the suite's fused or
    elementwise-chain objectives); fused_tail: whether the single-stream
    tail kernel is active (defaults to cfg.use_pallas).

    hist_resident: when the whole history (all ``batch`` lanes' rings) fits
    in VMEM, XLA keeps it resident across the while_loop and history reads
    cost NO HBM traffic (see PERFORMANCE.md "VMEM residency"); defaults to
    auto-detection against VMEM_RESIDENT_BYTES.  Ring-row WRITES still
    stream.

    batch: vmapped instance count — residency keys on the TOTAL footprint
    and the returned model's bytes/iter scale by it (TrafficModel.batch).

    History passes assume the lane-tiled (m, R, 128) storage (zero tiling
    waste — types.hist_block); a bfloat16 history pass costs 0.5
    f32-equivalents.
    """
    m = cfg.m
    if fused_tail is None:
        fused_tail = cfg.use_pallas
    hw = 1.0
    hd = cfg.history_dtype
    if hd == "auto":
        # Same rule resolve_history_dtype applies: f32 while resident, bf16
        # streaming AND cleanly (16, 128)-tileable — but ONLY for f32
        # inputs; f64 always keeps full precision (parity paths), so its
        # history weight stays 1.0.
        from ..types import hist_block

        streams = history_streams(m, d, dtype_bytes, batch=batch)
        hd = "bfloat16" if (streams and dtype_bytes == 4
                            and hist_block(d)[0] % 16 == 0) else None
    if hd is not None:
        import jax.numpy as jnp
        hw = jnp.dtype(hd).itemsize / dtype_bytes
    if hist_resident is None:
        hist_resident = not history_streams(m, d, dtype_bytes * hw,
                                            batch=batch)
    hw_write = hw     # ring-row writes stream regardless of residency
    if hist_resident:
        hw = 0.0      # resident history: READS are free

    if cfg.direction == "two_loop":
        # per pair, both loops: read s_i, y_i (history) + read/write q or r.
        p_dir = (4.0 * m) * hw + (4.0 * m) + 2.0
    elif cfg.direction == "compact_incremental":
        # matvecs S@g_new, Y@g_new (tail side) + combine read S, Y, g, write d.
        # g.d comes from the DirAux coefficient identity: no vdot pass.
        p_dir = (2.0 * m) * hw + 1.0 + (2.0 * m) * hw + 2.0
    else:  # compact: recompute S.Y', Y.Y', S.g, Y.g then combine
        p_dir = (5.0 * m) * hw + 1.0 + (2.0 * m) * hw + 2.0

    if cfg.ls_eval == "polynomial":
        p_ls = 2.0  # one (x, d) coefficient pass
    else:
        per_trial = 2.0 + obj_passes
        if cfg.line_search == "backtracking_speculative":
            # the whole candidate ladder shares one (x, d) stream per round
            per_trial = (2.0 + obj_passes) / max(avg_ls_trials, 1.0)
        elif cfg.line_search in ("backtracking_wolfe",
                                 "backtracking_wolfe_bisect",
                                 "wolfe_interpolation"):
            per_trial += 1.0  # gradient per trial
        p_ls = per_trial * avg_ls_trials
        if cfg.direction == "two_loop":
            # Only the two-loop path reduces jnp.vdot(g, d) for phi'(0);
            # the compact paths get it from the DirAux coefficient identity.
            p_ls += 2.0

    if fused_tail:
        # One stream: read x, d, g; write x_new, g_new, s_row, y_row
        # (rows in history dtype); f/grad computed in-kernel.
        p_tail = 3.0 + 2.0 + 2.0 * hw_write
        p_vg = 0.0
        p_ring = 4.0 * hw_write  # conditional row select + write
    else:
        # x_new compute (read x, d, write x_new), vg at x_new, fused
        # iteration_tail (read x, d, g, g_new; write x_new, s, y).
        p_tail = 3.0 + 7.0
        p_vg = 2.0 + obj_passes
        p_ring = 4.0 * hw_write
    return TrafficModel(p_dir, p_ls, p_tail + p_ring, p_vg, d, dtype_bytes,
                        batch=batch)
