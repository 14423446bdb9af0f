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
    pass counts 0.5)."""
    passes_direction: float
    passes_line_search: float
    passes_tail: float
    passes_vg: float
    d: int
    dtype_bytes: int

    @property
    def passes_total(self) -> float:
        return (self.passes_direction + self.passes_line_search
                + self.passes_tail + self.passes_vg)

    @property
    def bytes_per_iter(self) -> float:
        return self.passes_total * self.d * self.dtype_bytes

    def peak_iters_per_s(self, chip: str = "v5e") -> float:
        return HBM_BW_GBPS[chip] * 1e9 / self.bytes_per_iter

    def roofline_fraction(self, measured_iters_per_s: float,
                          chip: str = "v5e") -> float:
        return measured_iters_per_s / self.peak_iters_per_s(chip)


# Conservative bound on the history footprint XLA will keep VMEM-resident
# across the solver while_loop on current TPUs (measured on v5e: an 80 MB
# f32 m=10 history stays resident; a 160 MB m=20 one streams from HBM).
VMEM_RESIDENT_BYTES = 100e6


def history_streams(m: int, d: int, itemsize: float = 4) -> bool:
    """True when the (2, m, d) history ring exceeds the VMEM-resident bound
    and must stream from HBM.  THE single source of the measured residency
    rule — history_dtype="auto" (core.solver.resolve_history_dtype),
    with_matvec="auto" (problems.suite.auto_with_matvec) and the traffic
    model below all key on this predicate."""
    return 2 * m * d * itemsize >= VMEM_RESIDENT_BYTES


def traffic_model(cfg: LBFGSConfig, d: int, dtype_bytes: int = 4,
                  avg_ls_trials: float = 2.2,
                  obj_passes: float = 1.0,
                  fused_tail: bool = None,
                  hist_resident: bool = None) -> TrafficModel:
    """Estimate HBM passes per iteration for a configuration.

    avg_ls_trials: measured average line-search trials per iteration
    (n_fev / iterations from a run); obj_passes: passes one objective
    evaluation costs beyond reading its input (1 for the suite's fused or
    elementwise-chain objectives); fused_tail: whether the single-stream
    tail kernel is active (defaults to cfg.use_pallas).

    hist_resident: when the whole (2, m, d) history fits in VMEM, XLA keeps
    it resident across the while_loop and history reads cost NO HBM traffic
    (see PERFORMANCE.md "VMEM residency"); defaults to auto-detection
    against VMEM_RESIDENT_BYTES.  Ring-row WRITES still stream.

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
        # streaming — but ONLY for f32 inputs; f64 always keeps full
        # precision (parity paths), so its history weight stays 1.0.
        streams = history_streams(m, d, dtype_bytes)
        hd = "bfloat16" if (streams and dtype_bytes == 4) else None
    if hd is not None:
        import jax.numpy as jnp
        hw = jnp.dtype(hd).itemsize / dtype_bytes
    if hist_resident is None:
        hist_resident = not history_streams(m, d, dtype_bytes * hw)
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
    return TrafficModel(p_dir, p_ls, p_tail + p_ring, p_vg, d, dtype_bytes)
