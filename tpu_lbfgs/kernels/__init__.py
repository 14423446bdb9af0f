from .pallas_ops import (
    FUSED_VG,
    combine_direction,
    fused_vg_coupled_quadratic,
    fused_vg_quadratic,
    fused_vg_rosenbrock,
    iteration_tail,
    pallas_ok,
)
