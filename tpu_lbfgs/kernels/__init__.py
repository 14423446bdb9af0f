from .chain import chain_jnp, make_compact_chain
from .pallas_ops import (
    FUSED_VG,
    TAIL_BODIES,
    combine_direction,
    fused_tail_jnp,
    fused_vg_coupled_quadratic,
    fused_vg_quadratic,
    fused_vg_rosenbrock,
    iteration_tail,
    make_fused_tail,
    make_multi_phi,
    make_multi_phi_dphi,
    pallas_ok,
)
