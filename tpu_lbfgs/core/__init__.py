from .direction import compact_direction, compute_direction, two_loop_direction
from .solver import (finalize_result, init_state, iterate, make_solve_segment,
                     make_value_and_grad, minimize, refresh_products,
                     solve_from_state)
