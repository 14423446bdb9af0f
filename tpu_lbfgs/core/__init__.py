from .direction import compact_direction, compute_direction, two_loop_direction
from .solver import init_state, iterate, make_value_and_grad, minimize, solve_from_state
