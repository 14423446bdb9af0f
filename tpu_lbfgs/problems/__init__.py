from .suite import (
    Problem,
    get_problem,
    problem_names,
    reference_x0,
    register_problem,
)
