from .fixtures import FIXTURE_DIMS, QuadraticFixture, fixture_suite, make_spd_fixture
from .suite import (
    fused_value_and_grad,
    Problem,
    get_problem,
    problem_names,
    reference_x0,
    register_problem,
)
