from .strategies import (
    backtracking,
    backtracking_wolfe,
    backtracking_wolfe_bisect,
    armijo_interpolation,
    wolfe_interpolation,
    get_line_search,
)
