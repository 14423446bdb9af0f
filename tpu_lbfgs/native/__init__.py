from .binding import build, native_lbfgs, PROBLEM_IDS
