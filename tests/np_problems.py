"""Pure-NumPy objective implementations used by the oracle in parity tests.

Mathematically identical to tpu_lbfgs.problems.suite (and to the reference's
functions.cpp:6-49 / benchmark.cpp:16-81); kept separate so the oracle path
shares no code with the JAX path under test.
"""
import numpy as np


def quadratic_f(x):
    r = x - 1.0
    return float(np.sum(r * r))


def quadratic_grad(x):
    return 2.0 * (x - 1.0)


def rosenbrock_f(x):
    xi, xn = x[:-1], x[1:]
    t1 = xn - xi * xi
    t2 = 1.0 - xi
    return float(np.sum(100.0 * t1 * t1 + t2 * t2))


def rosenbrock_grad(x):
    xi, xn = x[:-1], x[1:]
    t2 = xn - xi * xi
    g = np.zeros_like(x)
    g[:-1] += 2.0 * (xi - 1.0) - 400.0 * xi * t2
    g[1:] += 200.0 * t2
    return g


def coupled_quadratic_f(x, coeff=1000.0):
    return float(coeff * np.sum(x * x) + (coeff / 10.0) * np.sum(x[:-1] * x[1:]))


def coupled_quadratic_grad(x, coeff=1000.0):
    g = 2.0 * coeff * x
    g[:-1] += (coeff / 10.0) * x[1:]
    g[1:] += (coeff / 10.0) * x[:-1]
    return g


PROBLEMS = {
    "quadratic": (quadratic_f, quadratic_grad),
    "rosenbrock": (rosenbrock_f, rosenbrock_grad),
    "coupled_quadratic": (coupled_quadratic_f, coupled_quadratic_grad),
}
