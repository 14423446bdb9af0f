// Native benchmark driver: the CPU-executable counterpart of the reference's
// sequential driver + benchmark harness (sequential-implementation/main.cpp,
// benchmark.cpp).  Runs the oracle solver on a chosen problem and prints the
// reference-style report (function, optimum value, elapsed seconds) plus a
// machine-readable line.
//
// Build: make -C native   (or see Makefile)
// Usage: ./lbfgs_bench [problem=rosenbrock] [dim=10000] [line_search=0]
//                      [max_iters=15000] [tol=1e-8] [seed=42]
// line_search ids: 0 backtracking, 1 backtracking_wolfe, 2 bisect,
//                  3 armijo_interpolation, 4 wolfe_interpolation

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

extern "C" int tl_lbfgs_solve(
    int problem_id, double (*)(const double*, int, void*),
    void (*)(const double*, double*, int, void*), void*, const double* x0,
    int n, int m, int max_iters, double tol, int line_search_id,
    int reference_fidelity, const double* params, double* x_out, double* f_out,
    double* gnorm_out, int* iters_out, int* status_out, long* nfev_out,
    long* ngev_out, double* trace_f, double* trace_gnorm, double* trace_alpha);

int main(int argc, char** argv) {
  std::string problem = argc > 1 ? argv[1] : "rosenbrock";
  const int dim = argc > 2 ? std::atoi(argv[2]) : 10000;
  const int ls = argc > 3 ? std::atoi(argv[3]) : 0;
  const int max_iters = argc > 4 ? std::atoi(argv[4]) : 15000;
  const double tol = argc > 5 ? std::atof(argv[5]) : 1e-8;
  const unsigned seed = argc > 6 ? std::atoi(argv[6]) : 42;

  int pid = 1;
  if (problem == "quadratic") pid = 0;
  else if (problem == "rosenbrock") pid = 1;
  else if (problem == "coupled_quadratic") pid = 2;
  else {
    std::fprintf(stderr, "unknown problem %s\n", problem.c_str());
    return 2;
  }

  // x0 ~ U(-2, 2) with a seeded generator (the reference driver uses
  // U(-1000, 1000), main.cpp:36-45 — far starts just add thousands of
  // steepest-descent-like iterations; configurable via env X0_RANGE).
  double range = 2.0;
  if (const char* e = std::getenv("X0_RANGE")) range = std::atof(e);
  std::mt19937 gen(seed);
  std::uniform_real_distribution<double> dist(-range, range);
  std::vector<double> x0(dim);
  for (auto& v : x0) v = dist(gen);

  // Parameter block mirrors tpu_lbfgs.native.binding._pack_params defaults.
  const double params[15] = {1e-4, 0.9, 1.0, 0.5, 1.1, 1e-8, 1e-10, 1e-10,
                             20.0, 256.0, -1.0, 0.5, 1e-10, 0.0, 1.0};

  std::vector<double> x_out(dim);
  double f_out = 0, gnorm_out = 0;
  int iters = 0, status = 0;
  long nfev = 0, ngev = 0;

  const auto t0 = std::chrono::high_resolution_clock::now();
  tl_lbfgs_solve(pid, nullptr, nullptr, nullptr, x0.data(), dim, 10,
                 max_iters, tol, ls, 1, params, x_out.data(), &f_out,
                 &gnorm_out, &iters, &status, &nfev, &ngev, nullptr, nullptr,
                 nullptr);
  const auto t1 = std::chrono::high_resolution_clock::now();
  const double elapsed = std::chrono::duration<double>(t1 - t0).count();

  std::printf("Function: %s (d=%d)\n", problem.c_str(), dim);
  std::printf("Optimum value: %.6g\n", f_out);
  std::printf("Elapsed time: %.5f seconds\n", elapsed);
  std::printf("---------------------------------------------\n");
  std::printf(
      "{\"problem\": \"%s\", \"dim\": %d, \"line_search\": %d, "
      "\"iterations\": %d, \"status\": %d, \"f\": %.10e, \"g_norm\": %.6e, "
      "\"n_fev\": %ld, \"n_gev\": %ld, \"elapsed_s\": %.6f}\n",
      problem.c_str(), dim, ls, iters, status, f_out, gnorm_out, nfev, ngev,
      elapsed);
  return 0;
}
