/* apg_latency — per-decision latency of the native controller runtime.
 *
 * Usage: apg_latency <model.apgc> [iters]
 *
 * Times the FULL quad decision path (featurize + MLP forward + sigmoid)
 * on a stream of perturbed states/references (fresh inputs each call so
 * nothing is cached away), prints median/mean nanoseconds per decision as
 * one JSON line. Complements scripts/latency_bench.py (the JAX-CPU
 * numbers in docs/LATENCY.md).
 */
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <algorithm>
#include <vector>

#include "apg_controller.h"

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <model.apgc> [iters]\n", argv[0]);
    return 2;
  }
  const int iters = argc > 2 ? atoi(argv[2]) : 100000;
  if (iters < 100) {
    fprintf(stderr, "iters must be >= 100 (got %d)\n", iters);
    return 2;
  }
  apgc_model *m = apgc_load(argv[1]);
  if (!m) {
    fprintf(stderr, "failed to load %s\n", argv[1]);
    return 1;
  }
  int32_t dims[8];
  apgc_info(m, dims);
  const int window = dims[1], out_dim = dims[3], hidden = dims[6];

  std::vector<float> state(12), ref((size_t)(window > 0 ? window : 1) * 9),
      out(out_dim);
  unsigned rng = 12345;
  auto frand = [&rng]() {
    rng = rng * 1664525u + 1013904223u;
    return ((float)(rng >> 9) / (float)(1 << 23) - 1.0f) * 0.3f;
  };
  for (auto &v : state) v = frand();
  for (auto &v : ref) v = frand();

  /* pick the decision path this model was exported for */
  std::vector<float> hbuf((size_t)std::max(hidden, 1), 0.0f),
      cbuf((size_t)std::max(hidden, 1), 0.0f);
  const char *system = "quad";
  if (apgc_quad_predict(m, state.data(), ref.data(), out.data()) != 0) {
    system = "wing";
    state[3] = 11.5f; /* level flight; z-scoring needs a sane state */
    if (apgc_wing_predict(m, state.data(), ref.data(), out.data()) != 0) {
      system = "cartpole";
      if (apgc_cartpole_predict(m, state.data(), out.data()) != 0) {
        system = "lstm";
        if (apgc_lstm_predict(m, state.data(), ref.data(), hbuf.data(),
                              cbuf.data(), out.data()) != 0) {
          fprintf(stderr, "unknown model kind\n");
          apgc_free(m);
          return 1;
        }
      }
    }
  }

  auto run = [&]() {
    if (system[0] == 'q')
      apgc_quad_predict(m, state.data(), ref.data(), out.data());
    else if (system[0] == 'w')
      apgc_wing_predict(m, state.data(), ref.data(), out.data());
    else if (system[0] == 'c')
      apgc_cartpole_predict(m, state.data(), out.data());
    else
      apgc_lstm_predict(m, state.data(), ref.data(), hbuf.data(),
                        cbuf.data(), out.data());
  };

  /* warm-up */
  for (int i = 0; i < 1000; ++i) run();

  std::vector<double> ns(iters);
  volatile float sink = 0.0f;
  for (int i = 0; i < iters; ++i) {
    state[1] += 1e-6f * (float)(i % 7); /* fresh input each call */
    ref[0] += 1e-6f;
    auto t0 = std::chrono::steady_clock::now();
    run();
    auto t1 = std::chrono::steady_clock::now();
    ns[i] = (double)std::chrono::duration_cast<std::chrono::nanoseconds>(
                t1 - t0)
                .count();
    sink += out[0];
  }
  std::sort(ns.begin(), ns.end());
  double mean = 0.0;
  for (double v : ns) mean += v;
  mean /= iters;
  printf(
      "{\"metric\": \"native_%s_decision_latency\", \"median_ns\": %.0f, "
      "\"mean_ns\": %.0f, \"p99_ns\": %.0f, \"iters\": %d, \"sink\": %.3f}\n",
      system, ns[iters / 2], mean, ns[(size_t)(iters * 0.99)], iters,
      (double)sink);
  apgc_free(m);
  return 0;
}
