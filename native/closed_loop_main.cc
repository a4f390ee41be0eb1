/* apg_closed_loop — the ENTIRE deployment stack outside Python.
 *
 * Loads an exported quad controller (.apgc, scripts/export_controller.py)
 * and flies it closed-loop in the native C++ Flightmare simulator
 * (quad_sim.cc): per step a closed-form min-jerk hover window is planned
 * (trajectory/minjerk.py::min_jerk_reference with acc0=0, velf=accf=0 —
 * the Hover reference of trajectory/refs.py::hover_ref_window), the
 * controller decides, and the sim integrates. No Python, no JAX, no
 * dependencies — the 10 Hz onboard loop of the reference's deployment
 * story (ICRA'23), runnable on a microcontroller-class CPU.
 *
 * Usage: apg_closed_loop <model.apgc> [steps]
 * Prints per-step mean divergence, final distance to the hover target,
 * and the wall-clock cost of the full decide+plan+integrate step.
 * Exit code 0 iff the flight ends within 0.15 m of the target.
 */
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "apg_controller.h"
#include "cartpole_sim.h"
#include "quad_sim.h"
#include "wing_sim.h"

namespace {

constexpr int kHorizon = 10;
constexpr float kDt = 0.1f;

/* Cart-pole balance loop (kind 1 models): start with a perturbed pole,
 * run the exported controller in the C++ cart-pole sim for `steps` Euler
 * steps at dt=0.05 (the cartpole config's delta_t). Success = the pole
 * angle stays within 0.5 rad throughout. */
int run_cartpole(apgc_model *ctrl, int steps) {
  csim *sim = csim_create(0.05f, nullptr);
  float state[4] = {0.0f, 0.0f, 0.18f, -0.2f};
  csim_reset(sim, state);
  float actions[256];
  int balanced = 0;
  double vel_sum = 0.0;
  const auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < steps; ++i) {
    if (apgc_cartpole_predict(ctrl, state, actions) != 0) {
      std::fprintf(stderr, "cartpole predict failed\n");
      return 2;
    }
    csim_step(sim, actions[0], state);
    if (std::fabs(state[2]) < 0.5f) ++balanced;
    vel_sum += std::fabs(state[1]);
  }
  const auto t1 = std::chrono::steady_clock::now();
  const double us_per_step =
      std::chrono::duration<double, std::micro>(t1 - t0).count() / steps;
  std::printf(
      "{\"steps\": %d, \"balanced\": %d, \"mean_abs_vel\": %.4f, "
      "\"us_per_step\": %.2f}\n",
      steps, balanced, vel_sum / steps, us_per_step);
  csim_free(sim);
  apgc_free(ctrl);
  return balanced == steps ? 0 : 1;
}

/* Min-jerk [pos, att=0, vel] window rows toward a hover target
 * (minjerk.py:16-56 + refs.py::_to_state_rows), float32 math. ``n`` is
 * the number of planned rows — the model's observation window (wide-
 * window distilled students consume more than the 10-action horizon). */
void hover_window(const float *state, const float *target, int n,
                  float *rows /* n x 9 */) {
  const float Tf = kDt * n;
  const float T2 = Tf * Tf, T3 = T2 * Tf, T4 = T3 * Tf, T5 = T4 * Tf;
  float alpha[3], beta[3], gamma[3];
  for (int k = 0; k < 3; ++k) {
    const float dv = 0.0f - state[6 + k];            /* velf=0, acc0=0 */
    const float dp = target[k] - state[k] - state[6 + k] * Tf;
    alpha[k] = (-360.0f * Tf * dv + 720.0f * dp) / T5;
    beta[k] = (168.0f * T2 * dv - 360.0f * Tf * dp) / T5;
    gamma[k] = (-24.0f * T3 * dv + 60.0f * T2 * dp) / T5;
  }
  for (int i = 0; i < n; ++i) {
    const float t = (i + 1) * kDt;
    const float t2 = t * t, t3 = t2 * t, t4 = t3 * t, t5 = t4 * t;
    for (int k = 0; k < 3; ++k) {
      rows[i * 9 + k] =
          state[k] + state[6 + k] * t + gamma[k] / 6.0f * t3 +
          beta[k] / 24.0f * t4 + alpha[k] / 120.0f * t5;
      rows[i * 9 + 3 + k] = 0.0f; /* attitude columns */
      rows[i * 9 + 6 + k] =
          state[6 + k] + 0.5f * gamma[k] * t2 + beta[k] / 6.0f * t3 +
          alpha[k] / 24.0f * t4;
    }
  }
}

/* Fixed-wing fly-to-point loop (system tag 1): zero_reset level flight at
 * u = 11.5 m/s (wing_env.py:26-28), target at x = 50 m with a lateral
 * offset; fly until the x-plane crossing (evaluate_fixed_wing.py:91-109)
 * and report the interpolated miss distance in the target plane. */
int run_wing(apgc_model *ctrl, int max_steps) {
  const float kWingDt = 0.05f;
  wsim *sim = wsim_create(kWingDt);
  float state[12] = {0};
  state[3] = 11.5f;
  wsim_reset(sim, state);
  const float target[3] = {50.0f, 1.0f, -1.0f};
  float actions[256];
  float prev[12] = {0};
  int steps = 0;
  const auto t0 = std::chrono::steady_clock::now();
  for (; steps < max_steps; ++steps) {
    std::memcpy(prev, state, sizeof(prev));
    if (apgc_wing_predict(ctrl, state, target, actions) != 0) {
      std::fprintf(stderr, "wing predict failed\n");
      return 2;
    }
    wsim_step(sim, actions, state);
    if (state[0] >= target[0]) break;
  }
  const auto t1 = std::chrono::steady_clock::now();
  const double us_per_step =
      std::chrono::duration<double, std::micro>(t1 - t0).count() /
      (steps + 1);
  if (state[0] < target[0]) {
    std::printf("{\"error\": \"never reached the target plane\"}\n");
    return 1;
  }
  /* interpolate the crossing point in the x = target[0] plane */
  const float a = (target[0] - prev[0]) / (state[0] - prev[0]);
  const float y = prev[1] + a * (state[1] - prev[1]);
  const float z = prev[2] + a * (state[2] - prev[2]);
  const float dy = y - target[1], dz = z - target[2];
  const float miss = std::sqrt(dy * dy + dz * dz);
  std::printf(
      "{\"steps\": %d, \"target_error\": %.4f, \"us_per_step\": %.2f}\n",
      steps + 1, miss, us_per_step);
  wsim_free(sim);
  apgc_free(ctrl);
  return miss < 1.0f ? 0 : 1;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <model.apgc> [steps]\n", argv[0]);
    return 2;
  }
  const int steps = argc > 2 ? std::atoi(argv[2]) : 251;

  apgc_model *ctrl = apgc_load(argv[1]);
  if (!ctrl) {
    std::fprintf(stderr, "failed to load %s\n", argv[1]);
    return 2;
  }
  int32_t dims[8];
  apgc_info(ctrl, dims);
  if (dims[7] == 1) return run_cartpole(ctrl, steps);
  if (apgc_system(ctrl) == 1) return run_wing(ctrl, steps);
  const int window = dims[1];  /* observation rows the model consumes */
  const int hidden = dims[6];
  const bool lstm = dims[7] == 2;

  qsim *sim = qsim_create(kDt, nullptr);
  float state[12] = {0};
  state[0] = 0.3f;
  state[1] = -0.2f;
  state[2] = 2.5f;
  qsim_reset(sim, state);

  const float target[3] = {0.0f, 0.0f, 3.0f};
  std::vector<float> rows(static_cast<size_t>(window) * 9);
  std::vector<float> h(hidden, 0.0f), c(hidden, 0.0f);
  float actions[256];
  float obs[12];
  double div_sum = 0.0;

  const auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < steps; ++i) {
    hover_window(state, target, window, rows.data());
    const int rc =
        lstm ? apgc_lstm_predict(ctrl, state, rows.data(), h.data(),
                                 c.data(), actions)
             : apgc_quad_predict(ctrl, state, rows.data(), actions);
    if (rc != 0) {
      std::fprintf(stderr, "not a quad model\n");
      return 2;
    }
    /* execute the first planned action: [0,1] -> physical command */
    float act[4];
    act[0] = actions[0] * 15.0f - 7.5f + 9.81f;
    for (int k = 1; k < 4; ++k) act[k] = actions[k] - 0.5f;
    qsim_step(sim, act, obs);
    /* obs (zyx attitude) -> framework state layout */
    state[0] = obs[0];
    state[1] = obs[1];
    state[2] = obs[2];
    state[3] = obs[5];
    state[4] = obs[4];
    state[5] = obs[3];
    std::memcpy(state + 6, obs + 6, 6 * sizeof(float));
    const float dx = state[0] - target[0], dy = state[1] - target[1],
                dz = state[2] - target[2];
    div_sum += std::sqrt(dx * dx + dy * dy + dz * dz);
  }
  const auto t1 = std::chrono::steady_clock::now();
  const double us_per_step =
      std::chrono::duration<double, std::micro>(t1 - t0).count() / steps;

  const float dx = state[0] - target[0], dy = state[1] - target[1],
              dz = state[2] - target[2];
  const float final_dist = std::sqrt(dx * dx + dy * dy + dz * dz);
  std::printf(
      "{\"steps\": %d, \"mean_divergence\": %.4f, \"final_dist\": %.4f, "
      "\"us_per_step\": %.2f}\n",
      steps, div_sum / steps, final_dist, us_per_step);

  qsim_free(sim);
  apgc_free(ctrl);
  return final_dist < 0.15f ? 0 : 1;
}
