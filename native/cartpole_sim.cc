/* See cartpole_sim.h. Same op order as dynamics/cartpole.py::cartpole_step
 * (float32): force = action * max_force_mag * 0.5; friction cart/pole
 * accelerations; Euler position/velocity updates; EXACT rotation update
 * for theta via angle addition + atan2; wind as an additive pole-
 * acceleration term; env-side wrap of theta into (-pi, pi]. */
#include "cartpole_sim.h"

#include <cmath>
#include <cstring>
#include <new>

namespace {

constexpr float kGravity = 9.81f;
constexpr float kPi = 3.14159265358979323846f;

struct Params {
  float masscart, masspole, length, max_force_mag, friction, wind;
};

}  // namespace

struct csim {
  Params p;
  float dt;
  float state[4]; /* [x, x_dot, theta, theta_dot] */
};

extern "C" {

csim *csim_create(float dt, const float *params6) {
  csim *s = new (std::nothrow) csim;
  if (!s) return nullptr;
  s->dt = dt;
  if (params6) {
    s->p = {params6[0], params6[1], params6[2],
            params6[3], params6[4], params6[5]};
  } else {
    /* config_cartpole.json defaults; friction hard-coded to .5 after
     * loading (cartpole_dynamics.py:34) */
    s->p = {1.0f, 0.1f, 0.5f, 30.0f, 0.5f, 0.0f};
  }
  std::memset(s->state, 0, sizeof(s->state));
  return s;
}

void csim_free(csim *s) { delete s; }

void csim_reset(csim *s, const float *state4) {
  std::memcpy(s->state, state4, 4 * sizeof(float));
}

void csim_get_state(const csim *s, float *state4) {
  std::memcpy(state4, s->state, 4 * sizeof(float));
}

void csim_step(csim *s, float action, float *state4) {
  const Params &p = s->p;
  const float dt = s->dt;
  const float x = s->state[0], x_dot = s->state[1];
  const float theta = s->state[2], theta_dot = s->state[3];

  const float force = action * p.max_force_mag * 0.5f;
  const float sin_t = std::sin(theta), cos_t = std::cos(theta);
  const float total_mass = p.masspole + p.masscart;
  const float pml = p.masspole * p.length;

  const float x_acc =
      (-2.0f * pml * theta_dot * theta_dot * sin_t +
       3.0f * p.masspole * kGravity * sin_t * cos_t + 4.0f * force -
       4.0f * p.friction * x_dot) /
      (4.0f * total_mass - 3.0f * p.masspole * cos_t * cos_t);

  float theta_acc =
      (-3.0f * pml * theta_dot * theta_dot * sin_t * cos_t +
       6.0f * total_mass * kGravity * sin_t +
       6.0f * (force - p.friction * x_dot) * cos_t) /
      (4.0f * p.length * total_mass - 3.0f * pml * cos_t * cos_t);
  theta_acc += p.wind * cos_t;

  s->state[0] = x + x_dot * dt;
  s->state[1] = x_dot + x_acc * dt;

  /* exact rotation update + env-side wrap */
  const float sin_d = std::sin(theta_dot * dt), cos_d = std::cos(theta_dot * dt);
  const float new_sin = sin_t * cos_d + cos_t * sin_d;
  const float new_cos = cos_t * cos_d - sin_t * sin_d;
  float new_theta = std::atan2(new_sin, new_cos);
  if (new_theta > kPi) new_theta -= 2.0f * kPi;
  if (new_theta <= -kPi) new_theta += 2.0f * kPi;
  s->state[2] = new_theta;
  s->state[3] = theta_dot + theta_acc * dt;

  csim_get_state(s, state4);
}

}  /* extern "C" */
