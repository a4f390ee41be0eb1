/* See quad_sim.h. Math mirrors dynamics/quad.py::quad_step (itself the
 * Flightmare model of quad_dynamics_flightmare.py:128-216) in float32 with
 * the same operation order:
 *   - low-level rate loop: angular_acc = (J*(Kinv*(cmd - av)) + rot_drag)/J
 *     (the av x (J av) cross product cancels exactly for diagonal J);
 *   - world acceleration from the body-z thrust column of R^T;
 *   - position quirk: pos += 0.5*dt^2*acc + 0.5*dt*vel (the reference's
 *     half-velocity term, quad_dynamics_flightmare.py:172-174);
 *   - attitude integrates euler_rate with the OLD angular velocity.
 */
#include "quad_sim.h"

#include <cmath>
#include <cstring>
#include <new>

namespace {

/* config_quad.json defaults; inertia = mass/12 * arm^2 * frame_inertia
 * with mass .723, arm .31, frame [4.5, 4.5, 7] (quad_dynamics_base.py:32-35).
 * Computed in double then truncated, matching quad_params()'s float cast. */
constexpr float kMass = 0.723f;
constexpr double kArm = 0.31;
constexpr double kMassD = 0.723;

struct Params {
  float mass;
  float inertia[3];
  float kinv[3];
  float gravity[3];
  float tdrag[3];
  float rdrag[3];
};

Params default_params() {
  Params p;
  p.mass = kMass;
  const double frame[3] = {4.5, 4.5, 7.0};
  for (int i = 0; i < 3; ++i) {
    p.inertia[i] = static_cast<float>(kMassD / 12.0 * kArm * kArm * frame[i]);
    p.kinv[i] = (i == 2) ? 5.0f : 16.6f;
    p.gravity[i] = (i == 2) ? -9.81f : 0.0f;
    p.tdrag[i] = 0.0f;
    p.rdrag[i] = 0.0f;
  }
  return p;
}

}  // namespace

struct qsim {
  Params p;
  float dt;
  /* [pos(3), euler xyz(3), vel(3), body rates(3)] */
  float state[12];
};

extern "C" {

qsim *qsim_create(float dt, const float *params16) {
  qsim *s = new (std::nothrow) qsim;
  if (!s) return nullptr;
  s->dt = dt;
  if (params16) {
    s->p.mass = params16[0];
    std::memcpy(s->p.inertia, params16 + 1, 3 * sizeof(float));
    std::memcpy(s->p.kinv, params16 + 4, 3 * sizeof(float));
    std::memcpy(s->p.gravity, params16 + 7, 3 * sizeof(float));
    std::memcpy(s->p.tdrag, params16 + 10, 3 * sizeof(float));
    std::memcpy(s->p.rdrag, params16 + 13, 3 * sizeof(float));
  } else {
    s->p = default_params();
  }
  std::memset(s->state, 0, sizeof(s->state));
  return s;
}

void qsim_free(qsim *s) { delete s; }

void qsim_reset(qsim *s, const float *state12) {
  std::memcpy(s->state, state12, 12 * sizeof(float));
}

void qsim_get_obs(const qsim *s, float *obs12) {
  const float *st = s->state;
  obs12[0] = st[0];
  obs12[1] = st[1];
  obs12[2] = st[2];
  obs12[3] = st[5]; /* yaw   (zyx obs order) */
  obs12[4] = st[4]; /* pitch */
  obs12[5] = st[3]; /* roll  */
  for (int i = 6; i < 12; ++i) obs12[i] = st[i];
}

void qsim_step(qsim *s, const float *action4, float *obs12) {
  const Params &p = s->p;
  const float dt = s->dt;
  float *st = s->state;

  const float total_thrust = action4[0];
  const float rates_cmd[3] = {action4[1], action4[2], action4[3]};

  const float roll = st[3], pitch = st[4], yaw = st[5];
  const float *vel = st + 6;
  const float *av = st + 9;

  /* angular dynamics (rate loop, cross product cancelled) */
  float angular_acc[3];
  for (int i = 0; i < 3; ++i) {
    const float torque_minus_cross =
        p.inertia[i] * (p.kinv[i] * (rates_cmd[i] - av[i])) + p.rdrag[i];
    angular_acc[i] = torque_minus_cross / p.inertia[i];
  }

  /* world acceleration: third column of R^T times thrust force */
  const float Cy = std::cos(yaw), Sy = std::sin(yaw);
  const float Cp = std::cos(pitch), Sp = std::sin(pitch);
  const float Cr = std::cos(roll), Sr = std::sin(roll);
  const float force = p.mass * total_thrust;
  const float inv_m = 1.0f / p.mass;
  float acc[3];
  acc[0] = (Cy * Sp * Cr + Sr * Sy) * force * inv_m + p.gravity[0] + p.tdrag[0];
  acc[1] = (Cr * Sy * Sp - Cy * Sr) * force * inv_m + p.gravity[1] + p.tdrag[1];
  acc[2] = (Cr * Cp) * force * inv_m + p.gravity[2] + p.tdrag[2];

  /* euler rates from the OLD angular velocity (reference quirk) */
  const float er_roll = av[0] - Sp * av[2];
  const float er_pitch = Cr * av[1] + Cp * Sr * av[2];
  const float er_yaw = -Sr * av[1] + Cp * Cr * av[2];

  for (int i = 0; i < 3; ++i) {
    st[i] = st[i] + 0.5f * dt * dt * acc[i] + 0.5f * dt * vel[i];
  }
  st[3] = roll + dt * er_roll;
  st[4] = pitch + dt * er_pitch;
  st[5] = yaw + dt * er_yaw;
  for (int i = 0; i < 3; ++i) st[6 + i] = vel[i] + dt * acc[i];
  for (int i = 0; i < 3; ++i) st[9 + i] = av[i] + dt * angular_acc[i];

  qsim_get_obs(s, obs12);
}

}  /* extern "C" */
