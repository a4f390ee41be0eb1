/* See wing_sim.h. Same op order as dynamics/fixed_wing.py::wing_step in
 * float32. Quirk preserved: the roll/yaw moments use the chord c, not the
 * span b (the reference's qbarS * c * Cl / Cn). The inertia inverse is
 * computed in double then truncated to float, matching wing_params(). */
#include "wing_sim.h"

#include <cmath>
#include <cstring>
#include <new>

namespace {

constexpr float kAlphaBound = 10.0f / 180.0f * 3.14159265358979323846f;

struct Cfg {
  float mass, rho, S, c, b, g, epsilon;
  /* coefficient order matches _COEF_KEYS (fixed_wing.py:48-55) */
  float CL0, CL_alpha, CL_q, CL_del_e;
  float CD0, CD_alpha, CD_q, CD_del_e;
  float CY0, CY_beta, CY_p, CY_r, CY_del_a, CY_del_r;
  float Cl0, Cl_beta, Cl_p, Cl_r, Cl_del_a, Cl_del_r;
  float Cm0, Cm_alpha, Cm_q, Cm_del_e;
  float Cn0, Cn_beta, Cn_p, Cn_r, Cn_del_a, Cn_del_r;
  float I[9];     /* row-major inertia tensor */
  float Iinv[9];  /* row-major inverse */
};

Cfg default_cfg() {
  Cfg c;
  c.mass = 1.01f; c.rho = 1.225f; c.S = 0.276f; c.c = 0.185f; c.b = 1.54f;
  c.g = 9.81f; c.epsilon = 0.16534698176788384f;
  c.CL0 = 0.39f; c.CL_alpha = 4.5321f; c.CL_q = 0.318f; c.CL_del_e = 0.527f;
  c.CD0 = 0.0765f; c.CD_alpha = 0.3346f; c.CD_q = 0.354f;
  c.CD_del_e = 0.004f;
  c.CY0 = 0.0f; c.CY_beta = -0.033f; c.CY_p = -0.1f; c.CY_r = 0.039f;
  c.CY_del_a = 0.0f; c.CY_del_r = 0.225f;
  c.Cl0 = 0.0f; c.Cl_beta = -0.081f; c.Cl_p = -0.529f; c.Cl_r = 0.159f;
  c.Cl_del_a = -0.453f; c.Cl_del_r = 0.005f;
  c.Cm0 = 0.02f; c.Cm_alpha = -1.4037f; c.Cm_q = -0.1324f;
  c.Cm_del_e = -0.4236f;
  c.Cn0 = 0.0f; c.Cn_beta = 0.189f; c.Cn_p = -0.083f; c.Cn_r = -0.948f;
  c.Cn_del_a = -0.041f; c.Cn_del_r = -0.077f;

  const double Ixx = 0.04766, Iyy = 0.05005, Izz = 0.09558, Ixz = -0.00105;
  const double I[9] = {Ixx, 0, -Ixz, 0, Iyy, 0, -Ixz, 0, Izz};
  /* analytic inverse of [[a,0,d],[0,e,0],[d,0,f]] */
  const double a = I[0], d = I[2], e = I[4], f = I[8];
  const double det = a * f - d * d;
  const double Iinv[9] = {f / det, 0, -d / det, 0, 1.0 / e, 0,
                          -d / det, 0, a / det};
  for (int i = 0; i < 9; ++i) {
    c.I[i] = static_cast<float>(I[i]);
    c.Iinv[i] = static_cast<float>(Iinv[i]);
  }
  return c;
}

inline float clampf(float x, float lo, float hi) {
  return x < lo ? lo : (x > hi ? hi : x);
}

}  // namespace

struct wsim {
  Cfg p;
  float dt;
  float state[12];
};

extern "C" {

wsim *wsim_create(float dt) {
  wsim *s = new (std::nothrow) wsim;
  if (!s) return nullptr;
  s->dt = dt;
  s->p = default_cfg();
  std::memset(s->state, 0, sizeof(s->state));
  return s;
}

void wsim_free(wsim *s) { delete s; }

void wsim_reset(wsim *s, const float *state12) {
  std::memcpy(s->state, state12, 12 * sizeof(float));
}

void wsim_get_state(const wsim *s, float *state12) {
  std::memcpy(state12, s->state, 12 * sizeof(float));
}

void wsim_step(wsim *s, const float *action4, float *state12) {
  const Cfg &P = s->p;
  const float dt = s->dt;
  const float *st = s->state;
  const float u = st[3], v = st[4], w = st[5];
  const float phi = st[6], theta = st[7], psi = st[8];
  const float p = st[9], q = st[10], r = st[11];

  /* normalize_action (fixed_wing_dynamics.py:41-46) */
  const float kPi = 3.14159265358979323846f;
  const float T = action4[0] * 7.0f;
  const float del_e = kPi * (action4[1] * 40.0f - 20.0f) / 180.0f;
  const float del_a = kPi * (action4[2] * 5.0f - 2.5f) / 180.0f;
  const float del_r = kPi * (action4[3] * 40.0f - 20.0f) / 180.0f;

  const float V = std::sqrt(u * u + v * v + w * w);
  const float alpha = clampf(std::atan(w / u), -kAlphaBound, kAlphaBound);
  const float beta = clampf(std::atan(v / V), -kAlphaBound, kAlphaBound);

  const float half_c_V = P.c / (2.0f * V);
  const float half_b_V = P.b / (2.0f * V);

  const float CL = P.CL0 + P.CL_alpha * alpha + P.CL_q * half_c_V * q +
                   P.CL_del_e * del_e;
  const float CD = P.CD0 + P.CD_alpha * alpha + P.CD_q * half_c_V * q +
                   P.CD_del_e * del_e;
  const float CY = P.CY0 + P.CY_beta * beta + P.CY_p * half_b_V * p +
                   P.CY_r * half_b_V * r + P.CY_del_a * del_a +
                   P.CY_del_r * del_r;
  const float Cl = P.Cl0 + P.Cl_beta * beta + P.Cl_p * half_b_V * p +
                   P.Cl_r * half_b_V * r + P.Cl_del_a * del_a +
                   P.Cl_del_r * del_r;
  const float Cm = P.Cm0 + P.Cm_alpha * alpha + P.Cm_q * half_c_V * q +
                   P.Cm_del_e * del_e;
  const float Cn = P.Cn0 + P.Cn_beta * beta + P.Cn_p * half_b_V * p +
                   P.Cn_r * half_b_V * r + P.Cn_del_a * del_a +
                   P.Cn_del_r * del_r;

  const float qbarS = 0.5f * P.rho * V * V * P.S;
  const float L = qbarS * CL, D = qbarS * CD, Y = qbarS * CY;
  /* reference quirk: chord c for ALL moments (fixed_wing.py:175-177) */
  const float l_mom = qbarS * P.c * Cl;
  const float m_mom = qbarS * P.c * Cm;
  const float n_mom = qbarS * P.c * Cn;

  const float sa = std::sin(alpha), ca = std::cos(alpha);
  const float sb = std::sin(beta), cb = std::cos(beta);
  const float f_aero_x = ca * cb * (-D) + (-ca) * sb * Y - sa * (-L);
  const float f_aero_y = sb * (-D) + cb * Y;
  const float f_aero_z = sa * cb * (-D) - sa * sb * Y + ca * (-L);

  const float g_m = P.g * P.mass;
  const float sph = std::sin(phi), cph = std::cos(phi);
  const float sth = std::sin(theta), cth = std::cos(theta);
  const float f_x = f_aero_x + (-g_m * sth) + T * std::cos(P.epsilon);
  const float f_y = f_aero_y + sph * cth * g_m;
  const float f_z = f_aero_z + cph * cth * g_m + T * std::sin(P.epsilon);

  /* position kinematics R_ib @ vel */
  const float sps = std::sin(psi), cps = std::cos(psi);
  const float px_dot = u * (cth * cps) + v * (-cph * sps + sph * sth * cps) +
                       w * (sph * sps + cph * sth * cps);
  const float py_dot = u * (cth * sps) + v * (cph * cps + sph * sth * sps) +
                       w * (-sph * cps + cph * sth * sps);
  const float pz_dot = -u * sth + v * sph * cth + w * cph * cth;

  /* body accelerations: f/m - omega x vel */
  const float inv_m = 1.0f / P.mass;
  const float u_dot = f_x * inv_m - (q * w - r * v);
  const float v_dot = f_y * inv_m - (r * u - p * w);
  const float w_dot = f_z * inv_m - (p * v - q * u);

  /* euler rates (full tan/sec matrix) */
  const float tth = std::tan(theta);
  const float phi_dot = p + sph * tth * q + cph * tth * r;
  const float theta_dot = cph * q - sph * r;
  const float psi_dot = sph / cth * q + cph / cth * r;

  /* angular dynamics: I_inv (moments - omega x (I omega)) */
  float Iw[3];
  for (int i = 0; i < 3; ++i)
    Iw[i] = P.I[3 * i] * p + P.I[3 * i + 1] * q + P.I[3 * i + 2] * r;
  const float tq_x = l_mom - (q * Iw[2] - r * Iw[1]);
  const float tq_y = m_mom - (r * Iw[0] - p * Iw[2]);
  const float tq_z = n_mom - (p * Iw[1] - q * Iw[0]);
  float w_dot3[3];
  const float tq[3] = {tq_x, tq_y, tq_z};
  for (int i = 0; i < 3; ++i)
    w_dot3[i] = P.Iinv[3 * i] * tq[0] + P.Iinv[3 * i + 1] * tq[1] +
                P.Iinv[3 * i + 2] * tq[2];

  float *out = s->state;
  out[0] = st[0] + dt * px_dot;
  out[1] = st[1] + dt * py_dot;
  out[2] = st[2] + dt * pz_dot;
  out[3] = u + dt * u_dot;
  out[4] = v + dt * v_dot;
  out[5] = w + dt * w_dot;
  out[6] = phi + dt * phi_dot;
  out[7] = theta + dt * theta_dot;
  out[8] = psi + dt * psi_dot;
  out[9] = p + dt * w_dot3[0];
  out[10] = q + dt * w_dot3[1];
  out[11] = r + dt * w_dot3[2];

  wsim_get_state(s, state12);
}

}  /* extern "C" */
