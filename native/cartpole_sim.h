/* cartpole_sim — standalone C++ cart-pole simulator (friction model).
 *
 * The cart-pole counterpart of quad_sim.h: the reference's Euler-integrated
 * friction cart-pole with the exact sin/cos rotation update for the pole
 * angle (cartpole_dynamics.py:53-119 / dynamics/cartpole.py::cartpole_step)
 * in dependency-free C++ float32 math, plus the env-side theta wrap to
 * (-pi, pi] (cartpole_env.py:77-81). Drives the fully-native balance loop
 * in closed_loop_main.cc and parity tests.
 */
#ifndef CARTPOLE_SIM_H_
#define CARTPOLE_SIM_H_

#ifdef __cplusplus
extern "C" {
#endif

typedef struct csim csim;

/* params6 (may be NULL for config_cartpole.json defaults):
 * [masscart, masspole, length, max_force_mag, friction, wind]. */
csim *csim_create(float dt, const float *params6);

void csim_free(csim *s);

/* Set the internal 4-dim state [x, x_dot, theta, theta_dot]. */
void csim_reset(csim *s, const float *state4);

void csim_get_state(const csim *s, float *state4);

/* One Euler step from a normalized action in [-1, 1]; fills state4 with
 * the new (theta-wrapped) state. */
void csim_step(csim *s, float action, float *state4);

#ifdef __cplusplus
}
#endif

#endif /* CARTPOLE_SIM_H_ */
