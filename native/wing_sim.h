/* wing_sim — standalone C++ 6-DoF fixed-wing simulator (Beard & McLain).
 *
 * The fixed-wing member of the native simulator family (quad_sim.h,
 * cartpole_sim.h): the reference's aerodynamic model
 * (fixed_wing_dynamics.py:98-267 / dynamics/fixed_wing.py::wing_step) in
 * dependency-free C++ float32 math — linear aero coefficients with
 * alpha/beta clamps, wind->body force assembly, full-inertia-tensor
 * angular dynamics, Euler integration.
 *
 * State (12): [pos NED(3), vel body uvw(3), euler(3), body rates pqr(3)]
 * Action (4): normalized [0,1] (thrust, elevator, aileron, rudder) — the
 * controller-net convention (normalize_action, fixed_wing_dynamics.py:41-46).
 */
#ifndef WING_SIM_H_
#define WING_SIM_H_

#ifdef __cplusplus
extern "C" {
#endif

typedef struct wsim wsim;

/* Default config_fixed_wing.json parameters only (the mismatch hook of
 * the other sims is not replicated here; robustness runs live in the
 * Python stack). */
wsim *wsim_create(float dt);

void wsim_free(wsim *s);

void wsim_reset(wsim *s, const float *state12);

void wsim_get_state(const wsim *s, float *state12);

/* One Euler step from a normalized [0,1] action; fills state12. */
void wsim_step(wsim *s, const float *action4, float *state12);

#ifdef __cplusplus
}
#endif

#endif /* WING_SIM_H_ */
