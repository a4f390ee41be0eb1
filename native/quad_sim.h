/* quad_sim — standalone C++ quadrotor simulator (Flightmare model).
 *
 * The external-simulator role of the reference framework: upstream
 * optionally validates its controllers against the C++ Flightmare sim
 * through the flightgym binding (neural_control/flightmare.py:8-117).
 * This is the equivalent native backend for this framework — the same
 * Flightmare quadrotor model (quad_dynamics_flightmare.py:128-216 /
 * dynamics/quad.py::quad_step) implemented in dependency-free C++ float32
 * math, exposed behind the flightgym vec-env conventions so
 * envs/external_sim.py::ExternalSimAdapter drives it unchanged:
 *
 *   observations: [pos(3), euler zyx (yaw, pitch, roll), vel(3), rates(3)]
 *   actions (physical): [collective thrust m/s^2, body rates rad/s (x,y,z)]
 *
 * Bit-level contract: same op order as the JAX step; verified to float32
 * accumulation noise by tests/test_external_sim.py.
 */
#ifndef QUAD_SIM_H_
#define QUAD_SIM_H_

#ifdef __cplusplus
extern "C" {
#endif

typedef struct qsim qsim;

/* params16 layout (row-major, may be NULL for the config_quad.json
 * defaults): [mass, inertia xyz, kinv_ang_vel_tau xyz, gravity xyz,
 * translational_drag xyz, rotational_drag xyz].
 * NOTE: inertia here is the final diagonal (mass/12 * arm^2 * frame),
 * matching QuadParams.inertia. */
qsim *qsim_create(float dt, const float *params16);

void qsim_free(qsim *s);

/* Set the internal 12-dim state [pos, euler xyz (roll,pitch,yaw), vel,
 * body rates] — the framework's state layout, NOT the obs layout. */
void qsim_reset(qsim *s, const float *state12);

/* Fill obs12 with the flightgym-convention observation row. */
void qsim_get_obs(const qsim *s, float *obs12);

/* One semi-implicit Euler step from a physical flightgym action
 * [thrust m/s^2, body rate cmds rad/s]; fills obs12 with the new
 * observation. */
void qsim_step(qsim *s, const float *action4, float *obs12);

#ifdef __cplusplus
}
#endif

#endif /* QUAD_SIM_H_ */
