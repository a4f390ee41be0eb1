/* apg_controller — standalone C runtime for trained APG controller nets.
 *
 * The deployment target of the reference framework (ICRA'23 APG paper) is a
 * microcontroller-class onboard computer running the trained controller in a
 * 10 Hz loop; its Python stack never ships there. This runtime executes the
 * full decision path of an exported checkpoint — featurization
 * (data/dataset.py::quad_prepare_data), the hutter_model-style MLP
 * (models/mlp.py::control_net_apply), and the output sigmoid
 * (controllers wrapper convention) — in dependency-free C++ from a single
 * model file written by scripts/export_controller.py.
 *
 * Bit-level contract: identical math to the JAX forward (same op order per
 * layer; accumulation order inside a dot product may differ, giving float
 * differences ~1e-6), verified by tests/test_native_runtime.py.
 */
#ifndef APG_CONTROLLER_H_
#define APG_CONTROLLER_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct apgc_model apgc_model;

/* Load an exported .apgc model file. Returns NULL on failure. */
apgc_model *apgc_load(const char *path);

void apgc_free(apgc_model *m);

/* Fill dims[0..7] = {state_dim, window, ref_dim, out_dim, action_dim,
 * conv, hidden, kind (0 = feed-forward control net, 1 = cartpole net,
 * 2 = LSTM)}. The buffer MUST hold 8 int32. Returns 0 on success. */
int apgc_info(const apgc_model *m, int32_t *dims);

/* System tag of the exported checkpoint: 0 = quad, 1 = wing,
 * 2 = cartpole, -1 = unknown. */
int apgc_system(const apgc_model *m);

/* Net-only forward on pre-featurized inputs:
 *   in_state: (state_dim,)    in_ref: (window, ref_dim) row-major
 *   out: (out_dim,) sigmoid-activated actions.
 * Returns 0 on success. */
int apgc_forward(const apgc_model *m, const float *in_state,
                 const float *in_ref, float *out);

/* Full quad decision path: raw state (12,) + ABSOLUTE reference window
 * (window, 9) row-major -> (out_dim,) actions in [0, 1]. Featurizes
 * exactly like quad_prepare_data + quad_state_features. Returns 0 on
 * success, -1 if the model was not exported from a quad checkpoint. */
int apgc_quad_predict(const apgc_model *m, const float *state,
                      const float *ref_abs, float *out);

/* Full fixed-wing decision path: raw state (12,) + ABSOLUTE target
 * waypoint (3,) -> (out_dim,) actions in [0, 1]. Featurizes exactly like
 * wing_prepare_data (z-scored state without position; reference = unit
 * target direction * 12 * dt * horizon). Returns -1 for non-wing models. */
int apgc_wing_predict(const apgc_model *m, const float *state,
                      const float *target, float *out);

/* Cartpole decision: raw state (4,) -> (out_dim,) actions in [-1, 1]
 * (tanh output, x-position input zeroed, like simple_model.Net).
 * Returns -1 for non-cartpole models. */
int apgc_cartpole_predict(const apgc_model *m, const float *state,
                          float *out);

/* Recurrent (LSTM) quad decision: raw state (12,) + ABSOLUTE reference
 * window (window, 9) + carry h, c (hidden,) each -> (out_dim,) actions in
 * [0, 1]. h and c are updated IN PLACE (zero them at episode start; the
 * dims[6] slot of apgc_info gives hidden). Returns -1 for non-LSTM
 * models. */
int apgc_lstm_predict(const apgc_model *m, const float *state,
                      const float *ref_abs, float *h, float *c, float *out);

#ifdef __cplusplus
}
#endif

#endif /* APG_CONTROLLER_H_ */
