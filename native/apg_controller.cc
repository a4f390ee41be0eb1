/* Implementation of the standalone controller runtime. See apg_controller.h.
 *
 * File format (written by scripts/export_controller.py):
 *   magic "APGC1\n" (6 bytes)
 *   uint32 little-endian header length
 *   JSON header: dims + ordered tensor table [["name", [shape...]], ...]
 *   raw float32 little-endian tensor data in table order
 *
 * The header is parsed with a minimal purpose-built scanner (the exporter
 * controls the writer, so the accepted grammar is the exporter's output,
 * not general JSON).
 */
#include "apg_controller.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

struct Tensor {
  std::vector<int> shape;
  std::vector<float> data;
  size_t size() const {
    size_t n = 1;
    for (int d : shape) n *= (size_t)d;
    return n;
  }
};

}  // namespace

struct apgc_model {
  int state_dim = 0, window = 0, ref_dim = 0, out_dim = 0;
  int action_dim = 0, hidden = 0, horizon = 0;
  float dt = 0.0f;
  bool conv = false;
  std::string system;  /* "quad" | "wing" | "cartpole" */
  bool cartpole_kind = false;
  bool lstm_kind = false;
  std::vector<float> mean, stddev; /* wing featurization constants */
  std::map<std::string, Tensor> tensors;
  /* tensor pointers resolved at load (map nodes are stable) so the hot
   * path never does string lookups */
  const Tensor *t_conv_w = nullptr, *t_conv_b = nullptr;
  const Tensor *t_refin_w = nullptr, *t_refin_b = nullptr;
  const Tensor *t_st_w = nullptr, *t_st_b = nullptr;
  const Tensor *t_fc[3][2] = {};  /* fc1..fc3 (w, b) */
  const Tensor *t_cart[4][2] = {}; /* fc0..fc3 (w, b) */
  const Tensor *t_out_w = nullptr, *t_out_b = nullptr;
  const Tensor *t_wih = nullptr, *t_whh = nullptr;
  const Tensor *t_bih = nullptr, *t_bhh = nullptr;
  /* scratch buffers sized at load so predict() never allocates */
  mutable std::vector<float> in_state_buf, in_ref_buf, s_hidden, ref_flat,
      concat, h1, h2, gates;

  void resolve_tensors() {
    auto g = [this](const std::string &n) -> const Tensor * {
      auto it = tensors.find(n);
      return it == tensors.end() ? nullptr : &it->second;
    };
    t_conv_w = g("conv_ref.w");
    t_conv_b = g("conv_ref.b");
    t_refin_w = g("ref_in.w");
    t_refin_b = g("ref_in.b");
    t_st_w = g("states_in.w");
    t_st_b = g("states_in.b");
    const char *fc[3] = {"fc1", "fc2", "fc3"};
    for (int i = 0; i < 3; ++i) {
      t_fc[i][0] = g(std::string(fc[i]) + ".w");
      t_fc[i][1] = g(std::string(fc[i]) + ".b");
    }
    const char *cart[4] = {"fc0", "fc1", "fc2", "fc3"};
    for (int i = 0; i < 4; ++i) {
      t_cart[i][0] = g(std::string(cart[i]) + ".w");
      t_cart[i][1] = g(std::string(cart[i]) + ".b");
    }
    t_out_w = g("fc_out.w");
    t_out_b = g("fc_out.b");
    t_wih = g("w_ih");
    t_whh = g("w_hh");
    t_bih = g("b_ih");
    t_bhh = g("b_hh");
  }
};

namespace {

/* --- minimal header parsing ------------------------------------------- */

bool find_int(const std::string &h, const char *key, int *out) {
  std::string pat = std::string("\"") + key + "\":";
  size_t p = h.find(pat);
  if (p == std::string::npos) return false;
  *out = (int)strtol(h.c_str() + p + pat.size(), nullptr, 10);
  return true;
}

bool find_bool(const std::string &h, const char *key, bool *out) {
  std::string pat = std::string("\"") + key + "\":";
  size_t p = h.find(pat);
  if (p == std::string::npos) return false;
  *out = h.compare(p + pat.size(), 4, "true") == 0;
  return true;
}

bool find_str(const std::string &h, const char *key, std::string *out) {
  std::string pat = std::string("\"") + key + "\":\"";
  size_t p = h.find(pat);
  if (p == std::string::npos) return false;
  size_t s = p + pat.size();
  size_t e = h.find('"', s);
  if (e == std::string::npos) return false;
  *out = h.substr(s, e - s);
  return true;
}

bool find_float(const std::string &h, const char *key, float *out) {
  std::string pat = std::string("\"") + key + "\":";
  size_t p = h.find(pat);
  if (p == std::string::npos) return false;
  *out = strtof(h.c_str() + p + pat.size(), nullptr);
  return true;
}

bool find_float_array(const std::string &h, const char *key,
                      std::vector<float> *out) {
  std::string pat = std::string("\"") + key + "\":[";
  size_t p = h.find(pat);
  if (p == std::string::npos) return false;
  size_t e = h.find(']', p);
  if (e == std::string::npos) return false;
  const char *c = h.c_str() + p + pat.size();
  while (c < h.c_str() + e) {
    char *end;
    float v = strtof(c, &end);
    if (end == c) break;
    out->push_back(v);
    c = end;
    while (*c == ',' || *c == ' ') ++c;
  }
  return true;
}

/* Parse the ordered tensor table: "tensors":[["name",[d0,d1]],...]
 * Each entry is ["<name>",[ints]]; entries are separated by ','. */
bool parse_tensor_table(const std::string &h,
                        std::vector<std::pair<std::string, std::vector<int>>>
                            *table) {
  size_t p = h.find("\"tensors\":[");
  if (p == std::string::npos) return false;
  p += strlen("\"tensors\":[");
  for (;;) {
    while (p < h.size() && (h[p] == ' ' || h[p] == ',')) ++p;
    if (p >= h.size() || h[p] == ']') return true; /* end of table */
    if (h[p] != '[') return false;                 /* entry must open */
    size_t name_s = h.find('"', p);
    if (name_s == std::string::npos) return false;
    size_t name_e = h.find('"', name_s + 1);
    if (name_e == std::string::npos) return false;
    std::string name = h.substr(name_s + 1, name_e - name_s - 1);
    size_t shape_s = h.find('[', name_e);
    size_t shape_e = h.find(']', shape_s);
    if (shape_s == std::string::npos || shape_e == std::string::npos)
      return false;
    std::vector<int> shape;
    const char *c = h.c_str() + shape_s + 1;
    while (c < h.c_str() + shape_e) {
      char *end;
      long v = strtol(c, &end, 10);
      if (end == c) break;
      shape.push_back((int)v);
      c = end;
      while (*c == ',' || *c == ' ') ++c;
    }
    table->emplace_back(name, shape);
    p = h.find(']', shape_e + 1); /* entry-closing bracket */
    if (p == std::string::npos) return false;
    ++p;
  }
}

/* --- math kernels ------------------------------------------------------ */

/* y = x @ W + b with W stored (in, out) row-major, matching the npz. */
void linear(const Tensor &w, const Tensor &b, const float *x, float *y) {
  const int in = w.shape[0], out = w.shape[1];
  for (int j = 0; j < out; ++j) y[j] = b.data[j];
  for (int i = 0; i < in; ++i) {
    const float xi = x[i];
    const float *wr = &w.data[(size_t)i * out];
    for (int j = 0; j < out; ++j) y[j] += xi * wr[j];
  }
}

inline void tanh_inplace(float *x, int n) {
  for (int i = 0; i < n; ++i) x[i] = std::tanh(x[i]);
}

inline void sigmoid_inplace(float *x, int n) {
  for (int i = 0; i < n; ++i) x[i] = 1.0f / (1.0f + std::exp(-x[i]));
}

}  // namespace

extern "C" {

apgc_model *apgc_load(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) return nullptr;
  char magic[6];
  if (fread(magic, 1, 6, f) != 6 || memcmp(magic, "APGC1\n", 6) != 0) {
    fclose(f);
    return nullptr;
  }
  uint32_t hlen = 0;
  if (fread(&hlen, 4, 1, f) != 1 || hlen > (1u << 20)) {
    fclose(f);
    return nullptr;
  }
  std::string header(hlen, '\0');
  if (fread(&header[0], 1, hlen, f) != hlen) {
    fclose(f);
    return nullptr;
  }

  auto *m = new apgc_model();
  std::string kind;
  bool ok = find_int(header, "state_dim", &m->state_dim) &&
            find_int(header, "window", &m->window) &&
            find_int(header, "ref_dim", &m->ref_dim) &&
            find_int(header, "out_dim", &m->out_dim) &&
            find_int(header, "action_dim", &m->action_dim) &&
            find_int(header, "hidden", &m->hidden) &&
            find_bool(header, "conv", &m->conv) &&
            find_str(header, "kind", &kind) &&
            find_str(header, "system", &m->system);
  m->cartpole_kind = (kind == "cartpole_net");
  m->lstm_kind = (kind == "lstm_net");
  find_int(header, "horizon", &m->horizon);
  find_float(header, "dt", &m->dt);
  if (m->system == "wing") {
    ok = ok && find_float_array(header, "mean", &m->mean) &&
         find_float_array(header, "std", &m->stddev) &&
         m->mean.size() == 12 && m->stddev.size() == 12;
  }

  std::vector<std::pair<std::string, std::vector<int>>> table;
  ok = ok && parse_tensor_table(header, &table) && !table.empty();
  if (ok) {
    for (auto &entry : table) {
      Tensor t;
      t.shape = entry.second;
      t.data.resize(t.size());
      if (fread(t.data.data(), 4, t.size(), f) != t.size()) {
        ok = false;
        break;
      }
      m->tensors[entry.first] = std::move(t);
    }
  }
  fclose(f);

  if (m->cartpole_kind) {
    const char *needed[] = {"fc0.w", "fc0.b", "fc1.w",     "fc1.b",
                            "fc2.w", "fc2.b", "fc3.w",     "fc3.b",
                            "fc_out.w",       "fc_out.b"};
    for (const char *n : needed) ok = ok && m->tensors.count(n) > 0;
    if (!ok) {
      delete m;
      return nullptr;
    }
    /* ping-pong scratch sized to the widest layer */
    size_t w = 0;
    for (auto &kv : m->tensors)
      if (kv.second.shape.size() == 2)
        w = std::max(w, (size_t)kv.second.shape[1]);
    m->h1.resize(w);
    m->h2.resize(w);
    m->in_state_buf.resize(4);
    m->resolve_tensors();
    return m;
  }

  if (m->lstm_kind) {
    const char *needed[] = {"w_ih", "w_hh", "b_ih", "b_hh", "fc_out.w",
                            "fc_out.b"};
    for (const char *n : needed) ok = ok && m->tensors.count(n) > 0;
  } else {
    const char *needed[] = {"states_in.w", "states_in.b", "fc1.w", "fc1.b",
                            "fc2.w",       "fc2.b",       "fc3.w", "fc3.b",
                            "fc_out.w",    "fc_out.b"};
    for (const char *n : needed) ok = ok && m->tensors.count(n) > 0;
  }
  ok = ok && (m->conv ? m->tensors.count("conv_ref.w") > 0 &&
                            m->tensors.count("conv_ref.b") > 0
                      : m->tensors.count("ref_in.w") > 0 &&
                            m->tensors.count("ref_in.b") > 0);
  if (!ok) {
    delete m;
    return nullptr;
  }

  /* conv output length derives from the ACTUAL kernel size so the sizing
   * here can never diverge from ref_branch's write extent */
  const int ref_flat_len =
      m->conv ? m->tensors["conv_ref.w"].shape[0] *
                    (m->window - m->tensors["conv_ref.w"].shape[2] + 1)
              : m->tensors["ref_in.w"].shape[1];
  if (ref_flat_len <= 0) {
    delete m;
    return nullptr;
  }
  m->in_state_buf.resize(m->state_dim);
  m->in_ref_buf.resize((size_t)m->window * m->ref_dim);
  m->ref_flat.resize(ref_flat_len);
  m->concat.resize(m->state_dim + m->hidden + ref_flat_len);
  if (m->lstm_kind) {
    m->gates.resize(4 * (size_t)m->hidden);
    m->h1.resize(4 * (size_t)m->hidden); /* h@W_hh + b_hh, all 4H slots */
  } else {
    m->s_hidden.resize(m->hidden);
    m->h1.resize(m->hidden);
    m->h2.resize(m->hidden);
  }
  m->resolve_tensors();
  return m;
}

void apgc_free(apgc_model *m) { delete m; }

int apgc_info(const apgc_model *m, int32_t *dims) {
  if (!m || !dims) return -1;
  dims[0] = m->state_dim;
  dims[1] = m->window;
  dims[2] = m->ref_dim;
  dims[3] = m->out_dim;
  dims[4] = m->action_dim;
  dims[5] = m->conv ? 1 : 0;
  dims[6] = m->hidden;
  dims[7] = m->cartpole_kind ? 1 : (m->lstm_kind ? 2 : 0);
  return 0;
}

int apgc_system(const apgc_model *m) {
  if (!m) return -1;
  if (m->system == "quad") return 0;
  if (m->system == "wing") return 1;
  if (m->system == "cartpole") return 2;
  return -1;
}

namespace {

/* simple_model.Net (models/simple.py): 4 -> 32 -> 64 -> 64 -> 32 -> out,
 * tanh everywhere including the output; cart x-position input zeroed. */
int cartpole_forward(const apgc_model *m, const float *state, float *out) {
  float *x = m->in_state_buf.data();
  x[0] = 0.0f;
  x[1] = state[1];
  x[2] = state[2];
  x[3] = state[3];
  const float *cur = x;
  float *bufs[2] = {m->h1.data(), m->h2.data()};
  int which = 0;
  for (int i = 0; i < 4; ++i) {
    const Tensor &w = *m->t_cart[i][0];
    const Tensor &b = *m->t_cart[i][1];
    linear(w, b, cur, bufs[which]);
    tanh_inplace(bufs[which], w.shape[1]);
    cur = bufs[which];
    which ^= 1;
  }
  linear(*m->t_out_w, *m->t_out_b, cur, out);
  tanh_inplace(out, m->out_dim);
  return 0;
}

}  // namespace

namespace {

/* reference branch shared by the MLP and LSTM heads: fills m->ref_flat.
 * Conv path: valid Conv1d over the horizon axis with torch NCL semantics:
 * x[i][l] = in_ref[l][i]; out[o][l] = relu(b_o + sum_{i,k} w[o][i][k]
 * x[i][l+k]); flattened row-major over (O, L-K+1) — matches
 * models/mlp.py::_ref_branch / models/rnn.py. */
void ref_branch(const apgc_model *m, const float *in_ref) {
  if (m->conv) {
    const Tensor &w = *m->t_conv_w;
    const Tensor &b = *m->t_conv_b;
    const int O = w.shape[0], I = w.shape[1], K = w.shape[2];
    const int L = m->window, Lo = L - K + 1;
    for (int o = 0; o < O; ++o) {
      for (int l = 0; l < Lo; ++l) {
        float acc = b.data[o];
        for (int i = 0; i < I; ++i) {
          const float *wr = &w.data[((size_t)o * I + i) * K];
          for (int k = 0; k < K; ++k)
            acc += wr[k] * in_ref[(size_t)(l + k) * m->ref_dim + i];
        }
        m->ref_flat[(size_t)o * Lo + l] = acc > 0.0f ? acc : 0.0f;
      }
    }
  } else {
    linear(*m->t_refin_w, *m->t_refin_b, in_ref, m->ref_flat.data());
    tanh_inplace(m->ref_flat.data(), (int)m->ref_flat.size());
  }
}

/* quad featurization shared by the MLP and LSTM decision paths: fills
 * m->in_state_buf (15) and m->in_ref_buf (window, 9).
 * quad_state_features (dataset.py:52-69): world vel, first two columns of
 * world_to_body (row-major), body vel, angular vel. in_ref rows
 * (quad_prepare_data, dataset.py:90-96): [ref_pos - pos, ref_vel,
 * ref_vel - vel]. */
void quad_featurize(const apgc_model *m, const float *state,
                    const float *ref_abs) {
  const float roll = state[3], pitch = state[4], yaw = state[5];
  const float Cy = std::cos(yaw), Sy = std::sin(yaw);
  const float Cp = std::cos(pitch), Sp = std::sin(pitch);
  const float Cr = std::cos(roll), Sr = std::sin(roll);
  const float R[3][3] = {
      {Cy * Cp, Sy * Cp, -Sp},
      {Cy * Sp * Sr - Cr * Sy, Cr * Cy + Sr * Sy * Sp, Cp * Sr},
      {Cy * Sp * Cr + Sr * Sy, Cr * Sy * Sp - Cy * Sr, Cr * Cp}};
  const float *vel = state + 6, *av = state + 9;
  float *fs = m->in_state_buf.data();
  fs[0] = vel[0];
  fs[1] = vel[1];
  fs[2] = vel[2];
  fs[3] = R[0][0];
  fs[4] = R[0][1];
  fs[5] = R[1][0];
  fs[6] = R[1][1];
  fs[7] = R[2][0];
  fs[8] = R[2][1];
  for (int i = 0; i < 3; ++i)
    fs[9 + i] = R[i][0] * vel[0] + R[i][1] * vel[1] + R[i][2] * vel[2];
  fs[12] = av[0];
  fs[13] = av[1];
  fs[14] = av[2];

  float *ir = m->in_ref_buf.data();
  for (int t = 0; t < m->window; ++t) {
    const float *r = ref_abs + (size_t)t * 9;
    float *o = ir + (size_t)t * 9;
    for (int i = 0; i < 3; ++i) o[i] = r[i] - state[i];
    for (int i = 0; i < 3; ++i) o[3 + i] = r[6 + i];
    for (int i = 0; i < 3; ++i) o[6 + i] = r[6 + i] - vel[i];
  }
}

}  // namespace

int apgc_forward(const apgc_model *m, const float *in_state,
                 const float *in_ref, float *out) {
  if (!m || !in_state || !out || m->lstm_kind) return -1;
  if (m->cartpole_kind) return cartpole_forward(m, in_state, out);
  if (!in_ref) return -1;
  /* state branch: tanh(Linear) */
  linear(*m->t_st_w, *m->t_st_b, in_state, m->s_hidden.data());
  tanh_inplace(m->s_hidden.data(), m->hidden);

  ref_branch(m, in_ref);

  /* trunk */
  memcpy(m->concat.data(), m->s_hidden.data(), sizeof(float) * m->hidden);
  memcpy(m->concat.data() + m->hidden, m->ref_flat.data(),
         sizeof(float) * m->ref_flat.size());
  linear(*m->t_fc[0][0], *m->t_fc[0][1], m->concat.data(), m->h1.data());
  tanh_inplace(m->h1.data(), m->hidden);
  linear(*m->t_fc[1][0], *m->t_fc[1][1], m->h1.data(), m->h2.data());
  tanh_inplace(m->h2.data(), m->hidden);
  linear(*m->t_fc[2][0], *m->t_fc[2][1], m->h2.data(), m->h1.data());
  tanh_inplace(m->h1.data(), m->hidden);
  linear(*m->t_out_w, *m->t_out_b, m->h1.data(), out);
  sigmoid_inplace(out, m->out_dim);
  return 0;
}

int apgc_quad_predict(const apgc_model *m, const float *state,
                      const float *ref_abs, float *out) {
  if (!m || m->system != "quad" || m->state_dim != 15 || m->ref_dim != 9 ||
      m->lstm_kind)
    return -1;
  quad_featurize(m, state, ref_abs);
  return apgc_forward(m, m->in_state_buf.data(), m->in_ref_buf.data(), out);
}

int apgc_lstm_predict(const apgc_model *m, const float *state,
                      const float *ref_abs, float *h, float *c, float *out) {
  if (!m || !m->lstm_kind || m->system != "quad" || m->state_dim != 15 ||
      m->ref_dim != 9 || !h || !c)
    return -1;
  quad_featurize(m, state, ref_abs);
  ref_branch(m, m->in_ref_buf.data());

  /* LSTMCell (models/rnn.py::lstm_net_apply): gates = inp@W_ih + b_ih +
   * h@W_hh + b_hh with torch's (i, f, g, o) gate order. */
  const int H = m->hidden;
  float *inp = m->concat.data();
  memcpy(inp, m->in_state_buf.data(), sizeof(float) * m->state_dim);
  memcpy(inp + m->state_dim, m->ref_flat.data(),
         sizeof(float) * m->ref_flat.size());
  float *gates = m->gates.data();
  linear(*m->t_wih, *m->t_bih, inp, gates);
  linear(*m->t_whh, *m->t_bhh, h, m->h1.data());
  /* h1 holds h@W_hh + b_hh for all 4H gate slots — resize guaranteed */
  for (int j = 0; j < 4 * H; ++j) gates[j] += m->h1[j];
  for (int j = 0; j < H; ++j) {
    const float ig = 1.0f / (1.0f + std::exp(-gates[j]));
    const float fg = 1.0f / (1.0f + std::exp(-gates[H + j]));
    const float gg = std::tanh(gates[2 * H + j]);
    const float og = 1.0f / (1.0f + std::exp(-gates[3 * H + j]));
    c[j] = fg * c[j] + ig * gg;
    h[j] = og * std::tanh(c[j]);
  }
  linear(*m->t_out_w, *m->t_out_b, h, out);
  sigmoid_inplace(out, m->out_dim);
  return 0;
}

int apgc_wing_predict(const apgc_model *m, const float *state,
                      const float *target, float *out) {
  if (!m || m->system != "wing" || m->state_dim != 9 || m->ref_dim != 3)
    return -1;
  /* wing_prepare_data (dataset.py:100-129): normalized state drops the
   * position; net reference input = last ramp point relative to the
   * drone = unit direction * 12 * dt * horizon. */
  float *fs = m->in_state_buf.data();
  for (int i = 0; i < 9; ++i)
    fs[i] = (state[3 + i] - m->mean[3 + i]) / m->stddev[3 + i];
  float rel[3] = {target[0] - state[0], target[1] - state[1],
                  target[2] - state[2]};
  float norm = std::sqrt(rel[0] * rel[0] + rel[1] * rel[1] + rel[2] * rel[2]);
  norm = std::max(norm, 1e-6f);
  const float scale = 12.0f * m->dt * (float)m->horizon / norm;
  float *ir = m->in_ref_buf.data();
  for (int i = 0; i < 3; ++i) ir[i] = rel[i] * scale;
  return apgc_forward(m, fs, ir, out);
}

int apgc_cartpole_predict(const apgc_model *m, const float *state,
                          float *out) {
  if (!m || !m->cartpole_kind) return -1;
  return apgc_forward(m, state, nullptr, out);
}

}  /* extern "C" */
