/* See dex_policy.h. File format: rl/export.py export_flat_binary. */
#include "dex_policy.h"

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Layer {
  int in = 0;
  int out = 0;
  std::vector<float> w;  // (in, out) row-major, matching the flax kernel
  std::vector<float> b;
};

}  // namespace

struct dex_policy {
  int num_obs = 0;
  int num_actions = 0;
  float norm_clip = 5.0f;
  std::vector<float> obs_mean;
  std::vector<float> obs_std;
  std::vector<Layer> layers;  // trunk..., last layer is the mu head
  mutable std::vector<float> scratch_a, scratch_b;
};

static bool read_exact(FILE *f, void *dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

extern "C" dex_policy *dex_policy_load(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto fail = [&]() -> dex_policy * {
    std::fclose(f);
    return nullptr;
  };
  char magic[4];
  if (!read_exact(f, magic, 4) || std::memcmp(magic, "DXP1", 4) != 0)
    return fail();
  int32_t n_layers = 0, num_obs = 0, num_actions = 0;
  float norm_clip = 0.0f;
  if (!read_exact(f, &n_layers, 4) || !read_exact(f, &num_obs, 4) ||
      !read_exact(f, &num_actions, 4) || !read_exact(f, &norm_clip, 4))
    return fail();
  if (n_layers <= 0 || n_layers > 64 || num_obs <= 0 || num_actions <= 0)
    return fail();

  auto *p = new dex_policy();
  p->num_obs = num_obs;
  p->num_actions = num_actions;
  p->norm_clip = norm_clip;
  p->obs_mean.resize(num_obs);
  p->obs_std.resize(num_obs);
  if (!read_exact(f, p->obs_mean.data(), 4u * num_obs) ||
      !read_exact(f, p->obs_std.data(), 4u * num_obs)) {
    delete p;
    return fail();
  }
  int max_width = num_obs;
  p->layers.resize(n_layers);
  for (auto &layer : p->layers) {
    int32_t in = 0, out = 0;
    if (!read_exact(f, &in, 4) || !read_exact(f, &out, 4) || in <= 0 ||
        out <= 0 || in > (1 << 20) || out > (1 << 20)) {
      delete p;
      return fail();
    }
    layer.in = in;
    layer.out = out;
    layer.w.resize((size_t)in * out);
    layer.b.resize(out);
    if (!read_exact(f, layer.w.data(), 4u * layer.w.size()) ||
        !read_exact(f, layer.b.data(), 4u * out)) {
      delete p;
      return fail();
    }
    if (out > max_width) max_width = out;
  }
  /* structural consistency: chain of widths ends at num_actions */
  int width = num_obs;
  for (auto &layer : p->layers) {
    if (layer.in != width) {
      delete p;
      return fail();
    }
    width = layer.out;
  }
  if (width != num_actions) {
    delete p;
    return fail();
  }
  p->scratch_a.resize(max_width);
  p->scratch_b.resize(max_width);
  std::fclose(f);
  return p;
}

extern "C" int dex_policy_num_obs(const dex_policy *p) { return p->num_obs; }
extern "C" int dex_policy_num_actions(const dex_policy *p) {
  return p->num_actions;
}

static inline float elu(float x) { return x > 0.0f ? x : std::expm1(x); }

extern "C" int dex_policy_act(const dex_policy *p, const float *obs, int batch,
                              float *actions_out) {
  if (!p || !obs || !actions_out || batch <= 0) return 1;
  const size_t n_layers = p->layers.size();
  for (int bi = 0; bi < batch; ++bi) {
    const float *row = obs + (size_t)bi * p->num_obs;
    float *x = p->scratch_a.data();
    float *y = p->scratch_b.data();
    for (int i = 0; i < p->num_obs; ++i) {
      float v = (row[i] - p->obs_mean[i]) / p->obs_std[i];
      v = v > p->norm_clip ? p->norm_clip
                           : (v < -p->norm_clip ? -p->norm_clip : v);
      x[i] = v;
    }
    for (size_t li = 0; li < n_layers; ++li) {
      const Layer &L = p->layers[li];
      const bool last = li + 1 == n_layers;
      for (int o = 0; o < L.out; ++o) y[o] = L.b[o];
      for (int i = 0; i < L.in; ++i) {
        const float xi = x[i];
        const float *wrow = L.w.data() + (size_t)i * L.out;
        for (int o = 0; o < L.out; ++o) y[o] += xi * wrow[o];
      }
      if (!last)
        for (int o = 0; o < L.out; ++o) y[o] = elu(y[o]);
      float *tmp = x;
      x = y;
      y = tmp;
    }
    float *out_row = actions_out + (size_t)bi * p->num_actions;
    for (int o = 0; o < p->num_actions; ++o) {
      float v = x[o];
      out_row[o] = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
    }
  }
  return 0;
}

extern "C" void dex_policy_free(dex_policy *p) { delete p; }
