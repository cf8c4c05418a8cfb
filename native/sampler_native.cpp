// Native host-side hot paths for sampler_tpu.
//
// The reference implements its loader and graph compilation in C++
// (ref: src/binary_format.cc, src/factor_graph.cc — recalled paths); these
// are their TPU-era equivalents: the device compute path is XLA, but
// parsing multi-GB factor files and greedy-coloring 10^8-variable graphs
// are serial host work where Python loops would dominate end-to-end time.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this toolchain).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

#if defined(__GNUC__)
#define EXPORT extern "C" __attribute__((visibility("default")))
#else
#define EXPORT extern "C"
#endif

namespace {

inline uint16_t be16(const uint8_t* p) {
  return (uint16_t(p[0]) << 8) | uint16_t(p[1]);
}
inline uint64_t be64(const uint8_t* p) {
  uint64_t v = 0;
  for (int i = 0; i < 8; ++i) v = (v << 8) | p[i];
  return v;
}
inline double bef64(const uint8_t* p) {
  uint64_t v = be64(p);
  double d;
  std::memcpy(&d, &v, 8);
  return d;
}

}  // namespace

// ---------------------------------------------------------------------------
// Factor-file parsing (variable-length records; see format_spec.py):
//   factorType:u16, arity:i64, arity*(vid:i64, isPositive:u8
//   [+ eqPred:i64 if categorical]), weightId:i64, featureValue:f64
// Two-phase: count() then parse() into caller-allocated arrays.
// Returns 0 on success, negative error codes on malformed input.
// ---------------------------------------------------------------------------

EXPORT int64_t sampler_count_factors(const uint8_t* buf, int64_t n_bytes,
                                     const uint8_t* is_categorical_type,
                                     int64_t n_types, int64_t* out_n_factors,
                                     int64_t* out_n_edges) {
  int64_t pos = 0, nf = 0, ne = 0;
  while (pos < n_bytes) {
    if (pos + 10 > n_bytes) return -1;
    uint16_t ftype = be16(buf + pos);
    int64_t arity = (int64_t)be64(buf + pos + 2);
    pos += 10;
    if (arity < 0 || arity > (int64_t)1e9) return -2;
    bool cat = ftype < n_types && is_categorical_type[ftype];
    int64_t rec = arity * (cat ? 17 : 9) + 16;
    if (pos + rec > n_bytes) return -3;
    pos += rec;
    nf += 1;
    ne += arity;
  }
  *out_n_factors = nf;
  *out_n_edges = ne;
  return 0;
}

EXPORT int64_t sampler_parse_factors(
    const uint8_t* buf, int64_t n_bytes, const uint8_t* is_categorical_type,
    int64_t n_types,
    int32_t* f_type, int32_t* f_wid, double* f_feat, int64_t* f_ptr,
    int64_t* e_vid, uint8_t* e_ispos, int64_t* e_eqpred) {
  int64_t pos = 0, fi = 0, ei = 0;
  f_ptr[0] = 0;
  while (pos < n_bytes) {
    uint16_t ftype = be16(buf + pos);
    int64_t arity = (int64_t)be64(buf + pos + 2);
    pos += 10;
    bool cat = ftype < n_types && is_categorical_type[ftype];
    for (int64_t a = 0; a < arity; ++a) {
      e_vid[ei] = (int64_t)be64(buf + pos);
      e_ispos[ei] = buf[pos + 8];
      pos += 9;
      if (cat) {
        e_eqpred[ei] = (int64_t)be64(buf + pos);
        pos += 8;
      } else {
        e_eqpred[ei] = 1;
      }
      ++ei;
    }
    f_type[fi] = ftype;
    f_wid[fi] = (int32_t)be64(buf + pos);
    f_feat[fi] = bef64(buf + pos + 8);
    pos += 16;
    ++fi;
    f_ptr[fi] = ei;
  }
  return fi;
}

// ---------------------------------------------------------------------------
// Greedy coloring of the variable-adjacency graph (variables adjacent iff
// they share a factor), largest-degree-first.  Works directly from the
// factor CSR (f_ptr, e_vid) without materializing the adjacency.
// ---------------------------------------------------------------------------

EXPORT int64_t sampler_greedy_color(int64_t n_vars, int64_t n_factors,
                                    const int64_t* f_ptr, const int64_t* e_vid,
                                    int32_t* colors /* out [n_vars] */) {
  // var -> incident factor CSR via counting sort
  std::vector<int64_t> vf_ptr(n_vars + 1, 0);
  int64_t n_edges = f_ptr[n_factors];
  for (int64_t e = 0; e < n_edges; ++e) vf_ptr[e_vid[e] + 1]++;
  for (int64_t v = 0; v < n_vars; ++v) vf_ptr[v + 1] += vf_ptr[v];
  std::vector<int64_t> vf(n_edges);
  {
    std::vector<int64_t> cursor(vf_ptr.begin(), vf_ptr.end() - 1);
    for (int64_t f = 0; f < n_factors; ++f)
      for (int64_t e = f_ptr[f]; e < f_ptr[f + 1]; ++e)
        vf[cursor[e_vid[e]]++] = f;
  }

  // degree bound (sum over incident factors of arity-1) for ordering
  std::vector<int64_t> deg(n_vars, 0);
  for (int64_t v = 0; v < n_vars; ++v)
    for (int64_t i = vf_ptr[v]; i < vf_ptr[v + 1]; ++i) {
      int64_t f = vf[i];
      deg[v] += (f_ptr[f + 1] - f_ptr[f]) - 1;
    }
  std::vector<int64_t> order(n_vars);
  for (int64_t v = 0; v < n_vars; ++v) order[v] = v;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return deg[a] > deg[b]; });

  int64_t max_deg = 0;
  for (int64_t v = 0; v < n_vars; ++v) max_deg = std::max(max_deg, deg[v]);
  std::vector<int64_t> stamp(max_deg + 2, -1);
  std::fill(colors, colors + n_vars, -1);

  int32_t max_color = -1;
  for (int64_t oi = 0; oi < n_vars; ++oi) {
    int64_t v = order[oi];
    // mark colors of co-members of incident factors
    for (int64_t i = vf_ptr[v]; i < vf_ptr[v + 1]; ++i) {
      int64_t f = vf[i];
      for (int64_t e = f_ptr[f]; e < f_ptr[f + 1]; ++e) {
        int64_t u = e_vid[e];
        if (u != v && colors[u] >= 0 && colors[u] <= max_deg)
          stamp[colors[u]] = oi;
      }
    }
    int32_t c = 0;
    while (stamp[c] == oi) ++c;
    colors[v] = c;
    if (c > max_color) max_color = c;
  }
  return max_color + 1;  // number of colors
}

// ---------------------------------------------------------------------------
// text2bin fast path: parse a factor TSV buffer (lines of
// "ftype\twid\tfeat\tvid:ispos[:eq]...") — optional; Python handles small
// files.  Reserved for a future round.
// ---------------------------------------------------------------------------

EXPORT const char* sampler_native_version() { return "sampler-native-0.1"; }
