// Fast DIMACS .dmx parser — the native data-loading hot path.
//
// The reference's loader is native Rust (src/utils/data_loader.rs); multi-
// hundred-MB instances (5M+ arcs) parse ~20x faster here than in Python.
// Exposed via ctypes as libtpl_native.so; the pure-Python parser in
// utils/data_loader.py is the always-available fallback and oracle, and the
// validation rules are identical:
//   - a "p min <nodes> <arcs>" problem line is mandatory        (rc=1)
//   - arc endpoints must parse as integers                      (rc=2)
//   - indices are 1-based; 0 or negative is illegal             (rc=3)
//   - endpoints must not exceed the declared node count         (rc=4)
//
// Build: make -C cpp   (produces cpp/libtpl_native.so)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Skip spaces/tabs (not newlines).
inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

// Parse a non-negative integer; returns nullptr on failure.
inline const char* parse_u64(const char* p, const char* end, int64_t* out) {
  p = skip_ws(p, end);
  if (p >= end || *p < '0' || *p > '9') return nullptr;
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    ++p;
  }
  *out = v;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

}  // namespace

extern "C" {

// Returns 0 on success; positive validation codes as documented above;
// -1 on I/O failure, -2 on allocation failure.
static int64_t tpl_parse_dmx_impl(const char* path, int64_t* num_nodes_out,
                                  int64_t* num_arcs_out, int32_t** u_out,
                                  int32_t** v_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf;
  buf.resize(static_cast<size_t>(size));
  if (size > 0 && fread(buf.data(), 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    fclose(f);
    return -1;
  }
  fclose(f);

  const char* p = buf.data();
  const char* end = buf.data() + buf.size();
  int64_t nodes = -1, arcs_declared = -1;
  std::vector<int32_t> us, vs;

  while (p < end) {
    const char* line = skip_ws(p, end);
    if (line < end) {
      char tag = *line;
      if (tag == 'p') {
        // "p min <nodes> <arcs>"
        const char* q = line + 1;
        q = skip_ws(q, end);
        if (end - q < 3 || strncmp(q, "min", 3) != 0) return 1;
        q += 3;
        q = parse_u64(q, end, &nodes);
        if (!q) return 1;
        q = parse_u64(q, end, &arcs_declared);
        if (!q) return 1;
        us.reserve(static_cast<size_t>(arcs_declared));
        vs.reserve(static_cast<size_t>(arcs_declared));
      } else if (tag == 'a') {
        int64_t u, v;
        const char* q = parse_u64(line + 1, end, &u);
        if (!q) return 2;
        q = parse_u64(q, end, &v);
        if (!q) return 2;
        if (u <= 0 || v <= 0) return 3;
        if (nodes >= 0 && (u > nodes || v > nodes)) return 4;
        us.push_back(static_cast<int32_t>(u - 1));
        vs.push_back(static_cast<int32_t>(v - 1));
      }
      // 'c', 'n' and anything else: skipped.
    }
    p = next_line(p, end);
  }

  if (nodes < 0) return 1;
  // Arc endpoints seen before the problem line were not range-checked then.
  for (size_t i = 0; i < us.size(); ++i) {
    if (us[i] >= nodes || vs[i] >= nodes) return 4;
  }

  const size_t m = us.size();
  int32_t* u_arr = static_cast<int32_t*>(malloc(m * sizeof(int32_t)));
  int32_t* v_arr = static_cast<int32_t*>(malloc(m * sizeof(int32_t)));
  if ((!u_arr || !v_arr) && m > 0) {
    free(u_arr);
    free(v_arr);
    return -2;
  }
  if (m > 0) {
    memcpy(u_arr, us.data(), m * sizeof(int32_t));
    memcpy(v_arr, vs.data(), m * sizeof(int32_t));
  }
  *num_nodes_out = nodes;
  *num_arcs_out = static_cast<int64_t>(m);
  *u_out = u_arr;
  *v_out = v_arr;
  return 0;
}

void tpl_free(void* p) { free(p); }

// C++ exceptions (e.g. std::bad_alloc from a hostile arc count) must not
// unwind across the ctypes boundary: catch everything and return the
// documented allocation-failure code.
int64_t tpl_parse_dmx(const char* path, int64_t* num_nodes_out,
                      int64_t* num_arcs_out, int32_t** u_out, int32_t** v_out) {
  try {
    return tpl_parse_dmx_impl(path, num_nodes_out, num_arcs_out, u_out, v_out);
  } catch (...) {
    return -2;
  }
}

}  // extern "C"
