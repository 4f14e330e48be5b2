// mcfgen — native min-cost-flow KKT instance generator.
//
// One binary with the combined capability of the reference's three-stage C
// toolchain (data/qcnd/pargen.c → data/netgen/src/netgen.c →
// data/qcnd/qfcgen.c, orchestrated by src/bin/datagen.rs), exposed BOTH as a
// single combined command and as stage-compatible subcommands:
//
//   mcfgen <arcs> <rho> <id> <cf:a|b> <cq:a|b> <s|ns> <output-dir>
//       combined: emits netgen-{...}.dmx + .qfc under the reference naming
//       convention (what experiments/datagen.py drives).
//
//   mcfgen pargen <m> <rho> <id> <cf> <cq> <s|ns>
//       emits netgen-{...}.par in the cwd — same file format as pargen.c
//       (line 1: netgen seed; line 2: the 14 NETGEN parameters), but
//       deterministic in <id> instead of wall-clock seeded (pargen.c:54).
//
//   mcfgen netgen < file.par > out.dmx
//       reads a NETGEN parameter file (including the reference's 60 presets
//       under data/netgen/param/) and writes a DIMACS min-cost-flow network
//       honoring nodes/arcs/sources/sinks/cost-range/supply/capacity-range.
//
//   mcfgen qfcgen <file.dmx>
//       reads a .dmx whose name follows the netgen-{m}-{rho}-{id}-{cf}-{cq}-{s}
//       convention and writes the matching .qfc (qfcgen.c semantics: fixed
//       costs from b·U[Ccm1,Ccm2]+1, quadratic from Cc·U[Cam1,Cam2]+1).
//
// Parameter semantics match the documented formulas (data/qcnd/readme.txt):
//   nodes n = floor((1 + sqrt(1 + 8m/prho)) / 2), prho in {0.25, 0.5, 0.75};
//   fixed costs  Cc = b * U[Ccm1, Ccm2] + 1   (cf: a -> (3,10), b -> (0.5,1));
//   quadratic    Ca = Cc * U[Cam1, Cam2] + 1  (cq: a -> (100,1000), b -> (1,3));
//   capacities scaled by 0.7 when scaling == "s".
//
// Topology: a spanning chain over a pseudorandom node permutation guarantees
// connectivity (NETGEN's skeleton idea), remaining arcs are uniform random
// pairs (u != v). The generator is interface- and distribution-compatible
// with the Klingman NETGEN, not bit-equal (the original is wall-clock seeded
// anyway); structural invariants are cross-tested against the Python oracle
// in models/generator.py.
//
// Scales to 100M+ arcs at ~100 MB/s output.

#include <algorithm>
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

double prho_of(int rho) {
  switch (rho) {
    case 1: return 0.25;
    case 2: return 0.5;
    case 3: return 0.75;
    default: return -1.0;
  }
}

int64_t nodes_of(int64_t m, double prho) {
  return static_cast<int64_t>(
      std::floor((1.0 + std::sqrt(1.0 + (8.0 * m) / prho)) / 2.0));
}

void cost_ranges(char cf, char cq, double* ccm1, double* ccm2, double* cam1,
                 double* cam2) {
  *ccm1 = (cf == 'a') ? 3.0 : 0.5;
  *ccm2 = (cf == 'a') ? 10.0 : 1.0;
  *cam1 = (cq == 'a') ? 100.0 : 1.0;
  *cam2 = (cq == 'a') ? 1000.0 : 3.0;
}

struct NetParams {
  uint64_t seed = 1;
  int64_t problem = 1, nodes = 0, sources = 1, sinks = 1, arcs = 0;
  int64_t mincost = 1, maxcost = 100, supply = 100;
  int64_t tsources = 0, tsinks = 0, hicost = 0, capacitated = 100;
  int64_t mincap = 1, maxcap = 100;
};

// Write a DIMACS network for the given NETGEN parameters to `out`.
int write_dimacs(FILE* out, const NetParams& p, Rng& rng,
                 std::vector<int32_t>* out_u, std::vector<int32_t>* out_v,
                 std::vector<int64_t>* out_bcost) {
  const int64_t n = p.nodes, m = p.arcs;
  if (n < 2 || m < n - 1) {
    fprintf(stderr, "mcfgen: need nodes >= 2 and arcs >= nodes-1\n");
    return 1;
  }
  std::vector<int64_t> perm(n);
  for (int64_t i = 0; i < n; ++i) perm[i] = i;
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = rng.uniform_int(0, i);
    std::swap(perm[i], perm[j]);
  }
  std::vector<int32_t>& au = *out_u;
  std::vector<int32_t>& av = *out_v;
  std::vector<int64_t>& bc = *out_bcost;
  au.resize(m);
  av.resize(m);
  bc.resize(m);
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

  fprintf(out, "c generated by mcfgen (two_pass_lanczos_tpu native toolchain)\n");
  fprintf(out, "p min %" PRId64 " %" PRId64 "\n", n, m);
  // supply nodes then demand nodes, balanced by construction
  // clamp to n/2 BEFORE the loop so the remainder branch (s == nsrc-1)
  // always fires: capping only inside the loop condition would silently
  // emit an unbalanced (supply != demand) instance for presets asking for
  // more sources/sinks than n/2
  const int64_t nsrc = std::min(p.sources > 0 ? p.sources : 1, n / 2 > 0 ? n / 2 : 1);
  const int64_t nsnk = std::min(p.sinks > 0 ? p.sinks : 1, n / 2 > 0 ? n / 2 : 1);
  int64_t left = p.supply;
  for (int64_t s = 0; s < nsrc; ++s) {
    int64_t amt = (s == nsrc - 1) ? left : p.supply / nsrc;
    left -= amt;
    fprintf(out, "n %" PRId64 " %" PRId64 "\n", perm[s] + 1, amt);
  }
  left = p.supply;
  for (int64_t s = 0; s < nsnk; ++s) {
    int64_t amt = (s == nsnk - 1) ? left : p.supply / nsnk;
    left -= amt;
    fprintf(out, "n %" PRId64 " -%" PRId64 "\n", perm[n - 1 - s] + 1, amt);
  }

  std::string buf;
  buf.reserve(1 << 22);
  char line[96];
  const int64_t cap_lo = p.mincap > 0 ? p.mincap : 1;
  // honor fixed-capacity presets exactly (mincap == maxcap is legal)
  const int64_t cap_hi = p.maxcap >= cap_lo ? p.maxcap : cap_lo;
  for (int64_t j = 0; j < m; ++j) {
    int64_t b_cost = rng.uniform_int(p.mincost, p.maxcost);
    int64_t cap = rng.uniform_int(cap_lo, cap_hi);
    bc[j] = b_cost;
    int len = snprintf(line, sizeof(line), "a %d %d 0 %" PRId64 " %" PRId64 "\n",
                       au[j] + 1, av[j] + 1, cap, b_cost);
    buf.append(line, static_cast<size_t>(len));
    if (buf.size() > (1 << 22) - 128) {
      fwrite(buf.data(), 1, buf.size(), out);
      buf.clear();
    }
  }
  fwrite(buf.data(), 1, buf.size(), out);
  return 0;
}

void write_qfc(FILE* qfc, const std::vector<int64_t>& bcost, char cf, char cq,
               Rng& rng) {
  // qfcgen layout: count line, fixed-cost line, quadratic-cost line
  // (space-separated; data/qcnd/qfcgen.c:203-218)
  double ccm1, ccm2, cam1, cam2;
  cost_ranges(cf, cq, &ccm1, &ccm2, &cam1, &cam2);
  const int64_t m = static_cast<int64_t>(bcost.size());
  fprintf(qfc, "%" PRId64 "\n", m);
  std::string buf;
  buf.reserve(1 << 22);
  char line[64];
  std::vector<double> quad(m);
  for (int64_t j = 0; j < m; ++j) {
    double cc = static_cast<double>(bcost[j]) * rng.uniform(ccm1, ccm2) + 1.0;
    quad[j] = cc * rng.uniform(cam1, cam2) + 1.0;
    int len = snprintf(line, sizeof(line), "%f ", cc);
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
}

uint64_t seed_of(int64_t m, int rho, int64_t iid) {
  return 0x74706c00ULL ^ (static_cast<uint64_t>(m) << 20) ^
         (static_cast<uint64_t>(rho) << 16) ^ static_cast<uint64_t>(iid);
}

NetParams params_from_args(int64_t m, int rho, bool scale, Rng& rng) {
  // pargen.c:64-103 semantics, with the deterministic rng replacing rand()
  NetParams p;
  p.seed = rng.next();
  p.nodes = nodes_of(m, prho_of(rho));
  const int64_t max_nodes = std::max<int64_t>(static_cast<int64_t>(0.1 * p.nodes), 1);
  p.sources = rng.uniform_int(1, max_nodes);
  p.sinks = rng.uniform_int(1, max_nodes);
  p.arcs = m;
  p.mincost = 1;
  p.maxcost = rng.uniform_int(10, 109);
  p.supply = rng.uniform_int(100, 999);
  p.tsources = 0;
  p.tsinks = 0;
  p.hicost = 0;
  p.capacitated = 100;
  p.mincap = std::max<int64_t>(static_cast<int64_t>(0.05 * p.supply), 1);
  {
    int64_t lo = static_cast<int64_t>(0.2 * p.supply);
    int64_t hi = static_cast<int64_t>(0.4 * p.supply);
    int64_t cap = rng.uniform_int(std::max<int64_t>(lo, 1),
                                  std::max<int64_t>(hi, lo + 1));
    if (scale) cap = std::max<int64_t>(static_cast<int64_t>(cap * 0.7), 1);
    p.maxcap = cap;
  }
  return p;
}

// parse "netgen-{m}-{rho}-{id}-{cf}-{cq}-{s}" from a path
int parse_convention(const std::string& path, int64_t* m, int* rho,
                     int64_t* iid, char* cf, char* cq, bool* scale) {
  size_t slash = path.find_last_of('/');
  std::string base = (slash == std::string::npos) ? path : path.substr(slash + 1);
  char sflag[8] = {0};
  // stop the scaling-flag field at the extension dot: a bare '%2s' would
  // swallow it ("...-s.dmx" -> "s.") and misreport scale=false
  if (sscanf(base.c_str(), "netgen-%" SCNd64 "-%d-%" SCNd64 "-%c-%c-%2[^.]",
             m, rho, iid, cf, cq, sflag) != 6) {
    fprintf(stderr,
            "mcfgen: '%s' does not follow the netgen-{m}-{rho}-{id}-{cf}-{cq}"
            "-{s} convention\n", base.c_str());
    return 1;
  }
  *scale = strcmp(sflag, "s") == 0;
  return 0;
}

int mode_pargen(int argc, char** argv) {
  if (argc != 8) {
    fprintf(stderr, "usage: mcfgen pargen <m> <rho> <id> <cf> <cq> <s|ns>\n");
    return 1;
  }
  const int64_t m = atoll(argv[2]);
  const int rho = atoi(argv[3]);
  const int64_t iid = atoll(argv[4]);
  if (prho_of(rho) < 0) { fprintf(stderr, "rho must be 1|2|3\n"); return 1; }
  const bool scale = strcmp(argv[7], "s") == 0;
  Rng rng(seed_of(m, rho, iid));
  NetParams p = params_from_args(m, rho, scale, rng);
  char name[256];
  snprintf(name, sizeof(name), "netgen-%s-%s-%s-%s-%s-%s.par", argv[2],
           argv[3], argv[4], argv[5], argv[6], argv[7]);
  FILE* f = fopen(name, "w");
  if (!f) { fprintf(stderr, "cannot open %s\n", name); return 1; }
  fprintf(f, "%llu\n",
          static_cast<unsigned long long>(p.seed % 2000000000ULL));
  fprintf(f,
          "%" PRId64 " %" PRId64 " %" PRId64 " %" PRId64 " %" PRId64
          " %" PRId64 " %" PRId64 " %" PRId64 " %" PRId64 " %" PRId64
          " %" PRId64 " %" PRId64 " %" PRId64 " %" PRId64 "\n",
          p.problem, p.nodes, p.sources, p.sinks, p.arcs, p.mincost, p.maxcost,
          p.supply, p.tsources, p.tsinks, p.hicost, p.capacitated, p.mincap,
          p.maxcap);
  fclose(f);
  printf("%s\n", name);
  return 0;
}

int mode_netgen() {
  // stdin: seed line + 14-parameter line (netgen.c parameter order); accepts
  // the reference's data/netgen/param presets.
  NetParams p;
  long long vals[15];
  int got = 0;
  while (got < 15 && scanf("%lld", &vals[got]) == 1) got++;
  if (got < 15) {
    fprintf(stderr, "mcfgen netgen: expected seed + 14 parameters on stdin\n");
    return 1;
  }
  p.seed = static_cast<uint64_t>(vals[0]);
  p.problem = vals[1]; p.nodes = vals[2]; p.sources = vals[3];
  p.sinks = vals[4]; p.arcs = vals[5]; p.mincost = vals[6];
  p.maxcost = vals[7]; p.supply = vals[8]; p.tsources = vals[9];
  p.tsinks = vals[10]; p.hicost = vals[11]; p.capacitated = vals[12];
  p.mincap = vals[13]; p.maxcap = vals[14];
  Rng rng(p.seed ? p.seed : 1);
  std::vector<int32_t> au, av;
  std::vector<int64_t> bc;
  return write_dimacs(stdout, p, rng, &au, &av, &bc);
}

int mode_qfcgen(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: mcfgen qfcgen <file.dmx>\n");
    return 1;
  }
  const std::string dmx_path = argv[2];
  int64_t m, iid;
  int rho;
  char cf, cq;
  bool scale;
  if (parse_convention(dmx_path, &m, &rho, &iid, &cf, &cq, &scale)) return 1;
  FILE* in = fopen(dmx_path.c_str(), "r");
  if (!in) { fprintf(stderr, "cannot open %s\n", dmx_path.c_str()); return 1; }
  // collect the per-arc b costs (last field of each 'a' line)
  std::vector<int64_t> bcost;
  bcost.reserve(static_cast<size_t>(m));
  char line[256];
  while (fgets(line, sizeof(line), in)) {
    if (line[0] != 'a') continue;
    long long u_, v_, lo_, cap_, c_;
    if (sscanf(line + 1, "%lld %lld %lld %lld %lld", &u_, &v_, &lo_, &cap_,
               &c_) == 5)
      bcost.push_back(c_);
  }
  fclose(in);
  std::string qfc_path = dmx_path;
  size_t dot = qfc_path.rfind(".dmx");
  if (dot != std::string::npos) qfc_path.replace(dot, 4, ".qfc");
  else qfc_path += ".qfc";
  FILE* qfc = fopen(qfc_path.c_str(), "w");
  if (!qfc) { fprintf(stderr, "cannot open %s\n", qfc_path.c_str()); return 1; }
  Rng rng(seed_of(static_cast<int64_t>(bcost.size()), rho, iid) ^ 0x9fc);
  write_qfc(qfc, bcost, cf, cq, rng);
  fclose(qfc);
  printf("%s\n", qfc_path.c_str());
  return 0;
}

int mode_combined(int argc, char** argv) {
  if (argc < 8) {
    fprintf(stderr,
            "usage: mcfgen <arcs> <rho:1|2|3> <id> <cf:a|b> <cq:a|b> <s|ns> "
            "<output-dir>\n"
            "   or: mcfgen pargen <m> <rho> <id> <cf> <cq> <s|ns>\n"
            "   or: mcfgen netgen < file.par > out.dmx\n"
            "   or: mcfgen qfcgen <file.dmx>\n");
    return 1;
  }
  const int64_t m = atoll(argv[1]);
  const int rho = atoi(argv[2]);
  const int64_t iid = atoll(argv[3]);
  const char cf = argv[4][0];
  const char cq = argv[5][0];
  const bool scale = strcmp(argv[6], "s") == 0;
  const std::string outdir = argv[7];

  const double prho = prho_of(rho);
  if (prho < 0) { fprintf(stderr, "rho must be 1, 2 or 3\n"); return 1; }
  if ((cf != 'a' && cf != 'b') || (cq != 'a' && cq != 'b')) {
    fprintf(stderr, "cf and cq must be 'a' or 'b'\n");
    return 1;
  }
  Rng rng(seed_of(m, rho, iid));
  NetParams p = params_from_args(m, rho, scale, rng);
  if (m < p.nodes - 1) {
    fprintf(stderr, "need at least n-1=%" PRId64 " arcs for connectivity\n",
            p.nodes - 1);
    return 1;
  }
  // stage-equivalence: the combined path must emit byte-identical files to
  // `pargen | netgen | qfcgen`, so reseed exactly as those modes do
  p.seed = p.seed % 2000000000ULL;
  Rng rng_net(p.seed ? p.seed : 1);
  Rng rng_qfc(seed_of(m, rho, iid) ^ 0x9fc);

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
  std::vector<int32_t> au, av;
  std::vector<int64_t> bc;
  if (write_dimacs(dmx, p, rng_net, &au, &av, &bc)) return 1;
  fclose(dmx);
  write_qfc(qfc, bc, cf, cq, rng_qfc);
  fclose(qfc);
  printf("%s\n", base);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc >= 2 && strcmp(argv[1], "pargen") == 0) return mode_pargen(argc, argv);
  if (argc >= 2 && strcmp(argv[1], "netgen") == 0) return mode_netgen();
  if (argc >= 2 && strcmp(argv[1], "qfcgen") == 0) return mode_qfcgen(argc, argv);
  return mode_combined(argc, argv);
}
