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

// ---------------------------------------------------------------------------
// Klingman NETGEN generator (re-implementation).
//
// Faithful to the behavior of the classic generator as described in
// Klingman, Napier & Stutz (Management Science 20(5), 1974) and realized by
// the reference's C version (`data/netgen/src/netgen.c:154-440` — studied as
// the specification; this is an independent implementation with its own
// index structure and PRNG discipline):
//
//   * sources 1..S get the total supply split randomly (create_supply);
//   * 60% of the transshipment nodes are dealt round-robin into per-source
//     skeleton chains, the remaining 40% are appended to random sources;
//   * each chain is hooked to ~2·len·SINKS/T random sinks, the source's
//     supply routed down the chain to them in random partial amounts;
//   * skeleton arcs get max cost with probability HICOST% and capacity
//     max(B[source], MINCAP) with probability CAPACITATED%;
//   * every chain node then sprays "rubbish" arcs at random non-source
//     nodes (pick_head), with the per-node count tuned so the total arc
//     count hits DENSITY exactly; rubbish arcs get uniform costs and, with
//     probability CAPACITATED%, uniform capacities;
//   * transshipment sinks (TSINKS) also spray rubbish arcs.
//
// Quirks deliberately preserved (they shape the distributions the reference
// ships): random1(a,b) truncates a+(b-a)·U[0,1) so b itself is never drawn
// (netgen's drand48 form, random.c:44-52); remove_index decrements the
// pseudo_size even for absent members and pick_head draws positions over
// pseudo_size, so an exhausted head list yields head index 0 — an invalid
// DIMACS arc the reference's own tooling detects-and-retries downstream
// (reference README.md:166-174, scalability.rs:286-299).
// ---------------------------------------------------------------------------

// Order-statistics index list: ascending integers [from, to]; choose(k)
// removes and returns the k'th smallest remaining (0 when out of range);
// remove(v) deletes v if present and unconditionally shrinks pseudo-size.
// Fenwick-tree select: O(log n) per op at any size (the reference uses a
// flag array under 100 elements and an interval tree above).
struct IndexList {
  int64_t from_, n_, isize_, psize_;
  std::vector<int64_t> bit_;
  std::vector<uint8_t> present_;

  IndexList(int64_t from, int64_t to)
      : from_(from), n_(to >= from ? to - from + 1 : 0), isize_(n_),
        psize_(n_), bit_(n_ + 1, 0), present_(n_, 1) {
    for (int64_t i = 1; i <= n_; ++i) {
      bit_[i] += 1;
      int64_t j = i + (i & -i);
      if (j <= n_) bit_[j] += bit_[i];
    }
  }
  int64_t size() const { return isize_; }
  int64_t pseudo() const { return psize_; }

  void unlink_(int64_t off) {
    present_[off] = 0;
    --isize_;
    for (int64_t i = off + 1; i <= n_; i += i & (-i)) bit_[i] -= 1;
  }

  int64_t choose(int64_t k) {
    if (k < 1 || k > isize_) return 0;
    --psize_;
    int64_t pos = 0, rem = k, pw = 1;
    while ((pw << 1) <= n_) pw <<= 1;
    for (; pw > 0; pw >>= 1) {
      if (pos + pw <= n_ && bit_[pos + pw] < rem) {
        pos += pw;
        rem -= bit_[pos];
      }
    }
    // after the descent, pos counts the present elements strictly before
    // the k'th, so offset pos is exactly the k'th present slot
    const int64_t off = pos;
    unlink_(off);
    return from_ + off;
  }

  void remove(int64_t v) {
    --psize_;
    if (v < from_ || v >= from_ + n_) return;
    int64_t off = v - from_;
    if (!present_[off]) return;
    unlink_(off);
  }
};

// netgen's random1 after the drand48 fix: a + (b-a)·U[0,1) truncated toward
// zero — b is never produced, and an inverted range (b < a) yields values
// at/below a (random.c:44-52). Distributions downstream depend on this.
struct NetRng {
  Rng* r;
  int64_t operator()(int64_t a, int64_t b) {
    double v = static_cast<double>(a) +
               static_cast<double>(b - a) * r->uniform(0.0, 1.0);
    return static_cast<int64_t>(v);  // trunc toward zero, like the C cast
  }
};

struct Network {
  std::vector<int64_t> from, to, cost, cap;  // 1-based node ids
  std::vector<int64_t> B;                    // supply per node (0-based)
};

struct KlingmanState {
  const NetParams& p;
  NetRng rnd;
  Network* net;
  int64_t nodes_left;

  void save_arc(int64_t t, int64_t h, int64_t c, int64_t u) {
    net->from.push_back(t);
    net->to.push_back(h);
    net->cost.push_back(c);
    net->cap.push_back(u);
  }

  // pick_head (netgen.c:407-438): spray rubbish arcs from desired_tail at
  // random members of `handle`, count tuned so the total approaches DENSITY.
  void pick_head(IndexList& handle, int64_t desired_tail) {
    const int64_t non_sources = p.nodes - p.sources + p.tsources;
    const int64_t remaining = p.arcs - static_cast<int64_t>(net->from.size());
    --nodes_left;
    if (2 * nodes_left >= remaining) return;

    int64_t limit;
    if ((remaining + non_sources - handle.pseudo() - 1) / (nodes_left + 1) >=
        non_sources - 1) {
      limit = non_sources;
    } else {
      const int64_t upper = 2 * (remaining / (nodes_left + 1) - 1);
      do {
        limit = rnd(1, upper);
        if (nodes_left == 0) limit = remaining;
      } while (nodes_left * (non_sources - 1) < remaining - limit);
    }

    for (; limit > 0; --limit) {
      const int64_t index = handle.choose(rnd(1, handle.pseudo()));
      int64_t cap = p.supply;
      if (rnd(1, 100) <= p.capacitated) cap = rnd(p.mincap, p.maxcap);
      save_arc(desired_tail, index, rnd(p.mincost, p.maxcost), cap);
    }
  }
};

// Generate the network. Returns 0 on success, nonzero on parameter error.
int klingman_generate(const NetParams& p, Rng& rng, Network* net) {
  const int64_t N = p.nodes, S = p.sources, SK = p.sinks, T = N - S - SK;
  if (N < 2 || S <= 0 || SK <= 0 || S + SK > N || p.arcs < N ||
      p.mincost > p.maxcost || p.supply < S || p.tsources > S ||
      p.tsinks > SK || p.mincap > p.maxcap) {
    fprintf(stderr, "mcfgen netgen: inconsistent parameter settings\n");
    return 1;
  }
  NetRng rnd{&rng};
  net->B.assign(N, 0);
  net->from.clear(); net->to.clear(); net->cost.clear(); net->cap.clear();
  net->from.reserve(p.arcs); net->to.reserve(p.arcs);
  net->cost.reserve(p.arcs); net->cap.reserve(p.arcs);
  KlingmanState st{p, rnd, net, N - SK + p.tsinks};

  // assignment problems take a different construction entirely
  const bool assignment =
      (S - p.tsources) + (SK - p.tsinks) == N &&
      (S - p.tsources) == (SK - p.tsinks) && S == p.supply;
  if (assignment) {
    for (int64_t i = 0; i < N / 2; ++i) net->B[i] = 1;
    for (int64_t i = N / 2; i < N; ++i) net->B[i] = -1;
    IndexList skeleton(S + 1, N);
    for (int64_t source = 1; source <= N / 2; ++source) {
      const int64_t index = skeleton.choose(rnd(1, skeleton.size()));
      st.save_arc(source, index, rnd(p.mincost, p.maxcost), 1);
      IndexList handle(S + 1, N);
      handle.remove(index);
      st.pick_head(handle, source);
    }
    return 0;
  }

  // create_supply (netgen.c:339-351): random split of SUPPLY over sources
  {
    const int64_t per = p.supply / S;
    for (int64_t i = 0; i < S; ++i) {
      const int64_t partial = rnd(1, per);
      net->B[i] += partial;
      net->B[rnd(0, S - 1)] += per - partial;
    }
    net->B[rnd(0, S - 1)] += p.supply % S;
  }

  // skeleton chains: 60% of transshipment nodes dealt round-robin, the
  // rest appended to random sources (netgen.c:225-247)
  std::vector<int64_t> pred(N + 1, 0);
  for (int64_t i = 1; i <= S; ++i) pred[i] = i;
  {
    IndexList handle(S + 1, N - SK);
    int64_t source = 1;
    int64_t i = T;
    for (; i > (4 * T + 9) / 10; --i) {
      const int64_t node = handle.choose(rnd(1, handle.size()));
      pred[node] = pred[source];
      pred[source] = node;
      if (++source > S) source = 1;
    }
    for (; i > 0; --i) {
      const int64_t node = handle.choose(rnd(1, handle.size()));
      const int64_t src = rnd(1, S);
      pred[node] = pred[src];
      pred[src] = node;
    }
  }

  // per-source: walk the chain, hook sinks, emit skeleton + rubbish arcs
  std::vector<int64_t> tail, head;
  for (int64_t source = 1; source <= S; ++source) {
    tail.assign(1, 0);  // 1-based like the reference arrays
    head.assign(1, 0);
    int64_t node = pred[source];
    while (node != source) {
      head.push_back(node);
      node = pred[node];
      tail.push_back(node);
    }
    const int64_t sort_count0 = static_cast<int64_t>(tail.size()) - 1;

    int64_t sinks_per_source =
        (T == 0) ? SK / S + 1 : 2 * sort_count0 * SK / T;
    sinks_per_source =
        std::max<int64_t>(2, std::min<int64_t>(sinks_per_source, SK));
    std::vector<int64_t> sinks;  // 0-based B indices (node id - 1)
    {
      IndexList handle(N - SK, N - 1);
      for (int64_t i = 0; i < sinks_per_source; ++i)
        sinks.push_back(handle.choose(rnd(1, handle.size())));
      if (source == S) {  // last source adopts unused zero-supply sinks
        while (handle.size() > 0) {
          const int64_t j = handle.choose(1);
          if (net->B[j] == 0) {
            sinks.push_back(j);
            ++sinks_per_source;
          }
        }
      }
    }

    const int64_t chain_length = sort_count0;
    const int64_t supply_per_sink = net->B[source - 1] / sinks_per_source;
    int64_t k = pred[source];
    for (int64_t i = 0; i < sinks_per_source; ++i) {
      const int64_t partial = rnd(1, supply_per_sink);
      const int64_t j = rnd(0, sinks_per_source - 1);
      tail.push_back(k);
      head.push_back(sinks[i] + 1);
      net->B[sinks[i]] -= partial;
      net->B[sinks[j]] -= supply_per_sink - partial;
      k = source;
      for (int64_t w = rnd(1, chain_length); w > 0; --w) k = pred[k];
    }
    net->B[sinks[0]] -= net->B[source - 1] % sinks_per_source;

    const int64_t sort_count = static_cast<int64_t>(tail.size()) - 1;
    // sort skeleton arcs by tail (the reference shell-sorts; order within a
    // tie only permutes identically-distributed draws)
    {
      std::vector<int64_t> idx(sort_count);
      for (int64_t i = 0; i < sort_count; ++i) idx[i] = i + 1;
      std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
        return tail[a] < tail[b];
      });
      std::vector<int64_t> t2(tail), h2(head);
      for (int64_t i = 0; i < sort_count; ++i) {
        tail[i + 1] = t2[idx[i]];
        head[i + 1] = h2[idx[i]];
      }
    }
    tail.push_back(0);  // terminator

    for (int64_t i = 1; i <= sort_count;) {
      IndexList handle(S - p.tsources + 1, N);
      handle.remove(tail[i]);
      const int64_t it = tail[i];
      while (it == tail[i]) {
        handle.remove(head[i]);
        int64_t cap = p.supply;
        if (rnd(1, 100) <= p.capacitated)
          cap = std::max(net->B[source - 1], p.mincap);
        int64_t cost = p.maxcost;
        if (rnd(1, 100) > p.hicost) cost = rnd(p.mincost, p.maxcost);
        st.save_arc(it, head[i], cost, cap);
        ++i;
      }
      st.pick_head(handle, it);
    }
  }

  // rubbish arcs out of the transshipment sinks (netgen.c:330-336)
  for (int64_t i = N - SK + 1; i <= N - SK + p.tsinks; ++i) {
    IndexList handle(S - p.tsources + 1, N);
    handle.remove(i);
    st.pick_head(handle, i);
  }
  return 0;
}

// Write a DIMACS network for the given NETGEN parameters to `out`.
// Returns 0 on success, 1 on parameter error, 2 when the generated network
// contains an invalid (index-0) head — the preserved NETGEN pseudo-size
// quirk; callers with freedom over the seed should retry (the reference's
// own pipeline validates-and-retries the same way, scalability.rs:223-299).
int write_dimacs(FILE* out, const NetParams& p, Rng& rng,
                 std::vector<int32_t>* out_u, std::vector<int32_t>* out_v,
                 std::vector<int64_t>* out_bcost) {
  Network net;
  if (klingman_generate(p, rng, &net)) return 1;
  const int64_t n = p.nodes;
  const int64_t m = static_cast<int64_t>(net.from.size());

  int rc = 0;
  for (int64_t j = 0; j < m; ++j)
    if (net.to[j] < 1 || net.from[j] < 1) rc = 2;

  std::vector<int32_t>& au = *out_u;
  std::vector<int32_t>& av = *out_v;
  std::vector<int64_t>& bc = *out_bcost;
  au.resize(m);
  av.resize(m);
  bc.resize(m);

  fprintf(out, "c generated by mcfgen (two_pass_lanczos_tpu native toolchain)\n");
  fprintf(out, "p min %" PRId64 " %" PRId64 "\n", n, m);
  for (int64_t i = 0; i < n; ++i) {
    if (net.B[i] != 0)
      fprintf(out, "n %" PRId64 " %" PRId64 "\n", i + 1, net.B[i]);
  }

  std::string buf;
  buf.reserve(1 << 22);
  char line[96];
  for (int64_t j = 0; j < m; ++j) {
    au[j] = static_cast<int32_t>(net.from[j] - 1);
    av[j] = static_cast<int32_t>(net.to[j] - 1);
    bc[j] = net.cost[j];
    int len = snprintf(line, sizeof(line),
                       "a %" PRId64 " %" PRId64 " 0 %" PRId64 " %" PRId64 "\n",
                       net.from[j], net.to[j], net.cap[j], net.cost[j]);
    buf.append(line, static_cast<size_t>(len));
    if (buf.size() > (1 << 22) - 128) {
      fwrite(buf.data(), 1, buf.size(), out);
      buf.clear();
    }
  }
  fwrite(buf.data(), 1, buf.size(), out);
  return rc;
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
  // rc==2 (invalid index-0 head, the preserved NETGEN quirk) still writes
  // the network — the raw pipeline has no retry, exactly like the
  // reference's netgen binary; downstream validation handles it.
  return write_dimacs(stdout, p, rng, &au, &av, &bc) == 1 ? 1 : 0;
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
  // the preserved NETGEN pseudo-size quirk occasionally yields an invalid
  // (index-0) head; rotate the seed and retry, as the reference's own
  // datagen orchestration does (scalability.rs:223-282)
  int rc = 1;
  for (int attempt = 0; attempt < 5; ++attempt) {
    if (attempt > 0) {
      fclose(dmx);
      dmx = fopen(dmx_path.c_str(), "w");
      if (!dmx) return 1;
      fprintf(stderr, "mcfgen: invalid arc in attempt %d, rotating seed\n",
              attempt);
    }
    Rng rng_try((p.seed ? p.seed : 1) + static_cast<uint64_t>(attempt));
    rc = write_dimacs(dmx, p, rng_try, &au, &av, &bc);
    if (rc != 2) break;
  }
  if (rc) {
    fprintf(stderr, "mcfgen: could not generate a valid instance\n");
    return 1;
  }
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
