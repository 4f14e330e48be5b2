"""In-session A/B: current resident kernel vs the round-2-era layout width
(int32 endpoint planes), interleaved — pins whether the +18% r1→r4 headline
drift (0.190 → 0.2234 s median) is chip/tunnel noise or a real regression
from layout changes (VERDICT r4 item 5 / weak #3).

Cross-session timing on this tunnel is invalid (the chip drifts 10-30%), so
the ONLY valid comparison is interleaved samples inside one session. The
plane-width change (int16 endpoint planes when p <= 32640, round 3) is the
one layout delta reconstructible by data alone — the kernel widens at the
read (``ops/kkt_fused.py: eo = eo_ref[sl, :].astype(jnp.int32)``), so an
int32-plane solver is the same program on wider planes. The group-broadcast
self-endpoint change is kernel code, not layout data; its effect is bounded
by this probe plus the published per-round kernels in git history.

Usage (serialize with any other TPU client!):
    python scripts/probe/ab_drift.py [--k 500] [--arcs 500000] [--reps 6]
Prints one JSON line: medians, samples, and the A/B ratio.
"""

import argparse
import dataclasses as dc
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=500)
    ap.add_argument("--arcs", type=int, default=500_000)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from two_pass_lanczos_tpu.models.generator import generate_mcf_instance
    from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver

    inst = generate_mcf_instance(args.arcs, rho=3, instance_id=1)
    p = inst.num_nodes
    n = inst.num_arcs + p
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n).astype(np.float32)

    s_cur = FusedKKTSolver(
        inst.quad_costs.astype(np.float32), inst.arc_u, inst.arc_v, p)

    # round-2-era width: same layout, eo planes widened back to int32
    s_old = FusedKKTSolver(
        inst.quad_costs.astype(np.float32), inst.arc_u, inst.arc_v, p)
    lay = s_old.layout
    wide = dc.replace(
        lay,
        u=dc.replace(lay.u, eo2=lay.u.eo2.astype(np.int32)),
        v=dc.replace(lay.v, eo2=lay.v.eo2.astype(np.int32)),
    )
    s_old.layout = wide
    s_old._arrs = tuple(jnp.asarray(a) for a in (
        wide.u.d2, wide.u.eo2, wide.u.gn3,
        wide.v.d2, wide.v.eo2, wide.v.gn3))

    def run(solver, bb):
        x_rep, _ = solver.solve(bb, k=args.k, f="inv", raw=True)
        return float(jnp.sum(x_rep * x_rep))  # forced readback

    plane = {
        "cur": str(s_cur.layout.u.eo2.dtype),
        "old": str(s_old.layout.u.eo2.dtype),
    }
    print(f"compiling cur (eo2={plane['cur']})...", flush=True)
    ref = run(s_cur, b)
    print(f"compiling old (eo2={plane['old']})...", flush=True)
    ref_old = run(s_old, b)
    assert abs(ref - ref_old) <= 1e-3 * abs(ref), (ref, ref_old)

    samples = {"cur": [], "old": []}
    for i in range(args.reps):
        bb = b * (1.0 + 1e-6 * (i + 1))
        for name, solver in (("cur", s_cur), ("old", s_old)):
            t0 = time.perf_counter()
            run(solver, bb)
            samples[name].append(time.perf_counter() - t0)

    med = {k: float(np.median(v)) for k, v in samples.items()}
    out = {
        "probe": "ab_drift_plane_width",
        "k": args.k, "arcs": args.arcs,
        "eo2_dtype": plane,
        "median_s": {k: round(v, 4) for k, v in med.items()},
        "min_s": {k: round(min(v), 4) for k, v in samples.items()},
        "samples": {k: [round(s, 4) for s in v] for k, v in samples.items()},
        "old_over_cur": round(med["old"] / med["cur"], 3),
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
