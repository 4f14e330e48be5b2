"""A/B: SLQ trace estimation, fused kernel vs vmapped XLA scan (on-chip).

Same instance, same probes (identical key), same session — the only valid
timing comparison on the time-shared tunneled chip (CLAUDE.md). Timing
forces a scalar readback per sample (block_until_ready is unreliable
through the tunnel); min over reps, compile excluded by a warmup call.

Usage: python scripts/probe/ab_slq.py [--arcs 500000] [--k 50] [--probes 16]
Prints one summary line; numbers feed PERF.md's capability-layer section.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def timed(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(out.estimate)  # forced scalar readback
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arcs", type=int, default=500_000)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--probes", type=int, default=16)
    ap.add_argument("--any-backend", action="store_true")
    args = ap.parse_args()

    if args.any_backend:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import two_pass_lanczos_tpu as tpl
    from two_pass_lanczos_tpu.models.generator import generate_mcf_instance
    from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver
    from two_pass_lanczos_tpu.slq import slq_trace

    inst = generate_mcf_instance(args.arcs, rho=3, instance_id=1)
    scale = float(np.max(inst.quad_costs))
    d = (inst.quad_costs / scale).astype(np.float32)
    key = jax.random.key(7)
    f = "exp"

    interp = args.any_backend
    fused = FusedKKTSolver(d, inst.arc_u, inst.arc_v, inst.num_nodes,
                           interpret=interp)
    op = tpl.make_kkt_operator(d, inst.arc_u, inst.arc_v, inst.num_nodes,
                               backend="xla", dtype=jnp.float32)

    run_f = lambda: fused.slq_trace(f, k=args.k, num_probes=args.probes,
                                    key=key)
    run_x = lambda: slq_trace(op, f, k=args.k, num_probes=args.probes,
                              key=key)
    run_f()  # compile
    run_x()
    t_f, res_f = timed(run_f)
    t_x, res_x = timed(run_x)
    rel = abs(float(res_f.estimate) - float(res_x.estimate)) / max(
        abs(float(res_x.estimate)), 1e-30)
    print(f"AB_SLQ arcs={args.arcs} k={args.k} probes={args.probes} "
          f"fused={t_f:.4f}s xla={t_x:.4f}s speedup={t_x / t_f:.2f}x "
          f"estimates_rel_diff={rel:.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
