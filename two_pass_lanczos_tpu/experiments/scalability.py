"""Memory/time vs n at fixed k (reference ``src/bin/scalability.rs``).

Sweeps the arc count, generating each instance (with validation and up to 5
seed-rotating retries, reference ``scalability.rs:223-299``), then timing both
variants. CSV rows are flushed incrementally per record so partial runs
preserve data (``scalability.rs:198-200``). Schema: ``variant,n,k,time_s,rss_kb``.
"""

from __future__ import annotations

import argparse
import csv


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arcs-start", type=int, default=50_000)
    p.add_argument("--arcs-end", type=int, default=500_000)
    p.add_argument("--arcs-step", type=int, default=50_000)
    p.add_argument("--k", type=int, default=500)
    p.add_argument("--rho", type=int, default=3)
    p.add_argument("--output", required=True)
    p.add_argument("--backend", choices=["auto", "xla", "pallas", "fused"],
                   default="auto")
    p.add_argument("--cpu-f64", action="store_true")
    p.add_argument("--max-retries", type=int, default=5)
    return p


def _generate_validated(arcs, rho, max_retries):
    """Generate + validate an instance, rotating the seed on failure
    (the reference retries on downloaded-data quality issues; our generator
    is deterministic, but the validation contract is kept)."""
    from two_pass_lanczos_tpu.experiments.common import log
    from two_pass_lanczos_tpu.models.generator import generate_mcf_instance

    for attempt in range(1, max_retries + 1):
        inst = generate_mcf_instance(arcs, rho=rho, instance_id=attempt)
        ok = (
            inst.arc_u.min() >= 0
            and inst.arc_v.min() >= 0
            and inst.arc_u.max() < inst.num_nodes
            and inst.arc_v.max() < inst.num_nodes
            and (inst.quad_costs > 0).all()
        )
        if ok:
            return inst
        log.warning("instance validation failed (attempt %d), rotating seed", attempt)
    raise RuntimeError(f"could not generate a valid {arcs}-arc instance")


def main(argv=None) -> int:
    import numpy as np

    from two_pass_lanczos_tpu.experiments.common import (
        VARIANTS, force_cpu_f64, known_solution_problem, log, peak_memory_kb,
        setup_logging, timed_solve,
    )

    args = build_parser().parse_args(argv)
    setup_logging()
    if args.cpu_f64:
        force_cpu_f64()

    import jax

    import two_pass_lanczos_tpu as tpl

    dtype = None
    if jax.default_backend() == "cpu":
        import jax.numpy as jnp

        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32

    from two_pass_lanczos_tpu.experiments.common import (
        make_fused_solver, resolve_backend,
    )

    with open(args.output, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(["variant", "n", "k", "time_s", "rss_kb"])
        backend = resolve_backend(args.backend)
        for arcs in range(args.arcs_start, args.arcs_end + 1, args.arcs_step):
            inst = _generate_validated(arcs, args.rho, args.max_retries)
            n = inst.num_arcs + inst.num_nodes
            solver = None
            if backend == "fused":
                solver = make_fused_solver(inst.quad_costs, inst.arc_u,
                                           inst.arc_v, inst.num_nodes)
            use_fused = solver is not None
            if use_fused:
                x_true = np.full(n, 1.0 / np.sqrt(n), np.float32)
                b_fused = solver.matvec(x_true)
            else:
                op = tpl.make_kkt_operator(
                    inst.quad_costs, inst.arc_u, inst.arc_v, inst.num_nodes,
                    dtype=dtype,
                    backend="pallas" if backend == "fused" else backend,
                )
                _, b = known_solution_problem(op, n)
            for variant in VARIANTS:
                method = "one_pass" if variant == "standard" else "two_pass"
                if use_fused:
                    def solve():
                        x, _ = solver.solve(b_fused, k=args.k, f="inv",
                                            method=method, raw=True)
                        return x
                else:
                    def solve():
                        return tpl.solve_fAb(op, b, k=args.k, f="inv",
                                             method=method)
                timed_solve(solve)
                _, dt = timed_solve(solve)
                rss = peak_memory_kb()
                log.info("%s n=%d k=%d time=%.4fs mem=%dKB",
                         variant, n, args.k, dt, rss)
                writer.writerow([variant, n, args.k, dt, rss])
                fh.flush()  # incremental flush per record
    log.info("wrote %s", args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
