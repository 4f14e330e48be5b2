"""Memory/time vs k trade-off on a fixed KKT instance
(reference ``src/bin/tradeoff.rs``).

Known-solution setup: ``x_true = 1/√n``, ``b = A·x_true``; f = inv; sweep k.
CSV schema matches ``results/tradeoff_*.csv``: ``variant,k,time_s,rss_kb``.

Process model: by default both variants run in-process (on TPU the memory
metric is per-run device memory, no isolation needed). ``--isolate``
reproduces the reference's orchestrator/worker re-exec so that VmPeak
reflects a single variant (``tradeoff.rs:4-7,142-213``).
"""

from __future__ import annotations

import argparse

MODULE = "two_pass_lanczos_tpu.experiments.tradeoff"


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dmx", help="path to the .dmx file")
    p.add_argument("--qfc", help="path to the .qfc file")
    p.add_argument("--arcs", type=int, help="generate an instance instead of loading")
    p.add_argument("--rho", type=int, default=3)
    p.add_argument("--instance-id", type=int, default=1)
    p.add_argument("--k-start", type=int, default=50)
    p.add_argument("--k-end", type=int, default=1000)
    p.add_argument("--k-step", type=int, default=50)
    p.add_argument("--output", required=True)
    p.add_argument("--isolate", action="store_true",
                   help="orchestrator/worker process isolation (VmPeak fidelity)")
    p.add_argument("--backend", choices=["auto", "xla", "pallas", "fused"],
                   default="auto")
    p.add_argument("--cpu-f64", action="store_true")
    return p


def _load_arrays(args):
    from two_pass_lanczos_tpu.utils.data_loader import KKTArrays, load_kkt_arrays

    if args.dmx and args.qfc:
        return load_kkt_arrays(args.dmx, args.qfc)
    if args.arcs:
        from two_pass_lanczos_tpu.models.generator import generate_mcf_instance

        inst = generate_mcf_instance(args.arcs, rho=args.rho, instance_id=args.instance_id)
        return KKTArrays(inst.quad_costs, inst.arc_u, inst.arc_v,
                         inst.num_nodes, inst.num_arcs)
    raise SystemExit("provide --dmx/--qfc or --arcs")


def _resolve_backend(args):
    import jax

    if args.backend != "auto":
        return args.backend
    # the fused VMEM-resident solver is the production TPU path
    return "fused" if jax.default_backend() == "tpu" else "xla"


def _load_operator(args):
    import jax

    import two_pass_lanczos_tpu as tpl

    arrays = _load_arrays(args)
    dtype = None
    if jax.default_backend() == "cpu":
        import jax.numpy as jnp

        dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    op = tpl.make_kkt_operator(arrays.quad_costs, arrays.arc_u, arrays.arc_v,
                               arrays.num_nodes, dtype=dtype,
                               backend=_resolve_backend(args))
    return op, arrays.n


def _run_variant(args, variant, emit):
    import numpy as np

    from two_pass_lanczos_tpu.experiments.common import (
        known_solution_problem, log, peak_memory_kb, timed_solve,
    )

    import two_pass_lanczos_tpu as tpl

    backend = _resolve_backend(args)
    method = "one_pass" if variant == "standard" else "two_pass"

    if backend == "fused":
        from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver

        arrays = _load_arrays(args)
        if arrays.num_arcs > FusedKKTSolver.MAX_ARCS:
            log.warning("instance too large for the VMEM-resident fused "
                        "solver; falling back to the streaming pallas path")
            args.backend = "pallas"
            return _run_variant(args, variant, emit)
        solver = FusedKKTSolver(
            np.asarray(arrays.quad_costs, np.float32),
            arrays.arc_u, arrays.arc_v, arrays.num_nodes)
        x_true = np.full(arrays.n, 1.0 / np.sqrt(arrays.n), np.float32)
        b = solver.matvec(x_true)

        def solve(k):
            x, _ = solver.solve(b, k=k, f="inv", method=method, raw=True)
            return x
    else:
        op, n = _load_operator(args)
        _, b_dev = known_solution_problem(op, n)

        def solve(k):
            return tpl.solve_fAb(op, b_dev, k=k, f="inv", method=method)

    for k in range(args.k_start, args.k_end + 1, args.k_step):
        # warm (compile) with a forced readback, then time
        timed_solve(solve, k)
        _, dt = timed_solve(solve, k)
        rss = peak_memory_kb()
        log.info("%s k=%d time=%.4fs mem=%dKB", variant, k, dt, rss)
        emit(variant, k, dt, rss)


def main(argv=None) -> int:
    from two_pass_lanczos_tpu.experiments.common import (
        VARIANTS, emit_row, force_cpu_f64, run_orchestrated, setup_logging,
        worker_variant, write_csv,
    )

    args = build_parser().parse_args(argv)
    setup_logging()
    if args.cpu_f64:
        force_cpu_f64()

    header = ["variant", "k", "time_s", "rss_kb"]
    wv = worker_variant()
    if wv is not None:  # worker process: stream headerless rows on stdout
        _run_variant(args, wv, emit_row)
        return 0

    rows = []
    if args.isolate:
        rows = run_orchestrated(
            [MODULE, *(argv or _reconstruct_argv(args))],
            lambda f: (f[0], int(f[1]), float(f[2]), int(f[3])),
        )
    else:
        for variant in VARIANTS:
            _run_variant(args, variant, lambda *f: rows.append(f))
    write_csv(args.output, header, rows)
    return 0


def _reconstruct_argv(args):
    out = ["--output", args.output, "--k-start", str(args.k_start),
           "--k-end", str(args.k_end), "--k-step", str(args.k_step),
           "--backend", args.backend]
    if args.dmx:
        out += ["--dmx", args.dmx, "--qfc", args.qfc]
    if args.arcs:
        out += ["--arcs", str(args.arcs), "--rho", str(args.rho),
                "--instance-id", str(args.instance_id)]
    if args.cpu_f64:
        out += ["--cpu-f64"]
    return out


if __name__ == "__main__":
    raise SystemExit(main())
