"""Headline benchmark: two-pass f(A)b, k=500, 500k-arc rho=3 KKT system.

Reference baseline: 5.28 s on one Xeon core (``BASELINE.md`` — scalability
k=500, n=501,155, two-pass). Prints one JSON line; ``vs_baseline`` is the
speedup factor (>1 = faster than the reference).

TPU path: the fused VMEM-resident Pallas solver (``ops/kkt_fused.py``) — the
whole pass runs as one on-chip program in the dual-sorted arc layout. CPU
path: the XLA f64 reference pipeline.

Measurement notes: this environment tunnels the TPU, so async dispatch makes
``block_until_ready`` unreliable — every sample forces a full host readback
of a scalar reduction of the result, and the compile call is excluded.
"""

import json
import os
import sys
import threading
import time

import numpy as np

#: Hard wall for the whole bench. The tunneled TPU backend HANGS (not
#: errors) when the tunnel is down — observed for hours on 2026-08-17 —
#: and nothing inside the hung XLA call can be interrupted from Python.
#: A daemon watchdog turns that into an honest failure instead of
#: stalling the driver. Normal runs finish in ~4-8 min incl. compiles
#: (the 5M-arc streaming leg adds instance generation + layout build +
#: one scan compile on top of the resident-tier ~2-3 min), but the
#: time-shared chip has been observed to slow 30-50x under contention
#: (2026-08-19: a trivial 1024² matmul roundtrip took 173 s), so the
#: wall is generous and the legs are ordered headline-first: if it fires
#: mid-run, whatever legs already completed are flushed as an honest
#: partial record (``watchdog_truncated: true``) rather than discarded.
WATCHDOG_S = 2700


def _arm_watchdog(record):
    def fire():
        try:  # snapshot defensively: the main thread may be mid-update
            snap = dict(record)
            line = json.dumps({**snap, "watchdog_truncated": True})
        except Exception:
            snap, line = {}, None
        if snap.get("value") is not None and line is not None:
            print(f"bench.py watchdog: wall of {WATCHDOG_S}s hit with the "
                  "headline measured — emitting the completed legs only "
                  "(chip contention or tunnel loss mid-run).",
                  file=sys.stderr, flush=True)
            print(line, flush=True)
            os._exit(0)
        print(f"bench.py watchdog: no result after {WATCHDOG_S}s — "
              "TPU tunnel presumed down; aborting without a metric.",
              file=sys.stderr, flush=True)
        os._exit(3)

    t = threading.Timer(WATCHDOG_S, fire)
    t.daemon = True
    t.start()
    return t


#: Pre-flight tunnel wait: probe the backend in a KILLABLE subprocess
#: (in-process jax.devices() hangs unkillably when the tunnel is down)
#: and retry for up to this long before giving up. Covers the observed
#: transient outages without stalling the driver forever.
PREFLIGHT_WAIT_S = 1800
PREFLIGHT_PROBE_TIMEOUT_S = 120
PROBE_CMD = [sys.executable, "-c", "import jax; jax.devices()"]


def _wait_for_backend() -> bool:
    import subprocess

    deadline = time.time() + PREFLIGHT_WAIT_S
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                PROBE_CMD,
                timeout=PREFLIGHT_PROBE_TIMEOUT_S,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f"bench.py: backend probe {attempt} failed (tunnel down?); "
              "retrying in 60 s", file=sys.stderr, flush=True)
        time.sleep(60)


def main() -> int:
    if not _wait_for_backend():
        print(f"bench.py: backend unreachable after {PREFLIGHT_WAIT_S}s of "
              "probing — TPU tunnel presumed down; aborting without a "
              "measurement.", file=sys.stderr, flush=True)
        # one honest machine-readable line (no fabricated number): the
        # tunnel outage is the result, not a missing run
        print(json.dumps({
            "metric": "two_pass_inv_k500_arcs500000_rho3_wallclock",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": "tpu_tunnel_down",
        }), flush=True)
        return 3
    record = {}  # populated in place so the watchdog can flush partials
    watchdog = _arm_watchdog(record)
    import jax
    import jax.numpy as jnp

    import two_pass_lanczos_tpu as tpl
    from two_pass_lanczos_tpu.models.generator import generate_mcf_instance

    backend = jax.default_backend()
    arcs, rho, k = 500_000, 3, 500
    ref_time_s = 5.28  # reference two-pass @ k=500, n=501,155

    inst = generate_mcf_instance(arcs, rho=rho, instance_id=1)
    m, p = inst.num_arcs, inst.num_nodes
    n = m + p

    rng = np.random.default_rng(0)

    if backend == "tpu":
        from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver

        solver = FusedKKTSolver(
            inst.quad_costs.astype(np.float32), inst.arc_u, inst.arc_v, p
        )
        b = rng.standard_normal(n).astype(np.float32)

        def run(bb):
            x_rep, _ = solver.solve(bb, k=k, f="inv", raw=True)
            return float(jnp.sum(x_rep * x_rep))  # forced device->host readback

        def sample_input(i):
            return b * (1.0 + 1e-6 * (i + 1))
    else:
        dtype = np.float64
        jax.config.update("jax_enable_x64", True)
        op = tpl.make_kkt_operator(
            inst.quad_costs.astype(dtype), inst.arc_u, inst.arc_v, p,
            backend="xla",
        )
        b = jnp.asarray(rng.standard_normal(n).astype(dtype))

        def run(bb):
            x = tpl.solve_fAb(op, bb, k=k, f="inv", method="two_pass")
            return float(jnp.sum(x * x))

        def sample_input(i):
            return b * (1.0 + 1e-6 * (i + 1))

    run(sample_input(-1))  # compile
    # Median of >= 5: the tunneled chip is time-shared with ±30% noise, so a
    # single draw (or a min) keeps "contradicting" the documented numbers
    # round-over-round (VERDICT r2 item 3). The JSON reports median (the
    # headline), min (best case), and the sample list.
    samples = []
    for i in range(6):
        bb = sample_input(i)  # distinct inputs defeat result caching
        t0 = time.perf_counter()
        run(bb)
        samples.append(time.perf_counter() - t0)
    t = float(np.median(samples))

    record.update(
        metric=f"two_pass_inv_k{k}_arcs{arcs}_rho{rho}_wallclock",
        value=round(t, 4),
        unit="s",
        vs_baseline=round(ref_time_s / t, 2),
        value_min=round(min(samples), 4),
        samples=[round(s, 4) for s in samples],
    )

    if backend == "tpu":
        # device-resident headline: pre-packed flat rep skips the per-call
        # host scatter + ~30 ms tunnel upload (the part of `value` that is
        # tunnel artifact, not solver time — PERF.md "Round-5" item 3)
        packed_h = solver.pack_flat(b)
        run(packed_h)  # settle
        d_samples_h = []
        for i in range(6):
            bb = packed_h * (1.0 + 1e-6 * (i + 1))  # distinct, on-device
            t0 = time.perf_counter()
            run(bb)
            d_samples_h.append(time.perf_counter() - t0)
        record["value_device_s"] = round(float(np.median(d_samples_h)), 4)
        record["value_device_min_s"] = round(min(d_samples_h), 4)

    if backend == "tpu":
        # k=1000: the reference's own headline tradeoff row (BASELINE.md:10,
        # two-pass 13.86 s at k=1000 on this exact instance) — its WORST
        # case, since its per-step cost is constant while the fused kernel
        # amortizes dispatch over all k steps. Same solver, same rep; only
        # the loop length changes.
        try:
            ref_k1000_s = 13.86  # reference two-pass @ k=1000 (BASELINE.md)

            def run_k1000(bb):
                x_rep, _ = solver.solve(bb, k=1000, f="inv", raw=True)
                return float(jnp.sum(x_rep * x_rep))

            run_k1000(sample_input(-1))  # compile
            k1_samples = []
            for i in range(4):
                bb = sample_input(i)
                t0 = time.perf_counter()
                run_k1000(bb)
                k1_samples.append(time.perf_counter() - t0)
            t_k1 = float(np.median(k1_samples))
            record.update(
                k1000_wallclock_s=round(t_k1, 4),
                k1000_vs_baseline=round(ref_k1000_s / t_k1, 2),
                k1000_min_s=round(min(k1_samples), 4),
            )
        except Exception as e:  # noqa: BLE001 — extra legs must not kill bench
            record["k1000_error"] = str(e)[:200]

        # BASELINE.md per-chip SpMV metric, re-measured every round on the
        # HBM-streaming path (the metric's domain — see PERF.md "Speed-of-
        # light accounting"; the resident fused path above retires it).
        try:
            from two_pass_lanczos_tpu.utils.sol_bench import (
                measure_streaming_matvec,
            )

            per, sol_layout, sol_ideal, _ = measure_streaming_matvec(
                arcs, rho=rho, reps=3, windowed=True)
            record.update(
                spmv_us_per_matvec=round(per * 1e6, 1),
                spmv_gnnz_per_s=round(sol_layout.achieved_nnz_per_s / 1e9, 2),
                spmv_sol_fraction_layout=round(sol_layout.sol_fraction, 3),
                spmv_sol_fraction_ideal=round(sol_ideal.sol_fraction, 3),
            )
        except Exception as e:  # noqa: BLE001 — SoL stats must not kill bench
            record["spmv_sol_error"] = str(e)[:200]

        # f64-class double-float fused solve: same instance/k, the accuracy
        # the reference only reaches on its CPU f64 path (REPORT.md §10)
        try:
            from two_pass_lanczos_tpu.ops.kkt_fused_df import DFFusedKKTSolver

            dfs = DFFusedKKTSolver(inst.quad_costs, inst.arc_u, inst.arc_v, p)
            b64 = rng.standard_normal(n)
            dfs.solve(b64, k=k, f="inv")  # compile
            df_samples = []
            for i in range(5):
                bb64 = b64 * (1.0 + 1e-9 * (i + 1))  # defeat result caching
                t0 = time.perf_counter()
                dfs.solve(bb64, k=k, f="inv")
                df_samples.append(time.perf_counter() - t0)
            t_df = float(np.median(df_samples))
            record.update(
                df_fused_wallclock_s=round(t_df, 4),
                df_fused_vs_reference_f64=round(ref_time_s / t_df, 2),
                df_fused_wallclock_min_s=round(min(df_samples), 4),
            )
        except Exception as e:  # noqa: BLE001
            record["df_fused_error"] = str(e)[:200]

        # Beyond-VMEM streaming tier (VERDICT r4 missing #3): a FULL
        # two-pass inv solve at 5M arcs through the 1-device-mesh
        # streaming path (``parallel/fused_sharded.py`` — the grid-blocked
        # matvec kernel), re-measured every round so a regression there is
        # visible in BENCH_r*.json. Mirrors the reference's full-size-range
        # scalability coverage (``src/bin/scalability.rs:36``).
        try:
            from two_pass_lanczos_tpu.parallel import (
                ShardedFusedKKTSolver,
                make_mesh,
            )

            arcs_s, k_s = 5_000_000, 100
            inst_s = generate_mcf_instance(arcs_s, rho=rho, instance_id=1)
            n_s = inst_s.num_arcs + inst_s.num_nodes
            sh = ShardedFusedKKTSolver(
                inst_s.quad_costs.astype(np.float32), inst_s.arc_u,
                inst_s.arc_v, inst_s.num_nodes, make_mesh(1))
            b_s = rng.standard_normal(n_s).astype(np.float32)

            def run_s(bb):
                (xu, xn), _dec = sh.solve(bb, k=k_s, f="inv", raw=True)
                return float(jnp.sum(xu * xu) + jnp.sum(xn * xn))

            run_s(b_s)  # compile
            s_samples = []
            for i in range(4):
                bb = b_s * (1.0 + 1e-6 * (i + 1))
                t0 = time.perf_counter()
                run_s(bb)
                s_samples.append(time.perf_counter() - t0)
            t_s = float(np.median(s_samples))
            # device-resident leg: pre-packed (bu, bv, bn) — skips the
            # host scatter + three ~22 MB tunnel uploads (~1.2 s at 5M,
            # an environment artifact that vanishes on attached hardware);
            # this is the number the per-matvec upper bound comes from
            packed_s = sh.pack(b_s)
            run_s(packed_s)  # transfer settle
            d_samples = []
            for _ in range(4):
                t0 = time.perf_counter()
                run_s(packed_s)
                d_samples.append(time.perf_counter() - t0)
            t_d = float(np.median(d_samples))
            record.update(
                streaming_solve_wallclock_s=round(t_s, 4),
                streaming_solve_device_s=round(t_d, 4),
                streaming_solve_arcs=arcs_s,
                streaming_solve_k=k_s,
                # the streaming solve is matvec-dominated: 2k matvecs
                # (pass one + replay) bound the per-matvec cost from above
                streaming_us_per_matvec_upper=round(t_d / (2 * k_s) * 1e6, 1),
                streaming_solve_min_s=round(min(s_samples), 4),
                streaming_solve_device_min_s=round(min(d_samples), 4),
            )
        except Exception as e:  # noqa: BLE001
            record["streaming_solve_error"] = str(e)[:200]

    watchdog.cancel()
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
