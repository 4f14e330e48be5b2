"""On-chip f32 smoke of the capability layer (run on the real TPU).

One serialized TPU client; each block prints PASS/FAIL + wall time.
Validates that the new modules' device paths (batched eigh, device QR,
fori_loop-with-eigh restart cycle, chebyshev scan, selective-reorth cond)
compile and produce sane numbers on real hardware — CPU tests cover the
math, this covers the lowering.

Usage: python scripts/probe/capability_smoke.py [--any-backend]
           [--output results/capability_onchip.json]

``--output`` writes the committed machine-readable artifact pinned by
``tests/test_results_integrity.py`` (VERDICT r4 item 6: REPORT §13's
"validated on hardware" claim must have a re-runnable committed proof).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

RECORDS = []


def check(name, fn):
    t0 = time.time()
    try:
        detail = fn()
        wall = time.time() - t0
        print(f"PASS {name:34s} {wall:7.2f}s  {detail}", flush=True)
        RECORDS.append({"name": name, "pass": True,
                        "wall_s": round(wall, 2), "detail": str(detail)})
        return True
    except Exception as e:  # noqa: BLE001 — smoke harness reports all
        wall = time.time() - t0
        print(f"FAIL {name:34s} {wall:7.2f}s  {type(e).__name__}: {e}",
              flush=True)
        RECORDS.append({"name": name, "pass": False,
                        "wall_s": round(wall, 2),
                        "detail": f"{type(e).__name__}: {e}"})
        return False


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if "--any-backend" in argv:  # CPU dry-run of the harness itself
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    import two_pass_lanczos_tpu as tpl

    if "--any-backend" not in argv:
        assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    n = 4096
    d_np = np.linspace(1.0, 10.0, n)
    d = jnp.asarray(d_np, jnp.float32)
    op = tpl.DiagonalOperator(d)
    b_np = rng.standard_normal(n).astype(np.float32)
    b = jnp.asarray(b_np)

    def slq():
        res = tpl.slq_trace(op, "inv", k=30, num_probes=8,
                            key=jax.random.key(1))
        truth = float(np.sum(1.0 / d_np))
        rel = abs(float(res.estimate) - truth) / truth
        assert rel < 0.05, rel
        return f"tr(A^-1) rel={rel:.2e}"

    def dos():
        grid = np.linspace(0.0, 11.0, 111)
        phi = np.asarray(tpl.slq_spectral_density(
            op, grid, sigma=0.3, k=24, num_probes=8, key=jax.random.key(2)))
        mass = float(np.sum(phi) * (grid[1] - grid[0]))
        assert abs(mass - 1.0) < 0.05, mass
        return f"DOS mass={mass:.4f}"

    def eig():
        res = tpl.eigsh(op, nev=4, which="LA", tol=1e-4, maxiter=60)
        err = abs(res.eigenvalues[-1] - d_np.max()) / d_np.max()
        assert res.converged and err < 1e-3, (res.converged, err)
        return f"lam_max rel={err:.2e} restarts={res.restarts}"

    def cheb():
        x = tpl.chebyshev_fAb(op, b, "exp", degree=40,
                              interval=(1.0, 10.0))
        truth = np.exp(d_np) * b_np
        rel = float(np.linalg.norm(np.asarray(x, np.float64) - truth)
                    / np.linalg.norm(truth))
        assert rel < 1e-4, rel
        return f"exp(A)b rel={rel:.2e}"

    def block():
        B = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
        x = tpl.solve_fAb_block(op, B, 30, "inv")
        truth = np.asarray(B, np.float64) / d_np[:, None]
        rel = float(np.linalg.norm(np.asarray(x, np.float64) - truth)
                    / np.linalg.norm(truth))
        assert rel < 1e-3, rel
        return f"f(A)B rel={rel:.2e}"

    def selective():
        x = tpl.solve_fAb(op, b, k=60, f="inv", method="one_pass",
                          reorth="selective")
        rel = float(np.linalg.norm(np.asarray(x, np.float64)
                                   - b_np / d_np)
                    / np.linalg.norm(b_np / d_np))
        assert rel < 1e-3, rel
        return f"selective f(A)b rel={rel:.2e}"

    def radau():
        dec = tpl.lanczos_pass_one(op, b, 40)
        lo, hi = tpl.gauss_radau_bracket(dec, lambda_min=1.0)
        truth = float(b_np @ (b_np / d_np))
        assert lo <= truth * 1.01 and hi >= truth * 0.99, (lo, truth, hi)
        return f"bracket width={(hi - lo):.3e}"

    def block_jit():
        B = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
        x = jax.jit(lambda bb: tpl.solve_fAb_block_jit(
            op, bb, k=30, f="inv"))(B)
        truth = np.asarray(B, np.float64) / d_np[:, None]
        rel = float(np.linalg.norm(np.asarray(x, np.float64) - truth)
                    / np.linalg.norm(truth))
        assert rel < 1e-2, rel  # projected solve in f32 on chip
        return f"jitted f(A)B rel={rel:.2e}"

    def fused_slq():
        # the production-kernel SLQ path on a real KKT instance
        from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver

        m_arcs, p_nodes = 50_000, 1000
        u = rng.integers(0, p_nodes, m_arcs).astype(np.int32)
        v = ((u + 1 + rng.integers(0, p_nodes - 1, m_arcs))
             % p_nodes).astype(np.int32)
        dd = rng.uniform(1.0, 3.0, m_arcs).astype(np.float32)
        interp = "--any-backend" in argv
        s = FusedKKTSolver(dd, u, v, p_nodes, interpret=interp)
        res = s.slq_trace(lambda t: t * t, k=10, num_probes=8,
                          key=jax.random.key(5))
        truth = float(np.sum(dd.astype(np.float64) ** 2) + 4 * m_arcs)
        rel = abs(float(res.estimate) - truth) / truth
        assert rel < 0.15, rel
        return f"fused tr(A^2) rel={rel:.2e} ({m_arcs} arcs)"

    results = [
        check("slq_trace (batched eigh)", slq),
        check("slq_spectral_density", dos),
        check("eigsh (restart cycle)", eig),
        check("chebyshev_fAb (scan)", cheb),
        check("solve_fAb_block (device QR)", block),
        check("reorth='selective' (cond)", selective),
        check("gauss_radau_bracket", radau),
        check("solve_fAb_block_jit (padded eigh)", block_jit),
        check("FusedKKTSolver.slq_trace (kernel)", fused_slq),
    ]
    print(f"{sum(results)}/{len(results)} capability smokes passed on "
          f"{jax.devices()[0].device_kind}", flush=True)
    if "--output" in argv:
        out = Path(argv[argv.index("--output") + 1])
        out.write_text(json.dumps({
            "device_kind": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
            "date": time.strftime("%Y-%m-%d"),
            "blocks": RECORDS,
        }, indent=1) + "\n")
        print(f"wrote {out}", flush=True)
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
