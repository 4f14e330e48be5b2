"""Streaming-SpMV speed-of-light measurement (used by bench.py and
scripts/sol_bench.py). See PERF.md "Speed-of-light accounting" for the
methodology and recorded numbers."""

import time
from functools import partial


def measure_streaming_matvec(arcs: int, rho: int = 3, reps: int = 5,
                             lo: int = 64, hi: int = None,
                             windowed: bool = False, interpret: bool = False):
    """Return (seconds_per_matvec, SoLReport_layout, SoLReport_ideal, meta)\n    where ``meta`` is a dict of timing details (lo/hi trip counts, raw\n    times, padded-row count, pad ratio)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from two_pass_lanczos_tpu.models.generator import generate_mcf_instance
    from two_pass_lanczos_tpu.observability import kkt_spmv_sol, kkt_streaming_sol
    from two_pass_lanczos_tpu.ops.kkt_fused import (
        LANE,
        SortedKKTLayout,
        kkt_streaming_matvec,
    )

    inst = generate_mcf_instance(arcs, rho=rho, instance_id=1)
    m, p = inst.num_arcs, inst.num_nodes

    # Gershgorin row-sum bound on ||A||_inf: arc rows |d_i| + 2, node rows
    # = degree. rho(A) <= ||A||_inf for symmetric A.
    deg = np.bincount(inst.arc_u, minlength=p) + np.bincount(inst.arc_v, minlength=p)
    bound = max(float(inst.quad_costs.max()) + 2.0, float(deg.max()))
    s = 1.0 / bound

    lay = SortedKKTLayout.build(
        (inst.quad_costs * s).astype(np.float32), inst.arc_u, inst.arc_v, p,
        windowed=windowed)
    arrs = tuple(jnp.asarray(a) for a in (
        lay.u.d2, lay.u.es2, lay.u.eo2, lay.u.gn3,
        lay.v.d2, lay.v.es2, lay.v.eo2, lay.v.gn3))
    wins = (jnp.asarray(lay.u.win), jnp.asarray(lay.v.win))

    rng = np.random.default_rng(0)
    b = rng.standard_normal(m + p).astype(np.float32)
    b /= np.linalg.norm(b)
    xu = np.zeros((lay.u.R, LANE), np.float32)
    xv = np.zeros((lay.v.R, LANE), np.float32)
    xu.reshape(-1)[lay.u.pos] = b[:m]
    xv.reshape(-1)[lay.v.pos] = b[:m]
    xn = np.zeros((lay.P2, LANE), np.float32)
    xn.reshape(-1)[:p] = b[m:]
    xu, xv, xn = jnp.asarray(xu), jnp.asarray(xv), jnp.asarray(xn)

    kw = dict(p_hi=lay.p_hi, c_chunks=lay.u.C, p2=lay.P2,
              wg_u=lay.u.wg, wg_v=lay.v.wg, interpret=interpret,
              e_scale=float(s))

    @partial(jax.jit, static_argnames=("iters",))
    def chain(xu, xv, xn, *, iters):
        def body(_, st):
            return kkt_streaming_matvec(arrs, wins, *st, **kw)

        xu, xv, xn = lax.fori_loop(0, iters, body, (xu, xv, xn))
        return jnp.sum(xn)

    if hi is None:
        # target >= 50 ms of device work in the hi-lo delta at ~8 B/ns
        est = kkt_streaming_sol(lay, 1.0).sol_seconds  # SoL guess per matvec
        hi = lo + max(int(0.05 / max(est, 1e-6)), 64)

    def sample(iters):
        t0 = time.perf_counter()
        float(chain(xu, xv, xn, iters=iters))  # forced scalar readback
        return time.perf_counter() - t0

    sample(lo), sample(hi)  # compile both trip counts
    t_lo = min(sample(lo) for _ in range(reps))
    t_hi = min(sample(hi) for _ in range(reps))
    per_matvec = (t_hi - t_lo) / (hi - lo)

    return (per_matvec,
            kkt_streaming_sol(lay, per_matvec),
            kkt_spmv_sol(m, p, per_matvec),
            dict(lo=lo, hi=hi, t_lo=t_lo, t_hi=t_hi, R=lay.u.R + lay.v.R,
                 pad_ratio=(lay.u.R + lay.v.R) * LANE / (2 * m)))

