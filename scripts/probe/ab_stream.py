"""Same-session A/B of v1 vs v2 STREAMING matvec (chained in-jit, e_scale
feedback), 500k or 5M arcs."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import sys, time, functools
import importlib.util
import numpy as np

arcs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
which = sys.argv[2] if len(sys.argv) > 2 else "both"

import jax, jax.numpy as jnp
from jax import lax
from two_pass_lanczos_tpu.models.generator import generate_mcf_instance

spec = importlib.util.spec_from_file_location(
    "kkt_fused_v1", "/root/repo/scripts/probe/kkt_fused_v1.py")
v1 = importlib.util.module_from_spec(spec)
sys.modules["kkt_fused_v1"] = v1
spec.loader.exec_module(v1)
import two_pass_lanczos_tpu.ops.kkt_fused as v2

inst = generate_mcf_instance(arcs, rho=3, instance_id=1)
m, p = inst.num_arcs, inst.num_nodes
deg = np.bincount(inst.arc_u, minlength=p) + np.bincount(inst.arc_v, minlength=p)
bound = max(float(inst.quad_costs.max()) + 2.0, float(deg.max()))
sc = 1.0 / bound
rng = np.random.default_rng(0)
b = rng.standard_normal(m + p).astype(np.float32); b /= np.linalg.norm(b)

def measure(mod, label):
    lay = mod.SortedKKTLayout.build((inst.quad_costs * sc).astype(np.float32),
                                    inst.arc_u, inst.arc_v, p, windowed=True)
    if label == "v1":
        arrs = tuple(jnp.asarray(a) for a in (
            lay.u.d2, lay.u.es2, lay.u.eo2, lay.u.gn3,
            lay.v.d2, lay.v.es2, lay.v.eo2, lay.v.gn3))
    else:  # hybrid: per-slot es+eo planes (int16 when they fit)
        arrs = tuple(jnp.asarray(a) for a in (
            lay.u.d2, lay.u.es2, lay.u.eo2, lay.u.gn3,
            lay.v.d2, lay.v.es2, lay.v.eo2, lay.v.gn3))
    wins = (jnp.asarray(lay.u.win), jnp.asarray(lay.v.win))
    xu = np.zeros((lay.u.R, 128), np.float32); xu.reshape(-1)[lay.u.pos] = b[:m]
    xv = np.zeros((lay.v.R, 128), np.float32); xv.reshape(-1)[lay.v.pos] = b[:m]
    xn = np.zeros((lay.P2, 128), np.float32); xn.reshape(-1)[:p] = b[m:]
    kw = dict(p_hi=lay.p_hi, c_chunks=lay.u.C, p2=lay.P2,
              wg_u=lay.u.wg, wg_v=lay.v.wg, e_scale=float(sc))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(xu, xv, xn, *, iters):
        def body(_, st):
            return mod.kkt_streaming_matvec(arrs, wins, *st, **kw)
        xu, xv, xn = lax.fori_loop(0, iters, body, (xu, xv, xn))
        return jnp.sum(xn)

    xuj, xvj, xnj = jnp.asarray(xu), jnp.asarray(xv), jnp.asarray(xn)
    lo = 32
    hi = lo + max(int(0.05 / (arcs * 2e-11)), 64)
    def sample(n):
        t0 = time.perf_counter(); float(chain(xuj, xvj, xnj, iters=n))
        return time.perf_counter() - t0
    sample(lo); sample(hi)
    tlo = min(sample(lo) for _ in range(4))
    thi = min(sample(hi) for _ in range(4))
    per = (thi - tlo) / (hi - lo)
    print(f"{label} arcs={arcs}: {per*1e6:.1f} us/matvec  wg_u={lay.u.wg} wg_v={lay.v.wg}", flush=True)
    return per

for lab in (["v1", "v2"] if which == "both" else [which]):
    measure(v1 if lab == "v1" else v2, lab)
