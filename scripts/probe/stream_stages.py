"""Stage-isolated streaming-matvec cost split (the VERDICT r3 gather-floor
proof): times the production streaming kernel with stages selectively
disabled, same chained-in-jit methodology as sol_bench.

Variants: full | no_go (other-endpoint gather replaced by zeros) |
no_gather (both gathers zero) | stream_only (y = d*x, no gather/scatter).
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_pass_lanczos_tpu.models.generator import generate_mcf_instance
from two_pass_lanczos_tpu.ops.kkt_fused import (
    CHUNK, LANE, VMEM_LIMIT, SortedKKTLayout, _rowwise_window_gather,
    _window_gather)

arcs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
variants = sys.argv[2:] or ["full", "no_go", "no_gather", "stream_only"]


def kern(du, esu, eou, gnu, dv, esv, eov, gnv, xu, xv, xn, winu, winv,
         yu, yv, yn, acc, *, p_hi, wg_u, wg_v, e_scale, mode):
    i = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    for x_ref, y_ref, d_ref, es_ref, eo_ref, gn_ref, win_ref, sign, wg in (
            (xu, yu, du, esu, eou, gnu, winu, e_scale, wg_u),
            (xv, yv, dv, esv, eov, gnv, winv, -e_scale, wg_v)):
        x2 = x_ref[:]
        es = es_ref[:].astype(jnp.int32)
        eo = eo_ref[:].astype(jnp.int32)
        r0 = win_ref[i]
        gnrb = gn_ref[0]
        if mode == "stream_only":
            y_ref[:] = d_ref[:] * x2 + sign * 1e-30 * (
                es.astype(jnp.float32) + eo.astype(jnp.float32))
            continue
        g_s = (_window_gather(xn, es, r0, 2) if mode != "no_gather"
               else 1e-30 * es.astype(jnp.float32))
        if mode in ("no_go", "no_gather"):
            g_o = 1e-30 * eo.astype(jnp.float32)
        elif wg:
            g_o = _rowwise_window_gather(xn, eo, gnrb[:, 1:2], wg)
        else:
            g_o = _window_gather(xn, eo, 0, p_hi)
        y_ref[:] = d_ref[:] * x2 + sign * (g_s - g_o)
        rs = jnp.sum(x2, axis=1, keepdims=True)
        gn = gnrb[:, 0:1]
        s_lo = jnp.sum(jnp.where(gn == lanes, rs, 0.0), axis=0, keepdims=True)
        s_hi = jnp.sum(jnp.where(gn - LANE == lanes, rs, 0.0), axis=0,
                       keepdims=True)
        acc[pl.ds(r0, 1), :] = acc[pl.ds(r0, 1), :] + sign * s_lo
        acc[pl.ds(r0 + 1, 1), :] = acc[pl.ds(r0 + 1, 1), :] + sign * s_hi

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        yn[:] = acc[:]


inst = generate_mcf_instance(arcs, rho=3, instance_id=1)
m, p = inst.num_arcs, inst.num_nodes
deg = np.bincount(inst.arc_u, minlength=p) + np.bincount(inst.arc_v, minlength=p)
sc = 1.0 / max(float(inst.quad_costs.max()) + 2.0, float(deg.max()))
lay = SortedKKTLayout.build((inst.quad_costs * sc).astype(np.float32),
                            inst.arc_u, inst.arc_v, p, windowed=True)
arrs = tuple(jnp.asarray(a) for a in (
    lay.u.d2, lay.u.es2, lay.u.eo2, lay.u.gn3,
    lay.v.d2, lay.v.es2, lay.v.eo2, lay.v.gn3))
wins = (jnp.asarray(lay.u.win), jnp.asarray(lay.v.win))
rng = np.random.default_rng(0)
b = rng.standard_normal(m + p).astype(np.float32); b /= np.linalg.norm(b)
xu = np.zeros((lay.u.R, LANE), np.float32); xu.reshape(-1)[lay.u.pos] = b[:m]
xv = np.zeros((lay.v.R, LANE), np.float32); xv.reshape(-1)[lay.v.pos] = b[:m]
xn0 = np.zeros((lay.P2, LANE), np.float32); xn0.reshape(-1)[:p] = b[m:]
xuj, xvj, xnj = jnp.asarray(xu), jnp.asarray(xv), jnp.asarray(xn0)

for mode in variants:
    r = lay.u.R
    blk = lambda: pl.BlockSpec((CHUNK, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    gnb = lambda: pl.BlockSpec((1, CHUNK, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    full = pl.BlockSpec((lay.P2, LANE), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        functools.partial(kern, p_hi=lay.p_hi, wg_u=lay.u.wg, wg_v=lay.v.wg,
                          e_scale=float(sc), mode=mode),
        grid=(lay.u.C,),
        in_specs=[blk(), blk(), blk(), gnb(), blk(), blk(), blk(), gnb(),
                  blk(), blk(), full, sm, sm],
        out_specs=[blk(), blk(), full],
        out_shape=[jax.ShapeDtypeStruct((r, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((r, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((lay.P2, LANE), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((lay.P2, LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(xu, xv, xn, *, iters, call=call):
        def body(_, st):
            return call(*arrs, *st, *wins)
        xu, xv, xn = lax.fori_loop(0, iters, body, (xu, xv, xn))
        return jnp.sum(xn) + jnp.sum(xu[:1])

    lo, hi = 32, 32 + max(int(0.05 / (arcs * 2e-11)), 64)
    def sample(n):
        t0 = time.perf_counter(); float(chain(xuj, xvj, xnj, iters=n))
        return time.perf_counter() - t0
    sample(lo); sample(hi)
    tlo = min(sample(lo) for _ in range(4))
    thi = min(sample(hi) for _ in range(4))
    per = (thi - tlo) / (hi - lo)
    print(f"{mode}: {per*1e6:8.1f} us/matvec", flush=True)
