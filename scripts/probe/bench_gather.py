import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
LANE=CHUNK=128
CP = pltpu.CompilerParams(vmem_limit_bytes=128*1024*1024)
C = 336
rng = np.random.default_rng(2)

def bench(p_hi, wg):
    p2 = p_hi + 1
    nblk = (p2 + 7) // 8
    xn = rng.standard_normal((nblk*8, LANE)).astype(np.float32)
    xn[p_hi:] = 0.0
    base = rng.integers(0, max(p_hi - wg, 1), (C, CHUNK)).astype(np.int32)
    base3 = base[:, None, :]  # (C,1,128) so BlockSpec last-2 dims are legal
    off = rng.integers(0, wg * LANE, (C, CHUNK, LANE)).astype(np.int32)
    e = (base[..., None] * LANE + off).reshape(C*CHUNK, LANE)
    hi_, lo_ = (e >> 7).astype(np.int32), (e & 127).astype(np.int32)

    blk = lambda: pl.BlockSpec((CHUNK, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    fullspec = pl.BlockSpec((nblk*8, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def k_full(xn_ref, e_ref, o_ref):
        ee = e_ref[:]; lo = ee & 127; hi = ee >> 7
        g = jnp.zeros(ee.shape, jnp.float32)
        for t in range(p_hi):
            row = xn_ref[pl.ds(t,1), :]
            g = jnp.where(hi == t, jnp.take_along_axis(jnp.broadcast_to(row, ee.shape), lo, axis=1), g)
        o_ref[:] = g

    def k_win(xn_ref, e_ref, b_ref, o_ref):
        ee = e_ref[:]; lo = ee & 127; hi = ee >> 7
        rb = b_ref[0, 0][:, None]
        xnv = xn_ref[:]
        g = jnp.zeros(ee.shape, jnp.float32)
        for t in range(wg):
            ridx = rb + t
            oh = (ridx == jax.lax.broadcasted_iota(jnp.int32, (CHUNK, nblk*8), 1)).astype(jnp.float32)
            tsel = jax.lax.dot_general(oh, xnv, (((1,),(0,)),((),())),
                precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
            g = jnp.where(hi == ridx, jnp.take_along_axis(tsel, lo, axis=1), g)
        o_ref[:] = g

    def k_dg(xn_ref, h_ref, o_ref):
        for s in range(CHUNK // 8):
            sl = pl.ds(s*8, 8)
            hi8 = h_ref[sl, :]
            g = jnp.zeros((8, LANE), jnp.float32)
            for t in range(nblk):
                src = xn_ref[pl.ds(t*8, 8), :]
                idx = jnp.clip(hi8 - t*8, 0, 7)
                got = jnp.take_along_axis(src, idx, axis=0)
                g = jnp.where((hi8 >> 3) == t, got, g)
            o_ref[sl, :] = g

    def mk(kernel, specs):
        call = pl.pallas_call(kernel, grid=(C,), in_specs=[fullspec]+specs, out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct((C*CHUNK, LANE), jnp.float32), compiler_params=CP)
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(xn0, *a, iters):
            rows = xn0.shape[0]
            def body(_, xnc):
                g = call(xnc, *a)
                # feedback: next table depends on this call's output, so the
                # loop body cannot be hoisted as loop-invariant
                return xnc + 1e-30 * g[:rows]
            out = jax.lax.fori_loop(0, iters, body, xn0)
            return jnp.sum(out)
        return call, run

    def timed(run, *a, lo=20, hi=120, reps=5):
        float(run(*a, iters=lo)); float(run(*a, iters=hi))
        def s(n):
            t0=time.perf_counter(); float(run(*a, iters=n)); return time.perf_counter()-t0
        return (min(s(hi) for _ in range(reps)) - min(s(lo) for _ in range(reps)))/(hi-lo)

    xnj = jnp.asarray(xn)
    callf, runf = mk(k_full, [blk()])
    callw, runw = mk(k_win, [blk(), bspec])
    calld, rund = mk(k_dg, [blk()])
    outd = np.asarray(calld(xnj, jnp.asarray(hi_)))[:CHUNK]
    want = xn[hi_[:CHUNK], np.arange(LANE)[None, :]]
    ok = np.allclose(outd, want)
    tf = timed(runf, xnj, jnp.asarray(e))
    tw = timed(runw, xnj, jnp.asarray(e), jnp.asarray(base3))
    td = timed(rund, xnj, jnp.asarray(hi_))
    print(f"p_hi={p_hi}: full={tf*1e6:7.1f}us win={tw*1e6:7.1f}us stripdg={td*1e6:7.1f}us (dg correct={ok})", flush=True)

bench(10, 5)
bench(29, 5)
