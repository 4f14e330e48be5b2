"""Probe Mosaic lowering + speed of candidate gather/load primitives on the
real chip (round-3 exploration for the streaming-SpMV layout compression —
VERDICT r2 item 1).

Probes:
  sublane   -- take_along_axis(axis=0) (sublane dynamic gather): correctness
  twostep   -- two-step gather xn[hi[r,l], lo[r,l]] via precomputed H plane
  int16     -- (CHUNK,LANE) int16/int8 plane load + widen to int32
  time      -- relative timing of full-loop vs windowed vs two-step gather
               at streaming-kernel-like shapes

Usage: python scripts/probe_gather.py [probe ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
CHUNK = 128
VMEM_LIMIT = 128 * 1024 * 1024
CP = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def probe_sublane():
    """out[i, l] = xn[idx[i, l], l] — axis-0 take_along."""
    p2, rows = 32, CHUNK

    def kern(xn_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(xn_ref[:], idx_ref[:], axis=0)

    xn = np.arange(p2 * LANE, dtype=np.float32).reshape(p2, LANE)
    idx = np.random.default_rng(0).integers(0, p2, (rows, LANE)).astype(np.int32)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            compiler_params=CP,
        )(jnp.asarray(xn), jnp.asarray(idx))
        want = np.take_along_axis(xn, idx, axis=0)
        ok = np.array_equal(np.asarray(out), want)
        print(f"sublane take_along axis=0: LOWERS, correct={ok}")
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"sublane take_along axis=0: FAILS: {str(e)[:300]}")
        return False


def probe_twostep():
    """g[r,l] = xn[hi[r,l], lo[r,l]] via
    take_along(take_along(xn, H, axis=0), lo, axis=1), H[r,l]=hi[r,lo[r,l]]."""
    p2, rows = 32, CHUNK
    rng = np.random.default_rng(1)
    xn = rng.standard_normal((p2, LANE)).astype(np.float32)
    e = rng.integers(0, p2 * LANE, (rows, LANE)).astype(np.int32)
    hi, lo = e >> 7, e & (LANE - 1)
    H = np.take_along_axis(hi, lo, axis=1)  # host precompute

    def kern(xn_ref, h_ref, lo_ref, o_ref):
        t = jnp.take_along_axis(xn_ref[:], h_ref[:], axis=0)
        o_ref[:] = jnp.take_along_axis(t, lo_ref[:], axis=1)

    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            compiler_params=CP,
        )(jnp.asarray(xn), jnp.asarray(H), jnp.asarray(lo))
        want = xn[hi, lo]
        ok = np.allclose(np.asarray(out), want)
        print(f"two-step gather: LOWERS, correct={ok}")
        return ok
    except Exception as e:  # noqa: BLE001
        print(f"two-step gather: FAILS: {str(e)[:300]}")
        return False


def probe_int16():
    for dt in (jnp.int16, jnp.int8, jnp.uint8):
        def kern(a_ref, o_ref, dt=dt):
            o_ref[:] = a_ref[:].astype(jnp.int32) + 1

        a = np.arange(CHUNK * LANE, dtype=np.int32).reshape(CHUNK, LANE)
        lim = np.iinfo(np.dtype(dt.dtype if hasattr(dt, "dtype") else dt)).max
        a = (a % lim).astype(dt)
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((CHUNK, LANE), jnp.int32),
                compiler_params=CP,
            )(jnp.asarray(a))
            ok = np.array_equal(np.asarray(out), a.astype(np.int32) + 1)
            print(f"{np.dtype(dt).name} plane load+widen: LOWERS, correct={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"{np.dtype(dt).name} plane load+widen: FAILS: {str(e)[:200]}")


def _timed(fn, *args, reps=5, lo=20, hi=120):
    fn(*args, iters=lo)
    fn(*args, iters=hi)

    def sample(n):
        t0 = time.perf_counter()
        float(fn(*args, iters=n))
        return time.perf_counter() - t0

    t_lo = min(sample(lo) for _ in range(reps))
    t_hi = min(sample(hi) for _ in range(reps))
    return (t_hi - t_lo) / (hi - lo)


def probe_time():
    """Gather-only kernels at streaming-like shape: C chunks of (128,128)
    endpoints gathered from a (p2,128) table; compares full-loop, windowed
    (wg=5 MXU one-hot), and two-step take_along."""
    p_hi, wg = 29, 5
    p2 = p_hi + 1
    C = 336  # ~5M-arc scale per ordering
    rng = np.random.default_rng(2)
    xn = rng.standard_normal((p2, LANE)).astype(np.float32)
    # per-row base in [0, p_hi-wg); endpoints within [base*128, base*128+wg*128)
    base = rng.integers(0, p_hi - wg, (C, CHUNK)).astype(np.int32)
    off = rng.integers(0, wg * LANE, (C, CHUNK, LANE)).astype(np.int32)
    e = base[..., None] * LANE + off  # (C,128,128) absolute endpoint
    hi_, lo_ = e >> 7, e & (LANE - 1)
    H = np.take_along_axis(hi_.reshape(C * CHUNK, LANE),
                           lo_.reshape(C * CHUNK, LANE), axis=1)
    e2 = e.reshape(C * CHUNK, LANE)
    lo2 = lo_.reshape(C * CHUNK, LANE)

    def mk(kernel, *arrs, extra_specs):
        blk = lambda r=CHUNK: pl.BlockSpec((r, LANE), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)
        full = pl.BlockSpec((p2, LANE), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel, grid=(C,),
            in_specs=[full] + extra_specs,
            out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct((C * CHUNK, LANE), jnp.float32),
            compiler_params=CP,
        )

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(*a, iters):
            def body(_, acc):
                return acc + jnp.sum(call(*a))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return run

    blkspec = lambda: pl.BlockSpec((CHUNK, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, CHUNK), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def k_full(xn_ref, e_ref, o_ref):
        ee = e_ref[:]
        lo = ee & (LANE - 1)
        hi = ee >> 7
        g = jnp.zeros(ee.shape, jnp.float32)
        for t in range(p_hi):
            row = xn_ref[pl.ds(t, 1), :]
            picked = jnp.take_along_axis(
                jnp.broadcast_to(row, ee.shape), lo, axis=1)
            g = jnp.where(hi == t, picked, g)
        o_ref[:] = g

    def k_win(xn_ref, e_ref, b_ref, o_ref):
        ee = e_ref[:]
        lo = ee & (LANE - 1)
        hi = ee >> 7
        rb = b_ref[0][:, None]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, p2), 1)
        xnv = xn_ref[:]
        g = jnp.zeros(ee.shape, jnp.float32)
        for t in range(wg):
            ridx = rb + t
            oh = (ridx == rows_iota).astype(jnp.float32)
            tsel = jax.lax.dot_general(
                oh, xnv, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            picked = jnp.take_along_axis(tsel, lo, axis=1)
            g = jnp.where(hi == ridx, picked, g)
        o_ref[:] = g

    def k_two(xn_ref, h_ref, lo_ref, o_ref):
        t = jnp.take_along_axis(xn_ref[:], h_ref[:], axis=0)
        o_ref[:] = jnp.take_along_axis(t, lo_ref[:], axis=1)

    runs = {}
    runs["full_loop"] = (mk(k_full, extra_specs=[blkspec()]),
                         (jnp.asarray(xn), jnp.asarray(e2)))
    runs["windowed"] = (mk(k_win, extra_specs=[blkspec(), bspec]),
                        (jnp.asarray(xn), jnp.asarray(e2), jnp.asarray(base)))
    try:
        r = mk(k_two, extra_specs=[blkspec(), blkspec()])
        float(r(jnp.asarray(xn), jnp.asarray(H), jnp.asarray(lo2), iters=1))
        runs["two_step"] = (r, (jnp.asarray(xn), jnp.asarray(H),
                                jnp.asarray(lo2)))
    except Exception as ex:  # noqa: BLE001
        print(f"two_step: does not lower: {str(ex)[:200]}")

    for name, (run, args) in runs.items():
        per = _timed(run, *args)
        per_chunk_ns = per / C * 1e9
        print(f"{name}: {per*1e6:8.1f} us/call  {per_chunk_ns:7.1f} ns/chunk")


if __name__ == "__main__":
    which = sys.argv[1:] or ["sublane", "twostep", "int16", "time"]
    for w in which:
        globals()[f"probe_{w}"]()
