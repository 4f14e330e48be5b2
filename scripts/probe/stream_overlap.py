"""Does Mosaic overlap VPU compute with the grid-block DMA stream?

The round-3 stage split at 5M arcs is additive (428 us stream floor +
~335 us gather/scatter = 766 us full), which reads like a serialized
pipeline. Two hypotheses distinguish what to do about it:

  (A) Mosaic does not overlap compute with the revolving-buffer DMAs at
      all -> any compute adds linearly from the first cycle; a pipelining
      fix (bigger blocks, manual emit_pipeline) could reach
      max(DMA, compute) ~ 450-500 us.
  (B) DMA/VPU do overlap, but the gather's VMEM reads contend with the
      DMA writes for VMEM bandwidth -> pure-ALU compute hides under the
      stream (slope ~ 0 until ALU time ~ DMA time) while VMEM-heavy
      compute adds regardless; the op is VMEM-bandwidth-bound and no
      scheduling knob can reach max(DMA, compute).

Probe: the stream-only kernel (all 10 planes streamed, y = d*x) plus
  * ``alu N``   — N chained vector FMAs per chunk on an in-register tile
                  (no VMEM traffic beyond the stream itself);
  * ``gather G``— the production other-endpoint window gather executed G
                  times per chunk (VMEM reads of the resident node table),
                  folded into y at 1e-30.

Linear growth from the first ALU iteration => (A). Flat-then-linear ALU
but additive gather => (B). Run ONE at a time (tunnel deadlock rule).

Usage: python scripts/probe/stream_overlap.py [ARCS] [alu|gather|both]
"""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_pass_lanczos_tpu.models.generator import generate_mcf_instance
from two_pass_lanczos_tpu.ops.kkt_fused import (
    CHUNK, LANE, VMEM_LIMIT, SortedKKTLayout, _rowwise_window_gather,
    _window_gather)

arcs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
what = sys.argv[2] if len(sys.argv) > 2 else "both"

inst = generate_mcf_instance(arcs, rho=3, instance_id=1)
m, p = inst.num_arcs, inst.num_nodes
lay = SortedKKTLayout.build(inst.quad_costs.astype(np.float32) * 1e-3,
                            inst.arc_u, inst.arc_v, p, windowed=True)
arrs = tuple(jnp.asarray(a) for a in (
    lay.u.d2, lay.u.es2, lay.u.eo2, lay.u.gn3,
    lay.v.d2, lay.v.es2, lay.v.eo2, lay.v.gn3))
wins = (jnp.asarray(lay.u.win), jnp.asarray(lay.v.win))
rng = np.random.default_rng(0)
xu = jnp.asarray(rng.standard_normal((lay.u.R, LANE)).astype(np.float32) * 1e-3)
xv = jnp.asarray(rng.standard_normal((lay.v.R, LANE)).astype(np.float32) * 1e-3)
xn0 = np.zeros((lay.P2, LANE), np.float32)
xn0.reshape(-1)[:p] = rng.standard_normal(p) * 1e-3
xnj = jnp.asarray(xn0)


def kern(du, esu, eou, gnu, dv, esv, eov, gnv, xu_r, xv_r, xn_r,
         winu, winv, yu, yv, *, p_hi, wg_u, wg_v, alu, gathers):
    i = pl.program_id(0)
    for x_ref, y_ref, d_ref, es_ref, eo_ref, gn_ref, win_ref, wg in (
            (xu_r, yu, du, esu, eou, gnu, winu, wg_u),
            (xv_r, yv, dv, esv, eov, gnv, winv, wg_v)):
        x2 = x_ref[:]
        y = d_ref[:] * x2
        es = es_ref[:].astype(jnp.float32)
        eo32 = eo_ref[:].astype(jnp.int32)
        y = y + 1e-30 * (es + eo32.astype(jnp.float32))  # planes are live
        if alu:
            # chained vector FMAs on an in-register tile: no VMEM traffic
            def fma(j, t):
                return t * 1.0000001 + 0.25
            t = lax.fori_loop(0, alu, fma, x2)
            y = y + 1e-30 * t
        if gathers:
            gnrb = gn_ref[0]

            def g_once(j, t):
                if wg:
                    g = _rowwise_window_gather(xn_r, eo32 + j * 0,
                                               gnrb[:, 1:2], wg)
                else:
                    g = _window_gather(xn_r, eo32 + j * 0, 0, p_hi)
                return t + g
            t = lax.fori_loop(0, gathers, g_once,
                              jnp.zeros((CHUNK, LANE), jnp.float32))
            y = y + 1e-30 * t
        y_ref[:] = y


def build(alu, gathers):
    blk = lambda: pl.BlockSpec((CHUNK, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    gnb = lambda: pl.BlockSpec((1, CHUNK, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    full = pl.BlockSpec((lay.P2, LANE), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    r = lay.u.R
    return pl.pallas_call(
        functools.partial(kern, p_hi=lay.p_hi, wg_u=lay.u.wg, wg_v=lay.v.wg,
                          alu=alu, gathers=gathers),
        grid=(lay.u.C,),
        in_specs=[blk(), blk(), blk(), gnb(), blk(), blk(), blk(), gnb(),
                  blk(), blk(), full, sm, sm],
        out_specs=[blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct((r, LANE), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )


def measure(alu=0, gathers=0):
    call = build(alu, gathers)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(xu, xv, *, iters, call=call):
        def body(_, st):
            yu, yv = call(*arrs, st[0], st[1], xnj, *wins)
            return yu, yv
        yu, yv = lax.fori_loop(0, iters, body, (xu, xv))
        return jnp.sum(yu[:1]) + jnp.sum(yv[:1])

    lo, hi = 16, 16 + max(int(0.04 / (arcs * 1.6e-10)), 48)

    def sample(n):
        t0 = time.perf_counter()
        float(chain(xu, xv, iters=n))
        return time.perf_counter() - t0

    sample(lo), sample(hi)
    tlo = min(sample(lo) for _ in range(4))
    thi = min(sample(hi) for _ in range(4))
    return (thi - tlo) / (hi - lo)


base = measure()
print(f"stream_only            : {base*1e6:8.1f} us/matvec", flush=True)
if what in ("alu", "both"):
    for n in (8, 32, 128, 512):
        t = measure(alu=n)
        print(f"stream + alu x{n:<4d}     : {t*1e6:8.1f} us/matvec  "
              f"(+{(t-base)*1e6:7.1f})", flush=True)
if what in ("gather", "both"):
    for g in (1, 2, 3):
        t = measure(gathers=g)
        print(f"stream + gather x{g}     : {t*1e6:8.1f} us/matvec  "
              f"(+{(t-base)*1e6:7.1f})", flush=True)
