"""Manual double-buffered streaming matvec: does hand-managed DMA overlap
beat Mosaic's automatic grid pipeline?

The stream_overlap probe proved the automatic pipeline ADDITIVE: even pure
in-register FMA compute adds linearly on top of the 426 us stream floor at
5M arcs — the kernel body never overlaps the revolving-buffer DMAs. This
probe re-implements the same matvec as ONE kernel invocation (grid=(1,))
that owns the pipeline explicitly (the pallas guide's double-buffering
pattern): arc planes live in HBM (memory_space=ANY), the body starts the
chunk-(j+1) DMAs into slot (j+1)%2 BEFORE computing chunk j from slot j%2,
and output chunks fly back to HBM on their own semaphore pair.

Outcomes:
  * manual full-matvec ~ max(DMA, compute) ~ 450-550 us  -> overlap works;
    port this pipeline into ops/kkt_fused.kkt_streaming_matvec (~1.4x).
  * manual still additive -> the serialization is engine-level (DMA and
    VPU contend for VMEM bandwidth on this chip); write the proof into
    PERF.md — max(DMA, compute) is unreachable, the additive split is the
    wall.

Usage: python scripts/probe/stream_manual.py [ARCS] [modes...]
Modes: grid_full grid_stream man_full man_stream man_alu<N>
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
    _window_gather, kkt_streaming_matvec)

arcs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
modes = sys.argv[2:] or ["grid_full", "grid_stream", "man_stream", "man_full"]

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
b = rng.standard_normal(m + p).astype(np.float32)
b /= np.linalg.norm(b)
xu = np.zeros((lay.u.R, LANE), np.float32); xu.reshape(-1)[lay.u.pos] = b[:m]
xv = np.zeros((lay.v.R, LANE), np.float32); xv.reshape(-1)[lay.v.pos] = b[:m]
xn0 = np.zeros((lay.P2, LANE), np.float32); xn0.reshape(-1)[:p] = b[m:]
xuj, xvj, xnj = jnp.asarray(xu), jnp.asarray(xv), jnp.asarray(xn0)
C = lay.u.C
R = lay.u.R


def man_kernel(du, esu, eou, gnu, dv, esv, eov, gnv, xu_h, xv_h, xn,
               winu, winv, yu_h, yv_h, yn,
               f32s, i16s, outs, acc, in_sems, out_sems,
               *, p_hi, wg_u, wg_v, e_scale, mode, alu):
    """grid=(1,): explicit two-slot pipeline over C chunks.

    f32s (2,4,CHUNK,LANE) f32: [du dv xu xv]; i16s same for [esu eou esv
    eov]; outs (2,2,CHUNK,LANE) f32 [yu yv]. The tiny gn metadata planes
    ((C,128,4) i32, <1 MB real bytes) ride as ordinary full-VMEM operands —
    a manual (1,128,4) HBM slice violates Mosaic's 128-lane DMA alignment.
    in_sems DMA((2,)): one lane per slot, 8 copies signal it, 8 waits
    drain it. out_sems DMA((2,)): 2 copies per slot.
    """
    f32_src = (du, dv, xu_h, xv_h)
    i16_src = (esu, eou, esv, eov)

    def start_in(j, slot):
        r = pl.ds(j * CHUNK, CHUNK)
        for i, s in enumerate(f32_src):
            pltpu.make_async_copy(s.at[r], f32s.at[slot, i],
                                  in_sems.at[slot]).start()
        for i, s in enumerate(i16_src):
            pltpu.make_async_copy(s.at[r], i16s.at[slot, i],
                                  in_sems.at[slot]).start()

    def wait_in(j, slot):
        r = pl.ds(j * CHUNK, CHUNK)
        for i, s in enumerate(f32_src):
            pltpu.make_async_copy(s.at[r], f32s.at[slot, i],
                                  in_sems.at[slot]).wait()
        for i, s in enumerate(i16_src):
            pltpu.make_async_copy(s.at[r], i16s.at[slot, i],
                                  in_sems.at[slot]).wait()

    def start_out(j, slot):
        r = pl.ds(j * CHUNK, CHUNK)
        pltpu.make_async_copy(outs.at[slot, 0], yu_h.at[r],
                              out_sems.at[slot]).start()
        pltpu.make_async_copy(outs.at[slot, 1], yv_h.at[r],
                              out_sems.at[slot]).start()

    def wait_out(j, slot):
        r = pl.ds(j * CHUNK, CHUNK)
        pltpu.make_async_copy(outs.at[slot, 0], yu_h.at[r],
                              out_sems.at[slot]).wait()
        pltpu.make_async_copy(outs.at[slot, 1], yv_h.at[r],
                              out_sems.at[slot]).wait()

    acc[:] = jnp.zeros(acc.shape, jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)
    start_in(0, 0)

    def body(j, _):
        slot = lax.rem(j, 2)

        @pl.when(j + 1 < C)
        def _():
            start_in(j + 1, 1 - slot)

        wait_in(j, slot)

        # output slot reuse: wait for the copy launched at j-2
        @pl.when(j >= 2)
        def _():
            wait_out(j - 2, slot)

        for o, (fi_d, fi_x, ii_es, ii_eo, gn_ref, win_ref, sign, wg) in enumerate((
                (0, 2, 0, 1, gnu, winu, e_scale, wg_u),
                (1, 3, 2, 3, gnv, winv, -e_scale, wg_v))):
            x2 = f32s[slot, fi_x]
            d = f32s[slot, fi_d]
            if mode in ("stream", "tiny"):
                y = d * x2 + sign * 1e-30 * (
                    i16s[slot, ii_es].astype(jnp.float32)
                    + i16s[slot, ii_eo].astype(jnp.float32))
                if alu and mode == "tiny":
                    # single-vreg (8,128) carry: cannot spill to VMEM, so
                    # this is genuinely VMEM-traffic-free ALU work
                    t = lax.fori_loop(
                        0, alu, lambda i, t: t * 1.0000001 + 0.25, x2[:8])
                    y = y + 1e-30 * jnp.sum(t, axis=0, keepdims=True)
                elif alu:
                    t = lax.fori_loop(0, alu, lambda i, t: t * 1.0000001 + 0.25,
                                      x2)
                    y = y + 1e-30 * t
                outs[slot, o] = y
                continue
            es = i16s[slot, ii_es].astype(jnp.int32)
            eo = i16s[slot, ii_eo].astype(jnp.int32)
            r0 = win_ref[j]
            gnrb = gn_ref[pl.ds(j, 1)][0]
            g_s = _window_gather(xn, es, r0, 2)
            if wg:
                g_o = _rowwise_window_gather(xn, eo, gnrb[:, 1:2], wg)
            else:
                g_o = _window_gather(xn, eo, 0, p_hi)
            outs[slot, o] = d * x2 + sign * (g_s - g_o)
            rs = jnp.sum(x2, axis=1, keepdims=True)
            gn = gnrb[:, 0:1]
            s_lo = jnp.sum(jnp.where(gn == lanes, rs, 0.0), axis=0,
                           keepdims=True)
            s_hi = jnp.sum(jnp.where(gn - LANE == lanes, rs, 0.0), axis=0,
                           keepdims=True)
            acc[pl.ds(r0, 1), :] = acc[pl.ds(r0, 1), :] + sign * s_lo
            acc[pl.ds(r0 + 1, 1), :] = acc[pl.ds(r0 + 1, 1), :] + sign * s_hi

        start_out(j, slot)
        return 0

    lax.fori_loop(0, C, body, 0)
    # drain the last two output copies
    @pl.when(C >= 2)
    def _():
        wait_out(C - 2, lax.rem(C - 2, 2))
    wait_out(C - 1, lax.rem(C - 1, 2))
    yn[:] = acc[:]


def build_manual(mode, alu=0):
    anyb = lambda: pl.BlockSpec(memory_space=pl.ANY)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    # gn planes (indices 3, 7) are full-VMEM operands; the big planes ANY
    specs = [anyb(), anyb(), anyb(), vm, anyb(), anyb(), anyb(), vm]
    return pl.pallas_call(
        functools.partial(man_kernel, p_hi=lay.p_hi, wg_u=lay.u.wg,
                          wg_v=lay.v.wg, e_scale=float(sc), mode=mode,
                          alu=alu),
        in_specs=specs + [anyb(), anyb(), vm, sm, sm],
        out_specs=[anyb(), anyb(), vm],
        out_shape=[
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((lay.P2, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4, CHUNK, LANE), jnp.float32),
            pltpu.VMEM((2, 4, CHUNK, LANE), jnp.int16),
            pltpu.VMEM((2, 2, CHUNK, LANE), jnp.float32),
            pltpu.VMEM((lay.P2, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )


def measure(call3):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(xu, xv, xn, *, iters):
        def body(_, st):
            return call3(st[0], st[1], st[2])
        xu, xv, xn = lax.fori_loop(0, iters, body, (xu, xv, xn))
        return jnp.sum(xn) + jnp.sum(xu[:1])

    lo, hi = 16, 16 + max(int(0.04 / (arcs * 1.6e-10)), 48)

    def sample(n):
        t0 = time.perf_counter()
        float(chain(xuj, xvj, xnj, iters=n))
        return time.perf_counter() - t0

    sample(lo), sample(hi)
    tlo = min(sample(lo) for _ in range(4))
    thi = min(sample(hi) for _ in range(4))
    return (thi - tlo) / (hi - lo)


# correctness gate: the manual pipeline must reproduce the grid kernel
if any(m.startswith("man_full") for m in modes) or "check" in modes:
    g = kkt_streaming_matvec(arrs, wins, xuj, xvj, xnj, p_hi=lay.p_hi,
                             c_chunks=C, p2=lay.P2, wg_u=lay.u.wg,
                             wg_v=lay.v.wg, e_scale=float(sc))
    mn = build_manual("full")(*arrs, xuj, xvj, xnj, *wins)
    for name, a_, b_ in (("yu", g[0], mn[0]), ("yv", g[1], mn[1]),
                         ("yn", g[2], mn[2])):
        d = float(jnp.max(jnp.abs(a_ - b_)))
        print(f"check {name}: max|grid-manual| = {d:.3e}", flush=True)
        assert d < 1e-6, f"manual pipeline diverges on {name}"

for mode in modes:
    if mode == "grid_full":
        fn = lambda a, bb, c: kkt_streaming_matvec(
            arrs, wins, a, bb, c, p_hi=lay.p_hi, c_chunks=C, p2=lay.P2,
            wg_u=lay.u.wg, wg_v=lay.v.wg, e_scale=float(sc))
        t = measure(fn)
    elif mode == "grid_stream":
        continue  # covered by stream_overlap.py
    else:
        alu = 0
        if mode.startswith("man_tiny"):
            alu = int(mode[8:])
            kind = "tiny"
        elif mode.startswith("man_alu"):
            alu = int(mode[7:])
            kind = "stream"
        else:
            kind = "stream" if mode == "man_stream" else "full"
        call = build_manual(kind, alu)
        fn = lambda a, bb, c, call=call: call(*arrs, a, bb, c, *wins)
        t = measure(fn)
    print(f"{mode:12s}: {t*1e6:8.1f} us/matvec", flush=True)
