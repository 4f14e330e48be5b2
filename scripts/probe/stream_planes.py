"""Plane-merge A/B on the streaming DMA floor (VERDICT r4 item 2).

The round-3/4 analysis pinned a 428 µs zero-compute stream floor at 5M arcs
(~450 GB/s achieved vs 819 paper) and blamed "the 10-plane access pattern"
— without isolating it. This probe isolates exactly that lever at CONSTANT
BYTES: per ordering, the three big per-chunk input planes (d f32, x f32,
es/eo packed i16+i16) collapse into ONE interleaved i32 record array of
shape (C·3·CHUNK, LANE) — 12 B/slot either way — cutting the big DMA
descriptor streams per ordering from 4 to 1 (8 → 2 overall). If descriptor
count (not bytes) limits the achieved bandwidth, the merged floor drops
toward the 819 GB/s bound; if the floors match, plane count joins block
size as a measured non-limiter and the 428 µs floor is the wall.

Both variants run the SAME chaining protocol (xn-carry: the node plane is
the loop state; every iteration's kernel consumes the previous yn), so the
A/B is internally consistent — the production y→x chain cannot be used
because the merged record bakes x in. ``full`` adds the production gather/
scatter work on top of both layouts (same math as
``_matvec_streaming_kernel``), so a floor win can be checked end-to-end.

Run ONE at a time (tunnel deadlock rule):
    python scripts/probe/stream_planes.py [ARCS=5000000] [floor|full|both]
"""

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_pass_lanczos_tpu.models.generator import generate_mcf_instance
from two_pass_lanczos_tpu.ops.kkt_fused import (
    CHUNK,
    LANE,
    VMEM_LIMIT,
    SortedKKTLayout,
    _rowwise_window_gather,
    _window_gather,
)

arcs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
what = sys.argv[2] if len(sys.argv) > 2 else "both"
INTERPRET = jax.default_backend() != "tpu"  # CPU: correctness only

inst = generate_mcf_instance(arcs, rho=3, instance_id=1)
m, p = inst.num_arcs, inst.num_nodes
lay = SortedKKTLayout.build(inst.quad_costs.astype(np.float32) * 1e-3,
                            inst.arc_u, inst.arc_v, p, windowed=True)
rng = np.random.default_rng(0)


def _x_plane(o):
    x = np.zeros(o.R * LANE, np.float32)
    x[o.pos] = rng.standard_normal(len(o.pos)).astype(np.float32) * 1e-3
    return x.reshape(o.R, LANE)


XU, XV = _x_plane(lay.u), _x_plane(lay.v)
XN0 = np.zeros((lay.P2, LANE), np.float32)
XN0.reshape(-1)[:p] = rng.standard_normal(p) * 1e-3


def _record(o, xpl):
    """(C·3·CHUNK, LANE) i32: per chunk rows [0:128]=d (bitcast),
    [128:256]=x (bitcast), [256:384]=(es<<16)|eo — 12 B/slot, the same
    bytes the three separate planes stream."""
    c = o.R // CHUNK
    es32 = o.es2.astype(np.int32)
    eo32 = o.eo2.astype(np.int32)
    assert es32.max() < (1 << 15) and eo32.max() < (1 << 15), "16-bit pack"
    packed = (es32 << 16) | eo32
    rec = np.empty((c, 3 * CHUNK, LANE), np.int32)
    rec[:, 0:CHUNK] = o.d2.view(np.int32).reshape(c, CHUNK, LANE)
    rec[:, CHUNK:2 * CHUNK] = xpl.view(np.int32).reshape(c, CHUNK, LANE)
    rec[:, 2 * CHUNK:] = packed.reshape(c, CHUNK, LANE)
    return rec.reshape(c * 3 * CHUNK, LANE)


REC_U = jnp.asarray(_record(lay.u, XU))
REC_V = jnp.asarray(_record(lay.v, XV))
ARRS = tuple(jnp.asarray(a) for a in (
    lay.u.d2, lay.u.es2, lay.u.eo2, lay.u.gn3,
    lay.v.d2, lay.v.es2, lay.v.eo2, lay.v.gn3))
GNS = (jnp.asarray(lay.u.gn3), jnp.asarray(lay.v.gn3))
WINS = (jnp.asarray(lay.u.win), jnp.asarray(lay.v.win))
XUJ, XVJ, XNJ = jnp.asarray(XU), jnp.asarray(XV), jnp.asarray(XN0)


def _unpack(rec):
    d = lax.bitcast_convert_type(rec[0:CHUNK], jnp.float32)
    x2 = lax.bitcast_convert_type(rec[CHUNK:2 * CHUNK], jnp.float32)
    packed = rec[2 * CHUNK:]
    return d, x2, packed >> 16, packed & 0xFFFF


def _body(full, x2, d, es, eo, gnrb, win_ref, xn, acc, y_ref, sign,
          p_hi, wg, i, lanes):
    """Shared per-ordering body: floor = d·x (+1e-30 plane fold),
    full = the production gather/scatter math."""
    if full:
        r0 = win_ref[i]
        g_s = _window_gather(xn, es, r0, 2)
        if wg:
            g_o = _rowwise_window_gather(xn, eo, gnrb[:, 1:2], wg)
        else:
            g_o = _window_gather(xn, eo, 0, p_hi)
        y_ref[:] = d * x2 + sign * (g_s - g_o)
    else:
        y_ref[:] = (d * x2
                    + 1e-30 * (es + eo).astype(jnp.float32)
                    + 1e-30 * xn[0:1, :])
    rs = jnp.sum(x2, axis=1, keepdims=True)
    gn = gnrb[:, 0:1]
    r0 = win_ref[i]
    s_lo = jnp.sum(jnp.where(gn == lanes, rs, 0.0), axis=0, keepdims=True)
    s_hi = jnp.sum(jnp.where(gn - LANE == lanes, rs, 0.0), axis=0,
                   keepdims=True)
    acc[pl.ds(r0, 1), :] = acc[pl.ds(r0, 1), :] + sign * s_lo
    acc[pl.ds(r0 + 1, 1), :] = acc[pl.ds(r0 + 1, 1), :] + sign * s_hi


def _kern_multi(du, esu, eou, gnu, dv, esv, eov, gnv, xu_r, xv_r, xn,
                winu, winv, yu, yv, yn, acc, *, p_hi, wg_u, wg_v, full):
    i = pl.program_id(0)
    lanes = lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    for x_ref, y_ref, d_ref, es_ref, eo_ref, gn_ref, win_ref, sign, wg in (
            (xu_r, yu, du, esu, eou, gnu, winu, 1.0, wg_u),
            (xv_r, yv, dv, esv, eov, gnv, winv, -1.0, wg_v)):
        _body(full, x_ref[:], d_ref[:], es_ref[:].astype(jnp.int32),
              eo_ref[:].astype(jnp.int32), gn_ref[0], win_ref, xn, acc,
              y_ref, sign, p_hi, wg, i, lanes)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        yn[:] = acc[:]


def _kern_merged(recu, gnu, recv, gnv, xn, winu, winv, yu, yv, yn, acc,
                 *, p_hi, wg_u, wg_v, full):
    i = pl.program_id(0)
    lanes = lax.broadcasted_iota(jnp.int32, (CHUNK, LANE), 1)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    for rec_ref, y_ref, gn_ref, win_ref, sign, wg in (
            (recu, yu, gnu, winu, 1.0, wg_u),
            (recv, yv, gnv, winv, -1.0, wg_v)):
        d, x2, es, eo = _unpack(rec_ref[:])
        _body(full, x2, d, es, eo, gn_ref[0], win_ref, xn, acc,
              y_ref, sign, p_hi, wg, i, lanes)

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        yn[:] = acc[:]


def _build(variant, full):
    blk = lambda: pl.BlockSpec((CHUNK, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    rblk = lambda: pl.BlockSpec((3 * CHUNK, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    gnb = lambda: pl.BlockSpec((1, CHUNK, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    fullb = pl.BlockSpec((lay.P2, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    r = lay.u.R
    out_shape = [jax.ShapeDtypeStruct((r, LANE), jnp.float32),
                 jax.ShapeDtypeStruct((r, LANE), jnp.float32),
                 jax.ShapeDtypeStruct((lay.P2, LANE), jnp.float32)]
    kw = dict(p_hi=lay.p_hi, wg_u=lay.u.wg, wg_v=lay.v.wg, full=full)
    if variant == "multi":
        return pl.pallas_call(
            functools.partial(_kern_multi, **kw),
            grid=(lay.u.C,),
            in_specs=[blk(), blk(), blk(), gnb(), blk(), blk(), blk(),
                      gnb(), blk(), blk(), fullb, sm, sm],
            out_specs=[blk(), blk(), fullb],
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((lay.P2, LANE), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=INTERPRET,
        ), lambda xn_c: (*ARRS, XUJ, XVJ, xn_c, *WINS)
    return pl.pallas_call(
        functools.partial(_kern_merged, **kw),
        grid=(lay.u.C,),
        in_specs=[rblk(), gnb(), rblk(), gnb(), fullb, sm, sm],
        out_specs=[blk(), blk(), fullb],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((lay.P2, LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    ), lambda xn_c: (REC_U, GNS[0], REC_V, GNS[1], xn_c, *WINS)


def measure(variant, full):
    call, feed = _build(variant, full)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(xn_c, *, iters):
        def body(_, st):
            yu, yv, yn = call(*feed(st))
            return yn  # xn-carry serializes iterations for BOTH variants
        yn = lax.fori_loop(0, iters, body, xn_c)
        return jnp.sum(yn)

    lo = 16
    hi = lo + max(int(0.04 / (arcs * 1.6e-10)), 48)

    def sample(n):
        t0 = time.perf_counter()
        float(chain(XNJ, iters=n))
        return time.perf_counter() - t0

    sample(lo), sample(hi)
    tlo = min(sample(lo) for _ in range(4))
    thi = min(sample(hi) for _ in range(4))
    return (thi - tlo) / (hi - lo)


def correctness():
    """Merged full matvec must equal multi full matvec bitwise (same FP
    sequence on identical values, only the plane transport differs)."""
    cm, fm = _build("multi", True)
    cg, fg = _build("merged", True)
    om = cm(*fm(XNJ))
    og = cg(*fg(XNJ))
    for a, b_ in zip(om, og):
        d = float(jnp.max(jnp.abs(a - b_)))
        assert d == 0.0, f"merged != multi: max|delta|={d}"
    print("correctness: merged == multi bitwise", flush=True)


results = {}
correctness()
if INTERPRET:
    print("interpret mode: correctness validated, timing needs the chip",
          flush=True)
    sys.exit(0)
modes = {"floor": [("multi", False), ("merged", False)],
         "full": [("multi", True), ("merged", True)]}
for mode in (("floor", "full") if what == "both" else (what,)):
    for variant, full in modes[mode]:
        per = measure(variant, full)
        key = f"{mode}_{variant}"
        results[key] = round(per * 1e6, 1)
        print(f"{key:14s}: {per*1e6:8.1f} us/matvec", flush=True)

if "floor_multi" in results and "floor_merged" in results:
    results["floor_merged_speedup"] = round(
        results["floor_multi"] / results["floor_merged"], 3)
if "full_multi" in results and "full_merged" in results:
    results["full_merged_speedup"] = round(
        results["full_multi"] / results["full_merged"], 3)
print(json.dumps({"probe": "stream_planes", "arcs": arcs, **results}),
      flush=True)
