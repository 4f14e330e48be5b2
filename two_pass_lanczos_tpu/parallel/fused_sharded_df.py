"""Arc-sharded DOUBLE-FLOAT f(A)·b: f64-class accuracy over a device mesh.

Extends the arc-sharded O(p)-communication design of
``parallel/fused_sharded.py`` to the double-float arithmetic of
``ops/kkt_fused_df.py``: each device holds its arc shard in the dual sorted
layout (d split into hi/lo planes) and runs the df matvec kernel locally;
the Lanczos recurrence — df axpys, compensated dots, df sqrt/recip — runs
at the XLA level under ``shard_map``.

Cross-device reductions need care: a plain f32 ``psum`` of df partials
would re-round at f32 and destroy the ~2⁻⁴⁹ working precision. Instead
every reduction **all-gathers the tiny partials and df-folds them locally
in device order** — deterministic (bit-replicated across devices) and
df-accurate:

* node-block scatter partials: (2, P2, 128) per device — ~11 KB each, the
  same O(p) traffic class as the f32 design;
* α/β/‖b‖ dot partials: one (2,) scalar pair per device.

This also lifts the df capacity wall: the single-chip resident df kernel
caps at ~0.8M arcs; sharding splits the arc block, so P devices hold ~0.8M·P
arcs at f64-class accuracy (virtual-mesh tested; the per-device kernel is
resident, not grid-streamed).

Pass two replays from the stored df (α, β) with the identical per-value op
sequence, like every other two-pass path in this framework.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from two_pass_lanczos_tpu.ops.df import (
    DF,
    df_add,
    df_div,
    df_mul,
    df_sqrt,
    df_sum,
)
from two_pass_lanczos_tpu.ops.kkt_fused import LANE, SortedKKTLayout, _pad_ordering
from two_pass_lanczos_tpu.ops.kkt_fused_df import (
    DF_BREAKDOWN_TOL,
    df_kkt_matvec,
    df_kkt_streaming_matvec,
)

__all__ = ["DFShardedFusedKKTSolver"]


def _df_fold_leading(h, l):
    """Deterministic df fold over the leading (device) axis of gathered
    partials: sequential df_add in device order — identical on every device,
    so the folded value stays bit-replicated."""
    acc = DF(h[0], l[0])
    for d in range(1, h.shape[0]):
        acc = df_add(acc, DF(h[d], l[d]))
    return acc


class DFShardedFusedKKTSolver:
    """Distributed double-float two-pass f(A)·b over a 1-D mesh."""

    def __init__(self, quad_costs, arc_u, arc_v, num_nodes, mesh: Mesh,
                 axis: str = "rows", interpret: bool = False):
        self.mesh = mesh
        self.axis = axis
        self.interpret = interpret
        ndev = mesh.devices.size
        d64 = np.asarray(quad_costs, np.float64)
        arc_u = np.asarray(arc_u)
        arc_v = np.asarray(arc_v)
        m = len(d64)
        self.m, self.p = m, int(num_nodes)
        self.n = m + self.p

        d_hi = d64.astype(np.float32)
        d_lo = (d64 - d_hi.astype(np.float64)).astype(np.float32)

        self.arc_idx = np.array_split(np.arange(m, dtype=np.int64), ndev)
        # per-device kernel selection: the resident df matvec up to the
        # per-chip df VMEM cap, the grid-streaming df matvec beyond it
        # (arc data re-read from HBM per matvec) — so ANY shard size works
        from two_pass_lanczos_tpu.ops.kkt_fused_df import DFFusedKKTSolver

        max_shard = max(len(ix) for ix in self.arc_idx)
        self.streaming = max_shard > DFFusedKKTSolver.MAX_ARCS
        layouts = [
            SortedKKTLayout.build(d_hi[ix], arc_u[ix], arc_v[ix], num_nodes)
            for ix in self.arc_idx
        ]
        r = max(lay.u.R for lay in layouts)
        self.layouts = [
            dataclasses.replace(lay, u=_pad_ordering(lay.u, r, lay.p_hi),
                                v=_pad_ordering(lay.v, r, lay.p_hi))
            for lay in layouts
        ]
        self.R, self.C = r, r // 128
        lay0 = self.layouts[0]
        self.p_hi, self.P2 = lay0.p_hi, lay0.P2

        def lo_plane(lay, ordering, ix):
            flat = np.zeros(ordering.R * LANE, np.float32)
            flat[ordering.pos] = d_lo[ix]
            return flat.reshape(ordering.R, LANE)

        def put(global_np, spec):
            sharding = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                global_np.shape, sharding, lambda idx: global_np[idx])

        def stack(get):
            return np.stack([get(lay, ix)
                             for lay, ix in zip(self.layouts, self.arc_idx)])

        self._arrs = tuple(put(stack(g), P(axis)) for g in (
            lambda l, ix: l.u.d2, lambda l, ix: lo_plane(l, l.u, ix),
            lambda l, ix: l.u.es2, lambda l, ix: l.u.eo2,
            lambda l, ix: l.u.gn3,
            lambda l, ix: l.v.d2, lambda l, ix: lo_plane(l, l.v, ix),
            lambda l, ix: l.v.es2, lambda l, ix: l.v.eo2,
            lambda l, ix: l.v.gn3,
        ))
        self._wins = (put(stack(lambda l, ix: l.u.win), P(axis)),
                      put(stack(lambda l, ix: l.v.win), P(axis)))
        self._put = put
        self._jits = {}

    # ------------------------------------------------------------------
    def pack(self, b):
        """(n,) f64 -> sharded (D, 2, R, 128) xu/xv pairs + replicated
        (2, P2, 128) xn pair."""
        b64 = np.asarray(b, np.float64)
        hi = b64.astype(np.float32)
        lo = (b64 - hi.astype(np.float64)).astype(np.float32)
        nd = len(self.layouts)
        xu = np.zeros((nd, 2, self.R, LANE), np.float32)
        xv = np.zeros_like(xu)
        for d, (lay, ix) in enumerate(zip(self.layouts, self.arc_idx)):
            for plane, vals in ((0, hi), (1, lo)):
                xu[d, plane].reshape(-1)[lay.u.pos] = vals[ix]
                xv[d, plane].reshape(-1)[lay.v.pos] = vals[ix]
        xn = np.zeros((2, self.P2, LANE), np.float32)
        xn[0].reshape(-1)[: self.p] = hi[self.m:]
        xn[1].reshape(-1)[: self.p] = lo[self.m:]
        return (self._put(xu, P(self.axis)), self._put(xv, P(self.axis)),
                self._put(xn, P()))

    def unpack64(self, xu2, xn2) -> np.ndarray:
        xu2 = np.asarray(xu2, np.float64)
        xn2 = np.asarray(xn2, np.float64)
        x = np.empty(self.n)
        for d, (lay, ix) in enumerate(zip(self.layouts, self.arc_idx)):
            x[ix] = (xu2[d, 0].reshape(-1)[lay.u.pos]
                     + xu2[d, 1].reshape(-1)[lay.u.pos])
        x[self.m:] = (xn2[0].reshape(-1) + xn2[1].reshape(-1))[: self.p]
        return x

    # ------------------------------------------------------------------
    def _helpers(self):
        axis = self.axis
        kw = dict(p_hi=self.p_hi, c_chunks=self.C, p2=self.P2,
                  interpret=self.interpret)
        kernel = (df_kkt_streaming_matvec if self.streaming
                  else df_kkt_matvec)

        def gather_fold_scalar(s: DF) -> DF:
            parts_h = lax.all_gather(s.hi, axis)
            parts_l = lax.all_gather(s.lo, axis)
            return _df_fold_leading(parts_h, parts_l)

        def matvec(arrs, wins, vu, vv, vn):
            yu, yv, yn_part = kernel(arrs, wins, vu, vv, vn, **kw)
            # df-safe node reduce: all-gather the tiny partials, fold in
            # device order (a plain f32 psum would re-round to f32)
            gh = lax.all_gather(yn_part[0], axis)
            gl = lax.all_gather(yn_part[1], axis)
            yn = _df_fold_leading(gh, gl)
            return yu, yv, jnp.stack([yn.hi, yn.lo])

        def dot(a2, an2, b2, bn2):
            # arc block: each arc on exactly one device; node block
            # replicated (identical everywhere, no collective)
            sa = gather_fold_scalar(_df_dot2(a2, b2))
            return df_add(sa, _df_dot2(an2, bn2))

        return matvec, dot

    def _build_p1(self, k: int):
        axis = self.axis
        tol = jnp.float32(DF_BREAKDOWN_TOL)
        ztol = jnp.float32(1000.0 * np.finfo(np.float32).tiny)
        matvec, dot = self._helpers()

        def run(arrs_and_wins, xu, xv, xn):
            arrs = tuple(a[0] for a in arrs_and_wins[:10])
            wins = tuple(w[0] for w in arrs_and_wins[10:])
            xu, xv = xu[0], xv[0]

            nb2 = dot(xu, xn, xu, xn)
            b_norm = df_sqrt(nb2)
            zero_b = b_norm.hi <= ztol
            inv_n = df_div(DF(jnp.float32(1.0), jnp.float32(0.0)), b_norm)
            inv_n = DF(jnp.where(zero_b, 0.0, inv_n.hi),
                       jnp.where(zero_b, 0.0, inv_n.lo))
            v1 = tuple(_df_scale2(c, inv_n) for c in (xu, xv, xn))
            zeros = tuple(jnp.zeros_like(c) for c in v1)

            def p1_step(carry, _):
                vp, vc, bp, done, steps = carry
                executed = jnp.logical_not(done)
                w = matvec(arrs, wins, *vc)
                w = tuple(_df_axpy2(wi, bp, vpi) for wi, vpi in zip(w, vp))
                alpha = dot(vc[0], vc[2], w[0], w[2])
                w = tuple(_df_axpy2(wi, alpha, vci) for wi, vci in zip(w, vc))
                beta = df_sqrt(dot(w[0], w[2], w[0], w[2]))
                breakdown = beta.hi <= tol
                advance = jnp.logical_and(executed,
                                          jnp.logical_not(breakdown))

                def mk(s, cond):
                    return DF(jnp.where(cond, s.hi, 0.0),
                              jnp.where(cond, s.lo, 0.0))

                a_out = mk(alpha, executed)
                b_out = mk(beta, advance)
                inv_b = mk(df_div(DF(jnp.float32(1.0), jnp.float32(0.0)),
                                  beta), advance)
                v_next = tuple(_df_scale2(wi, inv_b) for wi in w)
                sel = lambda a, b_: jnp.where(advance, a, b_)
                new = (tuple(sel(c, p_) for c, p_ in zip(vc, vp)),
                       tuple(sel(nn, c) for nn, c in zip(v_next, vc)),
                       DF(jnp.where(advance, beta.hi, bp.hi),
                          jnp.where(advance, beta.lo, bp.lo)),
                       jnp.logical_or(done, breakdown),
                       steps + executed.astype(jnp.int32))
                return new, (a_out.hi, a_out.lo, b_out.hi, b_out.lo)

            carry0 = (zeros, v1, DF(jnp.float32(0.0), jnp.float32(0.0)),
                      zero_b, jnp.zeros((), jnp.int32))
            carry, (ah, al, bh, bl) = lax.scan(p1_step, carry0, None,
                                               length=k)
            return (ah, al, bh, bl, carry[4],
                    jnp.stack([b_norm.hi, b_norm.lo]))

        shmapped = jax.shard_map(
            run,
            mesh=self.mesh,
            in_specs=(tuple([P(self.axis)] * 12), P(self.axis),
                      P(self.axis), P()),
            out_specs=(P(), P(), P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(shmapped)

    def _build_p2(self, k: int):
        matvec, dot = self._helpers()

        def run(arrs_and_wins, xu, xv, xn, ah, al, bh, bl, steps, bn2, y2):
            arrs = tuple(a[0] for a in arrs_and_wins[:10])
            wins = tuple(w[0] for w in arrs_and_wins[10:])
            xu, xv = xu[0], xv[0]

            safe_bn = DF(jnp.where(bn2[0] > 0, bn2[0], 1.0), bn2[1])
            inv_n = df_div(DF(jnp.float32(1.0), jnp.float32(0.0)), safe_bn)
            zero_b = bn2[0] <= 0
            inv_n = DF(jnp.where(zero_b, 0.0, inv_n.hi),
                       jnp.where(zero_b, 0.0, inv_n.lo))
            v1 = tuple(_df_scale2(c, inv_n) for c in (xu, xv, xn))
            zeros = tuple(jnp.zeros_like(c) for c in v1)

            y = DF(y2[0], y2[1])
            idx = jnp.arange(k)
            ym = DF(jnp.where(idx < steps, y.hi, 0.0),
                    jnp.where(idx < steps, y.lo, 0.0))
            y0 = DF(ym.hi[0], ym.lo[0])
            x0 = (_df_scale2(v1[0], y0), _df_scale2(v1[2], y0))

            bp_h = jnp.concatenate([jnp.zeros((1,), jnp.float32), bh[:-1]])
            bp_l = jnp.concatenate([jnp.zeros((1,), jnp.float32), bl[:-1]])

            def p2_step(carry, xs):
                vp, vc, x_acc = carry
                a_h, a_l, bph, bpl, bjh, bjl, ynh, ynl, j = xs
                active = j < steps - 1
                w = matvec(arrs, wins, *vc)
                w = tuple(_df_axpy2(wi, DF(bph, bpl), vpi)
                          for wi, vpi in zip(w, vp))
                w = tuple(_df_axpy2(wi, DF(a_h, a_l), vci)
                          for wi, vci in zip(w, vc))
                safe = DF(jnp.where(bjh > 0, bjh, 1.0), bjl)
                inv_b = df_div(DF(jnp.float32(1.0), jnp.float32(0.0)), safe)
                inv_b = DF(jnp.where(active, inv_b.hi, 0.0),
                           jnp.where(active, inv_b.lo, 0.0))
                v_next = tuple(_df_scale2(wi, inv_b) for wi in w)
                yn = DF(ynh, ynl)
                x_acc = (_df_acc2(x_acc[0], v_next[0], yn),
                         _df_acc2(x_acc[1], v_next[2], yn))
                sel = lambda a, b_: jnp.where(active, a, b_)
                vp_n = tuple(sel(c, p_) for c, p_ in zip(vc, vp))
                vc_n = tuple(sel(nn, c) for nn, c in zip(v_next, vc))
                return (vp_n, vc_n, x_acc), None

            if k > 1:
                xs = (ah[: k - 1], al[: k - 1], bp_h[: k - 1],
                      bp_l[: k - 1], bh[: k - 1], bl[: k - 1],
                      ym.hi[1:], ym.lo[1:], jnp.arange(k - 1))
                (_, _, x_acc), _ = lax.scan(p2_step, (zeros, v1, x0), xs)
            else:
                x_acc = x0
            return x_acc[0][None], x_acc[1]

        shmapped = jax.shard_map(
            run,
            mesh=self.mesh,
            in_specs=(tuple([P(self.axis)] * 12), P(self.axis),
                      P(self.axis), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(self.axis), P()),
            check_vma=False,
        )
        return jax.jit(shmapped)

    def _p1(self, k: int):
        key = ("p1", k)
        if key not in self._jits:
            self._jits[key] = self._build_p1(k)
        return self._jits[key]

    def _p2(self, k: int):
        key = ("p2", k)
        if key not in self._jits:
            self._jits[key] = self._build_p2(k)
        return self._jits[key]

    # ------------------------------------------------------------------
    def solve(self, b, *, k: int, f="inv", raw: bool = False):
        """Distributed df two-pass f(A)·b; x returned as f64.

        Returns ``(x, (alphas_f64, betas_f64, steps))``. One mid-solve
        device round trip each way: the (α, β) readback for the host f64
        projected solve and the y upload (like the single-chip df solver).

        ``raw=True`` returns the device-resident layout pair
        ``((xu2, xn2), (alphas, betas, steps))`` instead of the unpacked
        host f64 vector — required under multi-process ``jax.distributed``
        where ``xu2`` spans non-addressable devices (the scalar/coefficient
        outputs are replicated, so the α/β readback still works on every
        process).
        """
        from two_pass_lanczos_tpu.functions import host_f_tk_solve

        xu, xv, xn = self.pack(b)
        ah, al, bh, bl, steps_arr, bn2 = self._p1(k)(
            self._arrs + self._wins, xu, xv, xn)
        steps = int(np.asarray(steps_arr))
        a64 = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
        b64 = np.asarray(bh, np.float64) + np.asarray(bl, np.float64)
        if steps == 0:
            if raw:
                return None, (a64[:0], b64[:0], 0)
            return np.zeros(self.n), (a64[:0], b64[:0], 0)
        y = host_f_tk_solve(a64[:steps], b64[: steps - 1], f)
        bn = np.asarray(bn2, np.float64)
        y_full = np.zeros(k)
        y_full[:steps] = y * (bn[0] + bn[1])
        y_h = y_full.astype(np.float32)
        y_l = (y_full - y_h.astype(np.float64)).astype(np.float32)
        y2 = jnp.asarray(np.stack([y_h, y_l]))
        xu2, xn2 = self._p2(k)(
            self._arrs + self._wins, xu, xv, xn,
            ah, al, bh, bl, steps_arr, bn2, y2)
        coeffs = (a64[:steps], b64[: steps - 1], steps)
        if raw:
            return (xu2, xn2), coeffs
        return self.unpack64(xu2, xn2), coeffs


# -- df helpers on stacked (2, ...) pairs -----------------------------------

def _df2(a2):
    return DF(a2[0], a2[1])


def _df_dot2(a2, b2) -> DF:
    p = df_mul(_df2(a2), _df2(b2))
    return df_sum(p)


def _df_scale2(x2, s: DF):
    x = _df2(x2)
    sh = jnp.broadcast_to(s.hi, x.hi.shape)
    sl = jnp.broadcast_to(s.lo, x.lo.shape)
    r = df_mul(x, DF(sh, sl))
    return jnp.stack([r.hi, r.lo])


def _df_axpy2(w2, a: DF, x2):
    w = _df2(w2)
    x = _df2(x2)
    ah = jnp.broadcast_to(a.hi, x.hi.shape)
    al = jnp.broadcast_to(a.lo, x.lo.shape)
    prod = df_mul(x, DF(ah, al))
    r = df_add(w, DF(-prod.hi, -prod.lo))
    return jnp.stack([r.hi, r.lo])


def _df_acc2(x2, v2, y: DF):
    x = _df2(x2)
    v = _df2(v2)
    yh = jnp.broadcast_to(y.hi, v.hi.shape)
    yl = jnp.broadcast_to(y.lo, v.lo.shape)
    prod = df_mul(v, DF(yh, yl))
    r = df_add(x, prod)
    return jnp.stack([r.hi, r.lo])
