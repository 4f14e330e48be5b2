"""Arc-sharded distributed f(A)·b using the fused KKT kernels per device.

The generic row-partitioned operator (``parallel/sharded.py``) all-gathers the
full Krylov vector every step — O(n) bytes over ICI per matvec. The KKT
structure admits a far better decomposition:

* **shard the arc block, replicate the node block.** Each device owns an
  arbitrary subset of arcs, stored in the dual sorted layout of
  ``ops/kkt_fused.py`` (its own u-ordering and v-ordering over the *global*
  node ids). The node table is tiny (p ≪ m: ~1k nodes vs 500k arcs for the
  rho=3 instances) and is kept replicated.
* per step, each device runs one Pallas kernel over its local arcs: the arc
  outputs are purely local, and the incidence scatter produces a *local
  partial* of the node output. The only cross-device communication is
  ``psum`` of that (P2, 128) partial plus the two scalar (α, β²) reductions —
  **O(p) bytes per step instead of O(n)**, >10³× less traffic at 500k arcs.

Inner products count each arc once (every arc lives on exactly one device's
u-copy) plus the replicated node block once (computed identically on every
device, no collective needed). The node state stays bit-replicated because
``psum`` is deterministic and every subsequent update is elementwise with
replicated scalars.

Numerical semantics match the single-device fused solver step for step
(reference op order, reciprocal-multiply, breakdown at 1000·ε, stored-β
replay in pass two — ``src/algorithms/lanczos_two_pass.rs:176-199``);
per-device-count summation orders differ, so N-device results agree with
1-device results to rounding tolerance (validated in tests).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from two_pass_lanczos_tpu.algorithms.core import (
    LanczosDecomposition,
    breakdown_tolerance,
    zero_tolerance,
)
from two_pass_lanczos_tpu.functions import padded_f_e1
from two_pass_lanczos_tpu.ops.kkt_fused import (
    LANE,
    SortedKKTLayout,
    kkt_streaming_matvec,
)

__all__ = ["ShardedFusedKKTSolver"]


def _stacked_y(decomp, f, k, steps, b_norm):
    """``y' = f(T)e₁`` masked+scaled to length k — for one function spec or
    a tuple of them (multi-f: shape (nf, k), all sharing the decomposition;
    the replicated projected solve runs once per function on every device)."""
    multi = isinstance(f, tuple)
    fs = f if multi else (f,)
    y = jnp.stack([padded_f_e1(decomp, fi) for fi in fs])
    if not multi:
        y = y[0]
    return jnp.where(jnp.arange(k) < steps,
                     y.astype(jnp.float32) * b_norm, 0.0)


class ShardedFusedKKTSolver:
    """Distributed fused f(A)·b for one KKT instance over a 1-D mesh."""

    def __init__(self, quad_costs, arc_u, arc_v, num_nodes, mesh: Mesh,
                 axis: str = "rows", interpret: bool = False,
                 windowed: bool = True):
        # windowed=True default: on the grid-blocked STREAMING kernel the
        # row-wise windowed gather measured 10% faster at 500k arcs and
        # 2.2x at 5M (p_hi=29) on the target v5e — unlike the VMEM-resident
        # FusedKKTSolver, where the full-loop gather stays ahead (PERF.md).
        self.mesh = mesh
        self.axis = axis
        self.interpret = interpret
        ndev = mesh.devices.size
        quad_costs = np.asarray(quad_costs)
        arc_u = np.asarray(arc_u)
        arc_v = np.asarray(arc_v)
        m = len(quad_costs)
        self.m, self.p = m, int(num_nodes)
        self.n = m + self.p

        # arbitrary contiguous arc split; each shard builds its own dual
        # sorted layout over the global node ids
        self.arc_idx = np.array_split(np.arange(m, dtype=np.int64), ndev)
        self.layouts = [
            SortedKKTLayout.build(quad_costs[ix], arc_u[ix], arc_v[ix],
                                  num_nodes, windowed=windowed)
            for ix in self.arc_idx
        ]
        # uniform shapes across shards: pad every ordering to the global max R
        from two_pass_lanczos_tpu.ops.kkt_fused import _pad_ordering
        import dataclasses as _dc

        r = max(lay.u.R for lay in self.layouts)
        p_hi0 = self.layouts[0].p_hi
        self.layouts = [
            _dc.replace(lay, u=_pad_ordering(lay.u, r, p_hi0),
                        v=_pad_ordering(lay.v, r, p_hi0))
            for lay in self.layouts
        ]
        lay0 = self.layouts[0]
        self.R, self.C = r, r // 128
        self.p_hi, self.P2 = lay0.p_hi, lay0.P2
        self.tol = float(breakdown_tolerance(jnp.float32))
        self.ztol = float(zero_tolerance(jnp.float32))
        # retained host-side for estimate_interval (see FusedKKTSolver)
        self._kkt_arrays = (quad_costs.astype(np.float32), arc_u, arc_v,
                            int(num_nodes))
        self._interval_cache = None

        # the kernel is one program across the mesh, so the windowed-gather
        # width must be common: take the max over shards and re-clamp each
        # shard's window bases (a wider window still covers every span and
        # the clamp keeps reads inside the padded node table).
        def common_wg(pick):
            ws = [pick(lay).wg for lay in self.layouts]
            return 0 if any(w == 0 for w in ws) else max(ws)

        self.wg_u = common_wg(lambda l: l.u)
        self.wg_v = common_wg(lambda l: l.v)
        if self.wg_u or self.wg_v:
            from two_pass_lanczos_tpu.ops.kkt_fused import reclamp_window

            self.layouts = [
                _dc.replace(
                    lay,
                    u=reclamp_window(lay.u, self.wg_u, self.p_hi)
                    if self.wg_u else lay.u,
                    v=reclamp_window(lay.v, self.wg_v, self.p_hi)
                    if self.wg_v else lay.v,
                )
                for lay in self.layouts
            ]

        def put(global_np, spec):
            # make_array_from_callback builds the array from each process's
            # ADDRESSABLE shards only, so the same code runs single-process
            # and multi-host (each host materializes just its slice).
            sharding = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                global_np.shape, sharding, lambda idx: global_np[idx])

        def stack(get):
            return np.stack([get(lay) for lay in self.layouts])

        self._arrs = tuple(put(stack(g), P(axis)) for g in (
            lambda l: l.u.d2, lambda l: l.u.es2, lambda l: l.u.eo2,
            lambda l: l.u.gn3,
            lambda l: l.v.d2, lambda l: l.v.es2, lambda l: l.v.eo2,
            lambda l: l.v.gn3,
        ))
        self._wins = (put(stack(lambda l: l.u.win), P(axis)),
                      put(stack(lambda l: l.v.win), P(axis)))
        self._put = put
        self._solve_cache = {}

    # ------------------------------------------------------------------
    def _pack_batched_np(self, vecs: np.ndarray):
        """(m, n) host vectors -> host-side packed planes with a batch
        axis: xu/xv (D, m, R, LANE), xn (m, P2, LANE). The ONE place the
        layout scatter lives — :meth:`pack` and the batched probe paths
        (``slq_trace``) both go through it."""
        nb = vecs.shape[0]
        xu = np.zeros((len(self.layouts), nb, self.R, LANE), np.float32)
        xv = np.zeros_like(xu)
        for d, (lay, ix) in enumerate(zip(self.layouts, self.arc_idx)):
            vals = vecs[:, ix].astype(np.float32)
            xu[d].reshape(nb, -1)[:, lay.u.pos] = vals
            xv[d].reshape(nb, -1)[:, lay.v.pos] = vals
        xn = np.zeros((nb, self.P2 * LANE), np.float32)
        xn[:, : self.p] = vecs[:, self.m:]
        return xu, xv, xn.reshape(nb, self.P2, LANE)

    def pack(self, b) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(n,) host vector -> sharded (D,R,128) xu/xv + replicated xn."""
        xu, xv, xn = self._pack_batched_np(np.asarray(b)[None])
        return (self._put(xu[:, 0], P(self.axis)),
                self._put(xv[:, 0], P(self.axis)),
                self._put(xn[0], P()))

    def unpack(self, xu, xn) -> np.ndarray:
        xu = np.asarray(xu)
        xn = np.asarray(xn)
        if xu.ndim == 4:  # multi-f: (D, nf, R, LANE) / (nf, P2, LANE)
            return np.stack([self.unpack(xu[:, i], xn[i])
                             for i in range(xu.shape[1])])
        xn = xn.reshape(-1)
        x = np.empty(self.n)
        for d, (lay, ix) in enumerate(zip(self.layouts, self.arc_idx)):
            x[ix] = xu[d].reshape(-1)[lay.u.pos]
        x[self.m:] = xn[: self.p]
        return x

    # ------------------------------------------------------------------
    def _local_matvec_call(self, arrs, wins, xu, xv, xn):
        """One per-device matvec: local arc outputs + the local node-scatter
        partial (to be psum-reduced by the caller). Uses the grid-blocked
        streaming kernel, so each device's shard may be arbitrarily large
        (chunks are double-buffered from HBM)."""
        return kkt_streaming_matvec(
            arrs, wins, xu, xv, xn, p_hi=self.p_hi, c_chunks=self.C,
            p2=self.P2, wg_u=self.wg_u, wg_v=self.wg_v,
            interpret=self.interpret)

    def _shard_helpers(self, arrs, wins):
        """The per-shard matvec + dot closures — the collective structure of
        every pass (monolithic, chunked, one-pass) comes from here, so all
        variants replay the identical FP sequence."""
        axis = self.axis

        def matvec(xu, xv, xn):
            yu, yv, s_local = self._local_matvec_call(arrs, wins, xu, xv, xn)
            # the ONLY O(p) communication: reduce node partials
            yn = lax.psum(s_local, axis)
            return yu, yv, yn

        def dot(au, an, bu_, bn_):
            # arc part: each arc on exactly one device -> psum;
            # node part: replicated, identical everywhere -> no collective
            return lax.psum(jnp.sum(au * bu_), axis) + jnp.sum(an * bn_)

        return matvec, dot

    def _init_v1(self, dot, bu, bv, bn):
        nb2 = dot(bu, bn, bu, bn)
        b_norm = jnp.sqrt(nb2)
        zero_b = b_norm <= self.ztol
        inv_n = jnp.where(zero_b, 0.0, 1.0 / b_norm)
        v1 = (bu * inv_n, bv * inv_n, bn * inv_n)
        return v1, b_norm, zero_b

    def _mk_p1_step(self, matvec, dot, emit_basis: bool = False):
        tol = self.tol

        def p1_step(carry, _):
            (vp, vc, beta_prev, done, steps) = carry
            executed = jnp.logical_not(done)
            w = matvec(*vc)
            w = tuple(wi - beta_prev * vpi for wi, vpi in zip(w, vp))
            alpha = dot(vc[0], vc[2], w[0], w[2])
            w = tuple(wi - alpha * vci for wi, vci in zip(w, vc))
            beta = jnp.sqrt(dot(w[0], w[2], w[0], w[2]))
            breakdown = beta <= tol
            advance = jnp.logical_and(executed,
                                      jnp.logical_not(breakdown))
            alpha_out = jnp.where(executed, alpha, 0.0)
            beta_out = jnp.where(advance, beta, 0.0)
            inv_b = jnp.where(advance, 1.0 / beta, 0.0)
            v_next = tuple(wi * inv_b for wi in w)
            sel = lambda a, b_: jnp.where(advance, a, b_)
            new = (tuple(sel(c, p_) for c, p_ in zip(vc, vp)),
                   tuple(sel(nn, c) for nn, c in zip(v_next, vc)),
                   jnp.where(advance, beta, beta_prev),
                   jnp.logical_or(done, breakdown),
                   steps + executed.astype(jnp.int32))
            outs = (alpha_out, beta_out)
            if emit_basis:
                # basis row j = the v_j this step consumed (v1..vk); masked
                # rows past breakdown stay zero, like lanczos.rs:135-145
                e = executed.astype(jnp.float32)
                outs = outs + (vc[0] * e, vc[2] * e)
            return new, outs

        return p1_step

    def _mk_p2_step(self, matvec, steps):
        def p2_step(carry, xs):
            vp, vc, x_acc = carry
            alpha_j, bp, bj, y_next, j = xs
            active = j < steps - 1
            w = matvec(*vc)
            w = tuple(wi - bp * vpi - alpha_j * vci
                      for wi, vpi, vci in zip(w, vp, vc))
            inv_b = jnp.where(
                active, 1.0 / jnp.where(bj > 0, bj, 1.0), 0.0)
            v_next = tuple(wi * inv_b for wi in w)
            # y_next is a scalar, or a (nf,) slice when several matrix
            # functions share this replay (multi-f: one matvec per step,
            # nf accumulates)
            x_acc = (x_acc[0] + jnp.einsum("...,rl->...rl", y_next, v_next[0]),
                     x_acc[1] + jnp.einsum("...,rl->...rl", y_next, v_next[2]))
            sel = lambda a, b_: jnp.where(active, a, b_)
            vp_n = tuple(sel(c, p_) for c, p_ in zip(vc, vp))
            vc_n = tuple(sel(nn, c) for nn, c in zip(v_next, vc))
            return (vp_n, vc_n, x_acc), None

        return p2_step

    def _build_solve(self, k: int, f, method: str):
        if method not in ("two_pass", "one_pass"):
            raise ValueError("method must be 'two_pass' or 'one_pass'")
        axis = self.axis
        one_pass = method == "one_pass"

        def run(arrs_and_wins, bu, bv, bn):
            arrs, wins = arrs_and_wins[:8], arrs_and_wins[8:]
            arrs = tuple(a[0] for a in arrs)  # strip sharded leading dim
            wins = tuple(w[0] for w in wins)
            bu, bv = bu[0], bv[0]
            matvec, dot = self._shard_helpers(arrs, wins)

            v1, b_norm, zero_b = self._init_v1(dot, bu, bv, bn)
            zeros = tuple(jnp.zeros_like(c) for c in v1)

            p1_step = self._mk_p1_step(matvec, dot, emit_basis=one_pass)
            carry0 = (zeros, v1, jnp.float32(0.0), zero_b,
                      jnp.zeros((), jnp.int32))
            carry, outs = lax.scan(p1_step, carry0, None, length=k)
            alphas, betas = outs[0], outs[1]
            steps = carry[4]
            decomp = LanczosDecomposition(
                alphas=alphas, betas=betas, steps_taken=steps, b_norm=b_norm)

            y_full = _stacked_y(decomp, f, k, steps, b_norm)

            if one_pass:
                # x = V_k·y: the per-device basis slab lives in HBM as the
                # scan's stacked outputs; one memory-bound contraction,
                # like the reference's final GEMV (src/solvers.rs:96-104)
                # (a multi-f stack turns the GEMV into a GEMM over the
                # same basis read)
                basis_u, basis_n = outs[2], outs[3]
                x_u = jnp.einsum("krl,...k->...rl", basis_u, y_full,
                                 precision=jax.lax.Precision.HIGHEST)
                x_n = jnp.einsum("krl,...k->...rl", basis_n, y_full,
                                 precision=jax.lax.Precision.HIGHEST)
                return x_u[None], x_n, alphas, betas, steps, b_norm

            # pass two: stored-beta replay (same collective structure)
            x0 = (jnp.einsum("...,rl->...rl", y_full[..., 0], v1[0]),
                  jnp.einsum("...,rl->...rl", y_full[..., 0], v1[2]))
            beta_prevs = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32), betas[:-1]])
            p2_step = self._mk_p2_step(matvec, steps)
            if k > 1:
                xs = (alphas[: k - 1], beta_prevs[: k - 1], betas[: k - 1],
                      jnp.moveaxis(y_full[..., 1:], -1, 0),
                      jnp.arange(k - 1))
                (_, _, x_acc), _ = lax.scan(p2_step, (zeros, v1, x0), xs)
            else:
                x_acc = x0
            return x_acc[0][None], x_acc[1], alphas, betas, steps, b_norm

        shmapped = jax.shard_map(
            run,
            mesh=self.mesh,
            in_specs=(tuple([P(self.axis)] * 10), P(self.axis), P(self.axis),
                      P()),
            out_specs=(P(self.axis), P(), P(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(shmapped)

    def _solver(self, k: int, f, method: str):
        key = (k, f, method)
        if key not in self._solve_cache:
            self._solve_cache[key] = self._build_solve(k, f, method)
        return self._solve_cache[key]

    # -- chunked pass one (live early-stop callback) --------------------

    def one_pass_basis_bytes(self, k: int) -> int:
        """Per-device HBM bytes of the one-pass basis slab."""
        return k * (self.R + self.P2) * LANE * 4

    #: per-device HBM admission for the one-pass basis (v5e has 16 GB;
    #: leave room for the arc planes + XLA workspace)
    ONE_PASS_HBM_BUDGET = 12 * 2**30

    def _build_p1_init(self):
        axis = self.axis

        def run(bu, bv, bn):
            bu, bv = bu[0], bv[0]

            def dot(au, an, bu_, bn_):
                return lax.psum(jnp.sum(au * bu_), axis) + jnp.sum(an * bn_)

            v1, b_norm, zero_b = self._init_v1(dot, bu, bv, bn)
            zeros = tuple(jnp.zeros_like(c) for c in v1)
            return (zeros[0][None], zeros[1][None], zeros[2],
                    v1[0][None], v1[1][None], v1[2],
                    jnp.float32(0.0), zero_b, jnp.zeros((), jnp.int32),
                    b_norm)

        shmapped = jax.shard_map(
            run, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P()),
            out_specs=(P(self.axis), P(self.axis), P(),
                       P(self.axis), P(self.axis), P(),
                       P(), P(), P(), P()),
            check_vma=False)
        return jax.jit(shmapped)

    def _build_p1_chunk(self, chunk: int):
        def run(arrs_and_wins, vpu, vpv, vpn, vcu, vcv, vcn,
                beta_prev, done, steps):
            arrs = tuple(a[0] for a in arrs_and_wins[:8])
            wins = tuple(w[0] for w in arrs_and_wins[8:])
            matvec, dot = self._shard_helpers(arrs, wins)
            step = self._mk_p1_step(matvec, dot)
            carry0 = ((vpu[0], vpv[0], vpn), (vcu[0], vcv[0], vcn),
                      beta_prev, done, steps)
            carry, (alphas, betas) = lax.scan(step, carry0, None,
                                              length=chunk)
            vp, vc, bp, dn, st = carry
            return (vp[0][None], vp[1][None], vp[2],
                    vc[0][None], vc[1][None], vc[2],
                    bp, dn, st, alphas, betas)

        shmapped = jax.shard_map(
            run, mesh=self.mesh,
            in_specs=(tuple([P(self.axis)] * 10),
                      P(self.axis), P(self.axis), P(),
                      P(self.axis), P(self.axis), P(), P(), P(), P()),
            out_specs=(P(self.axis), P(self.axis), P(),
                       P(self.axis), P(self.axis), P(),
                       P(), P(), P(), P(), P()),
            check_vma=False)
        return jax.jit(shmapped)

    def _build_p2_finish(self, k: int, k2: int, f):
        """Pass two compiled at scan length ``k2`` (= the stop point): an
        early stop at step s pays exactly s pass-two matvecs per device,
        not k (the single-chip finish keeps length k; here the compile is
        per-(k2) because the shortened scan is the whole point)."""

        def run(arrs_and_wins, bu, bv, bn, alphas, betas, steps, b_norm):
            arrs = tuple(a[0] for a in arrs_and_wins[:8])
            wins = tuple(w[0] for w in arrs_and_wins[8:])
            bu, bv = bu[0], bv[0]
            matvec, dot = self._shard_helpers(arrs, wins)
            v1, _, _ = self._init_v1(dot, bu, bv, bn)
            zeros = tuple(jnp.zeros_like(c) for c in v1)

            decomp = LanczosDecomposition(
                alphas=alphas, betas=betas, steps_taken=steps,
                b_norm=b_norm)
            y_full = _stacked_y(decomp, f, k, steps, b_norm)
            x0 = (jnp.einsum("...,rl->...rl", y_full[..., 0], v1[0]),
                  jnp.einsum("...,rl->...rl", y_full[..., 0], v1[2]))
            beta_prevs = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32), betas[:-1]])
            p2_step = self._mk_p2_step(matvec, steps)
            if k2 > 1:
                xs = (alphas[: k2 - 1], beta_prevs[: k2 - 1],
                      betas[: k2 - 1],
                      jnp.moveaxis(y_full[..., 1:k2], -1, 0),
                      jnp.arange(k2 - 1))
                (_, _, x_acc), _ = lax.scan(p2_step, (zeros, v1, x0), xs)
            else:
                x_acc = x0
            return x_acc[0][None], x_acc[1]

        shmapped = jax.shard_map(
            run, mesh=self.mesh,
            in_specs=(tuple([P(self.axis)] * 10),
                      P(self.axis), P(self.axis), P(),
                      P(), P(), P(), P()),
            out_specs=(P(self.axis), P()),
            check_vma=False)
        return jax.jit(shmapped)

    def pass_one_chunked(self, packed, k: int, callback=None,
                         chunk: int = 16):
        """Pass one over the mesh with a live per-iteration callback — the
        reference's in-loop ``LanczosCallback`` break-out
        (``src/algorithms/mod.rs:69-86``, ``lanczos.rs:93-113``) on the
        distributed path.

        ``packed`` is the ``pack(b)`` triple. Runs ceil(k/chunk) compiled
        chunk launches (each a ``chunk``-step ``lax.scan`` over the same
        step closure as the monolithic solver); between launches the
        replicated (α, β, steps) are read back on the host and
        ``callback(s, None, (alphas[:s], betas[:s-1]))`` is replayed per
        iteration. A stop at step s costs at most ceil(s/chunk)·chunk
        matvecs per device. Returns ``(decomposition, stopped)``.
        """
        if chunk < 1:
            raise ValueError("chunk must be >= 1")
        bu, bv, bn = packed
        if "p1_init" not in self._solve_cache:
            self._solve_cache["p1_init"] = self._build_p1_init()
        state = self._solve_cache["p1_init"](bu, bv, bn)
        (vpu, vpv, vpn, vcu, vcv, vcn, bp, done, steps_a, b_norm) = state
        alphas = np.zeros(k, np.float32)
        betas = np.zeros(k, np.float32)
        visited = 0
        stopped = False
        self._last_p1_launches = 0
        remaining = k
        while remaining > 0:
            c = min(chunk, remaining)
            key = ("p1_chunk", c)
            if key not in self._solve_cache:
                self._solve_cache[key] = self._build_p1_chunk(c)
            (vpu, vpv, vpn, vcu, vcv, vcn, bp, done, steps_a,
             a_c, b_c) = self._solve_cache[key](
                self._arrs + self._wins, vpu, vpv, vpn, vcu, vcv, vcn,
                bp, done, steps_a)
            self._last_p1_launches += 1
            remaining -= c
            steps_now = int(np.asarray(steps_a))
            got = steps_now - visited
            if got > 0:
                alphas[visited:steps_now] = np.asarray(a_c)[:got]
                betas[visited:steps_now] = np.asarray(b_c)[:got]
            if callback is not None:
                for s in range(visited + 1, steps_now + 1):
                    if not callback(s, None, (alphas[:s], betas[: s - 1])):
                        visited = s
                        stopped = True
                        break
                else:
                    visited = steps_now
            else:
                visited = steps_now
            if stopped or bool(np.asarray(done)) or steps_now >= k:
                break
        steps = visited
        # truncate to the stop point (early-stop semantics zero from
        # steps-1; a full/breakdown run keeps the residual β at steps-1)
        alphas[steps:] = 0.0
        betas[max(steps - 1, 0) if stopped else steps:] = 0.0
        decomp = LanczosDecomposition(
            alphas=jnp.asarray(alphas), betas=jnp.asarray(betas),
            steps_taken=jnp.asarray(steps, jnp.int32),
            b_norm=jnp.asarray(b_norm))
        return decomp, stopped

    # ------------------------------------------------------------------
    def solve(self, b, *, k: int, f="inv", method: str = "two_pass",
              raw: bool = False, callback=None, callback_chunk: int = 16):
        """Distributed f(A)·b, ``method`` ∈ {"two_pass", "one_pass"}.

        Returns ``(x, decomposition)`` with ``x`` a NumPy (n,) array in the
        original ordering, or — with ``raw=True`` — the device pair
        ``(xu (D,R,128) sharded, xn (P2,128) replicated)``. Multi-host runs
        must use ``raw=True`` (the unpacked form requires every shard to be
        process-addressable); the decomposition is replicated and therefore
        host-readable everywhere.

        ``method="one_pass"`` stores the per-device basis slab in HBM
        (k·(R+P2)·128·4 bytes per device — admission-checked against
        ``ONE_PASS_HBM_BUDGET``) and contracts x = V_k·y, covering the
        reference's standard-Lanczos capability beyond the single-chip
        resident cap (``src/solvers.rs:46``).

        ``callback`` (two_pass only) enables in-run early stopping: pass
        one runs via :meth:`pass_one_chunked` in ``callback_chunk``-step
        launches; a stop at step s runs a pass two compiled at scan length
        s, so the whole solve pays ceil(s/chunk)·chunk + s matvecs per
        device instead of 2k.

        ``f`` may be a tuple of function specs: all are evaluated from one
        decomposition — pass one runs once and the replay/contract fans the
        accumulate out over all of them (``x`` gains a leading nf axis; the
        one-pass basis slab is stored once regardless of nf).

        ``b`` may be a pre-packed ``(bu, bv, bn)`` device triple (the
        :meth:`pack` output, or any device computation in the same rep):
        the host scatter + upload is skipped entirely. At 5M arcs that
        step costs ~1.2 s through the tunnel (three ~22 MB host→device
        transfers) against a 0.23 s device-resident solve, so callers whose
        right-hand side already lives on the device should pass the triple.
        """
        if method == "one_pass":
            need = self.one_pass_basis_bytes(k)
            if need > self.ONE_PASS_HBM_BUDGET:
                raise ValueError(
                    f"one-pass basis slab needs {need} bytes of HBM per "
                    f"device (k={k}, R={self.R}), over the "
                    f"{self.ONE_PASS_HBM_BUDGET}-byte admission budget; "
                    "use method='two_pass' (O(R) memory) or more devices")
        if (isinstance(b, tuple) and len(b) == 3
                and all(hasattr(x, "dtype") for x in b)):
            packed = b
        else:
            packed = self.pack(b)
        if callback is not None:
            if method != "two_pass":
                raise ValueError(
                    "callback early stopping is implemented for the "
                    "two_pass method")
            decomp, _stopped = self.pass_one_chunked(
                packed, k, callback=callback, chunk=callback_chunk)
            steps = int(np.asarray(decomp.steps_taken))
            k2 = max(steps, 1)
            self._last_p2_len = k2
            key = ("p2_finish", k, k2, f)
            if key not in self._solve_cache:
                self._solve_cache[key] = self._build_p2_finish(k, k2, f)
            bu, bv, bn = packed
            xu, xn = self._solve_cache[key](
                self._arrs + self._wins, bu, bv, bn,
                decomp.alphas, decomp.betas, decomp.steps_taken,
                decomp.b_norm)
        else:
            bu, bv, bn = packed
            xu, xn, alphas, betas, steps, b_norm = self._solver(
                k, f, method)(self._arrs + self._wins, bu, bv, bn)
            decomp = LanczosDecomposition(
                alphas=alphas, betas=betas, steps_taken=steps,
                b_norm=b_norm)
        if raw:
            return (xu, xn), decomp
        return self.unpack(xu, xn), decomp

    def slq_trace(self, f="inv", *, k: int = 50, num_probes: int = 16,
                  key, probe: str = "rademacher"):
        """Estimate ``tr f(A)`` over the arc partition: every probe's
        pass one runs under ONE ``shard_map`` as a scan of fused
        streaming-kernel recurrences with the identical collective
        structure as :meth:`solve` (one O(p) psum per matvec, two scalar
        psums per step — :meth:`_shard_helpers` backs both, so the FP
        sequences match the solver's). One dispatch for all probes, one
        batched host-side quadrature; the distributed counterpart of
        ``FusedKKTSolver.slq_trace`` / ``ShardedSparseOperator.slq_trace``.
        Returns :class:`slq.SLQResult` (replicated, host-readable on every
        process).
        """
        from two_pass_lanczos_tpu.slq import (
            _draw_probes,
            batched_quadratic_form,
            slq_stats,
        )
        from two_pass_lanczos_tpu.spectrum import _f_of_theta

        if num_probes < 1:
            raise ValueError("num_probes must be >= 1")
        if not callable(f):
            _f_of_theta(np.ones(1), f)
        probes = np.asarray(_draw_probes(
            key, num_probes, self.n, jnp.float32, probe))
        decomp = self._slq_pass_one(probes, k)
        return slq_stats(batched_quadratic_form(decomp, f))

    def slq_spectral_density(self, grid, *, sigma=None, k: int = 50,
                             num_probes: int = 16, key,
                             probe: str = "gaussian"):
        """Smoothed spectral density (DOS) over the arc partition — the
        unit probes' pass one runs under one shard_map with the fused
        solve's collective structure; the KDE half is the shared
        :func:`slq.dos_from_decomposition` on the replicated
        decomposition."""
        from two_pass_lanczos_tpu.slq import (
            _draw_probes,
            dos_from_decomposition,
            validate_dos_params,
        )

        grid, sigma = validate_dos_params(grid, sigma, num_probes)
        probes = np.asarray(_draw_probes(
            key, num_probes, self.n, jnp.float32, probe))
        probes = probes / np.linalg.norm(probes, axis=1, keepdims=True)
        decomp = self._slq_pass_one(probes.astype(np.float32), k)
        return dos_from_decomposition(
            decomp, grid.astype(jnp.float32),
            jnp.asarray(sigma, jnp.float32))

    def _slq_pass_one(self, probes: np.ndarray, k: int):
        """Batched pass one for (m, n) host probes under ONE shard_map;
        returns the replicated stacked decomposition."""
        num_probes = probes.shape[0]
        # pack all probes host-side (shared layout scatter), ship as
        # three transfers total
        xu, xv, xn = self._pack_batched_np(probes)
        bu = self._put(xu, P(self.axis))
        bv = self._put(xv, P(self.axis))
        bn = self._put(xn, P())

        ck = ("slq", k, num_probes)
        if ck not in self._solve_cache:
            axis = self.axis

            def run(arrs_and_wins, bu_, bv_, bn_):
                arrs = tuple(a[0] for a in arrs_and_wins[:8])
                wins = tuple(w[0] for w in arrs_and_wins[8:])
                bu_, bv_ = bu_[0], bv_[0]
                matvec, dot = self._shard_helpers(arrs, wins)
                p1_step = self._mk_p1_step(matvec, dot)

                def probe_body(_, bp):
                    v1, b_norm, zero_b = self._init_v1(dot, *bp)
                    zeros = tuple(jnp.zeros_like(c) for c in v1)
                    carry0 = (zeros, v1, jnp.float32(0.0), zero_b,
                              jnp.zeros((), jnp.int32))
                    carry, outs = lax.scan(p1_step, carry0, None, length=k)
                    return None, (outs[0], outs[1], carry[4], b_norm)

                _, stacked = lax.scan(probe_body, None, (bu_, bv_, bn_))
                return stacked

            self._solve_cache[ck] = jax.jit(jax.shard_map(
                run, mesh=self.mesh,
                in_specs=(tuple([P(axis)] * 10), P(axis), P(axis), P()),
                out_specs=(P(), P(), P(), P()),
                check_vma=False,
            ))
        al, be, st, bno = self._solve_cache[ck](
            self._arrs + self._wins, bu, bv, bn)
        return LanczosDecomposition(
            alphas=al, betas=be, steps_taken=st, b_norm=bno)


    def slq_trace_adaptive(self, f="inv", *, k: int = 50, key,
                           probe: str = "rademacher",
                           target_rel_stderr: float = 0.01,
                           batch: int = 8, max_probes: int = 512):
        """:meth:`slq_trace` with the probe count chosen adaptively —
        the shared :func:`slq.adaptive_probe_loop` driver drawing
        ``batch`` probes per round through THIS tier's kernel path until
        the sample standard error certifies ``target_rel_stderr`` (or
        ``max_probes``). One compiled shape per distinct batch size."""
        from two_pass_lanczos_tpu.slq import adaptive_probe_loop

        return adaptive_probe_loop(
            lambda sub, take: self.slq_trace(
                f, k=k, num_probes=take, key=sub, probe=probe).samples,
            key, batch=batch, max_probes=max_probes,
            target_rel_stderr=target_rel_stderr)

    def estimate_interval(self, *, margin: float = 0.05, tol: float = 1e-3,
                          key=None):
        """Cached spec(A) interval via two 1-eigenpair eigsh runs on a
        single-device XLA :class:`operators.KKTOperator` over the same
        arrays (the interval is a property of A; the implicit operator is
        ~12 bytes/arc of device memory, cheap even well past the fused
        cap). Multi-host meshes where a single device cannot hold the
        implicit operator should pass ``interval`` explicitly or use
        ``ShardedSparseOperator.estimate_interval`` (VERDICT r4 item 7)."""
        if self._interval_cache is None:
            from two_pass_lanczos_tpu.algorithms.chebyshev import (
                estimate_interval,
            )
            from two_pass_lanczos_tpu.operators import KKTOperator

            d, u, v, p = self._kkt_arrays
            op = KKTOperator(d=jnp.asarray(d), arc_u=jnp.asarray(u),
                             arc_v=jnp.asarray(v), num_nodes=p)
            self._interval_cache = estimate_interval(
                op, margin=margin, tol=tol, key=key)
        return self._interval_cache

    def chebyshev_fAb(self, b, f, *, degree: int = 100, interval=None,
                      raw: bool = False):
        """Storage-free Chebyshev f(A)·b on the arc-sharded fused path:
        the three-term recurrence runs on the duplicated (xu, xv, xn) rep
        under ONE shard_map — every update is elementwise (the duplication
        invariant is preserved), so the ONLY collective is the matvec's
        own O(p) node psum; there are no inner products at all. Covers
        storage-free solves at kernel speed for instances beyond the
        VMEM-resident cap.

        ``interval`` ⊇ spec(A); ``None`` auto-estimates via
        :meth:`estimate_interval` (cached — compute once, pass explicitly
        in production). Multi-host: ``raw=True`` returns the device pair
        ``(xu sharded, xn replicated)``.
        """
        from two_pass_lanczos_tpu.algorithms.chebyshev import (
            chebyshev_coefficients,
            chebyshev_scan,
            validate_interval_for_f,
        )

        if interval is None:
            interval = self.estimate_interval()
        a_lo, a_hi = float(interval[0]), float(interval[1])
        validate_interval_for_f(f, a_lo, a_hi)
        cs = jnp.asarray(
            chebyshev_coefficients(f, interval, degree), jnp.float32)
        scale = jnp.asarray(
            [2.0 / (a_hi - a_lo), (a_hi + a_lo) / (a_hi - a_lo)],
            jnp.float32)
        bu, bv, bn = self.pack(b)

        ck = ("cheb", degree)
        if ck not in self._solve_cache:
            def run(arrs_and_wins, bu_, bv_, bn_, cs_, scale_):
                arrs = tuple(a[0] for a in arrs_and_wins[:8])
                wins = tuple(w[0] for w in arrs_and_wins[8:])
                matvec, _ = self._shard_helpers(arrs, wins)
                mv = lambda t: tuple(matvec(*t))
                acc = chebyshev_scan(mv, (bu_[0], bv_[0], bn_), cs_, scale_)
                return acc[0][None], acc[2]

            self._solve_cache[ck] = jax.jit(jax.shard_map(
                run, mesh=self.mesh,
                in_specs=(tuple([P(self.axis)] * 10), P(self.axis),
                          P(self.axis), P(), P(), P()),
                out_specs=(P(self.axis), P()),
                check_vma=False,
            ))
        xu, xn = self._solve_cache[ck](
            self._arrs + self._wins, bu, bv, bn, cs, scale)
        if raw:
            return xu, xn
        return self.unpack(xu, xn)

    def _matvec_fn(self):
        # cached like the solver path: rebuilding jit(shard_map(...)) per
        # call would pay retrace+compile every time
        key = ("matvec",)
        if key not in self._solve_cache:
            axis = self.axis

            def run(arrs_and_wins, xu, xv, xn):
                arrs = tuple(a[0] for a in arrs_and_wins[:8])
                wins = tuple(w[0] for w in arrs_and_wins[8:])
                yu, yv, s_local = self._local_matvec_call(
                    arrs, wins, xu[0], xv[0], xn)
                return yu[None], lax.psum(s_local, axis)

            self._solve_cache[key] = jax.jit(jax.shard_map(
                run, mesh=self.mesh,
                in_specs=(tuple([P(axis)] * 10), P(axis), P(axis), P()),
                out_specs=(P(axis), P()),
                check_vma=False,
            ))
        return self._solve_cache[key]

    def matvec(self, x) -> np.ndarray:
        """One distributed matvec (testing hook)."""
        bu, bv, bn = self.pack(x)
        yu, yn = self._matvec_fn()(self._arrs + self._wins, bu, bv, bn)
        return self.unpack(yu, yn)
