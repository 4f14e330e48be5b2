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
    def pack(self, b) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(n,) host vector -> sharded (D,R,128) xu/xv + replicated xn."""
        b = np.asarray(b)
        xu = np.zeros((len(self.layouts), self.R, LANE), np.float32)
        xv = np.zeros_like(xu)
        for d, (lay, ix) in enumerate(zip(self.layouts, self.arc_idx)):
            vals = b[ix].astype(np.float32)
            xu[d].reshape(-1)[lay.u.pos] = vals
            xv[d].reshape(-1)[lay.v.pos] = vals
        xn = np.zeros((self.P2, LANE), np.float32)
        xn.reshape(-1)[: self.p] = b[self.m:]
        return (self._put(xu, P(self.axis)), self._put(xv, P(self.axis)),
                self._put(xn, P()))

    def unpack(self, xu, xn) -> np.ndarray:
        xu = np.asarray(xu)
        xn = np.asarray(xn).reshape(-1)
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

    def _build_solve(self, k: int, f, method: str):
        axis, tol, ztol = self.axis, self.tol, self.ztol

        def run(arrs_and_wins, bu, bv, bn):
            arrs, wins = arrs_and_wins[:8], arrs_and_wins[8:]
            arrs = tuple(a[0] for a in arrs)  # strip sharded leading dim
            wins = tuple(w[0] for w in wins)
            bu, bv = bu[0], bv[0]

            def matvec(xu, xv, xn):
                yu, yv, s_local = self._local_matvec_call(
                    arrs, wins, xu, xv, xn)
                # the ONLY O(p) communication: reduce node partials
                yn = lax.psum(s_local, axis)
                return yu, yv, yn

            def dot(au, an, bu_, bn_):
                # arc part: each arc on exactly one device -> psum;
                # node part: replicated, identical everywhere -> no collective
                return lax.psum(jnp.sum(au * bu_), axis) + jnp.sum(an * bn_)

            nb2 = dot(bu, bn, bu, bn)
            b_norm = jnp.sqrt(nb2)
            zero_b = b_norm <= ztol
            inv_n = jnp.where(zero_b, 0.0, 1.0 / b_norm)
            v1 = (bu * inv_n, bv * inv_n, bn * inv_n)
            zeros = tuple(jnp.zeros_like(c) for c in v1)

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
                return new, (alpha_out, beta_out)

            carry0 = (zeros, v1, jnp.float32(0.0), zero_b,
                      jnp.zeros((), jnp.int32))
            carry, (alphas, betas) = lax.scan(p1_step, carry0, None, length=k)
            steps = carry[4]
            decomp = LanczosDecomposition(
                alphas=alphas, betas=betas, steps_taken=steps, b_norm=b_norm)

            y = padded_f_e1(decomp, f)
            y_full = jnp.where(jnp.arange(k) < steps,
                               y.astype(jnp.float32) * b_norm, 0.0)

            # pass two: stored-beta replay (same collective structure)
            x0 = (y_full[0] * v1[0], y_full[0] * v1[2])

            beta_prevs = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32), betas[:-1]])

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
                x_acc = (x_acc[0] + y_next * v_next[0],
                         x_acc[1] + y_next * v_next[2])
                sel = lambda a, b_: jnp.where(active, a, b_)
                vp_n = tuple(sel(c, p_) for c, p_ in zip(vc, vp))
                vc_n = tuple(sel(nn, c) for nn, c in zip(v_next, vc))
                return (vp_n, vc_n, x_acc), None

            if method == "two_pass" and k > 1:
                xs = (alphas[: k - 1], beta_prevs[: k - 1], betas[: k - 1],
                      y_full[1:], jnp.arange(k - 1))
                (_, _, x_acc), _ = lax.scan(p2_step, (zeros, v1, x0), xs)
            elif method == "two_pass":
                x_acc = x0
            else:
                raise ValueError(
                    "sharded fused solver implements method='two_pass'")
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

    # ------------------------------------------------------------------
    def solve(self, b, *, k: int, f="inv", method: str = "two_pass",
              raw: bool = False):
        """Distributed two-pass f(A)·b. Returns ``(x, decomposition)`` with
        ``x`` a NumPy (n,) array in the original ordering, or — with
        ``raw=True`` — the device pair ``(xu (D,R,128) sharded, xn (P2,128)
        replicated)``. Multi-host runs must use ``raw=True`` (the unpacked
        form requires every shard to be process-addressable); the
        decomposition is replicated and therefore host-readable everywhere."""
        bu, bv, bn = self.pack(b)
        xu, xn, alphas, betas, steps, b_norm = self._solver(k, f, method)(
            self._arrs + self._wins, bu, bv, bn)
        decomp = LanczosDecomposition(
            alphas=alphas, betas=betas, steps_taken=steps, b_norm=b_norm)
        if raw:
            return (xu, xn), decomp
        return self.unpack(xu, xn), decomp

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
