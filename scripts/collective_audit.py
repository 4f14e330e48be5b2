"""Record the multi-device evidence table (VERDICT r1 item 5).

Runs on a virtual CPU mesh (no TPU pod reachable in this environment):

1. per-step collective instructions + bytes from the COMPILED HLO of both
   distributed designs (generic row partition vs arc-sharded fused);
2. the nnz-balance table of the snake row partition;
3. virtual-mesh solve wall times at ndev in {1, 2, 4, 8} (CPU-backend
   times — useful for relative sanity only, not for ICI projections).

Usage::

    JAX_PLATFORMS= python scripts/collective_audit.py --arcs 500000

(the script forces the CPU backend + 8 virtual devices itself).
Recorded output lives in PERF.md "Distributed design — measured evidence".
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arcs", type=int, default=500_000)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--rho", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    import numpy as np
    from jax.sharding import Mesh

    from two_pass_lanczos_tpu.models.generator import generate_mcf_instance
    from two_pass_lanczos_tpu.parallel.fused_sharded import ShardedFusedKKTSolver
    from two_pass_lanczos_tpu.parallel.sharded import ShardedSparseOperator
    from two_pass_lanczos_tpu.utils.collectives import collectives_in_hlo

    inst = generate_mcf_instance(args.arcs, rho=args.rho, instance_id=1)
    n = inst.num_arcs + inst.num_nodes
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    mesh8 = Mesh(np.array(jax.devices()[:8]), ("rows",))

    # --- 1. collective tables from compiled HLO (8 devices) ---
    op = ShardedSparseOperator.from_kkt_arrays(inst, mesh8, dtype=np.float64)
    txt = op._solver(args.k, "inv", "two_pass").lower(
        op.local_blocks, op._prepare_b(b)).compile().as_text()
    generic = [vars(o) | {"bytes_out": o.bytes_out}
               for o in collectives_in_hlo(txt)]

    sf = ShardedFusedKKTSolver(inst.quad_costs.astype(np.float32),
                               inst.arc_u, inst.arc_v, inst.num_nodes,
                               mesh8, interpret=True)
    bu, bv, bn = sf.pack(b)
    txtf = sf._solver(args.k, "inv", "two_pass").lower(
        sf._arrs + sf._wins, bu, bv, bn).compile().as_text()
    fused = [vars(o) | {"bytes_out": o.bytes_out}
             for o in collectives_in_hlo(txtf)]

    # per-step = one instance of the vector collective in each design
    gather_step = max(o["bytes_out"] // o["count"] for o in generic
                      if o["kind"] == "all-gather")
    psum_step = max(o["bytes_out"] // o["count"] for o in fused
                    if o["kind"] == "all-reduce" and tuple(o["shape"]) != ())
    print(json.dumps({
        "instance": {"arcs": inst.num_arcs, "nodes": inst.num_nodes, "n": n},
        "generic_collectives": generic,
        "fused_collectives": fused,
        "per_step_measured": {
            "generic_all_gather_bytes": gather_step,
            "fused_psum_bytes": psum_step,
            "ratio": round(gather_step / psum_step, 1),
        },
    }))

    # --- 1b. df sharded design at 8 devices, lowered-StableHLO level ---
    # (no XLA compile: the interpret-mode df kernels' CPU compile explodes
    # superlinearly past 4 devices — lowering alone is seconds and the
    # collective structure is already final at StableHLO)
    from two_pass_lanczos_tpu.parallel.fused_sharded_df import (
        DFShardedFusedKKTSolver,
    )
    from two_pass_lanczos_tpu.utils.collectives import collectives_in_stablehlo

    inst_df = generate_mcf_instance(min(args.arcs, 20_000), rho=args.rho,
                                    instance_id=1)
    sdf = DFShardedFusedKKTSolver(inst_df.quad_costs, inst_df.arc_u,
                                  inst_df.arc_v, inst_df.num_nodes, mesh8,
                                  interpret=True)
    bdf = rng.standard_normal(sdf.n)
    xu, xv, xn = sdf.pack(bdf)
    txt_df = sdf._p1(args.k).lower(sdf._arrs + sdf._wins, xu, xv, xn).as_text()
    df_ops = [vars(o) | {"bytes_out": o.bytes_out}
              for o in collectives_in_stablehlo(txt_df)]
    print(json.dumps({
        "df_sharded_8dev_lowered": df_ops,
        "df_invariant": "all-gather only (df partials folded locally in "
                        "device order); an all-reduce here would re-round "
                        "df to f32",
        "df_all_reduce_count": sum(o["count"] for o in df_ops
                                   if o["kind"] == "all-reduce"),
    }))

    # --- 2. nnz balance ---
    per = op.nnz_per_device
    print(json.dumps({
        "nnz_per_device": per.tolist(),
        "imbalance_max_over_mean": round(float(per.max() / per.mean()), 5),
    }))

    # --- 3. virtual-mesh wall times (relative sanity only) ---
    times = {}
    for ndev in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
        o = ShardedSparseOperator.from_kkt_arrays(inst, mesh, dtype=np.float64)
        o.solve_fAb(b, k=args.k, f="inv", method="two_pass")  # compile
        t0 = time.perf_counter()
        o.solve_fAb(b, k=args.k, f="inv", method="two_pass")
        times[ndev] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"virtual_mesh_solve_s": times,
                      "note": "CPU-backend wall times; collectives are "
                              "memcpy on a virtual mesh — use the HLO byte "
                              "table for ICI projections"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
