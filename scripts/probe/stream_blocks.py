"""Does DMA block size limit the streaming throughput? stream-only kernel
(y = d*x over all 8 planes + x/y) at 1/2/4/8 chunks per grid step."""

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
from two_pass_lanczos_tpu.ops.kkt_fused import CHUNK, LANE, VMEM_LIMIT, SortedKKTLayout

arcs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
blocks = [int(x) for x in sys.argv[2:]] or [1, 4]

inst = generate_mcf_instance(arcs, rho=3, instance_id=1)
m, p = inst.num_arcs, inst.num_nodes
lay = SortedKKTLayout.build(inst.quad_costs.astype(np.float32) * 1e-3,
                            inst.arc_u, inst.arc_v, p, windowed=True)
arrs = tuple(jnp.asarray(a) for a in (
    lay.u.d2, lay.u.es2, lay.u.eo2, lay.v.d2, lay.v.es2, lay.v.eo2))
rng = np.random.default_rng(0)
xu = jnp.asarray(rng.standard_normal((lay.u.R, LANE)).astype(np.float32) * 1e-3)
xv = jnp.asarray(rng.standard_normal((lay.v.R, LANE)).astype(np.float32) * 1e-3)

for nb in blocks:
    rows = CHUNK * nb
    C = lay.u.C // nb

    def kern(du, esu, eou, dv, esv, eov, xu_r, xv_r, yu, yv):
        for x_ref, y_ref, d_ref, es_ref, eo_ref in (
                (xu_r, yu, du, esu, eou), (xv_r, yv, dv, esv, eov)):
            es = es_ref[:].astype(jnp.float32)
            eo = eo_ref[:].astype(jnp.float32)
            y_ref[:] = d_ref[:] * x_ref[:] + 1e-30 * (es + eo)

    blk = lambda: pl.BlockSpec((rows, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    r_used = C * rows
    call = pl.pallas_call(
        kern, grid=(C,),
        in_specs=[blk()] * 8,
        out_specs=[blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct((r_used, LANE), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )
    a_used = tuple(a[:r_used] for a in arrs)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(xu, xv, *, iters, call=call, a_used=a_used, r_used=r_used):
        def body(_, st):
            return call(*a_used, st[0], st[1])
        yu, yv = lax.fori_loop(0, iters, body, (xu[:r_used], xv[:r_used]))
        return jnp.sum(yu[:1]) + jnp.sum(yv[:1])

    lo, hi = 32, 32 + 400
    def sample(n):
        t0 = time.perf_counter(); float(chain(xu, xv, iters=n))
        return time.perf_counter() - t0
    sample(lo); sample(hi)
    tlo = min(sample(lo) for _ in range(4))
    thi = min(sample(hi) for _ in range(4))
    per = (thi - tlo) / (hi - lo)
    byt = r_used * LANE * (4 + 2 + 2 + 4 + 4) * 2
    print(f"block={nb} chunks: {per*1e6:8.1f} us/matvec  "
          f"{byt/per/1e9:6.1f} GB/s effective", flush=True)
