"""Time ONE fused pass_one variant (v1|v2) at k=500/500k — run separately
per variant to avoid double-compile contention on the tunneled chip."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))

import sys, time
import importlib.util
import numpy as np

which = sys.argv[1]
if which == "v1":
    spec = importlib.util.spec_from_file_location(
        "kkt_fused_v1", "/root/repo/scripts/probe/kkt_fused_v1.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["kkt_fused_v1"] = mod
    spec.loader.exec_module(mod)
    Solver = mod.FusedKKTSolver
else:
    from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver as Solver

rng = np.random.default_rng(0); m, p = 500_000, 1155
u = rng.integers(0, p, m).astype(np.int32)
v = ((u+1+rng.integers(0,p-1,m))%p).astype(np.int32)
d = rng.uniform(1,3,m).astype(np.float32)
s = Solver(d, u, v, p)
b = rng.standard_normal(m+p).astype(np.float32)
k = 500
r = s.pack_flat(b)

import jax
@jax.jit
def _p1(bb):
    return s.pass_one(s._split_flat(bb), k).alphas

def run(bb):
    return float(_p1(bb)[k-1])

print("compiling...", flush=True)
a = run(r)
print("alpha[-1]:", a, flush=True)
ts = []
for i in range(9):
    t0=time.perf_counter(); run(r * (1 + 1e-6*i)); ts.append(time.perf_counter()-t0)
print(which, "pass_one:", [round(t,3) for t in ts], "median", round(float(np.median(ts)),4))
