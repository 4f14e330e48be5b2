"""Multi-host (multi-process jax.distributed) smoke of the fused sharded
solver: two OS processes x 4 virtual CPU devices = one 8-device global mesh
spanning process boundaries. This is the strategy SURVEY §4 prescribes for
the capability the reference cannot test (it is single-threaded), and the
off-pod realization of BASELINE config 5 (N >= 2 hosts).

The subprocesses run scripts/multihost_smoke.py; the oracle ||b|| comes from
an in-process computation on the identical seeded instance.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_solve():
    # oracle: same seeded instance as the smoke script
    rng = np.random.default_rng(11)
    m, p = 4000, 300
    rng.integers(0, p, m)
    rng.integers(0, p - 1, m)
    rng.uniform(1.0, 3.0, m)
    b = rng.standard_normal(m + p).astype(np.float32)
    # the fused dot counts each arc once + nodes once = plain ||b||
    bnorm = float(np.linalg.norm(b.astype(np.float64)))

    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "scripts" / "multihost_smoke.py"),
             "--num-processes", "2", "--process-id", str(pid),
             "--coordinator", f"localhost:{port}",
             "--expect-bnorm", repr(bnorm)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
            env={**os.environ,
                 "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}"}))
    outs = []
    for pr in procs:
        try:
            out, err = pr.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail("multihost smoke timed out")
        outs.append((pr.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-2000:]}"
    assert any("MULTIHOST_OK" in out for _, out, _ in outs)


def test_scaling_artifact_published():
    """The committed virtual-mesh scaling artifact
    (results/scaling_virtual.json, VERDICT r3 item 2) carries the
    documented schema: fused+generic at nproc {1,2,4}, df at the <=4-device
    meshes, every record marked meaningful:false (1-core CPU host — the
    same command with --backend tpu on a pod produces the BASELINE >=80%
    measurement), plus the command line to re-run it."""
    import json

    art = Path(__file__).resolve().parents[1] / "results" / "scaling_virtual.json"
    assert art.exists(), "results/scaling_virtual.json not committed"
    doc = json.loads(art.read_text())
    assert "--backend tpu" not in doc["command"]
    metrics = {r["metric"]: r for r in doc["records"] if "metric" in r}
    for design in ("fused", "generic"):
        for nproc in (1, 2, 4):
            r = metrics[f"scaling_{design}_nproc{nproc}"]
            assert r["seconds_per_step"] > 0 and r["nnz_per_s"] > 0
            assert r["meaningful"] is False
    # df present on the <=4-total-device meshes (interpret-mode compile
    # explodes past 4; a TPU pod run has no such limit)
    assert "scaling_df_nproc1" in metrics and "scaling_df_nproc2" in metrics
    assert any("note" in r for r in doc["records"])


@pytest.mark.slow
def test_scaling_bench_four_process_with_df():
    """4-process jax.distributed sweep including the double-float sharded
    design (VERDICT r3 item 2's done-criterion): df runs on the <=4-device
    legs, f32 designs on all legs, schema identical to the artifact's."""
    import json

    script = Path(__file__).resolve().parent.parent / "scripts" / "scaling_bench.py"
    proc = subprocess.run(
        [sys.executable, str(script), "--processes", "1", "4",
         "--arcs", "8000", "--k", "6", "--reps", "1",
         "--devices-per-process", "1",
         "--designs", "fused", "generic", "df", "--port", "8617"],
        capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-2000:]
    records = [json.loads(l) for l in proc.stdout.splitlines()
               if l.startswith("{")]
    metrics = {r["metric"]: r for r in records if "metric" in r}
    for design in ("fused", "generic", "df"):
        for nproc in (1, 4):
            r = metrics[f"scaling_{design}_nproc{nproc}"]
            assert r["seconds_per_step"] > 0
            assert r["ndev"] == nproc


def test_scaling_bench_two_process_schema():
    """`scripts/scaling_bench.py` (the BASELINE >=80%-efficiency
    measurement artifact) runs 1- and 2-process sweeps on the virtual mesh
    and emits the documented JSON schema for both distributed designs
    (VERDICT r2 item 5). Virtual numbers are correctness-grade only; the
    same command runs unmodified on a pod."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parent.parent / "scripts" / "scaling_bench.py"
    proc = subprocess.run(
        [sys.executable, str(script), "--processes", "1", "2",
         "--arcs", "20000", "--k", "8", "--reps", "1", "--port", "8603"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    records = [json.loads(l) for l in proc.stdout.splitlines()
               if l.startswith("{")]
    metrics = {r["metric"]: r for r in records if "metric" in r}
    for design in ("fused", "generic"):
        for nproc in (1, 2):
            r = metrics[f"scaling_{design}_nproc{nproc}"]
            assert r["seconds_per_step"] > 0
            assert r["nnz_per_s"] > 0
            assert r["ndev"] == 4 * nproc
            assert r["meaningful"] is False  # virtual mesh
        assert metrics[f"scaling_{design}_nproc1"][
            "efficiency_vs_1proc"] == 1.0
