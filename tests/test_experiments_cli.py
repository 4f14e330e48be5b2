"""Experiment-CLI plumbing: the median-of-N timing knob and the
per-(variant,k) process isolation added for the published-artifact fixes
(VERDICT r3 items 6 and 8).
"""

import csv
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def test_timed_solve_repeats():
    import jax.numpy as jnp

    from two_pass_lanczos_tpu.experiments.common import SolveSeconds, timed_solve

    calls = []

    def fn():
        calls.append(1)
        return jnp.ones(8)

    out, dt = timed_solve(fn, repeats=5)
    assert len(calls) == 5
    assert isinstance(dt, SolveSeconds)
    assert len(dt.samples) == 5
    assert dt.min_s <= float(dt) <= max(dt.samples)
    assert float(dt) == float(np.median(dt.samples))
    # repeats=1 (every legacy call site) still yields the float-compatible
    # single sample
    _, dt1 = timed_solve(fn)
    assert len(dt1.samples) == 1 and float(dt1) == dt1.min_s


def test_reorth_study_cli_schema(tmp_path):
    """The study CLI emits the full three-variant schema (incl. the
    selective sweep count) on a tiny grid."""
    import csv

    from two_pass_lanczos_tpu.experiments.reorth_study import main

    out = tmp_path / "study.csv"
    rc = main(["--function", "inv", "--scenario", "well-conditioned",
               "--size", "64", "--k-min", "5", "--k-max", "15",
               "--k-step", "5", "--dtype", "f64", "--output", str(out)])
    assert rc == 0
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 3
    assert set(rows[0].keys()) == {
        "k", "relative_error_plain", "relative_error_reorth",
        "relative_error_selective", "ortho_defect_plain",
        "ortho_defect_reorth", "ortho_defect_selective",
        "reorth_steps_selective"}
    # f64 well-conditioned: selective fires nothing, matches plain exactly
    for r in rows:
        assert int(r["reorth_steps_selective"]) == 0
        assert float(r["relative_error_selective"]) == float(
            r["relative_error_plain"])


def test_tradeoff_isolated_per_variant_k(tmp_path):
    """--isolate spawns one worker per (variant, k): every row's rss_kb is a
    single-configuration VmPeak (the reference's semantics), and the CSV
    carries the median + min timing columns."""
    out = tmp_path / "t.csv"
    proc = subprocess.run(
        [sys.executable, "-m", "two_pass_lanczos_tpu.experiments.tradeoff",
         "--arcs", "2000", "--k-start", "4", "--k-end", "8", "--k-step", "4",
         "--repeats", "3", "--isolate", "--cpu-f64",
         "--output", str(out)],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out) as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == ["variant", "k", "time_s", "time_min_s", "rss_kb",
                       "device_peak_kb"]
    data = rows[1:]
    assert len(data) == 4  # 2 variants x 2 ks
    assert {r[0] for r in data} == {"standard", "two-pass"}
    for r in data:
        t_med, t_min, rss = float(r[2]), float(r[3]), int(r[4])
        assert 0 < t_min <= t_med
        assert rss > 0


def test_certificate_study_cli_schema(tmp_path):
    """The certificate study CLI emits the bracket schema and the bracket
    encloses the true error on a tiny SPD run."""
    import csv

    from two_pass_lanczos_tpu.experiments.certificate_study import main

    out = tmp_path / "cert.csv"
    rc = main(["--size", "128", "--k", "24", "--stride", "3",
               "--output", str(out)])
    assert rc == 0
    rows = list(csv.DictReader(open(out)))
    assert set(rows[0].keys()) == {
        "j", "lower_bound", "upper_bound", "true_error_a_norm",
        "lagged_update_estimate"}
    for r in rows:
        lo, up = float(r["lower_bound"]), float(r["upper_bound"])
        true = float(r["true_error_a_norm"])
        assert lo <= true * (1 + 1e-8) + 1e-12
        assert true <= up * (1 + 1e-8) + 1e-12
