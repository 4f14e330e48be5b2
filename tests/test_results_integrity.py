"""Published-artifact integrity: every CSV in results/ that mirrors a
reference artifact must exist with the reference's column schema (plus our
documented extensions) and a sane grid; the plots referenced by REPORT.md
must exist. Guards the reproduction claims against silent drift when
experiments are re-run piecemeal.
"""

import csv
from pathlib import Path

import numpy as np
import pytest

RESULTS = Path(__file__).resolve().parent.parent / "results"
REF_RESULTS = Path("/root/reference/results")

ACCURACY_HDR = ["k", "relative_error_standard", "relative_error_two_pass",
                "relative_solution_deviation"]
ORTHO_HDR = ["k", "ortho_loss_standard", "ortho_loss_regenerated",
             "basis_drift_fro", "solution_deviation_l2"]
#: reference schemas + our documented extensions: time_min_s (time_s is a
#: median of --repeats samples on the ±30%-noise tunneled chip) and
#: device_peak_kb (on accelerators rss_kb reflects host staging only)
TRADEOFF_HDR = ["variant", "k", "time_s", "time_min_s", "rss_kb",
                "device_peak_kb"]
SCAL_HDR = ["variant", "n", "k", "time_s", "time_min_s", "rss_kb",
            "device_peak_kb"]

EXPECTED = {
    "accuracy_exp_well-conditioned.csv": ACCURACY_HDR,
    "accuracy_exp_ill-conditioned.csv": ACCURACY_HDR,
    "accuracy_inv_well-conditioned.csv": ACCURACY_HDR,
    "accuracy_inv_ill-conditioned.csv": ACCURACY_HDR,
    "accuracy_inv_well-conditioned_tpu_df.csv": ACCURACY_HDR,
    "accuracy_inv_ill-conditioned_tpu_df.csv": ACCURACY_HDR,
    "accuracy_exp_well-conditioned_tpu_df.csv": ACCURACY_HDR,
    "accuracy_exp_ill-conditioned_tpu_df.csv": ACCURACY_HDR,
    "orthogonality_exp_well-conditioned.csv": ORTHO_HDR,
    "orthogonality_exp_ill-conditioned.csv": ORTHO_HDR,
    "orthogonality_inv_well-conditioned.csv": ORTHO_HDR,
    "orthogonality_inv_ill-conditioned.csv": ORTHO_HDR,
    "tradeoff_arcs5k_rho3.csv": TRADEOFF_HDR,
    "tradeoff_arcs50k_rho3.csv": TRADEOFF_HDR,
    "tradeoff_arcs500k_rho3.csv": TRADEOFF_HDR,
    "tradeoff_arcs500k_rho3_cpu_f64.csv": TRADEOFF_HDR,
    "scalability_k500_rho3.csv": SCAL_HDR,
    "dense_tradeoff.csv": TRADEOFF_HDR,
    # beyond-reference artifact: experiments/reorth_study.py
    "reorth_inv_ill-conditioned_f32.csv": [
        "k", "relative_error_plain", "relative_error_reorth",
        "relative_error_selective", "ortho_defect_plain",
        "ortho_defect_reorth", "ortho_defect_selective",
        "reorth_steps_selective"],
    # beyond-reference artifact: experiments/certificate_study.py
    "error_certificate_inv_well-conditioned.csv": [
        "j", "lower_bound", "upper_bound", "true_error_a_norm",
        "lagged_update_estimate"],
}


@pytest.mark.parametrize("name,header", sorted(EXPECTED.items()),
                         ids=sorted(EXPECTED))
def test_published_csv_schema(name, header):
    path = RESULTS / name
    assert path.exists(), f"published artifact missing: {name}"
    with open(path) as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == header, rows[0]
    assert len(rows) > 1, "artifact has no data rows"
    # every data cell parses as a number (variant column excepted)
    skip = 1 if rows[0][0] == "variant" else 0
    for r in rows[1:3]:
        for cell in r[skip:]:
            float(cell)


@pytest.mark.skipif(not REF_RESULTS.exists(),
                    reason="reference results not mounted")
@pytest.mark.parametrize("name", [
    "orthogonality_inv_ill-conditioned.csv",
    "accuracy_inv_well-conditioned.csv",
])
def test_grid_matches_reference(name):
    """Row-for-row k-grid parity with the reference's published CSV
    (VERDICT r2 missing #3: the inv/ill ortho sweep's finer grid)."""
    ours = [r["k"] for r in csv.DictReader(open(RESULTS / name))]
    ref = [r["k"] for r in csv.DictReader(open(REF_RESULTS / name))]
    assert ours == ref


DF_SCENARIOS = ["exp_well", "exp_ill", "inv_well", "inv_ill"]


@pytest.mark.parametrize("scen", DF_SCENARIOS)
def test_df_grid_matches_reference_grid(scen):
    """The on-chip df accuracy artifacts cover the reference's FULL 20-row
    k grid for every scenario (VERDICT r3 missing #3 / weak #6: the round-3
    artifact had 4 rows for one scenario)."""
    fn, sc = scen.split("_")
    ours = [r["k"] for r in csv.DictReader(
        open(RESULTS / f"accuracy_{fn}_{sc}-conditioned_tpu_df.csv"))]
    assert ours == [str(k) for k in range(10, 201, 10)]
    if REF_RESULTS.exists():
        ref = [r["k"] for r in csv.DictReader(
            open(REF_RESULTS / f"accuracy_{fn}_{sc}-conditioned.csv"))]
        assert ours == ref


@pytest.mark.parametrize("scen", DF_SCENARIOS)
def test_df_accuracy_tracks_f64_oracle(scen):
    """f64-class as a published artifact, not just a coefficient claim:
    at k=200 the on-chip double-float error tracks the CPU-f64 run with
    the IDENTICAL seed-42 b (results/accuracy_*.csv) within an order of
    magnitude — measured 1.0001x (inv/ill), 1.0002x (inv/well), ~4x on
    the machine-precision exp scenarios (where both sit at ~1e-14). The
    reference's own CSVs differ only by its RNG's b draw."""
    fn, sc = scen.split("_")
    df_rows = {r["k"]: r for r in csv.DictReader(
        open(RESULTS / f"accuracy_{fn}_{sc}-conditioned_tpu_df.csv"))}
    f64_rows = {r["k"]: r for r in csv.DictReader(
        open(RESULTS / f"accuracy_{fn}_{sc}-conditioned.csv"))}
    e_df = float(df_rows["200"]["relative_error_two_pass"])
    e_64 = float(f64_rows["200"]["relative_error_two_pass"])
    assert e_df <= 10 * max(e_64, 1e-14), (e_df, e_64)
    # df one-pass vs two-pass deviation stays at df working precision
    assert float(df_rows["200"]["relative_solution_deviation"]) < 1e-12


def test_df_overlay_plot_published():
    """The four-panel f64-vs-df overlay figure (python/plot_df_accuracy.py)
    pairing each CPU-f64 accuracy sweep with its on-chip df counterpart."""
    assert (RESULTS / "images" / "accuracy_df_overlay.pdf").exists()


def test_transition_artifact_complete():
    """The round-3 inv/ill transition artifact: three per-seed sweeps, the
    median CSV, and the plot (REPORT.md §1)."""
    for s in (7, 42, 101):
        p = RESULTS / f"accuracy_inv_ill_transition_seed{s}.csv"
        assert p.exists(), p
    med = RESULTS / "accuracy_inv_ill_transition_median.csv"
    rows = list(csv.DictReader(open(med)))
    ks = [int(r["k"]) for r in rows]
    assert ks[0] == 100 and ks[-1] == 300 and ks[1] - ks[0] == 5
    at200 = [r for r in rows if r["k"] == "200"][0]
    # the settled claim: median at k=200 is the reference's order (~1e-5/-6)
    assert float(at200["median_relative_error_standard"]) < 5e-5
    assert (RESULTS / "images" / "transition_inv_ill-conditioned.pdf").exists()


def test_reorth_artifact_story():
    """The published reorth study carries its documented claims: CGS2
    keeps the basis orthonormal at every k (plain collapses), and past
    stagnation the reorth error is a stable function of k while the
    plain error jumps erratically (README "Full reorthogonalization")."""
    rows = list(csv.DictReader(open(RESULTS /
                                    "reorth_inv_ill-conditioned_f32.csv")))
    assert int(rows[-1]["k"]) >= 400
    defects_r = [float(r["ortho_defect_reorth"]) for r in rows]
    defects_p = [float(r["ortho_defect_plain"]) for r in rows]
    assert max(defects_r) < 1e-5
    assert max(defects_p) > 1e-2
    tail = [r for r in rows if int(r["k"]) >= 160]
    errs_r = [float(r["relative_error_reorth"]) for r in tail]
    errs_p = [float(r["relative_error_plain"]) for r in tail]
    assert max(errs_r) / min(errs_r) < 1.5, "reorth error not stable in k"
    assert max(errs_p) / min(errs_p) > 5.0, "plain error unexpectedly stable"
    # selective: semi-orthogonality held at a fraction of the sweeps, and
    # the error is as stable as full reorth's
    defects_s = [float(r["ortho_defect_selective"]) for r in rows]
    assert max(defects_s) < 2 * np.sqrt(np.finfo(np.float32).eps)
    errs_s = [float(r["relative_error_selective"]) for r in tail]
    assert max(errs_s) / min(errs_s) < 1.5, "selective error not stable in k"
    k_last, sw_last = int(rows[-1]["k"]), int(rows[-1]["reorth_steps_selective"])
    assert 0 < sw_last < k_last // 2, (sw_last, k_last)
    assert (RESULTS / "images" /
            "reorth_inv_ill-conditioned_f32.pdf").exists()


def test_bench_json_contract():
    """bench.py's output contract (the driver records it every round):
    one JSON object with the documented fields — including the round-5
    beyond-VMEM streaming leg. Parsed from source shape rather than run
    (a full bench needs the real chip)."""
    src = (RESULTS.parent / "bench.py").read_text()
    for field in ("metric", "value", "unit", "vs_baseline",
                  "value_min", "samples", "streaming_solve_wallclock_s",
                  "streaming_solve_device_s",
                  "streaming_us_per_matvec_upper",
                  "k1000_wallclock_s", "k1000_vs_baseline",
                  "watchdog_truncated"):
        assert field in src, field
    assert "json.dumps(record)" in src


@pytest.mark.parametrize("with_headline", [True, False])
def test_bench_watchdog_flushes_partials(with_headline, tmp_path):
    """The bench watchdog's two exits (exercised in a subprocess — fire()
    calls os._exit): with a measured headline it flushes the completed
    legs as one JSON line with watchdog_truncated=true and exits 0; with
    no headline it emits nothing parseable and exits 3."""
    import json as _json
    import subprocess
    import sys

    code = f"""
import sys, time
sys.path.insert(0, {str(RESULTS.parent)!r})
import bench
bench.WATCHDOG_S = 0.2
record = {{"metric": "m", "value": 1.5, "unit": "s"}} if {with_headline} else {{}}
bench._arm_watchdog(record)
time.sleep(10)  # fire() must _exit before this returns
"""
    r = subprocess.run([sys.executable, "-c", code], timeout=60,
                       capture_output=True, text=True)
    if with_headline:
        assert r.returncode == 0, (r.returncode, r.stderr)
        rec = _json.loads(r.stdout.strip().splitlines()[-1])
        assert rec["watchdog_truncated"] is True and rec["value"] == 1.5
    else:
        assert r.returncode == 3, (r.returncode, r.stderr)
        assert "aborting without a metric" in r.stderr


def _rows(name):
    return list(csv.DictReader(open(RESULTS / name)))


def test_tradeoff_500k_device_memory_story():
    """The published on-chip 500k tradeoff carries the paper's memory
    thesis in the column where it is physical on an accelerator:
    device_peak_kb is FLAT in k for two-pass (O(n) work vectors) and
    LINEAR in k for standard (the O(nk) HBM basis slab), separating by
    >= 20x at k >= 500 — the reference's own rss_kb artifact shows 20.9x
    (``/root/reference/results/tradeoff_arcs500k_rho3.csv``).

    rss_kb must NOT invert the story: on TPU the basis lives in HBM, so
    host VmPeak is variant-independent (measured r5 probe: standard
    1,295,396 vs two-pass 1,299,616 KB at k=1000 — equal within noise);
    the old cumulative in-process sweep showed two-pass 1.8x ABOVE
    standard, which is the failure this pins against."""
    rows = _rows("tradeoff_arcs500k_rho3.csv")
    std = {int(r["k"]): r for r in rows if r["variant"] == "standard"}
    two = {int(r["k"]): r for r in rows if r["variant"] == "two-pass"}
    ks = sorted(std)
    assert ks == sorted(two) and ks[0] <= 100 and ks[-1] >= 1000
    for k in ks:
        if k >= 500:
            ratio = (float(std[k]["device_peak_kb"])
                     / float(two[k]["device_peak_kb"]))
            assert ratio >= 20.0, (k, ratio)
            # host rss: equal within noise, never inverted
            rss_ratio = float(two[k]["rss_kb"]) / float(std[k]["rss_kb"])
            assert rss_ratio < 1.15, (k, rss_ratio)
    # two-pass flat in k; standard linear in k
    two_dev = [float(two[k]["device_peak_kb"]) for k in ks]
    assert max(two_dev) / min(two_dev) < 1.5, two_dev
    std_lo = float(std[ks[1]]["device_peak_kb"])
    std_hi = float(std[ks[-1]]["device_peak_kb"])
    growth = std_hi / std_lo
    expected = ks[-1] / ks[1]
    assert growth > 0.5 * expected, (growth, expected)


def test_tradeoff_500k_cpu_f64_rss_story():
    """The literal reference memory story in the reference's own
    semantics: with the CPU-f64 backend the Krylov basis lives in HOST
    memory, so isolated per-(variant,k) VmPeak must order exactly as the
    reference's artifact does — two-pass rss_kb < standard rss_kb at
    k >= 500, with a gap on the order of the n*k*8-byte basis
    (~2.2 GB at k=500, ~4.4 GB at k=1000 for n≈550k)."""
    rows = _rows("tradeoff_arcs500k_rho3_cpu_f64.csv")
    std = {int(r["k"]): float(r["rss_kb"])
           for r in rows if r["variant"] == "standard"}
    two = {int(r["k"]): float(r["rss_kb"])
           for r in rows if r["variant"] == "two-pass"}
    assert set(std) == set(two) and max(std) >= 1000
    for k in sorted(std):
        if k >= 500:
            assert two[k] < std[k], (k, std[k], two[k])
            basis_kb = 550_000 * k * 8 / 1024
            assert std[k] - two[k] > 0.5 * basis_kb, (k, std[k], two[k])


def test_scalability_device_memory_story():
    """The scalability sweep's device column separates the variants at
    every n (two-pass O(n) vs standard O(nk) at k=500), >= 20x at the
    largest size — the reference's 500k row shows ~10.7x in host rss
    (``scalability_k500_rho3.csv``: 2,090,524 vs 194,472)."""
    rows = _rows("scalability_k500_rho3.csv")
    std = {int(r["n"]): float(r["device_peak_kb"])
           for r in rows if r["variant"] == "standard"}
    two = {int(r["n"]): float(r["device_peak_kb"])
           for r in rows if r["variant"] == "two-pass"}
    ns = sorted(std)
    assert ns == sorted(two) and len(ns) >= 8
    assert all(std[n] > two[n] for n in ns)
    assert std[ns[-1]] / two[ns[-1]] >= 20.0


def test_scalability_growth_rate_validates_basis_model():
    """The reference's memory-growth-model validation, in the column where
    the basis is physical on an accelerator: regressing the per-n
    (standard − two-pass) device_peak_kb difference against n must recover
    the O(nk) basis-slab slope ≈ k·4 B/n (f32) — the TPU analogue of the
    reference's measured 4008 vs theoretical 4000 B/n in f64 host RSS
    (``tex/report.tex:464``; ``python/calculate_growth_rate.py``).
    Measured on the round-5 regenerated artifact: 2248 B/n, r² = 0.987."""
    from scipy import stats

    rows = _rows("scalability_k500_rho3.csv")
    k = int(rows[0]["k"])
    std = {int(r["n"]): float(r["device_peak_kb"])
           for r in rows if r["variant"] == "standard"}
    two = {int(r["n"]): float(r["device_peak_kb"])
           for r in rows if r["variant"] == "two-pass"}
    ns = sorted(std)
    diff_kb = [std[n] - two[n] for n in ns]
    res = stats.linregress(np.asarray(ns, float), np.asarray(diff_kb))
    bytes_per_n = res.slope * 1024.0
    theory = k * 4.0  # f32 basis slab
    assert 0.8 * theory < bytes_per_n < 1.6 * theory, bytes_per_n
    assert res.rvalue ** 2 > 0.9, res.rvalue**2


def test_capability_onchip_artifact():
    """REPORT §13's "validated on hardware" claim has a committed,
    re-runnable proof: scripts/probe/capability_smoke.py --output wrote
    results/capability_onchip.json on the real chip, every block passed
    (VERDICT r4 item 6)."""
    import json

    data = json.loads((RESULTS / "capability_onchip.json").read_text())
    assert data["backend"] == "tpu", data["backend"]
    blocks = data["blocks"]
    assert len(blocks) >= 9
    names = {b["name"] for b in blocks}
    for frag in ("slq_trace", "eigsh", "chebyshev", "block",
                 "selective", "radau"):
        assert any(frag in n for n in names), frag
    for b in blocks:
        assert b["pass"] is True, b
        assert b["wall_s"] >= 0.0


def test_certificate_artifact_story():
    """The published certificate study carries its claim: the TRUE A-norm
    error never leaves the rigorous Gauss-Radau bracket, at any recorded
    step (the f64 slack is microscopic next to the bracket widths), and
    the bracket actually converges by orders of magnitude."""
    rows = list(csv.DictReader(open(
        RESULTS / "error_certificate_inv_well-conditioned.csv")))
    assert len(rows) >= 50
    ups, lows = [], []
    for r in rows:
        lo = float(r["lower_bound"])
        up = float(r["upper_bound"])
        true = float(r["true_error_a_norm"])
        assert lo <= true * (1 + 1e-8) + 1e-12, (r["j"], lo, true)
        assert true <= up * (1 + 1e-8) + 1e-12, (r["j"], true, up)
        lows.append(lo)
        ups.append(up)
    assert ups[-1] < 1e-5 * ups[0]
