"""Native (C++) component tests: DIMACS parser and instance generator.

Builds ``cpp/`` once per session if a toolchain is available; skips otherwise
(the Python paths are always-available fallbacks, so nothing else depends on
the build).
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
CPP = REPO / "cpp"


@pytest.fixture(scope="session")
def native_build():
    if shutil.which("g++") is None and shutil.which("make") is None:
        pytest.skip("no native toolchain")
    proc = subprocess.run(["make", "-C", str(CPP)], capture_output=True, text=True)
    if proc.returncode != 0:
        pytest.skip(f"native build failed: {proc.stderr[-500:]}")
    return CPP


def test_native_parser_matches_python(native_build, tmp_path):
    import two_pass_lanczos_tpu.utils.data_loader as dl

    # reset the lazy-loaded lib so this test controls the load
    dl._NATIVE = None
    dmx = tmp_path / "t.dmx"
    dmx.write_text(
        "c header\np min 4 5\nn 1 10\nn 4 -10\n"
        "a 1 2 0 5 3\na 2 3 0 5 3\na 3 4 0 5 3\na 1 3 0 5 3\na 2 4 0 5 3\n"
    )
    assert dl._native_lib() is not None
    nodes, arcs, u, v = dl.parse_dmx(dmx)
    pn, pa, pu, pv = dl._parse_dmx_py(dmx)
    assert (nodes, arcs) == (pn, pa) == (4, 5)
    np.testing.assert_array_equal(u, pu)
    np.testing.assert_array_equal(v, pv)


def test_native_parser_error_codes(native_build, tmp_path):
    import two_pass_lanczos_tpu.utils.data_loader as dl

    dl._NATIVE = None
    cases = {
        "noproblem.dmx": "a 1 2 0 5 3\n",
        "zeroidx.dmx": "p min 2 1\na 0 1 0 5 3\n",
        "range.dmx": "p min 2 1\na 1 9 0 5 3\n",
    }
    for name, content in cases.items():
        f = tmp_path / name
        f.write_text(content)
        with pytest.raises(dl.DataLoaderError):
            dl.parse_dmx(f)


def test_mcfgen_output_loads_and_satisfies_structure(native_build, tmp_path):
    from two_pass_lanczos_tpu.models.generator import nodes_for
    from two_pass_lanczos_tpu.utils.data_loader import load_kkt_arrays

    proc = subprocess.run(
        [str(CPP / "mcfgen"), "800", "3", "2", "a", "b", "ns", str(tmp_path)],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
    base = "netgen-800-3-2-a-b-ns"
    arrays = load_kkt_arrays(tmp_path / f"{base}.dmx", tmp_path / f"{base}.qfc")
    assert arrays.num_arcs == 800
    assert arrays.num_nodes == nodes_for(800, 3)  # pargen node formula
    assert (arrays.quad_costs > 0).all()
    assert arrays.arc_u.max() < arrays.num_nodes
    # connectivity via the skeleton chain
    n = arrays.num_nodes
    adj = [[] for _ in range(n)]
    for a, b in zip(arrays.arc_u, arrays.arc_v):
        adj[a].append(b)
        adj[b].append(a)
    seen, stack = {0}, [0]
    while stack:
        for nb in adj[stack.pop()]:
            if nb not in seen:
                seen.add(nb)
                stack.append(nb)
    assert len(seen) == n
    # deterministic in the id (mcfgen creates the output dir itself)
    subprocess.run(
        [str(CPP / "mcfgen"), "800", "3", "2", "a", "b", "ns", str(tmp_path / "again")],
        check=True, capture_output=True,
    )
    a2 = load_kkt_arrays(tmp_path / "again" / f"{base}.dmx", tmp_path / "again" / f"{base}.qfc")
    np.testing.assert_array_equal(arrays.arc_u, a2.arc_u)
    np.testing.assert_allclose(arrays.quad_costs, a2.quad_costs)


def test_mcfgen_instance_passes_property_harness(native_build, tmp_path):
    from two_pass_lanczos_tpu.models.kkt import kkt_operator_from_files
    from two_pass_lanczos_tpu.testing import run_all_properties, seeded_b

    subprocess.run(
        [str(CPP / "mcfgen"), "1000", "2", "1", "b", "a", "s", str(tmp_path)],
        check=True, capture_output=True,
    )
    base = "netgen-1000-2-1-b-a-s"
    sys_ = kkt_operator_from_files(tmp_path / f"{base}.dmx", tmp_path / f"{base}.qfc")
    for rep in run_all_properties(sys_.operator, seeded_b(sys_.n)):
        assert rep.passed, f"{rep.name} = {rep.value:.3e}"


def test_mcfgen_three_stage_pipeline(native_build, tmp_path):
    """Stage-compatible modes: pargen -> .par, netgen < .par -> .dmx,
    qfcgen .dmx -> .qfc (the reference's three-binary pipeline,
    ``src/bin/datagen.rs:124-233``), and the result loads as a KKT system.

    Instance id 1: the raw pipeline (like the reference netgen binary) has
    no retry, and some seeds legitimately produce an invalid index-0 head
    (the NETGEN pseudo-size quirk, reference README.md:166-174) — the
    combined `mcfgen` command rotates seeds for those; id 1 is clean."""
    from two_pass_lanczos_tpu.utils.data_loader import load_kkt_arrays

    mcfgen = native_build / "mcfgen"
    base = "netgen-4000-3-1-a-b-ns"
    run = lambda args, **kw: subprocess.run(
        args, cwd=tmp_path, capture_output=True, text=True, check=True, **kw)

    run([str(mcfgen), "pargen", "4000", "3", "1", "a", "b", "ns"])
    par = tmp_path / f"{base}.par"
    assert par.exists()
    lines = par.read_text().split()
    assert len(lines) == 15  # seed + the 14 NETGEN parameters
    nodes, arcs = int(lines[2]), int(lines[5])
    assert arcs == 4000 and nodes >= 2

    with open(par) as fin, open(tmp_path / f"{base}.dmx", "w") as fout:
        subprocess.run([str(mcfgen), "netgen"], stdin=fin, stdout=fout,
                       cwd=tmp_path, check=True)
    run([str(mcfgen), "qfcgen", f"{base}.dmx"])

    arrays = load_kkt_arrays(tmp_path / f"{base}.dmx", tmp_path / f"{base}.qfc")
    assert arrays.num_arcs == 4000 and arrays.num_nodes == nodes
    assert (arrays.quad_costs > 0).all()


PRESETS = sorted((REPO / "data" / "netgen" / "param").glob("*.par"))


@pytest.mark.parametrize("par", PRESETS, ids=lambda p: p.stem)
def test_mcfgen_netgen_accepts_vendored_presets(native_build, par):
    """``mcfgen netgen`` consumes the classic NETGEN .par format directly —
    exercised on the vendored presets in data/netgen/param (same 15-field
    layout as the reference's 60 presets). Also pins supply balance: the
    n64_widesrc preset asks for more sources/sinks than n/2, which must be
    clamped BEFORE the emission loop so supply == demand."""
    fields = par.read_text().split()
    assert len(fields) == 15
    nodes, arcs = int(fields[2]), int(fields[5])
    with open(par) as fin:
        proc = subprocess.run([str(native_build / "mcfgen"), "netgen"],
                              stdin=fin, capture_output=True, text=True,
                              check=True)
    lines = proc.stdout.splitlines()
    assert any(ln.startswith(f"p min {nodes} {arcs}") for ln in lines[:3])
    assert sum(1 for ln in lines if ln.startswith("a ")) == arcs
    supplies = [int(ln.split()[2]) for ln in lines if ln.startswith("n ")]
    assert supplies, "no node supply lines emitted"
    assert sum(supplies) == 0, "unbalanced instance (supply != demand)"
    assert sum(s for s in supplies if s > 0) == int(fields[8])  # total supply


def test_mcfgen_stage_equivalence(native_build, tmp_path):
    """The combined command and the three-stage pipeline emit byte-identical
    files for identical parameters (both are keyed by the same filename)."""
    mcfgen = native_build / "mcfgen"
    run = lambda args, **kw: subprocess.run(
        args, cwd=tmp_path, capture_output=True, text=True, check=True, **kw)
    base = "netgen-2000-2-5-b-a-s"
    run([str(mcfgen), "2000", "2", "5", "b", "a", "s", "combined"])
    run([str(mcfgen), "pargen", "2000", "2", "5", "b", "a", "s"])
    with open(tmp_path / f"{base}.par") as fin, \
            open(tmp_path / f"{base}.dmx", "w") as fout:
        subprocess.run([str(mcfgen), "netgen"], stdin=fin, stdout=fout,
                       cwd=tmp_path, check=True)
    run([str(mcfgen), "qfcgen", f"{base}.dmx"])
    for ext in (".dmx", ".qfc"):
        a = (tmp_path / "combined" / f"{base}{ext}").read_bytes()
        b = (tmp_path / f"{base}{ext}").read_bytes()
        assert a == b, f"stage/combined mismatch in {ext}"


def test_native_parser_survives_hostile_arc_count(native_build, tmp_path):
    """A hostile declared arc count must not abort the Python process (C++
    exceptions, e.g. bad_alloc from vector.reserve, must not cross the
    ctypes boundary): the loader falls back to the Python parser, which
    recovers the real arcs with a count-mismatch warning."""
    import warnings

    import two_pass_lanczos_tpu.utils.data_loader as dl

    bad = tmp_path / "bad.dmx"
    bad.write_text("p min 5 99999999999999999\na 1 2 0 1 1\n")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        nodes, arcs, u, v = dl.parse_dmx(bad)
    assert (nodes, arcs) == (5, 1)
    assert u.tolist() == [0] and v.tolist() == [1]
    assert any("declared arc count" in str(x.message) for x in w)
