"""The four-property harness on KKT instances (reference's generated tests).

The reference's ``build.rs`` scans ``data/{1000,2000,3000}`` for downloaded
``.dmx``/``.qfc`` pairs and generates 4 tests per instance
(``build.rs:16-41,53-110``). Those datasets are not vendored (they require a
download the build environment cannot make), so this suite:

* auto-discovers any instances placed under ``data/{1000,2000,3000}/`` at
  collection time (drop-in parity with the reference mechanism), and
* always runs on *generated* KKT instances of the same three size classes
  (n ≈ 1000/2000/3000) from the deterministic built-in generator.

Tolerances are the reference's: k=30, tol 5e-9 (``mod.rs:360``).
"""

from pathlib import Path

import pytest

from two_pass_lanczos_tpu.models.generator import generate_mcf_instance
from two_pass_lanczos_tpu.models.kkt import kkt_operator_from_arrays, kkt_operator_from_files
from two_pass_lanczos_tpu.utils.data_loader import KKTArrays
from two_pass_lanczos_tpu.testing import (
    DEFAULT_K,
    DEFAULT_TOL,
    check_decomposition_consistency,
    check_lanczos_relation,
    check_orthonormality,
    check_reconstruction_stability,
    seeded_b,
)

REPO = Path(__file__).resolve().parents[1]


def _discovered_instances():
    """Drop-in discovery of downloaded reference datasets (build.rs parity)."""
    found = []
    for size in ("1000", "2000", "3000"):
        d = REPO / "data" / size
        if not d.is_dir():
            continue
        for dmx in sorted(d.glob("*.dmx")):
            qfc = dmx.with_suffix(".qfc")
            if qfc.exists():
                found.append((f"{size}/{dmx.stem}", dmx, qfc))
    return found


def _generated_instances():
    """Three size classes ≈ the reference's 1000/2000/3000 node+arc totals."""
    out = []
    for arcs, rho, iid in [(950, 3, 1), (1900, 3, 1), (2880, 2, 1)]:
        inst = generate_mcf_instance(arcs, rho=rho, instance_id=iid)
        arrays = KKTArrays(
            quad_costs=inst.quad_costs,
            arc_u=inst.arc_u,
            arc_v=inst.arc_v,
            num_nodes=inst.num_nodes,
            num_arcs=inst.num_arcs,
        )
        out.append((f"gen-{arcs}-{rho}-{iid}", arrays))
    return out


GENERATED = _generated_instances()
DISCOVERED = _discovered_instances()


@pytest.fixture(scope="module", params=[g[0] for g in GENERATED])
def kkt_problem(request):
    arrays = dict((g[0], g[1]) for g in GENERATED)[request.param]
    sys = kkt_operator_from_arrays(arrays)
    b = seeded_b(sys.n)
    return sys.operator, b


PROPERTIES = [
    check_decomposition_consistency,
    check_lanczos_relation,
    check_orthonormality,
    check_reconstruction_stability,
]


@pytest.mark.parametrize("prop", PROPERTIES, ids=lambda p: p.__name__)
def test_property_on_generated_instance(kkt_problem, prop):
    op, b = kkt_problem
    report = prop(op, b, DEFAULT_K, DEFAULT_TOL)
    assert report.passed, f"{report.name} = {report.value:.3e} >= {report.tolerance}"


def test_reconstruction_drift_exactly_zero(kkt_problem):
    # Stronger than the reference tolerance: the exact-replay design gives
    # bit-identical regeneration (drift == 0.0, like every published
    # orthogonality CSV row).
    op, b = kkt_problem
    report = check_reconstruction_stability(op, b, DEFAULT_K, DEFAULT_TOL)
    assert report.value == 0.0


def test_lanczos_relation_at_k_plus_one(kkt_problem):
    # The reference build.rs runs the relation at k and k+1 (build.rs:95-99).
    op, b = kkt_problem
    report = check_lanczos_relation(op, b, DEFAULT_K + 1, DEFAULT_TOL)
    assert report.passed


@pytest.mark.skipif(not DISCOVERED, reason="no downloaded data/{1000,2000,3000} instances")
@pytest.mark.parametrize("name,dmx,qfc", DISCOVERED, ids=[d[0] for d in DISCOVERED])
@pytest.mark.parametrize("prop", PROPERTIES, ids=lambda p: p.__name__)
def test_property_on_downloaded_instance(name, dmx, qfc, prop):
    sys = kkt_operator_from_files(dmx, qfc)
    b = seeded_b(sys.n)
    report = prop(sys.operator, b, DEFAULT_K, DEFAULT_TOL)
    assert report.passed, f"{name}: {report.name} = {report.value:.3e}"


def test_harness_handles_early_breakdown():
    """The property harness must run (not crash) when Lanczos breaks down
    before k steps — e.g. an operator smaller than the default k."""
    import jax.numpy as jnp

    from two_pass_lanczos_tpu.testing import run_all_properties
    from two_pass_lanczos_tpu.operators import DiagonalOperator

    op = DiagonalOperator(jnp.arange(1.0, 6.0))  # n=5 << k=30
    reports = run_all_properties(op)
    assert all(r.passed for r in reports), [str(r) for r in reports]
