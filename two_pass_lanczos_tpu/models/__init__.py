"""Problem families: KKT systems, synthetic spectra, dense benchmarks."""

from two_pass_lanczos_tpu.models.synthetic import (
    create_diagonal_problem,
    dense_random_symmetric,
    SCENARIOS,
)
from two_pass_lanczos_tpu.models.kkt import (
    KKTSystem,
    kkt_operator_from_files,
    kkt_sorted_coo,
)
from two_pass_lanczos_tpu.models.generator import generate_mcf_instance

__all__ = [
    "create_diagonal_problem",
    "dense_random_symmetric",
    "SCENARIOS",
    "KKTSystem",
    "kkt_operator_from_files",
    "kkt_sorted_coo",
    "generate_mcf_instance",
]
