"""Scan-based Lanczos algorithm kernels (pass one, one-pass, pass two)."""

from two_pass_lanczos_tpu.algorithms.core import (
    LanczosDecomposition,
    breakdown_tolerance,
    lanczos_recurrence_step,
)
from two_pass_lanczos_tpu.algorithms.chunked import (
    lanczos_pass_one_chunked,
    lanczos_standard_chunked,
)
from two_pass_lanczos_tpu.algorithms.one_pass import lanczos_standard
from two_pass_lanczos_tpu.algorithms.two_pass import (
    lanczos_pass_one,
    lanczos_pass_two,
    lanczos_pass_two_with_basis,
)

__all__ = [
    "LanczosDecomposition",
    "breakdown_tolerance",
    "lanczos_recurrence_step",
    "lanczos_standard",
    "lanczos_standard_chunked",
    "lanczos_pass_one",
    "lanczos_pass_one_chunked",
    "lanczos_pass_two",
    "lanczos_pass_two_with_basis",
]
