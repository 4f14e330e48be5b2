"""Compute kernels: SpMV (XLA and Pallas), fused Lanczos, tridiagonal utils."""

from two_pass_lanczos_tpu.ops.kkt_fused import FusedKKTSolver, SortedKKTLayout
from two_pass_lanczos_tpu.ops.spmv import (
    coo_spmv,
    csr_from_triplets,
    kkt_matvec,
    SortedCOO,
)
from two_pass_lanczos_tpu.ops.tridiag import (
    assemble_tridiagonal,
    eigh_tridiagonal,
    tridiagonal_solve_e1,
)

__all__ = [
    "FusedKKTSolver",
    "SortedKKTLayout",
    "coo_spmv",
    "csr_from_triplets",
    "kkt_matvec",
    "SortedCOO",
    "assemble_tridiagonal",
    "eigh_tridiagonal",
    "tridiagonal_solve_e1",
]
