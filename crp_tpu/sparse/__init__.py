from .csr import CSRMatrix
from .mmio import read_mtx_csr, mm_read_sparse
from .synth import banded_random_csr, powerlaw_random_csr

__all__ = [
    "CSRMatrix",
    "read_mtx_csr",
    "mm_read_sparse",
    "banded_random_csr",
    "powerlaw_random_csr",
]
