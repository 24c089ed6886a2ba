"""crp_tpu — TPU-native communication-reduced SpMM framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
scalable-matrix/CRP-SpMM (see /root/reference, SURVEY.md): distributed
``C := A @ B`` with sparse CSR ``A`` and dense ``B``/``C``, built around

  * a sparsity-aware partition planner choosing a ``pm x pn`` device grid and
    nnz-balanced row blocks to minimize communicated matrix elements
    (reference: ``src/spmat_part.c``),
  * an A-replication path along grid rows and a plan-driven, sparsity-aware
    B-row halo exchange along grid columns (reference: ``src/para2d_spmm.c``,
    ``src/rowpara_spmm.c``),
  * any-layout <-> internal-layout resharding of A/B/C (reference:
    ``src/mat_redist.c``, ``deprecated/src/crpspmm.c``),
  * an MXU-tiled Pallas local SpMM kernel (replacing MKL / cuSPARSE),
  * phase-timing statistics and a communicated-element audit
    (planned vs actual vs minimal).
"""

__version__ = "0.1.0"

from .sparse.csr import CSRMatrix
from .sparse.mmio import read_mtx_csr
from .plan.partition1d import csr_row_partition, csr_row_part_comm_size
from .plan.planner2d import calc_spmm_part2d_from_1d, Plan2D
from .plan.bandwidth import calc_bandwidth_part2d
from .config import SpmmConfig, get_env_int

__all__ = [
    "CSRMatrix",
    "read_mtx_csr",
    "csr_row_partition",
    "csr_row_part_comm_size",
    "calc_spmm_part2d_from_1d",
    "calc_bandwidth_part2d",
    "Plan2D",
    "SpmmConfig",
    "get_env_int",
]
