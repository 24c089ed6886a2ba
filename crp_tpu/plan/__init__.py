from .partition1d import csr_row_partition, csr_row_part_comm_size, prime_factorization
from .planner2d import calc_spmm_part2d_from_1d, Plan2D
from .bandwidth import calc_bandwidth_part2d, BandwidthPlan

__all__ = [
    "csr_row_partition",
    "csr_row_part_comm_size",
    "prime_factorization",
    "calc_spmm_part2d_from_1d",
    "Plan2D",
    "calc_bandwidth_part2d",
    "BandwidthPlan",
]
