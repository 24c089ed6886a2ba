from .blocks import calc_block_spos_size, uniform_displs
from .norms import calc_err_2norm, rel_fro_err
from .timers import Timer

__all__ = [
    "calc_block_spos_size",
    "uniform_displs",
    "calc_err_2norm",
    "rel_fro_err",
    "Timer",
]
