from .dist_a import DistCSR
from .layout import (
    stack_padded,
    shard_dense_rows,
    unshard_dense_rows,
    make_mesh_1d,
    make_mesh_2d,
)

__all__ = [
    "DistCSR",
    "stack_padded",
    "shard_dense_rows",
    "unshard_dense_rows",
    "make_mesh_1d",
    "make_mesh_2d",
]
