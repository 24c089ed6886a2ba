"""Uniform block partition helpers.

Semantics match the reference's ``calc_block_spos_size``
(``src/utils.c:26-48``): ``len`` elements split into ``nblk`` blocks where the
first ``len % nblk`` blocks get one extra element.  The planner's uniform
B-row and B/C-column splits are built from this, so exact parity matters for
planner-oracle tests.
"""

from __future__ import annotations

import numpy as np


def calc_block_spos_size(length: int, nblk: int, iblk: int) -> tuple[int, int]:
    """Start position and size of block ``iblk`` of ``length`` items in ``nblk`` blocks."""
    if iblk < 0 or iblk > nblk:
        return -1, 0
    rem = length % nblk
    bs0 = length // nblk
    if iblk < rem:
        return (bs0 + 1) * iblk, bs0 + 1
    return bs0 * iblk + rem, bs0


def uniform_displs(length: int, nblk: int) -> np.ndarray:
    """Displacement array (nblk+1,) of the uniform block partition.

    ``uniform_displs(L, p)[i] == calc_block_spos_size(L, p, i)[0]`` for
    ``i < p`` and ``[p] == L``.
    """
    rem = length % nblk
    bs0 = length // nblk
    i = np.arange(nblk + 1, dtype=np.int64)
    displs = np.where(i < rem, (bs0 + 1) * i, bs0 * i + rem)
    return displs.astype(np.int64)
