"""Runtime configuration.

The reference configures its algorithm switches through environment variables
read with ``GET_ENV_INT_VAR`` (reference ``src/utils.h:71-87``), e.g.
``RP_SPMM_P2P`` / ``RP_SPMM_REIDX`` (``src/rowpara_spmm.c:42-43``) and
``A2A_B_FINEGRAIN`` (``deprecated/src/crpspmm.c:294``).  We keep the same
three switches (with the same env names and defaults) plus TPU-specific knobs,
carried in a small dataclass.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional

logger = logging.getLogger("crp_tpu")


def get_env_int(
    env_name: str,
    default: int,
    min_val: int,
    max_val: int,
    *,
    var_name: Optional[str] = None,
    log: bool = True,
) -> int:
    """Read an integer env var with default / clamp-to-range semantics.

    Mirrors the behaviour of ``GET_ENV_INT_VAR`` (reference
    ``src/utils.h:71-87``): missing -> default, out-of-range -> default,
    and the override is logged once.
    """
    var_name = var_name or env_name.lower()
    raw = os.environ.get(env_name)
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError:
        logger.warning("Ignoring non-integer env %s=%r", env_name, raw)
        return default
    if val < min_val or val > max_val:
        logger.warning(
            "Env %s=%d out of range [%d, %d]; using default %d",
            env_name, val, min_val, max_val, default,
        )
        return default
    if log and val != default:
        logger.info("Overriding parameter %s = %d (default %d)", var_name, val, default)
    return val


@dataclasses.dataclass
class SpmmConfig:
    """Algorithm switches for the SpMM engines.

    Attributes
    ----------
    rb_p2p:
        B-row halo exchange implementation.  The reference chooses between a
        nonblocking p2p ring and ``MPI_Alltoallv`` via ``RP_SPMM_P2P``
        (``src/rowpara_spmm.c:275-309``).  Here: 1 -> a ``ppermute``-based
        ring schedule, 0 -> a single padded ``lax.all_to_all``.
    rb_reidx:
        Compact never-referenced B rows out of the local receive buffer
        (``RP_SPMM_REIDX``, ``src/rowpara_spmm.c:81-86``).  On TPU this also
        shrinks the gather index space of the local kernel.
    a2a_b_finegrain:
        v1 engine switch: exchange exactly the referenced B rows instead of
        contiguous [min_col, max_col] panels (``A2A_B_FINEGRAIN``,
        ``deprecated/src/crpspmm.c:294-396``).
    dtype:
        Value dtype for A/B/C when the engine constructor does not receive
        an explicit ``dtype``.  Defaults to fp64 like the reference (runs
        natively on CPU meshes); TPU runs typically pass float32, or use
        kernel="dd" for fp64-class accuracy on fp32 hardware.
    kernel:
        Local SpMM kernel: "auto" | "segsum" (gather + segment-sum, runs
        everywhere) | "ell" | "pallas" (MXU windowed kernel; routes to the
        ragged gathered-window hybrid when the uniform window is
        infeasible or wasteful) | "ragged" (force the ragged hybrid) |
        "gather" (one-hot-MXU block reduce over every nnz: the
        scrambled/pure power-law class, fp32 only) | "dd" (double-float
        fp64-class; on TPU auto-upgrades to the Ozaki MXU kernel when the
        cover fits) | "dd_mxu" (force the fp64-class MXU kernel) |
        "pallas_halo" (fused kernel: B halo rows RDMA-pushed between chips
        inside the kernel, compute gated per chunk — banded/reordered
        matrices).  A kernel that rejects the matrix's sparsity at pack
        time falls back along a structure-aware chain (fp32 TPU:
        gather -> segsum; dd-class: VPU dd; else segsum — override with
        ``CRP_TPU_FALLBACK``), so any CSR runs at the best available rate
        like the reference's MKL/cuSPARSE seam
        (``src/rowpara_spmm.c:398-407``).
    overlap:
        Overlap the B-row exchange with compute (TPU-only design, no
        reference equivalent — SURVEY.md section 7 calls this out as new):
        the self part of A (owner == this shard) multiplies the owned B
        block concurrently with the ring transfers, and each shift's
        arriving rows feed a partial SpMM immediately.  Implies the ring
        schedule; ``rb_p2p`` is ignored when set.
    """

    rb_p2p: int = 1
    rb_reidx: int = 1
    a2a_b_finegrain: int = 0
    dtype: str = "float64"
    kernel: str = "auto"
    overlap: int = 0
    # reference BC_layout (rp_spmm_init arg, src/rowpara_spmm.c:225-264,
    # 400-407): 1 = B arrives as (n, k) and C returns as (n, m) — the
    # col-major view.  On TPU the conversion is a device-side XLA
    # transpose at HBM speed (XLA owns physical layouts; only the LOGICAL
    # orientation of the user arrays needs a switch).
    bc_layout: int = 0
    # MXU pass scheme for fp32 data in the pallas kernel:
    # "highest" = full fp32 emulation (~1e-7), "x3" = 3-pass bf16 split
    # (~5e-6, faster on MXU-bound shapes), "default" = 1 bf16 pass (~1e-3)
    mxu_precision: str = "highest"

    @classmethod
    def from_env(cls) -> "SpmmConfig":
        return cls(
            rb_p2p=get_env_int("RP_SPMM_P2P", 1, 0, 1, var_name="rB_p2p"),
            rb_reidx=get_env_int("RP_SPMM_REIDX", 1, 0, 1, var_name="rB_reidx"),
            a2a_b_finegrain=get_env_int(
                "A2A_B_FINEGRAIN", 0, 0, 1, var_name="a2a_B_finegrain"
            ),
            dtype=os.environ.get("CRP_TPU_DTYPE", "float64"),
            kernel=os.environ.get("CRP_TPU_KERNEL", "auto"),
            overlap=get_env_int("CRP_TPU_OVERLAP", 0, 0, 1, var_name="overlap"),
            bc_layout=get_env_int(
                "CRP_TPU_BC_LAYOUT", 0, 0, 1, var_name="BC_layout"
            ),
            mxu_precision=os.environ.get("CRP_TPU_MXU_PREC", "highest"),
        )
