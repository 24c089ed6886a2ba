"""fp64-class SpMM on the MXU — Ozaki-style exact slicing, ragged geometry.

The reference computes local SpMM in fp64 (MKL ``src/rowpara_spmm.c:
398-407``) with a <= 1e-12 acceptance check; TPUs have no fp64 unit and the
repo's double-float kernels (``spmm_dd.py``) run on the VPU.  This kernel
puts the fp64-class path on the MXU:

  * every A value is written as ``mu_i * sum_p s^A_p 2^(-7(p+1))`` where
    ``mu_i`` is a power-of-two row scale (per ragged chunk) and the slices
    ``s^A_p`` are INTEGERS in (-128, 128], stored as bf16 (exact);
    B likewise with per-column scales ``nu_j`` computed in-kernel;
  * a bf16 x bf16 MXU pass over one chunk multiplies 7-bit integers
    (products <= 2^14, exact) and accumulates <= Wc = 512 of them in fp32
    (<= 2^23, exact) — every pass result is EXACT;
  * pass results are rescaled by ``mu_i nu_j 2^(-7(p+q+2))`` (all powers
    of two — exact) and combined across the 34 kept passes (p+q <= 7) and
    across k-chunks with error-free double-float accumulation (Knuth
    two_sum; Mosaic does not reassociate fp, unlike XLA loop passes);
  * 7 slices capture 49 bits per operand: B's fp32 hi/lo pair (48 bits)
    exactly, A's fp64 to 2^-49 — the only inexact steps are that A
    truncation and the one fp32 add folding B's lo half into the slice
    residual (error ~2^-45 of the column max), giving ~1e-13-class
    results.

Geometry is the ragged gathered-window cover (``spmm_ragged``) with
``min_chunk_nnz = 1`` — every nonzero is covered (no spill), so dd
accuracy is uniform; infeasible covers (panel byte cap) fall back to the
VPU dd kernels in dispatch.
"""

from __future__ import annotations

import functools

import numpy as np

from .spmm_pallas import TK, UnsupportedSparsity, assert_tpu_blockable

QA = 7          # A slices (49 bits of the fp64 mantissa)
QB = 7          # B slices (covers the 48-bit hi/lo pair exactly)
SMAX = 7        # keep passes with p + q <= SMAX (34 of 49)
PASSES = [(p, q) for s in range(SMAX + 1)
          for p, q in ((i, s - i) for i in range(s + 1))
          if p < QA and q < QB]


def slice_a_f64(panels: np.ndarray):
    """(S, TM, Wc) fp64 chunk panels -> (mu (S, TM) fp32 pow2 row scales,
    slices (QA, S, TM, Wc) bf16 integer planes).  Exact in fp64."""
    import ml_dtypes

    from .. import native

    try:
        got = native.dd_slice_f64(
            np.ascontiguousarray(panels, np.float64), QA
        )
    except native.DDSliceRangeError as e:
        raise UnsupportedSparsity(str(e))
    if got is not None:
        return got

    amax = np.abs(panels).max(axis=2)                    # (S, TM)
    # smallest power of two STRICTLY greater than amax -> |v| < 1
    _, e = np.frexp(amax)                                # amax < 2^e
    # mu is stored/applied as fp32: 2^e must be a NORMAL fp32 or the
    # exactness invariant silently breaks (inf / flush-to-zero); fall
    # back to the VPU dd path, which carries fp32 hi/lo value pairs
    if amax.size and bool(((amax > 0) & ((e > 127) | (e < -126))).any()):
        raise UnsupportedSparsity(
            "dd_mxu row scale outside fp32 normal range (amax > 2^127 "
            "or < 2^-126)"
        )
    mu = np.exp2(e.astype(np.float64))
    mu_safe = np.where(amax > 0, mu, 1.0)
    v = panels / mu_safe[:, :, None]                     # exact (pow2)
    slices = np.empty((QA,) + panels.shape, dtype=ml_dtypes.bfloat16)
    for p in range(QA):
        u = np.rint(v * 128.0)
        slices[p] = u.astype(np.float32)                 # ints <= 128: exact
        v = v * 128.0 - u                                # exact in fp64
    return mu_safe.astype(np.float32), slices


def pack_ragged_dd(
    rowptr: np.ndarray,
    colidx: np.ndarray,
    val: np.ndarray,           # fp64 values
    ncol: int,
    TM: int = 128,
    Wc: int = 512,
    max_panel_bytes: int | None = None,
):
    """Cover (min_chunk_nnz=1: total, no spill) + fp64 densify + slice.

    Returns (rw, mu, slices) where ``rw`` is the RaggedWindow carrying the
    cover arrays (its fp64 panels are dropped after slicing).
    """
    from .spmm_ragged import default_panel_cap_bytes, pack_ragged_window

    if max_panel_bytes is None:
        max_panel_bytes = default_panel_cap_bytes()
    rw = pack_ragged_window(
        rowptr, colidx, val, ncol, TM=TM, Wc=Wc, min_chunk_nnz=1,
        max_panel_bytes=max(max_panel_bytes // 2, 1), dtype=np.float64,
    )
    if rw.spill_nnz:
        # the panel-byte cap escalated min_chunk_nnz past 1 (power-law
        # shards: the min_chunk_nnz=1 total cover can exceed HBM), which
        # breaks the "every nonzero on the MXU" accuracy invariant —
        # fall back to the VPU dd kernels via dispatch's chain
        raise UnsupportedSparsity(
            f"dd_mxu total cover infeasible under panel cap "
            f"({rw.spill_nnz} nnz would spill)"
        )
    if rw.S * TM * Wc * (2 * QA + 4) > max_panel_bytes:
        raise UnsupportedSparsity(
            f"dd slice planes {(rw.S * TM * Wc * 2 * QA) >> 20} MiB > cap"
        )
    mu, slices = slice_a_f64(rw.panels)
    rw.panels = np.zeros((0, TM, Wc), np.float32)  # drop the fp64 panels
    return rw, mu, slices


def _extract_b_slices(bh, bl, jnp):
    """In-kernel B slicing: (Wc, TN) fp32 hi/lo -> (nu (TN,) pow2 col
    scales, QB slices of bf16 integers).  All steps exact except folding
    bl into the slice-3 residual (error ~2^-45 of the column max)."""
    import jax

    vmax = jnp.max(jnp.abs(bh), axis=0)                       # (TN,)
    # smallest power of two > vmax via exponent bits: mantissa cleared
    # gives the largest pow2 <= vmax; doubling makes |x| < 1 strict
    bits = jax.lax.bitcast_convert_type(vmax, jnp.uint32)
    pow2 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0x7F800000), jnp.float32
    )
    nu = jnp.where(vmax > 0, pow2 * 2.0, 1.0)
    # clamp so 1/nu stays finite/normal
    nu = jnp.maximum(nu, jnp.float32(2.0 ** -100))
    r = 1.0 / nu                                              # exact (pow2)
    x = bh * r[None, :]
    slices = []
    for q in range(QB):
        if q == 3:
            # bh's 24 bits are exhausted after 3+ slices; fold the lo half
            # into the RESCALED residual (x carries units of 2^-21 here —
            # the 128^3 factor is an exact pow2). This is the one rounding
            # add of the scheme (~2^-45 of the column max).
            x = x + bl * (r * jnp.float32(128.0 ** 3))[None, :]
        u = jnp.round(x * 128.0)
        slices.append(u.astype(jnp.bfloat16))
        x = x * 128.0 - u                                     # exact
    return nu, slices


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _ragged_kernel_dd(
    g_ref, first_ref, starts_ref, mu_ref, *rest,
    Wc, TN, NJ, S, n_pad,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_refs = rest[:QA]
    b_hbm = rest[QA]
    chi_ref, clo_ref = rest[QA + 1], rest[QA + 2]
    window, sem = rest[QA + 3], rest[QA + 4]

    j = pl.program_id(0)
    s = pl.program_id(1)
    lin = j * S + s
    total = NJ * S

    def chunk_dma(l, slot, half):
        jj = l // S
        ss = l - jj * S
        return pltpu.make_async_copy(
            b_hbm.at[
                pl.ds(pl.multiple_of(starts_ref[ss], TK), Wc),
                pl.ds(pl.multiple_of(half * n_pad + jj * TN, TN), TN),
            ],
            window.at[slot, half],
            sem.at[slot, half],
        )

    @pl.when(lin == 0)
    def _():
        chunk_dma(0, 0, 0).start()
        chunk_dma(0, 0, 1).start()

    @pl.when(lin + 1 < total)
    def _():
        chunk_dma(lin + 1, (lin + 1) % 2, 0).start()
        chunk_dma(lin + 1, (lin + 1) % 2, 1).start()

    slot = lin % 2
    chunk_dma(lin, slot, 0).wait()
    chunk_dma(lin, slot, 1).wait()

    bh = window[slot, 0]
    bl = window[slot, 1]
    nu, b_slices = _extract_b_slices(bh, bl, jnp)

    mu = mu_ref[0, 0]                                         # (TM,)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # accumulate the 34 exact pass results in double-float; all rescales
    # are powers of two (exact)
    acc_h = jnp.zeros((mu.shape[0], TN), jnp.float32)
    acc_l = jnp.zeros((mu.shape[0], TN), jnp.float32)
    for p, q in PASSES:
        pass_exact = dot(a_refs[p][0], b_slices[q])           # exact fp32
        w = jnp.float32(2.0 ** (-7 * (p + q + 2)))
        term = (pass_exact * (mu * w)[:, None]) * nu[None, :]
        acc_h, e = _two_sum(acc_h, term)
        acc_l = acc_l + e

    first = first_ref[s] == 1

    @pl.when(first)
    def _():
        chi_ref[:] = acc_h
        clo_ref[:] = acc_l

    @pl.when(jnp.logical_not(first))
    def _():
        h, e = _two_sum(chi_ref[:], acc_h)
        chi_ref[:] = h
        clo_ref[:] = clo_ref[:] + (acc_l + e)


def spmm_ragged_dd(
    step_g, step_first, starts, mu, slices, b_packed,
    G: int, TM: int, Wc: int,
    TN: int | None = None, interpret: bool = False,
):
    """C = A @ B in fp64-class on the MXU.

    ``slices`` is the (QA, S, TM, Wc) bf16 stack from ``pack_ragged_dd``;
    ``b_packed`` is (rows, 2n) fp32 [hi | lo] with rows >= max(starts)+Wc.
    Returns packed fp32 (G*TM, 2n).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = b_packed.shape[1] // 2
    if TN is None:
        TN = 256 if n % 256 == 0 else 128
    n_pad = -(-n // TN) * TN
    if n_pad != n:
        bh = jnp.pad(b_packed[:, :n], ((0, 0), (0, n_pad - n)))
        bl = jnp.pad(b_packed[:, n:], ((0, 0), (0, n_pad - n)))
        b_packed = jnp.concatenate([bh, bl], axis=1)
    S = slices.shape[1]
    NJ = n_pad // TN

    kern = functools.partial(
        _ragged_kernel_dd, Wc=Wc, TN=TN, NJ=NJ, S=S, n_pad=n_pad,
    )
    a_spec = pl.BlockSpec((1, TM, Wc), lambda j, s, *_: (s, 0, 0))
    # mu rides as (S, 1, TM) so the block's trailing two dims (1, TM) equal
    # the array dims — a 2-D (1, TM) block over (S, TM) violates the TPU
    # lowering's "divisible by 8 or full-dim" rule when S % 8 != 0 (the
    # interpreter does not enforce it; the real chip rejects it).
    mu_spec = pl.BlockSpec((1, 1, TM), lambda j, s, *_: (s, 0, 0))
    assert_tpu_blockable((1, 1, TM), (S, 1, TM), itemsize=4)   # mu fp32
    assert_tpu_blockable((1, TM, Wc), (S, TM, Wc), itemsize=2)  # bf16 slices
    out_spec = pl.BlockSpec((TM, TN), lambda j, s, g_ref, *_: (g_ref[s], j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # step_g, step_first, starts
        grid=(NJ, S),
        in_specs=[mu_spec] + [a_spec] * QA
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec, out_spec],
        scratch_shapes=[
            pltpu.VMEM((2, 2, Wc, TN), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    win_bytes = 2 * 2 * Wc * TN * 4
    need = win_bytes + (QA + 1) * 2 * TM * Wc * 2 + 2 * TM * TN * 4 \
        + QB * Wc * TN * 2 + 4 * Wc * TN * 4
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G * TM, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((G * TM, n_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(max(need * 2, 16 << 20), 120 << 20))
        ),
        interpret=interpret,
    )
    chi, clo = fn(
        jnp.asarray(step_g), jnp.asarray(step_first), jnp.asarray(starts),
        jnp.asarray(mu).reshape(S, 1, TM),
        *[jnp.asarray(slices[p]) for p in range(QA)],
        b_packed,
    )
    return jnp.concatenate([chi[:, :n], clo[:, :n]], axis=1)
