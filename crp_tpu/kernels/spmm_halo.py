"""Fused halo-push windowed SpMM — inter-chip RDMA inside the kernel.

The TPU-native endgame for the 1D row-parallel exec (SURVEY.md section 7
"overlap ... double-buffered ring via Pallas remote DMA"): instead of an
XLA-level exchange materializing a receive buffer before compute starts,
one Pallas kernel per shard

  1. pushes every owned 128-row B chunk straight into the HBM window
     buffer of each consumer shard via ``make_async_remote_copy``
     (coarse contiguous windows — the v1 engine's ``A2A_B_FINEGRAIN=0``
     geometry, ``deprecated/src/crpspmm.c:294-338``), signaling that
     chunk's DMA semaphore on the receiver;
  2. runs the windowed MXU k-loop (see ``spmm_pallas``), where the
     double-buffered window-chunk DMA is gated on per-OWNER arrival
     semaphores: shard j signals slot j of the receiver's semaphore array
     with every push, and the receiver drains owner j's expected pushes
     before first touching a buffer chunk j owns.  Owner granularity keeps
     the semaphore footprint at p + 3 (hardware DMA semaphores are a
     scarce resource — per-chunk gating blows the ~450-slot budget on
     real matrices), while windows are contiguous and owners ordered, so
     one high-water owner index still tracks readiness exactly.  Compute
     on early owners' chunks proceeds while later halo rows are still in
     flight.

Constraints (checked at plan time; engines fall back to the unfused path):
  * B ownership boundaries are TK-aligned (``align_displs``);
  * per-group window starts are non-decreasing (banded / RCM-reordered
    matrices) so chunk readiness advances as one high-water mark.

A start-of-exec barrier (signal every peer, wait p-1) keeps exec N+1's
pushes from landing in a window buffer exec N is still reading; it is
skipped in interpret mode (no barrier emulation) where each test runs a
single exec per buffer.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .spmm_pallas import TK, choose_chunks, UnsupportedSparsity


@dataclasses.dataclass
class HaloPlan:
    """Host-side plan for the fused halo-push kernel (all shards)."""

    p: int
    TM: int
    G: int                  # row groups per shard (padded to max)
    W: int                  # A panel width (rows, == C_panel * Wc)
    Wc: int                 # compute chunk rows
    C_panel: int            # k-loop trips per group
    buf_rows: int           # window buffer rows (multiple of TK)
    max_k: int              # padded owned-B rows per shard (TK-aligned)
    P_max: int              # padded push-list length
    # stacked (p, ...) arrays, sharded over the mesh axis at exec:
    lo: np.ndarray          # (p,) window base row (global, TK-aligned)
    ws_rel: np.ndarray      # (p, G) group window start relative to lo
    a_panels: np.ndarray    # (p, G, TM, W) group-relative dense panels
    push_src: np.ndarray    # (p, P_max) src row offset in local b_loc
    push_dev: np.ndarray    # (p, P_max) destination shard
    push_dst: np.ndarray    # (p, P_max) dst row offset in the window buffer
    npush: np.ndarray       # (p, 1)
    exp_from: np.ndarray    # (p, p) TK pushes shard i expects from owner j
    wait_bound: np.ndarray  # (p, C_tk) owners to drain before chunk c (excl.)
    B_displs: np.ndarray    # (p+1,) TK-aligned ownership boundaries

    @property
    def C_tk(self) -> int:
        return self.buf_rows // TK

    @property
    def halo_rows_pushed(self) -> int:
        """Physical rows moved per exec (audit): all pushes, incl. self."""
        return int(self.npush.sum()) * TK


def resolve_halo_precision(mxu_precision: str):
    """Map ``SpmmConfig.mxu_precision`` to ``halo_spmm_local``'s precision
    argument (None means HIGHEST for fp32 data) — one definition shared by
    all three engines."""
    import jax

    if mxu_precision == "default":
        return jax.lax.Precision.DEFAULT
    if mxu_precision == "x3":
        return "x3"
    return None


def align_displs(displs: np.ndarray, k: int) -> np.ndarray:
    """Round interior ownership boundaries to TK multiples (monotone)."""
    d = (np.asarray(displs, dtype=np.int64) + TK // 2) // TK * TK
    d[0] = 0
    d[-1] = k
    return np.maximum.accumulate(d)


def build_halo_plan(
    shards: list,            # per-shard CSR views with global colidx
    B_displs: np.ndarray,    # (p+1,) TK-aligned ownership boundaries
    TM: int = 256,
    max_window: int = 16384,
    dtype=np.float32,
) -> HaloPlan:
    """Pack group-relative A panels + the TK-chunk push lists."""
    from .spmm_pallas import pack_window_dense

    B_displs = np.asarray(B_displs, dtype=np.int64)
    # interior boundaries must be TK-aligned; the final one is the matrix
    # edge — pushes of its partial chunk read zero pad rows of b_loc
    if np.any(B_displs[:-1] % TK):
        raise UnsupportedSparsity("halo kernel needs TK-aligned B displs")
    k_glb = int(B_displs[-1])
    p = len(shards)
    packs, los = [], []
    for sh in shards:
        pk = pack_window_dense(
            sh.rowptr, sh.colidx, sh.val, k_glb, TM=TM,
            max_window=max_window, dtype=dtype,
        )
        if np.any(np.diff(pk.ws) < 0):
            raise UnsupportedSparsity(
                "halo kernel needs non-decreasing group windows"
            )
        packs.append(pk)
        los.append(int(pk.ws.min()))

    G = max(pk.G for pk in packs)
    W, Wc, C_panel = choose_chunks(max(pk.W for pk in packs))
    a_panels = np.zeros((p, G, TM, W), dtype=dtype)
    ws_rel = np.zeros((p, G), dtype=np.int32)
    buf_rows = TK
    for i, pk in enumerate(packs):
        a_panels[i, : pk.G, :, : pk.W] = pk.tiles
        ws_rel[i, : pk.G] = pk.ws - los[i]
        buf_rows = max(buf_rows, int(ws_rel[i].max()) + W)

    C_tk = buf_rows // TK
    # push lists: owner j sends each owned TK chunk to every shard whose
    # buffer covers it AND that lies in the real B row range
    pushes = [[] for _ in range(p)]
    exp_from = np.zeros((p, p), dtype=np.int32)
    wait_bound = np.zeros((p, C_tk), dtype=np.int32)
    for i in range(p):
        # clamp to the rows THIS shard's window DMAs actually read
        # (ws_rel.max() + W), not the cross-shard buf_rows: chunks past
        # the extent would signal owner_sem without ever being drained by
        # wait_until, overflowing the semaphore across execs
        ext_tk = (int(ws_rel[i].max()) + W) // TK
        for c in range(los[i] // TK, min(-(-k_glb // TK), los[i] // TK + ext_tk)):
            row = c * TK
            j = int(np.searchsorted(B_displs, row, side="right") - 1)
            j = min(j, p - 1)
            pushes[j].append((row - int(B_displs[j]), i, row - los[i]))
            exp_from[i, j] += 1
            wait_bound[i, (row - los[i]) // TK] = j + 1
        # pad chunks inherit the previous bound (no extra owners to drain)
        wait_bound[i] = np.maximum.accumulate(wait_bound[i])
    P_max = max(max((len(x) for x in pushes), default=1), 1)
    push_src = np.zeros((p, P_max), dtype=np.int32)
    push_dev = np.zeros((p, P_max), dtype=np.int32)
    push_dst = np.zeros((p, P_max), dtype=np.int32)
    npush = np.zeros((p, 1), dtype=np.int32)
    for j in range(p):
        npush[j, 0] = len(pushes[j])
        for idx, (src, dev, dst) in enumerate(pushes[j]):
            push_src[j, idx] = src
            push_dev[j, idx] = dev
            push_dst[j, idx] = dst

    max_k = -(-int(np.diff(B_displs).max()) // TK) * TK
    return HaloPlan(
        p=p, TM=TM, G=G, W=W, Wc=Wc, C_panel=C_panel, buf_rows=buf_rows,
        max_k=max_k, P_max=P_max, lo=np.array(los, dtype=np.int32),
        ws_rel=ws_rel, a_panels=a_panels, push_src=push_src,
        push_dev=push_dev, push_dst=push_dst, npush=npush,
        exp_from=exp_from, wait_bound=wait_bound, B_displs=B_displs,
    )


def _halo_kernel(
    # scalar prefetch
    ws_rel_ref, push_src_ref, push_dev_ref, push_dst_ref, npush_ref,
    exp_from_ref, wait_bound_ref,
    # inputs
    a_ref, b_loc_hbm, buf_hbm,
    # outputs
    o_ref, buf_out,
    # scratch
    window, dma_sem, owner_sem, send_sem, hw_ref,
    *, p, pn_size, Wc, TN, NJ, C, compute_dtype, precision, use_barrier,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    jn = pl.program_id(1)
    t = pl.program_id(2)
    step = (g * NJ + jn) * C + t
    total = pl.num_programs(0) * NJ * C

    # logical device ids are flattened over the mesh; a pm-peer on a 2D
    # (pm, pn) grid is pm_idx * pn_size + my column index
    col = jax.lax.axis_index("pn") if pn_size > 1 else jnp.int32(0)

    # ---------------- step 0: barrier, then fire all halo pushes ----------
    @pl.when(step == 0)
    def _():
        me = jax.lax.axis_index("pm")
        if use_barrier and p > 1:
            bar = pltpu.get_barrier_semaphore()
            for i in range(p):
                @pl.when(jnp.int32(i) != me)
                def _(i=i):
                    pltpu.semaphore_signal(
                        bar, inc=1,
                        device_id=jnp.int32(i) * pn_size + col,
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    )
            pltpu.semaphore_wait(bar, p - 1)

        def push_body(k, _):
            rdma = pltpu.make_async_remote_copy(
                src_ref=b_loc_hbm.at[
                    pl.ds(pl.multiple_of(push_src_ref[k], TK), TK), :
                ],
                dst_ref=buf_hbm.at[
                    pl.ds(pl.multiple_of(push_dst_ref[k], TK), TK), :
                ],
                send_sem=send_sem.at[0],
                # receiver's slot indexed by the SENDER's shard id
                recv_sem=owner_sem.at[me],
                device_id=push_dev_ref[k] * pn_size + col,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            return _

        jax.lax.fori_loop(0, npush_ref[0], push_body, None)
        hw_ref[0] = 0

    # -- advance owner-arrival high-water before touching their chunks ----
    def wait_until(bound):
        def owner_body(j, _):
            def one(_k, __):
                # dummy same-shape descriptor: waits one TK x n push
                pltpu.make_async_copy(
                    buf_hbm.at[pl.ds(0, TK), :],
                    buf_hbm.at[pl.ds(0, TK), :],
                    owner_sem.at[j],
                ).wait()
                return __

            jax.lax.fori_loop(0, exp_from_ref[j], one, None)
            return _

        jax.lax.fori_loop(hw_ref[0], bound, owner_body, None)
        hw_ref[0] = jnp.maximum(hw_ref[0], bound)

    def window_dma(s, slot):
        gg = s // (NJ * C)
        jj = (s // C) - gg * NJ
        tt = s - (s // C) * C
        return pltpu.make_async_copy(
            buf_hbm.at[
                pl.ds(pl.multiple_of(ws_rel_ref[gg] + tt * Wc, TK), Wc),
                pl.ds(pl.multiple_of(jj * TN, TN), TN),
            ],
            window.at[slot],
            dma_sem.at[slot],
        )

    C_tk = wait_bound_ref.shape[0]

    def bound_for(s):
        gg = s // (NJ * C)
        tt = s - (s // C) * C
        tk_last = (ws_rel_ref[gg] + (tt + 1) * Wc - 1) // TK
        return wait_bound_ref[jnp.minimum(tk_last, C_tk - 1)]

    @pl.when(step == 0)
    def _():
        wait_until(bound_for(0))
        window_dma(0, 0).start()

    @pl.when(step + 1 < total)
    def _():
        wait_until(bound_for(step + 1))
        window_dma(step + 1, (step + 1) % 2).start()

    slot = step % 2
    window_dma(step, slot).wait()

    acc_dtype = (
        jnp.float64 if jnp.dtype(compute_dtype) == jnp.float64
        else jnp.float32
    )
    dims = (((1,), (0,)), ((), ()))
    if precision == "x3":
        # 3-pass bf16 split (see spmm_pallas._window_kernel)
        a32 = a_ref[0].astype(jnp.float32)
        b32 = window[slot].astype(jnp.float32)
        ah = a32.astype(jnp.bfloat16)
        al = (a32 - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b32.astype(jnp.bfloat16)
        bl = (b32 - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        partial = dot(ah, bh) + (dot(ah, bl) + dot(al, bh))
    else:
        partial = jax.lax.dot_general(
            a_ref[0].astype(compute_dtype),
            window[slot].astype(compute_dtype),
            dims,
            preferred_element_type=acc_dtype,
            precision=precision,
        )

    @pl.when(t == 0)
    def _():
        o_ref[:] = partial.astype(o_ref.dtype)

    @pl.when(t > 0)
    def _():
        o_ref[:] = o_ref[:] + partial.astype(o_ref.dtype)

    # -------- drain send completions before the kernel may exit -----------
    @pl.when(step == total - 1)
    def _():
        def drain(k, _):
            pltpu.make_async_copy(
                b_loc_hbm.at[pl.ds(0, TK), :],
                b_loc_hbm.at[pl.ds(0, TK), :],
                send_sem.at[0],
            ).wait()
            return _

        jax.lax.fori_loop(0, npush_ref[0], drain, None)


def halo_spmm_local(
    plan_arrays: tuple,      # this shard's slices of the HaloPlan arrays
    b_loc,                   # (max_k, n_pad) owned B rows (padded)
    buf,                     # (buf_rows, n_pad) persistent window buffer
    *, p, TM, G, W, Wc, C_panel, TN, pn_size=1, precision=None,
    interpret=False,
):
    """Device-side fused exec for one shard (inside shard_map over 'pm').

    ``b_loc``/``buf`` widths must already be TN-multiples (engine pads).
    Returns (C_shard (G*TM, n_pad) fp32, buf) — thread ``buf`` forward.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (ws_rel, a_panels, push_src, push_dev, push_dst, npush, exp_from,
     wait_bound) = plan_arrays
    n_pad = b_loc.shape[1]
    assert n_pad % TN == 0, (n_pad, TN)
    NJ = n_pad // TN

    if precision is None and np.dtype(a_panels.dtype) == np.float32:
        # match the unfused windowed kernel: fp32 data computes exactly
        precision = jax.lax.Precision.HIGHEST
    if precision == "x3" and np.dtype(a_panels.dtype) != np.float32:
        precision = None
    kern = functools.partial(
        _halo_kernel,
        p=p, pn_size=pn_size, Wc=Wc, TN=TN, NJ=NJ, C=C_panel,
        compute_dtype=a_panels.dtype, precision=precision,
        use_barrier=not interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(G, NJ, C_panel),
        in_specs=[
            pl.BlockSpec((1, TM, Wc), lambda g, j, t, *_: (g, 0, t)),
            pl.BlockSpec(memory_space=pl.ANY),   # b_loc stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # window buffer in HBM
        ],
        out_specs=[
            pl.BlockSpec((TM, TN), lambda g, j, t, *_: (g, j)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Wc, TN), b_loc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((p,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    acc_dtype = (
        jnp.float64 if np.dtype(a_panels.dtype) == np.float64
        else jnp.float32
    )
    out, buf_new = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G * TM, n_pad), acc_dtype),
            jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        ],
        input_output_aliases={9: 1},  # buf (arg 9 incl. scalars) -> out 1
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # collective_id keys the barrier semaphore; only legal when the
            # kernel actually uses one (multi-shard, compiled mode)
            collective_id=13 if (p > 1 and not interpret) else None,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(ws_rel, push_src, push_dev, push_dst, npush, exp_from, wait_bound,
      a_panels, b_loc, buf)
    return out, buf_new
