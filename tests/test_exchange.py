"""B-row halo exchange tests (comm layer) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from crp_tpu.comm.exchange import build_b_exchange, exchange_b, exchange_b_ring
from crp_tpu.plan.partition1d import csr_row_partition
from crp_tpu.sparse.synth import banded_random_csr, powerlaw_random_csr, fill_b
from crp_tpu.shard.layout import make_mesh_1d, shard_dense_rows
from crp_tpu.utils.blocks import uniform_displs


def run_exchange(a, p, n, reidx, devices8, impl=exchange_b):
    """Drive exchange_b under shard_map; return per-shard receive buffers."""
    displs = csr_row_partition(a.rowptr, p)
    b_displs = uniform_displs(a.ncol, p)
    shards = [a.row_slice(int(displs[i]), int(displs[i + 1])) for i in range(p)]
    plan = build_b_exchange([s.colidx for s in shards], b_displs, reidx=reidx)

    b = np.asarray(fill_b(0, a.ncol, 0, n))
    max_k = int(np.diff(b_displs).max())
    b_sh = shard_dense_rows(b, b_displs, pad_rows=max_k)
    mesh = make_mesh_1d(p, devices=devices8)
    sh = NamedSharding(mesh, P("pm"))

    def local(send_idx, recv_dst, self_src, self_dst, b_loc):
        return impl(
            b_loc[0], send_idx[0], recv_dst[0], self_src[0], self_dst[0],
            max(plan.rB_nrow_max, 1), "pm",
        )[None]

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("pm"), P("pm"), P("pm"), P("pm"), P("pm")),
        out_specs=P("pm"), check_vma=False,
    ))
    out = fn(
        jax.device_put(plan.send_idx, sh),
        jax.device_put(plan.recv_dst, sh),
        jax.device_put(plan.self_src, sh),
        jax.device_put(plan.self_dst, sh),
        jax.device_put(b_sh, sh),
    )
    return plan, shards, b, np.asarray(out)


@pytest.mark.parametrize("reidx", [True, False])
@pytest.mark.parametrize("p", [2, 4, 8])
def test_exchange_delivers_referenced_rows(p, reidx, devices8):
    a = banded_random_csr(400, nnz_per_row=6, bandwidth=35, seed=10)
    plan, shards, b, out = run_exchange(a, p, 12, reidx, devices8)
    for i, s in enumerate(shards):
        ref_rows = np.unique(s.colidx)
        for g in ref_rows:
            if reidx:
                dst = int(np.searchsorted(plan.rowmap[i], g))
            else:
                dst = int(g - plan.rowmap[i])
            np.testing.assert_array_equal(out[i, dst], b[g])


def test_exchange_logical_volume_matches_exact_count(devices8):
    """plan.rB_recv_rows must equal the planner's exact comm counting
    (the reference's rB_recv_size, src/rowpara_spmm.c:149)."""
    from crp_tpu.plan.partition1d import csr_row_part_comm_size

    a = powerlaw_random_csr(600, avg_degree=8, seed=11)
    p = 8
    displs = csr_row_partition(a.rowptr, p)
    b_displs = uniform_displs(a.ncol, p)
    shards = [a.row_slice(int(displs[i]), int(displs[i + 1])) for i in range(p)]
    plan = build_b_exchange([s.colidx for s in shards], b_displs, reidx=True)
    sizes, total = csr_row_part_comm_size(
        a.ncol, a.rowptr, a.colidx, displs, b_displs
    )
    np.testing.assert_array_equal(plan.rB_recv_rows, sizes)
    assert plan.total_recv_rows == total


@pytest.mark.parametrize("reidx", [True, False])
@pytest.mark.parametrize("p", [2, 3, 8])
def test_ring_matches_all_to_all(p, reidx, devices8):
    """The p2p ring (RP_SPMM_P2P=1 analog) delivers the same buffer as the
    single all_to_all for every shift pattern, including non-power-of-two p."""
    a = powerlaw_random_csr(500, avg_degree=9, seed=14)
    _, _, _, out_a2a = run_exchange(a, p, 10, reidx, devices8, impl=exchange_b)
    plan, _, _, out_ring = run_exchange(
        a, p, 10, reidx, devices8, impl=exchange_b_ring
    )
    for i in range(p):
        rows = int(plan.rB_nrow[i])
        np.testing.assert_array_equal(out_ring[i, :rows], out_a2a[i, :rows])
    assert plan.physical_rows_ring == p * (p - 1) * plan.S


def test_exchange_single_shard(devices8):
    """p=1 degenerates to the self-copy path."""
    a = banded_random_csr(50, nnz_per_row=4, bandwidth=5, seed=12)
    plan, shards, b, out = run_exchange(a, 1, 6, True, devices8)
    ref = np.unique(shards[0].colidx)
    np.testing.assert_array_equal(out[0, : len(ref)], b[ref])
