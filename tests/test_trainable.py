"""Value-parameterized SpMM (engine/trainable.py): forward, dB, dvals, SDDMM.

Contract: C = A(v) @ B is linear in both B and v, so for
L = sum(W * C):  dL/dB = A(v)^T @ W  and  dL/dv[q] = dot(W[row_q], B[col_q])
(the SDDMM at A's pattern) — both checked against dense fp64 references
on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crp_tpu.config import SpmmConfig
from crp_tpu.engine.trainable import ValueParameterizedSpmm
from crp_tpu.plan.partition1d import csr_row_partition
from crp_tpu.shard.layout import make_mesh_1d, shard_dense_rows
from crp_tpu.sparse.synth import banded_random_csr, fill_b, powerlaw_random_csr
from crp_tpu.utils.norms import rel_fro_err


def _mk(a, p, devices8, n=8, config=None):
    displs = csr_row_partition(a.rowptr, p)
    return ValueParameterizedSpmm(
        a, displs, displs, n,
        mesh=make_mesh_1d(p, devices=devices8),
        config=config, dtype=np.float32,
    )


def _nnz_rows(a):
    return np.repeat(np.arange(a.nrow), np.diff(a.rowptr))


@pytest.mark.parametrize("mk,p", [("banded", 4), ("plaw", 4), ("banded", 1)])
def test_forward_and_both_grads_match_dense(mk, p, devices8):
    if mk == "banded":
        a = banded_random_csr(400, nnz_per_row=9, bandwidth=40, seed=30)
    else:
        a = powerlaw_random_csr(400, avg_degree=8, seed=31)
    n = 8
    vp = _mk(a, p, devices8, n=n)
    b = np.asarray(fill_b(0, a.ncol, 0, n, dtype=np.float32))
    bs = vp.shard_b(b)

    # train-time values differ from the packed ones — that's the point
    rng = np.random.default_rng(32)
    v = rng.standard_normal(a.nnz).astype(np.float32)
    vals = jnp.asarray(v)

    # forward: C = A(v) @ B against the dense reference
    cs = vp.op(bs, vals)
    c = vp.unshard_c(cs)
    a_v = a.to_dense().astype(np.float64) * 0  # pattern scaffold
    rows = _nnz_rows(a)
    a_v[rows, a.colidx] += v.astype(np.float64)
    ref_c = a_v @ b.astype(np.float64)
    assert rel_fro_err(ref_c, c) <= 1e-5

    # L = sum(W * C): dB = A(v)^T @ W, dv = SDDMM(W, B)
    w = rng.standard_normal((a.nrow, n)).astype(np.float32)
    ws = jnp.asarray(shard_dense_rows(
        w, vp.fwd.A_row_displs, pad_rows=int(cs.shape[1])
    ))

    def loss(x, vv):
        return jnp.sum(vp.op(x, vv) * ws)

    gb, gv = jax.grad(loss, argnums=(0, 1))(bs, vals)
    db = vp.unshard_db(gb)
    ref_db = a_v.T @ w.astype(np.float64)
    assert rel_fro_err(ref_db[: db.shape[0]], db) <= 1e-4

    ref_dv = np.sum(
        w.astype(np.float64)[rows] * b.astype(np.float64)[a.colidx], axis=1
    )
    assert gv.shape == (a.nnz,)
    assert rel_fro_err(ref_dv[None], np.asarray(gv, dtype=np.float64)[None]) <= 1e-4


def test_sddmm_standalone_matches_dense(devices8):
    a = powerlaw_random_csr(300, avg_degree=7, seed=33)
    n, p = 8, 4
    vp = _mk(a, p, devices8, n=n)
    rng = np.random.default_rng(34)
    x = rng.standard_normal((a.nrow, n)).astype(np.float32)
    y = rng.standard_normal((a.ncol, n)).astype(np.float32)
    xs = jnp.asarray(shard_dense_rows(
        x, vp.fwd.A_row_displs, pad_rows=vp.fwd.max_m
    ))
    ys = vp.shard_b(y)
    out = np.asarray(vp.sddmm(xs, ys), dtype=np.float64)
    rows = _nnz_rows(a)
    ref = np.sum(
        x.astype(np.float64)[rows] * y.astype(np.float64)[a.colidx], axis=1
    )
    assert out.shape == (a.nnz,)
    assert rel_fro_err(ref[None], out[None]) <= 1e-4


def test_composes_under_jit_and_training_step(devices8):
    """One optax-style step over the values: jit(grad(loss))(vals) moves
    the loss downhill — the trainable-adjacency (GAT-ish) smoke path."""
    a = banded_random_csr(200, nnz_per_row=5, bandwidth=20, seed=35)
    n, p = 8, 2
    vp = _mk(a, p, devices8, n=n)
    b = np.asarray(fill_b(0, a.ncol, 0, n, dtype=np.float32))
    bs = vp.shard_b(b)
    rng = np.random.default_rng(36)
    target = jnp.asarray(rng.standard_normal((p, vp.fwd.max_m, n)), jnp.float32)

    def loss(vv):
        d = vp.op(bs, vv) - target
        return jnp.mean(d * d)

    vals = jnp.asarray(np.asarray(a.val, dtype=np.float32))
    gfn = jax.jit(jax.value_and_grad(loss))
    l0, g = gfn(vals)
    # a short step along -g must descend (first-order guarantee)
    lr = 1e-2 / (float(jnp.linalg.norm(g)) + 1e-12)
    l1, _ = gfn(vals - lr * g)
    assert float(l1) < float(l0)


def test_rejects_incompatible_configs(devices8):
    a = banded_random_csr(100, nnz_per_row=5, bandwidth=10, seed=37)
    displs = csr_row_partition(a.rowptr, 2)
    mesh = make_mesh_1d(2, devices=devices8)
    for cfg in (
        SpmmConfig(kernel="pallas"),
        SpmmConfig(kernel="segsum", overlap=1),
        SpmmConfig(kernel="segsum", bc_layout=1),
    ):
        with pytest.raises(ValueError):
            ValueParameterizedSpmm(a, displs, displs, 8, mesh=mesh, config=cfg)
    # kernel="auto" resolves to segsum instead of refusing
    vp = ValueParameterizedSpmm(
        a, displs, displs, 8, mesh=mesh, config=SpmmConfig(kernel="auto")
    )
    assert vp.fwd.kernel_kind == "segsum"
