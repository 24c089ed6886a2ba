"""crp-suite — benchmark sweep harness (the ``SC23_AD`` analog).

The reference ships SLURM scripts + MATLAB plotters holding the published
sweep results (``deprecated/SC23_AD/scripts/*.pbs``, ``figures/*.m``:
strong scaling, n sweeps, runtime breakdowns, comm volumes).  This harness
reproduces those sweep shapes on TPU/CPU meshes and emits machine-readable
JSON lines (one per configuration) ready for plotting, including the
comm-volume audit (planned / physical / minimal).

Usage:
  crp-suite scaling <mtx|synth:spec> <n> [--procs=1,2,4,8] [--ntest=3] ...
  crp-suite vary_n  <mtx|synth:spec> <p> [--ns=16,64,256,1024]
                    [--plan-procs=P]  # also record the 2D planner's pm x pn
                                      # choice per n for a P-device mesh (the
                                      # SC23 Fig. 7 shape: pn grows with n,
                                      # ``figures/plot_vary_n2.m:4-7``)
  crp-suite modes   <mtx|synth:spec> <n> <p>        # a2a vs ring vs overlap
  crp-suite kernels <mtx|synth:spec> <n> <p>        # --list=segsum,ell,
                    # pallas,ragged,gather,dd,dd_mxu,pallas_halo

Common flags: --engine=para2d|rowpara  --kernel=...  --dtype=...
  --reorder=rcm|metis|cluster (locality reordering before packing, recorded
  before/after bandwidth — the cage15-rcm preprocessing analog)
  --ntest=N  --out=FILE.jsonl  --cpu-mesh=N (re-exec on an N-device
  virtual CPU mesh — the reference's "mpirun -np P on one box")
  --trace=DIR (wrap the sweep in a jax.profiler trace: per-op device
  time, DMA waits and fusion boundaries in TensorBoard/xprof format —
  the XLA-level counterpart of the reference's phase stat tables)
  --distributed (call jax.distributed.initialize first: run the SAME
  command on every pod-slice host, e.g. via scripts/pod_suite.sh — the
  ``srun`` analog of the reference's SLURM scripts)

Matrices: a Matrix Market path, or synth:banded:<nrow>:<nnz_per_row>:<bw>,
synth:plaw:<nrow>:<deg>, or
synth:cplaw:<nrow>:<deg>:<comm>[:<p_local_pct>[:perm]] (network-free
benchmarking; cplaw = community power-law, the post-reordering structure
of the reference's social/co-purchase inputs).  --project=1 attaches the
projected multi-chip exec block (plan.project) to rowpara records.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _reexec_cpu_mesh(n: int) -> None:
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    )
    env["JAX_ENABLE_X64"] = "1"
    env["CRP_SUITE_MESH_READY"] = "1"
    argv = [a for a in sys.argv if not a.startswith("--cpu-mesh")]
    os.execvpe(sys.executable, [sys.executable, "-m", "crp_tpu.cli.suite_cli"]
               + argv[1:], env)


def run_one(a, n, p, engine_kind, config, dtype, ntest, check, inner=10):
    """Build one engine config, time ntest execs, return a result record."""
    import jax

    from ..engine.para2d import Para2dSpmm
    from ..engine.rowpara import RowParaSpmm
    from ..plan.partition1d import csr_row_partition
    from ..plan.planner2d import plan_from_csr
    from ..sparse.synth import fill_b
    from ..shard.layout import make_mesh_1d, make_mesh_auto
    from ..utils.blocks import uniform_displs
    from ..utils.norms import rel_fro_err

    rec = dict(
        matrix=dict(m=a.nrow, k=a.ncol, nnz=a.nnz), n=n, p=p,
        engine=engine_kind, kernel=config.kernel,
        mode=("overlap" if config.overlap else
              ("ring" if config.rb_p2p else "a2a")),
        dtype=str(np.dtype(dtype)) if config.kernel != "dd" else "dd",
        backend=jax.default_backend(),
    )
    if rec["backend"] == "cpu" and p > 1:
        # the virtual mesh's devices share one host core — keep the
        # warning in the row itself so nobody sums exec_s into a scaling
        # claim (VERDICT r4 weak #5); comm volumes are the real payload
        rec["exec_note"] = (
            "virtual CPU mesh: exec_s/gflops are NOT performance data; "
            "comm volumes are the meaningful fields"
        )
    t0 = time.perf_counter()
    if engine_kind == "para2d":
        plan = plan_from_csr(a, n, p)
        rec["pm"], rec["pn"] = plan.pm, plan.pn
        rec["plan_s"] = round(time.perf_counter() - t0, 4)
        eng = Para2dSpmm(
            a, plan, mesh=make_mesh_auto(plan.pm, plan.pn),
            config=config, dtype=dtype,
        )
        rec["comm"] = dict(
            replicate_A=eng.rA_cost,
            exchange_B=eng.rB_recv_size * n,
            physical_B_rows=eng.xplan.physical_rows_ring
            if (config.overlap or config.rb_p2p) else eng.xplan.physical_rows,
        )
    elif engine_kind == "crp":
        from ..engine.crp import CrpSpmm
        from ..plan.bandwidth import calc_bandwidth_part2d
        from ..shard.redist import BlockDist

        user_B = BlockDist.from_row_slabs(uniform_displs(a.ncol, p), n)
        user_C = BlockDist.from_row_slabs(uniform_displs(a.nrow, p), n)
        bp = calc_bandwidth_part2d(
            p, a.nrow, n, a.ncol, a.rowptr, a.row_col_ranges_v1()
        )
        rec["pm"], rec["pn"] = bp.np_row, bp.np_col
        rec["plan_s"] = round(time.perf_counter() - t0, 4)
        eng = CrpSpmm(
            a, n, user_B, user_C, nproc=p,
            mesh=make_mesh_auto(bp.np_row, bp.np_col),
            config=config, dtype=dtype, bplan=bp,
        )
        rec["comm"] = dict(
            redist_A=eng.nelem_A_rd, allgatherv_A=eng.nelem_A_agv,
            redist_B=eng.nelem_B_rd, a2av_B=eng.nelem_B_a2av,
            a2av_B_necessary=eng.nelem_B_a2av_min,
        )
        rec["init_s"] = round(eng.t_init, 4)
        from ..sparse.synth import fill_b as _fb

        if config.kernel == "dd":
            # dd runs B/C as fp32 hi/lo halves through both
            # redistributions — only exec() (host path) packs them; plain
            # fp32 shards through exec_device would compute garbage.  The
            # record carries timing="host_roundtrip" because exec_s here
            # includes per-iteration host split/pack/unshard that the
            # device-only rows exclude — not comparable within one table.
            rec["timing"] = "host_roundtrip"
            b = np.asarray(_fb(0, a.ncol, 0, n, dtype=np.float64))
            out = eng.exec(b)  # warm-up/compile
            eng.clear_stat()
            times = []
            for _ in range(ntest):
                st = time.perf_counter()
                out = eng.exec(b)
                times.append(time.perf_counter() - st)
        else:
            b = np.asarray(_fb(0, a.ncol, 0, n, dtype=dtype))
            bs = eng.rd_B.shard_src(b)
            c = eng.exec_device(bs)  # warm-up/compile
            eng.clear_stat()
            times = []
            for _ in range(ntest):
                st = time.perf_counter()
                c = eng.exec_device(bs)
                c.block_until_ready()
                times.append(time.perf_counter() - st)
            out = eng.rd_C.unshard_dst(c, a.nrow, n) if check else None
        rec["exec_s"] = dict(
            min=round(min(times), 6), avg=round(sum(times) / len(times), 6),
            max=round(max(times), 6),
        )
        rec["gflops"] = round(2.0 * a.nnz * n / min(times) / 1e9, 1)
        if check:
            rec["rel_fro_err"] = float(rel_fro_err(a.spmm_ref(b), out))
        return rec
    else:
        rb = csr_row_partition(a.rowptr, p)
        b_displs = rb if a.nrow == a.ncol else uniform_displs(a.ncol, p)
        rec["pm"], rec["pn"] = p, 1
        rec["plan_s"] = round(time.perf_counter() - t0, 4)
        eng = RowParaSpmm(
            a, rb, b_displs, n, mesh=make_mesh_1d(p), config=config,
            dtype=dtype,
        )
        rec["comm"] = dict(
            exchange_B=eng.rB_recv_size * n,
            physical_B_rows=eng.xplan.physical_rows_ring
            if (config.overlap or config.rb_p2p) else eng.xplan.physical_rows,
        )
    rec["init_s"] = round(eng.t_init, 4)
    if getattr(eng, "init_breakdown", None):
        rec["init_breakdown"] = eng.init_breakdown
    rec["kernel_resolved"] = eng.kernel_kind
    lf = getattr(eng, "_local_fn", None)
    rl = getattr(lf, "roofline", None)
    if rl is not None:
        # panel-vs-CSR storage accounting (the uniform windowed kernel's
        # densification factor is the single-chip reach limiter; ragged's
        # is the point of comparison)
        rec["kernel_detail"] = dict(
            variant=getattr(lf, "variant", "uniform"),
            a_panel_bytes=int(rl["a_bytes"]),
            csr_bytes=int(
                a.nnz * (4 + np.dtype(dtype).itemsize) + (a.nrow + 1) * 8
            ),
            **{k: rl[k]
               for k in ("mxu_frac", "S", "spill_nnz", "spill_impl",
                         "TM", "W")
               if k in rl},
        )

    b = np.asarray(
        fill_b(0, a.ncol, 0, n,
               dtype=np.float64 if config.kernel == "dd" else dtype)
    )
    bs = eng.shard_b(b)
    bs.block_until_ready()
    import jax.numpy as jnp

    reduce = jax.jit(jnp.sum)
    c = eng.exec_device(bs)
    float(reduce(c))  # compile fence
    # ``inner`` pipelined execs per host fence: a fence costs ~45 ms
    # through a tunneled chip, which would swamp fast configs
    times = []
    for _ in range(ntest):
        st = time.perf_counter()
        for _ in range(inner):
            c = eng.exec_device(bs)
        float(reduce(c))
        times.append((time.perf_counter() - st) / inner)
    rec["exec_s"] = dict(
        min=round(min(times), 6), avg=round(sum(times) / len(times), 6),
        max=round(max(times), 6),
    )
    rec["inner"] = inner
    rec["gflops"] = round(2.0 * a.nnz * n / min(times) / 1e9, 1)
    if rl is not None:
        # same roofline audit as bench.py (panel FLOPs, not nominal sparse)
        tn_ = 256 if n % 256 == 0 else 128
        n_pad = -(-n // tn_) * tn_
        prec = getattr(config, "mxu_precision", "highest")
        # dd_mxu and the packs record their true pass count; the env map
        # is only the legacy fallback
        passes = rl.get(
            "passes", {"x3": 3, "highest": 6, "default": 1}.get(prec, 1)
        )
        chunks = rl.get("S", rl["G"])
        dense_flops = 2.0 * chunks * rl["TM"] * rl["W"] * n_pad
        mxu_peak = float(os.environ.get("CRP_BENCH_MXU_PEAK", 197)) * 1e12
        t_ = min(times)
        rec["roofline"] = dict(
            mxu_prec=prec,
            dense_gflops=round(dense_flops / 1e9, 1),
            achieved_tflops=round(dense_flops * passes / t_ / 1e12, 2),
            mxu_util=round(dense_flops * passes / t_ / mxu_peak, 3),
        )
    if check:
        rec["rel_fro_err"] = float(rel_fro_err(a.spmm_ref(b), eng.unshard_c(c)))
    return rec


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    pos = [x for x in argv if not x.startswith("--")]
    opt = dict(
        (x[2:].split("=", 1) + ["1"])[:2] for x in argv if x.startswith("--")
    )
    if len(pos) < 2:
        print(__doc__)
        return 255
    if "cpu-mesh" in opt and os.environ.get("CRP_SUITE_MESH_READY") != "1":
        _reexec_cpu_mesh(int(opt["cpu-mesh"]))
    if "distributed" in opt:
        from ..shard.layout import init_distributed

        init_distributed()

    from ..config import SpmmConfig
    from .plan_cli import load_matrix

    sweep = pos[0]
    a = load_matrix(pos[1], need_symm=False)
    # --reorder=rcm|metis|cluster: locality reordering BEFORE packing —
    # the reference benches reordered social graphs as separate inputs
    # (cage15-rcm, SC23_AD/readme.md:95-102); here it is a recorded
    # preprocessing step so scrambled-id graphs regain the community
    # structure the ragged cover needs
    reorder_info = None
    if "reorder" in opt:
        from ..sparse.reorder import (
            cluster_reorder, metis_row_partition, rcm_reorder,
        )

        bw0 = int(a.bandwidth())
        t0 = time.perf_counter()
        if opt["reorder"] == "rcm":
            a, _ = rcm_reorder(a)
        elif opt["reorder"] == "metis":
            a, _, _ = metis_row_partition(
                a, int(opt.get("reorder-parts", 8))
            )
        elif opt["reorder"] == "cluster":
            # recursive-bisection locality ordering — restores community
            # structure a flat k-way reorder cannot (r4_tpu_reorder.jsonl)
            a, _ = cluster_reorder(
                a, leaf_size=int(opt.get("reorder-leaf", 256))
            )
        else:
            raise SystemExit(f"unknown --reorder={opt['reorder']!r}")
        reorder_info = dict(
            method=opt["reorder"],
            seconds=round(time.perf_counter() - t0, 2),
            bandwidth_before=bw0, bandwidth_after=int(a.bandwidth()),
        )
    ntest = int(opt.get("ntest", 3))
    inner = int(opt.get("inner", 10))
    check = int(opt.get("check", 1))
    engine = opt.get("engine", "para2d")
    dtype = np.dtype(opt.get("dtype", "float32"))
    base = SpmmConfig.from_env()
    if "kernel" in opt:
        base.kernel = opt["kernel"]

    import dataclasses

    def cfg(**kw):
        return dataclasses.replace(base, **kw)

    runs = []
    if sweep == "scaling":
        n = int(pos[2])
        procs = [int(x) for x in opt.get("procs", "1,2,4,8").split(",")]
        runs = [(a, n, p, engine, base, dtype) for p in procs]
    elif sweep == "vary_n":
        p = int(pos[2])
        ns = [int(x) for x in opt.get("ns", "16,64,256,1024").split(",")]
        runs = [(a, n, p, engine, base, dtype) for n in ns]
    elif sweep == "modes":
        n, p = int(pos[2]), int(pos[3])
        runs = [
            (a, n, p, engine, cfg(rb_p2p=0, overlap=0), dtype),
            (a, n, p, engine, cfg(rb_p2p=1, overlap=0), dtype),
            (a, n, p, engine, cfg(overlap=1), dtype),
        ]
    elif sweep == "kernels":
        n, p = int(pos[2]), int(pos[3])
        runs = [
            (a, n, p, engine, cfg(kernel=k), dtype)
            for k in opt.get("list", "segsum,ell,pallas,dd").split(",")
        ]
    else:
        raise SystemExit(f"unknown sweep {sweep!r}")

    out = open(opt["out"], "a") if "out" in opt else None
    plan_procs = int(opt.get("plan-procs", 0))
    # --trace=DIR: wrap the sweep in a jax.profiler trace (TensorBoard /
    # xprof format) — the XLA-level counterpart of the reference's
    # per-phase stat tables (rp_spmm_print_stat, src/rowpara_spmm.c:424-476):
    # shows per-op device time, DMA waits, and fusion boundaries on chip.
    import contextlib

    if "trace" in opt:
        import jax

        trace_cm = jax.profiler.trace(opt["trace"])
    else:
        trace_cm = contextlib.nullcontext()
    with trace_cm:
        _sweep(runs, opt, pos, sweep, a, dtype, reorder_info,
               ntest, check, inner, out, plan_procs)
    if out:
        out.close()
    return 0


def _sweep(runs, opt, pos, sweep, a, dtype, reorder_info,
           ntest, check, inner, out, plan_procs):
    for args in runs:
        try:
            rec = run_one(*args, ntest=ntest, check=check, inner=inner)
        except Exception as e:  # record the failure, keep sweeping
            rec = dict(
                sweep=sweep, engine=args[3], n=args[1], p=args[2],
                kernel=args[4].kernel, error=f"{type(e).__name__}: {e}",
            )
        if int(opt.get("project", 0)) and args[3] == "rowpara" \
                and "error" not in rec:
            # per-record projected multi-chip exec (plan.project): kernel
            # roofline + exact exchange bytes over ICI, with/without overlap
            from ..plan.project import project_exec_1d

            rec["projected"] = project_exec_1d(
                a, args[1], args[2],
                mxu_prec=os.environ.get("CRP_TPU_MXU_PREC", "highest"),
                dtype=dtype,
            )
        if plan_procs:
            # what grid WOULD the 2D planner pick for this n on a
            # plan_procs-device mesh (independent of the exec config)
            from ..plan.planner2d import plan_from_csr

            pl = plan_from_csr(a, args[1], plan_procs)
            rec["planner"] = dict(
                nproc=plan_procs, pm=pl.pm, pn=pl.pn,
                comm_cost=int(pl.comm_cost),
            )
        rec["sweep"] = sweep
        rec["spec"] = pos[1]  # matrix source (file path or synth:spec)
        if reorder_info is not None:
            rec["reorder"] = reorder_info
        # pin the knobs that shape the pack/exec so A/B rows in one file
        # stay distinguishable (e.g. CRP_TPU_SPILL_IMPL sweeps)
        knobs = {
            k: v for k, v in os.environ.items()
            if k.startswith(("CRP_TPU_", "CRP_PROJ_", "CRP_BENCH_"))
        }
        if knobs:
            rec["knobs"] = knobs
        line = json.dumps(rec)
        print(line, flush=True)
        if out:
            out.write(line + "\n")


if __name__ == "__main__":
    raise SystemExit(main())
