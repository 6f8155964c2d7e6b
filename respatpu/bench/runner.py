"""Corpus sweep runner: the L4/L5 layer (bench_spmv.cc + run_*.sh equivalents).

Runs a configured experiment over the corpus and appends CSV rows in the
reference's schema family:

  spmv:   policy,chips,matrix,n,nnz,synthetic,t_hi_s,t_lo_s,mean_abs_err,ts
          (test_spmv.c:51-219 row: threads,matrix,t64,t32,err,date)
  ilu0:   policy,matrix,t_analyze,t_factor,t_apply,cp_residual,pivots,ts
          (GPU/ilu0.cu:312-317 phase printout)
  lu:     policy,matrix,t_analyze,t_factor,t_solve,iters,residual,pivots,ts
          (test_pardiso.c:290-291 row)

Unlike the reference, precision/FTZ are runtime flags (no recompiles) and
synthetic stand-ins are flagged in-row so real-corpus and fallback runs are
never conflated. Append-mode CSV keeps sweeps resumable (test_spmv.c:50).
"""
from __future__ import annotations

import csv
import dataclasses
import os
import time
from datetime import datetime, timezone
from typing import List, Optional, Sequence

import numpy as np

from . import corpus
from .. import solve as slv
from ..precision import get_policy

__all__ = ["sweep_spmv", "sweep_ilu0", "sweep_ilu0_dist", "sweep_lu",
           "run_sweep"]


def _ts() -> str:
    return datetime.now(timezone.utc).isoformat(timespec="seconds")


def _append(path: Optional[str], header: Sequence[str], row: Sequence):
    if path is None:
        return
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(header)
        w.writerow(row)


def sweep_spmv(names: Sequence[str], csv_path: Optional[str] = None,
               policies=("df64", "fp32"), reps: int = 5,
               max_synth_nnz: Optional[int] = 70_000_000, verbose: bool = True):
    """Dual-precision SpMV sweep (test_spmv.c protocol): per matrix, time the
    high- and low-precision kernels and report their mean abs difference."""
    import jax
    out = []
    header = ["policy_hi", "policy_lo", "chips", "matrix", "n", "nnz",
              "synthetic", "t_hi_s", "t_lo_s", "t_lo_min_s", "t_lo_std_s",
              "mean_abs_err", "n_overflow", "timestamp"]
    for name in names:
        a, synth = corpus.load_matrix(name, max_synth_nnz=max_synth_nnz)
        rng = np.random.default_rng(42)
        x = rng.standard_normal(a.shape[1])  # LAPACKE_dlarnv analogue
        y_hi, t_hi = slv.spmv_timed(a, x, policies[0], reps=1)
        # statistical repetitions for the low-precision timing (the
        # Google-benchmark role of bench_spmv.cc)
        lo_times = []
        for _ in range(max(reps, 1)):
            y_lo, t_lo = slv.spmv_timed(a, x, policies[1], reps=1)
            lo_times.append(t_lo)
        t_lo = float(np.mean(lo_times))
        from ..solve import _to_host_f64
        err = float(np.abs(_to_host_f64(y_hi) - _to_host_f64(y_lo)).mean())
        # overflow-guarded downcast accounting (corrected test_spmv.c:109-145)
        from ..precision import downcast_check, get_policy as _gp
        n_over = 0
        if not _gp(policies[1]).double_word:
            _, n_over = downcast_check(a.data)
        row = [policies[0], policies[1], jax.device_count(), name,
               a.shape[0], a.nnz, int(synth), f"{t_hi:.6e}", f"{t_lo:.6e}",
               f"{min(lo_times):.6e}", f"{float(np.std(lo_times)):.2e}",
               f"{err:.3e}", n_over, _ts()]
        _append(csv_path, header, row)
        out.append(dict(zip(header, row)))
        if verbose:
            print(f"[spmv] {name}: t_{policies[0]}={t_hi*1e3:.2f}ms "
                  f"t_{policies[1]}={t_lo*1e3:.2f}ms err={err:.2e}"
                  f"{' (synthetic)' if synth else ''}")
    return out


def _krylov_ir(solve_once, a, b, tol: float = 1e-10, rounds: int = 5):
    """Host-level iterative refinement around an inner Krylov solve: the
    inner solver converges to its (fp32) limit; df64-accurate host residuals
    push the composite to the reference 1e-10 gate when the preconditioner
    is strong enough.  Returns (x, residual, total_inner_iters)."""
    bb = np.asarray(b, np.float64)
    nb = np.linalg.norm(bb)
    nb = nb if nb > 0 else 1.0
    x = np.zeros_like(bb)
    total = 0
    resid = float("inf")
    for _ in range(rounds):
        rows = np.repeat(np.arange(a.nrows), a.row_lengths())
        ax = np.zeros(a.nrows)
        np.add.at(ax, rows, a.data * x[a.indices])
        r = bb - ax
        resid = float(np.linalg.norm(r)) / nb
        if resid <= tol:
            break
        d, iters = solve_once(r)
        total += iters
        x = x + d
    return x, resid, total


def sweep_ilu0(names: Sequence[str], csv_path: Optional[str] = None,
               policy="fp32", sweeps: int = 8,
               max_synth_nnz: Optional[int] = 10_000_000,
               krylov_gate: float = 1e-10, verbose: bool = True):
    """ILU(0) factorization + preconditioner apply, phase-timed
    (GPU/run_ilu0.sh protocol), plus an ILU-preconditioned Krylov solve
    driven through df64-residual refinement to the reference 1e-10 gate
    (BASELINE.json target #2; test_superILU.c:117-133 capability)."""
    out = []
    header = ["policy", "matrix", "n", "nnz", "synthetic", "t_analyze_s",
              "t_factor_s", "t_apply_s", "cp_residual", "pivots_perturbed",
              "t_krylov_s", "krylov_iters", "krylov_residual", "status",
              "timestamp"]
    for name in names:
        a, synth = corpus.load_matrix(name, max_synth_nnz=max_synth_nnz)
        try:
            pre = slv.Ilu0Preconditioner(a, policy=policy, sweeps=sweeps)
        except MemoryError as e:
            row = [policy, name, a.shape[0], a.nnz, int(synth), "", "", "",
                   str(e)[:120], 0, "", 0, "", "infeasible", _ts()]
            _append(csv_path, header, row)
            out.append(dict(zip(header, row)))
            continue
        rng = np.random.default_rng(0)
        import jax
        import jax.numpy as jnp
        from .. import precision as prec
        b = rng.standard_normal(a.shape[0])
        pol = get_policy(policy)
        bd = prec.df_from_f64(b) if pol.double_word else jnp.asarray(b, jnp.float32)
        z = pre.apply(bd)  # warm
        jax.block_until_ready(z if not hasattr(z, "hi") else z.hi)
        t0 = time.perf_counter()
        z = pre.apply(bd)
        from ..solve import _to_host_f64
        _ = _to_host_f64(z)
        t_apply = time.perf_counter() - t0

        # preconditioned Krylov + df64-residual refinement to the gate
        t0 = time.perf_counter()

        def inner(r):
            xk, rep = slv.gmres(a, r, precond=pre, tol=1e-7)
            return xk, rep.iterations

        bk, _ = slv.make_rhs_for_known_x(a)
        xk, kres, kiters = _krylov_ir(inner, a, bk, tol=krylov_gate)
        t_krylov = time.perf_counter() - t0
        status = "ok" if kres <= krylov_gate else "stagnated"
        row = [policy, name, a.shape[0], a.nnz, int(synth),
               f"{pre.report.t_analyze:.4f}", f"{pre.report.t_factorize:.4f}",
               f"{t_apply:.4f}", pre.report.notes,
               pre.report.n_pivot_perturbed, f"{t_krylov:.4f}", kiters,
               f"{kres:.3e}", status, _ts()]
        _append(csv_path, header, row)
        out.append(dict(zip(header, row)))
        if verbose:
            print(f"[ilu0] {name}: factor={pre.report.t_factorize:.3f}s "
                  f"apply={t_apply*1e3:.1f}ms krylov={kres:.1e}/{kiters}it "
                  f"{status}{' (synthetic)' if synth else ''}")
        if jax.default_backend() == "cpu":
            jax.clear_caches()  # vm.max_map_count guard (XLA:CPU only)
    return out


def sweep_ilu0_dist(names: Sequence[str], csv_path: Optional[str] = None,
                    ndev: int = 8,
                    max_synth_nnz: Optional[int] = 5_000_000,
                    krylov_gate: float = 1e-10, verbose: bool = True):
    """Distributed ILU sweep: per-shard block-Jacobi ILU(0) + row-partitioned
    SpMV on an ``ndev``-device mesh, BiCGSTAB inner solves refined with df64
    host residuals — the N-device leg of BASELINE.json target #2."""
    import jax

    from ..dist import BlockJacobiIlu, DistSpmv, dist_bicgstab, make_mesh
    out = []
    header = ["policy", "matrix", "n", "nnz", "synthetic", "ndev",
              "t_setup_s", "t_krylov_s", "krylov_iters", "krylov_residual",
              "status", "timestamp"]
    for name in names:
        a, synth = corpus.load_matrix(name, max_synth_nnz=max_synth_nnz)
        mesh = make_mesh(ndev)
        t0 = time.perf_counter()
        op = DistSpmv(a, mesh)
        pre = BlockJacobiIlu(a, op.plan, mesh)
        t_setup = time.perf_counter() - t0

        def inner(r):
            return dist_bicgstab(a, r, mesh=mesh, tol=1e-7, op=op, pre=pre)

        b, _ = slv.make_rhs_for_known_x(a)
        t0 = time.perf_counter()
        x, kres, kiters = _krylov_ir(inner, a, b, tol=krylov_gate)
        t_krylov = time.perf_counter() - t0
        status = "ok" if kres <= krylov_gate else "stagnated"
        row = ["fp32+ir_df64", name, a.shape[0], a.nnz, int(synth), ndev,
               f"{t_setup:.4f}", f"{t_krylov:.4f}", kiters,
               f"{kres:.3e}", status, _ts()]
        _append(csv_path, header, row)
        out.append(dict(zip(header, row)))
        if verbose:
            print(f"[ilu0dist] {name}: setup={t_setup:.2f}s "
                  f"krylov={kres:.1e}/{kiters}it {status}"
                  f"{' (synthetic)' if synth else ''}")
        if jax.default_backend() == "cpu":
            jax.clear_caches()  # vm.max_map_count guard (XLA:CPU only)
    return out


def sweep_lu(names: Sequence[str], csv_path: Optional[str] = None,
             policy="fp32", refine: bool = True, method: str = "auto",
             matching="auto", max_synth_nnz: Optional[int] = 8_000_000,
             max_band_bytes: int = 4 << 30, verbose: bool = True):
    """Direct LU factorize+solve sweep with optional df64 refinement
    (test_pardiso.c / run_pardiso.sh protocol).

    Routes through ``solve.factorize``'s auto chain (band -> multifrontal ->
    scheduled, with GESP matching auto-enabled for structurally unsymmetric
    patterns), so every corpus matrix gets a real factorization — the
    reference's PARDISO driver covers all 36 matrices (test_pardiso.c:185-244)
    and so does this sweep. The method that served each row is recorded in
    the ``method`` column."""
    out = []
    header = ["policy", "matrix", "n", "nnz", "synthetic", "method",
              "t_analyze_s", "t_factor_s", "t_factor_warm_s", "t_solve_s",
              "iterations", "rel_residual", "pivots_perturbed", "status",
              "timestamp"]
    for name in names:
        a, synth = corpus.load_matrix(name, max_synth_nnz=max_synth_nnz)
        b, x_true = slv.make_rhs_for_known_x(a)
        used = ""
        t_warm = float("nan")
        try:
            fac = slv.factorize(a, policy=policy, method=method,
                                matching=matching,
                                max_band_bytes=max_band_bytes)
            used = fac.report.notes
            if hasattr(fac, "refactorize_timed"):
                # warm numeric phase (jits compiled): the honest kernel
                # wall time on slow-compile platforms — PARDISO phase-22
                # is reported warm by the reference protocol too
                # (run_pardiso.sh 11-rep loop)
                t_warm = fac.refactorize_timed()
            if refine:
                x, rep = slv.solve_refined(a, b, fac=fac)
            else:
                x = fac.solve(b)
                rep = fac.report
            # status gates on convergence, not mere completion: a refined
            # solve that stagnated above the 1e-10 reference gate must not
            # read "ok" (the SuperLU_MT driver alarms at exactly this
            # threshold, test_superLU_MT.c:230-234)
            status = "ok" if getattr(rep, "converged", True) else "stagnated"
        except MemoryError as e:
            rep = slv.SolveReport(policy=policy, notes=str(e))
            rep.residual = float("nan")
            status = "infeasible"
            used = str(e)[:120]  # surface the binding ceiling in the row
        except Exception as e:  # a sweep must report, not abort (run_*.sh)
            rep = slv.SolveReport(policy=policy, notes=f"{type(e).__name__}: {e}")
            rep.residual = float("nan")
            status = "error"
            used = f"{type(e).__name__}: {e}"[:120]
        row = [rep.policy, name, a.shape[0], a.nnz, int(synth), used,
               f"{rep.t_analyze:.4f}", f"{rep.t_factorize:.4f}",
               f"{t_warm:.4f}", f"{rep.t_solve:.4f}", rep.iterations,
               f"{rep.residual:.3e}", rep.n_pivot_perturbed, status, _ts()]
        _append(csv_path, header, row)
        out.append(dict(zip(header, row)))
        if verbose:
            print(f"[lu] {name}: {status} [{used}] "
                  f"factor={rep.t_factorize:.3f}s "
                  f"resid={rep.residual:.2e}{' (synthetic)' if synth else ''}")
        # each matrix compiles its own factor-group shapes; without this a
        # 21-matrix sweep accumulates hundreds of live XLA executables and
        # exhausts vm.max_map_count (LLVM "Cannot allocate memory" + SIGSEGV
        # observed on CPU at the default 65530 limit)
        import jax
        if jax.default_backend() == "cpu":
            jax.clear_caches()  # vm.max_map_count guard (XLA:CPU only)
    return out


def run_sweep(kind: str, group: str = "moderate", **kw):
    names = [e.name for e in (corpus.MODERATE if group == "moderate"
                              else corpus.BIG if group == "big" else corpus.ALL)]
    from .fetch import attempt_fetch
    attempt_fetch(names, group=group)  # no-op seconds in zero-egress envs
    fn = {"spmv": sweep_spmv, "ilu0": sweep_ilu0, "lu": sweep_lu,
          "ilu0dist": sweep_ilu0_dist}[kind]
    return fn(names, **kw)
