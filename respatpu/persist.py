"""Factorization persistence: factorize-once / solve-many across processes.

The reference's only resume mechanism is append-mode CSV (SURVEY.md §5.4);
here factorizations themselves are persisted (npz) so sweeps can restart
without refactorizing and serving processes can load prebuilt factors.
"""
from __future__ import annotations

import json
import os
from typing import Union

import numpy as np

from .formats import CSRMatrix
from .kernels import bandlu
from .precision import get_policy

__all__ = ["save_band_factorization", "load_band_factorization",
           "save_sparse_factorization", "load_sparse_factorization",
           "save_csr", "load_csr_npz"]

_FORMAT_VERSION = 1


def save_csr(path: str, a: CSRMatrix) -> None:
    np.savez_compressed(path, kind="csr", version=_FORMAT_VERSION,
                        shape=np.asarray(a.shape), indptr=a.indptr,
                        indices=a.indices, data=a.data)


def load_csr_npz(path: str) -> CSRMatrix:
    z = np.load(path)
    assert str(z["kind"]) == "csr"
    return CSRMatrix(tuple(int(x) for x in z["shape"]), z["indptr"],
                     z["indices"], z["data"])


def _pattern_hash(indptr, indices) -> str:
    import hashlib
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(indptr, np.int64).tobytes())
    h.update(np.ascontiguousarray(indices, np.int32).tobytes())
    return h.hexdigest()[:16]


def _check_matrix_binding(meta: dict, a: CSRMatrix, path: str) -> None:
    """A persisted factor silently solving with a DIFFERENT matrix's factors
    is the failure the round-4 advisor flagged: the file-integrity hash only
    validated the npz against itself.  The saved matrix-pattern hash binds
    the factor to the matrix it came from."""
    want = meta.get("matrix_hash")
    if want is None:
        return  # pre-round-5 file: no binding recorded
    got = _pattern_hash(a.indptr, a.indices)
    if got != want:
        raise ValueError(
            f"persisted factorization {os.path.basename(path)!r} was saved "
            f"from a matrix with pattern hash {want}, but the matrix passed "
            f"to load has hash {got}: refusing to solve with mismatched "
            "factors")


def save_band_factorization(path: str, fac) -> None:
    """Persist a solve.BandLuFactorization (factor band + permutation)."""
    lu = fac._lu
    arrays = {f"band{i}": np.asarray(d) for i, d in enumerate(lu.data)}
    meta = dict(version=_FORMAT_VERSION, kind="band_lu", n=lu.n, p=lu.p,
                ml=lu.ml, mu=lu.mu, policy=lu.policy_name,
                n_pivot_perturbed=fac.report.n_pivot_perturbed,
                matrix_hash=_pattern_hash(fac.a.indptr, fac.a.indices))
    np.savez_compressed(path, meta=json.dumps(meta), perm=fac.perm, **arrays)


def save_sparse_factorization(path: str, fac) -> None:
    """Persist a sparse direct factorization (factorize-once / solve-many,
    the gsisx/PARDISO phase-33-reuse idiom, SURVEY.md §5.4).

    Accepts a ``solve.SupernodalLuFactorization``, a
    ``solve.SparseLuFactorization`` or a ``dist_snlu_sub.DistSubtreeLu``
    (whose mesh-sharded factor is pulled to host once via
    ``factor_values``).  Stored: the filled pattern, the FACTORED values in
    that pattern's layout, the fill-reducing permutation, and the GESP
    matching arrays when present — everything a solving process needs to
    rebuild the triangular operators without refactorizing."""
    filled = getattr(fac, "_filled", None)
    if filled is None:
        filled = fac.part.filled  # DistSubtreeLu
    vals = getattr(fac, "_fill_vals", None)
    if vals is None:
        vals = fac.factor_values()
    pol = fac.policy.name if hasattr(fac.policy, "name") else str(fac.policy)
    meta = dict(version=_FORMAT_VERSION, kind="sparse_lu", policy=pol,
                c=int(getattr(fac, "_c", 1024)),
                matched=bool(getattr(fac, "matched", False)),
                n_pivot_perturbed=int(fac.report.n_pivot_perturbed),
                pattern_hash=_pattern_hash(filled.indptr, filled.indices),
                matrix_hash=_pattern_hash(fac.a.indptr, fac.a.indices),
                order=str(getattr(fac, "_order", "fillauto")),
                amalg=int(getattr(fac, "_amalg", 32)))
    arrays = dict(findptr=filled.indptr, findices=filled.indices,
                  fvals=np.asarray(vals, np.float64), perm=fac.perm)
    if meta["matched"]:
        arrays.update(cperm=fac._cperm, dr=fac._dr, dc=fac._dc)
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load_sparse_factorization(path: str, a: CSRMatrix):
    """Rehydrate a persisted sparse factorization bound to matrix ``a``.

    Rebuilds the blocked triangular-solve operators from the stored factor
    values — no numeric refactorization.  The returned object supports
    ``solve`` / ``solve_device`` / ``condest`` (true Hager via the stored
    factors) and plugs into ``solve.solve_refined``; ``refactorize_timed``
    is unavailable (the frontal plan is not persisted)."""
    from . import solve as slv

    z = np.load(path)
    meta = json.loads(str(z["meta"]))
    assert meta["kind"] == "sparse_lu"
    _check_matrix_binding(meta, a, path)
    filled = CSRMatrix((a.nrows, a.ncols), z["findptr"], z["findices"],
                       np.zeros(z["findices"].size))
    got = _pattern_hash(filled.indptr, filled.indices)
    if got != meta["pattern_hash"]:
        raise ValueError("persisted factor pattern hash mismatch "
                         "(file corrupted)")
    vals = np.asarray(z["fvals"], np.float64)
    policy = get_policy(meta["policy"])
    fac = slv.SupernodalLuFactorization.__new__(slv.SupernodalLuFactorization)
    fac.policy = policy
    fac.a = a
    fac.perm = z["perm"]
    fac.matched = bool(meta["matched"])
    if fac.matched:
        fac._cperm, fac._dr, fac._dc = z["cperm"], z["dr"], z["dc"]
    fac._plan = None
    fac._frontal = None
    fac.report = slv.SolveReport(
        policy=meta["policy"], notes="loaded from " + os.path.basename(path),
        n_pivot_perturbed=int(meta["n_pivot_perturbed"]))
    try:
        fac._l, fac._u = slv._build_lu_solvers(filled, vals, policy,
                                               meta["c"])
    except MemoryError:
        # wide-row (circuit-class) factor: the chunked triangular layout
        # refuses, so rebuild the FRONTAL solve plan instead — symbolic
        # analysis re-runs (deterministic), the persisted numeric values
        # scatter straight into the pool, and no refactorization happens
        # (the PARDISO phase-33 reuse idiom at full generality)
        import jax.numpy as jnp

        from .analysis import apply_matching_scaling
        from .kernels.snlu import analyze_supernodes
        from .kernels.snlu_device import FrontalSolver, build_frontal_plan
        a_work = a
        if fac.matched:
            a_work = apply_matching_scaling(a, fac._cperm, fac._dr, fac._dc)
        part = analyze_supernodes(a_work, order=meta.get("order", "fillauto"),
                                  amalg=int(meta.get("amalg", 32)))
        if (not np.array_equal(part.perm, np.asarray(fac.perm)) or
                part.filled.nnz != filled.nnz):
            raise ValueError(
                "persisted factor's symbolic analysis could not be "
                "reproduced (ordering changed between save and load?)")
        plan = build_frontal_plan(part)
        pool_np = np.zeros(plan.pool_size, dtype=np.float32)
        pool_np[plan.asm_dst] = vals[plan.asm_src]
        fac._plan = plan
        fac._frontal = FrontalSolver(plan, jnp.asarray(pool_np))
        fac.report.notes += ",apply=frontal_fp32"
    fac._filled, fac._fill_vals, fac._c = filled, vals, meta["c"]
    fac._lt = None
    return fac


def load_band_factorization(path: str, a: CSRMatrix):
    """Rehydrate a persisted band factorization bound to matrix ``a``
    (for residual reporting)."""
    import jax.numpy as jnp

    from . import solve as slv

    z = np.load(path)
    meta = json.loads(str(z["meta"]))
    assert meta["kind"] == "band_lu"
    _check_matrix_binding(meta, a, path)
    data = tuple(jnp.asarray(z[f"band{i}"])
                 for i in range(2 if get_policy(meta["policy"]).double_word else 1))
    lu = bandlu.DeviceBand(n=meta["n"], p=meta["p"], ml=meta["ml"],
                           mu=meta["mu"], policy_name=meta["policy"], data=data)
    fac = slv.BandLuFactorization.__new__(slv.BandLuFactorization)
    fac.policy = get_policy(meta["policy"])
    fac.a = a
    fac.perm = z["perm"]
    fac._lu = lu
    fac.report = slv.SolveReport(policy=meta["policy"],
                                 n_pivot_perturbed=int(meta["n_pivot_perturbed"]))
    return fac
