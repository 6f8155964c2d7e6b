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


def save_band_factorization(path: str, fac) -> None:
    """Persist a solve.BandLuFactorization (factor band + permutation)."""
    lu = fac._lu
    arrays = {f"band{i}": np.asarray(d) for i, d in enumerate(lu.data)}
    meta = dict(version=_FORMAT_VERSION, kind="band_lu", n=lu.n, p=lu.p,
                ml=lu.ml, mu=lu.mu, policy=lu.policy_name,
                n_pivot_perturbed=fac.report.n_pivot_perturbed)
    np.savez_compressed(path, meta=json.dumps(meta), perm=fac.perm, **arrays)


def load_band_factorization(path: str, a: CSRMatrix):
    """Rehydrate a persisted band factorization bound to matrix ``a``
    (for residual reporting)."""
    import jax.numpy as jnp

    from . import solve as slv

    z = np.load(path)
    meta = json.loads(str(z["meta"]))
    assert meta["kind"] == "band_lu"
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
