"""respatpu: TPU-native mixed-precision sparse linear algebra.

A from-scratch JAX/XLA/Pallas framework covering the workload of the
ReSpaSol reduced-precision sparse solver study (see SURVEY.md): Matrix Market
ingest, CSR SpMV, ILU(0) + level-scheduled sparse triangular solves, sparse LU
factorize/solve, Krylov solvers, dual-precision (fp32/bf16/emulated-fp64)
execution with flush-to-zero control, residual verification, corpus sweeps,
and multi-chip row-partitioned distribution over a `jax.sharding.Mesh`.
"""

from . import formats, precision
from .formats import COOMatrix, CSRMatrix, build_ellr, coo_to_csr
from .precision import (DF, DF64, FP32, BF16, FP32_FTZ, Policy, get_policy,
                        downcast_check, ftz)

__version__ = "0.1.0"

__all__ = [
    "COOMatrix", "CSRMatrix", "build_ellr", "coo_to_csr",
    "DF", "DF64", "FP32", "BF16", "FP32_FTZ", "Policy", "get_policy",
    "downcast_check", "ftz",
    "formats", "precision",
]
