"""Measurement harness: real device timings and roofline accounting.

The reference times phases with ``omp_get_wtime``/``cudaEvent`` pairs and
controls cache state with an LLC flush (test_pardiso.c:26-38,204-206,
GPU/spmv.cu:167-199). On TPU (and especially through remote-tunnel platforms)
two extra hazards exist, both observed on this stack:

* dispatch result caching — identical dispatches may be deduplicated, so a
  repeat loop over the same arguments measures dispatch overhead only;
* ``block_until_ready`` may not actually fence on tunnel transports.

``chained_time`` defeats both: the measured op runs ``iters`` times inside a
single jit with a loop-carried data dependency (each iteration's input is
perturbed by a scalar derived from the full previous output, so no iteration
can be elided or reordered), and the wall clock closes over a host fetch of
the final scalar. The perturbation magnitude (1e-30) is far below fp32 ulp of
any realistic operand, leaving the computed values unchanged.
"""
from __future__ import annotations

import functools
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .precision import DF

__all__ = ["chained_time", "stream_bandwidth", "spmv_sol_bytes",
           "HBM_BYTES_PER_S"]

# TPU v5e (v5 lite) HBM bandwidth; used for speed-of-light fractions.
HBM_BYTES_PER_S = {
    "tpu v5 lite": 819e9,
    "tpu v5": 2765e9,
    "tpu v4": 1228e9,
    "default": 819e9,
}


def device_hbm_bw() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return HBM_BYTES_PER_S["default"]
    for k, v in HBM_BYTES_PER_S.items():
        if k in kind:
            return v
    return HBM_BYTES_PER_S["default"]


def chained_time(op: Callable, x0: jax.Array, iters: int = 30) -> float:
    """Seconds per call of ``op`` (array -> array/DF).

    Protocol (each hazard observed on the tunnel platform):
      * the op runs ``iters`` times inside one jit with a loop-carried scalar
        dependency through a whole-array multiply (``x * (1 + acc)``; an
        ``x.at[0].add`` chain hangs the tunnel's remote compiler);
      * timed calls use *fresh* perturbed inputs, because dispatches with
        identical arguments are served from a result cache;
      * per-op time is the difference between a 2*iters and an iters run,
        cancelling dispatch/fetch round-trip overhead (~tens of ms);
      * wall time closes over a host fetch (block_until_ready does not fence).
    """

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        def body(i, carry):
            x_, acc = carry
            xp = x_ * (1.0 + acc)
            y = op(xp)
            if isinstance(y, DF):
                acc2 = (jnp.sum(y.hi) + jnp.sum(y.lo)) * 1e-38
            else:
                acc2 = jnp.sum(y).astype(jnp.float32) * 1e-38
            return (x_, acc2)
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))[1]

    # compile both variants
    float(run(x0, iters))
    float(run(x0, 2 * iters))
    best = float("inf")
    for trial in range(2):
        xa = x0 * (1.0 + 1e-7 * (2 * trial + 1))
        xb = x0 * (1.0 + 1e-7 * (2 * trial + 2))
        t0 = time.perf_counter()
        float(run(xa, iters))
        t1 = time.perf_counter()
        float(run(xb, 2 * iters))
        t2 = time.perf_counter()
        per_op = ((t2 - t1) - (t1 - t0)) / iters
        if per_op > 0:
            best = min(best, per_op)
    if not np.isfinite(best):
        # overhead dominated; fall back to the long-run average
        t0 = time.perf_counter()
        float(run(x0 * (1.0 + 3e-7), 2 * iters))
        best = (time.perf_counter() - t0) / (2 * iters)
    return best


def stream_bandwidth(nbytes: int = 1 << 26, iters: int = 20) -> float:
    """Measured achievable HBM bandwidth (triad-ish: y = a*x + y reads 2n,
    writes n => 3 * n * 4 bytes per iteration)."""
    n = nbytes // 4 // 3
    x = jnp.ones(n, jnp.float32)

    def op(x_):
        return x_ * 1.0000001 + 0.5

    t = chained_time(op, x, iters=iters)
    return 2 * n * 4 / t  # read + write of x-sized array


def spmv_sol_bytes(n: int, nnz: int, nsub: int, k: int, dtype_bytes: int = 4) -> int:
    """Speed-of-light byte count for one ELL SpMV pass (BASELINE.md model):
    values + column indices (padded layout) + x read + y write."""
    return nsub * k * (dtype_bytes + 4) + n * dtype_bytes + n * dtype_bytes
