"""Measurement harness: real device timings and roofline accounting.

The reference times phases with ``omp_get_wtime``/``cudaEvent`` pairs and
controls cache state with an LLC flush (test_pardiso.c:26-38,204-206,
GPU/spmv.cu:167-199). On TPU (and especially through remote-tunnel platforms)
two extra hazards exist, both observed on this stack:

* dispatch result caching — identical dispatches may be deduplicated, so a
  repeat loop over the same arguments measures dispatch overhead only;
* ``block_until_ready`` may not actually fence on tunnel transports.

Cache-cold control: the reference flushes the LLC before timed phases
(flushLlc, test_pardiso.c:29-38). TPU has no hardware cache hierarchy between
HBM and compute -- VMEM is software-managed and reloaded per dispatch -- so
every measured dispatch is effectively "cold" for HBM-resident operands and
no flush analogue is needed; warm-vs-cold only distinguishes compile caching,
which the protocol below already separates (explicit warmup compiles).

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


def chained_time(op: Callable, x0: jax.Array, iters: int = None,
                 operands: tuple = ()) -> float:
    """Seconds per call of ``op`` (fp32 array -> array/DF).

    ``operands``: extra pytrees (e.g. device-resident matrices) forwarded to
    ``op(x, *operands)`` as jit ARGUMENTS. Large arrays must come in this way
    rather than as closure captures: the remote-compile transport ships
    closure constants inside the HTTP request body and rejects programs past
    ~100 MB (HTTP 413), while arguments stay device-resident.

    Protocol (every element addresses a hazard observed on the tunnel-backed
    TPU platform):
      * the op runs n times inside ONE jit, with a loop-carried scalar
        dependency (additive perturbation; the closing reduction goes through
        a nonlinear ``min`` so XLA cannot hoist linear ops out of the loop);
      * timed calls use fresh perturbed input buffers (identical dispatches
        are served from a result cache);
      * wall time closes over a host fetch of the scalar
        (``block_until_ready`` does not fence on this transport);
      * per-op time is the slope versus an n=0 baseline, with n auto-scaled
        until device work dominates round-trip jitter. ``iters`` is ignored
        (kept for API compatibility).
    """

    @jax.jit
    def run(x, n, *ops_):
        # dynamic trip count: ONE compilation serves every loop length
        # (compiles are minutes-long through the remote-compile tunnel)
        def body(i, carry):
            x_, acc = carry
            xp = x_ + acc    # additive scalar perturbation (cannot be hoisted
            y = op(xp, *ops_)  # past the nonlinear min-guard reduction below)
            if isinstance(y, DF):
                acc2 = jnp.minimum(jnp.sum(y.hi) + jnp.sum(y.lo), 3e38) * 1e-30
            else:
                acc2 = jnp.minimum(jnp.sum(y).astype(jnp.float32), 3e38) * 1e-30
            return (x_, acc2)
        return jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)),
                                 unroll=False)[1]

    def timed(n, salt):
        xf = x0 + jnp.float32(1e-7 * salt)  # fresh buffer: defeats result cache
        t0 = time.perf_counter()
        v = run(xf, n, *operands)
        _ = np.asarray(v)  # host fetch is the only reliable fence
        return time.perf_counter() - t0

    # compile once, measure dispatch/fetch overhead at n=0
    np.asarray(run(x0, 0, *operands))
    overhead = min(timed(0, 1), timed(0, 2))
    t8 = timed(8, 3) - overhead
    per_est = max(t8 / 8, 1e-7)
    # pick n so device work dominates overhead/jitter (~0.3 s of work)
    n_star = int(min(max(8, 0.3 / per_est), 2048))
    best = min(timed(n_star, 4), timed(n_star, 5)) - overhead
    return max(best, 1e-9) / n_star


def stream_bandwidth(nbytes: int = 1 << 26, iters: int = 20) -> float:
    """Measured achievable HBM read bandwidth: one fused read pass over an
    n-float array per iteration (the multiply/add output is consumed by the
    harness reduction, so nothing is written back)."""
    n = nbytes // 4
    x = jnp.ones(n, jnp.float32)

    def op(x_):
        return x_ * 1.0000001 + 0.5

    t = chained_time(op, x, iters=iters)
    return n * 4 / t


class profile_trace:
    """Context manager around ``jax.profiler.trace`` (SURVEY.md §5.1 TPU
    equivalent of the reference's omp_get_wtime/cudaEvent phase timers)."""

    def __init__(self, logdir: str = "/tmp/respatpu_trace"):
        self.logdir = logdir

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


def spmv_sol_bytes(n: int, nnz: int, nsub: int, k: int, dtype_bytes: int = 4) -> int:
    """Speed-of-light byte count for one ELL SpMV pass (BASELINE.md model):
    values + column indices (padded layout) + x read + y write."""
    return nsub * k * (dtype_bytes + 4) + n * dtype_bytes + n * dtype_bytes


def spmv_csr_sol_bytes(n: int, nnz: int, dtype_bytes: int = 4) -> int:
    """Speed-of-light byte count for one *CSR-model* SpMV pass: rowptr +
    colidx + values + x read + y write, each touched exactly once.  The
    honest headline model (VERDICT r1): formats storing more than CSR can
    only score < 1 against it; only index-free formats (DIA) may exceed 1
    and must be reported against their own model instead."""
    return (n + 1) * 4 + nnz * 4 + nnz * dtype_bytes + 2 * n * dtype_bytes
