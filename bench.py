#!/usr/bin/env python
"""Headline benchmark: fp32 SpMV fraction of HBM speed-of-light per chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline (fixed, per VERDICT r1): the *unstructured FEM-class* matrix
2cubes_sphere on the fmt=auto path, measured against the CSR byte model
(rowptr + colidx + vals + x + y read/write once).  That model is the
information-theoretic floor for a CSR-equivalent SpMV, so the fraction is
honest: formats that store MORE than CSR (GSELL/ELL) can only score < 1.
The stencil-class DIA path (which stores LESS than CSR and can exceed 1
against this model) is reported to stderr as a diagnostic row, not picked.

Baseline: the revised unstructured-class target of 0.30 CSR-model SoL
(BASELINE.md round-4 "measured ceiling and revised target": the kernel is
lane-shuffle-op-bound, not bandwidth-bound; the 0.80 figure assumed a
byte-bound kernel and is kept for the stencil class, where DIA exceeds it).
``vs_baseline`` = value / 0.30; the raw SoL fraction itself is unchanged
and comparable across rounds.  Timing: respatpu.timing.chained_time
(in-jit chained loop; see its docstring for the tunnel hazards it defeats).
"""
import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from respatpu.bench.corpus import load_matrix
    from respatpu.bench.synth import laplacian_3d
    from respatpu.kernels.spmv import to_device, spmv
    from respatpu.timing import chained_time, device_hbm_bw, \
        spmv_csr_sol_bytes, stream_bandwidth

    log(f"devices: {jax.devices()}  backend: {jax.default_backend()}")

    # real-corpus attempt (round-3 verdict item 1): when the bench
    # environment has network, pull the headline matrices so the rows go
    # real (synthetic=False); in zero-egress environments this times out
    # in seconds and the flagged synthetic stand-ins serve as before
    import contextlib
    import socket
    try:
        from respatpu.bench import fetch as _fetch
        socket.setdefaulttimeout(25)
        with contextlib.redirect_stdout(sys.stderr):
            for nm in ("2cubes_sphere", "dc1"):
                _fetch.fetch(nm, "moderate")
    except Exception as e:
        log(f"corpus fetch unavailable: {e}")
    finally:
        socket.setdefaulttimeout(None)
    hbm = device_hbm_bw()
    try:
        stream = stream_bandwidth()
        log(f"stream bandwidth: {stream/1e9:.0f} GB/s (model peak {hbm/1e9:.0f})")
        # the tunnel reports a generic device kind; trust the measured read
        # bandwidth when it exceeds the model (e.g. v6e-class hardware)
        hbm = max(hbm, stream)
    except Exception as e:  # stream probe must never kill the bench
        log(f"stream probe failed: {e}")

    # ---- headline: corpus-representative unstructured FEM matrix ----
    a, synth = load_matrix("2cubes_sphere")
    n = a.shape[0]
    log(f"matrix: 2cubes_sphere n={n} nnz={a.nnz} synthetic={synth}")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    csr_bytes = spmv_csr_sol_bytes(n, a.nnz)

    value = None
    for fmt in ("auto", "gsell", "bell", "rgell"):
        try:
            dev = to_device(a, "fp32", fmt=fmt)
        except Exception as e:
            log(f"spmv fp32 [{fmt}]: build failed: {e}")
            continue
        t = chained_time(lambda xx, dd: spmv(dd, xx), x, operands=(dev,))
        frac = csr_bytes / t / hbm
        log(f"spmv fp32 [{fmt}={type(dev).__name__}]: {t*1e6:.1f} us/op, "
            f"{a.nnz/t/1e9:.2f} Gnnz/s, CSR-model SoL fraction {frac:.3f}")
        if fmt == "auto":
            value = frac

    # ---- diagnostic: stencil-class DIA path (own byte model) ----
    try:
        big = laplacian_3d(110, 110, 110)
        devb = to_device(big, "fp32", fmt="auto")
        xb = jnp.asarray(
            np.random.default_rng(1).standard_normal(big.shape[0]),
            jnp.float32)
        # closure capture on purpose: the DIA kernel is 8x faster with the
        # diagonals as jit constants (XLA folds the static shifted slices);
        # 37 MB stays under the tunnel's ~100 MB program-size limit
        tb = chained_time(lambda xx: spmv(devb, xx), xb)
        # DIA stores no indices: bytes = vals(+pad) + x + y
        ndiag = getattr(getattr(devb, "dia", None), "offsets", None)
        dia_bytes = big.nnz * 4 + 2 * big.shape[0] * 4
        log(f"spmv fp32 (lap3d 9.2M nnz, auto={type(devb).__name__}): "
            f"{tb*1e3:.3f} ms, {big.nnz/tb/1e9:.2f} Gnnz/s, "
            f"DIA-model SoL fraction {dia_bytes/tb/hbm:.3f}, "
            f"CSR-model {spmv_csr_sol_bytes(big.shape[0], big.nnz)/tb/hbm:.3f}")
    except Exception as e:
        log(f"stencil diagnostic failed: {e}")

    # ---- diagnostic: circuit-class (hub-split GSELL, round 3) ----
    try:
        c, synth_c = load_matrix("dc1")
        devc = to_device(c, "fp32", fmt="auto")
        xc = jnp.asarray(
            np.random.default_rng(2).standard_normal(c.shape[0]), jnp.float32)
        tc = chained_time(lambda xx, dd: spmv(dd, xx), xc, operands=(devc,))
        log(f"spmv fp32 (dc1 circuit nnz={c.nnz} synthetic={synth_c}, "
            f"auto={type(devc).__name__}): {tc*1e6:.1f} us, "
            f"{c.nnz/tc/1e9:.2f} Gnnz/s, CSR-model SoL fraction "
            f"{spmv_csr_sol_bytes(c.shape[0], c.nnz)/tc/hbm:.3f}")
    except Exception as e:
        log(f"circuit diagnostic failed: {e}")

    log(f"headline {value:.4f}: vs revised target 0.30 = {value/0.30:.3f}; "
        f"vs the original byte-bound 0.80 assumption = {value/0.80:.3f} "
        f"(see BASELINE.md roofline)")
    # both denominators are emitted so rows stay comparable across rounds
    # (round-4 advisor finding: vs_baseline silently changed meaning when
    # the target was revised 0.80 -> 0.30; the raw `value` was always the
    # cross-round-stable field)
    print(json.dumps({
        "metric": "spmv_fp32_unstructured_hbm_sol_fraction",
        "value": round(float(value), 4),
        "unit": "fraction_of_hbm_sol",
        "vs_baseline": round(float(value) / 0.30, 4),
        "vs_target_0p30": round(float(value) / 0.30, 4),
        "vs_original_0p80": round(float(value) / 0.80, 4),
    }))


if __name__ == "__main__":
    main()
