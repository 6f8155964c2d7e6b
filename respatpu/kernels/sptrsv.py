"""Level-scheduled sparse triangular solve (SpTRSV) on TPU.

Replaces ``cusparseXcsrsv2_solve`` (GPU/ilu0.cu:284-310). The host analysis
(:func:`respatpu.analysis.build_tri_chunks`) permutes rows into level
(topological) order and packs them into fixed-size chunks aligned to level
boundaries; the device solve is then one ``lax.scan`` over chunks:

    t   = b_c - OFF_c @ y_prefix          (ELL gather from committed prefix)
    y_c = Jacobi^(depth-1) of (D + INTRA_c) y_c = t   -- exact, since the
          intra-chunk coupling is triangular with dependency depth <= depth
    commit y_c

All shapes are static; ``depth`` is a small compile-time constant (the chunk
packer bounds it by ``max_levels_per_chunk``). Runs under any precision
policy: fp32/bf16 single-word, or df64 double-float for the emulated-fp64
reference path.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import precision as prec
from ..analysis import TriChunks, build_tri_chunks
from ..formats import CSRMatrix
from ..precision import DF, Policy, get_policy

__all__ = ["DeviceTri", "DeviceTriBlocked", "JacobiTri", "jacobi_tri", "isai_tri",
           "tri_to_device", "sptrsv", "sptrsv_host_reference"]


def _pack_blocklets(chunk_ids: np.ndarray, rr: np.ndarray, jj: np.ndarray,
                    vv: np.ndarray, nchunks: int, c: int, jdim: int):
    """Bin triangular-solve coupling entries into 8x8 blocklets per chunk.

    Entries (chunk, slot-row r, source index j, value v) become dense 8x8
    blocklets keyed by (r//8, j//8): all entries of 8 neighbouring slot-rows
    reading the same 8-wide segment of the source vector share ONE row
    gather (the BELL trick, kernels/bell.py; element gathers run at
    ~0.15 Gelem/s on this platform vs 0.62 Grow/s row gathers).
    Returns per-chunk padded arrays (blk, sc, part_idx, part_mask).
    """
    R = C = 8
    assert c % R == 0
    ngrp = c // R
    nbc = -(-jdim // C)
    order = np.argsort(chunk_ids * (ngrp * nbc)
                       + (rr // R).astype(np.int64) * nbc + jj // C,
                       kind="stable")
    chunk_ids, rr, jj, vv = (chunk_ids[order], rr[order], jj[order], vv[order])
    key = (chunk_ids * ngrp + rr // R) * nbc + jj // C
    uk, inv = np.unique(key, return_inverse=True)
    slot_chunk = (uk // (ngrp * nbc)).astype(np.int64)
    slot_grp = ((uk // nbc) % ngrp).astype(np.int64)
    ns_per_chunk = np.bincount(slot_chunk, minlength=nchunks)
    ns_max = max(int(ns_per_chunk.max()) if ns_per_chunk.size else 1, 1)
    if nchunks * ns_max * 64 * 8 > 16 << 30:
        # pre-sized refusal (round-4 verdict: budget messages, never raw
        # _ArrayMemoryError): blocklet storage squares off at the busiest
        # chunk; factors this skewed belong on the frontal solve path
        raise MemoryError(
            f"blocklet triangular schedule would need "
            f"{nchunks * ns_max * 64 * 8 / 2**30:.1f} GiB "
            f"(nchunks={nchunks}, busiest chunk {ns_max} blocklets)")
    start = np.zeros(nchunks + 1, np.int64)
    np.cumsum(ns_per_chunk, out=start[1:])
    rank = np.arange(uk.size, dtype=np.int64) - start[slot_chunk]

    blk = np.zeros((nchunks, ns_max, R, C), np.float64)
    np.add.at(blk, (slot_chunk[inv], rank[inv],
                    (rr % R).astype(np.int64), (jj % C).astype(np.int64)), vv)
    sc = np.zeros((nchunks, ns_max), np.int32)
    sc[slot_chunk, rank] = (uk % nbc).astype(np.int32)

    cnt = np.zeros((nchunks, ngrp), np.int64)
    np.add.at(cnt, (slot_chunk, slot_grp), 1)
    mp = max(int(cnt.max()) if cnt.size else 1, 1)
    part_idx = np.zeros((nchunks, ngrp, mp), np.int32)
    part_mask = np.zeros((nchunks, ngrp, mp), np.float32)
    gk = slot_chunk * ngrp + slot_grp  # sorted (uk is sorted)
    gstart = np.r_[0, np.flatnonzero(np.diff(gk)) + 1]
    glen = np.diff(np.r_[gstart, uk.size])
    rank_in_grp = np.arange(uk.size, dtype=np.int64) - np.repeat(gstart, glen)
    part_idx[slot_chunk, slot_grp, rank_in_grp] = rank.astype(np.int32)
    part_mask[slot_chunk, slot_grp, rank_in_grp] = 1.0
    return blk, sc, part_idx, part_mask


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceTriBlocked:
    """Single-word-precision triangular factor with blocklet gathers.

    The fast sptrsv representation for fp32/bf16: off-chunk and intra-chunk
    couplings stored as 8x8 blocklets so every vector access is a shared
    8-wide row gather (no element gathers anywhere in the solve)."""

    # static
    n: int
    c: int
    nchunks: int
    depth: int
    policy_name: str
    # device arrays
    perm: jax.Array
    gather_perm: jax.Array
    off_blk: jax.Array  # [nchunks, ns_off, 8, 8]
    off_sc: jax.Array  # int32[nchunks, ns_off] -> segment of permuted y
    off_pidx: jax.Array  # int32[nchunks, c/8, mp_off]
    off_pmask: jax.Array
    in_blk: jax.Array  # [nchunks, ns_in, 8, 8]
    in_sc: jax.Array  # int32[nchunks, ns_in] -> local segment in [0, c/8)
    in_pidx: jax.Array
    in_pmask: jax.Array
    dinv: jax.Array  # [nchunks, c]

    def tree_flatten(self):
        return ((self.perm, self.gather_perm, self.off_blk, self.off_sc,
                 self.off_pidx, self.off_pmask, self.in_blk, self.in_sc,
                 self.in_pidx, self.in_pmask, self.dinv),
                (self.n, self.c, self.nchunks, self.depth, self.policy_name))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def policy(self) -> Policy:
        return get_policy(self.policy_name)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceTri:
    """Device-resident triangular factor with chunked solve schedule."""

    # static
    n: int
    c: int
    nchunks: int
    depth: int
    policy_name: str
    # device arrays
    perm: jax.Array  # int32[nchunks*c] slot -> row (-1 pad)
    gather_perm: jax.Array  # int32[n] row -> slot
    off_cols: jax.Array  # int32[nchunks, c, k_off]
    off_vals: Tuple[jax.Array, ...]  # [nchunks, c, k_off] (1 or 2 words)
    in_cols: jax.Array  # int32[nchunks, c, k_in]
    in_vals: Tuple[jax.Array, ...]
    dinv: Tuple[jax.Array, ...]  # [nchunks, c] reciprocal diagonal

    def tree_flatten(self):
        return ((self.perm, self.gather_perm, self.off_cols, self.off_vals,
                 self.in_cols, self.in_vals, self.dinv),
                (self.n, self.c, self.nchunks, self.depth, self.policy_name))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def policy(self) -> Policy:
        return get_policy(self.policy_name)


def _take_vals(data: np.ndarray, idx: np.ndarray) -> np.ndarray:
    out = np.where(idx >= 0, data[np.clip(idx, 0, data.size - 1)], 0.0)
    return out


def tri_to_device(l_csr: CSRMatrix, chunks: TriChunks = None, lower: bool = True,
                  unit_diag: bool = False, policy: Union[str, Policy] = "fp32",
                  c: int = 1024, values: np.ndarray = None) -> DeviceTri:
    """Pack a host triangular CSR + schedule into device arrays.

    ``values`` overrides ``l_csr.data`` (same pattern), supporting the
    analyze-once / refactor-many split.
    """
    policy = get_policy(policy)
    if chunks is None:
        chunks = build_tri_chunks(l_csr, lower=lower, unit_diag=unit_diag, c=c)
    data = l_csr.data if values is None else np.asarray(values, np.float64)

    off_vals = _take_vals(data, chunks.off_vals_idx)
    in_vals = _take_vals(data, chunks.in_vals_idx)
    diag = np.where(chunks.diag_idx >= 0,
                    data[np.clip(chunks.diag_idx, 0, data.size - 1)], 1.0)
    if unit_diag:
        diag = np.ones_like(diag)
    # zero diagonal -> structural breakdown; keep finite, flagged by caller
    safe = np.where(diag == 0.0, 1.0, diag)
    dinv = 1.0 / safe

    n = chunks.n
    gather_perm = np.zeros(n, dtype=np.int64)
    valid = chunks.perm >= 0
    gather_perm[chunks.perm[valid]] = np.flatnonzero(valid)

    if policy.double_word:
        # reciprocal computed in fp64 on host, split exactly
        ov = prec.df_from_f64_host(off_vals)
        iv = prec.df_from_f64_host(in_vals)
        dv = prec.df_from_f64_host(dinv)
        sh = (chunks.nchunks, chunks.c)
        return DeviceTri(
            n=n, c=chunks.c, nchunks=chunks.nchunks, depth=chunks.depth,
            policy_name=policy.name,
            perm=jnp.asarray(chunks.perm.astype(np.int32)),
            gather_perm=jnp.asarray(gather_perm.astype(np.int32)),
            off_cols=jnp.asarray(chunks.off_cols),
            off_vals=tuple(jnp.asarray(v.reshape(sh + (chunks.k_off,))) for v in ov),
            in_cols=jnp.asarray(chunks.in_cols),
            in_vals=tuple(jnp.asarray(v.reshape(sh + (chunks.k_in,))) for v in iv),
            dinv=tuple(jnp.asarray(v.reshape(sh)) for v in dv),
        )

    # single-word policies: blocklet (shared row-gather) representation
    nchunks, cc = chunks.nchunks, chunks.c
    ovs = off_vals.reshape(nchunks, cc, chunks.k_off)
    ivs = in_vals.reshape(nchunks, cc, chunks.k_in)
    om = chunks.off_vals_idx.reshape(nchunks, cc, chunks.k_off) >= 0
    im = chunks.in_vals_idx.reshape(nchunks, cc, chunks.k_in) >= 0
    och, orow, ot = np.nonzero(om)
    oj = chunks.off_cols.reshape(nchunks, cc, chunks.k_off)[och, orow, ot]
    oblk, osc, opi, opm = _pack_blocklets(
        och.astype(np.int64), orow, oj.astype(np.int64), ovs[och, orow, ot],
        nchunks, cc, nchunks * cc)
    ich, irow, it = np.nonzero(im)
    ij = chunks.in_cols.reshape(nchunks, cc, chunks.k_in)[ich, irow, it]
    iblk, isc, ipi, ipm = _pack_blocklets(
        ich.astype(np.int64), irow, ij.astype(np.int64), ivs[ich, irow, it],
        nchunks, cc, cc)
    (oblk_c,) = policy.cast_host(oblk)
    (iblk_c,) = policy.cast_host(iblk)
    (dv,) = policy.cast_host(dinv)
    return DeviceTriBlocked(
        n=n, c=cc, nchunks=nchunks, depth=chunks.depth,
        policy_name=policy.name,
        perm=jnp.asarray(chunks.perm.astype(np.int32)),
        gather_perm=jnp.asarray(gather_perm.astype(np.int32)),
        off_blk=jnp.asarray(oblk_c), off_sc=jnp.asarray(osc),
        off_pidx=jnp.asarray(opi), off_pmask=jnp.asarray(opm),
        in_blk=jnp.asarray(iblk_c), in_sc=jnp.asarray(isc),
        in_pidx=jnp.asarray(ipi), in_pmask=jnp.asarray(ipm),
        dinv=jnp.asarray(dv.reshape(nchunks, cc)),
    )


@jax.jit
def _sptrsv_single(t: DeviceTri, b: jax.Array) -> jax.Array:
    dt = t.off_vals[0].dtype
    npad = t.nchunks * t.c
    b_perm = jnp.take(b.astype(dt), jnp.clip(t.perm, 0, t.n - 1)) * (t.perm >= 0)
    b_perm = b_perm.reshape(t.nchunks, t.c)
    y0 = jnp.zeros(npad, dtype=dt)
    sweeps = max(t.depth - 1, 0)

    def chunk_step(y, xs):
        ci, off_cols, off_vals, in_cols, in_vals, dinv, bc = xs
        off = jnp.sum(off_vals * jnp.take(y, off_cols, axis=0), axis=1)
        tt = bc - off
        yc = tt * dinv
        for _ in range(sweeps):
            yc = (tt - jnp.sum(in_vals * jnp.take(yc, in_cols, axis=0), axis=1)) * dinv
        y = jax.lax.dynamic_update_slice(y, yc, (ci * t.c,))
        return y, None

    xs = (jnp.arange(t.nchunks), t.off_cols, t.off_vals[0], t.in_cols,
          t.in_vals[0], t.dinv[0], b_perm)
    y, _ = jax.lax.scan(chunk_step, y0, xs)
    return jnp.take(y, t.gather_perm)


@jax.jit
def _sptrsv_df(t: DeviceTri, b: DF) -> DF:
    npad = t.nchunks * t.c
    pclip = jnp.clip(t.perm, 0, t.n - 1)
    pmask = (t.perm >= 0).astype(jnp.float32)
    bh = (jnp.take(b.hi, pclip) * pmask).reshape(t.nchunks, t.c)
    bl = (jnp.take(b.lo, pclip) * pmask).reshape(t.nchunks, t.c)
    yh0 = jnp.zeros(npad, jnp.float32)
    yl0 = jnp.zeros(npad, jnp.float32)
    sweeps = max(t.depth - 1, 0)

    def ellmv_df(vals, cols, yh, yl):
        g = DF(jnp.take(yh, cols, axis=0), jnp.take(yl, cols, axis=0))
        return prec.df_sum(prec.df_mul(DF(vals[0], vals[1]), g), axis=1)

    def chunk_step(carry, xs):
        yh, yl = carry
        (ci, off_cols, off_h, off_l, in_cols, in_h, in_l, dh, dl, bch, bcl) = xs
        off = ellmv_df((off_h, off_l), off_cols, yh, yl)
        tt = prec.df_sub(DF(bch, bcl), off)
        dinv = DF(dh, dl)
        yc = prec.df_mul(tt, dinv)
        for _ in range(sweeps):
            intra = ellmv_df((in_h, in_l), in_cols, yc.hi, yc.lo)
            yc = prec.df_mul(prec.df_sub(tt, intra), dinv)
        yh = jax.lax.dynamic_update_slice(yh, yc.hi, (ci * t.c,))
        yl = jax.lax.dynamic_update_slice(yl, yc.lo, (ci * t.c,))
        return (yh, yl), None

    xs = (jnp.arange(t.nchunks), t.off_cols, t.off_vals[0], t.off_vals[1],
          t.in_cols, t.in_vals[0], t.in_vals[1], t.dinv[0], t.dinv[1], bh, bl)
    (yh, yl), _ = jax.lax.scan(chunk_step, (yh0, yl0), xs)
    return DF(jnp.take(yh, t.gather_perm), jnp.take(yl, t.gather_perm))


@jax.jit
def _sptrsv_blocked(t: DeviceTriBlocked, b: jax.Array) -> jax.Array:
    dt = t.off_blk.dtype
    c = t.c
    nseg = c // 8
    b_perm = (jnp.take(b.astype(dt), jnp.clip(t.perm, 0, t.n - 1))
              * (t.perm >= 0)).reshape(t.nchunks, c)
    y2_0 = jnp.zeros((t.nchunks * nseg, 8), dtype=dt)
    sweeps = max(t.depth - 1, 0)

    def combine(blk, g, pidx, pmask):
        part = jnp.sum(blk * g[:, None, :], axis=2)  # [ns, 8]
        gp = jnp.take(part, pidx, axis=0)  # [nseg, mp, 8]
        return jnp.sum(gp * pmask[:, :, None], axis=1).reshape(c)

    def chunk_step(y2, xs):
        ci, oblk, osc, opi, opm, iblk, isc, ipi, ipm, dinv, bc = xs
        g = jnp.take(y2, osc, axis=0)  # [ns_off, 8] shared row gathers
        tt = bc - combine(oblk, g, opi, opm)
        yc = tt * dinv
        for _ in range(sweeps):
            gi = jnp.take(yc.reshape(nseg, 8), isc, axis=0)
            yc = (tt - combine(iblk, gi, ipi, ipm)) * dinv
        y2 = jax.lax.dynamic_update_slice(y2, yc.reshape(nseg, 8),
                                          (ci * nseg, 0))
        return y2, None

    xs = (jnp.arange(t.nchunks), t.off_blk, t.off_sc, t.off_pidx, t.off_pmask,
          t.in_blk, t.in_sc, t.in_pidx, t.in_pmask, t.dinv, b_perm)
    y2, _ = jax.lax.scan(chunk_step, y2_0, xs)
    return jnp.take(y2.reshape(-1), t.gather_perm)


def sptrsv(t, b):
    """Solve T y = b for triangular T under the factor's precision policy."""
    if isinstance(t, JacobiTri):
        if t.isai:
            return _isai_apply(t, jnp.asarray(b))
        return _jacobi_tri_apply(t, jnp.asarray(b))
    if isinstance(t, DeviceTriBlocked):
        return _sptrsv_blocked(t, jnp.asarray(b))
    if t.policy.double_word:
        if not isinstance(b, DF):
            b = prec._as_df(jnp.asarray(b))
        return _sptrsv_df(t, b)
    return _sptrsv_single(t, jnp.asarray(b))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class JacobiTri:
    """Triangular apply by fixed-point (Jacobi) sweeps over a BELL operator.

    The scan-free triangular solve for *preconditioner* applies: with
    T = D + N (N strictly triangular), iterate y <- D^-1 (b - N y). N is
    nilpotent, so the iteration is exact after depth(T) sweeps and a fixed
    ``sweeps`` count is a *linear* operator — a valid (approximate-inverse)
    preconditioner, the standard practice on massively parallel hardware
    where level-scheduled solves serialize. Each sweep is one BELL SpMV
    (kernels/bell.py), so the apply has no per-level scan, no element
    gathers, and no permutation: measured ~20x faster than the chunked
    scheduled solve on mesh-FEM factors.
    """

    n: int
    sweeps: int  # static
    strict: object  # DeviceBell of the strict triangle (None if empty)
    dinv: jax.Array  # [n] reciprocal diagonal (ones for unit-diagonal)
    isai: bool = False  # True: ``strict`` IS the approximate inverse M

    def tree_flatten(self):
        return ((self.strict, self.dinv), (self.n, self.sweeps, self.isai))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children, isai=aux[2])


def jacobi_tri(t_csr: CSRMatrix, lower: bool = True, unit_diag: bool = False,
               sweeps: int = 6, policy: Union[str, Policy] = "fp32") -> JacobiTri:
    """Build the sweep-apply operator from a triangular CSR factor."""
    from .bell import bell_to_device
    policy = get_policy(policy)
    assert not policy.double_word, "JacobiTri is a single-word fast path"
    n = t_csr.nrows
    rows = np.repeat(np.arange(n, dtype=np.int64), t_csr.row_lengths())
    offd = t_csr.indices != rows
    diag = np.ones(n, np.float64)
    if not unit_diag:
        dmask = ~offd
        diag_rows = rows[dmask]
        diag[diag_rows] = t_csr.data[dmask]
    safe = np.where(diag == 0.0, 1.0, diag)
    from ..formats import COOMatrix, coo_to_csr
    strict = None
    if offd.any():
        scoo = COOMatrix((n, n), rows[offd].astype(np.int32),
                         t_csr.indices[offd].copy(), t_csr.data[offd].copy())
        strict = bell_to_device(coo_to_csr(scoo), policy)
    (dv,) = policy.cast_host(1.0 / safe)
    return JacobiTri(n=n, sweeps=sweeps, strict=strict, dinv=jnp.asarray(dv))


@jax.jit
def _jacobi_tri_apply(t: JacobiTri, b: jax.Array) -> jax.Array:
    from .bell import _bell_single
    bd = b.astype(t.dinv.dtype) * t.dinv
    if t.strict is None:
        return bd
    y = bd
    for _ in range(t.sweeps):
        y = bd - t.dinv * _bell_single(t.strict, y)
    return y


def isai_tri(t_csr: CSRMatrix, lower: bool = True, unit_diag: bool = False,
             policy: Union[str, Policy] = "fp32") -> "JacobiTri":
    """Incomplete Sparse Approximate Inverse of a triangular factor.

    Builds M with sparsity(M) = sparsity(T) such that (M T)|_S = I on the
    pattern: per row i, solve the small dense system T[S_i,S_i]^T m = e_i
    (host, once). The apply is then a single SpMV — the flat-parallel
    triangular apply of Anzt et al., the fastest preconditioner apply on
    wide-SIMD hardware (one BELL SpMV vs a level-scheduled scan). Returned
    as a JacobiTri with sweeps=0 whose ``strict`` operator is M itself and
    dinv = 1 (so sptrsv dispatch stays uniform).
    """
    from .bell import bell_to_device
    policy = get_policy(policy)
    assert not policy.double_word, "ISAI is a single-word fast path"
    n = t_csr.nrows
    indptr, indices, data = t_csr.indptr, t_csr.indices, t_csr.data
    mvals = np.zeros_like(data, dtype=np.float64)
    # vectorized (round 2): batch rows by equal length; dense T[S,S] lookups
    # via one searchsorted into the globally sorted (row, col) key array
    # (CSR with sorted per-row indices => row*(n+1)+col is globally sorted)
    indptr64 = indptr.astype(np.int64)
    rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr64))
    gkeys = rows_all * np.int64(n + 1) + indices.astype(np.int64)
    lens = np.diff(indptr64)
    for k in np.unique(lens):
        k = int(k)
        if k == 0:
            continue
        R = np.flatnonzero(lens == k)
        for c0 in range(0, R.size, 16384):
            Rc = R[c0:c0 + 16384]
            offs = indptr64[Rc][:, None] + np.arange(k)[None, :]
            S = indices[offs].astype(np.int64)            # (b, k)
            qk = (S[:, :, None] * np.int64(n + 1)
                  + S[:, None, :])                         # (b, t, j)
            pos = np.searchsorted(gkeys, qk.reshape(-1))
            pos = np.minimum(pos, gkeys.size - 1)
            hit = gkeys[pos] == qk.reshape(-1)
            sub = np.where(hit, data[pos], 0.0).reshape(-1, k, k)
            if unit_diag:
                sub[:, np.arange(k), np.arange(k)] = 1.0
            dpos = (S == Rc[:, None]).argmax(axis=1)
            ei = np.zeros((Rc.size, k))
            ei[np.arange(Rc.size), dpos] = 1.0
            try:
                m = np.linalg.solve(sub.transpose(0, 2, 1), ei[..., None])
                m = m[..., 0]
            except np.linalg.LinAlgError:
                # singular submatrix somewhere in the batch: fall back rowwise
                m = np.empty((Rc.size, k))
                for b in range(Rc.size):
                    try:
                        m[b] = np.linalg.solve(sub[b].T, ei[b])
                    except np.linalg.LinAlgError:
                        m[b] = ei[b]
            mvals[offs.reshape(-1)] = m.reshape(-1)
    mcsr = CSRMatrix(t_csr.shape, indptr, indices, mvals)
    dev = bell_to_device(mcsr, policy)
    (dv,) = policy.cast_host(np.ones(n))
    return JacobiTri(n=n, sweeps=0, strict=dev, dinv=jnp.asarray(dv),
                     isai=True)


@jax.jit
def _isai_apply(t: JacobiTri, b: jax.Array) -> jax.Array:
    from .bell import _bell_single
    return _bell_single(t.strict, b.astype(t.dinv.dtype))


def sptrsv_host_reference(l_csr: CSRMatrix, b: np.ndarray, lower: bool = True,
                          unit_diag: bool = False) -> np.ndarray:
    """Host fp64 oracle: plain forward/backward substitution."""
    n = l_csr.nrows
    y = np.zeros(n, dtype=np.float64)
    rows = range(n) if lower else range(n - 1, -1, -1)
    for i in rows:
        s, e = l_csr.indptr[i], l_csr.indptr[i + 1]
        cols = l_csr.indices[s:e]
        vals = l_csr.data[s:e]
        acc = b[i]
        diag = 1.0
        for c_, v in zip(cols, vals):
            if c_ == i:
                diag = v
            else:
                acc -= v * y[c_]
        y[i] = acc / (1.0 if unit_diag else diag)
    return y
