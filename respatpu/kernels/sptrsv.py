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

__all__ = ["DeviceTri", "tri_to_device", "sptrsv", "sptrsv_host_reference"]


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
    else:
        ov = policy.cast_host(off_vals)
        iv = policy.cast_host(in_vals)
        dv = policy.cast_host(dinv)

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


def sptrsv(t: DeviceTri, b):
    """Solve T y = b for triangular T under the factor's precision policy."""
    if t.policy.double_word:
        if not isinstance(b, DF):
            b = prec._as_df(jnp.asarray(b))
        return _sptrsv_df(t, b)
    return _sptrsv_single(t, jnp.asarray(b))


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
