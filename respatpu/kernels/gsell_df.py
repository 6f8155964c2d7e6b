"""df64 (double-float) GSELL SpMV: emulated-fp64 lane-gather kernel.

The reference's fp64 SpMV path (``mkl_sparse_d_mv``, test_spmv.c:168-170;
``cusparseSpMV`` with CUDA_R_64F, GPU/spmv.cu:130-195) is the accuracy
anchor of the whole study: every fp32 number is judged against it.  TPUs
have no native fp64, so the df64 policy carries each value as an
unevaluated fp32 pair (hi, lo) with error-free transforms
(respatpu.precision).  Round 1/2 served df64 through the RG-ELL row-gather
kernel, which is row-count-bound (~0.4 Grow/s) — the iterative-refinement
and study loops paid that on every residual.

This module runs the df64 SpMV through the same lane-shuffle machinery as
the fp32 GSELL kernel (kernels/gsell.py, round-2 breakthrough): the
structure plan (seg/lane/window packing) is IDENTICAL — only the value
streams double (val_hi, val_lo) and the window gathers run twice (x.hi and
x.lo windows).  Per slot-lane the arithmetic is a full df64
multiply-accumulate (two_prod + two_sum chains, ~45 VPU flops), so the
kernel is VPU-bound well below the fp32 one — but it replaces a
row-gather-bound kernel with a lane-shuffle-bound one, which measures
~20-40x faster on FEM-class structure.

Exactness notes:
  * the (128,128) MXU identity-dot transpose is bit-exact at HIGHEST for
    any fp32 input (single nonzero per output), so hi and lo streams
    transpose exactly;
  * padded slots carry val = (0, 0): two_prod(0, g) = (0, 0) and the df
    accumulation of exact zeros is exact, so padding never perturbs sums;
  * the per-bank reduction is a fixed-order df_add chain over the slot
    quota — deterministic, unlike atomics-based vendor SpMV.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import precision as prec
from ..formats import CSRMatrix
from ..precision import DF, Policy, get_policy
from .gsell import BANK_ROWS, SHIFT_GRAN, GsellPlan, build_gsell

__all__ = ["DeviceGsellDf", "gsell_df_to_device", "spmv_gsell_df",
           "estimate_gsell_df"]

# measured on chip (round 3): df64 slot-lane throughput of this kernel —
# VPU-bound by the ~45-flop df MAC, far under the fp32 kernel's 50 G/s but
# ~20x over the row-gather-bound RG-ELL df64 fallback on FEM structure.
DF_SLOT_LANES_PER_S = 6e9


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceGsellDf:
    """Device-resident df64 GSELL matrix (two fp32 value streams)."""
    shape_: Tuple[int, int]   # static
    nnz_: int                 # static
    nbank: int                # static
    quota: int                # static
    cs: int                   # static
    nseg_pad: int             # static
    wide: bool                # static
    wstart: jax.Array         # int32[G]
    seg: jax.Array            # uint8[G, 128, cs]
    lane: jax.Array           # uint8[G*cs, 128]
    val_hi: jax.Array         # f32[G*cs, 128]
    val_lo: jax.Array         # f32[G*cs, 128]
    spill: Optional[object]   # (r, c, vhi, vlo) tuple or DeviceRgell(df64)
    dense_cols: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
    # hub-column split (gsell._split_hubs): (idx[K], B_hi[K,n], B_lo[K,n])
    vextra_comb: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
    # virtual-row combine (gsell.VROW_MAX): (ur[Hv], gi[Hv,kmax], mk) —
    # exact per-row df merge of the nested extras plan's partials (a raw
    # fp32 scatter-add would round the low words away)
    extras: Optional["DeviceGsellDf"] = None

    def tree_flatten(self):
        return ((self.wstart, self.seg, self.lane, self.val_hi, self.val_lo,
                 self.spill, self.dense_cols, self.vextra_comb, self.extras),
                (self.shape_, self.nnz_, self.nbank, self.quota, self.cs,
                 self.nseg_pad, self.wide))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)

    @property
    def shape(self):
        return self.shape_

    @property
    def nnz(self):
        return self.nnz_

    @property
    def policy(self) -> Policy:
        return get_policy("df64")

    @property
    def meta(self):
        return self


def gsell_df_to_device(a: Union[CSRMatrix, GsellPlan],
                       nbank: Optional[int] = None,
                       quota: Optional[int] = None) -> DeviceGsellDf:
    """Pack a CSR matrix (or prebuilt GsellPlan) for the df64 kernel."""
    plan = a if isinstance(a, GsellPlan) else build_gsell(a, nbank, quota)
    vhi, vlo = prec.df_from_f64_host(plan.val)
    spill_coo = plan.spill_coo
    if plan.dense_rows is not None:
        # re-sparsify the fp32 path's dense hub-row block: the df64 dense
        # matvec would be VPU-bound over H*m slots; the compact RG-ELL
        # spill only touches the real entries
        ids, Br = plan.dense_rows
        rr, cc = np.nonzero(Br)
        extra = (ids[rr].astype(np.int64), cc.astype(np.int64), Br[rr, cc])
        spill_coo = extra if spill_coo is None else tuple(
            np.concatenate([p, q]) for p, q in zip(spill_coo, extra))
    spill = None
    if spill_coo is not None:
        r, c, v = spill_coo
        if r.size <= 16384:
            # tiny spill as a little ELL keyed by UNIQUE row, so the device
            # combine is a per-row df reduction + an exact .set (a raw fp32
            # scatter-ADD would round away the low words)
            ur, inv = np.unique(r, return_inverse=True)
            counts = np.bincount(inv)
            kmax = max(int(counts.max()), 1)
            slot = np.zeros(r.size, dtype=np.int64)
            order = np.argsort(inv, kind="stable")
            pos = np.arange(r.size) - np.repeat(
                np.r_[0, np.cumsum(counts)[:-1]], counts)
            slot[order] = pos
            ce = np.zeros((ur.size, kmax), dtype=np.int32)
            ve = np.zeros((ur.size, kmax), dtype=np.float64)
            ce[inv, slot] = c.astype(np.int32)
            ve[inv, slot] = v
            mk = np.zeros((ur.size, kmax), dtype=np.float32)
            mk[inv, slot] = 1.0
            ehi, elo = prec.df_from_f64_host(ve)
            spill = (jnp.asarray(ur.astype(np.int32)), jnp.asarray(ce),
                     jnp.asarray(ehi), jnp.asarray(elo), jnp.asarray(mk))
        else:
            # compacted RG-ELL spill (see gsell.gsell_to_device: full-row-
            # space RG-ELL pads every empty row and measured ~1000x slower)
            from ..formats import COOMatrix, coo_to_csr
            from . import rgell as _rgell
            ur, rinv = np.unique(r, return_inverse=True)
            csr = coo_to_csr(COOMatrix((ur.size, plan.shape[1]),
                                       rinv.astype(np.int32),
                                       c.astype(np.int32), v))
            spill = (jnp.asarray(ur.astype(np.int32)),
                     _rgell.rgell_to_device(csr, "df64"))
    dense = None
    if plan.dense_cols is not None:
        ci, B = plan.dense_cols
        bhi, blo = prec.df_from_f64_host(B.T)   # (K, n), K on sublanes
        dense = (jnp.asarray(ci), jnp.asarray(bhi), jnp.asarray(blo))
    vex = None
    if plan.vextra_rows is not None:
        ex = plan.vextra_rows.astype(np.int64)
        ur, inv = np.unique(ex, return_inverse=True)
        counts = np.bincount(inv)
        kmax = int(counts.max())
        order = np.argsort(inv, kind="stable")
        pos = np.arange(ex.size) - np.repeat(
            np.r_[0, np.cumsum(counts)[:-1]], counts)
        slot = np.zeros(ex.size, dtype=np.int64)
        slot[order] = pos
        gi = np.zeros((ur.size, kmax), dtype=np.int32)
        mk = np.zeros((ur.size, kmax), dtype=np.float32)
        gi[inv, slot] = np.arange(ex.size, dtype=np.int32)
        mk[inv, slot] = 1.0
        vex = (jnp.asarray(ur.astype(np.int32)), jnp.asarray(gi),
               jnp.asarray(mk))
    return DeviceGsellDf(
        shape_=plan.shape, nnz_=plan.nnz, nbank=plan.nbank, quota=plan.quota,
        cs=plan.cs, nseg_pad=plan.nseg_pad, wide=plan.wide,
        wstart=jnp.asarray(plan.wstart),
        seg=jnp.asarray(plan.seg),
        lane=jnp.asarray(plan.lane),
        val_hi=jnp.asarray(vhi), val_lo=jnp.asarray(vlo),
        spill=spill,
        dense_cols=dense,
        vextra_comb=vex,
        extras=(None if plan.extras_plan is None
                else gsell_df_to_device(plan.extras_plan)),
    )


def _gsell_df_kernel(cs: int, nbank: int, quota: int, wide: bool):
    ns = cs // 128
    ob = nbank if nbank % 8 == 0 else 8 * (-(-nbank // 8))

    def kern(ws_ref, *refs):
        nwin = 4 if wide else 2
        wins = [r[:] for r in refs[:nwin]]          # hi(,hi1), lo(,lo1)
        seg_ref, lane_ref, vhi_ref, vlo_ref, ohi_ref, olo_ref = refs[nwin:]
        if wide:
            Whi, Whi1, Wlo, Wlo1 = wins
        else:
            Whi, Wlo = wins
        ident = jnp.eye(128, dtype=jnp.float32)

        def gather2(W, W1, segt, in_lo):
            if wide:
                lo = jnp.take_along_axis(W, jnp.where(in_lo, segt, 0), axis=1)
                hi = jnp.take_along_axis(W1, jnp.where(in_lo, 0, segt - 128),
                                         axis=1)
                srcT = jnp.where(in_lo, lo, hi)
            else:
                srcT = jnp.take_along_axis(W, segt, axis=1)
            # exact MXU transpose (see gsell.py: HIGHEST is bit-exact)
            return jax.lax.dot_general(
                srcT, ident, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        hparts, lparts = [], []
        for k in range(ns):
            segt = seg_ref[0, :, 128 * k:128 * (k + 1)].astype(jnp.int32)
            in_lo = segt < 128 if wide else None
            src_h = gather2(Whi, Whi1 if wide else None, segt, in_lo)
            src_l = gather2(Wlo, Wlo1 if wide else None, segt, in_lo)
            lidx = lane_ref[128 * k:128 * (k + 1), :].astype(jnp.int32)
            ghi = jnp.take_along_axis(src_h, lidx, axis=1)
            glo = jnp.take_along_axis(src_l, lidx, axis=1)
            vhi = vhi_ref[128 * k:128 * (k + 1), :]
            vlo = vlo_ref[128 * k:128 * (k + 1), :]
            p = prec.df_mul(DF(vhi, vlo), DF(ghi, glo))
            hparts.append(p.hi)
            lparts.append(p.lo)
        chi = hparts[0] if ns == 1 else jnp.concatenate(hparts, axis=0)
        clo = lparts[0] if ns == 1 else jnp.concatenate(lparts, axis=0)
        chi = chi.reshape(nbank, quota, 128)
        clo = clo.reshape(nbank, quota, 128)
        # fixed-order df accumulation over the slot quota (deterministic)
        acc = DF(chi[:, 0, :], clo[:, 0, :])
        for t in range(1, quota):
            acc = prec.df_add(acc, DF(chi[:, t, :], clo[:, t, :]))
        hi, lo = acc.hi, acc.lo
        if ob != nbank:
            # TPU block sublane dim must be a multiple of 8 (small nbank
            # happens in nested extras plans)
            pad = jnp.zeros((ob - nbank, 128), jnp.float32)
            hi = jnp.concatenate([hi, pad], axis=0)
            lo = jnp.concatenate([lo, pad], axis=0)
        ohi_ref[:] = hi
        olo_ref[:] = lo

    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_gsell_df_core(dev: DeviceGsellDf, xhi: jax.Array, xlo: jax.Array,
                        interpret: bool = False) -> DF:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = dev.shape_
    G = dev.wstart.shape[0]
    cs, nbank, quota = dev.cs, dev.nbank, dev.quota
    ob = nbank if nbank % 8 == 0 else 8 * (-(-nbank // 8))
    npad = dev.nseg_pad * 128

    def win_copies(x):
        xp = jnp.zeros((npad + 128 * 128,), jnp.float32)
        xp = xp.at[:m].set(x.astype(jnp.float32))
        copies = [xp[r * SHIFT_GRAN * 128:][:npad]
                  .reshape(dev.nseg_pad, 128).T
                  for r in range(128 // SHIFT_GRAN)]
        return jnp.concatenate(copies, axis=1)

    xTh = win_copies(xhi)
    xTl = win_copies(xlo)

    def wspec(shift):
        return pl.BlockSpec((128, 128), lambda g, ws, s=shift: (0, ws[g] + s),
                            memory_space=pltpu.VMEM)

    win_specs = [wspec(0)]
    win_args = [xTh]
    if dev.wide:
        win_specs.append(wspec(1))
        win_args.append(xTh)
    win_specs.append(wspec(0))
    win_args.append(xTl)
    if dev.wide:
        win_specs.append(wspec(1))
        win_args.append(xTl)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=win_specs + [
            pl.BlockSpec((1, 128, cs), lambda g, ws: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs, 128), lambda g, ws: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs, 128), lambda g, ws: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs, 128), lambda g, ws: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((ob, 128), lambda g, ws: (g, 0),
                                memory_space=pltpu.VMEM)] * 2,
    )
    ohi, olo = pl.pallas_call(
        _gsell_df_kernel(cs, nbank, quota, dev.wide),
        out_shape=[jax.ShapeDtypeStruct((G * ob, 128), jnp.float32)] * 2,
        grid_spec=grid_spec,
        interpret=interpret,
    )(dev.wstart, *win_args, dev.seg, dev.lane, dev.val_hi, dev.val_lo)
    if ob != nbank:
        ohi = ohi.reshape(G, ob, 128)[:, :nbank, :]
        olo = olo.reshape(G, ob, 128)[:, :nbank, :]
    y = DF(ohi.reshape(-1)[:n], olo.reshape(-1)[:n])
    if dev.extras is not None:
        # virtual-row split: gather each heavy row's tail partials from the
        # nested extras plan and df-merge them in fixed order (masked pads
        # are exact zeros)
        ye = _spmv_gsell_df_core(dev.extras, xhi, xlo, interpret=interpret)
        ur, gi, mk = dev.vextra_comb
        ehi = jnp.take(ye.hi, gi) * mk
        elo = jnp.take(ye.lo, gi) * mk
        contrib = DF(ehi[:, 0], elo[:, 0])
        for t in range(1, gi.shape[1]):
            contrib = prec.df_add(contrib, DF(ehi[:, t], elo[:, t]))
        upd = prec.df_add(DF(y.hi[ur], y.lo[ur]), contrib)
        y = DF(y.hi.at[ur].set(upd.hi), y.lo.at[ur].set(upd.lo))
    if isinstance(dev.spill, tuple) and len(dev.spill) == 2:
        # compacted RG-ELL spill: df64 row-gather over spilling rows, then
        # an exact unique-index merge (scatter-ADD would round low words)
        ur, rg = dev.spill
        from . import rgell as _rgell
        ys = _rgell.rgell_spmv(rg, DF(xhi, xlo))
        upd = prec.df_add(DF(y.hi[ur], y.lo[ur]), ys)
        y = DF(y.hi.at[ur].set(upd.hi), y.lo.at[ur].set(upd.lo))
    elif isinstance(dev.spill, tuple):
        ur, ce, ehi, elo, mk = dev.spill
        g = DF(jnp.take(xhi, ce).astype(jnp.float32) * mk,
               jnp.take(xlo, ce).astype(jnp.float32) * mk)
        p = prec.df_mul(DF(ehi, elo), g)          # pads are exact (0,0)
        contrib = DF(p.hi[:, 0], p.lo[:, 0])
        for t in range(1, ce.shape[1]):
            contrib = prec.df_add(contrib, DF(p.hi[:, t], p.lo[:, t]))
        upd = prec.df_add(DF(y.hi[ur], y.lo[ur]), contrib)
        y = DF(y.hi.at[ur].set(upd.hi), y.lo.at[ur].set(upd.lo))
    elif dev.spill is not None:
        from . import rgell as _rgell
        ys = _rgell.rgell_spmv(dev.spill, DF(xhi, xlo))
        y = prec.df_add(y, ys)
    if dev.dense_cols is not None:
        # hub columns: df64 dense (K, n) matvec — elementwise two_prod plus
        # a fixed-order df reduction over K (deterministic, ~fp64-accurate)
        ci, bhi, blo = dev.dense_cols
        xh = DF(jnp.take(xhi, ci).astype(jnp.float32),
                jnp.take(xlo, ci).astype(jnp.float32))
        p = prec.df_mul(DF(bhi, blo), DF(xh.hi[:, None], xh.lo[:, None]))
        y = prec.df_add(y, prec.df_sum(p, axis=0))
    return y


def spmv_gsell_df(dev: DeviceGsellDf, x) -> DF:
    if not isinstance(x, DF):
        x = prec._as_df(jnp.asarray(x))
    interpret = jax.default_backend() != "tpu"
    return _spmv_gsell_df_core(dev, x.hi, x.lo, interpret=interpret)


def estimate_gsell_df(plan: GsellPlan) -> float:
    """Predicted seconds/SpMV (measured-constant model, like estimate_gsell)."""
    lanes = plan.ngroups * plan.cs * 128
    rate = DF_SLOT_LANES_PER_S * (0.7 if plan.wide else 1.0)
    t = lanes / rate
    if plan.spill_coo is not None:
        ns = plan.spill_coo[0].size
        if ns <= 16384:
            t += 5e-6 + ns / 0.15e9
        else:
            from . import bell as _bell
            t += 2 * ns / _bell.GATHER_ROWS_PER_S
    if plan.dense_cols is not None:
        K = plan.dense_cols[0].size
        # df64 MAC chain on the VPU over the dense hub block
        t += 5e-6 + plan.shape[0] * K / 2e9 + K / 0.15e9
    if plan.dense_rows is not None:
        t += 2e-5 + int(np.count_nonzero(plan.dense_rows[1])) / 0.1e9
    if plan.extras_plan is not None:
        t += estimate_gsell_df(plan.extras_plan) \
            + plan.vextra_rows.size * 8 / 0.1e9
    return t
