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

    def tree_flatten(self):
        return ((self.wstart, self.seg, self.lane, self.val_hi, self.val_lo,
                 self.spill),
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
    spill = None
    if plan.spill_coo is not None:
        r, c, v = plan.spill_coo
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
            from ..formats import COOMatrix, coo_to_csr
            from . import rgell as _rgell
            csr = coo_to_csr(COOMatrix(plan.shape, r.astype(np.int32),
                                       c.astype(np.int32), v))
            spill = _rgell.rgell_to_device(csr, "df64")
    return DeviceGsellDf(
        shape_=plan.shape, nnz_=plan.nnz, nbank=plan.nbank, quota=plan.quota,
        cs=plan.cs, nseg_pad=plan.nseg_pad, wide=plan.wide,
        wstart=jnp.asarray(plan.wstart),
        seg=jnp.asarray(plan.seg),
        lane=jnp.asarray(plan.lane),
        val_hi=jnp.asarray(vhi), val_lo=jnp.asarray(vlo),
        spill=spill,
    )


def _gsell_df_kernel(cs: int, nbank: int, quota: int, wide: bool):
    ns = cs // 128

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
        ohi_ref[:] = acc.hi
        olo_ref[:] = acc.lo

    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_gsell_df_core(dev: DeviceGsellDf, xhi: jax.Array, xlo: jax.Array,
                        interpret: bool = False) -> DF:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = dev.shape_
    G = dev.wstart.shape[0]
    cs, nbank, quota = dev.cs, dev.nbank, dev.quota
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
        out_specs=[pl.BlockSpec((nbank, 128), lambda g, ws: (g, 0),
                                memory_space=pltpu.VMEM)] * 2,
    )
    ohi, olo = pl.pallas_call(
        _gsell_df_kernel(cs, nbank, quota, dev.wide),
        out_shape=[jax.ShapeDtypeStruct((G * nbank, 128), jnp.float32)] * 2,
        grid_spec=grid_spec,
        interpret=interpret,
    )(dev.wstart, *win_args, dev.seg, dev.lane, dev.val_hi, dev.val_lo)
    y = DF(ohi.reshape(-1)[:n], olo.reshape(-1)[:n])
    if isinstance(dev.spill, tuple):
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
    return t
