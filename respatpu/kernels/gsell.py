"""GSELL: gather-SELL SpMV — the unstructured-matrix fast path on TPU.

Replaces ``mkl_sparse_?_mv`` (test_spmv.c:168-180) and ``cusparseSpMV``
(GPU/spmv.cu:176-195) for general (non-stencil) sparsity, where the round-1
formats were gather-bound (RG-ELL 0.4 Gnnz/s, BELL 3.3 Gnnz/s on mesh-FEM).

Key discovery (round 2, measured on chip — see BASELINE.md): Mosaic lowers
``jnp.take_along_axis(data, idx, axis=-1)`` on a (S,128) tile to the hardware
lane shuffle (``tpu.dynamic_gather``), which runs at memory-stream speed
(~60 Gelem/s, 725 GB/s). GSELL is built entirely out of that primitive:

  * x is viewed as 128-wide *segments*; ``xT`` is its (128, nseg) transpose
    so that segments lie on lanes.
  * Matrix rows are grouped into *banks* of 128 rows (lane = row % 128) and
    banks into *groups* that share a 256-segment aligned column window.
  * nnz are packed into *slots*: slot s of a group holds, for each lane
    position u, one segment id SEG[u,s]; each row-lane r of slot s holds one
    entry (lane index LANE[s,r] = col % 128, value VAL[s,r]).  The kernel
    computes, per slot chunk,

        srcT[u,s] = W[u, SEG[u,s]]        # lane gather from window
        src       = srcT.T                # (slots, positions)
        g[s,r]    = src[s, LANE[s,r]]     # lane gather again
        y_bank    = sum over the bank's slot quota of VAL * g

    i.e. an arbitrary 2D gather decomposed into two hardware lane gathers
    and one in-register transpose; indices travel as uint8 (1 B each).

Packing efficiency measured on the 2cubes_sphere mesh-FEM stand-in:
1.43x slots/nnz, max 26 slots per 128-row bank, natural-order window span
37 segments (no reordering needed).  Entries that miss the window or the
per-bank slot quota spill to a small RG-ELL side structure.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSRMatrix
from ..precision import Policy, get_policy

__all__ = ["GsellPlan", "build_gsell", "DeviceGsell", "gsell_to_device",
           "spmv_gsell", "estimate_gsell"]

BANK_ROWS = 128          # rows per bank (one lane each)
WIN_SEGS = 128           # narrow window = one 128-segment block
SHIFT_GRAN = 32          # window bases are SHIFT_GRAN-aligned; x is laid
                         # out 128/SHIFT_GRAN times (copy r shifted by
                         # r*SHIFT_GRAN segments) so any aligned base is one
                         # 128-block of the concat layout.  Finer granularity
                         # = more usable span (>= win - SHIFT_GRAN) at the
                         # cost of extra x-prep passes.

# measured constants (chip, round 2): slot-lane throughput of the kernel and
# the HBM stream it rides on; used by the fmt="auto" cost model.
SLOT_LANES_PER_S = 50e9
STREAM_BPS = 725e9


def _pack_bank(rows, u, q, max_slots):
    """Greedy first-fit mosaic packing of one bank's entries into slots.

    rows/u/q: int arrays (local row 0..127, col%128, window-relative segment).
    Returns (slot_id per entry, n_slots, spill_mask).
    """
    n = rows.size
    slot_of = np.full(n, -1, dtype=np.int32)
    if n == 0:
        return slot_of, 0, np.zeros(0, dtype=bool)
    # cells: entries sharing (u, q) can share a slot (rows are distinct)
    key = u.astype(np.int64) * 4096 + q
    order = np.lexsort((rows, key))
    key_s = key[order]
    bounds = np.flatnonzero(np.r_[True, np.diff(key_s) != 0])
    sizes = np.diff(np.r_[bounds, n])
    cell_order = np.argsort(-sizes, kind="stable")  # big cells first
    # slot state: per slot, q assigned at each u (-1 free), row occupancy
    slot_u = np.full((max_slots, BANK_ROWS), -1, dtype=np.int16)
    slot_rows = np.zeros((max_slots, BANK_ROWS), dtype=bool)
    n_slots = 0
    for ci in cell_order:
        b = bounds[ci]
        e = b + sizes[ci]
        ent = order[b:e]
        uu = int(u[ent[0]])
        qq = int(q[ent[0]])
        rem = ent
        s = 0
        while rem.size and s < max_slots:
            if s == n_slots:
                n_slots += 1
            squ = slot_u[s, uu]
            if squ == -1 or squ == qq:
                free = ~slot_rows[s, rows[rem]]
                take = rem[free]
                if take.size:
                    slot_u[s, uu] = qq
                    slot_rows[s, rows[take]] = True
                    slot_of[take] = s
                    rem = rem[~free]
            s += 1
    spill = slot_of < 0
    return slot_of, n_slots, spill


@dataclasses.dataclass
class GsellPlan:
    """Host-side packed layout (see module docstring)."""
    shape: Tuple[int, int]
    nnz: int
    nbank: int               # banks per group
    quota: int               # slots per bank
    cs: int                  # slots per group = nbank * quota (mult of 128)
    nseg_pad: int            # padded x segment count (multiple of 128)
    wstart: np.ndarray       # int32[G]  window block index per group
    seg: np.ndarray          # uint8[G, 128, cs]   per-position segment ids
    lane: np.ndarray         # uint8[G*cs, 128]    per-entry lane index
    val: np.ndarray          # float64[G*cs, 128]  values (cast at to_device)
    spill_coo: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]
    packed_nnz: int
    wide: bool = False       # 256-segment windows (two blocks + select)

    @property
    def ngroups(self):
        return self.wstart.size

    @property
    def fill(self):
        return self.packed_nnz / max(self.ngroups * self.cs * 128, 1)


def _pack_all_python(n, indptr, indices, nbank, win_segs, hard_cap, wbase):
    """Reference packer: per-bank greedy in Python (native C++ fast path in
    io/_native/host_ops.cpp:gsell_pack is bit-identical and ~30x faster)."""
    nbanks_total = (n + BANK_ROWS - 1) // BANK_ROWS
    slot_of = np.full(indices.size, -1, dtype=np.int32)
    demands = np.zeros(nbanks_total, dtype=np.int32)
    for b in range(nbanks_total):
        r0, r1 = b * BANK_ROWS, min(n, (b + 1) * BANK_ROWS)
        lo, hi = int(indptr[r0]), int(indptr[r1])
        cols = indices[lo:hi]
        rl = np.repeat(np.arange(r1 - r0, dtype=np.int32),
                       np.diff(indptr[r0:r1 + 1]).astype(np.int64))
        u = (cols % 128).astype(np.int32)
        qrel = (cols // 128).astype(np.int64) - wbase[b // nbank]
        in_win = (qrel >= 0) & (qrel < win_segs)
        iw = np.flatnonzero(in_win)
        so, nsl, _ = _pack_bank(rl[iw], u[iw], qrel[iw].astype(np.int32),
                                hard_cap)
        slot_of[lo + iw] = so
        demands[b] = nsl
    return slot_of, demands


def _pack_all(n, indptr, indices, nbank, win_segs, hard_cap, wbase):
    try:
        from ..io import native
        lib = native._load()
        import ctypes
        fn = lib.gsell_pack
        fn.restype = ctypes.c_int
        slot_of = np.full(indices.size, -2, dtype=np.int32)
        nbanks_total = (n + BANK_ROWS - 1) // BANK_ROWS
        demands = np.zeros(nbanks_total, dtype=np.int32)
        ip = np.ascontiguousarray(indptr, dtype=np.int64)
        ix = np.ascontiguousarray(indices, dtype=np.int32)
        wb = np.ascontiguousarray(wbase, dtype=np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        rc = fn(ctypes.c_int64(n), ip.ctypes.data_as(i64p),
                ix.ctypes.data_as(i32p), ctypes.c_int64(nbank),
                ctypes.c_int64(win_segs), ctypes.c_int64(hard_cap),
                wb.ctypes.data_as(i64p),
                slot_of.ctypes.data_as(i32p), demands.ctypes.data_as(i32p),
                ctypes.c_int32(0))
        if rc == 0 and not (slot_of == -2).any():
            return slot_of, demands
    except Exception:
        pass
    return _pack_all_python(n, indptr, indices, nbank, win_segs, hard_cap,
                            wbase)


def build_gsell(a: CSRMatrix, nbank: Optional[int] = None,
                quota: Optional[int] = None,
                wide: Optional[bool] = None) -> GsellPlan:
    """Pack a CSR matrix into the GSELL layout (natural row order)."""
    n, m = a.shape
    indptr = np.asarray(a.indptr).astype(np.int64)
    indices = np.asarray(a.indices)
    data = np.asarray(a.data, dtype=np.float64)
    nbanks_total = (n + BANK_ROWS - 1) // BANK_ROWS
    HARD_CAP = 512

    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    q_all = indices.astype(np.int64) // 128
    bank_of = rows // BANK_ROWS
    # per-bank min segment (entries are bank-sorted: reduceat on boundaries)
    bstarts = indptr[np.minimum(np.arange(nbanks_total) * BANK_ROWS, n)]
    qmin_b = np.zeros(nbanks_total, dtype=np.int64)
    nonempty = np.diff(np.r_[bstarts, indices.size]) > 0
    if indices.size:
        red = np.minimum.reduceat(q_all, np.minimum(bstarts, indices.size - 1))
        qmin_b = np.where(nonempty, red, np.int64(1 << 60))

    # nbank trades quota quantization (cs must be a multiple of 128) against
    # window span: a group of nbank*128 consecutive rows must fit one
    # 64-aligned window (128 segments narrow / 256 wide) or its
    # out-of-window entries spill.  Prefer the narrow kernel (no lo/hi
    # select, ~20% faster) at large nbank; fall back to the wide one.
    def _bases(cand):
        gl = (nbanks_total + cand - 1) // cand
        pad = np.full(gl * cand - nbanks_total, np.int64(1 << 60))
        gmin = np.concatenate([qmin_b, pad]).reshape(gl, cand).min(axis=1)
        gmin = np.where(gmin == (1 << 60), 0, gmin)
        return (gmin // SHIFT_GRAN) * SHIFT_GRAN

    def _overflow(cand, win):
        base = _bases(cand)
        qrel = q_all - base[bank_of // cand]
        return int(((qrel < 0) | (qrel >= win)).sum())

    budget = max(1, a.nnz // 2000)
    if wide is None and nbank is None:
        wide, nbank = False, 8
        for cand_nb, cand_wide in ((64, False), (32, False), (16, False),
                                   (64, True), (32, True), (16, True),
                                   (8, False)):
            if _overflow(cand_nb, 256 if cand_wide else 128) <= budget:
                nbank, wide = cand_nb, cand_wide
                break
        else:
            wide = True
    elif wide is None:
        wide = _overflow(nbank, 128) > budget
    elif nbank is None:
        nbank = 16
    win_segs = 256 if wide else WIN_SEGS

    G = (nbanks_total + nbank - 1) // nbank
    wbase = _bases(nbank)
    slot_of, demands = _pack_all(n, indptr, indices, nbank, win_segs,
                                 HARD_CAP, wbase)

    if quota is None:
        # smallest cs (multiple of 128) whose quota spills few enough
        # entries for the tiny-COO side path
        sl_ok = slot_of[slot_of >= 0]
        counts = np.bincount(sl_ok, minlength=HARD_CAP)
        tail = sl_ok.size - np.cumsum(counts)  # spills if quota = q+1
        sbudget = min(max(16, a.nnz // 2000), 8192)
        quota = int(demands.max()) if demands.size else 1
        for cs_c in range(128, (quota * nbank + 127) // 128 * 128 + 1, 128):
            q_c = cs_c // nbank
            if q_c >= 1 and tail[min(q_c - 1, HARD_CAP - 1)] <= sbudget:
                quota = q_c
                break
    elif quota <= 0:  # quota=0: no quota spills, cover the max demand
        quota = max(int(demands.max()) if demands.size else 1, 1)
    quota = max(int(quota), 1)
    cs = ((nbank * quota + 127) // 128) * 128
    quota = cs // nbank

    # padded segment count: cover the matrix width plus the window reach
    nseg_pad = max((m + 127) // 128 + 1,
                   (int(wbase.max()) if G else 0) // 128 + 3)
    nseg_pad = ((nseg_pad + 127) // 128) * 128
    # window block index in the concat shifted-copies layout: copy r holds
    # xT shifted by r*SHIFT_GRAN segments, so any SHIFT_GRAN-aligned base is
    # one aligned 128-block of copy r = (base mod 128) / SHIFT_GRAN
    nblocks = nseg_pad // 128
    rcopy = (wbase % 128) // SHIFT_GRAN
    wstart = (rcopy * nblocks
              + (wbase - rcopy * SHIFT_GRAN) // 128).astype(np.int32)

    # final array fill, fully vectorized
    u_all = (indices % 128).astype(np.uint8)
    g_of = (bank_of // nbank).astype(np.int64)
    qrel_all = q_all - wbase[g_of]
    rl_all = (rows - bank_of * BANK_ROWS).astype(np.int64)
    blocal = (bank_of % nbank).astype(np.int64)
    ok = (slot_of >= 0) & (slot_of < quota)
    seg = np.zeros((G, 128, cs), dtype=np.uint8)
    lane = np.zeros((G * cs, BANK_ROWS), dtype=np.uint8)
    val = np.zeros((G * cs, BANK_ROWS), dtype=np.float64)
    gslot = g_of[ok] * cs + blocal[ok] * quota + slot_of[ok]
    lane[gslot, rl_all[ok]] = u_all[ok]
    val[gslot, rl_all[ok]] = data[ok]
    seg[g_of[ok], u_all[ok], blocal[ok] * quota + slot_of[ok]] = \
        qrel_all[ok].astype(np.uint8)
    packed = int(ok.sum())
    spill = None
    if packed < a.nnz:
        bad = ~ok
        spill = (rows[bad].astype(np.int64), indices[bad].astype(np.int64),
                 data[bad])
    return GsellPlan(shape=(n, m), nnz=a.nnz, nbank=nbank, quota=quota,
                     cs=cs, nseg_pad=nseg_pad, wstart=wstart, seg=seg,
                     lane=lane, val=val, spill_coo=spill, packed_nnz=packed,
                     wide=bool(wide))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceGsell:
    """Device-resident GSELL matrix (fp32/bf16 value stream)."""
    shape_: Tuple[int, int]   # static
    nnz_: int                 # static
    nbank: int                # static
    quota: int                # static
    cs: int                   # static
    nseg_pad: int             # static
    policy_name: str          # static
    wide: bool                # static
    wstart: jax.Array         # int32[G]
    seg: jax.Array            # uint8[G, 128, cs]
    lane: jax.Array           # uint8[G*cs, 128]
    val: jax.Array            # f32/bf16[G*cs, 128]
    spill: Optional[object]   # DeviceRgell or None

    def tree_flatten(self):
        return ((self.wstart, self.seg, self.lane, self.val, self.spill),
                (self.shape_, self.nnz_, self.nbank, self.quota, self.cs,
                 self.nseg_pad, self.policy_name, self.wide))

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
        return get_policy(self.policy_name)

    @property
    def meta(self):  # parity with other device formats
        return self


def gsell_to_device(a: Union[CSRMatrix, GsellPlan],
                    policy: Union[str, Policy] = "fp32",
                    nbank: Optional[int] = None,
                    quota: Optional[int] = None) -> DeviceGsell:
    policy = get_policy(policy)
    if policy.double_word:
        raise ValueError("GSELL is a single-word-precision format; "
                         "use fmt='rgell' for df64")
    plan = a if isinstance(a, GsellPlan) else build_gsell(a, nbank, quota)
    spill = None
    if plan.spill_coo is not None:
        r, c, v = plan.spill_coo
        if r.size <= 16384:
            # tiny spill: one gather + one scatter-add beats a full RG-ELL
            # pass over every row (measured: 23 spills via RG-ELL cost 1.2 ms)
            spill = (jnp.asarray(r.astype(np.int32)),
                     jnp.asarray(c.astype(np.int32)),
                     jnp.asarray(v.astype(np.float32)))
        else:
            from ..formats import COOMatrix, coo_to_csr
            from . import rgell as _rgell
            csr = coo_to_csr(COOMatrix(plan.shape, r.astype(np.int32),
                                       c.astype(np.int32), v))
            spill = _rgell.rgell_to_device(csr, policy)
    dt = jnp.bfloat16 if policy.dtype == jnp.bfloat16 else jnp.float32
    return DeviceGsell(
        shape_=plan.shape, nnz_=plan.nnz, nbank=plan.nbank, quota=plan.quota,
        cs=plan.cs, nseg_pad=plan.nseg_pad, policy_name=policy.name,
        wide=plan.wide,
        wstart=jnp.asarray(plan.wstart),
        seg=jnp.asarray(plan.seg),
        lane=jnp.asarray(plan.lane),
        val=jnp.asarray(plan.val.astype(np.float32), dt),
        spill=spill,
    )


def _gsell_kernel(cs: int, nbank: int, quota: int, wide: bool):
    ns = cs // 128
    def kern(ws_ref, w_ref, *rest):
        if wide:
            w1_ref, seg_ref, lane_ref, val_ref, o_ref = rest
            W1 = w1_ref[:]
        else:
            seg_ref, lane_ref, val_ref, o_ref = rest
        W = w_ref[:]
        ident = jnp.eye(128, dtype=jnp.float32)
        parts = []
        for k in range(ns):
            segt = seg_ref[0, :, 128 * k:128 * (k + 1)].astype(jnp.int32)
            if wide:
                in_lo = segt < 128
                lo = jnp.take_along_axis(W, jnp.where(in_lo, segt, 0), axis=1)
                hi = jnp.take_along_axis(W1, jnp.where(in_lo, 0, segt - 128),
                                         axis=1)
                srcT = jnp.where(in_lo, lo, hi)
            else:
                srcT = jnp.take_along_axis(W, segt, axis=1)
            # (128,128) transpose on the MXU: out[s,u] = sum_k srcT[k,s]*I[k,u]
            # is exact at HIGHEST (single nonzero term, f32 passes; HIGH is
            # NOT bit-exact — measured round 3).  The VPU shuffle transpose
            # measures ~178 ns; this runs ~2x faster.
            src = jax.lax.dot_general(
                srcT, ident, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            lidx = lane_ref[128 * k:128 * (k + 1), :].astype(jnp.int32)
            g = jnp.take_along_axis(src, lidx, axis=1)
            v = val_ref[128 * k:128 * (k + 1), :]
            parts.append(v.astype(jnp.float32) * g)
        contrib = parts[0] if ns == 1 else jnp.concatenate(parts, axis=0)
        # Bank reduction stays a VPU reshape-sum: both MXU one-hot-dot
        # alternatives measured SLOWER on chip (round 3) — a per-chunk dot
        # chained through an accumulator serializes MXU latency (118 us vs
        # 62 us total), and one batched (nbank, cs) @ (cs, 128) dot still
        # lost (75 us).  The ~90 ns/chunk reshape-sum is the best known.
        o_ref[:] = jnp.sum(contrib.reshape(nbank, quota, 128), axis=1)

    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_gsell_core(dev: DeviceGsell, x: jax.Array,
                     interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = dev.shape_
    G = dev.wstart.shape[0]
    cs, nbank, quota = dev.cs, dev.nbank, dev.quota
    npad = dev.nseg_pad * 128
    # shifted copies: copy r = xT shifted by r*SHIFT_GRAN segments, so any
    # SHIFT_GRAN-aligned window is one aligned 128-block of the concat
    # layout (wstart indexes into it); costs 128/SHIFT_GRAN passes over x
    xp = jnp.zeros((npad + 128 * 128,), jnp.float32)
    xp = xp.at[:m].set(x.astype(jnp.float32))
    copies = [xp[r * SHIFT_GRAN * 128:][:npad].reshape(dev.nseg_pad, 128).T
              for r in range(128 // SHIFT_GRAN)]
    xTcat = jnp.concatenate(copies, axis=1)

    win_specs = [pl.BlockSpec((128, 128), lambda g, ws: (0, ws[g]),
                              memory_space=pltpu.VMEM)]
    win_args = [xTcat]
    if dev.wide:
        win_specs.append(pl.BlockSpec((128, 128), lambda g, ws: (0, ws[g] + 1),
                                      memory_space=pltpu.VMEM))
        win_args.append(xTcat)
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
        ],
        out_specs=pl.BlockSpec((nbank, 128), lambda g, ws: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _gsell_kernel(cs, nbank, quota, dev.wide),
        out_shape=jax.ShapeDtypeStruct((G * nbank, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dev.wstart, *win_args, dev.seg, dev.lane, dev.val)
    y = out.reshape(-1)[:n]
    if isinstance(dev.spill, tuple):
        # tiny spill: 1-elem gather + scatter-add.  An 8-wide-row staging
        # variant (row gathers + row scatter-add) measured WORSE on chip
        # (round 3: ~23 us vs ~8.5 us for ~400 spills) — XLA's row
        # scatter-add with duplicate indices is slower than the 1-elem path.
        r, c, v = dev.spill
        y = y.at[r].add(v * jnp.take(x.astype(jnp.float32), c))
    elif dev.spill is not None:
        from . import rgell as _rgell
        y = y + _rgell.rgell_spmv(dev.spill, x)
    return y


def spmv_gsell(dev: DeviceGsell, x: jax.Array) -> jax.Array:
    interpret = jax.default_backend() != "tpu"
    return _spmv_gsell_core(dev, x, interpret=interpret)


def estimate_gsell(plan: GsellPlan) -> float:
    """Predicted seconds/SpMV from the measured-constant cost model.

    Calibrated on chip (round 2): 2cubes 49us/1.25M lane-slots,
    cfd2 77us/1.8M, offshore(wide) 198us/3.0M.
    """
    lanes = plan.ngroups * plan.cs * 128
    rate = SLOT_LANES_PER_S * (0.62 if plan.wide else 1.0)
    t = max(lanes / rate, lanes * 6 / STREAM_BPS)
    if plan.spill_coo is not None:
        ns = plan.spill_coo[0].size
        if ns <= 16384:
            t += 5e-6 + ns / 0.15e9   # gather+scatter tiny path
        else:
            from . import bell as _bell
            t += ns / _bell.GATHER_ROWS_PER_S  # RG-ELL-ish row-gather bound
    return t
