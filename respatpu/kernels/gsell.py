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

VROW_MAX = 32            # split rows wider than this into virtual rows
                         # (matches the capped slot quota at nbank=64)

# measured constants (chip, round 2): slot-lane throughput of the kernel and
# the HBM stream it rides on; used by the fmt="auto" cost model.
SLOT_LANES_PER_S = 50e9
STREAM_BPS = 725e9
# round 3, measured on dc1-class spills: 1-elem gather + scatter-add rate
# (74k entries -> 1.14 ms) and the compacted RG-ELL row-gather rate in
# context (55k slots -> 3.3 ms; far under the isolated 0.62 Grow/s probe)
SCATTER_ELEMS_PER_S = 0.065e9
SPILL_RG_SLOTS_PER_S = 0.017e9


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
    # Hub-column split (circuit-class matrices, round 3): columns whose
    # degree defeats window locality are carried as a dense (n, K) block;
    # y += B @ x[colidx] rides the MXU/HBM stream instead of fighting the
    # lane-shuffle windows.  None for matrices without hub columns.
    dense_cols: Optional[Tuple[np.ndarray, np.ndarray]] = None
    # Hub-row split: rows whose (post-hub-column) degree defeats the slot
    # quota are carried densely as (ids[H], Br[H, m]); y[ids] += Br @ x on
    # the MXU.  The df64 builder re-sparsifies Br into a compact RG-ELL.
    dense_rows: Optional[Tuple[np.ndarray, np.ndarray]] = None
    # Virtual-row split (round 3): a row with degree d occupies >= d slots
    # of its bank (one entry per slot-lane), so power-law tails blow the
    # quota.  Rows wider than VROW_MAX are split into ceil(d/VROW_MAX)
    # chunks: chunk 0 keeps the original row id (y[:n] stays aligned — no
    # combine gather); chunks >= 1 become a NESTED GSELL plan over their
    # own compact row space (sorted by first column segment, so its banks
    # get tight windows and its own — usually smaller — nbank), whose
    # result is folded back by one scatter-add at ``vextra_rows``.
    vextra_rows: Optional[np.ndarray] = None    # int32[n_extras] row ids
    extras_plan: Optional["GsellPlan"] = None

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


def _split_hubs(a: CSRMatrix, col_thresh: Optional[int] = None,
                row_thresh: Optional[int] = None,
                max_dense_bytes: int = 64 << 20):
    """Strip hub columns/rows from a circuit-class matrix.

    Real circuit matrices (dc1, ASIC_320ks — replaces the scattered-class
    slot of ``mkl_sparse_?_mv``, test_spmv.c:168-180) are a local band plus
    a few power/ground/clock nets: dense COLUMNS (every row touches them at
    an arbitrary position, defeating window locality) and dense ROWS (one
    row touching everything, blowing the per-bank slot quota).  Split:

      * hub columns  -> dense (n, K) block; y += B @ x[colidx] on the MXU,
        streaming n*K*4 bytes — cheaper than per-entry gathers once a
        column exceeds ~n/5000 entries;
      * hub rows     -> spill COO; the row-gather side path is nearly free
        for wide rows (0.62 Grow/s regardless of width, PERF_NOTES.md);
      * the remaining local band packs into ordinary GSELL windows.

    Returns ``(core_csr, colidx, B, heavy_coo)`` or ``None`` when the
    matrix has no hub structure worth splitting.
    """
    n, m = a.shape
    nnz = a.nnz
    if nnz == 0:
        return None
    indptr = np.asarray(a.indptr).astype(np.int64)
    indices = np.asarray(a.indices)
    data = np.asarray(a.data, dtype=np.float64)
    mean = max(1.0, nnz / max(n, 1))
    if col_thresh is None:
        col_thresh = max(128, int(16 * mean))
    if row_thresh is None:
        row_thresh = max(256, int(32 * mean))
    coldeg = np.bincount(indices, minlength=m)
    hub_cols = np.flatnonzero(coldeg >= col_thresh)
    max_k = int(max_dense_bytes // max(4 * n, 1))
    if hub_cols.size > max_k:
        keep = np.argsort(-coldeg[hub_cols], kind="stable")[:max_k]
        hub_cols = np.sort(hub_cols[keep])
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    in_hub = (np.isin(indices, hub_cols) if hub_cols.size
              else np.zeros(nnz, dtype=bool))
    rowdeg_rem = np.bincount(rows[~in_hub], minlength=n)
    heavy_row = rowdeg_rem >= row_thresh
    heavy_ent = heavy_row[rows] & ~in_hub
    n_moved = int(in_hub.sum() + heavy_ent.sum())
    if n_moved < max(512, nnz // 200):
        return None
    K = hub_cols.size
    if K:
        B = np.zeros((n, K), dtype=np.float64)
        pos = np.searchsorted(hub_cols, indices[in_hub])
        B[rows[in_hub], pos] = data[in_hub]
        dense = (hub_cols.astype(np.int32), B)
    else:
        dense = None
    # heavy rows: densify up to the byte cap (fp32 MXU matvec; the df64
    # builder re-sparsifies), remainder stays COO spill
    heavy = None
    dense_rows = None
    hr = np.flatnonzero(heavy_row)
    max_h = int(max_dense_bytes // max(4 * m, 1))
    if hr.size > max_h:
        keep_h = np.argsort(-rowdeg_rem[hr], kind="stable")[:max_h]
        hr_dense = np.sort(hr[keep_h])
    else:
        hr_dense = hr
    if hr_dense.size:
        in_hd = np.isin(rows, hr_dense) & ~in_hub
        Br = np.zeros((hr_dense.size, m), dtype=np.float64)
        Br[np.searchsorted(hr_dense, rows[in_hd]), indices[in_hd]] = \
            data[in_hd]
        dense_rows = (hr_dense.astype(np.int32), Br)
        heavy_ent = heavy_ent & ~in_hd
    if heavy_ent.any():
        heavy = (rows[heavy_ent], indices[heavy_ent].astype(np.int64),
                 data[heavy_ent])
    keep_ent = ~in_hub & ~heavy_row[rows]
    counts = np.bincount(rows[keep_ent], minlength=n)
    core = CSRMatrix((n, m), np.r_[0, np.cumsum(counts)].astype(np.int64),
                     indices[keep_ent], data[keep_ent])
    return core, dense, heavy, dense_rows


def _merge_coo(x, y):
    if x is None:
        return y
    if y is None:
        return x
    return tuple(np.concatenate([a, b]) for a, b in zip(x, y))


def build_gsell(a: CSRMatrix, nbank: Optional[int] = None,
                quota: Optional[int] = None,
                wide: Optional[bool] = None,
                split_hubs: Optional[bool] = None,
                col_thresh: Optional[int] = None,
                row_thresh: Optional[int] = None) -> GsellPlan:
    """Pack a CSR matrix into the GSELL layout (natural row order).

    ``split_hubs``: strip dense hub columns/rows first (see
    :func:`_split_hubs`).  ``None`` = automatic — tried when no window
    config covers the structure within the spill budget (circuit class).
    """
    if split_hubs or (split_hubs is None and nbank is None and wide is None):
        sp = _split_hubs(a, col_thresh, row_thresh)
        if sp is not None:
            core, dense, heavy, dense_rows = sp
            plan = build_gsell(core, nbank, quota, wide, split_hubs=False)
            return dataclasses.replace(
                plan, nnz=a.nnz, dense_cols=dense, dense_rows=dense_rows,
                spill_coo=_merge_coo(plan.spill_coo, heavy))
    n, m = a.shape
    indptr = np.asarray(a.indptr).astype(np.int64)
    indices = np.asarray(a.indices)
    data = np.asarray(a.data, dtype=np.float64)

    # virtual-row split (see GsellPlan.vextra_rows): contiguous chunks keep
    # each virtual row's columns as local as the original row's
    deg = np.diff(indptr)
    vextra_rows = None
    extras_csr = None
    if deg.size and int(deg.max()) > VROW_MAX:
        vparts = np.maximum(1, -(-deg // VROW_MAX)).astype(np.int64)
        nextra_per = vparts - 1
        nextra = int(nextra_per.sum())
        rows_orig = np.repeat(np.arange(n, dtype=np.int64), deg)
        within = np.arange(indices.size, dtype=np.int64) - indptr[rows_orig]
        is0 = within < VROW_MAX
        len0 = np.minimum(deg, VROW_MAX)
        ex_row_rc = np.repeat(np.arange(n, dtype=np.int64), nextra_per)
        estart = np.r_[0, np.cumsum(nextra_per)]
        k_in = np.arange(nextra, dtype=np.int64) - estart[ex_row_rc] + 1
        elen_rc = np.minimum(deg[ex_row_rc] - k_in * VROW_MAX, VROW_MAX)
        qmin_e = indices[indptr[ex_row_rc] + k_in * VROW_MAX] \
            .astype(np.int64) // 128
        sortord = np.lexsort((ex_row_rc, qmin_e))
        ex_row = ex_row_rc[sortord]
        elen = elen_rc[sortord]
        # extras entry stream in sorted-extra order: gather each (row,
        # chunk) block contiguously
        tail_pos = np.flatnonzero(~is0)
        bstart_rc = np.r_[0, np.cumsum(elen_rc)[:-1]]
        span = np.repeat(bstart_rc[sortord], elen)
        ranges = np.arange(tail_pos.size, dtype=np.int64) - np.repeat(
            np.r_[0, np.cumsum(elen)[:-1]], elen)
        tail_order = tail_pos[span + ranges]
        extras_csr = CSRMatrix((nextra, m), np.r_[0, np.cumsum(elen)],
                               indices[tail_order], data[tail_order])
        vextra_rows = ex_row.astype(np.int32)
        keep0 = np.flatnonzero(is0)
        indices = indices[keep0]
        data = data[keep0]
        indptr = np.r_[0, np.cumsum(len0)]

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
        # small nbank values serve small/row-sparse matrices (e.g. the
        # nested extras plan): fewer banks per group = tighter windows
        for cand_nb, cand_wide in ((64, False), (32, False), (16, False),
                                   (64, True), (32, True), (16, True),
                                   (8, False), (8, True), (4, False),
                                   (4, True), (2, False), (2, True),
                                   (1, False), (1, True)):
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
    # cap the group block so VMEM tiles stay within scoped limits (~6 B per
    # slot-lane, double-buffered): degenerate packs (hub rows without the
    # split) would otherwise demand multi-MB blocks and fail to compile
    cs = min(cs, 2048)
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
    if packed < indices.size:
        bad = ~ok
        spill = (rows[bad].astype(np.int64), indices[bad].astype(np.int64),
                 data[bad])
    extras_plan = None
    if extras_csr is not None:
        extras_plan = build_gsell(extras_csr, split_hubs=False)
    return GsellPlan(shape=(n, m), nnz=a.nnz, nbank=nbank, quota=quota,
                     cs=cs, nseg_pad=nseg_pad, wstart=wstart, seg=seg,
                     lane=lane, val=val, spill_coo=spill, packed_nnz=packed,
                     wide=bool(wide), vextra_rows=vextra_rows,
                     extras_plan=extras_plan)


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
    dense_cols: Optional[Tuple[jax.Array, jax.Array]] = None  # (idx[K], Bt[K,n])
    dense_rows: Optional[Tuple[jax.Array, jax.Array]] = None  # (ids[H], Br[H,m])
    vextra: Optional[jax.Array] = None      # int32[n_extras] target rows
    extras: Optional["DeviceGsell"] = None  # nested plan for row tails

    def tree_flatten(self):
        return ((self.wstart, self.seg, self.lane, self.val, self.spill,
                 self.dense_cols, self.dense_rows, self.vextra, self.extras),
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
        # Side-path choice by measured-constant cost model: per-entry
        # gather+scatter (0.15 Gelem/s) vs RG-ELL row gathers (0.62 Grow/s,
        # width nearly free) — hub-row spills are few-but-wide, where
        # RG-ELL wins even at small counts.
        rg_slots = np.unique(r * np.int64(1 << 34) + c // 8).size
        t_tiny = 5e-6 + r.size / SCATTER_ELEMS_PER_S
        t_rg = 2e-5 + rg_slots / SPILL_RG_SLOTS_PER_S
        if r.size <= 16384 and t_tiny <= t_rg:
            spill = (jnp.asarray(r.astype(np.int32)),
                     jnp.asarray(c.astype(np.int32)),
                     jnp.asarray(v.astype(np.float32)))
        else:
            # compact to the rows that actually spill: RG-ELL pads EVERY
            # row to >=1 slot, so building it over the full row space
            # turned a 1.6k-row spill into a 117k-row kernel (measured
            # 239 ms on dc1) — row-gather over the compacted rows + one
            # unique-index scatter back is ~1000x cheaper
            from ..formats import COOMatrix, coo_to_csr
            from . import rgell as _rgell
            ur, rinv = np.unique(r, return_inverse=True)
            csr = coo_to_csr(COOMatrix((ur.size, plan.shape[1]),
                                       rinv.astype(np.int32),
                                       c.astype(np.int32), v))
            spill = (jnp.asarray(ur.astype(np.int32)),
                     _rgell.rgell_to_device(csr, policy))
    dt = jnp.bfloat16 if policy.dtype == jnp.bfloat16 else jnp.float32
    dense = None
    if plan.dense_cols is not None:
        ci, B = plan.dense_cols
        # transposed (K, n) layout: K pads to the sublane granularity (~8)
        # instead of the 128-lane tile, and the matvec contracts over K on
        # the MXU — n*Kpad*4 B streamed
        dense = (jnp.asarray(ci), jnp.asarray(B.T.astype(np.float32), dt))
    return DeviceGsell(
        shape_=plan.shape, nnz_=plan.nnz, nbank=plan.nbank, quota=plan.quota,
        cs=plan.cs, nseg_pad=plan.nseg_pad, policy_name=policy.name,
        wide=plan.wide,
        wstart=jnp.asarray(plan.wstart),
        seg=jnp.asarray(plan.seg),
        lane=jnp.asarray(plan.lane),
        val=jnp.asarray(plan.val.astype(np.float32), dt),
        spill=spill,
        dense_cols=dense,
        dense_rows=(None if plan.dense_rows is None else
                    (jnp.asarray(plan.dense_rows[0]),
                     jnp.asarray(plan.dense_rows[1].astype(np.float32), dt))),
        vextra=(None if plan.vextra_rows is None
                else jnp.asarray(plan.vextra_rows)),
        extras=(None if plan.extras_plan is None
                else gsell_to_device(plan.extras_plan, policy)),
    )


def _gsell_kernel(cs: int, nbank: int, quota: int, wide: bool):
    ns = cs // 128
    ob = nbank if nbank % 8 == 0 else 8 * (-(-nbank // 8))
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
        res = jnp.sum(contrib.reshape(nbank, quota, 128), axis=1)
        if ob != nbank:
            # TPU block sublane dim must be a multiple of 8: pad small
            # nbank (nested extras plans) with zero rows
            res = jnp.concatenate(
                [res, jnp.zeros((ob - nbank, 128), jnp.float32)], axis=0)
        o_ref[:] = res

    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_gsell_core(dev: DeviceGsell, x: jax.Array,
                     interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, m = dev.shape_
    G = dev.wstart.shape[0]
    cs, nbank, quota = dev.cs, dev.nbank, dev.quota
    ob = nbank if nbank % 8 == 0 else 8 * (-(-nbank // 8))
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
        out_specs=pl.BlockSpec((ob, 128), lambda g, ws: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _gsell_kernel(cs, nbank, quota, dev.wide),
        out_shape=jax.ShapeDtypeStruct((G * ob, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dev.wstart, *win_args, dev.seg, dev.lane, dev.val)
    if ob != nbank:
        out = out.reshape(G, ob, 128)[:, :nbank, :]
    y = out.reshape(-1)[:n]
    if dev.extras is not None:
        # virtual-row split: chunk-0 partials are already row-aligned; the
        # nested extras plan computes the row tails, folded back with one
        # scatter-add
        ye = _spmv_gsell_core(dev.extras, x, interpret=interpret)
        y = y.at[dev.vextra].add(ye)
    if isinstance(dev.spill, tuple) and len(dev.spill) == 3:
        # tiny spill: 1-elem gather + scatter-add.  An 8-wide-row staging
        # variant (row gathers + row scatter-add) measured WORSE on chip
        # (round 3: ~23 us vs ~8.5 us for ~400 spills) — XLA's row
        # scatter-add with duplicate indices is slower than the 1-elem path.
        r, c, v = dev.spill
        y = y.at[r].add(v * jnp.take(x.astype(jnp.float32), c))
    elif isinstance(dev.spill, tuple):
        # compacted RG-ELL spill: row-gather SpMV over just the spilling
        # rows, scattered back at their original indices (unique, so .add
        # is one pass)
        ur, rg = dev.spill
        from . import rgell as _rgell
        y = y.at[ur].add(_rgell.rgell_spmv(rg, x).astype(jnp.float32))
    elif dev.spill is not None:
        from . import rgell as _rgell
        y = y + _rgell.rgell_spmv(dev.spill, x)
    if dev.dense_cols is not None:
        # hub columns: K gathered x entries drive a dense (Kpad, n)^T
        # matvec on the MXU/HBM stream — circuit-class split, _split_hubs
        ci, Bt = dev.dense_cols
        xh = jnp.take(x.astype(jnp.float32), ci)
        y = y + xh @ Bt.astype(jnp.float32)
    if dev.dense_rows is not None:
        # hub rows: dense (H, m) @ x matvec, scattered to the H row slots
        ri, Br = dev.dense_rows
        y = y.at[ri].add(Br.astype(jnp.float32) @ x.astype(jnp.float32))
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
        r, c, _ = plan.spill_coo
        rg_slots = np.unique(r.astype(np.int64) * np.int64(1 << 34)
                             + c.astype(np.int64) // 8).size
        t_rg = 2e-5 + rg_slots / SPILL_RG_SLOTS_PER_S
        t_tiny = 5e-6 + r.size / SCATTER_ELEMS_PER_S
        t += min(t_rg, t_tiny) if r.size <= 16384 else t_rg
    if plan.dense_cols is not None:
        K = plan.dense_cols[0].size
        t += 5e-6 + plan.shape[0] * K * 4 / STREAM_BPS + K / 0.15e9
    if plan.dense_rows is not None:
        H = plan.dense_rows[0].size
        t += 5e-6 + H * plan.shape[1] * 4 / STREAM_BPS
    if plan.extras_plan is not None:
        t += estimate_gsell(plan.extras_plan) \
            + plan.vextra_rows.size / SCATTER_ELEMS_PER_S
    return t
