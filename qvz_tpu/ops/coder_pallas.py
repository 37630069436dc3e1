"""Mosaic (Pallas) kernel for the lane-parallel QVZ2 entropy coder.

Why a kernel: the XLA lax.scan formulation executes ~80 separate HLO
ops per coding step, and on TPU each op in a scan body pays fixed
dispatch/VMEM-roundtrip overhead — measured 23-30 us per step at
W=1024 REGARDLESS of S (the masked-sum width), i.e. op-overhead-bound
(12.9 Msym/s end-to-end, BENCH r3 probes). Inside one Pallas kernel
the same per-step body is VPU register ops on (8, 128) tiles, the
occurrence-count table lives in VMEM scratch across the whole shard,
and the per-step streams grid-pipeline from HBM in (BS, W8, 128)
blocks.

The kernel consumes the RAW quantize outputs (mid, qs): every model-
replay quantity is derived in-kernel from one packed per-slot column
table (see _kernel3) — an earlier design precomputed six per-step
streams with XLA 1-D table gathers, measured at 2.6 s per 52M symbols
on a v5e (pathological on TPU).

Round-5 relayout (vpu_microbench-driven): int32 VPU tiles are (8, 128);
the round-3/4 kernel swept (sc, W8, 128) chunks whose second-minor axis
is W8 = 4 at the production W=512 — HALF-padded tiles. The measured
cost (build/vpu_microbench.json, v5e): the identical op mix runs 64.2
Gelem/s on (.., 4, 128) vs 99.6 on full (.., 8, 128) tiles, and the
masked-sum multiplies lose ~17% vs selects (mix 99.6 -> sel 117).
The same microbench pinned the regime: ~1 VMEM-operand vector op per
cycle (7.3 Top/s register-resident vs ~1.05 for the table sweep, and
a 4-step-per-load batch gains nothing), so ops-per-swept-element and
elements-swept are the ONLY levers. This kernel therefore:

  * packs F = 8 // W8 slot rows into the 8 sublanes of each tile —
    slot s lives at row s // F, sublane (s % F) * W8 + lane-group —
    so every sweep op runs on full tiles at any lane width;
  * applies masks with jnp.where instead of integer multiplies;
  * DMAs the per-column tables PRE-PACKED from HBM straight into the
    VMEM counts/key scratch (the packing is a static XLA-side
    broadcast; the old per-plane in-kernel wide fill is gone, and the
    column reset is one in-place << 12 after the DMA);
  * bounds each block's sweep from BELOW as well as above:
    [slot_base(min mid) , sbc(max mid)) — both ends exact because a
    slot outside that range matches no lane's owner compare.

Bit-exactness: the per-step interval/renorm/emission body is the SAME
jnp code as the XLA fallback (coder_device._coder_step — imported,
not re-derived); tests assert byte-equality of the produced
containers against the host coder (reference semantics:
src/arith.c:24-96, src/qv_stream.c:9-61).

Measured negative results on this Mosaic toolchain (kept so they are
not retried blindly): reductions over int16 and over unsigned ints
are NYI (hence the int32 combo-field design); uint32<->float32 casts
are NYI (coder_device._exact_div routes through int32); middle-axis
(sublane) broadcasts of 3-D arrays scalarize (hence pre-packed table
DMA; the per-step (W8,128)->(8,128) packing uses pltpu.repeat, a
native block-tile); step-loop unrolling measured neutral to negative;
and an UNJITTED wrapper's eager pads cost ~70 us of apparent per-step
time on the remote-attached backend (three kernel rewrites chased
phantom costs before the wrapper was jitted whole).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qvz_tpu.ops.coder_device import ARITH_R, FULL, STEP, _coder_step

_I32 = jnp.int32
_U32 = jnp.uint32

_LANE = 128
_BS = 64               # coding steps per grid block
_SC = 384              # slot-axis chunk (IN SLOTS) per masked-sum pass


def _geom(W: int, S: int, bstep: int = 1, m_pad: int = 0):
    """Packed-layout geometry: (w_pad, w8, F, sub, rows_pad, sc_rows,
    m_rows). F slot rows share each tile's 8 sublanes; chunk sizes are
    byte-calibrated to the round-4 VMEM measurements (the scoped-vmem
    stack overflow at bstep=4/sc=384 slots, coder_pallas r4)."""
    w_pad = -(-W // _LANE) * _LANE
    w8 = w_pad // _LANE
    F = max(1, 8 // w8)
    sub = max(8, F * w8)
    rows = -(-S // F)
    sc_slots_cap = max(_LANE, (2 * _SC // max(bstep, 2)) // _LANE * _LANE)
    sc_slots = min(min(_SC, sc_slots_cap), -(-S // _LANE) * _LANE)
    sc_env = os.environ.get("QVZ_TPU_CODER_SC")
    if sc_env:                 # tuning knob: chunk size in SLOTS
        sc_slots = min(int(sc_env), -(-S // _LANE) * _LANE)
    sc = max(8, sc_slots // F)
    rows_pad = -(-rows // sc) * sc
    m_rows = -(-m_pad // F) if m_pad else 0
    return w_pad, w8, F, sub, rows_pad, sc, m_rows


def fits(W: int, S: int, bstep: int = 1, m_pad: int = 0) -> bool:
    """True when the kernel's whole VMEM working set — packed counts +
    key tables, per-chunk masked-sum temporaries, double-buffered
    stream/output blocks — fits the ~16 MB core VMEM with headroom.
    The temp-term multiplier carries over from the round-4 calibration
    (measured 16.94 MB compile at the W=1024 shape and a 17.96 MB
    scoped-vmem overflow at bstep=4/sc=384 slots); packed chunk bytes
    equal the old slot-chunk bytes by construction."""
    w_pad, w8, F, sub, rows_pad, sc, m_rows = _geom(W, S, bstep, m_pad)
    plane = sub * _LANE * 4
    counts = rows_pad * plane
    key_wide = rows_pad * plane
    temps = (5 + 2 * max(0, bstep - 2)) * sc * plane
    streams = (5 + 3) * _BS * w_pad * 4 * 2
    tot = counts + key_wide + temps + streams
    if m_rows:
        tot += 2 * m_rows * plane            # totals + wide key table
        tot += (bstep + 2) * m_rows * plane  # totals-pass temps
    return tot <= 13 * 2 ** 20


def use_totals() -> bool:
    """Totals side-table variant (QVZ_TPU_CODER_TOTALS, default on):
    the per-step model total comes from a dedicated (models, lanes)
    table swept in one short pass, removing the `owner` mask +
    select from the S-slot sweep (~25% of the kernel's per-symbol VPU
    ops — the binding resource per the measured issue regime). Round-4
    measured +27% on the v5e (scan 90.2 -> 114.7 Msym/s at W=512/b=4,
    byte-parity asserted in-probe). 0 falls back to the owner-sweep
    form."""
    return os.environ.get("QVZ_TPU_CODER_TOTALS", "1") == "1"


def use_sblow() -> bool:
    """Per-block slot LOWER bound (QVZ_TPU_CODER_SBLOW, default on
    when the caller supplies the slot_base table): chunks below
    slot_base(min mid in block) match no lane's owner compare and are
    skipped exactly, the symmetric twin of the sbc(max mid) upper
    bound. 0 disables (perf bisection)."""
    return os.environ.get("QVZ_TPU_CODER_SBLOW", "1") == "1"


def lane_group(W: int, S: int, bstep: int | None = None,
               m_pad: int = 0) -> int:
    """Largest lane-group width (multiple of 128) that fits VMEM;
    0 if even 128 lanes do not fit. Lanes are independent streams, so
    callers may run the kernel per group with identical results."""
    if bstep is None:
        bstep = batch_steps()
    w = -(-W // _LANE) * _LANE
    while w >= _LANE:
        if fits(w, S, bstep, m_pad):
            return w
        w //= 2
    return 0


def _kernel3(shigh_ref, slow_ref, colmap_ref,
             mid_ref, qs_ref, etl_ref, eth_ref, etn_ref,
             kq_ref, icc_ref, *rest, bs,
             rows_pad, sc, bstep, F, w8, sub, m_rows=0):
    if m_rows:
        (tmk_ref, tin_ref, state0_ref,
         w0_ref, w1_ref, fl_ref, st_ref,
         counts_ref, state_ref, kqw_ref,
         totals_ref, tmkw_ref, dma_sem) = rest
    else:
        (state0_ref,
         w0_ref, w1_ref, fl_ref, st_ref,
         counts_ref, state_ref, kqw_ref, dma_sem) = rest
    """v3 (packed full-tile layout): NO precomputed per-step streams
    beyond the quantize outputs.

    Every model-replay quantity is derived inside the chunk loop from
    the pre-packed per-slot column tables compared against the raw
    (mid, qs) streams tiled to packed planes:
        d      = kq_packed - (mid << 7) tiled      (owner-relative key)
        below  = d u< qs   (slots strictly below ours, same model)
        eq     = d == qs
    and the coder inputs are paired range sums of the combo counts
    table over those masks, applied as selects (mask-multiply measured
    17% slower, vpu_microbench codermix vs codermix_sel)."""
    i = pl.program_id(0)
    shape = mid_ref.shape[1:]           # (w8, 128)

    col = colmap_ref[i]
    first = i == 0

    # Once per COLUMN: DMA the column's pre-packed tables from HBM —
    # the key table into its wide scratch, the init-count table
    # straight into the counts table (reset merged: column starts are
    # exactly the colmap changes, both block-aligned by construction),
    # then shift init counts into the combo word's high field in place.
    @pl.when(first | (col != colmap_ref[jnp.maximum(i - 1, 0)]))
    def _():
        srcs = [(kq_ref, kqw_ref), (icc_ref, counts_ref)]
        if m_rows:
            srcs += [(tmk_ref, tmkw_ref), (tin_ref, totals_ref)]
        for k, (src, dst) in enumerate(srcs):
            pltpu.make_async_copy(src.at[col], dst, dma_sem.at[k]).start()
        for k, (src, dst) in enumerate(srcs):
            pltpu.make_async_copy(src.at[col], dst, dma_sem.at[k]).wait()
        counts_ref[...] = counts_ref[...] << 12
        if m_rows:
            totals_ref[...] = totals_ref[...] << 12

    # combo counts table: init counts in the high 20 bits (their
    # masked sums stay < 2^20: model totals are capped at r + 8), live
    # occurrence counts in the low 12 (lane run <= 2047 enforced by
    # the caller; sums stay < 2^12 — the fields cannot carry). int32
    # throughout (Mosaic has no unsigned reductions); adds are
    # bit-exact mod 2^32 and fields extract with logical shifts.

    def init_carry():
        return tuple(state0_ref[k] for k in range(6))

    def load_carry():
        return tuple(state_ref[k] for k in range(6))

    carry0 = jax.lax.cond(i == 0, init_carry, load_carry)

    def ptile(a):
        """(w8, 128) -> (sub, 128): F block-replicas over sublanes
        (pltpu.repeat is a native tile op; the round-3 scalarization
        negative result was for 3-D middle-axis broadcasts)."""
        t = pltpu.repeat(a, F, axis=0) if F > 1 else a
        if t.shape[0] < sub:                  # w8 == 3-style geometry
            t = jnp.concatenate(
                [t, jnp.zeros((sub - t.shape[0], _LANE), t.dtype)],
                axis=0)
        return t

    def fold(a):
        """(sub, 128) packed accumulator -> (w8, 128) per-lane sums."""
        r = a[0:w8]
        for f in range(1, F):
            r = r + a[f * w8:(f + 1) * w8]
        return r

    # B coding steps share each pass over the counts table: all B
    # masked sums read the PRE-batch table, then step k's sums are
    # corrected by exact integer pair terms — one occurrence for every
    # earlier step j<k in the batch that hit the same model with a
    # lower/equal symbol in the same lane. Corrections land in the
    # combo word's low 12-bit occurrence field, whose <= 2047 bound is
    # the true occurrence count and therefore unchanged. Batches never
    # straddle a column (B divides _BS and column segments are
    # _BS-aligned), so the per-column table reset stays per-block.
    B = bstep

    def batch(tb, carry):
        t0 = tb * B
        mids = [mid_ref[t0 + k] for k in range(B)]
        qss = [qs_ref[t0 + k] for k in range(B)]
        lives = [m > 0 for m in mids]
        m128p = [ptile(m << 7) for m in mids]     # packed key bases
        qsp = [ptile(q) for q in qss]
        qspu = [q.astype(_U32) for q in qsp]
        zp = jnp.zeros((sub, _LANE), _I32)
        na = 2 if m_rows else 3            # accumulators per batch step

        lb0 = slow_ref[i]                  # chunk-aligned packed row
        nch = jnp.maximum(shigh_ref[i] - lb0 + sc - 1, 0) // sc

        def chunk(ci, acc):
            c0 = lb0 + ci * sc
            c = counts_ref[pl.ds(c0, sc)]               # (sc, sub, 128)
            kw = kqw_ref[pl.ds(c0, sc)]
            zc = jnp.zeros_like(c)
            out = []
            upd = None
            for k in range(B):
                d = kw - m128p[k][None]
                # (d >= 0) & (d < qs) as ONE unsigned compare: negative
                # deltas (pads, lower models) wrap above 2^31, far over
                # qs <= 127 — provably identical, one VPU op cheaper
                below = d.astype(_U32) < qspu[k][None]
                eq = d == qsp[k][None]
                out.append(acc[na * k]
                           + jnp.sum(jnp.where(below, c, zc), axis=0))
                if not m_rows:
                    # model total from the owner-masked slot sweep;
                    # the totals variant reads it off the side table
                    owner = d.astype(_U32) < jnp.uint32(128)
                    out.append(acc[na * k + 1]
                               + jnp.sum(jnp.where(owner, c, zc),
                                         axis=0))
                out.append(acc[na * k + na - 1]
                           + jnp.sum(jnp.where(eq, c, zc), axis=0))
                # no live-guard needed on the update: every real table
                # key is mid*128 + qs >= 128 (model ids start at 1,
                # LanePlan) and pads carry -1, while a dead step/lane
                # (mid = 0) compares d = kw - 0 against qs <= 127 —
                # eq and below are identically false there, so the
                # masks themselves exclude dead steps exactly
                e = eq.astype(_I32)
                upd = e if upd is None else upd + e
            counts_ref[pl.ds(c0, sc)] = c + upd
            return tuple(out)

        acc = jax.lax.fori_loop(0, nch, chunk, ((zp,) * (na * B)))
        accf = [fold(a) for a in acc]

        if m_rows:
            # ONE short pass over the packed (m_rows, sub, 128) totals
            # table replaces B owner sweeps over the slot table: rows
            # match by model-id key exactly like the slot table, and
            # all B steps share the read + the eq-update write-back.
            midp = [m >> 7 for m in m128p]
            tw = totals_ref[:]
            kwm = tmkw_ref[:]
            zt = jnp.zeros_like(tw)
            tots = []
            tupd = None
            for k in range(B):
                eqm = kwm == midp[k][None]
                tots.append(fold(jnp.sum(jnp.where(eqm, tw, zt),
                                         axis=0)))
                # dead steps have midp = 0, real model keys are >= 1,
                # pads are -1: eqm is identically false — no guard
                e = eqm.astype(_I32)
                tupd = e if tupd is None else tupd + e
            totals_ref[:] = tw + tupd

        l, u, s3, buf, cnt, of = carry
        mask12 = jnp.int32(0xFFF)
        for k in range(B):
            if m_rows:
                a_lo, a_eq = accf[2 * k: 2 * k + 2]
                a_tot = tots[k]
            else:
                a_lo, a_tot, a_eq = accf[3 * k: 3 * k + 3]
            for j in range(k):
                samem = lives[k] & (mids[j] == mids[k])
                a_tot = a_tot + samem.astype(_I32)
                a_lo = a_lo + (samem
                               & (qss[j] < qss[k])).astype(_I32)
                a_eq = a_eq + (samem
                               & (qss[j] == qss[k])).astype(_I32)
            live, t = lives[k], t0 + k
            s_lo = a_lo & mask12
            b_lo = jax.lax.shift_right_logical(a_lo, jnp.int32(12))
            prior = a_eq & mask12
            i_at = jax.lax.shift_right_logical(a_eq, jnp.int32(12))
            s_tot = a_tot & mask12
            n_i = jax.lax.shift_right_logical(a_tot, jnp.int32(12))

            cum_lo = b_lo + STEP * s_lo
            cum_hi = cum_lo + i_at + STEP * prior
            total = n_i + STEP * s_tot
            # card-1 models take the coder's exact no-op edge paths
            # whatever their total (cum_lo == 0, cum_hi == total, init
            # counts are never 0, so the conjunction identifies them
            # exactly) — their rescales must not flag the lane (mirrors
            # the XLA path's no-op normalization).
            card1 = (cum_lo == 0) & (cum_hi == total)
            of = of | (live & ~card1
                       & (total + STEP
                          > ARITH_R.astype(_I32))).astype(_U32)
            clo = jnp.where(live, cum_lo.astype(_U32), etl_ref[t])
            chi = jnp.where(live, cum_hi.astype(_U32), eth_ref[t])
            n = jnp.where(live, total.astype(_U32), etn_ref[t])

            zof = jnp.zeros(shape, bool)
            (l, u, s3i, buf, cnti, of2), (w0, w1, f0, f1) = _coder_step(
                (l, u, s3.astype(_I32), buf, cnt.astype(_I32), zof),
                (clo, chi, n))
            w0_ref[t] = w0
            w1_ref[t] = w1
            fl_ref[t] = f0.astype(_I32) + 2 * f1.astype(_I32)
            s3, cnt = s3i.astype(_U32), cnti.astype(_U32)
            of = of | of2.astype(_U32)
        return (l, u, s3, buf, cnt, of)

    l, u, s3, buf, cnt, of = jax.lax.fori_loop(0, bs // B, batch, carry0)
    for k, v in enumerate((l, u, s3, buf, cnt, of)):
        state_ref[k] = v
        st_ref[k] = v


def batch_steps() -> int:
    """Coding steps sharing one counts-table pass (QVZ_TPU_CODER_BATCH).
    Default 2 since the round-5 packed relayout: the clean v5e sweep
    (build/onchip_perf.json, byte-parity asserted per leg, quiet host)
    measured b=1 231.7 / b=2 251.2 / b=4 216.8 / b=8 213.2 Msym/s —
    one shared chunk load still helps at B=2 (a single O(1) pair-
    correction term) while larger batches lose to the O(B^2)
    corrections and extra live temporaries; round 4's b=4 default was
    an artifact of the half-padded tile layout."""
    b = int(os.environ.get("QVZ_TPU_CODER_BATCH", "2"))
    if b < 1 or _BS % b:
        raise ValueError(f"QVZ_TPU_CODER_BATCH must divide {_BS}: {b}")
    return b


def fused_scan_tables(streams, tables, W, S, L, interpret=False,
                      bstep=1, carry0=None, col0=0, ncols=None):
    """v3 entry: code T = seg_pre + cols*L steps directly from the
    quantize outputs — no per-step precompute streams. Jitted whole:
    the eager pads/reshapes around the kernel each paid a full
    dispatch round-trip on remote-attached devices (measured ~70 us
    PER CODING STEP of apparent kernel time that was actually ~20
    eager dispatches per call); the block->column map is built from
    static shape arithmetic only.

    streams: (mid, qs, etl, eth, etn, reset) with (T, W) layouts; mid
    is the GLOBAL model id per step (0 or negative = explicit-triple
    step: cluster-id segment, padding); qs the symbol index. (reset is
    accepted for API stability; v3 derives every column reset from the
    static block->column map, which the stream layout matches by
    construction.) tables: (kq, icc, sbc_of_mid[, tmk, tin[, sb_of_mid
    ]]) from LanePlan — the 5-tuple enables the totals side-table
    variant when QVZ_TPU_CODER_TOTALS=1 (see use_totals); the 6-tuple
    adds the slot_base table enabling the per-block lower sweep bound
    (use_sblow). L: steps per column segment (must divide into _BS
    blocks; the optional leading cluster segment is L steps too).

    carry0/col0/ncols enable COLUMN-CHUNKED calls whose d2h payload
    fetches overlap later chunks' kernels (coder_device pipelining):
    carry0 is the previous call's carry (6-tuple, None = canonical
    init), col0 the first GLOBAL column this call codes (traced — one
    executable serves every same-shape chunk), ncols the number of
    column segments in these streams (static; None = all of kq).
    Chunks must start at column boundaries: the counts table resets
    there, so only the 6-word interval state crosses the cut.

    Returns the same (carry, ys) contract as the XLA scan's [:6]."""
    if use_totals() and len(tables) >= 5 and tables[3] is not None:
        ttabs = (tables[3], tables[4])
        m_pad = int(tables[3].shape[1])
    else:
        ttabs, m_pad = None, 0
    sb_tab = tables[5] if len(tables) >= 6 and use_sblow() else None
    return _fst_impl(streams, tuple(tables[:3]), ttabs, sb_tab, carry0,
                     jnp.asarray(col0, _I32), W, S, L,
                     interpret, bstep, m_pad, ncols)


@partial(jax.jit, static_argnames=("W", "S", "L", "interpret", "bstep",
                                   "m_pad", "ncols"))
def _fst_impl(streams, tables, ttabs, sb_tab, carry0, col0, W, S, L,
              interpret=False, bstep=1, m_pad=0, ncols=None):
    mid, qs, etl, eth, etn, reset = streams
    kq, icc, sbc_of_mid = tables
    T = mid.shape[0]
    cols = kq.shape[0]
    ncseg = cols if ncols is None else ncols
    assert L % _BS == 0, "column segment must align to kernel blocks"
    assert L <= 2047, "combo occurrence field is 12 bits (lane run cap)"
    w_pad, w8, F, sub, rows_pad, sc, m_rows = _geom(W, S, bstep, m_pad)
    t_pad = -(-T // _BS) * _BS

    def pad(a, fill):
        a = jnp.pad(a, ((0, t_pad - T), (0, w_pad - W)),
                    constant_values=fill)
        return a.reshape(t_pad, w_pad // _LANE, _LANE)

    ins = (pad(mid, 0), pad(qs, 0), pad(etl, 0), pad(eth, 1),
           pad(etn, 1))

    # block -> column map (host-static layout: leading explicit segment
    # of T - ncseg*L steps, then ncseg segments of L; col0 shifts to
    # global column ids — traced, so same-shape chunks share the
    # executable)
    nblocks = t_pad // _BS
    seg_pre = T - ncseg * L
    blk_col = np.maximum(
        (np.arange(nblocks) * _BS - seg_pre) // L, 0)
    blk_col = np.minimum(blk_col, ncseg - 1).astype(np.int32)
    colmap = jnp.asarray(blk_col) + col0
    # tight per-block slot bounds, both converted to PACKED rows:
    # upper = ceil(sbc(max mid) / F) — slot_base+card is monotone in
    # the model id within a column; lower = slot_base(min live mid),
    # floored to a chunk-aligned packed row (slots outside the range
    # match no owner compare, so skipping them is exact)
    midp = jnp.pad(jnp.asarray(mid, _I32),
                   ((0, t_pad - T), (0, 0)))
    midb = midp.reshape(nblocks, -1)
    maxmid = jnp.max(midb, axis=1)
    g_sbc = jnp.asarray(sbc_of_mid, _I32)
    sb_hi = jnp.where(
        maxmid > 0,
        jnp.take(g_sbc, jnp.clip(maxmid, 0, g_sbc.shape[0] - 1)), 0)
    shigh = -(-sb_hi // F)
    if sb_tab is not None:
        g_sb = jnp.asarray(sb_tab, _I32)
        minmid = jnp.min(jnp.where(midb > 0, midb, jnp.int32(1 << 30)),
                         axis=1)
        sb_lo = jnp.where(
            maxmid > 0,
            jnp.take(g_sb, jnp.clip(minmid, 0, g_sb.shape[0] - 1)), 0)
        slow = (sb_lo // F) // sc * sc
    else:
        slow = jnp.zeros_like(shigh)
    if os.environ.get("QVZ_TPU_CODER_SBOUND0"):   # perf bisection knob
        shigh = jnp.zeros_like(shigh)
        slow = jnp.zeros_like(slow)

    def padtab(a, fill):
        """(cols, S) slot table -> (cols, rows_pad, sub, 128) packed:
        slot s at [s // F, (s % F) * w8 + wg, lane], replicated across
        the lane grid — a static XLA broadcast, DMA'd per column."""
        a = jnp.asarray(a, _I32)
        a = jnp.pad(a, ((0, 0), (0, rows_pad * F - a.shape[1])),
                    constant_values=fill)
        a = a.reshape(cols, rows_pad, F, 1, 1)
        a = jnp.broadcast_to(a, (cols, rows_pad, F, w8, _LANE))
        a = a.reshape(cols, rows_pad, F * w8, _LANE)
        if F * w8 < sub:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, sub - F * w8), (0, 0)),
                        constant_values=fill)
        return a

    kq_p = padtab(kq, -1)
    icc_p = padtab(icc, 0)
    ttabs_p = ()
    if m_rows:
        def padm(a, fill):
            a = jnp.asarray(a, _I32)
            a = jnp.pad(a, ((0, 0), (0, m_rows * F - a.shape[1])),
                        constant_values=fill)
            a = a.reshape(cols, m_rows, F, 1, 1)
            a = jnp.broadcast_to(a, (cols, m_rows, F, w8, _LANE))
            a = a.reshape(cols, m_rows, F * w8, _LANE)
            if F * w8 < sub:
                a = jnp.pad(a, ((0, 0), (0, 0), (0, sub - F * w8),
                                (0, 0)), constant_values=fill)
            return a

        ttabs_p = (padm(ttabs[0], -1), padm(ttabs[1], 0))

    w8n = w_pad // _LANE
    # initial interval state (block 0 loads this instead of constants;
    # pad lanes get the canonical init — their outputs are discarded)
    if carry0 is None:
        z = jnp.zeros((w8n, _LANE), _U32)
        state0 = jnp.stack([z, jnp.full((w8n, _LANE), FULL, _U32),
                            z, z, z, z])
    else:
        fills = (0, int(FULL), 0, 0, 0, 0)
        state0 = jnp.stack([
            jnp.pad(jnp.asarray(a).astype(_U32), (0, w_pad - W),
                    constant_values=np.uint32(f)).reshape(w8n, _LANE)
            for a, f in zip(carry0, fills)])
    blk = pl.BlockSpec((_BS, w8n, _LANE), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(memory_space=pl.ANY)      # stays in HBM;
    # the kernel DMAs the current column's packed slices once per column
    scratch = [
        pltpu.VMEM((rows_pad, sub, _LANE), _I32),     # counts (packed)
        pltpu.VMEM((6, w8n, _LANE), _U32),            # carry state
        pltpu.VMEM((rows_pad, sub, _LANE), _I32),     # wide key table
    ]
    if m_rows:
        scratch += [
            pltpu.VMEM((m_rows, sub, _LANE), _I32),   # totals table
            pltpu.VMEM((m_rows, sub, _LANE), _I32),   # wide model keys
        ]
    scratch.append(pltpu.SemaphoreType.DMA((4 if m_rows else 2,)))
    st_blk = pl.BlockSpec((6, w8n, _LANE), lambda i, *_: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[blk] * 5 + [tab] * (4 if m_rows else 2) + [st_blk],
        out_specs=(blk, blk, blk, st_blk),
        scratch_shapes=scratch,
    )
    w0, w1, fl, st = pl.pallas_call(
        partial(_kernel3, bs=_BS, rows_pad=rows_pad, sc=sc, bstep=bstep,
                F=F, w8=w8n, sub=sub, m_rows=m_rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, w8n, _LANE), _U32),
            jax.ShapeDtypeStruct((t_pad, w8n, _LANE), _U32),
            jax.ShapeDtypeStruct((t_pad, w8n, _LANE), _I32),
            jax.ShapeDtypeStruct((6, w8n, _LANE), _U32),
        ),
        interpret=interpret,
    )(shigh, slow, colmap, *ins, kq_p, icc_p, *ttabs_p, state0)

    def unpad_t(a):
        return a.reshape(t_pad, w_pad)[:T, :W]

    w0, w1, fl = unpad_t(w0), unpad_t(w1), unpad_t(fl)
    stf = st.reshape(6, w_pad)[:, :W]
    carry = (stf[0], stf[1], stf[2].astype(_I32), stf[3],
             stf[4].astype(_I32), stf[5] != 0)
    return carry, (w0, w1, (fl & 1) != 0, (fl & 2) != 0)
