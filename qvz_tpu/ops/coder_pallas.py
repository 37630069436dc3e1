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
table (see _kernel2) — an earlier design precomputed six per-step
streams with XLA 1-D table gathers, measured at 2.6 s per 52M symbols
on a v5e (pathological on TPU).

Bit-exactness: the per-step interval/renorm/emission body is the SAME
jnp code as the XLA fallback (coder_device._coder_step — imported,
not re-derived); tests assert byte-equality of the produced
containers against the host coder (reference semantics:
src/arith.c:24-96, src/qv_stream.c:9-61).

Measured negative results on this Mosaic toolchain (kept so they are
not retried blindly): reductions over int16 and over unsigned ints
are NYI (hence the int32 combo-field design); uint32<->float32 casts
are NYI (coder_device._exact_div routes through int32); middle-axis
(sublane) broadcasts scalarize (hence the once-per-column wide table
fill by per-plane 2-D stores); step-loop unrolling measured neutral
to negative; and an UNJITTED wrapper's eager pads cost ~70 us of
apparent per-step time on the remote-attached backend (three kernel
rewrites chased phantom costs before the wrapper was jitted whole).
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
_SC = 384              # slot-axis chunk per masked-sum pass


def _spad(S: int, bstep: int = 1) -> tuple[int, int]:
    # The batched kernel (bstep > 1) keeps ~2 live (sc, W) masked-sum
    # temporaries PER batch step inside the chunk loop; scoped VMEM
    # scales with bstep*sc, so shrink the slot chunk as the batch factor
    # grows (same total sweep work, more chunk iterations). Measured:
    # bstep=4 at sc=384, W=512, S_pad=1152 blew the 16 MB scoped-vmem
    # stack by 1.96 MB on a v5e; bstep*sc <= 2*_SC holds the b<=2 shape.
    sc_cap = max(_LANE, (2 * _SC // max(bstep, 2)) // _LANE * _LANE)
    sc = min(min(_SC, sc_cap), -(-S // _LANE) * _LANE)
    return -(-S // sc) * sc, sc


def fits(W: int, S: int, bstep: int = 1, m_pad: int = 0) -> bool:
    """True when the kernel's whole VMEM working set — counts table,
    per-chunk masked-sum temporaries, double-buffered stream/table/
    output blocks — fits the ~16 MB core VMEM with headroom (the temp
    term calibrated against a measured 16.94 MB compile at W=1024,
    S_pad=1152, sc=384; the bstep term against the measured 17.96 MB
    scoped-vmem overflow at bstep=4, W=512, same tables). m_pad > 0
    adds the totals-variant tables (QVZ_TPU_CODER_TOTALS)."""
    s_pad, sc = _spad(S, bstep)
    w_pad = -(-W // _LANE) * _LANE
    counts = s_pad * w_pad * 4
    key_wide = s_pad * w_pad * 4
    temps = (5 + 2 * max(0, bstep - 2)) * sc * w_pad * 4
    tables = 2 * s_pad * _LANE * 4      # single-buffered VMEM scratch
    streams = (5 + 3) * _BS * w_pad * 4 * 2
    counts = counts + key_wide
    if m_pad:
        counts += 2 * m_pad * w_pad * 4      # totals + wide key table
        tables += 2 * m_pad * _LANE * 4      # ttab scratch
        temps += (bstep + 2) * m_pad * w_pad * 4
    return counts + temps + tables + streams <= 13 * 2 ** 20


def use_totals() -> bool:
    """Totals side-table variant (QVZ_TPU_CODER_TOTALS, default on):
    the per-step model total comes from a dedicated (models, lanes)
    table swept in one short pass, removing the `owner` mask +
    multiply-accumulate from the S-slot sweep (~25% of the kernel's
    per-symbol VPU ops — the binding resource per the round-4
    roofline). Measured on the v5e at 500k x 100 / W=512 / b=4
    (best-of-3, byte-parity asserted in-probe): scan 0.554 s -> 0.436 s
    = 90.2 -> 114.7 Msym/s (+27%), device_code 1.675 -> 1.402 s —
    matching the op-count model's prediction, confirming the
    issue-bound roofline. 0 falls back to the owner-sweep form."""
    return os.environ.get("QVZ_TPU_CODER_TOTALS", "1") == "1"


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


def _kernel2(reset_ref, sbound_ref, colmap_ref,
             mid_ref, qs_ref, etl_ref, eth_ref, etn_ref,
             kq_ref, icc_ref, *rest, bs,
             s_pad, sc, bstep, m_pad=0):
    if m_pad:
        # totals variant (use_totals): two extra HBM tables (model-row
        # keys + init totals) and three extra scratch buffers (ttab
        # slices, wide key broadcast, the totals table itself)
        (tmk_ref, tin_ref, state0_ref,
         w0_ref, w1_ref, fl_ref, st_ref,
         counts_ref, state_ref, tabs_ref, kqw_ref,
         ttab_ref, totals_ref, tmkw_ref, dma_sem) = rest
    else:
        (state0_ref,
         w0_ref, w1_ref, fl_ref, st_ref,
         counts_ref, state_ref, tabs_ref, kqw_ref, dma_sem) = rest
    """v2: NO precomputed per-step streams beyond the quantize outputs.

    Every model-replay quantity is derived inside the chunk loop from
    two per-slot column tables compared against the raw (mid, qs)
    streams: mkey[s] = global model id owning slot s (-1 pad),
    qskey[s] = the slot's local symbol index. Masks:
        owner  = mkey == mid          (model's slot range)
        below  = owner & (qskey < qs) (slots strictly below ours)
        eq     = owner & (qskey == qs)
    and the coder inputs are paired range sums of the occurrence table
    AND the init-count table over those masks:
        cum_lo = sum(icc*below) + 8*sum(counts*below)
        total  = sum(icc*owner) + 8*sum(counts*owner)
        prior/init_at from eq. This replaces the XLA gather-based
    _precompute (measured 2.6 s per 52M symbols — pathological) with
    ~6 extra VPU ops per chunk element."""
    i = pl.program_id(0)
    shape = mid_ref.shape[1:]           # (W8, 128)

    # Column tables live in HBM; once per COLUMN the current column's
    # slices are DMA'd into VMEM (auto-pipelined per-block fetches
    # measured ~1.8 MB x n_blocks of redundant traffic) and the packed
    # slot-key table is pre-broadcast across the lane grid (a per-chunk
    # middle-axis broadcast measured 6.5x slower than v1 — Mosaic
    # scalarizes it; a major-axis broadcast per chunk is free).
    # tabs_ref rows: 0 = kq (mkey*128 + qskey, -1 pad), 1 = icc.
    col = colmap_ref[i]
    first = i == 0

    @pl.when(first | (col != colmap_ref[jnp.maximum(i - 1, 0)]))
    def _():
        srcs = [(kq_ref, tabs_ref), (icc_ref, tabs_ref)]
        if m_pad:
            srcs += [(tmk_ref, ttab_ref), (tin_ref, ttab_ref)]
        for k, (src, dst) in enumerate(srcs):
            pltpu.make_async_copy(src.at[col], dst.at[k % 2],
                                  dma_sem.at[k]).start()
        for k, (src, dst) in enumerate(srcs):
            pltpu.make_async_copy(src.at[col], dst.at[k % 2],
                                  dma_sem.at[k]).wait()
        # per-plane 2-D copies: a (s_pad, 1, 128) -> (s_pad, W8, 128)
        # middle-axis broadcast scalarizes in Mosaic
        for k in range(kqw_ref.shape[1]):
            kqw_ref[:, k, :] = tabs_ref[0]
        if m_pad:
            for k in range(tmkw_ref.shape[1]):
                tmkw_ref[:, k, :] = ttab_ref[0]

    # Column starts are always block-aligned (L % BS == 0, and the
    # leading explicit segment is L steps), so the counts reset hoists
    # out of the step loop: a per-STEP pl.when whose body does sliced
    # stores is predicated by Mosaic, not branched, and was measured
    # to dominate the kernel.
    @pl.when(reset_ref[i * bs] == 1)
    def _():
        v = tabs_ref[1] << 12
        for k in range(counts_ref.shape[1]):
            counts_ref[:, k, :] = v
        if m_pad:
            vt = ttab_ref[1] << 12
            for k in range(totals_ref.shape[1]):
                totals_ref[:, k, :] = vt

    # combo counts table: init counts in the high 20 bits (their
    # masked sums stay < 2^20: model totals are capped at r + 8), live
    # occurrence counts in the low 12 (lane run <= 2047 enforced by
    # the caller; sums stay < 2^12 — the fields cannot carry). int32
    # throughout (Mosaic has no unsigned reductions); adds/multiplies
    # are bit-exact mod 2^32 and fields extract with logical shifts.

    def init_carry():
        # chunk-chaining: block 0 loads the caller-supplied initial
        # interval state (canonical init, or the carry of the previous
        # column-chunk call — see fused_scan_tables' carry0)
        return tuple(state0_ref[k] for k in range(6))

    def load_carry():
        return tuple(state_ref[k] for k in range(6))

    carry0 = jax.lax.cond(i == 0, init_carry, load_carry)

    # B coding steps share each pass over the counts table (the kernel
    # is VMEM-traffic-bound on those chunk loads): all B masked sums
    # read the PRE-batch table, then step k's sums are corrected by
    # exact integer pair terms — one occurrence for every earlier step
    # j<k in the batch that hit the same model with a lower/equal
    # symbol in the same lane. Corrections land in the combo word's
    # low 12-bit occurrence field, whose <= 2047 bound is the true
    # occurrence count and therefore unchanged. Batches never straddle
    # a column (B divides _BS and column segments are _BS-aligned), so
    # the per-column table reset stays per-block.
    B = bstep

    def batch(tb, carry):
        t0 = tb * B
        mids = [mid_ref[t0 + k] for k in range(B)]
        qss = [qs_ref[t0 + k] for k in range(B)]
        lives = [m > 0 for m in mids]
        m128s = [m << 7 for m in mids]    # model key bases
        zi = jnp.zeros(shape, _I32)
        na = 2 if m_pad else 3            # accumulators per batch step

        def chunk(ci, acc):
            c0 = ci * sc
            c = counts_ref[pl.ds(c0, sc)]               # (sc, W8, 128)
            # d = slot key - model key base: in [0, card) exactly on
            # the model's own slots (key ranges are disjoint 128-blocks
            # per model, cards <= 72; pads carry key -1 -> d < 0)
            kw = kqw_ref[pl.ds(c0, sc)]
            out = []
            upd = None
            for k in range(B):
                d = kw - m128s[k][None]
                # (d >= 0) & (d < qs) as ONE unsigned compare: negative
                # deltas (pads, lower models) wrap above 2^31, far over
                # qs <= 127 — provably identical, one VPU op cheaper
                below = (d.astype(_U32)
                         < qss[k][None].astype(_U32)).astype(_I32)
                eq = (d == qss[k][None]).astype(_I32)
                out += [acc[na * k] + jnp.sum(c * below, axis=0)]
                if not m_pad:
                    # model total from the owner-masked slot sweep;
                    # the totals variant reads it off the side table
                    owner = (d.astype(_U32)
                             < jnp.uint32(128)).astype(_I32)
                    out += [acc[na * k + 1]
                            + jnp.sum(c * owner, axis=0)]
                out += [acc[na * k + na - 1] + jnp.sum(c * eq, axis=0)]
                e = eq * lives[k].astype(_I32)[None]
                upd = e if upd is None else upd + e
            counts_ref[pl.ds(c0, sc)] = c + upd
            return tuple(out)

        nch = (sbound_ref[i] + sc - 1) // sc
        acc = jax.lax.fori_loop(0, nch, chunk, (zi,) * (na * B))

        if m_pad:
            # ONE short pass over the (m_pad, W8, 128) totals table
            # replaces B owner sweeps over s_pad slots: rows match by
            # model-id key exactly like the slot table, and all B
            # steps share the read + the eq-update write-back.
            tw = totals_ref[:]
            kwm = tmkw_ref[:]
            tots = []
            tupd = None
            for k in range(B):
                eqm = (kwm == mids[k][None]).astype(_I32)
                tots.append(jnp.sum(tw * eqm, axis=0))
                e = eqm * lives[k].astype(_I32)[None]
                tupd = e if tupd is None else tupd + e
            totals_ref[:] = tw + tupd

        l, u, s3, buf, cnt, of = carry
        mask12 = jnp.int32(0xFFF)
        for k in range(B):
            if m_pad:
                a_lo, a_eq = acc[2 * k: 2 * k + 2]
                a_tot = tots[k]
            else:
                a_lo, a_tot, a_eq = acc[3 * k: 3 * k + 3]
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
            # v1's _precompute no-op normalization).
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
    Default 4 = the round-4 on-chip winner: the v5e sweep
    (build/onchip_perf.json, byte-parity asserted on every leg) measured
    the fused scan at 78.2 Msym/s with b=4 vs 59.2 at b=1 (b=2: 60.7,
    b=8: 77.7 but slower end-to-end), so the batched lowering is vouched
    on real hardware, not just interpret mode."""
    b = int(os.environ.get("QVZ_TPU_CODER_BATCH", "4"))
    if b < 1 or _BS % b:
        raise ValueError(f"QVZ_TPU_CODER_BATCH must divide {_BS}: {b}")
    return b


def fused_scan_tables(streams, tables, W, S, L, interpret=False,
                      bstep=1, carry0=None, col0=0, ncols=None):
    """v2 entry: code T = seg_pre + cols*L steps directly from the
    quantize outputs — no per-step precompute streams. Jitted whole:
    the eager pads/reshapes around the kernel each paid a full
    dispatch round-trip on remote-attached devices (measured ~70 us
    PER CODING STEP of apparent kernel time that was actually ~20
    eager dispatches per call); the block->column map is built from
    static shape arithmetic only.

    streams: (mid, qs, etl, eth, etn, reset) with (T, W) layouts; mid
    is the GLOBAL model id per step (0 or negative = explicit-triple
    step: cluster-id segment, padding); qs the symbol index.
    tables: (kq, icc, sbc_of_mid[, tmk, tin]) from LanePlan — the
    5-tuple enables the totals side-table variant when
    QVZ_TPU_CODER_TOTALS=1 (see use_totals). L: steps per column
    segment (must divide into _BS blocks; the optional leading cluster
    segment is L steps too).

    carry0/col0/ncols enable COLUMN-CHUNKED calls whose d2h payload
    fetches overlap later chunks' kernels (coder_device pipelining):
    carry0 is the previous call's carry (6-tuple, None = canonical
    init), col0 the first GLOBAL column this call codes (traced — one
    executable serves every same-shape chunk), ncols the number of
    column segments in these streams (static; None = all of kq).
    Chunks must start at column boundaries: the counts table resets
    there, so only the 6-word interval state crosses the cut.

    Returns the same (carry, ys) contract as _fused_scan[:6]."""
    if use_totals() and len(tables) >= 5:
        ttabs = (tables[3], tables[4])
        m_pad = int(tables[3].shape[1])
    else:
        ttabs, m_pad = None, 0
    return _fst_impl(streams, tuple(tables[:3]), ttabs, carry0,
                     jnp.asarray(col0, _I32), W, S, L,
                     interpret, bstep, m_pad, ncols)


@partial(jax.jit, static_argnames=("W", "S", "L", "interpret", "bstep",
                                   "m_pad", "ncols"))
def _fst_impl(streams, tables, ttabs, carry0, col0, W, S, L,
              interpret=False, bstep=1, m_pad=0, ncols=None):
    mid, qs, etl, eth, etn, reset = streams
    kq, icc, sbc_of_mid = tables
    T = mid.shape[0]
    cols = kq.shape[0]
    ncseg = cols if ncols is None else ncols
    assert L % _BS == 0, "column segment must align to kernel blocks"
    assert L <= 2047, "combo occurrence field is 12 bits (lane run cap)"
    w_pad = -(-W // _LANE) * _LANE
    t_pad = -(-T // _BS) * _BS
    s_pad, sc = _spad(S, bstep)

    def pad(a, fill):
        a = jnp.pad(a, ((0, t_pad - T), (0, w_pad - W)),
                    constant_values=fill)
        return a.reshape(t_pad, w_pad // _LANE, _LANE)

    ins = (pad(mid, 0), pad(qs, 0), pad(etl, 0), pad(eth, 1),
           pad(etn, 1))
    reset_p = jnp.pad(reset.astype(_I32), (0, t_pad - T))

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
    # tight per-block slot bound: slot_base+card is monotone in the
    # model id within a column, so the block bound is sbc(max mid) — a
    # cheap device reduction plus an nblocks-sized gather (mid 0 =
    # explicit steps / padding -> bound 0, table skipped entirely)
    midp = jnp.pad(jnp.asarray(mid, _I32),
                   ((0, t_pad - T), (0, 0)))
    maxmid = jnp.max(midp.reshape(nblocks, -1), axis=1)
    g_sbc = jnp.asarray(sbc_of_mid, _I32)
    sbound = jnp.where(
        maxmid > 0,
        jnp.take(g_sbc, jnp.clip(maxmid, 0, g_sbc.shape[0] - 1)), 0)
    if os.environ.get("QVZ_TPU_CODER_SBOUND0"):   # perf bisection knob
        sbound = jnp.zeros_like(sbound)

    def padtab(a, fill):
        a = jnp.asarray(a, _I32)
        a = jnp.pad(a, ((0, 0), (0, s_pad - a.shape[1])),
                    constant_values=fill)
        # lane-replicate: Mosaic block tiles must end (x8, 128), and a
        # (sc, 1, 128) slice broadcasts against the lane grid for free
        return jnp.broadcast_to(a[:, :, None], (cols, s_pad, _LANE))

    kq_p = padtab(kq, -1)
    icc_p = padtab(icc, 0)
    ttabs_p = ()
    if m_pad:
        def padm(a, fill):
            a = jnp.asarray(a, _I32)
            return jnp.broadcast_to(a[:, :, None],
                                    (cols, m_pad, _LANE))

        ttabs_p = (padm(ttabs[0], -1), padm(ttabs[1], 0))

    w8 = w_pad // _LANE
    # initial interval state (block 0 loads this instead of constants;
    # pad lanes get the canonical init — their outputs are discarded)
    if carry0 is None:
        z = jnp.zeros((w8, _LANE), _U32)
        state0 = jnp.stack([z, jnp.full((w8, _LANE), FULL, _U32),
                            z, z, z, z])
    else:
        fills = (0, int(FULL), 0, 0, 0, 0)
        state0 = jnp.stack([
            jnp.pad(jnp.asarray(a).astype(_U32), (0, w_pad - W),
                    constant_values=np.uint32(f)).reshape(w8, _LANE)
            for a, f in zip(carry0, fills)])
    blk = pl.BlockSpec((_BS, w8, _LANE), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(memory_space=pl.ANY)      # stays in HBM;
    # the kernel DMAs the current column's slices once per column
    scratch = [
        pltpu.VMEM((s_pad, w8, _LANE), _I32),
        pltpu.VMEM((6, w8, _LANE), _U32),
        pltpu.VMEM((2, s_pad, _LANE), _I32),
        pltpu.VMEM((s_pad, w8, _LANE), _I32),
    ]
    if m_pad:
        scratch += [
            pltpu.VMEM((2, m_pad, _LANE), _I32),      # ttab slices
            pltpu.VMEM((m_pad, w8, _LANE), _I32),     # totals table
            pltpu.VMEM((m_pad, w8, _LANE), _I32),     # wide key bcast
        ]
    scratch.append(pltpu.SemaphoreType.DMA((4 if m_pad else 2,)))
    st_blk = pl.BlockSpec((6, w8, _LANE), lambda i, *_: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[blk] * 5 + [tab] * (4 if m_pad else 2) + [st_blk],
        out_specs=(blk, blk, blk, st_blk),
        scratch_shapes=scratch,
    )
    w0, w1, fl, st = pl.pallas_call(
        partial(_kernel2, bs=_BS, s_pad=s_pad, sc=sc, bstep=bstep,
                m_pad=m_pad),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, w8, _LANE), _U32),
            jax.ShapeDtypeStruct((t_pad, w8, _LANE), _U32),
            jax.ShapeDtypeStruct((t_pad, w8, _LANE), _I32),
            jax.ShapeDtypeStruct((6, w8, _LANE), _U32),
        ),
        interpret=interpret,
    )(reset_p, sbound, colmap, *ins, kq_p, icc_p, *ttabs_p, state0)

    def unpad_t(a):
        return a.reshape(t_pad, w_pad)[:T, :W]

    w0, w1, fl = unpad_t(w0), unpad_t(w1), unpad_t(fl)
    stf = st.reshape(6, w_pad)[:, :W]
    carry = (stf[0], stf[1], stf[2].astype(_I32), stf[3],
             stf[4].astype(_I32), stf[5] != 0)
    return carry, (w0, w1, (fl & 1) != 0, (fl & 2) != 0)
