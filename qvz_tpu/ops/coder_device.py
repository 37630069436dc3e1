"""Lane-parallel adaptive arithmetic ENCODER on the accelerator.

The QVZ2 container's shards are independent adaptive arithmetic streams
(column-major symbol order, shared primed model bank). This module codes
W shards in parallel VECTOR LANES on the accelerator, producing payload
bytes byte-identical to the host coder (qvz_rt.cpp Encoder/ModelBank;
reference semantics src/arith.c:24-96 + src/qv_stream.c:9-61) — the
device->host traffic is then the COMPRESSED payload (~rate/8 bytes per
symbol) instead of the 6 B/symbol quantized intermediates that made the
round-2 device path lose against the host on tunnel-attached chips.

Design: ONE fused lax.scan over coding steps, pure XLA (u32/f32 — no
64-bit integer math anywhere, so no jax_enable_x64 dependency and no
emulated-u64 ops on TPU). Per step and lane the scan

(a) replays the adaptive model: counts[x] += 8 per occurrence is
    independent of the arithmetic interval, and column-major coding
    order means each (column, context, choice) model is touched only
    inside its own column segment. Absent a rescale the coder inputs at
    occurrence t are a LINEAR function of occurrence-prefix counts:

        cum_lo(t)  = cuminit(m, <x) + 8 * |{t'<t: model m, sym < x}|
        count(t)   = init(m, x)     + 8 * |{t'<t: model m, sym = x}|
        total(t)   = ninit(m)       + 8 * |{t'<t: model m}|

    The scan carry holds the per-lane occurrence-count table
    counts (W, S) over the column's dense model-slot axis; the three
    prefix quantities are masked range-sums over S — elementwise VPU
    ops + minor-axis reductions. (A materialized formulation — one-hot
    (W, L, S) + cumsum over lines + S-axis gathers — measured 6-14
    Msym/s on v5e; this fused carry form avoids gathers and any
    (W, L, S) tensor entirely.) Rescale (halve+1 past r = 2^19,
    qv_stream.c:15-24) is EXACTLY detected per lane (a model's total
    would exceed r); a flagged lane falls back to the host coder,
    preserving bit-exactness unconditionally. The cluster-id model,
    which sees one update per line and can legitimately rescale, is
    replayed host-side at memory speed (rt.replay_model) and shipped
    as explicit per-step triples (slot = -1 steps).

(b) advances the interval: exact floor-division update, the host
    coder's batched E1*/E3* closed-form renormalization
    (qvz_rt.cpp:393-424), and on-device bit packing into 32-bit words
    via a carry (buf, cnt). The only sequential axis is
    symbols-within-shard; all lanes advance in lockstep vector ops.

Exact division without 64-bit math: the coder needs
q = floor(range*cum / n) with range < 2^22 and cum <= n < 2^20, so
q <= range < 2^22. An f32 estimate (operands < 2^24 are f32-exact, the
rounded product/quotient is within ~1.5 of q) is corrected to the exact
floor by comparing the u32 (mod 2^32) remainder range*cum - q*n against
n — the true remainder magnitude is < 4n < 2^22, so its two's-complement
sign is unambiguous. Four correction rounds cover an estimate error of
+-4 (the f32 analysis bounds it by +-2; hardware f32 division need not
be correctly rounded, hence the margin).

Bit emission per step is the E1* batch: [first bit][scale3 complement
bits][low k1-1 bits of the shared top] — at most k1 + scale3 bits with
k1 <= 21. scale3 can in principle grow without bound across E3-only
steps; emissions above 63 bits (probability ~2^-60 per step) set the
lane's fallback flag rather than being silently mis-packed.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ARITH_M = 22
ARITH_R = np.uint32(1 << (ARITH_M - 3))
FULL = np.uint32((1 << ARITH_M) - 1)
MSB_SHIFT = ARITH_M - 1          # 21
SMSB_SHIFT = ARITH_M - 2         # 20
MSB_BIT = np.uint32(1 << MSB_SHIFT)
MSB_CLEAR = np.uint32((1 << MSB_SHIFT) - 1)
STEP = 8

_U32 = jnp.uint32
_I32 = jnp.int32


# --------------------------------------------------------------------------
# Host-side plan: per-column slot layout of the model bank.


class LanePlan:
    """Per-(tables, init bank) layout for the device coder.

    Columns are mapped to a dense local "slot" axis: column c's models
    (ids 1 + 2*(pair_base(cl,c)+ctx) + choice over clusters/contexts/
    choices — qvz_rt.cpp tables_from_design) get consecutive slot
    ranges; slot = slot_base[model] + symbol indexes that model's count
    inside the column. S is the max slot count over columns."""

    def __init__(self, tables, init_bank: np.ndarray | None):
        cards = np.asarray(tables.model_card, dtype=np.int64)
        offs = np.asarray(tables.model_off, dtype=np.int64)  # counts offs
        n_models = int(tables.n_models)
        cols = int(tables.columns)
        n_cl = int(tables.n_clusters)
        pb = np.asarray(tables.pair_base,
                        dtype=np.int64).reshape(n_cl, cols)
        pb_flat = pb.reshape(-1)
        nxt = np.append(pb_flat[1:], int(tables.n_pairs))
        nctx = (nxt - pb_flat).reshape(n_cl, cols)

        if init_bank is None:
            counts_init = np.ones(int(offs[-1]), dtype=np.uint32)
            totals_init = cards.astype(np.uint32)
        else:
            blob = np.asarray(init_bank, dtype=np.uint32)
            counts_init = blob[: int(offs[-1])]
            totals_init = blob[int(offs[-1]): int(offs[-1]) + n_models]

        slot_base = np.zeros(n_models, dtype=np.int32)
        col_models = []          # per column: model id array
        col_slots = np.zeros(cols, dtype=np.int64)
        for c in range(cols):
            ms = []
            for cl in range(n_cl):
                base = 1 + 2 * int(pb[cl, c])
                ms.extend(range(base, base + 2 * int(nctx[cl, c])))
            ms = np.asarray(ms, dtype=np.int64)
            col_models.append(ms)
            sb = np.concatenate([[0], np.cumsum(cards[ms])[:-1]])
            slot_base[ms] = sb
            col_slots[c] = int(cards[ms].sum())
        S = int(col_slots.max()) if cols else 1

        init_counts_cols = np.ones((cols, S), dtype=np.uint32)
        for c in range(cols):
            parts = [counts_init[offs[m]: offs[m] + cards[m]]
                     for m in col_models[c]]
            v = np.concatenate(parts) if parts else \
                np.zeros(0, dtype=np.uint32)
            init_counts_cols[c, : len(v)] = v

        self.S = S
        self.columns = cols
        self.n_clusters = n_cl
        self.init_counts_cols = init_counts_cols
        self.slot_base = slot_base
        self.cards = cards.astype(np.int32)
        self.totals = totals_init.astype(np.uint32)
        self.cluster_init_counts = counts_init[: int(cards[0])].copy()
        self.cluster_init_total = int(totals_init[0])

        # v2 per-slot column tables (Mosaic kernel): the model id owning
        # each slot (-1 pad) and the slot's local symbol index — the
        # kernel derives every replay quantity by comparing these to the
        # raw (mid, qs) streams, removing the gather-based per-step
        # precompute entirely (coder_pallas._kernel2).
        mkey = np.full((cols, S), -1, dtype=np.int32)
        qskey = np.zeros((cols, S), dtype=np.int32)
        for c in range(cols):
            pos = 0
            for m in col_models[c]:
                k = int(cards[m])
                mkey[c, pos:pos + k] = m
                qskey[c, pos:pos + k] = np.arange(k, dtype=np.int32)
                pos += k
        self.mkey = mkey
        self.qskey = qskey
        # packed per-slot key: owning model id * 128 + local symbol
        # index (-1 pad) — the kernel's only slot table
        self.kq = np.where(
            mkey >= 0, mkey.astype(np.int64) * 128 + qskey,
            -1).astype(np.int32)
        self.col_slots = col_slots.astype(np.int32)
        # sbc (slot_base + card) per global model id — monotone within
        # a column's model range; the kernel's per-block slot bound is
        # sbc(max mid in block)
        self.sbc_of_mid = (slot_base
                           + cards.astype(np.int32)).astype(np.int32)
        # per-column MODEL-row tables for the totals side-table kernel
        # variant (QVZ_TPU_CODER_TOTALS): row m of column c carries the
        # model id (tmk, -1 pad) and its initial total (tin). Model ids
        # are NOT contiguous within a column (cluster ranges are
        # interleaved across columns), so the kernel matches rows by
        # key, exactly like the slot table.
        M = max((len(ms) for ms in col_models), default=1)
        m_pad = max(8, -(-M // 8) * 8)
        tmk = np.full((cols, m_pad), -1, dtype=np.int32)
        tin = np.zeros((cols, m_pad), dtype=np.int32)
        for c in range(cols):
            ms = col_models[c]
            tmk[c, : len(ms)] = ms
            tin[c, : len(ms)] = totals_init[ms].astype(np.int64)
        self.tmk = tmk
        self.tin = tin
        self.M = m_pad


# --------------------------------------------------------------------------
# u32 bit plumbing (all shift amounts kept strictly inside [0, 31]).


def _u(x):
    return x.astype(_U32)


def _shr32(v, s):
    """v >> s for s in [0, 32] (s == 32 -> 0)."""
    s1 = jnp.minimum(s, 31).astype(_U32)
    return jnp.where(s >= 32, _U32(0), v >> s1)


def _shl32(v, s):
    """v << s for s in [0, 32] (s == 32 -> 0, i.e. mod-2^32 semantics)."""
    s1 = jnp.minimum(s, 31).astype(_U32)
    return jnp.where(s >= 32, _U32(0), v << s1)


def _ones64(n):
    """(hi, lo) u32 pair = 2^n - 1 for n in [0, 62]."""
    lo = jnp.where(n >= 32, _U32(0xFFFFFFFF),
                   _shl32(jnp.full_like(n, 1).astype(_U32), n) - 1)
    hi = _shl32(jnp.full_like(n, 1).astype(_U32),
                jnp.maximum(n - 32, 0)) - 1
    hi = jnp.where(n >= 32, hi, _U32(0))
    return hi, lo


def _put64(val, pos):
    """(hi, lo) u32 pair = val * 2^pos; val u32, pos in [0, 62]."""
    plo = jnp.minimum(pos, 31)
    # val >> (32 - pos) for pos in [0, 31] via the double shift
    hi_low = (val >> 1) >> (31 - plo).astype(_U32)
    hi_high = _shl32(val, jnp.maximum(pos - 32, 0))
    hi = jnp.where(pos >= 32, hi_high, hi_low)
    lo = jnp.where(pos >= 32, _U32(0), val << plo.astype(_U32))
    return hi, lo


def _shl64_small(hi, lo, s):
    """64-bit left shift by s in [0, 31]."""
    su = jnp.minimum(s, 31).astype(_U32)
    hi2 = (hi << su) | ((lo >> 1) >> (31 - su))
    return hi2, lo << su


def _exact_div(rng, cum, n):
    """floor(rng * cum / n), exact, for rng < 2^22, cum <= n < 2^20.

    Casts route through int32 (values are < 2^22, so exact): Mosaic
    has no uint32<->float32 lowering, and the int32 detour produces
    bit-identical f32 values on the XLA path too."""
    q = (rng.astype(_I32).astype(jnp.float32)
         * cum.astype(_I32).astype(jnp.float32)
         / n.astype(_I32).astype(jnp.float32)).astype(_I32).astype(_U32)
    a_lo = rng * cum                       # exact mod 2^32
    for _ in range(4):
        r = (a_lo - q * n).astype(_I32)    # true remainder in (-4n, 5n)
        q = q - (r < 0).astype(_U32)
        q = q + ((r >= n.astype(_I32)) & (r >= 0)).astype(_U32)
    return q


def _append_bits(buf, cnt, val, p):
    """Append p (in [0, 32]) bits of val (< 2^p) to the MSB-first carry
    (buf, cnt) with cnt < 32; returns (buf', cnt', word, flushed)."""
    total = cnt + p
    hi = jnp.where(p == 0, _U32(0), _shr32(buf, 32 - p))
    lo = jnp.where(p == 0, buf, _shl32(buf, p) | val)
    flush = total >= 32
    s = jnp.maximum(total - 32, 0)
    word_hi = _shl32(hi, 32 - s) | _shr32(lo, s)
    word = jnp.where(flush, jnp.where(s == 0, lo, word_hi), _U32(0))
    mask = _shl32(jnp.full_like(lo, 1), s) - 1
    buf2 = jnp.where(flush, lo & mask, lo)
    cnt2 = jnp.where(flush, s, total)
    return buf2, cnt2, word, flush


# --------------------------------------------------------------------------
# Pass 2: the interval scan.


def _coder_step(carry, xs):
    """One arithmetic-coder step across all lanes (vectorized Encoder::
    step, qvz_rt.cpp:374-425, incl. the E1*/E3* closed forms)."""
    l, u, s3, buf, cnt, of = carry
    clo, chi, n = xs

    rng = u - l + 1
    qhi = jnp.where(chi == n, rng, _exact_div(rng, chi, n))
    qlo = jnp.where(clo == 0, _U32(0), _exact_div(rng, clo, n))
    u = l + qhi - 1
    l = l + qlo

    # E1* batch: k1 = number of shared leading bits (within ARITH_M).
    diff = l ^ u
    e1 = (diff >> MSB_SHIFT) == 0
    k1 = jnp.where(e1, jax.lax.clz(diff << _U32(32 - ARITH_M)),
                   _U32(0)).astype(_I32)
    k1m1 = jnp.maximum(k1 - 1, 0)
    top = _shr32(l, ARITH_M - k1)
    first = _shr32(top, k1m1)
    comp = first ^ 1
    s3c = jnp.minimum(s3, 63 - k1)          # clamp for safe construction
    of = of | (e1 & (k1 + s3 > 63))
    nbits = jnp.where(e1, k1 + s3c, 0)

    # V = first·2^(nbits-1) | comp_run·2^(k1-1) | low(k1-1 bits of top)
    a_hi, a_lo = _put64(first, jnp.maximum(nbits - 1, 0))
    r_hi, r_lo = _ones64(s3c)
    zero = _U32(0)
    r_hi = jnp.where(comp == 1, r_hi, zero)
    r_lo = jnp.where(comp == 1, r_lo, zero)
    b_hi, b_lo = _shl64_small(r_hi, r_lo, k1m1)
    low = top & (_shl32(jnp.full_like(top, 1), k1m1) - 1)
    v_hi = a_hi | b_hi
    v_lo = a_lo | b_lo | low
    v_hi = jnp.where(e1, v_hi, zero)
    v_lo = jnp.where(e1, v_lo, zero)
    s3 = jnp.where(e1, 0, s3)

    # interval shift (mod-2^32 left shifts keep every surviving bit)
    l = _shl32(l, k1) & FULL
    u = (_shl32(u, k1) | (_shl32(jnp.full_like(u, 1), k1) - 1)) & FULL

    # E3* batch: scale3 += k3, no emission.
    e3 = ((l >> SMSB_SHIFT) == 1) & ((u >> SMSB_SHIFT) == 2)
    lx = l << _U32(32 - SMSB_SHIFT)
    ux = u << _U32(32 - SMSB_SHIFT)
    lrun = jax.lax.clz(~lx | _U32(1)).astype(_I32)
    zrun = jnp.where(ux != 0, jax.lax.clz(ux).astype(_I32), 32)
    k3 = jnp.where(e3, 1 + jnp.minimum(lrun, zrun), 0)
    s3 = s3 + k3
    ones_k3 = _shl32(jnp.full_like(u, 1), k3) - 1
    l = jnp.where(e3, _shl32(l, k3) & MSB_CLEAR, l)
    u = jnp.where(e3, ((_shl32(u, k3) & MSB_CLEAR) | MSB_BIT) | ones_k3,
                  u)

    # pack: top chunk (bits >= 32 of V) first, then the low chunk.
    p1 = jnp.maximum(nbits - 32, 0)
    p2 = jnp.minimum(nbits, 32)
    buf, cnt, w0, f0 = _append_bits(buf, cnt, v_hi, p1)
    buf, cnt, w1, f1 = _append_bits(buf, cnt, v_lo, p2)
    return (l, u, s3, buf, cnt, of), (w0, w1, f0, f1)


@partial(jax.jit, static_argnames=("unroll",))
def _pass2(trip_lo, trip_hi, trip_n, unroll=1):
    """Scan the (steps, W) triple streams through the coder.

    unroll stays 1 by default: XLA's CPU backend hits a pathological
    compile blowup on this body at unroll=4 (136 s vs 0.6 s measured)
    with no cached-run win; QVZ_TPU_CODER_UNROLL tunes it on real
    accelerator backends."""
    steps, W = trip_lo.shape
    init = (jnp.zeros(W, _U32), jnp.full(W, FULL, _U32),
            jnp.zeros(W, _I32), jnp.zeros(W, _U32), jnp.zeros(W, _I32),
            jnp.zeros(W, bool))
    carry, ys = jax.lax.scan(_coder_step, init,
                             (trip_lo, trip_hi, trip_n), unroll=unroll)
    return carry, ys


# --------------------------------------------------------------------------
# Fused single-scan coder: model replay AND interval recurrence in ONE
# lax.scan. The (W, L, S) one-hot/cumsum/gather formulation of pass 1
# measured 6-14 Msym/s on v5e (cumsum over lines + the S-axis gathers
# are pathological on TPU); instead the scan carry holds the per-lane
# occurrence-count table counts (W, S) and each step derives its triple
# with three masked range-sums over S — pure VPU elementwise + minor-axis
# reductions, no gathers, nothing (W, L, S)-shaped ever materialized.


@partial(jax.jit, static_argnames=("S",))
def _precompute(mid, qs, valid, icc, slot_base_g, card_g, ninit_g, S):
    """Per-symbol scan inputs from the quantize outputs (1-D table
    gathers, all fast on TPU). mid/qs: (cols, W, L) i32; valid: (W, L).
    Returns (cols, W, L) streams: slot (or -1 for no-op steps), sb, sbc,
    base_lo (init-count prefix inside the model), init_at, ninit."""
    cols, W, L = mid.shape
    sb = slot_base_g[mid]
    card = card_g[mid]
    ninit = ninit_g[mid].astype(_I32)
    slot = jnp.clip(sb + qs, 0, S - 1)
    sbc = sb + card

    icc_i = icc.astype(_I32)                      # (cols, S)
    ci = jnp.concatenate(
        [jnp.zeros((cols, 1), _I32), jnp.cumsum(icc_i, axis=1)], axis=1)
    ci_flat = ci.reshape(-1)                      # (cols*(S+1),)
    colix = jnp.arange(cols, dtype=_I32)[:, None, None]
    cbase = colix * (S + 1)
    base_lo = ci_flat[cbase + slot] - ci_flat[cbase + sb]
    init_at = icc_i.reshape(-1)[colix * S + slot]

    noop = (card == 1) | ~valid[None, :, :]
    slot = jnp.where(noop, -1, slot)
    return slot, sb, sbc, base_lo, init_at, ninit


def _fused_step(carry, xs):
    """One coder step across all lanes, deriving the (cum_lo, cum_hi,
    total) triple from the carried occurrence counts. Steps with
    slot < 0 use the explicit triple (etl, eth, etn) and leave counts
    untouched (cluster-id segment, no-op models, lane padding)."""
    l, u, s3, buf, cnt, of, counts = carry
    slot, sb, sbc, base_lo, init_at, ninit, etl, eth, etn, reset = xs
    S = counts.shape[1]

    counts = counts * jnp.logical_not(reset).astype(_I32)
    iota = jnp.arange(S, dtype=_I32)[None, :]
    live = slot >= 0
    m_sb = iota < sb[:, None]
    s_lo = jnp.sum(counts * ((iota < slot[:, None]) & ~m_sb), axis=1)
    s_tot = jnp.sum(counts * ((iota < sbc[:, None]) & ~m_sb), axis=1)
    eq = (iota == slot[:, None]).astype(_I32)
    prior = jnp.sum(counts * eq, axis=1)

    cum_lo = base_lo + STEP * s_lo
    cum_hi = cum_lo + init_at + STEP * prior
    total = ninit + STEP * s_tot
    of = of | (live & (total + STEP > ARITH_R.astype(_I32)))
    clo = jnp.where(live, cum_lo.astype(_U32), etl)
    chi = jnp.where(live, cum_hi.astype(_U32), eth)
    n = jnp.where(live, total.astype(_U32), etn)
    counts = counts + jnp.where(live[:, None], eq, 0)

    (l, u, s3, buf, cnt, of2), ys = _coder_step(
        (l, u, s3, buf, cnt, jnp.zeros_like(of)), (clo, chi, n))
    return (l, u, s3, buf, cnt, of | of2, counts), ys


@partial(jax.jit, static_argnames=("W", "S", "unroll"))
def _fused_scan(xs, W, S, unroll=1):
    init = (jnp.zeros(W, _U32), jnp.full(W, FULL, _U32),
            jnp.zeros(W, _I32), jnp.zeros(W, _U32), jnp.zeros(W, _I32),
            jnp.zeros(W, bool), jnp.zeros((W, S), _I32))
    carry, ys = jax.lax.scan(_fused_step, init, xs, unroll=unroll)
    return carry, ys


def _lane_mult(mesh) -> int:
    """Lane-axis padding multiple: per-device lane count must stay a
    multiple of 8 (the kernels' W8 sublane tiling)."""
    return 8 * (mesh.devices.size if mesh is not None else 1)


def _mesh_lane_scan(xs, W, S, unroll, mesh):
    """_fused_scan sharded over the lane axis of an n-device mesh.

    Lanes are independent adaptive streams — each carries its own
    interval registers and occurrence-count table — so every device
    scans its own lane subset with NO collectives, and the global
    result is bit-identical to the unsharded scan (asserted at
    realistic geometry in __graft_entry__.dryrun_multichip)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from qvz_tpu.parallel.mesh import READS_AXIS

    wd = W // mesh.devices.size
    lane = P(None, READS_AXIS)
    fn = shard_map(
        lambda *xs_d: _fused_scan(xs_d, wd, S, unroll=unroll),
        mesh=mesh,
        in_specs=(lane,) * 9 + (P(None),),
        out_specs=((P(READS_AXIS),) * 6 + (P(READS_AXIS, None),),
                   (lane,) * 4),
        check_vma=False)
    return jax.jit(fn)(*xs)


def _mesh_lane_kernel(streams, tabs, W, S, L, interp, bstep, mesh):
    """fused_scan_tables (the Mosaic kernel) sharded over the lane
    axis: per-device lane groups run the identical kernel body with
    replicated plan tables and no collectives."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from qvz_tpu.ops import coder_pallas
    from qvz_tpu.parallel.mesh import READS_AXIS

    wd = W // mesh.devices.size
    mp = (tabs[3].shape[1]
          if coder_pallas.use_totals() and len(tabs) >= 5 else 0)
    wg = coder_pallas.lane_group(wd, S, bstep, m_pad=mp)

    def body(mid_s, qs_s, etl, eth, etn, reset):
        sg = (mid_s, qs_s, etl, eth, etn, reset)
        if wg >= wd:
            return coder_pallas.fused_scan_tables(
                sg, tabs, wd, S, L, interpret=interp, bstep=bstep)
        parts = []
        for g0 in range(0, wd, wg):
            g1 = min(wd, g0 + wg)
            pg = tuple(a[:, g0:g1]
                       for a in (mid_s, qs_s, etl, eth, etn))
            parts.append(coder_pallas.fused_scan_tables(
                pg + (reset,), tabs, g1 - g0, S, L,
                interpret=interp, bstep=bstep))
        carry = tuple(jnp.concatenate([p[0][k] for p in parts])
                      for k in range(6))
        ys = tuple(jnp.concatenate([p[1][k] for p in parts], axis=1)
                   for k in range(4))
        return carry, ys

    lane = P(None, READS_AXIS)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(lane,) * 5 + (P(None),),
        out_specs=((P(READS_AXIS),) * 6, (lane,) * 4),
        check_vma=False)
    return jax.jit(fn)(*streams)


# --------------------------------------------------------------------------
# Compaction: flagged words -> dense per-lane word streams.


@partial(jax.jit, static_argnames=("max_words",))
def _compact(w0, w1, f0, f1, max_words):
    """Dense per-lane word streams via one scatter: row t of lane w
    lands at its flush-prefix-count when flagged, else is dropped
    (out-of-bounds destination + mode='drop')."""
    steps, W = w0.shape
    wflat = jnp.stack([w0, w1], axis=1).reshape(2 * steps, W)
    fflat = jnp.stack([f0, f1], axis=1).reshape(2 * steps, W)
    cs = jnp.cumsum(fflat.astype(_I32), axis=0)
    counts = cs[-1]
    dst = jnp.where(fflat, cs - 1, max_words)
    lane = jnp.broadcast_to(jnp.arange(W, dtype=_I32), (2 * steps, W))
    out = jnp.zeros((max_words, W), _U32)
    out = out.at[dst, lane].set(wflat, mode="drop")
    return out, counts


def _word_counts(f0, f1):
    return jnp.sum(f0.astype(_I32) + f1.astype(_I32), axis=0)


# --------------------------------------------------------------------------
# Host-side assembly.


def finish_payload(words: np.ndarray, l: int, s3: int, buf: int,
                   cnt: int) -> bytes:
    """Assemble one lane's payload: packed words + pending bits + the
    encoder flush (msb of l, scale3 complements, low ARITH_M-1 bits of
    l — arith.c:99-115) + the reference's unconditional byte pad
    (os_stream.c:105-110: a stream ending on a byte boundary gains one
    extra zero byte)."""
    body = np.ascontiguousarray(words, dtype=np.uint32).astype(
        ">u4").tobytes()
    msb = (int(l) >> MSB_SHIFT) & 1
    comp = msb ^ 1
    v = int(buf)
    v = (v << 1) | msb
    v = (v << s3) | (((1 << s3) - 1) if comp else 0)
    v = (v << (ARITH_M - 1)) | (int(l) & ((1 << (ARITH_M - 1)) - 1))
    nb = int(cnt) + ARITH_M + int(s3)
    pad = 8 - (nb % 8)           # nb % 8 == 0 -> pad == 8 (extra byte)
    v <<= pad
    nb += pad
    return body + v.to_bytes(nb // 8, "big")


def _bucket(n: int) -> int:
    """Quarter-power-of-two size bucket >= n: bounds jit-cache churn
    across inputs at <= 25% padded compute (padding is no-op triples,
    which provably neither move the interval nor emit bits)."""
    if n <= 256:
        return 256
    b = 1 << (n.bit_length() - 1)
    q = b // 4
    return -(-n // q) * q


def encode_lanes(plan: LanePlan, mid_lanes, qs_lanes, valid,
                 cluster_triples: np.ndarray | None,
                 timings: dict | None = None, mesh=None):
    """Code W equal-length lanes.

    mid_lanes/qs_lanes: (cols, W, L) int32 (device or host arrays);
    valid: (W, L) bool; cluster_triples: (W, L, 3) u32 host triples for
    the cluster-id segment (None when n_clusters == 1 — those steps are
    exact no-ops and are skipped entirely).

    timings: optional dict filled with wall-clock stage splits
    (precompute / scan / compact_fetch / assemble) — the fences force
    materialization, so only pass it for diagnostics.

    mesh: optional jax.sharding.Mesh — the scan/kernel shards over the
    lane axis (independent streams, no collectives), bit-identical to
    the unsharded form.

    Returns (payloads, flags): payloads is a list of W byte strings
    (entries for flagged lanes are None — the caller must host-code
    those shards), flags the per-lane fallback mask."""
    t_seg = time.perf_counter()
    cols, W, L = mid_lanes.shape
    Lb = _bucket(L)
    mult = _lane_mult(mesh)
    Wb = -(-W // mult) * mult
    if Lb != L or Wb != W:
        pw, pl = Wb - W, Lb - L
        mid_lanes = jnp.pad(jnp.asarray(mid_lanes),
                            ((0, 0), (0, pw), (0, pl)))
        qs_lanes = jnp.pad(jnp.asarray(qs_lanes),
                           ((0, 0), (0, pw), (0, pl)))
        valid = np.pad(np.asarray(valid), ((0, pw), (0, pl)))
        if cluster_triples is not None:
            ct = np.zeros((Wb, Lb, 3), dtype=np.uint32)
            ct[:, :, 1] = 1
            ct[:, :, 2] = 1
            ct[:W, :L] = cluster_triples
            cluster_triples = ct
    W_real = W
    W, L = Wb, Lb
    S = plan.S
    csteps = cols * L

    def seg(t):  # (cols, W, L) -> (cols*L, W)
        return jnp.swapaxes(t, 1, 2).reshape(cols * L, W)

    # The Mosaic kernel runs the identical step body with the counts
    # table VMEM-resident — the XLA scan pays ~25 us/step of per-op
    # dispatch overhead on accelerators — and derives the replay
    # quantities IN-KERNEL from the raw (mid, qs) streams vs the plan's
    # per-slot tables (the gather-based _precompute measured 2.6 s per
    # 52M symbols on a v5e). "interpret" forces the kernel through the
    # Pallas interpreter on any backend (CPU equivalence tests).
    from qvz_tpu.ops import coder_pallas
    n_dev = mesh.devices.size if mesh is not None else 1
    pallas_flag = os.environ.get("QVZ_TPU_CODER_PALLAS", "1")
    use_pallas = (pallas_flag != "0"
                  and (jax.default_backend() != "cpu"
                       or pallas_flag == "interpret")
                  and L <= 2047
                  and coder_pallas.lane_group(
                      W // n_dev, S,
                      m_pad=plan.M if coder_pallas.use_totals()
                      else 0) > 0)
    if use_pallas:
        mid_s = seg(jnp.asarray(mid_lanes, _I32))
        qs_s = seg(jnp.asarray(qs_lanes, _I32))
        etl = jnp.zeros((csteps, W), _U32)
        eth = jnp.ones((csteps, W), _U32)
        etn = jnp.ones((csteps, W), _U32)
        reset = (jnp.arange(csteps, dtype=_I32) % L) == 0
        if cluster_triples is not None:
            ct = jnp.asarray(cluster_triples, _U32)   # (W, L, 3)
            zi = jnp.zeros((L, W), _I32)
            mid_s = jnp.concatenate([zi, mid_s])
            qs_s = jnp.concatenate([zi, qs_s])
            etl = jnp.concatenate([jnp.swapaxes(ct[..., 0], 0, 1), etl])
            eth = jnp.concatenate([jnp.swapaxes(ct[..., 1], 0, 1), eth])
            etn = jnp.concatenate([jnp.swapaxes(ct[..., 2], 0, 1), etn])
            reset = jnp.concatenate([jnp.zeros(L, bool), reset])
        if timings is not None:
            np.asarray(mid_s.reshape(-1)[:1])   # readback fence
            timings["precompute"] = time.perf_counter() - t_seg
            t_seg = time.perf_counter()
        tabs = (plan.kq, plan.init_counts_cols.astype(np.int32),
                plan.sbc_of_mid, plan.tmk, plan.tin,
                plan.slot_base.astype(np.int32))
        interp = pallas_flag == "interpret"
        bstep = coder_pallas.batch_steps()
        wg = coder_pallas.lane_group(
            W, S, m_pad=plan.M if coder_pallas.use_totals() else 0)
        if mesh is not None:
            carry, (w0, w1, f0, f1) = _mesh_lane_kernel(
                (mid_s, qs_s, etl, eth, etn, reset), tabs, W, S, L,
                interp, bstep, mesh)
        elif wg >= W:
            carry, (w0, w1, f0, f1) = coder_pallas.fused_scan_tables(
                (mid_s, qs_s, etl, eth, etn, reset), tabs, W, S, L,
                interpret=interp, bstep=bstep)
        else:
            # lanes are independent streams: wider-than-VMEM lane sets
            # run the kernel in groups with identical per-lane results.
            # Equal-width adjacent groups are PAIRED inside one jit:
            # XLA overlaps the two kernel invocations' pipelines —
            # measured 1.14x at the production table scale (S=1110,
            # build/onchip_perf.json concurrent2_W512_S1110; 1.72x on
            # small tables where both working sets co-fit in VMEM).
            # QVZ_TPU_CODER_PAIR=0 restores sequential group calls.
            groups = []
            for g0 in range(0, W, wg):
                g1 = min(W, g0 + wg)
                groups.append((g1 - g0, tuple(
                    a[:, g0:g1] for a in (mid_s, qs_s, etl, eth, etn))))
            pair_on = (os.environ.get("QVZ_TPU_CODER_PAIR", "1") == "1"
                       and not interp)

            def call_one(sg):
                return coder_pallas.fused_scan_tables(
                    sg + (reset,), tabs, sg[0].shape[1], S, L,
                    interpret=interp, bstep=bstep)

            tabs_j = tuple(jnp.asarray(t) for t in tabs)
            parts = []
            i = 0
            while i < len(groups):
                if (pair_on and i + 1 < len(groups)
                        and groups[i][0] == groups[i + 1][0]):
                    pa, pb = _pair_groups(
                        groups[i][1], groups[i + 1][1], reset, tabs_j,
                        groups[i][0], S, L, bstep)
                    parts += [pa, pb]
                    i += 2
                else:
                    parts.append(call_one(groups[i][1]))
                    i += 1
            carry = tuple(
                jnp.concatenate([p[0][k] for p in parts])
                for k in range(6))
            w0, w1, f0, f1 = (
                jnp.concatenate([p[1][k] for p in parts], axis=1)
                for k in range(4))
    else:
        slot, sb, sbc, base_lo, init_at, ninit = _precompute(
            jnp.asarray(mid_lanes, _I32), jnp.asarray(qs_lanes, _I32),
            jnp.asarray(valid), jnp.asarray(plan.init_counts_cols,
                                            _U32),
            jnp.asarray(plan.slot_base, _I32),
            jnp.asarray(plan.cards, _I32),
            jnp.asarray(plan.totals, _U32), S)

        slot, sb, sbc, base_lo, init_at, ninit = (
            seg(t) for t in (slot, sb, sbc, base_lo, init_at, ninit))
        # explicit triples: only consulted where slot < 0 (no-op steps
        # use the canonical (0, 1, 1), which provably neither moves the
        # interval nor emits bits)
        etl = jnp.zeros((csteps, W), _U32)
        eth = jnp.ones((csteps, W), _U32)
        etn = jnp.ones((csteps, W), _U32)
        reset = (jnp.arange(csteps, dtype=_I32) % L) == 0

        if cluster_triples is not None:
            ct = jnp.asarray(cluster_triples, _U32)   # (W, L, 3)
            zi = jnp.zeros((L, W), _I32)
            slot = jnp.concatenate([zi - 1, slot])
            sb = jnp.concatenate([zi, sb])
            sbc = jnp.concatenate([zi, sbc])
            base_lo = jnp.concatenate([zi, base_lo])
            init_at = jnp.concatenate([zi, init_at])
            ninit = jnp.concatenate([zi, ninit])
            etl = jnp.concatenate([jnp.swapaxes(ct[..., 0], 0, 1), etl])
            eth = jnp.concatenate([jnp.swapaxes(ct[..., 1], 0, 1), eth])
            etn = jnp.concatenate([jnp.swapaxes(ct[..., 2], 0, 1), etn])
            reset = jnp.concatenate([jnp.zeros(L, bool), reset])

        unroll = int(os.environ.get("QVZ_TPU_CODER_UNROLL", "0")) or \
            (1 if jax.default_backend() == "cpu" else 8)
        if timings is not None:
            np.asarray(slot.reshape(-1)[:1])    # readback fence
            timings["precompute"] = time.perf_counter() - t_seg
            t_seg = time.perf_counter()
        xs = (slot, sb, sbc, base_lo, init_at, ninit, etl, eth, etn,
              reset)
        if mesh is not None:
            carry, (w0, w1, f0, f1) = _mesh_lane_scan(
                xs, W, S, unroll, mesh)
        else:
            carry, (w0, w1, f0, f1) = _fused_scan(xs, W, S,
                                                  unroll=unroll)
    return _finish_lanes(carry, (w0, w1, f0, f1), W_real, timings,
                         t_seg)


@partial(jax.jit, static_argnames=("cols", "W", "L", "Wb", "Lb", "base",
                                   "padn", "with_ct"))
def _build_streams(md, qd, ct, cols, W, L, Wb, Lb, base, padn, with_ct):
    """The six kernel streams straight from the (cols, N) quantize
    outputs, in ONE jitted computation — the eager slice/pad/transpose
    chain cost ~15 dispatch round-trips per encode on remote-attached
    backends. ct: (Wb, Lb, 3) u32 cluster triples or a dummy when
    with_ct is False."""
    def lanes(x):
        r = x.astype(_I32)[:, base:]
        if padn:
            r = jnp.pad(r, ((0, 0), (0, padn)))
        r = r.reshape(cols, W, L)
        if Wb != W or Lb != L:
            r = jnp.pad(r, ((0, 0), (0, Wb - W), (0, Lb - L)))
        return jnp.swapaxes(r, 1, 2).reshape(cols * Lb, Wb)

    mid_s = lanes(md)
    qs_s = lanes(qd)
    csteps = cols * Lb
    etl = jnp.zeros((csteps, Wb), _U32)
    eth = jnp.ones((csteps, Wb), _U32)
    etn = jnp.ones((csteps, Wb), _U32)
    reset = (jnp.arange(csteps, dtype=_I32) % Lb) == 0
    if with_ct:
        zi = jnp.zeros((Lb, Wb), _I32)
        mid_s = jnp.concatenate([zi, mid_s])
        qs_s = jnp.concatenate([zi, qs_s])
        etl = jnp.concatenate([jnp.swapaxes(ct[..., 0], 0, 1), etl])
        eth = jnp.concatenate([jnp.swapaxes(ct[..., 1], 0, 1), eth])
        etn = jnp.concatenate([jnp.swapaxes(ct[..., 2], 0, 1), etn])
        reset = jnp.concatenate([jnp.zeros(Lb, bool), reset])
    return mid_s, qs_s, etl, eth, etn, reset


def encode_lanes_raw(plan: LanePlan, md, qd, lane_counts, base,
                     cluster_triples: np.ndarray | None,
                     timings: dict | None = None, mesh=None):
    """encode_lanes from the RAW (cols, N) quantize outputs: the lane
    slicing/padding/bucketing and stream assembly run inside one jitted
    computation feeding the Mosaic kernel directly. Falls back to the
    materialized encode_lanes when the kernel path is unavailable.
    mesh: shard the kernel/scan over the lane axis (see encode_lanes)."""
    t_seg = time.perf_counter()
    cols = md.shape[0]
    W = len(lane_counts)
    L = int(lane_counts[0])
    Lb = _bucket(L)
    mult = _lane_mult(mesh)
    Wb = -(-W // mult) * mult
    S = plan.S

    from qvz_tpu.ops import coder_pallas
    n_dev = mesh.devices.size if mesh is not None else 1
    pallas_flag = os.environ.get("QVZ_TPU_CODER_PALLAS", "1")
    use_pallas = (pallas_flag != "0"
                  and (jax.default_backend() != "cpu"
                       or pallas_flag == "interpret")
                  and Lb <= 2047
                  and coder_pallas.lane_group(
                      Wb // n_dev, S,
                      m_pad=plan.M if coder_pallas.use_totals()
                      else 0) > 0)
    if not use_pallas:
        def lanes_of(x):
            r = x[:, base:]
            padn = W * L - r.shape[1]
            if padn:
                r = jnp.pad(r, ((0, 0), (0, padn)))
            return r.reshape(cols, W, L)

        valid = np.zeros((W, L), dtype=bool)
        for w in range(W):
            valid[w, : int(lane_counts[w])] = True
        return encode_lanes(plan, lanes_of(md), lanes_of(qd), valid,
                            cluster_triples, timings=timings, mesh=mesh)

    padn = W * L - (int(np.sum(lane_counts)))
    with_ct = cluster_triples is not None
    if with_ct:
        ct = np.zeros((Wb, Lb, 3), dtype=np.uint32)
        ct[:, :, 1] = 1
        ct[:, :, 2] = 1
        ct[:W, :L] = cluster_triples
        ct = jnp.asarray(ct)
    else:
        ct = jnp.zeros((1, 1, 3), jnp.uint32)
    streams = _build_streams(md, qd, ct, cols, W, L, Wb, Lb, base,
                             padn, with_ct)
    if timings is not None:
        np.asarray(streams[0].reshape(-1)[:1])   # readback fence
        timings["precompute"] = time.perf_counter() - t_seg
        t_seg = time.perf_counter()

    tabs = (plan.kq, plan.init_counts_cols.astype(np.int32),
            plan.sbc_of_mid, plan.tmk, plan.tin,
            plan.slot_base.astype(np.int32))
    interp = pallas_flag == "interpret"
    bstep = coder_pallas.batch_steps()
    wg = coder_pallas.lane_group(
        Wb, S, m_pad=plan.M if coder_pallas.use_totals() else 0)
    if mesh is not None:
        carry, ys = _mesh_lane_kernel(streams, tabs, Wb, S, Lb,
                                      interp, bstep, mesh)
    elif wg >= Wb:
        carry, ys = coder_pallas.fused_scan_tables(
            streams, tabs, Wb, S, Lb, interpret=interp, bstep=bstep)
    else:
        mid_s, qs_s, etl, eth, etn, reset = streams
        parts = []
        for g0 in range(0, Wb, wg):
            g1 = min(Wb, g0 + wg)
            sg = tuple(a[:, g0:g1]
                       for a in (mid_s, qs_s, etl, eth, etn))
            parts.append(coder_pallas.fused_scan_tables(
                sg + (reset,), tabs, g1 - g0, S, Lb,
                interpret=interp, bstep=bstep))
        carry = tuple(jnp.concatenate([p[0][k] for p in parts])
                      for k in range(6))
        ys = tuple(jnp.concatenate([p[1][k] for p in parts], axis=1)
                   for k in range(4))
    return _finish_lanes(carry, ys, W, timings, t_seg)


@partial(jax.jit, static_argnames=("W", "S", "L", "bstep"))
def _pair_groups(sga, sgb, reset, tabs_j, W, S, L, bstep):
    """Two equal-width lane-group kernel calls in ONE jitted
    computation so XLA overlaps their pipelines (measured 1.14x at
    production table scale, 1.72x on small tables —
    build/onchip_perf.json concurrent2 legs). Module-level so the
    executable caches across encodes."""
    from qvz_tpu.ops import coder_pallas

    def one(sg):
        return coder_pallas.fused_scan_tables(
            sg + (reset,), tabs_j, W, S, L, bstep=bstep)

    return one(sga), one(sgb)


def pipeline_chunks() -> int:
    """Column-chunk count for the pipelined kernel path
    (QVZ_TPU_CODER_PIPELINE; 0/1 disables). Default 8: at the bench
    shape the d2h payload fetch (0.90 s) dominates the scan (0.51 s)
    on the tunnel-attached v5e, and 8 chunks hide all but the first
    chunk's scan behind the transfers."""
    return int(os.environ.get("QVZ_TPU_CODER_PIPELINE", "8"))


def _pipelined_raw(streams, tabs, Wb, W_real, S, L, cols, with_ct,
                   interp, bstep, nch, timings, t_seg):
    """Column-chunked kernel calls chained by the 6-word interval
    carry, each chunk's compacted payload words fetched d2h
    ASYNCHRONOUSLY while later chunks still run. On remote-attached
    devices the payload fetch is the dominant device_code cost
    (measured 0.90 s of 1.49 s at 500k x 100 / W=512), and chunking
    overlaps it with the remaining scan. Chunks cut at column
    boundaries, where the kernel's per-column counts table resets, so
    ONLY the interval state crosses the cut — byte-identical to the
    single-call form by construction (asserted in tests and on-chip).
    """
    from qvz_tpu.ops import coder_pallas
    mid_s, qs_s, etl, eth, etn, reset = streams
    csize = max(1, -(-cols // nch))
    bounds = list(range(0, cols, csize)) + [cols]
    seg_pre = L if with_ct else 0
    carry = None
    pending = []
    for k in range(len(bounds) - 1):
        c0, c1 = bounds[k], bounds[k + 1]
        lo = 0 if k == 0 else seg_pre + c0 * L
        hi = seg_pre + c1 * L
        ch = tuple(a[lo:hi] for a in (mid_s, qs_s, etl, eth, etn,
                                      reset))
        carry, (w0, w1, f0, f1) = coder_pallas.fused_scan_tables(
            ch, tabs, Wb, S, L, interpret=interp, bstep=bstep,
            carry0=carry, col0=c0, ncols=c1 - c0)
        counts = np.asarray(_word_counts(f0, f1))   # syncs chunk k
        mw = int(counts.max()) if counts.size else 0
        bucket = max(128, 1 << int(np.ceil(np.log2(max(mw, 1)))))
        words, _ = _compact(w0, w1, f0, f1, bucket)
        fine = min(bucket, max(128, -(-mw // 512) * 512))
        wf = words[:fine]
        try:
            wf.copy_to_host_async()   # d2h overlaps the next chunks
        except AttributeError:
            pass                      # interpret/CPU arrays
        pending.append((wf, counts))

    l, u, s3, buf, cnt, of = carry
    flags = np.asarray(of)
    l_h, s3_h = np.asarray(l), np.asarray(s3)
    buf_h, cnt_h = np.asarray(buf), np.asarray(cnt)
    parts = [(np.asarray(wf), cn) for wf, cn in pending]
    if timings is not None:
        timings["pipeline"] = time.perf_counter() - t_seg
        timings["pipeline_chunks"] = len(parts)
        t_seg = time.perf_counter()

    payloads = []
    for w in range(W_real):
        if flags[w]:
            payloads.append(None)
            continue
        words_w = np.concatenate([p[: cn[w], w] for p, cn in parts])
        payloads.append(finish_payload(
            words_w, int(l_h[w]), int(s3_h[w]), int(buf_h[w]),
            int(cnt_h[w])))
    if timings is not None:
        timings["assemble"] = time.perf_counter() - t_seg
    return payloads, flags[:W_real]


def _finish_lanes(carry, ys, W_real, timings, t_seg):
    """Shared tail: fetch carries, compact flagged words, assemble the
    per-lane payload byte strings."""
    w0, w1, f0, f1 = ys
    l, u, s3, buf, cnt, of = carry[:6]
    flags = np.asarray(of)
    if timings is not None:
        timings["scan"] = time.perf_counter() - t_seg
        t_seg = time.perf_counter()

    counts = np.asarray(_word_counts(f0, f1))
    max_words = int(counts.max()) if counts.size else 0
    # bucket to limit jit cache churn across calls
    bucket = max(128, 1 << int(np.ceil(np.log2(max(max_words, 1)))))
    words, counts2 = _compact(w0, w1, f0, f1, bucket)
    # fetch only a fine (512-word) bucket: the pow2 compaction bucket
    # keeps the expensive scatter executable compile-stable, but
    # fetching it wholesale shipped up to 2x the payload over d2h
    # (measured 1.15 s of a 1.70 s device_code on the tunneled v5e,
    # ~1.5x padding at that shape); a device slice to <=512 words of
    # padding is a trivially cheap executable per (bucket, fine) pair
    fine = min(bucket, max(128, -(-max_words // 512) * 512))
    words_h = np.asarray(words[:fine])
    counts_h = np.asarray(counts2)
    l_h, s3_h = np.asarray(l), np.asarray(s3)
    buf_h, cnt_h = np.asarray(buf), np.asarray(cnt)
    if timings is not None:
        timings["compact_fetch"] = time.perf_counter() - t_seg
        t_seg = time.perf_counter()

    payloads = []
    for w in range(W_real):
        if flags[w]:
            payloads.append(None)
            continue
        payloads.append(finish_payload(
            words_h[: counts_h[w], w], int(l_h[w]), int(s3_h[w]),
            int(buf_h[w]), int(cnt_h[w])))
    if timings is not None:
        timings["assemble"] = time.perf_counter() - t_seg
    return payloads, flags[:W_real]
