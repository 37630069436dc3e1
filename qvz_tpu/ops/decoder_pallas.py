"""Mosaic (Pallas) kernel for the lane-parallel QVZ2 entropy DECODER.

Decode twin of ops/coder_pallas.py: the XLA scan formulation of
ops/decoder_device.py pays per-op dispatch overhead for every coding
step; inside one kernel the same step body is VPU register math with
the occurrence-count table, the per-column lookup tables, the payload
words, and the previous-column symbol ring all VMEM-resident.

Per step and lane the kernel
  1. resolves the model from (cluster, prev-column symbol, dither
     draw) with one masked-sum pass over a per-column packed context
     table (Mosaic has no per-lane gather; comparison sums substitute —
     the trick the encode kernel established for its slot tables);
  2. recovers the model total n with one masked pass over the combo
     counts table (init<<12 | occurrences, the encode kernel's field
     layout and carry-freedom argument);
  3. finds the symbol by BISECTION over the model's slot range —
     ceil(log2 max-card) masked passes, each computing one cumulative
     boundary and comparing cum*range against (tl+1)*n exactly in
     u32 halves (decoder_device._mul64_20x22; the host's divide-free
     search, qvz_rt.cpp:473-476). Counting over per-slot prefix sums
     (the XLA scan's form) would need an S-axis cumsum per step —
     log2(S) shifted adds in-kernel — so bisection wins here even
     though its probes are data-dependent and cannot step-batch;
  4. extracts cum_hi/count/symbol and updates the occurrence table in
     one eq-masked pass, then advances the interval with the shared
     _exact_div / _e1_lu / _e3_lu closed forms;
  5. feeds the tag from a per-lane 96-bit register reservoir, refilled
     up to two payload words per step by ONE masked-sum pass over the
     lane's VMEM-resident payload words ((PW, W8, 128) — a word index
     never matches past the lane's payload, so overshoot reads are the
     host BitReader's zero fill for free).

The previous-column symbols live in a (Lp, W8, 128) VMEM ring indexed
by the in-column line number; in column-major order the value needed
at step t was produced exactly L steps earlier, so the ring is always
complete before it is read (column 0 reads an explicit zero, matching
qvz_decode_colmajor's prev_qv init).

Line counts that do not fill a whole 64-step block are padded with
no-op steps at the END of each column segment (pad = in-column line
index >= L): a padded step changes no state and consumes no bits —
unlike encode there is no no-op model trick available, so the pad mask
gates every state select explicitly.

Exactness: the interval/renorm math is the SAME jnp code as the XLA
scan (imported, not re-derived); byte-equality is asserted against the
host decoder in interpret-mode tests, and the compiled kernel is gated
on-chip (test_tpu_onchip) before it may become a production default —
interpret-green is NOT sufficient evidence on this toolchain (a
round-2 argmin tie-break divergence only surfaced on hardware).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qvz_tpu.ops.coder_device import (FULL, _exact_div, _shl32, _shr32)
from qvz_tpu.ops.decoder_device import (_e1_lu, _e3_lu, _lt64,
                                        _mul64_20x22)

_I32 = jnp.int32
_U32 = jnp.uint32

_LANE = 128
_BS = 64               # coding steps per grid block
_SC = 384              # slot-axis chunk per masked-sum pass
_SCW = 256             # payload-word chunk per refill pass
MASK12 = np.int32(0xFFF)
ARITH_R_I = np.int32(1 << 19)


def _spad(S: int) -> tuple[int, int]:
    sc = min(_SC, -(-S // _LANE) * _LANE)
    return -(-S // sc) * sc, sc


def _iota(shape):
    return jax.lax.broadcasted_iota(_I32, shape, 0)


# ------------------------------------------------------------------
# 96-bit per-lane bit reservoir (three u32 planes, MSB-first).


def _serve96(r0, r1, r2, nb, k):
    """Pop the top k (in [0, 21]) bits."""
    v = _shr32(r0, 32 - k)
    r0 = _shl32(r0, k) | _shr32(r1, 32 - k)
    r1 = _shl32(r1, k) | _shr32(r2, 32 - k)
    r2 = _shl32(r2, k)
    return v, r0, r1, r2, nb - k


def _ins96(r0, r1, r2, w, pos):
    """OR a 32-bit word in at bit offset pos (in [0, 63]) from the top."""
    r0 = r0 | _shr32(w, pos)
    lo_part = _shl32(w, jnp.clip(32 - pos, 0, 32))
    hi_part = _shr32(w, jnp.clip(pos - 32, 0, 32))
    r1 = r1 | jnp.where(pos <= 32, lo_part, hi_part)
    r2 = r2 | _shl32(w, jnp.clip(64 - pos, 0, 32))
    return r0, r1, r2


# ------------------------------------------------------------------
# VMEM sizing.


def fits(W: int, S: int, PW: int, Lp: int, p_pad: int) -> bool:
    """Whole working set vs the ~16 MB core VMEM with headroom (same
    calibration policy as coder_pallas.fits)."""
    s_pad, sc = _spad(S)
    w_pad = -(-W // _LANE) * _LANE
    w8 = w_pad // _LANE
    per_plane = w8 * _LANE * 4
    counts = s_pad * per_plane
    symw = s_pad * per_plane
    ptw = 2 * p_pad * per_plane
    payv = PW * per_plane
    prevq = Lp * per_plane
    temps = 4 * sc * per_plane
    tabs = (2 * s_pad + 2 * p_pad) * _LANE * 4
    streams = (1 + 1) * _BS * per_plane * 2 + 2 * 10 * per_plane
    return (counts + symw + ptw + payv + prevq + temps + tabs
            + streams) <= 13 * 2 ** 20


def lane_group(W: int, S: int, PW: int, Lp: int, p_pad: int) -> int:
    """Largest lane-group width (multiple of 128) that fits VMEM; 0 if
    even 128 lanes do not fit."""
    w = -(-W // _LANE) * _LANE
    while w >= _LANE:
        if fits(w, S, PW, Lp, p_pad):
            return w
        w -= _LANE          # every 128-multiple, not just halvings
    return 0


# ------------------------------------------------------------------
# The kernel.


def _dkernel(colmap_ref, lstart_ref, sbound_ref, bmax_ref,
             cs_ref, state_in_ref,
             pta_ref, ptb_ref, icc_ref, sym_ref, payw_ref,
             qv_ref, st_ref,
             counts_ref, symw_ref, ptw_ref, tabs_s_ref, tabs_p_ref,
             payv_ref, prevq_ref, state_ref, dma_sem,
             *, bs, s_pad, sc, p_pad, L_real, PW, window):
    i = pl.program_id(0)
    shape = cs_ref.shape[1:]                  # (w8, 128)
    w8 = shape[0]
    col = colmap_ref[i]
    lstart = lstart_ref[i]
    first = i == 0

    @pl.when(first)
    def _():
        cp = pltpu.make_async_copy(payw_ref, payv_ref, dma_sem.at[4])
        cp.start()
        cp.wait()
        for k in range(10):
            state_ref[k] = state_in_ref[k]

    @pl.when(first | (col != colmap_ref[jnp.maximum(i - 1, 0)]))
    def _():
        cps = [
            pltpu.make_async_copy(icc_ref.at[col], tabs_s_ref.at[0],
                                  dma_sem.at[0]),
            pltpu.make_async_copy(sym_ref.at[col], tabs_s_ref.at[1],
                                  dma_sem.at[1]),
            pltpu.make_async_copy(pta_ref.at[col], tabs_p_ref.at[0],
                                  dma_sem.at[2]),
            pltpu.make_async_copy(ptb_ref.at[col], tabs_p_ref.at[1],
                                  dma_sem.at[3]),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        # per-plane 2-D stores: middle-axis broadcasts scalarize in
        # Mosaic (coder_pallas gotcha) — widen tables one lane plane
        # at a time, and reset the combo counts to init<<12.
        ic12 = tabs_s_ref[0] << 12
        for k in range(w8):
            counts_ref[:, k, :] = ic12
            symw_ref[:, k, :] = tabs_s_ref[1]
            ptw_ref[0, :, k, :] = tabs_p_ref[0]
            ptw_ref[1, :, k, :] = tabs_p_ref[1]

    def load_state():
        s = [state_ref[k] for k in range(10)]
        s[6] = s[6].astype(_I32)            # nb
        s[7] = s[7].astype(_I32)            # wpos
        return tuple(s)

    # Payload-cursor window, ONCE per block: a lane fetches at most 2
    # words per step, so every refill mask inside this block hits
    # within [min wpos, max wpos + 2*bs + 1] — the refill pass then
    # sweeps only those chunks instead of all PW (lanes drift apart
    # slowly: same design, similar rates, so the window is typically
    # 1-2 chunks). Pad lanes edge-replicate a real lane (decode_scan_
    # tables), so their cursors track a real trajectory and cannot
    # blow the window. window=False compiles the full sweep instead
    # (perf bisection + fallback if rank-0 vector reductions turn out
    # NYI in compiled Mosaic — interpret cannot vouch for that).
    if window:
        wcur = state_ref[7].astype(_I32)
        cw_lo = jnp.min(wcur) // _SCW
        cw_hi = jnp.minimum((jnp.max(wcur) + 2 * bs + 1) // _SCW + 1,
                            PW // _SCW)
    else:
        cw_lo, cw_hi = 0, PW // _SCW

    def step(k, carry):
        l, u, t, r0, r1, r2, nb, wpos, bad, of = carry
        combo = cs_ref[k]
        cli = combo >> 7
        draw = combo & 127
        iline = lstart + k
        pad = iline >= L_real                 # scalar -> broadcasts

        # --- model resolution -------------------------------------
        prevv = prevq_ref[iline]
        prev = jnp.where(col == 0, 0, prevv)
        idx = cli * 72 + prev
        iop = _iota((p_pad,) + shape)
        m = (iop == idx[None]).astype(_I32)
        a = jnp.sum(ptw_ref[0] * m, axis=0)
        b = jnp.sum(ptw_ref[1] * m, axis=0)
        bad = bad | ((a < 0) & jnp.logical_not(pad)).astype(_U32)
        a = jnp.maximum(a, 0)
        qr = b >> 14
        hi_ch = draw >= qr
        sb = jnp.where(hi_ch, a & 0x1FFF, a >> 13)
        card = jnp.where(hi_ch, b & 127, (b >> 7) & 127)
        live = (card > 1) & jnp.logical_not(pad)

        # --- model total (one owner-masked pass) ------------------
        sbc = sb + card
        nch = (sbound_ref[i] + sc - 1) // sc

        def ch_n(ci, acc):
            c0 = ci * sc
            c = counts_ref[pl.ds(c0, sc)]
            io = _iota((sc,) + shape) + c0
            owner = ((io >= sb[None]) & (io < sbc[None])).astype(_I32)
            return acc + jnp.sum(c * owner, axis=0)

        zi = jnp.zeros(shape, _I32)
        acc_n = jax.lax.fori_loop(0, nch, ch_n, zi)
        n = (acc_n >> 12) + 8 * (acc_n & MASK12)
        n = jnp.where(n == 0, 1, n)           # bad/pad lanes only
        of = of | (live
                   & (n + 8 > ARITH_R_I)).astype(_U32)

        # --- symbol search: bisection on cum*range < (tl+1)*n ------
        bad = bad | (((t < l) | (t > u))
                     & jnp.logical_not(pad)).astype(_U32)
        rng = u - l + 1
        tl = t - l
        th, tlo = _mul64_20x22(n.astype(_U32), tl + 1)

        def bis(_, lh):
            blo, bhi = lh
            p = (blo + bhi) >> 1

            def ch_f(ci, acc):
                c0 = ci * sc
                c = counts_ref[pl.ds(c0, sc)]
                io = _iota((sc,) + shape) + c0
                mle = ((io >= sb[None])
                       & (io <= (sb + p)[None])).astype(_I32)
                return acc + jnp.sum(c * mle, axis=0)

            accf = jax.lax.fori_loop(0, nch, ch_f, zi)
            f = (accf >> 12) + 8 * (accf & MASK12)
            fh, fl2 = _mul64_20x22(f.astype(_U32), rng)
            pred = _lt64(fh, fl2, th, tlo)
            act = blo < bhi
            blo = jnp.where(act & pred, p + 1, blo)
            bhi = jnp.where(act & jnp.logical_not(pred), p, bhi)
            return blo, bhi

        blo, _bhi = jax.lax.fori_loop(
            0, bmax_ref[i], bis, (zi, jnp.maximum(card - 1, 0)))
        sx = sb + blo

        # --- extract + adaptive update (one eq-masked pass) --------
        live_i = live.astype(_I32)

        def ch_e(ci, acc):
            c0 = ci * sc
            c = counts_ref[pl.ds(c0, sc)]
            io = _iota((sc,) + shape) + c0
            me = (io == sx[None]).astype(_I32)
            mle = ((io >= sb[None]) & (io <= sx[None])).astype(_I32)
            a_le = acc[0] + jnp.sum(c * mle, axis=0)
            a_eq = acc[1] + jnp.sum(c * me, axis=0)
            a_qv = acc[2] + jnp.sum(symw_ref[pl.ds(c0, sc)] * me,
                                    axis=0)
            counts_ref[pl.ds(c0, sc)] = c + me * live_i[None]
            return (a_le, a_eq, a_qv)

        a_le, a_eq, qv = jax.lax.fori_loop(0, nch, ch_e, (zi, zi, zi))
        cum_hi = (a_le >> 12) + 8 * (a_le & MASK12)
        cntx = (a_eq >> 12) + 8 * (a_eq & MASK12)
        cum_lo = cum_hi - cntx

        # --- interval + renormalization ----------------------------
        chu = cum_hi.astype(_U32)
        clu = cum_lo.astype(_U32)
        nu = n.astype(_U32)
        qhi = jnp.where(chu == nu, rng, _exact_div(rng, chu, nu))
        qlo = jnp.where(clu == 0, _U32(0), _exact_div(rng, clu, nu))
        u2 = l + qhi - 1
        l2 = l + qlo
        k1, l2, u2 = _e1_lu(l2, u2)
        k3, msb_or, l2, u2 = _e3_lu(l2, u2)
        padb = jnp.broadcast_to(pad, shape)
        k1 = jnp.where(padb, 0, k1)
        k3 = jnp.where(padb, 0, k3)

        # --- bit feed: refill to >= 42 buffered bits, then serve ---
        need1 = (nb < 42) & jnp.logical_not(padb)
        need2 = (nb < 10) & jnp.logical_not(padb)

        def ch_w(ci, acc):
            c0 = ci * _SCW
            w = payv_ref[pl.ds(c0, _SCW)]
            io = _iota((_SCW,) + shape) + c0
            w1 = acc[0] + jnp.sum(w * (io == wpos[None]).astype(_I32),
                                  axis=0)
            w2 = acc[1] + jnp.sum(
                w * (io == (wpos + 1)[None]).astype(_I32), axis=0)
            return (w1, w2)

        W1, W2 = jax.lax.fori_loop(cw_lo, cw_hi, ch_w, (zi, zi))
        w1u = jnp.where(need1, W1.astype(_U32), _U32(0))
        r0, r1, r2 = _ins96(r0, r1, r2, w1u, nb)
        nb = nb + 32 * need1.astype(_I32)
        wpos = wpos + need1.astype(_I32)
        w2u = jnp.where(need2, W2.astype(_U32), _U32(0))
        r0, r1, r2 = _ins96(r0, r1, r2, w2u, nb)
        nb = nb + 32 * need2.astype(_I32)
        wpos = wpos + need2.astype(_I32)

        v1, r0, r1, r2, nb = _serve96(r0, r1, r2, nb, k1)
        t2 = (_shl32(t, k1) | v1) & FULL
        v3, r0, r1, r2, nb = _serve96(r0, r1, r2, nb, k3)
        t2 = ((_shl32(t2, k3) | v3) & FULL) ^ msb_or

        l = jnp.where(padb, l, l2)
        u = jnp.where(padb, u, u2)
        t = jnp.where(padb, t, t2)

        qv_out = jnp.where(padb, 0, qv)
        qv_ref[k] = qv_out
        prevq_ref[iline] = qv_out
        return (l, u, t, r0, r1, r2, nb, wpos, bad, of)

    carry = jax.lax.fori_loop(0, bs, step, load_state())
    for k, v in enumerate(carry):
        vu = v.astype(_U32)
        state_ref[k] = vu
        st_ref[k] = vu


@partial(jax.jit, static_argnames=("W", "S", "L_real", "Lp", "cols",
                                   "p_pad", "PW", "interpret",
                                   "window"))
def _run(combo, init_state, pta, ptb, icc, sym, payw,
         colmap, lstart, sbound, bmax,
         W, S, L_real, Lp, cols, p_pad, PW, interpret, window):
    """Jitted whole (pads/reshapes included — coder_pallas lesson: the
    eager ops around a kernel each pay a dispatch round-trip on
    remote-attached backends)."""
    T = combo.shape[0]
    w_pad = -(-W // _LANE) * _LANE
    w8 = w_pad // _LANE
    s_pad, sc = _spad(S)

    def padw(a):
        # EDGE replication: pad lanes mirror the last real lane, so
        # their payload cursors track a real trajectory and cannot
        # blow the refill window (constant-fill pads used to refill
        # every step — nb stuck low — and their cursors ran away)
        a = jnp.pad(a, ((0, 0), (0, w_pad - W)), mode="edge")
        return a.reshape(a.shape[0], w8, _LANE)

    combo_p = padw(combo.astype(_I32))
    state_p = padw(init_state.astype(_U32))

    def padtab(a, width, fill):
        a = jnp.pad(a.astype(_I32), ((0, 0), (0, width - a.shape[1])),
                    constant_values=fill)
        return jnp.broadcast_to(a[:, :, None], (cols, width, _LANE))

    pta_p = padtab(pta, p_pad, -1)
    ptb_p = padtab(ptb, p_pad, 0)
    icc_p = padtab(icc, s_pad, 0)
    sym_p = padtab(sym, s_pad, 0)

    PWp = -(-PW // _SCW) * _SCW
    payw_p = jnp.pad(payw.astype(_I32), ((0, PWp - PW), (0, 0)))
    payw_p = jnp.pad(payw_p, ((0, 0), (0, w_pad - W)), mode="edge")
    payw_p = payw_p.reshape(PWp, w8, _LANE)

    nblocks = T // _BS
    blk = pl.BlockSpec((_BS, w8, _LANE), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    cst = pl.BlockSpec((10, w8, _LANE), lambda i, *_: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(memory_space=pl.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[blk, cst] + [tab] * 5,
        out_specs=(blk, cst),
        scratch_shapes=[
            pltpu.VMEM((s_pad, w8, _LANE), _I32),     # counts combo
            pltpu.VMEM((s_pad, w8, _LANE), _I32),     # symw
            pltpu.VMEM((2, p_pad, w8, _LANE), _I32),  # ptw
            pltpu.VMEM((2, s_pad, _LANE), _I32),      # tabs_s
            pltpu.VMEM((2, p_pad, _LANE), _I32),      # tabs_p
            pltpu.VMEM((PWp, w8, _LANE), _I32),       # payv
            pltpu.VMEM((Lp, w8, _LANE), _I32),        # prevq ring
            pltpu.VMEM((10, w8, _LANE), _U32),        # carried state
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    qv, st = pl.pallas_call(
        partial(_dkernel, bs=_BS, s_pad=s_pad, sc=sc, p_pad=p_pad,
                L_real=L_real, PW=PWp, window=window),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, w8, _LANE), _I32),
            jax.ShapeDtypeStruct((10, w8, _LANE), _U32),
        ),
        interpret=interpret,
    )(colmap, lstart, sbound, bmax, combo_p, state_p,
      pta_p, ptb_p, icc_p, sym_p, payw_p)

    return (st.reshape(10, w_pad)[:, :W],
            qv.reshape(T, w_pad)[:, :W])


def decode_scan_tables(combo, init_state, tables, payw, col_slots,
                       W, S, L_real, Lp, cols, interpret=False,
                       window: bool | None = None):
    """Run the decode kernel over T = cols*Lp steps.

    combo: (T, W) i32 stream of cl*128 + draw; init_state: (10, W) u32
    per-lane start state (l, u, t, r0, r1, r2, nb, wpos, 0, 0);
    tables: (pta, ptb, icc, sym) host arrays — (cols, n_cl*72)x2 ctx
    tables (pta = sb_lo*2^13 + sb_hi or -1 at holes, ptb = qr*2^14 +
    card_lo*2^7 + card_hi) + (cols, S)x2 slot tables; payw: (PW, W)
    u32 payload words (big-endian bit order, zero past each lane's
    payload); col_slots: (cols,) per-column slot counts.

    Returns (state (10, W) u32 numpy-convertible, qv (T, W) i32)."""
    import os

    if window is None:
        window = os.environ.get("QVZ_TPU_DEC_WINDOW", "1") != "0"
    pta, ptb, icc, sym = tables
    T = combo.shape[0]
    assert T == cols * Lp and Lp % _BS == 0
    assert L_real <= 2047, "occurrence field is 12 bits (lane run cap)"
    assert S <= 8191, "slot base field is 13 bits"
    p_pad = -(-pta.shape[1] // _LANE) * _LANE
    PW = payw.shape[0]

    nblocks = T // _BS
    blk_i = np.arange(nblocks) * _BS
    colmap = (blk_i // Lp).astype(np.int32)
    lstart = (blk_i % Lp).astype(np.int32)
    sbound = np.asarray(col_slots, np.int32)[colmap]
    # per-column bisection depth: ceil(log2(max card)), card <= 72
    pb = np.asarray(ptb, np.int64)
    cards_hi = np.maximum(pb & 127, (pb >> 7) & 127)
    mx = cards_hi.max(axis=1) if cards_hi.size else np.ones(cols)
    bmax_c = np.ceil(np.log2(np.maximum(mx, 2))).astype(np.int32)
    bmax = np.maximum(bmax_c, 1)[colmap]

    payw_i = np.ascontiguousarray(payw, dtype=np.uint32).view(np.int32)
    return _run(jnp.asarray(combo, _I32), jnp.asarray(init_state, _U32),
                jnp.asarray(pta, _I32), jnp.asarray(ptb, _I32),
                jnp.asarray(icc, _I32), jnp.asarray(sym, _I32),
                jnp.asarray(payw_i),
                jnp.asarray(colmap), jnp.asarray(lstart),
                jnp.asarray(sbound), jnp.asarray(bmax),
                W, S, L_real, Lp, cols, p_pad, PW, interpret,
                window)
