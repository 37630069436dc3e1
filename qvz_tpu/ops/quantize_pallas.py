"""Mosaic (Pallas) kernel for the batched quantization pass.

Why: the XLA formulations of the quantize scan (per-column gathers and
the one-hot MXU rewrite, ops/quantize.py) both measured ~9-12 Msym/s
on the v5e at the bench shape — 25x slower than the round-5 coder
kernel, making quantize the device pipeline's dominant phase (the
round-2/3 "gathers are fast" note was a mis-fenced measurement: the
remote-attached backend's block_until_ready returns early, the same
gotcha bench.py documents). Reference semantics: the per-line
quantizer selection + application of src/qv_compressor.c:76-136.

Design (quantize is the coder kernel's easier sibling — the tables
are STATIC, so there are no updates and every lookup is a masked
sweep in the coder kernel's proven lane-replicated form):

  lanes  = READS, tiled (RB, 8, 128) = RB*1024 reads per invocation
           (RB=64 measured best: 191.8/247.6/255.2 Msym/s at
           32/48/64; all lane blocks dispatch in ONE jitted
           executable, QVZ_TPU_QUANT_FUSE);
  grid   = columns (the context recursion is sequential in columns,
           embarrassingly parallel over reads), replicating tables
           only for a WINDOW of columns at a time (768 MB budget —
           unwindowed replication is ~10 GB at 1022 columns) with
           prev threaded across windows via the prev0 input;
  prev   = previous column's reconstruction, carried in VMEM scratch;
  tables = per-column row arrays, lane-replicated to (rows, 8, 128)
           XLA-side and DMA'd into VMEM scratch per column:

  1. qr2[cluster*72 + prev]  = (pair p << 8) | qratio[p]
     (qratio = floor(ratio*128) can be 128 — 8 bits, codebook.c:156)
     — the ctx lookup (codebook.c:162's context) FOLDED into the
     qratio row at table-build time; swept by dense row-index compare
     against broadcasted_iota.
  2. MERGED state sweep (default form): one key/payload row pair per
     quantizer STATE — key = pc*256 + first_sym(state) (pc = 2*pair +
     choice), payload = 512 + (qv_state - qv_{state-1}).  A state
     matches iff its key is within [lane_b - 127, lane_b] for
     lane_b = pc*256 + sym (ONE unsigned compare: pc strides of 256
     put other pairs' deltas outside [0,128)), i.e. the matching
     states are exactly states 0..qs(sym), so
       acc = sum_rows where(d u< 128, payload, 0)
           = 512*(qs+1) + qv      (the qv deltas telescope)
     and qs = (acc >> 9) - 1, qv = acc & 511 — both outputs from one
     4-op/row sweep.  The earlier SPLIT form (kept as the VMEM
     fallback and under QVZ_TPU_QUANT_MERGED=0) does the same with
     two passes: bnd rows keyed on state-increment symbols (qs =
     match count) then qvt rows keyed (pc*128+qs)*128 with the
     reconstruction in the low 7 bits — ~1.7x the swept rows and a
     serialized second-table DMA.

Bit-exactness: every operation is exact int32 arithmetic identical to
the gather path's; tests assert element equality vs _quantize_device
(interpret mode) and container byte-parity on the real chip.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qvz_tpu.constants import ALPHABET_SIZE

_I32 = jnp.int32
_U32 = jnp.uint32
_LANE = 128
# kernel VMEM fit budget in (8,128) int32 rows (4 KB each): scoped
# VMEM is 16 MB with ~1.5 MB Mosaic overhead (a 3904-row config
# measured 17.52 MB); tests patch this to force the fallback chain
_ROW_BUDGET = 3300
def _rb() -> int:
    # lane-tile rows per invocation (x1024 reads); 64 = 64k reads.
    # QVZ_TPU_QUANT_RB tunes block size vs invocation count.
    return int(os.environ.get("QVZ_TPU_QUANT_RB", "64"))
_TC = 128                # table rows per sweep chunk


class QuantTables:
    """Per-Tables packed row arrays for the kernel (host numpy)."""

    def __init__(self, tables):
        A = ALPHABET_SIZE
        C, cols = int(tables.n_clusters), int(tables.columns)
        pb = np.asarray(tables.pair_base,
                        dtype=np.int64).reshape(C, cols)
        ctxmap = np.clip(
            np.asarray(tables.ctxmap,
                       dtype=np.int64).reshape(C, cols, A), 0, None)
        qratio = np.asarray(tables.qratio, dtype=np.int64)
        qs_map = np.asarray(tables.qs_map).reshape(-1, A)
        qv_map = np.asarray(tables.qv_map).reshape(-1, A)
        n_pairs = int(tables.n_pairs)
        nxt = np.append(pb.reshape(-1)[1:], n_pairs)
        nctx = (nxt - pb.reshape(-1)).reshape(C, cols)

        # 1. dense (cluster*72 + prev) -> (p << 8) | qratio[p]
        p_of = pb[:, :, None] + ctxmap                  # (C, cols, A)
        qr2 = ((p_of << 8) | qratio[p_of]).transpose(1, 0, 2).reshape(
            cols, C * A).astype(np.int32)

        # 2./3. per-column boundary and state-value rows (split form),
        # plus the merged-form key/payload row pair: one row per
        # quantizer STATE keyed pc*256 + first_sym(state), payload
        # 512 + (qv_k - qv_{k-1}).  Sum over the u<128 window then
        # yields BOTH outputs from one accumulator — the counts land
        # in bits 9+ (qs = (acc >> 9) - 1, state 0 always matches
        # since first_sym(0) = 0) and the qv deltas telescope to the
        # last matching state's value in bits 0..8 (qv = acc & 511;
        # exact: qv < 128 and card <= 72 so acc < 512*73).
        # Flat-vectorized over all pc rows at once (the per-pc Python
        # loop measured 0.35 s at the bench shape — longer than the
        # kernel it feeds; tests/test_pallas.py holds a loop-form
        # oracle asserting array equality).  Row order contract: per
        # column, (cluster asc, pair asc, choice asc) with boundary/
        # state positions ascending within a pc — pair indices ascend
        # (cluster, column)-lexicographically by construction, so ONE
        # stable sort of the globally pc-ordered rows by column
        # reproduces the order exactly.
        n2 = 2 * n_pairs
        qs2 = qs_map[:n2].astype(np.int64)
        qv2 = qv_map[:n2].astype(np.int64)
        col_of_pair = np.repeat(np.tile(np.arange(cols), C),
                                nctx.reshape(-1))
        col_of_pc = np.repeat(col_of_pair, 2)

        card = qs2.max(1) + 1                      # states per pc
        inc = qs2[:, 1:] != qs2[:, :-1]            # boundary marks
        counts_b = inc.sum(1)                      # = card - 1
        rpc, cpos = np.nonzero(inc)                # (pc, boundary-1)
        bnd_keys = rpc * 256 + cpos + 1

        total = int(card.sum())
        starts = np.concatenate(([0], np.cumsum(card)))[:-1]
        state_pc = np.repeat(np.arange(n2), card)
        k_in = np.arange(total) - np.repeat(starts, card)
        sb = np.concatenate(([0], np.cumsum(counts_b)))[:-1]
        occ = np.arange(len(rpc)) - np.repeat(sb, counts_b)
        first = np.zeros(total, np.int64)
        first[starts[rpc] + occ + 1] = cpos + 1    # state 0 stays 0
        qvv = qv2[state_pc, first]
        kt_rows = state_pc * 256 + first
        delta = qvv.copy()
        delta[1:] -= qvv[:-1]
        delta[starts] = qvv[starts]                # per-pc prepend-0
        vt_rows = 512 + delta
        qvt_rows = (state_pc * 128 + k_in) * 128 + qvv

        ord_b = np.argsort(col_of_pc[rpc], kind="stable")
        ord_s = np.argsort(col_of_pc[state_pc], kind="stable")
        col_b = col_of_pc[rpc][ord_b]
        col_s = col_of_pc[state_pc][ord_s]
        nb = np.bincount(col_b, minlength=cols).astype(np.int32)
        sv = np.bincount(col_s, minlength=cols).astype(np.int32)

        # pad table widths to sweep chunks; pad rows are sweep-inert
        # (bnd/kt sentinel 1<<29 and qvt -1 never match, qr2 pad rows
        # sit above every reachable dense index)
        def padw(x):
            return -(-max(x, 8) // _TC) * _TC

        nb_pad = padw(int(nb.max()) if cols else 8)
        sv_pad = padw(int(sv.max()) if cols else 8)
        rc_pad = padw(C * A)
        bnd_t = np.full((cols, nb_pad), 1 << 29, dtype=np.int32)
        qvt_t = np.full((cols, sv_pad), -1, dtype=np.int32)
        kt_t = np.full((cols, sv_pad), 1 << 29, dtype=np.int32)
        vt_t = np.zeros((cols, sv_pad), dtype=np.int32)
        qr2_t = np.zeros((cols, rc_pad), dtype=np.int32)
        qr2_t[:, : C * A] = qr2
        pos_b = (np.arange(len(col_b))
                 - np.concatenate(([0], np.cumsum(nb)))[:-1][col_b])
        pos_s = (np.arange(len(col_s))
                 - np.concatenate(([0], np.cumsum(sv)))[:-1][col_s])
        bnd_t[col_b, pos_b] = bnd_keys[ord_b]
        qvt_t[col_s, pos_s] = qvt_rows[ord_s]
        kt_t[col_s, pos_s] = kt_rows[ord_s]
        vt_t[col_s, pos_s] = vt_rows[ord_s]
        self.qr2, self.bnd, self.qvt = qr2_t, bnd_t, qvt_t
        self.kt, self.vt = kt_t, vt_t
        self.nb, self.sv = nb, sv
        self.RC = C * A
        self.C = C


def _qkernel(nb_ref, sv_ref, data_ref, draws_ref, ckey_ref, prev0_ref,
             qr2_ref, bnd_ref, qvt_ref,
             mid_ref, qs_ref, qv_ref,
             prev_ref, qrbuf_ref, tabbuf_ref, sem):
    """Tables arrive lane-replicated (cols, rows, 8, 128); the current
    column's qr table and bnd table are DMA'd up front, and the qvt
    table re-uses the big buffer after the bnd sweep (sequential DMAs
    keep the VMEM working set at one big table)."""
    i = pl.program_id(0)

    cp_qr = pltpu.make_async_copy(qr2_ref.at[i], qrbuf_ref, sem.at[0])
    cp_bnd = pltpu.make_async_copy(bnd_ref.at[i],
                                   tabbuf_ref.at[pl.ds(0, bnd_ref.shape[1])],
                                   sem.at[1])
    cp_qr.start()
    cp_bnd.start()

    @pl.when(i == 0)
    def _():
        # the column window's entry context (zeros for column 0 of
        # the file; the previous window's last qv otherwise)
        prev_ref[...] = prev0_ref[...]

    data = data_ref[0].astype(_I32)
    draw = draws_ref[0].astype(_I32)
    dq = ckey_ref[...] + prev_ref[...]          # cluster*72 + prev qv
    zl = jnp.zeros_like(data)

    cp_qr.wait()

    # 16-rows-per-iteration sweeps over FOUR independent accumulators:
    # one dynamic slice pulls a (16,8,128) group of replicated table
    # rows, then 16 STATIC sub-rows broadcast against the whole
    # (RB,8,128) lane block (free major-axis broadcasts). Measured
    # negative results shaping this form: row-at-a-time (dynamic slice
    # per row) ran ~8x slower (slice+loop overhead), and a SINGLE
    # accumulator ran ~2.7x under the issue regime — a ~2200-deep
    # sequential add chain stalls on VPU result latency; striping the
    # adds across 4 accumulators breaks the chain. (The stripe's
    # measured delta sat within the tunnel-window noise — 2.10 s in a
    # window where every phase ran ~25% slow vs 1.58-1.74 s earlier —
    # kept on the latency-chain argument; bit-exact either way.)
    def qr_row16(r8, accs):
        ch = qrbuf_ref[pl.ds(r8 * 16, 16)]
        dqm = dq - r8 * 16
        accs = list(accs)
        for j in range(16):
            accs[j % 4] = accs[j % 4] + jnp.where(dqm == j,
                                                  ch[j][None], 0)
        return tuple(accs)

    a4 = jax.lax.fori_loop(0, qrbuf_ref.shape[0] // 16, qr_row16,
                           (zl,) * 4)
    acc = (a4[0] + a4[1]) + (a4[2] + a4[3])
    p = jax.lax.shift_right_logical(acc, jnp.int32(8))
    qrv = acc & 255
    pc = p * 2 + (draw >= qrv).astype(_I32)

    lane_b = pc * 256 + data
    cp_bnd.wait()

    def bnd_row16(r8, qa):
        ch = tabbuf_ref[pl.ds(r8 * 16, 16)]
        qa = list(qa)
        for j in range(16):
            d = lane_b - ch[j][None]
            qa[j % 4] = qa[j % 4] + (d.astype(_U32)
                                     < jnp.uint32(128)).astype(_I32)
        return tuple(qa)

    q4 = jax.lax.fori_loop(0, (nb_ref[i] + 15) // 16, bnd_row16,
                           (zl,) * 4)
    qs = (q4[0] + q4[1]) + (q4[2] + q4[3])

    cp_qv = pltpu.make_async_copy(qvt_ref.at[i],
                                  tabbuf_ref.at[pl.ds(0, qvt_ref.shape[1])],
                                  sem.at[1])
    cp_qv.start()
    cp_qv.wait()

    lane_q = (pc * 128 + qs) * 128
    zc = jnp.zeros_like(data)

    def qv_row16(r8, accs):
        ch = tabbuf_ref[pl.ds(r8 * 16, 16)]
        accs = list(accs)
        for j in range(16):
            d = ch[j][None] - lane_q
            accs[j % 4] = accs[j % 4] + jnp.where(
                d.astype(_U32) < jnp.uint32(128), d, zc)
        return tuple(accs)

    v4 = jax.lax.fori_loop(0, (sv_ref[i] + 15) // 16, qv_row16,
                           (zc,) * 4)
    qv = (v4[0] + v4[1]) + (v4[2] + v4[3])

    prev_ref[...] = qv
    mid_ref[0] = 1 + pc
    qs_ref[0] = qs
    qv_ref[0] = qv


def _qkernel_merged(qrbound, nb_ref, sv_ref, data_ref, draws_ref,
                    ckey_ref, prev0_ref, qr2_ref, kt_ref, vt_ref,
                    mid_ref, qs_ref, qv_ref,
                    prev_ref, qrbuf_ref, ktbuf_ref, vtbuf_ref, sem):
    """Merged-sweep form (round-5 default): ONE pass over the per-state
    key/payload row pair replaces the bnd + qvt passes — mean swept
    rows drop from 128 + nb + sv (~1474 at the bench shape) to
    128 + sv (~854) at 4 vector ops/row (sub, unsigned-cmp, select,
    add; the split form's qvt rows cost ~5), and the serialized
    second-table DMA disappears (all three DMAs start at kernel
    entry).  The qr sweep is additionally BOUNDED to the block's
    [min dq, max dq] 16-row groups: prev is a quantizer OUTPUT, so
    the dense (cluster*72 + prev) indices concentrate in a narrow
    band and most of the 128-row padded sweep is provably matchless.
    Bit-exactness: acc = sum_{matching states k} (512 + qv_k -
    qv_{k-1}) = 512*(qs+1) + qv exactly (see QuantTables)."""
    i = pl.program_id(0)

    cp_qr = pltpu.make_async_copy(qr2_ref.at[i], qrbuf_ref, sem.at[0])
    cp_kt = pltpu.make_async_copy(kt_ref.at[i], ktbuf_ref, sem.at[1])
    cp_vt = pltpu.make_async_copy(vt_ref.at[i], vtbuf_ref, sem.at[2])
    cp_qr.start()
    cp_kt.start()
    cp_vt.start()

    @pl.when(i == 0)
    def _():
        prev_ref[...] = prev0_ref[...]

    data = data_ref[0].astype(_I32)
    draw = draws_ref[0].astype(_I32)
    dq = ckey_ref[...] + prev_ref[...]          # cluster*72 + prev qv
    zl = jnp.zeros_like(data)

    cp_qr.wait()

    # prev is a quantizer OUTPUT: the dense indices concentrate, so
    # bound the sweep to the block's [min dq, max dq] 16-row groups
    # (QVZ_TPU_QUANT_QRBOUND=0 for A/B attribution; threaded in as a
    # static jit arg so flipping the env retraces)
    if qrbound:
        g_lo = jnp.min(dq) // 16
        g_hi = jnp.max(dq) // 16 + 1
    else:
        # full-range sweep, but through the SAME traced while-loop
        # form: static python-int bounds make this kernel's qr loop
        # unroll, which crashes the Mosaic compile helper (observed
        # on the noqrbound attribution leg) — and an unrolled loop
        # would be a different program than the one being attributed
        g_lo = jnp.min(dq) * 0
        g_hi = g_lo + qrbuf_ref.shape[0] // 16

    def qr_row16(r8, accs):
        ch = qrbuf_ref[pl.ds(r8 * 16, 16)]
        dqm = dq - r8 * 16
        accs = list(accs)
        for j in range(16):
            accs[j % 4] = accs[j % 4] + jnp.where(dqm == j,
                                                  ch[j][None], 0)
        return tuple(accs)

    a4 = jax.lax.fori_loop(g_lo, g_hi, qr_row16, (zl,) * 4)
    acc = (a4[0] + a4[1]) + (a4[2] + a4[3])
    p = jax.lax.shift_right_logical(acc, jnp.int32(8))
    qrv = acc & 255
    pc = p * 2 + (draw >= qrv).astype(_I32)

    lane_b = pc * 256 + data
    cp_kt.wait()
    cp_vt.wait()

    def m_row16(r8, accs):
        chk = ktbuf_ref[pl.ds(r8 * 16, 16)]
        chv = vtbuf_ref[pl.ds(r8 * 16, 16)]
        accs = list(accs)
        for j in range(16):
            d = lane_b - chk[j][None]
            m = d.astype(_U32) < jnp.uint32(128)
            accs[j % 4] = accs[j % 4] + jnp.where(m, chv[j][None], 0)
        return tuple(accs)

    m4 = jax.lax.fori_loop(0, (sv_ref[i] + 15) // 16, m_row16,
                           (zl,) * 4)
    am = (m4[0] + m4[1]) + (m4[2] + m4[3])
    qs = jax.lax.shift_right_logical(am, jnp.int32(9)) - 1
    qv = am & 511

    prev_ref[...] = qv
    mid_ref[0] = 1 + pc
    qs_ref[0] = qs
    qv_ref[0] = qv


@partial(jax.jit, static_argnames=("interpret", "merged", "qrbound"))
def _quantize_block(data_b, draws_b, ckey, prev0, nb, sv, qr2, bnd,
                    qvt, interpret=False, merged=False, qrbound=True):
    """One invocation: (cols, RB, 8, 128) data/draws blocks; tables
    (cols, rows, 8, 128) lane-replicated."""
    cols = data_b.shape[0]
    rb = data_b.shape[1]
    blk = pl.BlockSpec((1, rb, 8, _LANE), lambda i, *_: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(memory_space=pl.ANY)
    if merged:
        # bnd/qvt args carry the kt/vt key/payload pair here
        tabs = [
            pltpu.VMEM((qr2.shape[1], 8, _LANE), _I32),  # qr table
            pltpu.VMEM((bnd.shape[1], 8, _LANE), _I32),  # key rows
            pltpu.VMEM((qvt.shape[1], 8, _LANE), _I32),  # payload rows
            pltpu.SemaphoreType.DMA((3,)),
        ]
        kern = partial(_qkernel_merged, qrbound)
    else:
        big = max(bnd.shape[1], qvt.shape[1])
        tabs = [
            pltpu.VMEM((qr2.shape[1], 8, _LANE), _I32),  # qr table
            pltpu.VMEM((big, 8, _LANE), _I32),           # bnd/qvt table
            pltpu.SemaphoreType.DMA((2,)),
        ]
        kern = _qkernel
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cols,),
        in_specs=[blk, blk,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  tab, tab, tab],
        out_specs=(blk, blk, blk),
        scratch_shapes=[pltpu.VMEM((rb, 8, _LANE), _I32)] + tabs,
    )
    out = jax.ShapeDtypeStruct((cols, rb, 8, _LANE), _I32)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(out, out, out),
        interpret=interpret,
    )(nb, sv, data_b, draws_b, ckey, prev0, qr2, bnd, qvt)


@partial(jax.jit, static_argnames=("rb_rows", "interpret", "merged",
                                   "nspan", "qrbound"))
def _quantize_spans(data_p, draws_p, ck_full, prev_flat, nb, sv, qr2,
                    bnd, qvt, rb_rows, interpret=False, merged=False,
                    nspan=1, qrbound=True):
    """Every lane block's kernel call inlined into one executable
    (QVZ_TPU_QUANT_FUSE, default on) — blocks are independent, so
    one dispatch covers the whole input and XLA overlaps the blocks'
    table DMAs with each other's sweeps."""
    cols = data_p.shape[0]
    span = rb_rows * 8 * _LANE
    outs = []
    for k in range(nspan):
        s0 = k * span
        db = data_p[:, s0:s0 + span].reshape(cols, rb_rows, 8, _LANE)
        rb = draws_p[:, s0:s0 + span].reshape(cols, rb_rows, 8, _LANE)
        ck = ck_full[s0:s0 + span].reshape(rb_rows, 8, _LANE)
        pv = prev_flat[s0:s0 + span].reshape(rb_rows, 8, _LANE)
        outs.append(_quantize_block(db, rb, ck, pv, nb, sv, qr2, bnd,
                                    qvt, interpret=interpret,
                                    merged=merged, qrbound=qrbound))
    return outs


def use_pallas_quantize() -> bool:
    """QVZ_TPU_QUANTIZE_PALLAS: 1 (default) = Mosaic kernel on
    accelerator backends; 0 = XLA gather scan; interpret = kernel via
    the Pallas interpreter (CPU equivalence tests)."""
    flag = os.environ.get("QVZ_TPU_QUANTIZE_PALLAS", "1")
    if flag == "0":
        return False
    return flag == "interpret" or jax.default_backend() != "cpu"


def quantize_pallas(qt: QuantTables, data_t, draws_t, cluster_ids, n):
    """(model_ids, qs, qv) each (cols, N) int32 device arrays.

    data_t/draws_t: (cols, N) device arrays (any int dtype); the N
    axis is tiled into (RB, 8, 128) invocations of _quantize_block,
    each carrying its own column recursion (reads are independent)."""
    interp = os.environ.get("QVZ_TPU_QUANTIZE_PALLAS") == "interpret"
    cols = data_t.shape[0]
    rb_rows = _rb()
    # VMEM fit model (rows of (8,128) int32 = 4 KB each): the current
    # column's tables live whole in scratch, plus the lane block's
    # streams (prev + ckey + double-buffered data/draws/3 outputs
    # ~ 13*rb rows).  Scoped VMEM is 16 MB with ~1.5 MB of Mosaic
    # overhead (measured: a 3904-row config allocated 17.52 MB), so
    # budget 3300 rows.  The merged single-sweep form (default) needs
    # key+payload resident at once (2*sv_pad); fall back to the split
    # shared-buffer form (max(nb,sv)) when that busts, shrinking the
    # lane block next, and to the XLA gather path (return None) when
    # even rb=8 cannot fit — huge multi-cluster high-rate tables.
    merged = os.environ.get("QVZ_TPU_QUANT_MERGED", "1") == "1"
    qr_pad = qt.qr2.shape[1]
    sv_pad = qt.qvt.shape[1]
    nb_pad = qt.bnd.shape[1]
    if merged and qr_pad + 2 * sv_pad + 13 * rb_rows > _ROW_BUDGET:
        merged = False
    if not merged:
        tab_rows = max(nb_pad, sv_pad)
        while (qr_pad + tab_rows + 13 * rb_rows > _ROW_BUDGET
               and rb_rows > 8):
            rb_rows //= 2
        if qr_pad + tab_rows + 13 * rb_rows > _ROW_BUDGET:
            return None
    span = rb_rows * 8 * _LANE
    n_pad = -(-n // span) * span
    if cluster_ids is None:
        ck_full = jnp.zeros(n_pad, _I32)
    else:
        ck_full = jnp.pad(jnp.asarray(cluster_ids).astype(_I32) * 72,
                          (0, n_pad - n))

    def pad_t(a):
        a = a.astype(_I32)
        return jnp.pad(a, ((0, 0), (0, n_pad - n)))

    def repl(a):
        a = jnp.asarray(a)
        return jnp.broadcast_to(a[:, :, None, None],
                                (a.shape[0], a.shape[1], 8, _LANE))

    data_p, draws_p = pad_t(data_t), pad_t(draws_t)
    nb = jnp.asarray(qt.nb)
    sv = jnp.asarray(qt.sv)
    nspan = n_pad // span
    qrb = os.environ.get("QVZ_TPU_QUANT_QRBOUND", "1") == "1"
    fuse = os.environ.get("QVZ_TPU_QUANT_FUSE", "1") == "1"

    # column WINDOWS bound the lane-replicated tables' device
    # footprint: replication costs rows_per_col x 4 KB per column
    # (~10 GB at the reference's 1022-column ceiling with bench-scale
    # tables), so only a window of columns is replicated at a time
    # and the context recursion's prev vector is threaded across
    # windows through the kernels' prev0 input.  QVZ_TPU_QUANT_COLW
    # overrides (0 = auto: ~768 MB replication budget).
    if merged:
        rows_per_col = qt.qr2.shape[1] + 2 * qt.qvt.shape[1]
    else:
        rows_per_col = (qt.qr2.shape[1]
                        + qt.bnd.shape[1] + qt.qvt.shape[1])
    colw = int(os.environ.get("QVZ_TPU_QUANT_COLW", "0"))
    if colw <= 0:
        colw = max(1, (768 * 2 ** 20) // (rows_per_col * 4096))
    colw = min(colw, cols)

    prev_flat = jnp.zeros(n_pad, _I32)
    parts: list = [[], [], []]
    for w0 in range(0, cols, colw):
        w1 = min(cols, w0 + colw)
        if merged:
            qr2, bnd, qvt = (repl(qt.qr2[w0:w1]), repl(qt.kt[w0:w1]),
                             repl(qt.vt[w0:w1]))
        else:
            qr2, bnd, qvt = (repl(qt.qr2[w0:w1]), repl(qt.bnd[w0:w1]),
                             repl(qt.qvt[w0:w1]))
        nbw, svw = nb[w0:w1], sv[w0:w1]
        dpw, rpw = data_p[w0:w1], draws_p[w0:w1]
        if fuse:
            # ALL lane blocks in ONE jitted dispatch: the blocks are
            # independent (the column recursion is per-read), so XLA
            # pipelines the kernels' DMAs against each other's
            # compute, and the host issues one tunnel round-trip
            outs = _quantize_spans(dpw, rpw, ck_full, prev_flat, nbw,
                                   svw, qr2, bnd, qvt, rb_rows,
                                   interpret=interp, merged=merged,
                                   nspan=nspan, qrbound=qrb)
        else:
            outs = []
            for s0 in range(0, n_pad, span):
                db = dpw[:, s0:s0 + span].reshape(w1 - w0, rb_rows, 8,
                                                  _LANE)
                rb = rpw[:, s0:s0 + span].reshape(w1 - w0, rb_rows, 8,
                                                  _LANE)
                ck = ck_full[s0:s0 + span].reshape(rb_rows, 8, _LANE)
                pv = prev_flat[s0:s0 + span].reshape(rb_rows, 8, _LANE)
                outs.append(_quantize_block(db, rb, ck, pv, nbw, svw,
                                            qr2, bnd, qvt,
                                            interpret=interp,
                                            merged=merged,
                                            qrbound=qrb))
        if w1 < cols:
            prev_flat = jnp.concatenate(
                [o[2][-1].reshape(-1) for o in outs])
        for k in range(3):
            parts[k].append(jnp.concatenate(
                [o[k].reshape(w1 - w0, span) for o in outs], axis=1))
    cat = [jnp.concatenate(p, axis=0)[:, :n] if len(p) > 1
           else p[0][:, :n] for p in parts]
    return cat[0], cat[1], cat[2]
