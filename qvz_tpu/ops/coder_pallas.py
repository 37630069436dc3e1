"""Mosaic (Pallas) kernel for the lane-parallel QVZ2 entropy coder.

Drop-in accelerator for coder_device's fused scan: the XLA lax.scan
formulation executes ~80 separate HLO ops per coding step, and on TPU
each op in a scan body pays fixed dispatch/VMEM-roundtrip overhead —
measured 23-30 us per step at W=1024 REGARDLESS of S (the masked-sum
width), i.e. the scan is op-overhead-bound, not arithmetic-bound
(12.9 Msym/s end-to-end, BENCH r3 probes). Inside one Pallas kernel
the same per-step body is a handful of VPU register ops on (8, 128)
tiles, the occurrence-count table lives in VMEM scratch across the
whole shard, and the per-step streams are grid-pipelined from HBM.

Layout: W lanes as (W8, 128) tiles (W a multiple of 128); the
occurrence table counts as (S_pad, W8, 128) int32 VMEM scratch; the
coding-step streams (slot, sb, sbc, base_lo, init_at, ninit, etl, eth,
etn) as (T, W8, 128) HBM arrays auto-pipelined in (BS, W8, 128)
blocks. The column-boundary reset stream is scalar-prefetched (SMEM).

Bit-exactness: the per-step interval/renorm/emission body is the SAME
jnp code as the XLA path (coder_device._coder_step — imported, not
re-derived), and the model replay computes the identical masked range
sums over the identical slot table; tests assert byte-equality of the
produced containers against the host coder (reference semantics:
src/arith.c:24-96, src/qv_stream.c:9-25).

VMEM sizing: counts needs S_pad*W*4 bytes; with the 9 double-buffered
(BS, W, 4 B) stream blocks and 3 output blocks the budget fits the
~16 MB/core VMEM for S_pad*W*4 <= ~6 MB (e.g. S=1115 at W=1024 — the
bench design's shape). fits() reports this; callers fall back to the
XLA scan when it fails (e.g. high-rate designs at wide W).
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
_UNROLL = 1            # measured: unrolling the step loop does not help
_SC = 512              # slot-axis chunk per masked-sum pass
_VMEM_BUDGET = 6 * 2 ** 20   # counts-table budget (bytes)


def fits(W: int, S: int) -> bool:
    """True when the counts table for (W lanes, S slots) fits the
    kernel's VMEM budget."""
    s_pad = -(-S // 8) * 8
    w_pad = -(-W // _LANE) * _LANE
    return s_pad * w_pad * 4 <= _VMEM_BUDGET


def _kernel(reset_ref, sbound_ref, slot_ref, sb_ref, sbc_ref, blo_ref,
            init_ref, nin_ref, etl_ref, eth_ref, etn_ref,
            w0_ref, w1_ref, fl_ref, st_ref,
            counts_ref, state_ref, *, bs, s_pad, sc, unroll):
    i = pl.program_id(0)
    cdt = counts_ref.dtype              # int16 when lane runs allow

    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    shape = slot_ref.shape[1:]          # (W8, 128)
    # hoisted chunk-local iota (constant across steps)
    io0 = jax.lax.broadcasted_iota(_I32, (sc,) + shape, 0).astype(cdt)

    def init_carry():
        z = jnp.zeros(shape, _U32)
        return (z, jnp.full(shape, FULL, _U32), z, z, z, z)

    def load_carry():
        return tuple(state_ref[k] for k in range(6))

    carry0 = jax.lax.cond(i == 0, init_carry, load_carry)

    def step(t, carry):
        l, u, s3, buf, cnt, of = carry

        @pl.when(reset_ref[i * bs + t] == 1)
        def _():
            counts_ref[:] = jnp.zeros_like(counts_ref)

        slot = slot_ref[t]
        sb = sb_ref[t]
        sbc = sbc_ref[t]
        live = slot >= 0
        # narrow copies for the table ops (occurrence counts and their
        # range sums are bounded by the lane run length — see fits16)
        slot_c = slot.astype(cdt)
        sb_c = sb.astype(cdt)
        sbc_c = sbc.astype(cdt)
        livec = live.astype(cdt)

        # Masked range sums over the slot table, chunked; chunks at or
        # past this block's max sbc hold no slot any step can touch, so
        # the trip count is dynamic (scalar-prefetched block bound) —
        # short columns and the cluster-id segment (bound 0) skip the
        # table entirely.
        zc = jnp.zeros(shape, cdt)

        def chunk(ci, acc):
            s_lo, s_tot, prior = acc
            c0 = ci * sc
            c = counts_ref[pl.ds(c0, sc)]               # (sc, W8, 128)
            io = io0 + c0.astype(cdt)
            in_m = io >= sb_c[None]
            s_lo = s_lo + jnp.sum(
                c * ((io < slot_c[None]) & in_m).astype(cdt), axis=0,
                dtype=cdt)
            s_tot = s_tot + jnp.sum(
                c * ((io < sbc_c[None]) & in_m).astype(cdt), axis=0,
                dtype=cdt)
            eq = (io == slot_c[None]).astype(cdt)
            prior = prior + jnp.sum(c * eq, axis=0, dtype=cdt)
            counts_ref[pl.ds(c0, sc)] = c + eq * livec[None]
            return (s_lo, s_tot, prior)

        nch = (sbound_ref[i] + sc - 1) // sc
        s_lo, s_tot, prior = jax.lax.fori_loop(
            0, nch, chunk, (zc, zc, zc))
        s_lo = s_lo.astype(_I32)
        s_tot = s_tot.astype(_I32)
        prior = prior.astype(_I32)

        cum_lo = blo_ref[t] + STEP * s_lo
        cum_hi = cum_lo + init_ref[t] + STEP * prior
        total = nin_ref[t] + STEP * s_tot
        of = of | (live & (total + STEP
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
        return (l, u, s3i.astype(_U32), buf, cnti.astype(_U32),
                of | of2.astype(_U32))

    def steps(k, carry):
        for j in range(unroll):         # amortize loop overhead
            carry = step(k * unroll + j, carry)
        return carry

    l, u, s3, buf, cnt, of = jax.lax.fori_loop(
        0, bs // unroll, steps, carry0)
    for k, v in enumerate((l, u, s3, buf, cnt, of)):
        state_ref[k] = v
        st_ref[k] = v


@partial(jax.jit, static_argnames=("W", "S", "max_run", "interpret"))
def fused_scan_pallas(xs, W, S, max_run=None, interpret=False):
    """Same contract as coder_device._fused_scan (minus the counts
    carry): xs = (slot, sb, sbc, base_lo, init_at, ninit, etl, eth,
    etn, reset) with (T, W) streams; returns ((l, u, s3, buf, cnt, of),
    (w0, w1, f0, f1)).

    max_run: static bound on steps between counts resets (the lane/
    column run length). When every occurrence count and range sum
    provably fits int16 (max_run < 2^15 and S < 2^15), the slot table
    and its masked sums run at 16-bit — double VPU lane throughput on
    the kernel's dominant term."""
    slot, sb, sbc, blo, init_at, ninit, etl, eth, etn, reset = xs
    T = slot.shape[0]
    w_pad = -(-W // _LANE) * _LANE
    t_pad = -(-T // _BS) * _BS
    sc = min(_SC, -(-S // 8) * 8)
    s_pad = -(-S // sc) * sc            # dynamic chunk slices need
    # every chunk full-size
    run = T if max_run is None else max_run
    # int16 halves the dominant masked-sum cost but this Mosaic
    # toolchain cannot lower reductions over int16 (verified on-chip:
    # "Reductions over int16 not implemented") — opt-in for future
    # toolchains; value-safety condition kept exact.
    use_i16 = (os.environ.get("QVZ_TPU_CODER_I16") == "1"
               and run < 2 ** 15 and s_pad < 2 ** 15)
    cdt = jnp.int16 if use_i16 else _I32

    def pad(a, fill):
        a = jnp.pad(a, ((0, t_pad - T), (0, w_pad - W)),
                    constant_values=fill)
        return a.reshape(t_pad, w_pad // _LANE, _LANE)

    # padded steps/lanes are no-op triples: provably neither move the
    # interval nor emit bits, so they cannot perturb carry or output
    ins = (pad(slot, -1), pad(sb, 0), pad(sbc, 0), pad(blo, 0),
           pad(init_at, 0), pad(ninit, 0), pad(etl, 0), pad(eth, 1),
           pad(etn, 1))
    reset_p = jnp.pad(reset.astype(_I32), (0, t_pad - T))
    # per-block slot-table bound: max sbc over the block's steps
    sbound = jnp.max(ins[2].reshape(t_pad // _BS, -1), axis=1)

    w8 = w_pad // _LANE
    blk = pl.BlockSpec((_BS, w8, _LANE), lambda i, *_: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // _BS,),
        in_specs=[blk] * 9,
        out_specs=(blk, blk, blk,
                   pl.BlockSpec((6, w8, _LANE), lambda i, *_: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((s_pad, w8, _LANE), cdt),
            pltpu.VMEM((6, w8, _LANE), _U32),
        ],
    )
    w0, w1, fl, st = pl.pallas_call(
        partial(_kernel, bs=_BS, s_pad=s_pad, sc=sc, unroll=_UNROLL),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, w8, _LANE), _U32),
            jax.ShapeDtypeStruct((t_pad, w8, _LANE), _U32),
            jax.ShapeDtypeStruct((t_pad, w8, _LANE), _I32),
            jax.ShapeDtypeStruct((6, w8, _LANE), _U32),
        ),
        interpret=interpret,
    )(reset_p, sbound, *ins)

    def unpad_t(a):
        return a.reshape(t_pad, w_pad)[:T, :W]

    w0, w1, fl = unpad_t(w0), unpad_t(w1), unpad_t(fl)
    stf = st.reshape(6, w_pad)[:, :W]
    carry = (stf[0], stf[1], stf[2].astype(_I32), stf[3],
             stf[4].astype(_I32), stf[5] != 0)
    return carry, (w0, w1, (fl & 1) != 0, (fl & 2) != 0)
