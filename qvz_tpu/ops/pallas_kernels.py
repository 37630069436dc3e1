"""Pallas TPU kernels for the hot device passes.

Fused k-means step (reference semantics: src/cluster.c:136-171, 80-131):
one pass over the reads block computes integer squared-L2 distances on
the MXU, first-minimum argmin assignment, and the per-cluster integer
centroid accumulators via a one-hot MXU matmul — the (N, K) distance
matrix and the (N, K) one-hot matrix never leave VMEM, unlike the
unfused lax path where XLA materializes both to HBM between ops.

All arithmetic is exact: symbols < 72 fit int8, per-block partial sums
fit int32 (block_n * 71 << 2^31), and cross-block accumulation happens
in the int32 output refs (revisited per grid step, init at step 0).
Assignment ties break to the lowest cluster index (strict < scan,
cluster.c:159), matching jnp.argmin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qvz_tpu.constants import ALPHABET_SIZE

_BLOCK_N = 512          # reads per grid step
_LANE = 128             # TPU lane width; K is padded to this


def _kmeans_kernel(nvalid_ref, data_ref, means_ref, msq_ref,
                   assign_ref, sums_ref, counts_ref, *, n_clusters):
    """Grid step over one block of reads.

    data_ref:  (BLOCK_N, C_pad) int8    symbols, zero-padded cols
    means_ref: (LANE, C_pad)   int8     centroids (rows >= K are zero)
    msq_ref:   (1, LANE)       int32    ||m||^2 per cluster, +inf pad
    assign_ref:(BLOCK_N, 1)    int32    per-read cluster id
    sums_ref:  (LANE, C_pad)   int32    centroid accumulators (all blocks)
    counts_ref:(1, LANE)       int32    cluster sizes (all blocks)
    """
    i = pl.program_id(0)
    nvalid = nvalid_ref[0]

    # All matmuls run in f32 on the MXU but stay EXACT: every partial
    # sum is an integer below 2^24 (cols <= 1022, symbols < 72 =>
    # x.m <= 1022*71^2 ~= 5.2M; one-hot sums <= BLOCK_N*71 ~= 36K), so
    # f32 accumulation is lossless in any order. Mosaic's integer
    # matmul/argmin paths are NYI on this toolchain.
    data = data_ref[:].astype(jnp.float32)
    xm = jax.lax.dot_general(                            # (BLOCK_N, LANE)
        data, means_ref[:].astype(jnp.float32).T,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # ||x||^2 is constant across clusters: irrelevant to the argmin.
    dist = msq_ref[:].astype(jnp.float32) - 2.0 * xm

    # First-minimum argmin (cluster.c:159 strict <). Mosaic's native
    # argmin lowering breaks ties toward the HIGHEST index, so compute
    # min-value then min-index-over-minima explicitly.
    lane0 = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    minval = jnp.min(dist, axis=1, keepdims=True)
    assign = jnp.min(jnp.where(dist == minval, lane0, _LANE),
                     axis=1).astype(jnp.int32)
    row = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_N, 1), 0)
    valid = (row + i * _BLOCK_N) < nvalid                # (BLOCK_N, 1)
    assign_ref[:] = jnp.where(valid, assign[:, None], 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_N, _LANE), 1)
    onehot = ((assign[:, None] == lane) & valid).astype(jnp.float32)
    part_sums = jax.lax.dot_general(                     # (LANE, C_pad)
        onehot.T, data, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    part_counts = jnp.sum(onehot, axis=0,
                          dtype=jnp.float32).astype(jnp.int32)[None, :]

    @pl.when(i == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)

    sums_ref[:] = sums_ref[:] + part_sums
    counts_ref[:] = counts_ref[:] + part_counts


@functools.partial(jax.jit, static_argnames=("n_clusters", "interpret"))
def kmeans_step_fused(data_u8: jnp.ndarray, means: jnp.ndarray,
                      n_valid: jnp.ndarray, n_clusters: int,
                      interpret: bool = False):
    """One fused Lloyd iteration.

    data_u8: (N_pad, cols) uint8 with N_pad % BLOCK_N == 0 (pad rows
    arbitrary); means: (K, cols) int32; n_valid: scalar int32 count of
    real rows. Returns (assign (N_pad,) int32, sums (K, cols) int32,
    counts (K,) int32); padded rows get assignment 0 and are excluded
    from sums/counts.
    """
    n_pad, cols = data_u8.shape
    c_pad = -(-cols // _LANE) * _LANE
    grid = n_pad // _BLOCK_N

    data_i8 = jnp.pad(data_u8.astype(jnp.int8),
                      ((0, 0), (0, c_pad - cols)))
    means_p = jnp.pad(means, ((0, _LANE - n_clusters), (0, c_pad - cols)))
    msq = jnp.sum(means_p * means_p, axis=1, dtype=jnp.int32)
    # +inf for padded clusters so argmin never selects them.
    lane_ids = jnp.arange(_LANE, dtype=jnp.int32)
    msq = jnp.where(lane_ids < n_clusters, msq, jnp.int32(2**31 - 1))

    kernel = functools.partial(_kmeans_kernel, n_clusters=n_clusters)
    assign, sums, counts = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((_BLOCK_N, c_pad), lambda i, sref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_LANE, c_pad), lambda i, sref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANE), lambda i, sref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((_BLOCK_N, 1), lambda i, sref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_LANE, c_pad), lambda i, sref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _LANE), lambda i, sref: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((_LANE, c_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, _LANE), jnp.int32),
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], dtype=jnp.int32), data_i8, means_p,
      msq[None, :])
    return (assign[:, 0], sums[:n_clusters, :cols],
            counts[0, :n_clusters])


def pad_rows(data: np.ndarray, block: int = _BLOCK_N) -> np.ndarray:
    n = data.shape[0]
    n_pad = -(-n // block) * block
    if n_pad == n:
        return data
    return np.pad(data, ((0, n_pad - n), (0, 0)))


# ---------------------------------------------------------------------------
# Fused conditional histogram (reference: src/codebook.c:185-203).
#
# cond[col-1, cluster*72 + prev, cur] += 1 for every adjacent symbol pair.
# One pass over the data: per (column-chunk, read-block) grid step, the
# per-column histograms accumulate in VMEM-resident output blocks via
# one-hot MXU matmuls; the unfused lax.scan path materializes the one-hot
# operands to HBM every column. f32 matmuls are exact (block counts
# <= BLOCK_N < 2^24).

_COL_CHUNK = 32


def _hist_kernel(nvalid_ref, prev_ref, cur_ref, cl_ref, out_ref, *,
                 n_pairs, ca):
    cc = pl.program_id(0)
    i = pl.program_id(1)
    nvalid = nvalid_ref[0]
    ca_pad = out_ref.shape[1]

    row = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_N, 1), 0)
    valid = (row + i * _BLOCK_N) < nvalid                 # (BLOCK_N, 1)
    cbase = cl_ref[:].astype(jnp.int32) * ALPHABET_SIZE   # (BLOCK_N, 1)
    ca_lane = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_N, ca_pad), 1)
    sym_lane = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_N, _LANE), 1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for k in range(_COL_CHUNK):
        @pl.when(cc * _COL_CHUNK + k < n_pairs)
        def _(k=k):
            prev = prev_ref[k, :].astype(jnp.int32)[:, None]  # (BLOCK_N,1)
            cur = cur_ref[k, :].astype(jnp.int32)[:, None]
            prev_oh = (((cbase + prev) == ca_lane) & valid
                       ).astype(jnp.float32)
            cur_oh = (cur == sym_lane).astype(jnp.float32)
            h = jax.lax.dot_general(
                prev_oh.T, cur_oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[k] = out_ref[k] + h.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("n_clusters", "interpret"))
def cond_hist_fused(data_u8: jnp.ndarray, clusters_u8: jnp.ndarray,
                    n_valid: jnp.ndarray, n_clusters: int,
                    interpret: bool = False):
    """Conditional transition histograms on TPU.

    data_u8: (N_pad, cols) uint8, N_pad % BLOCK_N == 0; clusters_u8:
    (N_pad,) uint8; n_valid: scalar count of real rows. Returns
    cond (cols-1, n_clusters*72, 72) int32.
    """
    n_pad, cols = data_u8.shape
    ca = n_clusters * ALPHABET_SIZE
    ca_pad = -(-ca // 8) * 8
    n_pairs = cols - 1
    pairs_pad = -(-n_pairs // _COL_CHUNK) * _COL_CHUNK

    data_t = data_u8.T.astype(jnp.int8)                   # (cols, N_pad)
    prev = jnp.pad(data_t[:-1], ((0, pairs_pad - n_pairs), (0, 0)))
    cur = jnp.pad(data_t[1:], ((0, pairs_pad - n_pairs), (0, 0)))
    cl = clusters_u8.astype(jnp.int8)[:, None]            # (N_pad, 1)

    kernel = functools.partial(_hist_kernel, n_pairs=n_pairs, ca=ca)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pairs_pad // _COL_CHUNK, n_pad // _BLOCK_N),
            in_specs=[
                pl.BlockSpec((_COL_CHUNK, _BLOCK_N),
                             lambda c, i, s: (c, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_COL_CHUNK, _BLOCK_N),
                             lambda c, i, s: (c, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK_N, 1), lambda c, i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_COL_CHUNK, ca_pad, _LANE),
                                   lambda c, i, s: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((pairs_pad, ca_pad, _LANE),
                                       jnp.int32),
        interpret=interpret,
    )(jnp.asarray([n_valid], dtype=jnp.int32), prev, cur, cl)
    return out[:n_pairs, :ca, :ALPHABET_SIZE]
