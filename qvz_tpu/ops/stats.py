"""Conditional statistics on device (reference: src/codebook.c:185-220).

The reference walks every line incrementing per-(cluster, column, prev,
cur) counters. Here the same counts come from one-hot int8 matmuls that
map onto the MXU: for each column, counts[(cluster, prev), cur] =
onehot(cluster*72+prev)^T @ onehot(cur), accumulated in int32 (exact).

Counts are exact integers, so any reduction order is parity-safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qvz_tpu.constants import ALPHABET_SIZE

# Per-cell counts must stay below int32; 71 * chunk < 2^31 always holds for
# the count itself (counts are bounded by chunk lines).
_CHUNK = 8_000_000


@partial(jax.jit, static_argnames=("n_clusters",))
def _hist_device(data_u8: jnp.ndarray, clusters_u8: jnp.ndarray,
                 n_clusters: int):
    """data_u8: (N, cols) uint8; clusters_u8: (N,) uint8.

    The raw bytes are transferred as-is (4x less traffic than int32) and
    widened on device. Returns (counts0 (C, 72) int32,
    cond (cols-1, C*72, 72) int32).
    """
    A = ALPHABET_SIZE
    ca = n_clusters * A
    n = data_u8.shape[0]
    data_t = data_u8.T.astype(jnp.int32)
    clusters = clusters_u8.astype(jnp.int32)

    base = clusters * A  # (N,)
    cluster_rows = jnp.arange(ca, dtype=jnp.int32)
    sym_cols = jnp.arange(A, dtype=jnp.int32)

    # Column-0 histogram per cluster.
    idx0 = base + data_t[0]
    counts0 = jax.ops.segment_sum(
        jnp.ones((n,), dtype=jnp.int32), idx0, num_segments=ca
    ).reshape(n_clusters, A)

    def step(carry, cols_pair):
        prev_col, cur_col = cols_pair
        prev_oh = (
            (base + prev_col)[:, None] == cluster_rows[None, :]
        ).astype(jnp.int8)
        cur_oh = (cur_col[:, None] == sym_cols[None, :]).astype(jnp.int8)
        h = jax.lax.dot_general(
            prev_oh, cur_oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return carry, h

    _, cond = jax.lax.scan(step, 0, (data_t[:-1], data_t[1:]))
    return counts0, cond


def conditional_counts(data: np.ndarray, clusters: np.ndarray | None,
                       n_clusters: int):
    """Host API matching qvz_tpu.spec.stats.conditional_counts.

    Chunks the reads axis so per-cell int32 counts cannot overflow, and
    accumulates chunk results in int64 on host.

    A fused Pallas variant exists (pallas_kernels.cond_hist_fused,
    bit-identical, VMEM-resident histograms); on v5e XLA lowers this
    scan at least as well, so the scan is the default. Set
    QVZ_TPU_PALLAS_HIST=1 to use the Pallas kernel.
    """
    import os

    A = ALPHABET_SIZE
    n, cols = data.shape
    if clusters is None:
        clusters = np.zeros(n, dtype=np.uint8)
    use_pallas_hist = bool(os.environ.get("QVZ_TPU_PALLAS_HIST"))
    counts0 = np.zeros((n_clusters, A), dtype=np.int64)
    cond = np.zeros((n_clusters, cols - 1, A, A), dtype=np.int64)
    is_dev = not isinstance(data, np.ndarray)
    # The reads-axis chunking exists to bound the one-hot matmul's
    # int32 accumulators; the CROSS-chunk sums stay exact in int32 for
    # any n < 2^31 (a cell cannot exceed n), so accumulate them ON
    # DEVICE and fetch once — per-chunk d2h of the 2 MB conditional
    # tensor was the device stats phase's dominant cost on narrow
    # links (~0.15 s per chunk at the measured 14 MB/s tunnel).
    dev_acc = n < (1 << 31)
    acc0 = accd = None
    for s in range(0, n, _CHUNK):
        e = min(n, s + _CHUNK)
        if is_dev:
            dt = data[s:e].astype(jnp.uint8)  # already on device
        else:
            dt = jnp.asarray(np.ascontiguousarray(data[s:e]),
                             dtype=jnp.uint8)
        cl = jnp.asarray(clusters[s:e], dtype=jnp.uint8)
        if use_pallas_hist:
            import jax

            from qvz_tpu.ops import pallas_kernels as pk
            dp = jnp.asarray(pk.pad_rows(np.asarray(dt)))
            clp = jnp.pad(cl, (0, dp.shape[0] - (e - s)))
            cd = pk.cond_hist_fused(
                dp, clp, jnp.int32(e - s), n_clusters,
                interpret=jax.default_backend() == "cpu")
            idx0 = cl.astype(jnp.int32) * A + dt[:, 0].astype(jnp.int32)
            c0 = jax.ops.segment_sum(
                jnp.ones((e - s,), dtype=jnp.int32), idx0,
                num_segments=n_clusters * A).reshape(n_clusters, A)
        else:
            c0, cd = _hist_device(dt, cl, n_clusters)
        if dev_acc:
            acc0 = c0 if acc0 is None else acc0 + c0
            accd = cd if accd is None else accd + cd
        else:
            counts0 += np.asarray(c0, dtype=np.int64)
            cd = np.asarray(cd, dtype=np.int64)  # (cols-1, C*72, 72)
            cond += cd.reshape(cols - 1, n_clusters, A,
                               A).transpose(1, 0, 2, 3)
    if dev_acc and acc0 is not None:
        counts0 += np.asarray(acc0, dtype=np.int64)
        cdh = np.asarray(accd, dtype=np.int64)
        cond += cdh.reshape(cols - 1, n_clusters, A,
                            A).transpose(1, 0, 2, 3)
    return counts0, cond
