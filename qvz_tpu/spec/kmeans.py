"""k-means read clustering, reference-exact (src/cluster.c).

Reproduces the reference's exact integer/tie-break semantics because the
per-read cluster id is arithmetic-coded into the bitstream:

  * centroid seeds are drawn with unseeded libc rand() -- on glibc a
    deterministic seed-1 stream (cluster.c:192-206). Reads are addressed
    as (block, line) with 1M-line blocks (lines.h:12);
  * distances are exact integer squared-L2 (cluster.c:176-187);
  * assignment takes the first minimum (strict <, cluster.c:158-163);
  * new centroids are integer-division means with uint64 accumulators
    (cluster.c:113); max squared centroid motion <= threshold stops
    (cluster.c:231-233), capped at 1000 iterations.

The reference updates cluster->count during assignment WITHOUT resetting
between the distance pass and mean recalculation of the same iteration
(counts are reset only at iteration start, cluster.c:222-224), and the
stop check runs after recalculating means; replicated here.

This numpy implementation vectorizes within an iteration; all quantities
are exact integers so vectorization preserves bit-identical results.
"""

from __future__ import annotations

import numpy as np

from qvz_tpu.constants import MAX_KMEANS_ITERATIONS, MAX_LINES_PER_BLOCK
from qvz_tpu.utils.glibc_rand import GlibcRand


def seed_centroids(data: np.ndarray, n_clusters: int,
                   rand: GlibcRand | None = None,
                   verbose: bool = False) -> np.ndarray:
    """Pick initial centroids exactly like the reference (cluster.c:192).
    verbose mirrors the reference's seed print (cluster.c:202-204)."""
    if rand is None:
        rand = GlibcRand(1)
    n = data.shape[0]
    block_count = -(-n // MAX_LINES_PER_BLOCK)
    means = np.empty((n_clusters, data.shape[1]), dtype=np.uint8)
    for j in range(n_clusters):
        block_id = rand.rand() % block_count
        count = min(MAX_LINES_PER_BLOCK, n - block_id * MAX_LINES_PER_BLOCK)
        line_id = rand.rand() % count
        if verbose:
            print(f"Chose block {block_id}, line {line_id}.")
        means[j] = data[block_id * MAX_LINES_PER_BLOCK + line_id]
    return means


def kmeans_assign(data_i32: np.ndarray, means: np.ndarray) -> np.ndarray:
    """First-minimum assignment over exact integer distances."""
    m = means.astype(np.int64)
    d = data_i32.astype(np.int64)
    # (N, K) squared distances; exact in int64.
    dist = ((d[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(dist, axis=1).astype(np.uint8)  # first min wins


def kmeans_cluster(data: np.ndarray, n_clusters: int, threshold: float,
                   rand: GlibcRand | None = None):
    """Full reference k-means. Returns (assignments, means, iterations)."""
    n = data.shape[0]
    if n_clusters == 1:
        return np.zeros(n, dtype=np.uint8), data[:1].copy(), 0

    data_i32 = data.astype(np.int32)
    means = seed_centroids(data, n_clusters, rand)
    assign = np.zeros(n, dtype=np.uint8)
    iters = 0
    while iters < MAX_KMEANS_ITERATIONS:
        assign = kmeans_assign(data_i32, means)
        counts = np.bincount(assign, minlength=n_clusters).astype(np.uint64)
        # uint64 column accumulators, integer-division means
        acc = np.zeros((n_clusters, data.shape[1]), dtype=np.uint64)
        np.add.at(acc, assign, data.astype(np.uint64))
        # The reference divides unconditionally and crashes on an empty
        # cluster (cluster.c:113); guard with 1 but only for empty ones
        # (documented divergence -- reference behavior is a SIGFPE).
        div = np.maximum(counts, 1)[:, None]
        new_means = (acc // div).astype(np.uint8)
        moved = (((new_means.astype(np.float64)
                   - means.astype(np.float64)) ** 2).sum(axis=1)).max()
        means = new_means
        iters += 1
        if moved <= threshold:
            break
    return assign, means, iters


def verbose_iteration(means_before: np.ndarray,
                      means_after: np.ndarray) -> None:
    """Reference `-v` k-means prints (cluster.c:125-127 prints each
    cluster's squared movement inside recalculate_means, cluster.c:236-238
    a blank line per iteration): mirrored exactly so verbose stdout
    matches the reference. Call once per Lloyd iteration with the
    integer centroid matrices before/after."""
    d = means_after.astype(np.float64) - means_before.astype(np.float64)
    for i, moved in enumerate((d * d).sum(axis=1)):
        print(f"Cluster {i} moved {moved:f}.")
    print()


def verbose_total(iters: int) -> None:
    """Reference end-of-clustering print (cluster.c:241-243)."""
    print(f"\nTotal number of iterations: {iters}.")
