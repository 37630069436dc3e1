"""Empirical statistics (reference: src/codebook.c:185-220).

Counts are exact integers so any summation order works; this numpy
implementation is the host oracle for the JAX device kernels.
"""

from __future__ import annotations

import numpy as np

from qvz_tpu.constants import ALPHABET_SIZE


def conditional_counts(data: np.ndarray, clusters: np.ndarray,
                       n_clusters: int):
    """Per-cluster column-0 and transition counts.

    data: (N, cols) uint8 symbols in [0, 72).
    Returns (counts0, cond_counts):
      counts0: (C, 72) int64 -- P(X_0) counts
      cond_counts: (C, cols-1, 72, 72) int64 -- [c, col-1, prev, cur]
    """
    A = ALPHABET_SIZE
    n, cols = data.shape
    counts0 = np.zeros((n_clusters, A), dtype=np.int64)
    cond = np.zeros((n_clusters, cols - 1, A, A), dtype=np.int64)
    for c in range(n_clusters):
        sel = data[clusters == c]
        counts0[c] = np.bincount(sel[:, 0], minlength=A)
        for col in range(1, cols):
            flat = sel[:, col - 1].astype(np.int64) * A + sel[:, col]
            cond[c, col - 1] = np.bincount(
                flat, minlength=A * A).reshape(A, A)
    return counts0, cond
