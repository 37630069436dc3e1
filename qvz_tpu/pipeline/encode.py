"""Production encoder pipeline.

Phase structure mirrors the reference driver (src/main.c:18-127) with the
heavy per-read passes on TPU and exact-semantics host steps in C++:

  1. load quality file                      (numpy, host)
  2. k-means clustering                     (JAX on device; numpy fallback)
  3. conditional statistics                 (JAX on device; numpy fallback)
  4. codebook design                        (C++, exact doubles)
  5. WELL dither draws                      (C++)
  6. quantization pass                      (JAX on device; C++ fallback)
  7. adaptive arithmetic coding             (C++, sequential parity mode)
  8. container assembly                     (host)
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from qvz_tpu.constants import MODE_RATIO, PHRED_OFFSET
from qvz_tpu.format import container
from qvz_tpu.native import runtime as rt
from qvz_tpu.ops.well import WellState
from qvz_tpu.spec import kmeans as np_kmeans
from qvz_tpu.spec import stats as np_stats
from qvz_tpu.spec.pipeline import lines_to_bytes, load_quality_file  # noqa: F401


@dataclass
class EncodeStats:
    lines: int = 0
    columns: int = 0
    payload_bytes: int = 0
    distortion: float = 0.0
    rate: float = 0.0
    phase_seconds: dict = field(default_factory=dict)


@dataclass
class EncodeOutput:
    compressed: bytes
    reconstructed: np.ndarray  # (N, cols) quantized symbols
    clusters: np.ndarray
    stats: EncodeStats


def encode(data: np.ndarray, dist_matrix: np.ndarray, *,
           n_clusters: int = 1, mode: int = MODE_RATIO, ratio: float = 0.5,
           cluster_threshold: float = 4.0,
           well_state: WellState | None = None,
           use_jax: bool = True,
           want_recon: bool = True) -> EncodeOutput:
    n, columns = data.shape
    if well_state is None:
        well_state = WellState.debug()
    stats = EncodeStats(lines=n, columns=columns)
    t0 = time.perf_counter()

    # --- clustering -------------------------------------------------------
    if n_clusters == 1:
        clusters = None
        cluster_arr = np.zeros(n, dtype=np.uint8)
    elif use_jax:
        from qvz_tpu.ops import kmeans as jx_kmeans
        cluster_arr, _, _ = jx_kmeans.kmeans_cluster(
            data, n_clusters, cluster_threshold)
        clusters = cluster_arr
    else:
        cluster_arr, _, _ = np_kmeans.kmeans_cluster(
            data, n_clusters, cluster_threshold)
        clusters = cluster_arr
    t1 = time.perf_counter()
    stats.phase_seconds["cluster"] = t1 - t0

    # --- statistics ---------------------------------------------------------
    if use_jax:
        from qvz_tpu.ops import stats as jx_stats
        counts0, cond_counts = jx_stats.conditional_counts(
            data, cluster_arr, n_clusters)
    else:
        counts0, cond_counts = np_stats.conditional_counts(
            data, cluster_arr, n_clusters)
    t2 = time.perf_counter()
    stats.phase_seconds["stats"] = t2 - t1

    # --- codebook design ------------------------------------------------------
    design = rt.Design(np.asarray(counts0), np.asarray(cond_counts),
                       mode, ratio, dist_matrix)
    blocks = design.serialized()
    tables = design.tables()
    t3 = time.perf_counter()
    stats.phase_seconds["design"] = t3 - t2

    # --- dither + quantization ------------------------------------------------
    well_bytes = well_state.to_bytes()
    order = [(well_state.n + i) & 31 for i in range(32)]
    state_words = np.asarray(well_state.state, dtype=np.uint32)[order]
    draws = rt.well_draws7(state_words, n * columns).reshape(n, columns)

    if use_jax:
        from qvz_tpu.ops import quantize as jx_quant
        model_ids, syms, recon = jx_quant.quantize(
            tables, data, cluster_arr, draws, want_recon=want_recon)
    else:
        model_ids, syms, recon = rt.quantize(
            tables, data, clusters, draws, want_recon=want_recon)
    t4 = time.perf_counter()
    stats.phase_seconds["quantize"] = t4 - t3

    # --- entropy coding ---------------------------------------------------------
    payload = rt.encode_lines(tables, clusters, model_ids, syms)
    t5 = time.perf_counter()
    stats.phase_seconds["code"] = t5 - t4

    compressed = container.build_container_raw(
        blocks, n_clusters, well_bytes, payload, columns, n)

    stats.payload_bytes = len(payload)
    stats.rate = (len(payload) * 8.0) / (float(n) * columns)
    if want_recon and recon is not None:
        # distortion = mean over lines of (sum_col d(x, q(x)) / columns)
        d = dist_matrix[data.reshape(-1), recon.reshape(-1)]
        stats.distortion = float(
            d.reshape(n, columns).sum(axis=1, dtype=np.float64).mean()
            / columns)
    return EncodeOutput(compressed, recon, cluster_arr, stats)
