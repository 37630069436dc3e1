"""End-to-end spec encoder/decoder (oracle for the production paths).

Mirrors the reference drivers (src/main.c:18-160, src/qv_compressor.c)
symbol-for-symbol. Slow (scalar Python); use qvz_tpu.pipeline for real
workloads.
"""

from __future__ import annotations

from dataclasses import dataclass

import os

import numpy as np

from qvz_tpu.constants import ALPHABET_SIZE, MODE_RATIO, PHRED_OFFSET
from qvz_tpu.format import container
from qvz_tpu.ops.well import WellState
from qvz_tpu.spec import kmeans as spec_kmeans
from qvz_tpu.spec import stats as spec_stats
from qvz_tpu.spec.codebook import Codebook, generate_codebook
from qvz_tpu.spec.coder import (
    AdaptiveModel,
    ArithmeticDecoder,
    ArithmeticEncoder,
    BitReader,
    BitWriter,
)


def load_quality_file(path_or_bytes):
    """Parse a quality file into (N, cols) 0-based symbols (lines.c:27-82).

    Columns come from the first line's length; the line count is
    filesize // (columns+1) so a truncated trailing line is ignored.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = np.frombuffer(bytes(path_or_bytes), dtype=np.uint8)
    else:
        # memory-map like the reference (lines.c:64): pages fault in on
        # demand, so multi-GB files don't need an upfront read. Hint
        # sequential access so cold-cache reads ride kernel readahead.
        if hasattr(os, "posix_fadvise"):
            try:
                fd = os.open(path_or_bytes, os.O_RDONLY)
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_SEQUENTIAL)
                os.close(fd)
            except OSError:
                pass
        raw = np.memmap(path_or_bytes, dtype=np.uint8, mode="r")
    head = np.asarray(raw[: min(len(raw), 1 << 20)])
    nl = np.nonzero(head == ord("\n"))[0]
    if len(nl) == 0:
        raise ValueError("no newline found in quality file")
    columns = int(nl[0])
    lines = len(raw) // (columns + 1)
    data = raw[: lines * (columns + 1)].reshape(lines, columns + 1)
    # Framing check (divergence from the reference, which silently
    # mis-frames ragged files): every line must be `columns` long.
    bad = np.nonzero(data[:, columns] != ord("\n"))[0]
    if len(bad):
        raise ValueError(
            f"line {int(bad[0]) + 1} is not {columns} symbols long "
            "(all quality lines must have equal length)")
    # subtracting the Phred offset materializes the symbol matrix once
    # Strided Phred-strip copy (drops the newline column); threaded
    # over row blocks — numpy releases the GIL, and the single-threaded
    # strided copy was the load bottleneck at GB scale (10.7 s -> ~3 s
    # for 1 GB on 4 cores).
    n = data.shape[0]
    sym = np.empty((n, columns), dtype=np.uint8)
    if n >= 1 << 20:
        from concurrent.futures import ThreadPoolExecutor
        nt = min(8, os.cpu_count() or 1)
        block = -(-n // nt)

        def strip(t):
            lo, hi = t * block, min(n, (t + 1) * block)
            np.subtract(data[lo:hi, :columns], PHRED_OFFSET,
                        out=sym[lo:hi])

        with ThreadPoolExecutor(max_workers=nt) as ex:
            list(ex.map(strip, range(nt)))
    else:
        np.subtract(data[:, :columns], PHRED_OFFSET, out=sym)
    return sym


def lines_to_bytes(symbols: np.ndarray) -> bytes:
    """Symbols (N, cols) -> Phred+33 text with newlines."""
    n, cols = symbols.shape
    out = np.empty((n, cols + 1), dtype=np.uint8)
    out[:, :cols] = symbols + PHRED_OFFSET
    out[:, cols] = ord("\n")
    return out.tobytes()


def _build_models(codebooks, n_clusters):
    """Adaptive model bank (qv_stream.c:32-107)."""
    cluster_model = AdaptiveModel(n_clusters)
    models = []
    for cb in codebooks:
        per_cluster = []
        for col in cb.columns:
            per_col = []
            for j in range(col.input_alphabet.size):
                per_col.append(AdaptiveModel(col.lo[j].output_alphabet.size))
                per_col.append(AdaptiveModel(col.hi[j].output_alphabet.size))
            per_cluster.append(per_col)
        models.append(per_cluster)
    return cluster_model, models


@dataclass
class EncodeResult:
    compressed: bytes
    payload_bytes: int
    distortion: float
    reconstructed: np.ndarray  # (N, cols) quantized symbols (the -u output)
    codebooks: list
    clusters: np.ndarray


def encode(data: np.ndarray, dist_matrix: np.ndarray, *,
           n_clusters: int = 1, mode: int = MODE_RATIO, ratio: float = 0.5,
           cluster_threshold: float = 4.0,
           well_state: WellState | None = None) -> EncodeResult:
    n, columns = data.shape
    if well_state is None:
        well_state = WellState.debug()

    clusters, _, _ = spec_kmeans.kmeans_cluster(
        data, n_clusters, cluster_threshold)
    counts0, cond_counts = spec_stats.conditional_counts(
        data, clusters, n_clusters)

    dist = dist_matrix.tolist()
    codebooks = [
        generate_codebook(counts0[c].tolist(), cond_counts[c].tolist(),
                          columns, dist, mode, ratio)
        for c in range(n_clusters)
    ]

    well_bytes = well_state.to_bytes()
    cluster_model, models = _build_models(codebooks, n_clusters)

    writer = BitWriter()
    enc = ArithmeticEncoder(writer)
    recon = np.empty_like(data)
    total_distortion = 0.0

    for i in range(n):
        c = int(clusters[i])
        cb = codebooks[c]
        enc.encode(cluster_model, c)
        cluster_model.update(c)
        prev = 0
        error = 0.0
        row = data[i]
        for col in range(columns):
            book = cb.columns[col]
            idx = 0 if col == 0 else book.input_alphabet.index_of(prev)
            draw = well_state.next_bits(7)
            if draw >= book.qratio[idx]:
                q = book.hi[idx]
                j = 2 * idx + 1
            else:
                q = book.lo[idx]
                j = 2 * idx
            d = int(row[col])
            qv = q.q[d]
            q_state = q.output_alphabet.index_of(qv)
            model = models[c][col][j]
            enc.encode(model, q_state)
            model.update(q_state)
            error += dist[d][qv]
            recon[i, col] = qv
            prev = qv
        total_distortion += error / float(columns)

    payload_bytes = enc.finish()
    payload = bytes(writer.buf)
    compressed = container.build_container(
        codebooks, well_bytes, payload, columns, n)
    return EncodeResult(compressed, payload_bytes,
                        total_distortion / float(n), recon, codebooks,
                        clusters)


def decode(compressed: bytes) -> np.ndarray:
    """Decode a container to (N, cols) quantized symbols."""
    head = container.parse_container(compressed)
    n, columns = head.lines, head.columns
    well_state = WellState.from_bytes(head.well_state)
    cluster_model, models = _build_models(
        head.codebooks, head.cluster_count)

    reader = BitReader(compressed[head.payload_offset:])
    dec = ArithmeticDecoder(reader)
    out = np.empty((n, columns), dtype=np.uint8)

    for i in range(n):
        last_line = i == n - 1
        c = dec.decode(cluster_model)
        cluster_model.update(c)
        cb = head.codebooks[c]
        prev = 0
        for col in range(columns):
            book = cb.columns[col]
            idx = 0 if col == 0 else book.input_alphabet.index_of(prev)
            draw = well_state.next_bits(7)
            if draw >= book.qratio[idx]:
                q = book.hi[idx]
                j = 2 * idx + 1
            else:
                q = book.lo[idx]
                j = 2 * idx
            model = models[c][col][j]
            if last_line and col == columns - 1:
                q_state = dec.decode_last(model)
            else:
                q_state = dec.decode(model)
                model.update(q_state)
            qv = q.output_alphabet.symbols[q_state]
            out[i, col] = qv
            prev = qv
    return out
