"""Production decoder pipeline (reference: src/main.c:132-160).

Decoding is inherently sequential (each symbol's context depends on the
previously decoded symbol and the shared adaptive-model state), so the
whole pass runs in the native C++ runtime after the container header and
codebook tables are parsed.
"""

from __future__ import annotations

import numpy as np

from qvz_tpu.format import container
from qvz_tpu.native import runtime as rt


def decode(compressed: bytes) -> np.ndarray:
    """Decode a container to Phred+33 text bytes (N, cols+1) w/ newlines."""
    cluster_count, columns, lines = container.read_header(compressed[:9])
    tables = rt.tables_from_blocks(compressed[9:], cluster_count, columns)
    pos = 9 + tables.consumed
    well_words = np.frombuffer(compressed[pos:pos + 128], dtype="<u4")
    payload = compressed[pos + 128:]
    return rt.decode_lines(tables, payload, lines, well_words)


def decode_to_file(compressed: bytes, path: str) -> int:
    out = decode(compressed)
    out.tofile(path)
    return out.shape[0]
