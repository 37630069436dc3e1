"""Production decoder pipeline (reference: src/main.c:132-160).

Decoding is inherently sequential (each symbol's context depends on the
previously decoded symbol and the shared adaptive-model state), so the
whole pass runs in the native C++ runtime after the container header and
codebook tables are parsed.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

from qvz_tpu.format import container, container_v2
from qvz_tpu.native import runtime as rt


def _malformed_raises_valueerror(fn):
    """Error-type convergence at the decode boundary: a malformed or
    hostile container must always surface as ValueError, whatever the
    parsing internals tripped over (short-buffer slicing, struct
    unpacking, ctypes width conversion, an absurd claimed geometry
    blowing the allocator). The reference has no validation at all
    (codebook.c:560-586 trusts every byte); converging on one exception
    type is what makes ours testable and catchable."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (IndexError, OverflowError, MemoryError,
                struct.error) as e:
            raise ValueError(
                f"malformed container ({type(e).__name__}: {e})") from e
    return wrapper


def _sane_output_size(lines: int, columns: int) -> None:
    """Corrupt headers can claim absurd geometry; decoding then costs
    O(lines) even when the payload is tiny (the reference has the same
    blind spot — it trusts its header, main.c:150). Cap the claimed
    output size (default 1 TB, QVZ_TPU_MAX_DECODE_BYTES overrides)."""
    import os

    cap = int(os.environ.get("QVZ_TPU_MAX_DECODE_BYTES", 1 << 40))
    if lines * (columns + 1) > cap:
        raise ValueError(
            f"container claims {lines}x{columns} output "
            f"(> {cap} bytes); refusing (set QVZ_TPU_MAX_DECODE_BYTES "
            f"to raise)")


@_malformed_raises_valueerror
def decode(compressed: bytes, out: np.ndarray | None = None,
           verbose: bool = False) -> np.ndarray:
    """Decode a container to Phred+33 text bytes (N, cols+1) w/ newlines.

    Accepts both the reference-compatible v1 container and the sharded
    QVZ2 container (decoded with one host thread per shard). `out` may
    be a preallocated (lines, cols+1) uint8 buffer — e.g. an np.memmap —
    written in place."""
    if container_v2.is_v2(compressed):
        return _decode_v2(compressed, out)
    cluster_count, columns, lines = container.read_header(compressed[:9])
    _sane_output_size(lines, columns)
    tables = rt.tables_from_blocks(compressed[9:], cluster_count, columns)
    pos = 9 + tables.consumed
    well_words = np.frombuffer(compressed[pos:pos + 128], dtype="<u4")
    payload = compressed[pos + 128:]
    return rt.decode_lines(
        tables, payload, lines, well_words,
        out=out.reshape(-1) if out is not None else None,
        verbose=verbose)


def _decode_v2(compressed: bytes, out: np.ndarray | None = None
               ) -> np.ndarray:
    import os
    from concurrent.futures import ThreadPoolExecutor

    head = container_v2.parse(compressed, blocks_len=None)
    hdr = container_v2.header_size()
    tables = rt.tables_from_blocks(compressed[hdr:], head.cluster_count,
                                   head.columns)
    head = container_v2.parse(compressed, blocks_len=tables.consumed)
    cols = head.columns
    _sane_output_size(head.lines, cols)
    if out is None:
        out = np.empty((head.lines, cols + 1), dtype=np.uint8)
    offs = np.concatenate(
        [[0], np.cumsum([s.lines for s in head.shards])]).astype(np.int64)

    dec_fn = (rt.decode_colmajor if head.order == container_v2.ORDER_COL
              else rt.decode_lines)

    def run(i, init_bank=None, want_bank=False, draws_t=None):
        s = head.shards[i]
        well = np.frombuffer(s.well_state, dtype="<u4")
        payload = compressed[s.payload_off:s.payload_off + s.payload_len]
        if rt.xxh64(payload) != s.checksum:
            raise ValueError(
                f"shard {i} payload checksum mismatch (corrupt container)")
        if init_bank is not None or want_bank or draws_t is not None:
            if head.order != container_v2.ORDER_COL:
                raise ValueError("primed QVZ2 requires column-major order")
            return rt.decode_colmajor(
                tables, payload, s.lines, well,
                out=out[offs[i]:offs[i + 1]].reshape(-1),
                init_bank=init_bank, want_bank=want_bank, draws_t=draws_t)
        dec_fn(tables, payload, s.lines, well,
               out=out[offs[i]:offs[i + 1]].reshape(-1))

    if head.priming and len(head.shards) > 1:
        # Primed container: shard 0's decode is a serial stage (it
        # derives the shared prior). Overlap it with the OTHER shards'
        # dither-draw generation + transpose (checksum verify rides
        # along) — that work only needs each shard's WELL start state.
        from threading import Event, Thread

        bank_box = {}
        ready = Event()

        def warmup():
            _, bank_box["bank"] = run(0, want_bank=True)
            ready.set()

        wt = Thread(target=warmup)
        wt.start()

        def prep_and_decode(i):
            s = head.shards[i]
            well = np.frombuffer(s.well_state, dtype="<u4")
            draws_t = np.ascontiguousarray(rt.well_draws7(
                well, s.lines * cols).reshape(s.lines, cols).T)
            ready.wait()
            return run(i, init_bank=bank_box["bank"], draws_t=draws_t)

        with ThreadPoolExecutor(
                max_workers=min(len(head.shards) - 1,
                                os.cpu_count() or 1)) as ex:
            list(ex.map(prep_and_decode, range(1, len(head.shards))))
        wt.join()
    else:
        with ThreadPoolExecutor(
                max_workers=min(len(head.shards),
                                os.cpu_count() or 1)) as ex:
            list(ex.map(run, range(len(head.shards))))
    return out


@_malformed_raises_valueerror
def decode_to_file(compressed, path: str, verbose: bool = False) -> int:
    """Decode straight into a memory-mapped output file: shard threads
    write their line ranges in place and the OS flushes pages lazily —
    no second full-size copy at GB scale. `compressed` may be bytes or
    any buffer (e.g. an np.memmap of the container — see
    decode_file_to_file)."""
    if container_v2.is_v2(compressed):
        head = container_v2.parse(compressed, blocks_len=None)
        lines, cols = head.lines, head.columns
    else:
        _, cols, lines = container.read_header(bytes(compressed[:9]))
    if lines == 0:
        open(path, "wb").close()
        return 0
    _sane_output_size(lines, cols)
    mm = np.memmap(path, dtype=np.uint8, mode="w+",
                   shape=(lines, cols + 1))
    decode(compressed, out=mm, verbose=verbose)
    mm.flush()
    return lines


def decode_file_to_file(in_path: str, out_path: str,
                        verbose: bool = False) -> int:
    """Decode a container FILE without reading it into memory: the
    container is memory-mapped and shard payloads are sliced zero-copy
    (a whole-genome-scale QVZ2 container is tens of GB — reading it
    up front would double peak memory for no reason)."""
    import os

    if os.path.getsize(in_path) == 0:
        raise ValueError("empty container")
    mm_in = np.memmap(in_path, dtype=np.uint8, mode="r")
    return decode_to_file(mm_in, out_path, verbose=verbose)
