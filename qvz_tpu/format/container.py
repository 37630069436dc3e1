"""QVZ compressed-container format (bit-compatible with the reference).

Layout (reference: src/codebook.c:474-555, src/qv_stream.c:66-117):

    [0]      1 byte   cluster count
    [1:5]    4 bytes  columns, big-endian uint32
    [5:9]    4 bytes  lines, big-endian uint32 (truncated from u64!)
    then per cluster, an ASCII-ish codebook block:
        line: qratio[0][0]+33, '\n'
        line: 72 bytes column-0 lo quantizer map (+33), '\n'
        line: 72 bytes column-0 hi quantizer map (+33), '\n'
        per column i >= 1:
            line: qratio[i][ctx]+33 for each context, '\n'
            line: 72 bytes per context, lo maps in context order, '\n'
            line: 72 bytes per context, hi maps in context order, '\n'
    then 128 bytes raw little-endian WELL-1024a state
    then the arithmetic-coded payload (zero-padded to a byte, with an
    extra 0x00 byte when the tag ends on a byte boundary).

Context counts per column are not stored: the decoder re-derives them as
the running union of the previous column's per-quantizer output alphabets
(codebook.c:623-659). Output alphabets come from adjacent-deduplication of
each 72-entry map, NOT sorted-unique (quantizer.c:167-191).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from qvz_tpu.constants import ALPHABET_SIZE, PHRED_OFFSET
from qvz_tpu.spec.alphabet import Alphabet, alphabet_union
from qvz_tpu.spec.codebook import Codebook, ColumnBook
from qvz_tpu.spec.quantizer import Quantizer, find_output_alphabet


def write_header(cluster_count: int, columns: int, lines: int) -> bytes:
    # lines is truncated to uint32 exactly like codebook.c:482 (kept for
    # bit parity), but unlike the reference we warn: a >=2^32-line v1
    # container decodes to the wrong line count. QVZ2 stores u64.
    if lines >= 2**32:
        import warnings
        warnings.warn(
            f"v1 container truncates line count {lines} to uint32 "
            f"(reference quirk, codebook.c:482); the file will not decode "
            f"fully — use the QVZ2 sharded container (--shards) instead",
            RuntimeWarning, stacklevel=2)
    return struct.pack(">B", cluster_count) + \
        struct.pack(">I", columns) + struct.pack(">I", lines & 0xFFFFFFFF)


def read_header(data):
    if len(data) < 9:
        raise ValueError("container too short for header")
    # int() so buffer-protocol inputs (np.memmap) don't leak numpy
    # scalars whose fixed width overflows in later arithmetic
    cluster_count = int(data[0])
    columns, lines = struct.unpack(">II", bytes(data[1:9]))
    if cluster_count == 0 or columns == 0:
        raise ValueError("malformed container header")
    return cluster_count, columns, lines


def serialize_codebook(book: Codebook) -> bytes:
    out = bytearray()
    col0 = book.columns[0]
    out.append((col0.qratio[0] + PHRED_OFFSET) & 0xFF)
    out.append(ord("\n"))
    out.extend((v + PHRED_OFFSET) & 0xFF for v in col0.lo[0].q)
    out.append(ord("\n"))
    out.extend((v + PHRED_OFFSET) & 0xFF for v in col0.hi[0].q)
    out.append(ord("\n"))

    for col in book.columns[1:]:
        out.extend((qr + PHRED_OFFSET) & 0xFF for qr in col.qratio)
        out.append(ord("\n"))
        for q in col.lo:
            out.extend((v + PHRED_OFFSET) & 0xFF for v in q.q)
        out.append(ord("\n"))
        for q in col.hi:
            out.extend((v + PHRED_OFFSET) & 0xFF for v in q.q)
        out.append(ord("\n"))
    return bytes(out)


class _Cursor:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def take(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def skip_newline(self) -> None:
        # The reference uses fgets(line, 2, fp) which consumes one byte
        # ('\n'); '\r\n' files would need two but the writer emits '\n'.
        if self.pos < len(self.data) and self.data[self.pos] == ord("\n"):
            self.pos += 1

    def read_line(self) -> bytes:
        end = self.data.index(b"\n", self.pos)
        b = self.data[self.pos:end]
        self.pos = end + 1
        return b


def parse_codebook(cur: _Cursor, columns: int) -> Codebook:
    """Rebuild one cluster's codebook (codebook.c:586-669)."""
    A = ALPHABET_SIZE
    books = []

    qratio0 = (cur.read_line()[0] - PHRED_OFFSET) & 0xFF
    lo_map = [b - PHRED_OFFSET for b in cur.read_line()[:A]]
    hi_map = [b - PHRED_OFFSET for b in cur.read_line()[:A]]
    q_lo = Quantizer(lo_map, find_output_alphabet(lo_map))
    q_hi = Quantizer(hi_map, find_output_alphabet(hi_map))
    uniques = alphabet_union(q_lo.output_alphabet, q_hi.output_alphabet)

    book0 = ColumnBook(Alphabet([0]))
    book0.lo.append(q_lo)
    book0.hi.append(q_hi)
    book0.ratio.append(0.0)
    book0.qratio.append(qratio0)
    books.append(book0)

    for _ in range(1, columns):
        size = uniques.size
        book = ColumnBook(uniques)
        next_uniques = Alphabet([])

        ratio_line = cur.read_line()
        book.qratio = [(ratio_line[i] - PHRED_OFFSET) & 0xFF
                       for i in range(size)]
        book.ratio = [0.0] * size

        for _ in range(size):
            m = [b - PHRED_OFFSET for b in cur.take(A)]
            q = Quantizer(m, find_output_alphabet(m))
            book.lo.append(q)
            next_uniques = alphabet_union(next_uniques, q.output_alphabet)
        cur.skip_newline()
        for _ in range(size):
            m = [b - PHRED_OFFSET for b in cur.take(A)]
            q = Quantizer(m, find_output_alphabet(m))
            book.hi.append(q)
            next_uniques = alphabet_union(next_uniques, q.output_alphabet)
        cur.skip_newline()

        books.append(book)
        uniques = next_uniques

    return Codebook(books)


@dataclass
class ContainerHead:
    cluster_count: int
    columns: int
    lines: int
    codebooks: list          # [Codebook] per cluster
    well_state: bytes        # 128 raw bytes
    payload_offset: int      # byte offset of the arithmetic payload


def parse_container(data: bytes) -> ContainerHead:
    cluster_count, columns, lines = read_header(data[:9])
    cur = _Cursor(data, 9)
    codebooks = [parse_codebook(cur, columns) for _ in range(cluster_count)]
    well_state = bytes(cur.take(128))
    return ContainerHead(cluster_count, columns, lines, codebooks,
                         well_state, cur.pos)


def build_container(codebooks, well_state: bytes, payload: bytes,
                    columns: int, lines: int) -> bytes:
    out = bytearray()
    out.extend(write_header(len(codebooks), columns, lines))
    for cb in codebooks:
        out.extend(serialize_codebook(cb))
    out.extend(well_state)
    out.extend(payload)
    return bytes(out)


def build_container_raw(blocks: bytes, cluster_count: int, well_state: bytes,
                        payload: bytes, columns: int, lines: int) -> bytes:
    """Assemble a container from already-serialized codebook blocks."""
    out = bytearray()
    out.extend(write_header(cluster_count, columns, lines))
    out.extend(blocks)
    out.extend(well_state)
    out.extend(payload)
    return bytes(out)
