"""WELL-1024a PRNG with exact reference semantics.

The encoder dithers between two quantizers per symbol using 7-bit draws from
a WELL-1024a stream whose raw 128-byte state is serialized in the bitstream
(reference: src/well.c, src/qv_stream.c:70-93, src/codebook.c:162-171).
Bit parity requires replicating:

  * the exact F2-linear word recurrence (well.c:8-24);
  * the draw-pool amortization of well_1024a_bits (well.c:33-46): a shared
    32-bit pool is consumed 7 bits at a time and the refill check happens
    BEFORE the draw, so 4 bits of every pool word are discarded for 7-bit
    draws (4 draws per 32-bit word);
  * the encoder-side state initialization (n=0, empty pool).

Two implementations live here:
  * `WellState` — scalar spec implementation (test oracle, small inputs).
  * `well_words_vectorized` — numpy batch generation of W independent
    streams advanced in lockstep, used with jump-ahead to parallelize one
    logical stream across chunks (each chunk's start state computed via the
    GF(2) transition matrix).

One well_1024a() call advances the state by one 32-bit word. For 7-bit
dither draws, words_needed(n_draws) gives the number of words consumed.
"""

from __future__ import annotations

import numpy as np

from qvz_tpu.constants import WELL_DEBUG_WORD

_M32 = 0xFFFFFFFF


class WellState:
    """Scalar WELL-1024a replica (spec implementation)."""

    __slots__ = ("state", "n", "bit_output", "bits_left")

    def __init__(self, state_words, n: int = 0):
        self.state = [w & _M32 for w in state_words]
        assert len(self.state) == 32
        self.n = n
        self.bit_output = 0
        self.bits_left = 0

    @classmethod
    def debug(cls) -> "WellState":
        """State produced by the reference's `make debug` build."""
        return cls([WELL_DEBUG_WORD] * 32)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "WellState":
        """Parse the 128-byte little-endian state stored in the bitstream."""
        assert len(raw) == 128
        return cls(np.frombuffer(raw, dtype="<u4").tolist())

    def to_bytes(self) -> bytes:
        return np.asarray(self.state, dtype="<u4").tobytes()

    def next_word(self) -> int:
        s, n = self.state, self.n
        z0 = s[(n + 31) & 31]
        v_m1 = s[(n + 3) & 31]
        v_m2 = s[(n + 24) & 31]
        v_m3 = s[(n + 10) & 31]
        z1 = s[n] ^ (v_m1 ^ (v_m1 >> 8))
        z2 = ((v_m2 ^ ((v_m2 << 19) & _M32))
              ^ (v_m3 ^ ((v_m3 << 14) & _M32)))
        s[n] = z1 ^ z2
        n = (n + 31) & 31
        s[n] = ((z0 ^ ((z0 << 11) & _M32))
                ^ (z1 ^ ((z1 << 7) & _M32))
                ^ (z2 ^ ((z2 << 13) & _M32)))
        self.n = n
        return s[n]

    def next_bits(self, bits: int) -> int:
        """Draw `bits` bits from the shared pool (refill-before-draw)."""
        mask = (1 << bits) - 1
        if self.bits_left < bits:
            self.bit_output = self.next_word()
            self.bits_left = 32
        rtn = self.bit_output & mask
        self.bit_output >>= bits
        self.bits_left -= bits
        return rtn


def draws_per_word(bits: int = 7) -> int:
    """How many `bits`-bit draws are taken from each pool word."""
    return 32 // bits  # refill happens when fewer than `bits` remain


def words_needed(n_draws: int, bits: int = 7) -> int:
    """Pool words consumed by n_draws draws starting from an empty pool."""
    return -(-n_draws // draws_per_word(bits))


def draws_from_words(words: np.ndarray, n_draws: int,
                     bits: int = 7) -> np.ndarray:
    """Expand a sequence of 32-bit pool words into `bits`-bit draws.

    Vectorized equivalent of repeated next_bits(bits) from an empty pool.
    """
    k = draws_per_word(bits)
    mask = np.uint32((1 << bits) - 1)
    words = np.asarray(words, dtype=np.uint32)
    shifts = (np.arange(k, dtype=np.uint32) * bits)[None, :]
    d = (words[:, None] >> shifts) & mask
    return d.reshape(-1)[:n_draws].astype(np.uint8)


# --- Vectorized generation ---------------------------------------------------

def well_words_vectorized(states: np.ndarray, n_words: int) -> np.ndarray:
    """Advance W independent WELL-1024a streams in lockstep.

    states: (W, 32) uint32, each row a state with n=0.
    Returns (W, n_words) uint32 of successive outputs per stream, and
    leaves `states` updated in place (note: the internal index n cycles
    with period 32, so after a multiple of 32 words n is 0 again).
    """
    s = np.ascontiguousarray(states, dtype=np.uint32)
    W = s.shape[0]
    out = np.empty((W, n_words), dtype=np.uint32)
    n = 0
    for i in range(n_words):
        z0 = s[:, (n + 31) & 31]
        v_m1 = s[:, (n + 3) & 31]
        v_m2 = s[:, (n + 24) & 31]
        v_m3 = s[:, (n + 10) & 31]
        z1 = s[:, n] ^ (v_m1 ^ (v_m1 >> np.uint32(8)))
        z2 = (v_m2 ^ (v_m2 << np.uint32(19))) ^ (v_m3 ^ (v_m3 << np.uint32(14)))
        s[:, n] = z1 ^ z2
        n = (n + 31) & 31
        s[:, n] = ((z0 ^ (z0 << np.uint32(11)))
                   ^ (z1 ^ (z1 << np.uint32(7)))
                   ^ (z2 ^ (z2 << np.uint32(13))))
        out[:, i] = s[:, n]
    states[...] = s
    return out


# --- GF(2) jump-ahead --------------------------------------------------------
#
# One next_word() call is a linear map over GF(2) on the 1024-bit state
# (with the index rotation folded in by expressing the state in n-relative
# order). We represent the map as a 1024x1024 bit matrix packed into
# uint64 words and square it to jump 2^k steps.

_NBITS = 1024
_WPR = _NBITS // 64  # uint64 words per row


def _state_to_vec(state_words, n) -> np.ndarray:
    """Pack state into a 1024-bit vector in n-relative word order."""
    v = np.zeros(_WPR, dtype=np.uint64)
    for i in range(32):
        w = state_words[(n + i) & 31]
        v[i // 2] |= np.uint64(w) << np.uint64(32 * (i & 1))
    return v


def _vec_to_state(v: np.ndarray):
    """Unpack a 1024-bit vector into (state_words, n=0)."""
    words = []
    for i in range(32):
        words.append(int((v[i // 2] >> np.uint64(32 * (i & 1))) & np.uint64(_M32)))
    return words


def _step_matrix() -> np.ndarray:
    """Bit matrix M with new_vec = M @ vec (one next_word call)."""
    # Column j of M is the new state when the old state is e_j. Build by
    # running the scalar recurrence on basis states; since the map is
    # linear over GF(2) this fully determines it. We compute rows packed
    # as uint64: M[i] has bit j set iff new_bit_i depends on old_bit_j.
    # Running 1024 scalar steps is cheap (done once, cached).
    cols = np.zeros((_NBITS, _WPR), dtype=np.uint64)
    for j in range(_NBITS):
        words = [0] * 32
        words[j // 32] = 1 << (j % 32)
        st = WellState(words, n=0)
        st.next_word()
        cols[j] = _state_to_vec(st.state, st.n)
    # cols[j] = M e_j ; transpose bit-matrix to rows
    rows = np.zeros((_NBITS, _WPR), dtype=np.uint64)
    for j in range(_NBITS):
        c = cols[j]
        for w in range(_WPR):
            x = int(c[w])
            while x:
                b = x & -x
                i = w * 64 + b.bit_length() - 1
                rows[i, j // 64] |= np.uint64(1 << (j % 64))
                x ^= b
    return rows


_STEP_MATRIX_CACHE: dict[int, np.ndarray] = {}


def _matmul_gf2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """GF(2) product of two 1024x1024 packed bit matrices."""
    # Expand b's rows as bits of a: out[i] = XOR of b[j] for j where a[i,j]=1.
    out = np.zeros_like(a)
    for w in range(_WPR):
        col_block = a[:, w]  # (1024,) uint64, bits j in [64w, 64w+64)
        for bit in range(64):
            mask = (col_block >> np.uint64(bit)) & np.uint64(1)
            j = w * 64 + bit
            sel = mask.astype(bool)
            if sel.any():
                out[sel] ^= b[j]
    return out


def step_matrix_pow(k: int) -> np.ndarray:
    """M^(2^k), cached."""
    if 0 not in _STEP_MATRIX_CACHE:
        _STEP_MATRIX_CACHE[0] = _step_matrix()
    top = max(_STEP_MATRIX_CACHE)
    while top < k:
        nxt = _matmul_gf2(_STEP_MATRIX_CACHE[top], _STEP_MATRIX_CACHE[top])
        top += 1
        _STEP_MATRIX_CACHE[top] = nxt
    return _STEP_MATRIX_CACHE[k]


def _matvec_gf2(m: np.ndarray, v: np.ndarray) -> np.ndarray:
    out = np.zeros(_WPR, dtype=np.uint64)
    acc = np.zeros(_NBITS, dtype=np.uint8)
    # parity of popcount(m[i] & v)
    masked = m & v[None, :]
    # popcount via unpackbits on the byte view
    bytes_view = masked.view(np.uint8)
    acc = np.unpackbits(bytes_view, axis=-1).sum(axis=-1) & 1
    idx = np.nonzero(acc)[0]
    for i in idx:
        out[i // 64] |= np.uint64(1 << (int(i) % 64))
    return out


def jump_states(state: WellState, n_chunks: int, words_per_chunk: int):
    """Start states for n_chunks contiguous word-chunks of one stream.

    Chunk 0 starts at `state`; chunk c starts c*words_per_chunk
    next_word() calls later. Returns (n_chunks, 32) uint32 with n=0
    semantics (valid because word order is expressed n-relative).
    """
    v = _state_to_vec(state.state, state.n)
    # decompose words_per_chunk into powers of two once
    bits = [k for k in range(64) if (words_per_chunk >> k) & 1]
    mats = [step_matrix_pow(k) for k in bits]
    out = np.empty((n_chunks, 32), dtype=np.uint32)
    cur = v
    for c in range(n_chunks):
        out[c] = _vec_to_state(cur)
        if c + 1 < n_chunks:
            for m in mats:
                cur = _matvec_gf2(m, cur)
    return out


def generate_draws(state: WellState, n_draws: int, bits: int = 7,
                   n_chunks: int = 64) -> np.ndarray:
    """All `bits`-bit dither draws for a whole file, parallelized.

    Splits the word stream into chunks via GF(2) jump-ahead and advances
    chunks in lockstep with vectorized numpy. Bit-identical to repeated
    WellState.next_bits(bits). Mutates `state` past the consumed words.
    """
    n_words = words_needed(n_draws, bits)
    if n_words <= 4096 or n_chunks <= 1:
        ws = np.asarray(state.state, dtype=np.uint32)[None, :]
        # reorder to n-relative so the vectorized kernel (n=0) matches
        order = [(state.n + i) & 31 for i in range(32)]
        ws = ws[:, order]
        words = well_words_vectorized(ws, n_words)[0]
        # restore scalar state by replaying trailing state
        new_words = ws[0]
        state.state = [int(x) for x in new_words]
        state.n = 0
        state.bits_left = 0
        state.bit_output = 0
        return draws_from_words(words, n_draws, bits)

    wpc = -(-n_words // n_chunks)
    starts = jump_states(state, n_chunks, wpc)
    words = well_words_vectorized(starts, wpc).reshape(-1)[:n_words]
    # well_words_vectorized advanced `starts` in place; the last row is now
    # the state after ceil(n_words/n_chunks)*n_chunks words (single-pass
    # callers never draw again, so overshoot past n_words is harmless).
    state.state = [int(x) for x in starts[-1]]
    state.n = 0
    state.bits_left = 0
    state.bit_output = 0
    return draws_from_words(words, n_draws, bits)
