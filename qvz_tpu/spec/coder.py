"""Context-adaptive integer arithmetic coder, reference-exact.

Replicates the m=22-bit Sayood-style coder (src/arith.c), the MSB-first
bit stream (src/os_stream.c) and the adaptive frequency models
(src/qv_stream.c:9-61):

  * interval update u = l + (range*cumHi)//n - 1, l += (range*cumLo)//n
    with 64-bit intermediate (arith.c:47-48);
  * E1/E2 emit the shared MSB plus scale3 pending complements; E3 shifts
    out the second MSB and increments scale3 (arith.c:52-96);
  * final step emits msb(l), scale3 complements, the remaining m-1 bits of
    l, then zero-pads the current byte -- including emitting one extra
    0x00 byte when the stream ended exactly on a byte boundary
    (os_stream.c:105-110's unconditional bufPos += 1);
  * adaptive models start at count 1 per symbol, step 8, halve-plus-one
    nonzero counts when total exceeds r = 1<<(m-3) (qv_stream.c:9-25);
  * decoder tag search subRange = (tagGap*n - 1)//range then cumulative
    scan (arith.c:130-137), and a drain-free last step (arith.c:190-205).

Pure-Python spec used as the oracle for the C++ runtime.
"""

from __future__ import annotations

from qvz_tpu.constants import ADAPTIVE_STEP, ARITH_M, ARITH_R

_MSB_SHIFT = ARITH_M - 1
_SMSB_SHIFT = ARITH_M - 2
_MSB_CLEAR = (1 << _MSB_SHIFT) - 1
_MSB_BIT = 1 << _MSB_SHIFT
_FULL = (1 << ARITH_M) - 1


class AdaptiveModel:
    """stream_stats_t replica."""

    __slots__ = ("counts", "n", "step")

    def __init__(self, cardinality: int):
        self.counts = [1] * cardinality
        self.n = cardinality
        self.step = ADAPTIVE_STEP

    def update(self, x: int, r: int = ARITH_R) -> None:
        self.counts[x] += self.step
        self.n += self.step
        if self.n > r:
            self.n = 0
            for i in range(len(self.counts)):
                c = self.counts[i]
                if c:
                    c = (c >> 1) + 1
                    self.counts[i] = c
                    self.n += c


class BitWriter:
    """MSB-first bit sink replicating os_stream.c write semantics."""

    __slots__ = ("buf", "cur", "bitpos")

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.bitpos = 0

    def write_bit(self, bit: int) -> None:
        self.cur |= bit & 1
        self.bitpos += 1
        if self.bitpos == 8:
            self.buf.append(self.cur)
            self.cur = 0
            self.bitpos = 0
        else:
            self.cur = (self.cur << 1) & 0xFF

    def write_bits(self, dw: int, length: int) -> None:
        for bit in range(length - 1, -1, -1):
            self.write_bit((dw >> bit) & 1)

    def finish_byte(self) -> None:
        # Matches stream_finish_byte: the in-progress byte is shifted out
        # and flushed even when bitpos == 0 (emitting an extra zero byte).
        self.cur = (self.cur << (7 - self.bitpos)) & 0xFF
        self.buf.append(self.cur)
        self.cur = 0
        self.bitpos = 0

    def __len__(self) -> int:
        return len(self.buf)


class BitReader:
    """MSB-first bit source; reads past the end yield zero bits, matching
    the reference's preloaded zero-filled 16 MiB buffer."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_bit(self) -> int:
        byte_idx = self.pos >> 3
        if byte_idx >= len(self.data):
            self.pos += 1
            return 0
        bit = (self.data[byte_idx] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, length: int) -> int:
        v = 0
        for bit in range(length - 1, -1, -1):
            v |= self.read_bit() << bit
        return v


class ArithmeticEncoder:
    __slots__ = ("l", "u", "scale3", "out")

    def __init__(self, out: BitWriter):
        self.l = 0
        self.u = _FULL
        self.scale3 = 0
        self.out = out

    def encode(self, model: AdaptiveModel, x: int) -> None:
        rng = self.u - self.l + 1
        counts = model.counts
        cum_lo = 0
        for i in range(x):
            cum_lo += counts[i]
        cum_hi = cum_lo + counts[x]
        n = model.n
        self.u = self.l + (rng * cum_hi) // n - 1
        self.l = self.l + (rng * cum_lo) // n

        out = self.out
        while True:
            msb_l = self.l >> _MSB_SHIFT
            msb_u = self.u >> _MSB_SHIFT
            if msb_l == msb_u:
                out.write_bit(msb_l)
                self.l = (self.l & _MSB_CLEAR) << 1
                self.u = ((self.u & _MSB_CLEAR) << 1) + 1
                comp = (~msb_l) & 1
                while self.scale3 > 0:
                    out.write_bit(comp)
                    self.scale3 -= 1
            elif (self.l >> _SMSB_SHIFT) == 0x01 and \
                 (self.u >> _SMSB_SHIFT) == 0x02:
                self.scale3 += 1
                self.u = (((self.u << 1) & _MSB_CLEAR) | _MSB_BIT) + 1
                self.l = (self.l << 1) & _MSB_CLEAR
            else:
                break

    def finish(self) -> int:
        out = self.out
        msb_l = self.l >> _MSB_SHIFT
        out.write_bit(msb_l)
        comp = (~msb_l) & 1
        while self.scale3 > 0:
            out.write_bit(comp)
            self.scale3 -= 1
        out.write_bits(self.l, ARITH_M - 1)
        out.finish_byte()
        return len(out)


class ArithmeticDecoder:
    __slots__ = ("l", "u", "t", "src")

    def __init__(self, src: BitReader):
        self.l = 0
        self.u = _FULL
        self.src = src
        self.t = src.read_bits(ARITH_M)

    def decode(self, model: AdaptiveModel) -> int:
        rng = self.u - self.l + 1
        tag_gap = self.t - self.l + 1
        n = model.n
        counts = model.counts
        sub_range = (tag_gap * n - 1) // rng
        k = 0
        cum = 0
        while sub_range >= cum:
            cum += counts[k]
            k += 1
        x = k - 1

        cum_lo = 0
        for i in range(x):
            cum_lo += counts[i]
        cum_hi = cum_lo + counts[x]
        self.u = self.l + (rng * cum_hi) // n - 1
        self.l = self.l + (rng * cum_lo) // n

        src = self.src
        while True:
            msb_l = self.l >> _MSB_SHIFT
            msb_u = self.u >> _MSB_SHIFT
            if msb_l == msb_u:
                self.l = (self.l & _MSB_CLEAR) << 1
                self.u = ((self.u & _MSB_CLEAR) << 1) + 1
                self.t = ((self.t & _MSB_CLEAR) << 1) + src.read_bit()
            elif (self.l >> _SMSB_SHIFT) == 0x01 and \
                 (self.u >> _SMSB_SHIFT) == 0x02:
                self.l = (self.l << 1) & _MSB_CLEAR
                self.u = (((self.u << 1) & _MSB_CLEAR) | _MSB_BIT) + 1
                self.t = (((self.t & _MSB_CLEAR) << 1) ^ _MSB_BIT) \
                    + src.read_bit()
            else:
                break
        return x

    def decode_last(self, model: AdaptiveModel) -> int:
        rng = self.u - self.l + 1
        tag_gap = self.t - self.l + 1
        sub_range = (tag_gap * model.n - 1) // rng
        k = 0
        cum = 0
        while sub_range >= cum:
            cum += model.counts[k]
            k += 1
        return k - 1
