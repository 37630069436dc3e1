"""Alphabet semantics (reference: src/pmf.c:296-382).

Alphabets are symbol lists with a reverse-index table. Two quirks matter
for parity and are replicated exactly:

  * `alphabet_union` is a sorted-list merge that only deduplicates when the
    heads of BOTH inputs are equal, so duplicate symbols *within* one input
    survive into the result (pmf.c:312-357).
  * the reverse index is built by a forward scan, so for duplicated symbols
    the LAST index wins (pmf.c:365-382).
"""

from __future__ import annotations

from qvz_tpu.constants import ALPHABET_SIZE, SYMBOL_NOT_FOUND


class Alphabet:
    __slots__ = ("symbols", "indexes")

    def __init__(self, symbols):
        self.symbols = list(symbols)
        self.indexes = [SYMBOL_NOT_FOUND] * ALPHABET_SIZE
        for i, s in enumerate(self.symbols):
            self.indexes[s] = i

    @classmethod
    def identity(cls, size: int) -> "Alphabet":
        return cls(range(size))

    @property
    def size(self) -> int:
        return len(self.symbols)

    def index_of(self, symbol: int) -> int:
        return self.indexes[symbol]

    def __eq__(self, other) -> bool:
        return isinstance(other, Alphabet) and self.symbols == other.symbols


def alphabet_union(a: Alphabet, b: Alphabet) -> Alphabet:
    """Merge of two sorted symbol lists, reference-exact (pmf.c:312-357)."""
    sym = []
    i = j = 0
    na, nb = a.size, b.size
    while i < na and j < nb:
        if a.symbols[i] < b.symbols[j]:
            sym.append(a.symbols[i])
            i += 1
        elif a.symbols[i] == b.symbols[j]:
            sym.append(a.symbols[i])
            i += 1
            j += 1
        else:
            sym.append(b.symbols[j])
            j += 1
    sym.extend(a.symbols[i:])
    sym.extend(b.symbols[j:])
    return Alphabet(sym)
