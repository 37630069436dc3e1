"""PMF math with reference-exact double semantics (src/pmf.c).

Probabilities are Python floats (IEEE double). Entropy uses math.log2,
which calls the platform libm log2 -- the same function the reference
binary links against, so comparisons against entropy targets reproduce
the reference's discrete decisions exactly.
"""

from __future__ import annotations

import math


def counts_to_pmf(counts):
    """recalculate_pmf: counts/total, all-zeros stays all-zeros (pmf.c:219)."""
    total = float(sum(counts))
    if total == 0.0:
        return [0.0] * len(counts)
    return [float(c) / total for c in counts]


def entropy(pmf) -> float:
    """Shannon entropy in bits, ascending-index accumulation (pmf.c:141)."""
    h = 0.0
    for p in pmf:
        if p > 0.0:
            h -= p * math.log2(p)
    return h


def renormalize(pmf) -> None:
    """In-place renormalization, exact order (pmf.c:235-254)."""
    total = 0.0
    for p in pmf:
        total += p
    if total > 0.0:
        for i in range(len(pmf)):
            pmf[i] = pmf[i] / total
