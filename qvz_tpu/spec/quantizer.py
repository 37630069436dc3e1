"""Lloyd-Max quantizer design, reference-exact (src/quantizer.c).

All decisions here are baked into the serialized codebook, so every
floating-point comparison, tie-break, and loop order is replicated:

  * initial bounds (j*size)//states, reconstruction (b[j]+b[j+1]-1)//2
    (quantizer.c:45-52);
  * reconstruction update: exhaustive scan over integer points inside the
    region, strict `<` so the LOWEST point wins ties, expected distortion
    accumulated over the region in ascending symbol order
    (quantizer.c:62-87);
  * bounds update ignores the PMF entirely and walks symbols 1..size-2
    comparing raw distortion to the current vs next reconstruction point
    (quantizer.c:93-107); stale bounds from earlier iterations are kept
    when the walk ends early, so bounds may transiently be non-monotone --
    empty/overlapping regions are replicated verbatim;
  * output alphabet is the raw reconstruction array (duplicates preserved,
    quantizer.c:119-121);
  * expected distortion accumulated region-major (quantizer.c:124-129).
"""

from __future__ import annotations

from qvz_tpu.spec.alphabet import Alphabet
from qvz_tpu.constants import QUANTIZER_MAX_ITER

_DBL_MAX = 1.7976931348623157e308


class Quantizer:
    __slots__ = ("q", "output_alphabet", "ratio", "mse", "alphabet_size")

    def __init__(self, q, output_alphabet: Alphabet, mse: float = 0.0):
        self.q = list(q)
        self.alphabet_size = len(self.q)
        self.output_alphabet = output_alphabet
        self.ratio = 0.0
        self.mse = mse


def find_output_alphabet(q) -> Alphabet:
    """Adjacent-deduplication of the quantizer map (quantizer.c:167-191).

    NOT a sorted-unique: only runs of equal values collapse, matching the
    reference's behavior for arbitrary maps read back from a codebook.
    """
    uniques = [q[0]]
    for x in range(1, len(q)):
        if q[x] != uniques[-1]:
            uniques.append(q[x])
    return Alphabet(uniques)


def generate_quantizer(pmf, dist, states: int) -> Quantizer:
    """Design a `states`-level quantizer for `pmf` under `dist`.

    pmf: sequence of 72 float probabilities (already in probability form).
    dist: 72x72 matrix-like with dist[i][r] float lookup.
    """
    size = len(pmf)
    bounds = [0] * (states + 1)
    bounds[states] = size
    for j in range(1, states):
        bounds[j] = (j * size) // states
    reconstruction = [(bounds[j] + bounds[j + 1] - 1) // 2
                      for j in range(states)]

    changed = True
    it = 0
    while changed and it < QUANTIZER_MAX_ITER:
        changed = False
        it += 1

        # Reconstruction points for fixed bounds.
        for j in range(states):
            min_mse = _DBL_MAX
            min_r = bounds[j]
            for r in range(bounds[j], bounds[j + 1]):
                mse = 0.0
                for i in range(bounds[j], bounds[j + 1]):
                    mse += pmf[i] * dist[i][r]
                if mse < min_mse:
                    min_r = r
                    min_mse = mse
            if min_r != reconstruction[j]:
                changed = True
                reconstruction[j] = min_r

        # Bounds for fixed reconstruction points (PMF-independent walk).
        r = 0
        j = 1
        while j < size - 1 and r < states - 1:
            mse = dist[j][reconstruction[r]]
            next_mse = dist[j][reconstruction[r + 1]]
            if next_mse < mse:
                r += 1
                bounds[r] = j
            j += 1

    # Assemble the map; overlapping regions resolve later-writes-win.
    q = [0] * size
    for j in range(states):
        for i in range(bounds[j], bounds[j + 1]):
            q[i] = reconstruction[j]

    out_alpha = Alphabet(reconstruction)

    mse_total = 0.0
    for j in range(states):
        for i in range(bounds[j], bounds[j + 1]):
            mse_total += dist[i][reconstruction[j]] * pmf[i]

    return Quantizer(q, out_alpha, mse_total)


def apply_quantizer(q: Quantizer, pmf):
    """Output PMF over the full input alphabet (quantizer.c:139-161)."""
    out = [0.0] * len(pmf)
    for i in range(len(pmf)):
        out[q.q[i]] += pmf[i]
    return out
