"""Codebook (conditional quantizer set) design, reference-exact.

Replicates src/codebook.c's generate_codebooks pipeline per cluster:

  column 0: one (lo, hi) quantizer pair targeting
            H(P(X0)) * ratio (MODE_RATIO) or `ratio` bits (MODE_FIXED),
            with the mixing ratio (target-h_hi)/(h_lo-h_hi)
            (codebook.c:230-268, 402-411);
  column i>=1: context alphabet = union of all previous-column output
            alphabets in stored order (codebook.c:421-424); Bayes
            propagation P(Q_i|X_i) then P(X_{i+1}|Q_i)
            (codebook.c:274-349); per-context entropy optimization
            (codebook.c:441-454).

The mixing ratio byte written to the stream is trunc(ratio*128)
(codebook.c:156). All accumulations preserve the reference's exact
summation order. One deviation that is provably bit-exact: the reference
recomputes compute_qpmf_list's inner x-sum (p_temp) once per union
element even though it only depends on (j, k) (codebook.c:318-321); we
hoist it out of the idx loop -- each accumulated term has the identical
value and the += order over j per (k, idx) cell is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from qvz_tpu.constants import ALPHABET_SIZE, MODE_RATIO
from qvz_tpu.spec.alphabet import Alphabet, alphabet_union
from qvz_tpu.spec.pmf import counts_to_pmf, entropy, renormalize
from qvz_tpu.spec.quantizer import (
    Quantizer,
    apply_quantizer,
    generate_quantizer,
)


@dataclass
class ColumnBook:
    """Quantizer pairs for one column, indexed by left-context position."""
    input_alphabet: Alphabet
    lo: list = field(default_factory=list)          # [Quantizer] per ctx
    hi: list = field(default_factory=list)
    ratio: list = field(default_factory=list)       # raw double per ctx
    qratio: list = field(default_factory=list)      # trunc(ratio*128) per ctx


@dataclass
class Codebook:
    columns: list  # [ColumnBook]


def optimize_for_entropy(pmf, dist, target):
    """States sweep to bracket the entropy target (codebook.c:230-269).

    Returns (lo, hi, ratio): ratio is the probability of choosing lo.
    """
    if target == 0.0:
        return (generate_quantizer(pmf, dist, 1),
                generate_quantizer(pmf, dist, 1),
                1.0)

    states = 1
    hi = generate_quantizer(pmf, dist, states)
    hi_entropy = entropy(apply_quantizer(hi, pmf))
    lo, lo_entropy = hi, hi_entropy
    while True:
        lo, lo_entropy = hi, hi_entropy
        states += 1
        hi = generate_quantizer(pmf, dist, states)
        hi_entropy = entropy(apply_quantizer(hi, pmf))
        if not (hi_entropy < target and states < len(pmf)):
            break

    if hi_entropy < target:
        return lo, hi, 0.0
    if lo_entropy >= target or hi_entropy == lo_entropy:
        return lo, hi, 1.0
    return lo, hi, (target - hi_entropy) / (lo_entropy - hi_entropy)


def compute_marginals(counts0, cond_counts, columns):
    """Chained total-probability marginals (codebook.c:208-218).

    counts0: (72,) ints; cond_counts: [col-1][prev][cur] ints.
    Per column c>=1 the accumulation runs over prev symbols j ascending:
    marg_c = 1.0*marg_c + marg_{c-1}[j] * P(.|j), elementwise.
    """
    A = ALPHABET_SIZE
    marg = [counts_to_pmf(counts0)]
    for c in range(1, columns):
        acc = [0.0] * A
        prev = marg[c - 1]
        for j in range(A):
            w = prev[j]
            cond = counts_to_pmf(cond_counts[c - 1][j])
            for i in range(A):
                acc[i] = 1.0 * acc[i] + w * cond[i]
        marg.append(acc)
    return marg


def _compute_qpmf_quan(q_lo: Quantizer, q_hi: Quantizer, ratio, union):
    """P(Q_1|X_1) from the column-0 pair (codebook.c:274-289)."""
    A = ALPHABET_SIZE
    out = [[0.0] * union.size for _ in range(A)]
    for x in range(A):
        for idx in range(union.size):
            sym = union.symbols[idx]
            if q_lo.q[x] == sym:
                out[x][idx] += ratio
            if q_hi.q[x] == sym:
                out[x][idx] += (1 - ratio)
    return out


def _compute_qpmf(cond_counts, column, prev_qpmf, union, prev_union,
                  book_prev: ColumnBook, marg):
    """P(Q_i|X_i) via Bayes propagation (codebook.c:291-330).

    The p_temp inner sum depends only on (j, k); hoisted out of the idx
    loop (bit-exact, see module docstring).
    """
    A = ALPHABET_SIZE
    m2 = marg[column - 2]
    cond_prob = [counts_to_pmf(cond_counts[column - 2][x]) for x in range(A)]

    # p_temp[j][k] accumulated over x ascending with C's left-assoc products
    p_temp = [[0.0] * A for _ in range(prev_union.size)]
    for j in range(prev_union.size):
        tj = p_temp[j]
        for k in range(A):
            acc = 0.0
            for x in range(A):
                acc += prev_qpmf[x][j] * cond_prob[x][k] * m2[x]
            tj[k] = acc

    out = [[0.0] * union.size for _ in range(A)]
    for k in range(A):
        row = out[k]
        for idx in range(union.size):
            sym = union.symbols[idx]
            for j in range(prev_union.size):
                q_lo = book_prev.lo[j]
                q_hi = book_prev.hi[j]
                p_q_xq = 0.0
                if q_lo.q[k] == sym:
                    p_q_xq += q_lo.ratio
                if q_hi.q[k] == sym:
                    p_q_xq += q_hi.ratio
                row[idx] += p_q_xq * p_temp[j][k]
        renormalize(row)
    return out


def _compute_xpmf(qpmf, cond_counts, column, union, marg):
    """P(X_{i+1}|Q_i) (codebook.c:332-349)."""
    A = ALPHABET_SIZE
    m1 = marg[column - 1]
    cond_prob = [counts_to_pmf(cond_counts[column - 1][x]) for x in range(A)]
    out = [[0.0] * A for _ in range(union.size)]
    for idx in range(union.size):
        row = out[idx]
        for k in range(A):
            acc = 0.0
            for x in range(A):
                acc += qpmf[x][idx] * cond_prob[x][k] * m1[x]
            row[k] = acc
        renormalize(row)
    return out


def generate_codebook(counts0, cond_counts, columns, dist, mode, ratio_opt,
                      marg=None) -> Codebook:
    """Full per-cluster codebook design (codebook.c:355-468)."""
    if marg is None:
        marg = compute_marginals(counts0, cond_counts, columns)

    books = []

    # Column 0 (codebook.c:402-411).
    pmf0 = counts_to_pmf(counts0)
    target = entropy(pmf0) * ratio_opt if mode == MODE_RATIO else ratio_opt
    q_lo, q_hi, ratio = optimize_for_entropy(pmf0, dist, target)
    q_lo.ratio = ratio
    q_hi.ratio = 1 - ratio
    book0 = ColumnBook(Alphabet([0]))
    book0.lo.append(q_lo)
    book0.hi.append(q_hi)
    book0.ratio.append(ratio)
    book0.qratio.append(int(ratio * 128.0) & 0xFF)
    books.append(book0)

    prev_union = Alphabet([0])
    prev_qpmf = None
    col0_pair = (q_lo, q_hi, ratio)

    for column in range(1, columns):
        prev_book = books[column - 1]
        # Union of previous column's output alphabets in stored order
        # (codebook.c:421-424): duplicate(q[0]) then union over the
        # interleaved lo/hi list.
        union = Alphabet(prev_book.lo[0].output_alphabet.symbols)
        inter = []
        for j in range(prev_union.size):
            inter.append(prev_book.lo[j])
            inter.append(prev_book.hi[j])
        for j in range(1, 2 * prev_union.size):
            union = alphabet_union(union, inter[j].output_alphabet)

        if column == 1:
            qpmf = _compute_qpmf_quan(*col0_pair, union)
        else:
            qpmf = _compute_qpmf(cond_counts, column, prev_qpmf, union,
                                 prev_union, prev_book, marg)
        xpmf = _compute_xpmf(qpmf, cond_counts, column, union, marg)

        book = ColumnBook(union)
        for j in range(union.size):
            target = (entropy(xpmf[j]) * ratio_opt if mode == MODE_RATIO
                      else ratio_opt)
            q_lo, q_hi, ratio = optimize_for_entropy(xpmf[j], dist, target)
            q_lo.ratio = ratio
            q_hi.ratio = 1 - ratio
            book.lo.append(q_lo)
            book.hi.append(q_hi)
            book.ratio.append(ratio)
            book.qratio.append(int(ratio * 128.0) & 0xFF)
        books.append(book)

        prev_union = union
        prev_qpmf = qpmf

    return Codebook(books)
