"""Pallas fused k-means kernel vs the spec oracle (interpret mode).

On TPU the kernel compiles via Mosaic; in the CPU test environment it
runs through the Pallas interpreter — same program, same semantics.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qvz_tpu.ops.pallas_kernels import kmeans_step_fused, pad_rows


def oracle_step(data, means, K):
    d = data.astype(np.int64)
    m = means.astype(np.int64)
    dist = ((d[:, None, :] - m[None]) ** 2).sum(-1)
    assign = dist.argmin(1)
    sums = np.zeros((K, data.shape[1]), dtype=np.int64)
    np.add.at(sums, assign, d)
    counts = np.bincount(assign, minlength=K)
    return assign, sums, counts


@pytest.mark.parametrize("n,cols,K", [(700, 36, 3), (1500, 100, 5),
                                      (512, 17, 2)])
def test_fused_step_matches_oracle(n, cols, K):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 72, size=(n, cols)).astype(np.uint8)
    means = rng.integers(0, 72, size=(K, cols)).astype(np.int32)
    a, s, c = kmeans_step_fused(
        jnp.asarray(pad_rows(data)), jnp.asarray(means), jnp.int32(n), K,
        interpret=True)
    ar, sr, cr = oracle_step(data, means, K)
    assert np.array_equal(np.asarray(a)[:n], ar)
    assert np.array_equal(np.asarray(s), sr)
    assert np.array_equal(np.asarray(c), cr)


def test_fused_step_ties_break_low():
    # two identical centroids: every read must pick index 0
    data = np.full((512, 8), 30, dtype=np.uint8)
    means = np.full((2, 8), 10, dtype=np.int32)
    a, s, c = kmeans_step_fused(
        jnp.asarray(data), jnp.asarray(means), jnp.int32(512), 2,
        interpret=True)
    assert np.all(np.asarray(a) == 0)
    assert np.asarray(c)[0] == 512 and np.asarray(c)[1] == 0


def test_padded_rows_excluded():
    n, cols, K = 100, 12, 2  # padded to 512 rows
    rng = np.random.default_rng(1)
    data = rng.integers(0, 72, size=(n, cols)).astype(np.uint8)
    means = rng.integers(0, 72, size=(K, cols)).astype(np.int32)
    a, s, c = kmeans_step_fused(
        jnp.asarray(pad_rows(data)), jnp.asarray(means), jnp.int32(n), K,
        interpret=True)
    _, sr, cr = oracle_step(data, means, K)
    assert int(np.asarray(c).sum()) == n
    assert np.array_equal(np.asarray(s), sr)
    assert np.array_equal(np.asarray(c), cr)


@pytest.mark.parametrize("n,cols,K", [(1100, 50, 3), (600, 100, 1),
                                      (2048, 33, 2)])
def test_cond_hist_matches_oracle(n, cols, K):
    from qvz_tpu.ops.pallas_kernels import cond_hist_fused
    rng = np.random.default_rng(n + K)
    data = rng.integers(0, 72, size=(n, cols)).astype(np.uint8)
    cl = rng.integers(0, K, size=n).astype(np.uint8)
    dp = pad_rows(data)
    clp = np.pad(cl, (0, dp.shape[0] - n))
    cond = np.asarray(cond_hist_fused(
        jnp.asarray(dp), jnp.asarray(clp), jnp.int32(n), K,
        interpret=True))
    want = np.zeros((cols - 1, K * 72, 72), dtype=np.int64)
    for i in range(n):
        row = data[i].astype(np.int64)
        base = int(cl[i]) * 72
        np.add.at(want, (np.arange(cols - 1), base + row[:-1], row[1:]), 1)
    assert np.array_equal(cond, want)


def test_coder_pallas_matches_fused_scan():
    """Interpret-mode Mosaic coder (v2, in-kernel table replay) ==
    the XLA fused scan fed the equivalent precomputed streams,
    element-exact (compiled on-chip equivalence is gated in
    test_tpu_onchip)."""
    from qvz_tpu.ops.coder_device import _fused_scan
    from qvz_tpu.ops.coder_pallas import fused_scan_tables

    rng = np.random.default_rng(3)
    cols, W, L = 3, 40, 64
    n_per_col, card = 5, 4
    S = n_per_col * card
    T = cols * L
    n_models = cols * n_per_col + 1
    mkey = np.full((cols, S), -1, np.int32)
    qskey = np.zeros((cols, S), np.int32)
    slot_base = np.zeros(n_models, np.int32)
    cards = np.full(n_models, card, np.int32)
    for c in range(cols):
        pos = 0
        for j in range(n_per_col):
            m = 1 + c * n_per_col + j
            slot_base[m] = pos
            mkey[c, pos:pos + card] = m
            qskey[c, pos:pos + card] = np.arange(card)
            pos += card
    icc = rng.integers(1, 4, (cols, S)).astype(np.int32)
    kq = np.where(mkey >= 0, mkey.astype(np.int64) * 128 + qskey,
                  -1).astype(np.int32)
    sbc_of_mid = slot_base + cards

    colix = np.repeat(np.arange(cols), L)
    mloc = rng.integers(0, n_per_col, (T, W)).astype(np.int32)
    mid = (1 + colix[:, None] * n_per_col + mloc).astype(np.int32)
    qs = rng.integers(0, card, (T, W)).astype(np.int32)
    # sprinkle explicit-triple steps (cluster-id style)
    mid[:, ::5] = 0
    etl = np.zeros((T, W), np.uint32)
    eth = np.ones((T, W), np.uint32)
    etn = np.full((T, W), 2, np.uint32)
    etl[:, ::3] = 1
    etn[:, ::3] = 3
    eth[:, ::3] = 2
    reset = (np.arange(T) % L) == 0
    streams = tuple(jnp.asarray(a) for a in
                    (mid, qs, etl, eth, etn, reset))
    carry_p, ys_p = fused_scan_tables(
        streams, (kq, icc, sbc_of_mid), W, S, L, interpret=True)

    # equivalent precomputed streams for the XLA scan
    slot = np.where(mid > 0, slot_base[mid] + qs, -1).astype(np.int32)
    sbv = slot_base[mid]
    sbcv = sbc_of_mid[mid]
    ci = np.concatenate(
        [np.zeros((cols, 1), np.int64), icc.cumsum(1)], axis=1)
    blo = (ci[colix[:, None], sbv + qs]
           - ci[colix[:, None], sbv]).astype(np.int32)
    ia = icc[colix[:, None], np.minimum(sbv + qs, S - 1)]
    ni = (ci[colix[:, None], sbcv] - ci[colix[:, None], sbv])
    xs = tuple(jnp.asarray(a) for a in
               (slot, sbv.astype(np.int32), sbcv.astype(np.int32),
                blo, ia.astype(np.int32), ni.astype(np.int32),
                etl, eth, etn, reset))
    carry_ref, ys_ref = _fused_scan(xs, W, S)
    for a, b in zip(carry_ref[:6], carry_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(ys_ref, ys_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("W", [384, 130])
def test_coder_pallas_packed_geometries(W):
    """Round-5 packed-layout edge geometries through the interpreter:
    W=384 exercises w8=3 / F=2 (6 of 8 sublanes live, dead-sublane
    padding in the packed tables), W=130 exercises lane padding at
    w8=2 / F=4. Parity vs the XLA fused scan, element-exact."""
    from qvz_tpu.ops.coder_device import _fused_scan
    from qvz_tpu.ops.coder_pallas import fused_scan_tables

    rng = np.random.default_rng(17)
    cols, L = 3, 64
    n_per_col, card = 4, 5
    S = n_per_col * card
    T = cols * L
    n_models = cols * n_per_col + 1
    mkey = np.full((cols, S), -1, np.int32)
    qskey = np.zeros((cols, S), np.int32)
    slot_base = np.zeros(n_models, np.int32)
    cards = np.full(n_models, card, np.int32)
    for c in range(cols):
        pos = 0
        for j in range(n_per_col):
            m = 1 + c * n_per_col + j
            slot_base[m] = pos
            mkey[c, pos:pos + card] = m
            qskey[c, pos:pos + card] = np.arange(card)
            pos += card
    icc = rng.integers(1, 4, (cols, S)).astype(np.int32)
    kq = np.where(mkey >= 0, mkey.astype(np.int64) * 128 + qskey,
                  -1).astype(np.int32)
    sbc_of_mid = slot_base + cards

    colix = np.repeat(np.arange(cols), L)
    mloc = rng.integers(0, n_per_col, (T, W)).astype(np.int32)
    mid = (1 + colix[:, None] * n_per_col + mloc).astype(np.int32)
    qs = rng.integers(0, card, (T, W)).astype(np.int32)
    mid[:, ::7] = 0
    etl = np.zeros((T, W), np.uint32)
    eth = np.ones((T, W), np.uint32)
    etn = np.full((T, W), 2, np.uint32)
    reset = (np.arange(T) % L) == 0
    streams = tuple(jnp.asarray(a) for a in
                    (mid, qs, etl, eth, etn, reset))
    # 6-tuple tables: the per-block lower bound path is live too
    carry_p, ys_p = fused_scan_tables(
        streams, (kq, icc, sbc_of_mid, None, None, slot_base),
        W, S, L, interpret=True)

    slot = np.where(mid > 0, slot_base[mid] + qs, -1).astype(np.int32)
    sbv = slot_base[mid]
    sbcv = sbc_of_mid[mid]
    ci = np.concatenate(
        [np.zeros((cols, 1), np.int64), icc.cumsum(1)], axis=1)
    blo = (ci[colix[:, None], sbv + qs]
           - ci[colix[:, None], sbv]).astype(np.int32)
    ia = icc[colix[:, None], np.minimum(sbv + qs, S - 1)]
    ni = (ci[colix[:, None], sbcv] - ci[colix[:, None], sbv])
    xs = tuple(jnp.asarray(a) for a in
               (slot, sbv.astype(np.int32), sbcv.astype(np.int32),
                blo, ia.astype(np.int32), ni.astype(np.int32),
                etl, eth, etn, reset))
    carry_ref, ys_ref = _fused_scan(xs, W, S)
    for a, b in zip(carry_ref[:6], carry_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(ys_ref, ys_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_quantize_pallas_matches_gather(monkeypatch):
    """Interpret-mode Mosaic quantize kernel == the XLA gather scan,
    element-exact, including multi-cluster tables and the column
    context recursion (compiled parity is the on-chip container
    gates + the device CLI leg)."""
    import qvz_tpu.native
    qvz_tpu.native.load()
    from qvz_tpu.constants import DISTORTION_MSE, MODE_RATIO
    from qvz_tpu.native import runtime as rt
    from qvz_tpu.ops import quantize as q
    from qvz_tpu.ops import quantize_pallas as qp
    from qvz_tpu.ops.distortion import make_matrix
    from qvz_tpu.spec import stats as np_stats

    rng = np.random.default_rng(41)
    n, cols, n_cl = 3000, 24, 2
    start = rng.integers(20, 45, size=(n, 1))
    steps = rng.integers(-3, 4, size=(n, cols - 1))
    data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
                   71).astype(np.uint8)
    clusters = (np.arange(n) % n_cl).astype(np.uint8)
    c0, cond = np_stats.conditional_counts(data, clusters, n_cl)
    design = rt.Design(c0, cond, MODE_RATIO, 0.5,
                       make_matrix(DISTORTION_MSE))
    tables = design.tables()
    draws = rng.integers(0, 128, size=(n, cols)).astype(np.uint8)

    monkeypatch.setenv("QVZ_TPU_QUANTIZE_PALLAS", "0")
    m0, s0, v0, _ = q.quantize_t_device(tables, data, clusters, draws)
    monkeypatch.setenv("QVZ_TPU_QUANTIZE_PALLAS", "interpret")
    for form in ("1", "0"):   # merged single-sweep and split forms
        monkeypatch.setenv("QVZ_TPU_QUANT_MERGED", form)
        m1, s1, v1, _ = q.quantize_t_device(tables, data, clusters,
                                            draws)
        assert np.array_equal(np.asarray(m0), np.asarray(m1)), form
        assert np.array_equal(np.asarray(s0), np.asarray(s1)), form
        assert np.array_equal(np.asarray(v0), np.asarray(v1)), form


def test_quantize_vmem_fit_fallback_chain(monkeypatch):
    """The kernel VMEM fit model walks merged -> split (shrinking the
    lane block) -> None (caller takes the XLA gather path), and every
    rung produces identical outputs.  _ROW_BUDGET is patched down so
    a small config exercises the chain; the real-budget big-table
    case is vouched on-chip (a 2-cluster sv_pad=2816 config OOM'd
    scoped VMEM before the model existed)."""
    import qvz_tpu.native
    qvz_tpu.native.load()
    from qvz_tpu.constants import DISTORTION_MSE, MODE_RATIO
    from qvz_tpu.native import runtime as rt
    from qvz_tpu.ops import quantize as q
    from qvz_tpu.ops import quantize_pallas as qp
    from qvz_tpu.ops.distortion import make_matrix
    from qvz_tpu.spec import stats as np_stats

    rng = np.random.default_rng(5)
    n, cols = 2000, 12
    start = rng.integers(20, 45, size=(n, 1))
    steps = rng.integers(-3, 4, size=(n, cols - 1))
    data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
                   71).astype(np.uint8)
    clusters = np.zeros(n, dtype=np.uint8)
    c0, cond = np_stats.conditional_counts(data, clusters, 1)
    design = rt.Design(c0, cond, MODE_RATIO, 0.5,
                       make_matrix(DISTORTION_MSE))
    tables = design.tables()
    draws = rng.integers(0, 128, size=(n, cols)).astype(np.uint8)

    monkeypatch.setenv("QVZ_TPU_QUANTIZE_PALLAS", "0")
    ref = q.quantize_t_device(tables, data, clusters, draws)[:3]
    ref = [np.asarray(x) for x in ref]

    monkeypatch.setenv("QVZ_TPU_QUANTIZE_PALLAS", "interpret")
    qt = qp.QuantTables(tables)
    qr_pad, sv_pad = qt.qr2.shape[1], qt.qvt.shape[1]
    nb_pad = qt.bnd.shape[1]
    tab_rows = max(nb_pad, sv_pad)

    # budget admits split at a shrunken block but not merged
    monkeypatch.setattr(qp, "_ROW_BUDGET",
                        qr_pad + tab_rows + 13 * 16)
    got = q.quantize_t_device(tables, data, clusters, draws)[:3]
    for a, b in zip(ref, got):
        assert np.array_equal(a, np.asarray(b))

    # budget admits nothing -> quantize_pallas defers to the gather
    # path (which ignores the interpret env and runs XLA directly)
    monkeypatch.setattr(qp, "_ROW_BUDGET", 0)
    assert qp.quantize_pallas(qt, *_tq_args(data, draws)) is None
    got = q.quantize_t_device(tables, data, clusters, draws)[:3]
    for a, b in zip(ref, got):
        assert np.array_equal(a, np.asarray(b))


def _tq_args(data, draws):
    import jax.numpy as jnp
    return (jnp.asarray(np.ascontiguousarray(data.T)),
            jnp.asarray(np.ascontiguousarray(draws.T)),
            None, data.shape[0])


@pytest.mark.parametrize("ratio,cols,n_cl", [
    (0.0, 8, 1),    # card-1 quantizers: bnd rows empty, sv = npc
    (0.9, 8, 1),    # high-rate: large state cardinalities
    (0.5, 1, 1),    # single column (no context recursion at all)
    (0.85, 6, 3),   # multi-cluster high-rate
])
def test_quantize_pallas_edge_geometries(monkeypatch, ratio, cols,
                                         n_cl):
    """Merged + split kernel forms vs the XLA gather scan across the
    rate extremes and degenerate geometries (interpret mode; compiled
    parity is the on-chip gates)."""
    import qvz_tpu.native
    qvz_tpu.native.load()
    from qvz_tpu.constants import DISTORTION_MSE, MODE_RATIO
    from qvz_tpu.native import runtime as rt
    from qvz_tpu.ops import quantize as q
    from qvz_tpu.ops.distortion import make_matrix
    from qvz_tpu.spec import stats as np_stats

    rng = np.random.default_rng(int(ratio * 100) + cols)
    n = 1500
    start = rng.integers(20, 45, size=(n, 1))
    steps = rng.integers(-3, 4, size=(n, max(cols - 1, 0)))
    data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
                   71).astype(np.uint8)
    clusters = (np.arange(n) % n_cl).astype(np.uint8)
    c0, cond = np_stats.conditional_counts(data, clusters, n_cl)
    design = rt.Design(c0, cond, MODE_RATIO, ratio,
                       make_matrix(DISTORTION_MSE))
    tables = design.tables()
    draws = rng.integers(0, 128, size=(n, cols)).astype(np.uint8)

    monkeypatch.setenv("QVZ_TPU_QUANTIZE_PALLAS", "0")
    ref = [np.asarray(x) for x in
           q.quantize_t_device(tables, data, clusters, draws)[:3]]
    monkeypatch.setenv("QVZ_TPU_QUANTIZE_PALLAS", "interpret")
    for form in ("1", "0"):
        monkeypatch.setenv("QVZ_TPU_QUANT_MERGED", form)
        got = q.quantize_t_device(tables, data, clusters, draws)[:3]
        for a, b in zip(ref, got):
            assert np.array_equal(a, np.asarray(b)), (form, ratio)


def test_quantize_column_windows(monkeypatch):
    """Column-windowed table replication (QVZ_TPU_QUANT_COLW): the
    kernel's lane-replicated tables cost cols x rows x 4 KB on
    device — ~10 GB at the 1022-column geometry — so wide inputs
    replicate only a window of columns at a time, threading the
    context recursion's prev vector across windows.  Forcing a
    3-column window on a 24-column config must be element-identical
    to the unwindowed path and the gather scan, in both kernel
    forms (including a window boundary mid-recursion)."""
    import qvz_tpu.native
    qvz_tpu.native.load()
    from qvz_tpu.constants import DISTORTION_MSE, MODE_RATIO
    from qvz_tpu.native import runtime as rt
    from qvz_tpu.ops import quantize as q
    from qvz_tpu.ops.distortion import make_matrix
    from qvz_tpu.spec import stats as np_stats

    rng = np.random.default_rng(44)
    n, cols, n_cl = 3000, 24, 2
    start = rng.integers(20, 45, size=(n, 1))
    steps = rng.integers(-3, 4, size=(n, cols - 1))
    data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
                   71).astype(np.uint8)
    clusters = (np.arange(n) % n_cl).astype(np.uint8)
    c0, cond = np_stats.conditional_counts(data, clusters, n_cl)
    design = rt.Design(c0, cond, MODE_RATIO, 0.5,
                       make_matrix(DISTORTION_MSE))
    tables = design.tables()
    draws = rng.integers(0, 128, size=(n, cols)).astype(np.uint8)

    monkeypatch.setenv("QVZ_TPU_QUANTIZE_PALLAS", "0")
    ref = [np.asarray(x) for x in
           q.quantize_t_device(tables, data, clusters, draws)[:3]]

    monkeypatch.setenv("QVZ_TPU_QUANTIZE_PALLAS", "interpret")
    for form in ("1", "0"):
        monkeypatch.setenv("QVZ_TPU_QUANT_MERGED", form)
        for colw in ("3", "24", "1"):
            monkeypatch.setenv("QVZ_TPU_QUANT_COLW", colw)
            got = q.quantize_t_device(tables, data, clusters,
                                      draws)[:3]
            for a, b in zip(ref, got):
                assert np.array_equal(a, np.asarray(b)), (form, colw)
    # windows x per-span (non-fused) dispatch
    monkeypatch.setenv("QVZ_TPU_QUANT_MERGED", "1")
    monkeypatch.setenv("QVZ_TPU_QUANT_FUSE", "0")
    monkeypatch.setenv("QVZ_TPU_QUANT_COLW", "5")
    got = q.quantize_t_device(tables, data, clusters, draws)[:3]
    for a, b in zip(ref, got):
        assert np.array_equal(a, np.asarray(b)), "nofuse windows"


def test_quant_tables_vectorized_build_matches_loop():
    """QuantTables' flat-vectorized row build == the original per-pc
    loop (kept here as the oracle), across rate extremes and
    multi-cluster tables."""
    import qvz_tpu.native
    qvz_tpu.native.load()
    from qvz_tpu.constants import ALPHABET_SIZE, DISTORTION_MSE, \
        MODE_RATIO
    from qvz_tpu.native import runtime as rt
    from qvz_tpu.ops import quantize_pallas as qp
    from qvz_tpu.ops.distortion import make_matrix
    from qvz_tpu.spec import stats as np_stats

    for ratio, n_cl, seed in ((0.5, 2, 41), (0.0, 1, 3), (0.9, 3, 9)):
        rng = np.random.default_rng(seed)
        n, cols = 2500, 16
        start = rng.integers(20, 45, size=(n, 1))
        steps = rng.integers(-3, 4, size=(n, cols - 1))
        data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
                       71).astype(np.uint8)
        clusters = (np.arange(n) % n_cl).astype(np.uint8)
        c0, cond = np_stats.conditional_counts(data, clusters, n_cl)
        design = rt.Design(c0, cond, MODE_RATIO, ratio,
                           make_matrix(DISTORTION_MSE))
        tables = design.tables()
        qt = qp.QuantTables(tables)

        # oracle: the per-pc loop form
        A = ALPHABET_SIZE
        C = n_cl
        pb = np.asarray(tables.pair_base,
                        dtype=np.int64).reshape(C, cols)
        qs_map = np.asarray(tables.qs_map).reshape(-1, A)
        qv_map = np.asarray(tables.qv_map).reshape(-1, A)
        n_pairs = int(tables.n_pairs)
        nxt = np.append(pb.reshape(-1)[1:], n_pairs)
        nctx = (nxt - pb.reshape(-1)).reshape(C, cols)
        for col in range(cols):
            bnd, qvr, ktr, vtr = [], [], [], []
            for cl in range(C):
                for p in range(int(pb[cl, col]),
                               int(pb[cl, col]) + int(nctx[cl, col])):
                    for ch in (0, 1):
                        pc = 2 * p + ch
                        qsr = qs_map[pc].astype(np.int64)
                        qvm = qv_map[pc].astype(np.int64)
                        stp = np.nonzero(np.diff(qsr) > 0)[0] + 1
                        bnd.extend(pc * 256 + stp)
                        crd = int(qsr.max()) + 1
                        first = np.searchsorted(qsr, np.arange(crd))
                        qvr.extend((pc * 128 + np.arange(crd)) * 128
                                   + qvm[first])
                        ktr.extend(pc * 256 + first)
                        vtr.extend(512 + np.diff(qvm[first],
                                                 prepend=0))
            assert qt.nb[col] == len(bnd), (ratio, col)
            assert qt.sv[col] == len(qvr), (ratio, col)
            assert np.array_equal(qt.bnd[col, :len(bnd)], bnd)
            assert np.array_equal(qt.qvt[col, :len(qvr)], qvr)
            assert np.array_equal(qt.kt[col, :len(ktr)], ktr)
            assert np.array_equal(qt.vt[col, :len(vtr)], vtr)
