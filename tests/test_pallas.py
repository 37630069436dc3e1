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
    """Interpret-mode Mosaic coder == the XLA fused scan, element-exact
    (the compiled-on-chip equivalence is gated in test_tpu_onchip)."""
    from qvz_tpu.ops.coder_device import _fused_scan
    from qvz_tpu.ops.coder_pallas import fused_scan_pallas

    rng = np.random.default_rng(3)
    T, W, S, L = 600, 40, 37, 200
    slot = rng.integers(-1, S, size=(T, W)).astype(np.int32)
    sb = np.clip(slot - rng.integers(0, 4, (T, W)), 0, S - 1)
    sbc = np.clip(slot + rng.integers(1, 6, (T, W)),
                  sb + 1, S).astype(np.int32)
    blo = rng.integers(0, 3, (T, W)).astype(np.int32)
    init_at = rng.integers(1, 3, (T, W)).astype(np.int32)
    ninit = (blo + init_at + rng.integers(0, 5, (T, W))).astype(np.int32)
    etl = np.zeros((T, W), np.uint32)
    eth = np.ones((T, W), np.uint32)
    etn = np.full((T, W), 2, np.uint32)
    etl[:, ::3] = 1
    etn[:, ::3] = 3
    eth[:, ::3] = 2
    reset = (np.arange(T) % L) == 0
    xs = tuple(jnp.asarray(a) for a in
               (slot, sb.astype(np.int32), sbc, blo, init_at, ninit,
                etl, eth, etn, reset))
    carry_ref, ys_ref = _fused_scan(xs, W, S)
    carry_p, ys_p = fused_scan_pallas(xs, W, S, interpret=True)
    for a, b in zip(carry_ref[:6], carry_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(ys_ref, ys_p):
        assert np.array_equal(np.asarray(a), np.asarray(b))
