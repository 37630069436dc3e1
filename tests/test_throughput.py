"""Sharded QVZ2 container: parallel streams, jump-ahead dithering.

The design invariant: a QVZ2 container's decoded output is byte-identical
to the v1 (reference-format) container's for the same input and WELL
seed — per-shard GF(2) jump-ahead reproduces exactly the dither draws the
single logical stream would produce — while every shard carries an
independent adaptive arithmetic stream (decodable in parallel).
"""

import numpy as np
import pytest

from qvz_tpu.constants import DISTORTION_MSE, MODE_FIXED, MODE_RATIO
from qvz_tpu.format import container_v2
from qvz_tpu.native import runtime as rt
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState, jump_states
from qvz_tpu.pipeline import decode as dec_mod
from qvz_tpu.pipeline import encode as enc_mod


def synth(n, cols, seed=3):
    rng = np.random.default_rng(seed)
    start = rng.integers(20, 45, size=(n, 1))
    steps = rng.integers(-3, 4, size=(n, cols - 1))
    return np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
                   71).astype(np.uint8)


DIST = make_matrix(DISTORTION_MSE)


def test_well_jump_matches_numpy_oracle():
    words = np.asarray(WellState.debug().state, dtype=np.uint32)
    got = rt.well_jump(words, 5, 12_347)
    want = jump_states(WellState.debug(), 5, 12_347)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n,cols,shards", [
    (1000, 36, 4),
    (1003, 36, 4),    # ragged last shard
    (1024, 7, 3),     # odd column count (4 | per keeps draw alignment)
    (97, 12, 16),     # more shards than the plan can fill
    (5, 9, 8),        # shards > lines
])
def test_v2_decodes_identically_to_v1(n, cols, shards):
    data = synth(n, cols)
    kw = dict(mode=MODE_RATIO, ratio=0.5, want_recon=True)
    o1 = enc_mod.encode(data, DIST, well_state=WellState.debug(),
                        use_jax=False, **kw)
    o2 = enc_mod.encode(data, DIST, well_state=WellState.debug(),
                        use_jax=False, shards=shards, **kw)
    assert container_v2.is_v2(o2.compressed)
    assert not container_v2.is_v2(o1.compressed)
    d1 = dec_mod.decode(o1.compressed)
    d2 = dec_mod.decode(o2.compressed)
    assert np.array_equal(d1, d2)
    # the quantized reconstruction is identical too (same dither draws)
    assert np.array_equal(o1.reconstructed, o2.reconstructed)


def test_v2_multicluster_fixed_rate():
    data = synth(1200, 20, seed=9)
    kw = dict(mode=MODE_FIXED, ratio=2.0, n_clusters=3, want_recon=False)
    o1 = enc_mod.encode(data, DIST, well_state=WellState.debug(),
                        use_jax=False, **kw)
    o2 = enc_mod.encode(data, DIST, well_state=WellState.debug(),
                        use_jax=False, shards=4, **kw)
    assert np.array_equal(dec_mod.decode(o1.compressed),
                          dec_mod.decode(o2.compressed))


def test_v2_shard_payloads_are_independent_streams():
    """Each shard must decode standalone given its slot in the directory."""
    data = synth(800, 16)
    out = enc_mod.encode(data, DIST, well_state=WellState.debug(),
                         use_jax=False, shards=4, want_recon=False)
    head = container_v2.parse(out.compressed, blocks_len=None)
    tables = rt.tables_from_blocks(
        out.compressed[container_v2.header_size():], head.cluster_count,
        head.columns)
    head = container_v2.parse(out.compressed, blocks_len=tables.consumed)
    assert len(head.shards) == 4
    full = dec_mod.decode(out.compressed)
    row = 0
    for s in head.shards:
        payload = out.compressed[s.payload_off:s.payload_off
                                 + s.payload_len]
        well = np.frombuffer(s.well_state, dtype="<u4")
        got = rt.decode_colmajor(tables, payload, s.lines, well)
        assert np.array_equal(got, full[row:row + s.lines])
        row += s.lines
    assert row == head.lines


def test_v2_rejects_corruption():
    data = synth(100, 10)
    out = enc_mod.encode(data, DIST, well_state=WellState.debug(),
                         use_jax=False, shards=2, want_recon=False)
    bad = bytearray(out.compressed)
    bad[4] = 9  # version byte
    with pytest.raises(ValueError):
        container_v2.parse(bytes(bad), blocks_len=1)


def test_shard_plan_alignment():
    for n in (1, 3, 4, 5, 100, 1001):
        for shards in (1, 2, 7, 64):
            counts = enc_mod._shard_plan(n, 7, shards)
            assert sum(counts) == n
            assert len(counts) <= max(1, shards)
            # every shard start must sit on a 4-draw word boundary
            off = 0
            for c in counts[:-1]:
                off += c
                assert (off * 7) % 4 == 0 or off % 4 == 0
