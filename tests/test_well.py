"""WELL-1024a parity tests against reference-generated vectors.

Golden vectors were produced by the reference implementation
(src/well.c) with the debug state (32 x 0x55555555) and a second
arbitrary state; see tests/golden/well_*.txt.
"""

import numpy as np

from qvz_tpu.ops import well
from qvz_tpu.ops.well import WellState


def _load(golden_dir, name):
    return np.loadtxt(golden_dir / name, dtype=np.uint64).astype(np.uint32)


def test_raw_words_match_reference(golden_dir):
    ref = _load(golden_dir, "well_raw.txt")
    st = WellState.debug()
    got = np.array([st.next_word() for _ in range(len(ref))], dtype=np.uint32)
    np.testing.assert_array_equal(got, ref)


def test_bits7_match_reference(golden_dir):
    ref = _load(golden_dir, "well_bits7.txt")
    st = WellState.debug()
    got = np.array([st.next_bits(7) for _ in range(len(ref))], dtype=np.uint32)
    np.testing.assert_array_equal(got, ref)


def test_bits7_second_seed(golden_dir):
    ref = _load(golden_dir, "well_bits7_b.txt")
    words = [(0xDEADBEEF + i * 0x9E3779B9) & 0xFFFFFFFF for i in range(32)]
    st = WellState(words)
    got = np.array([st.next_bits(7) for _ in range(len(ref))], dtype=np.uint32)
    np.testing.assert_array_equal(got, ref)


def test_state_serialization_roundtrip():
    st = WellState.debug()
    for _ in range(10):
        st.next_word()
    raw = st.to_bytes()
    st2 = WellState.from_bytes(raw)
    assert st2.state == st.state
    # continue in lockstep (n differs but from_bytes implies n per stream
    # restart semantics: the reference reloads raw words with n=0)


def test_draws_from_words_equals_scalar_pool():
    st = WellState.debug()
    n_draws = 1000
    scalar = [st.next_bits(7) for _ in range(n_draws)]
    st2 = WellState.debug()
    nw = well.words_needed(n_draws, 7)
    words = np.array([st2.next_word() for _ in range(nw)], dtype=np.uint32)
    vec = well.draws_from_words(words, n_draws, 7)
    np.testing.assert_array_equal(vec, np.array(scalar, dtype=np.uint8))


def test_vectorized_lockstep_generation():
    st = WellState.debug()
    ref_words = np.array([st.next_word() for _ in range(256)], dtype=np.uint32)
    states = np.asarray([WellState.debug().state], dtype=np.uint32)
    got = well.well_words_vectorized(states, 256)[0]
    np.testing.assert_array_equal(got, ref_words)


def test_generate_draws_small_path():
    st = WellState.debug()
    ref = np.array([st.next_bits(7) for _ in range(5000)], dtype=np.uint8)
    got = well.generate_draws(WellState.debug(), 5000, n_chunks=1)
    np.testing.assert_array_equal(got, ref)


def test_generate_draws_jump_ahead_path():
    n = 40000  # forces the chunked jump-ahead path
    st = WellState.debug()
    ref = np.array([st.next_bits(7) for _ in range(n)], dtype=np.uint8)
    got = well.generate_draws(WellState.debug(), n, n_chunks=8)
    np.testing.assert_array_equal(got, ref)


def test_jump_matrix_consistency():
    # M^2 applied once == M applied twice
    st = WellState.debug()
    v0 = well._state_to_vec(st.state, st.n)
    m1 = well.step_matrix_pow(0)
    m2 = well.step_matrix_pow(1)
    v_two_steps = well._matvec_gf2(m1, well._matvec_gf2(m1, v0))
    v_sq = well._matvec_gf2(m2, v0)
    np.testing.assert_array_equal(v_two_steps, v_sq)
