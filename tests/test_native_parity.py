"""Bitstream parity of the native (C++) pipeline vs reference goldens.

Covers every mode class in BASELINE.json: fixed-rate (-r), variable-rate
(-f), all three distortion metrics (-d M/L/A), multi-cluster (-c), plus
decode of reference-encoded containers.
"""

import numpy as np
import pytest

from qvz_tpu.constants import (
    DISTORTION_LORENTZ,
    DISTORTION_MANHATTAN,
    DISTORTION_MSE,
    MODE_FIXED,
    MODE_RATIO,
)
from qvz_tpu.ops import distortion as dm
from qvz_tpu.pipeline import decode as dec_mod
from qvz_tpu.pipeline import encode as enc_mod
from qvz_tpu.spec.pipeline import load_quality_file

CONFIGS = [
    ("tiny_f05", "tiny.in", 1, MODE_RATIO, 0.5, DISTORTION_MSE),
    ("tiny_r2", "tiny.in", 1, MODE_FIXED, 2.0, DISTORTION_MSE),
    ("r2_mse", "small.in", 1, MODE_FIXED, 2.0, DISTORTION_MSE),
    ("r1_mse", "small.in", 1, MODE_FIXED, 1.0, DISTORTION_MSE),
    ("f05_mse", "small.in", 1, MODE_RATIO, 0.5, DISTORTION_MSE),
    ("f05_lorentz", "small.in", 1, MODE_RATIO, 0.5, DISTORTION_LORENTZ),
    ("f05_l1", "small.in", 1, MODE_RATIO, 0.5, DISTORTION_MANHATTAN),
    ("f09_mse", "small.in", 1, MODE_RATIO, 0.9, DISTORTION_MSE),
    ("f00_mse", "small.in", 1, MODE_RATIO, 0.0, DISTORTION_MSE),
    ("c3_f05", "small.in", 3, MODE_RATIO, 0.5, DISTORTION_MSE),
    ("med_f05", "med.in", 1, MODE_RATIO, 0.5, DISTORTION_MSE),
    ("med_c4", "med.in", 4, MODE_RATIO, 0.4, DISTORTION_MSE),
]


@pytest.fixture(scope="module")
def inputs(golden_dir):
    cache = {}
    for _, inp, *_ in CONFIGS:
        if inp not in cache:
            cache[inp] = load_quality_file(golden_dir / inp)
    return cache


@pytest.mark.parametrize(
    "name,inp,clusters,mode,ratio,dist", CONFIGS,
    ids=[c[0] for c in CONFIGS])
def test_encode_bit_exact(golden_dir, inputs, name, inp, clusters, mode,
                          ratio, dist):
    out = enc_mod.encode(inputs[inp], dm.make_matrix(dist),
                         n_clusters=clusters, mode=mode, ratio=ratio,
                         use_jax=False)
    golden = (golden_dir / f"{name}.q").read_bytes()
    assert out.compressed == golden
    recon = load_quality_file(golden_dir / f"{name}.u")
    np.testing.assert_array_equal(out.reconstructed, recon)
    # The -s stats line fields (rate over payload bytes only).
    ref_stats = (golden_dir / f"{name}.stats").read_text().split(",")
    assert abs(out.stats.rate - float(ref_stats[1])) < 5e-5
    assert abs(out.stats.distortion - float(ref_stats[3])) < 5e-5


@pytest.mark.parametrize(
    "name", [c[0] for c in CONFIGS], ids=[c[0] for c in CONFIGS])
def test_decode_reference_containers(golden_dir, name):
    dec = dec_mod.decode((golden_dir / f"{name}.q").read_bytes())
    ref = np.fromfile(golden_dir / f"{name}.u", dtype=np.uint8)
    np.testing.assert_array_equal(dec.reshape(-1), ref)


def test_native_design_matches_spec_serialization(golden_dir, inputs):
    """C++ designer output == spec designer output, byte for byte."""
    from qvz_tpu.native import runtime as rt
    from qvz_tpu.format import container
    from qvz_tpu.spec import stats as np_stats
    from qvz_tpu.spec.codebook import generate_codebook

    data = inputs["tiny.in"]
    counts0, cond = np_stats.conditional_counts(
        data, np.zeros(len(data), np.uint8), 1)
    design = rt.Design(counts0, cond, MODE_RATIO, 0.5,
                       dm.make_matrix(DISTORTION_MSE))
    native_blocks = design.serialized()

    cb = generate_codebook(counts0[0].tolist(), cond[0].tolist(),
                           data.shape[1],
                           dm.make_matrix(DISTORTION_MSE).tolist(),
                           MODE_RATIO, 0.5)
    spec_blocks = container.serialize_codebook(cb)
    assert native_blocks == spec_blocks


def test_native_well_draws_match_spec():
    from qvz_tpu.native import runtime as rt
    from qvz_tpu.ops.well import WellState
    st = WellState.debug()
    ref = np.array([st.next_bits(7) for _ in range(10000)], dtype=np.uint8)
    got = rt.well_draws7(WellState.debug().state, 10000)
    np.testing.assert_array_equal(got, ref)


def test_single_column_golden(golden_dir):
    """cols=1 envelope corner: the reference DECODER segfaults here, but
    its encoder works; our encode matches it and our decode matches the
    encoder's reconstruction."""
    data = load_quality_file(golden_dir / "g_col1.in")
    assert data.shape[1] == 1
    out = enc_mod.encode(data, dm.make_matrix(DISTORTION_MSE),
                         mode=MODE_RATIO, ratio=0.5, use_jax=False)
    assert out.compressed == (golden_dir / "g_col1.q").read_bytes()
    dec = dec_mod.decode(out.compressed)
    recon = (golden_dir / "g_col1.u").read_bytes()
    assert dec.tobytes() == recon


def test_custom_distortion_golden(golden_dir):
    from qvz_tpu.constants import DISTORTION_CUSTOM

    data = load_quality_file(golden_dir / "g_custom.in")
    dist = dm.make_matrix(DISTORTION_CUSTOM,
                          path=str(golden_dir / "g_custom_dist.txt"))
    out = enc_mod.encode(data, dist, mode=MODE_RATIO, ratio=0.3,
                         use_jax=False)
    assert out.compressed == (golden_dir / "g_custom.q").read_bytes()
    dec = dec_mod.decode(out.compressed)
    assert dec.tobytes() == (golden_dir / "g_custom.u").read_bytes()
