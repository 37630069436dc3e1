"""Bitstream parity of the spec implementation vs reference goldens.

Goldens were produced by the reference qvz built with `make debug`
(fixed WELL state 32 x 0x55555555) on synthetic quality files; see
tests/golden/. The encode check is byte-for-byte on the full container;
decode is checked against the reference's own lossy reconstruction
(the -u side file), which the reference's test.sh diff gate uses too.

Only the tiny input runs through the (slow, scalar) spec pipeline here;
larger configs are covered by the native-runtime parity tests.
"""

import numpy as np
import pytest

from qvz_tpu.constants import MODE_FIXED, MODE_RATIO
from qvz_tpu.ops.distortion import mse_matrix
from qvz_tpu.spec import pipeline


@pytest.fixture(scope="module")
def tiny(golden_dir):
    return pipeline.load_quality_file(golden_dir / "tiny.in")


@pytest.mark.parametrize("name,mode,ratio", [
    ("tiny_f05", MODE_RATIO, 0.5),
    ("tiny_r2", MODE_FIXED, 2.0),
])
def test_encode_bit_exact(golden_dir, tiny, name, mode, ratio):
    res = pipeline.encode(tiny, mse_matrix(), n_clusters=1,
                          mode=mode, ratio=ratio)
    golden = (golden_dir / f"{name}.q").read_bytes()
    assert res.compressed == golden
    recon = pipeline.load_quality_file(golden_dir / f"{name}.u")
    np.testing.assert_array_equal(res.reconstructed, recon)


@pytest.mark.parametrize("name", ["tiny_f05", "tiny_r2"])
def test_decode_matches_reference_reconstruction(golden_dir, name):
    out = pipeline.decode((golden_dir / f"{name}.q").read_bytes())
    recon = pipeline.load_quality_file(golden_dir / f"{name}.u")
    np.testing.assert_array_equal(out, recon)


def test_container_parse_roundtrip(golden_dir):
    from qvz_tpu.format import container
    raw = (golden_dir / "tiny_f05.q").read_bytes()
    head = container.parse_container(raw)
    assert head.cluster_count == 1
    assert head.columns == 20
    assert head.lines == 50
    rebuilt = container.build_container(
        head.codebooks, head.well_state, raw[head.payload_offset:],
        head.columns, head.lines)
    assert rebuilt == raw


def test_glibc_rand_matches(golden_dir):
    from qvz_tpu.utils.glibc_rand import GlibcRand
    ref = np.loadtxt(golden_dir / "glibc_rand_seed1.txt", dtype=np.int64)
    r = GlibcRand(1)
    got = [r.rand() for _ in range(len(ref))]
    np.testing.assert_array_equal(got, ref)
