"""Container transcoding: v1 <-> QVZ2 without re-quantization must be
byte-identical to direct encodes of the original data."""

import numpy as np
import pytest

from qvz_tpu.constants import DISTORTION_MSE
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState
from qvz_tpu.pipeline import encode as enc_mod
from qvz_tpu.tools.transcode import transcode


@pytest.fixture(scope="module")
def encoded(tmp_path_factory):
    rng = np.random.default_rng(55)
    n, cols = 25000, 36
    start = rng.integers(20, 45, size=(n, 1))
    steps = rng.integers(-3, 4, size=(n, cols - 1))
    data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
                   71).astype(np.uint8)
    dist = make_matrix(DISTORTION_MSE)
    d = tmp_path_factory.mktemp("tc")
    out = {}
    for k in (1, 3):
        kw = dict(n_clusters=k, ratio=0.5, well_state=WellState.debug(),
                  use_jax=False, want_recon=False)
        v1 = enc_mod.encode(data, dist, shards=1, **kw)
        v2 = enc_mod.encode(data, dist, shards=4, **kw)
        p1 = d / f"c{k}.v1.q"
        p2 = d / f"c{k}.v2.q"
        p1.write_bytes(v1.compressed)
        p2.write_bytes(v2.compressed)
        out[k] = (p1, v1.compressed, p2, v2.compressed)
    return out


@pytest.mark.parametrize("k", [1, 3])
def test_v1_to_v2_byte_equal_direct(encoded, tmp_path, k):
    p1, _, _, v2_direct = encoded[k]
    out = tmp_path / "t.v2.q"
    transcode(str(p1), str(out), "v2", shards=4)
    assert out.read_bytes() == v2_direct


@pytest.mark.parametrize("k", [1, 3])
def test_v2_to_v1_byte_equal_direct(encoded, tmp_path, k):
    _, v1_direct, p2, _ = encoded[k]
    out = tmp_path / "t.v1.q"
    transcode(str(p2), str(out), "v1")
    assert out.read_bytes() == v1_direct
