"""Tools: fastq extract/reinsert and mse_check."""

import numpy as np
import pytest

from qvz_tpu.tools import fastq, mse_check
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.constants import DISTORTION_MSE


@pytest.fixture()
def fastq_file(tmp_path):
    rng = np.random.default_rng(3)
    quals = (rng.integers(0, 72, size=(50, 30)).astype(np.uint8) + 33)
    fq = tmp_path / "t.fastq"
    with open(fq, "wb") as f:
        for i, q in enumerate(quals):
            f.write(b"@read%d comment\n" % i)
            f.write(b"ACGT" * 7 + b"AC\n")
            f.write(b"+\n")
            f.write(q.tobytes() + b"\n")
    return fq, quals


def test_fastq_round_trip(fastq_file, tmp_path):
    fq, quals = fastq_file
    qual = tmp_path / "q.txt"
    assert fastq.extract(str(fq), str(qual)) == 50
    got = np.frombuffer(qual.read_bytes(), dtype=np.uint8).reshape(50, 31)
    assert np.array_equal(got[:, :30], quals)
    out = tmp_path / "r.fastq"
    assert fastq.reinsert(str(fq), str(qual), str(out)) == 50
    assert out.read_bytes() == fq.read_bytes()


def test_fastq_reinsert_length_mismatch(fastq_file, tmp_path):
    fq, _ = fastq_file
    bad = tmp_path / "bad.txt"
    bad.write_bytes(b"II\n" * 50)
    with pytest.raises(ValueError, match="length mismatch"):
        fastq.reinsert(str(fq), str(bad), str(tmp_path / "o.fastq"))


def test_mse_check_compare():
    a = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    b = np.array([[12, 20], [30, 37]], dtype=np.uint8)
    r = mse_check.compare(a, b, make_matrix(DISTORTION_MSE))
    assert r["total"] == 4 + 9
    assert r["stats_line"] == ((4 / 2) + (9 / 2)) / 2
    with pytest.raises(ValueError, match="geometry"):
        mse_check.compare(a, b[:1], make_matrix(DISTORTION_MSE))


def test_transcode_cli(tmp_path):
    import numpy as np

    from qvz_tpu import cli
    from qvz_tpu.tools import transcode as tc

    rng = np.random.default_rng(2)
    n, cols = 4000, 25
    data = rng.integers(0, 60, size=(n, cols)).astype(np.uint8)
    out = np.empty((n, cols + 1), dtype=np.uint8)
    out[:, :cols] = data + 33
    out[:, cols] = 10
    inp = tmp_path / "t.in"
    inp.write_bytes(out.tobytes())
    v1 = tmp_path / "t.v1.q"
    assert cli.main(["qvz", "-f", "0.5", "--debug-seed", "--no-jax",
                     str(inp), str(v1)]) == 0
    v2 = tmp_path / "t.v2.q"
    assert tc.main(["transcode", str(v1), str(v2), "--to", "v2",
                    "--shards", "3"]) == 0
    back = tmp_path / "t.back.q"
    assert tc.main(["transcode", str(v2), str(back), "--to", "v1"]) == 0
    assert back.read_bytes() == v1.read_bytes()
    # bad args -> usage, nonzero
    assert tc.main(["transcode", str(v1)]) == 1
