"""CLI surface tests (flag parity with src/main.c:166-184 + extensions)."""

import numpy as np
import pytest

from qvz_tpu import cli


@pytest.fixture()
def qfile(tmp_path):
    rng = np.random.default_rng(5)
    steps = np.concatenate([rng.integers(20, 45, size=(300, 1)),
                            rng.integers(-3, 4, size=(300, 24))], axis=1)
    q = np.clip(steps.cumsum(1), 0, 71)
    out = np.empty((300, 26), dtype=np.uint8)
    out[:, :25] = q.astype(np.uint8) + 33
    out[:, 25] = 10
    p = tmp_path / "in.qual"
    p.write_bytes(out.tobytes())
    return p


def test_round_trip(qfile, tmp_path, capsys):
    comp = tmp_path / "out.q"
    dec = tmp_path / "out.dec"
    recon = tmp_path / "recon.txt"
    rc = cli.main(["qvz", "-f", "0.5", "-s", "--debug-seed", "--no-jax",
                   "-u", str(recon), str(qfile), str(comp)])
    assert rc == 0
    line = capsys.readouterr().out.strip()
    assert line.startswith("rate,")
    rc = cli.main(["qvz", "-x", str(comp), str(dec)])
    assert rc == 0
    assert dec.read_bytes() == recon.read_bytes()


def test_sharded_flag_round_trip(qfile, tmp_path):
    comp = tmp_path / "out.q2"
    dec = tmp_path / "out.dec"
    rc = cli.main(["qvz", "-f", "0.5", "--debug-seed", "--no-jax",
                   "--shards", "3", str(qfile), str(comp)])
    assert rc == 0
    assert comp.read_bytes()[:4] == b"QVZ2"
    assert cli.main(["qvz", "-x", str(comp), str(dec)]) == 0
    assert dec.stat().st_size == qfile.stat().st_size


def test_profile_writes_phases(qfile, tmp_path):
    comp = tmp_path / "out.q"
    pdir = tmp_path / "prof"
    rc = cli.main(["qvz", "-f", "0.5", "--debug-seed", "--no-jax",
                   "--profile", str(pdir), str(qfile), str(comp)])
    assert rc == 0
    import json
    phases = json.loads((pdir / "phases.json").read_text())
    assert set(phases["phase_seconds"]) == {"cluster", "stats", "design",
                                            "code"}


@pytest.mark.parametrize("argv", [
    ["qvz", "-Z", "a", "b"],              # unknown flag
    ["qvz", "-f", "xyz", "a", "b"],       # bad numeric
    ["qvz", "-f"],                        # missing value
    ["qvz", "onlyone"],                   # missing filenames
    ["qvz", "-q", "/nonexistent", "/tmp/_x.q"],   # missing input
])
def test_error_paths_clean_exit(argv, capsys):
    assert cli.main(argv) == 1
    out = capsys.readouterr().out
    assert "Traceback" not in out


def test_decode_malformed_container(tmp_path, capsys):
    bad = tmp_path / "bad.q"
    bad.write_bytes(b"\x01" + b"\x00" * 40)
    assert cli.main(["qvz", "-x", str(bad), str(tmp_path / "o")]) == 1
    assert "Error:" in capsys.readouterr().out


def test_help(capsys):
    assert cli.main(["qvz", "-h"]) == 0
    assert "-f [ratio]" in capsys.readouterr().out


def test_reuse_books_reproduces_container(qfile, tmp_path):
    comp1 = tmp_path / "a.q"
    comp2 = tmp_path / "b.q"
    base = ["qvz", "-f", "0.5", "--debug-seed", "--no-jax"]
    assert cli.main([*base, str(qfile), str(comp1)]) == 0
    assert cli.main([*base, "--reuse-books", str(comp1), str(qfile),
                     str(comp2)]) == 0
    assert comp1.read_bytes() == comp2.read_bytes()


def test_reuse_books_cluster_mismatch(qfile, tmp_path, capsys):
    comp = tmp_path / "a.q"
    assert cli.main(["qvz", "-f", "0.5", "--debug-seed", "--no-jax",
                     str(qfile), str(comp)]) == 0
    rc = cli.main(["qvz", "-c", "3", "-f", "0.5", "--no-jax",
                   "--reuse-books", str(comp), str(qfile),
                   str(tmp_path / "b.q")])
    assert rc == 1
    assert "mismatch" in capsys.readouterr().out


def test_library_api_round_trip(qfile, tmp_path):
    import qvz_tpu.api as qvz

    comp = tmp_path / "api.q"
    stats = qvz.compress(str(qfile), str(comp), ratio=0.5,
                         debug_seed=True, shards=2, use_jax=False)
    assert stats.payload_bytes > 0
    n = qvz.decompress(str(comp), str(tmp_path / "api.dec"))
    assert n == stats.lines

    blob, s2 = qvz.compress_bytes(qfile.read_bytes(), ratio=0.5,
                                  debug_seed=True, use_jax=False)
    text = qvz.decompress_bytes(blob)
    assert len(text) == s2.lines * (s2.columns + 1)


def test_well_state_flag_matches_debug_seed(qfile, tmp_path):
    from qvz_tpu.ops.well import WellState

    state_file = tmp_path / "ws.bin"
    state_file.write_bytes(WellState.debug().to_bytes())
    a, b = tmp_path / "a.q", tmp_path / "b.q"
    assert cli.main(["qvz", "-f", "0.5", "--debug-seed", "--no-jax",
                     str(qfile), str(a)]) == 0
    assert cli.main(["qvz", "-f", "0.5", "--well-state", str(state_file),
                     "--no-jax", str(qfile), str(b)]) == 0
    assert a.read_bytes() == b.read_bytes()


def test_verbose_output(qfile, tmp_path, capsys):
    assert cli.main(["qvz", "-f", "0.5", "-v", "--debug-seed", "--no-jax",
                     str(qfile), str(tmp_path / "v.q")]) == 0
    out = capsys.readouterr().out
    assert "Lines: 300" in out and "Columns: 25" in out
    assert "distortion" in out and "Encoding took" in out


def test_ragged_input_rejected(tmp_path, capsys):
    bad = tmp_path / "ragged.qual"
    bad.write_bytes(b"IIIII\nIIII\nIIIII\n")
    rc = cli.main(["qvz", "-f", "0.5", "--no-jax", str(bad),
                   str(tmp_path / "o.q")])
    assert rc == 1
    assert "line 2" in capsys.readouterr().out


def test_cli_streaming_flag(tmp_path):
    """--streaming produces a container byte-identical to the default
    in-memory encode at the same shard plan."""
    import numpy as np

    from qvz_tpu import cli

    rng = np.random.default_rng(9)
    n, cols = 20000, 30
    data = rng.integers(0, 60, size=(n, cols)).astype(np.uint8)
    out = np.empty((n, cols + 1), dtype=np.uint8)
    out[:, :cols] = data + 33
    out[:, cols] = 10
    inp = tmp_path / "s.in"
    inp.write_bytes(out.tobytes())

    a = tmp_path / "a.q"
    b = tmp_path / "b.q"
    assert cli.main(["qvz", "-f", "0.5", "--debug-seed", "--no-jax",
                     "--shards", "4", str(inp), str(a)]) == 0
    assert cli.main(["qvz", "-f", "0.5", "--debug-seed", "--streaming",
                     "--shards", "4", str(inp), str(b)]) == 0
    assert a.read_bytes() == b.read_bytes()

    dec = tmp_path / "s.dec"
    assert cli.main(["qvz", "-x", str(b), str(dec)]) == 0
    assert dec.stat().st_size == out.nbytes


def test_decode_jax_flag_matches_host(qfile, tmp_path):
    """-x --jax routes QVZ2 shards through the device lane decoder;
    output must equal the host decode byte-for-byte."""
    comp = tmp_path / "o.q"
    rc = cli.main(["qvz", "-f", "0.5", "--debug-seed", "--no-jax",
                   "--shards", "3", str(qfile), str(comp)])
    assert rc == 0
    host = tmp_path / "o.host"
    dev = tmp_path / "o.dev"
    assert cli.main(["qvz", "-x", "--no-jax", str(comp),
                     str(host)]) == 0
    assert cli.main(["qvz", "-x", "--jax", str(comp), str(dev)]) == 0
    assert host.read_bytes() == dev.read_bytes()
