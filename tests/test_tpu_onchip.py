"""Gated on-TPU tests (VERDICT r1 weak item 5 / next item 7): the Pallas
kernels and a mid-size device-path encode, validated on the REAL chip —
not interpret mode. Each test runs in a watchdogged subprocess (the
shared tunnel has unbounded cold-start variance and must not hang the
suite); the whole module is skipped unless QVZ_TPU_ONCHIP=1.

Mosaic gotcha pinned here: compiled Pallas argmin breaks ties toward the
HIGHEST index, the reference needs lowest — the kernels use explicit
min-index-over-minima, so tie-heavy inputs are part of the on-chip data.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.tpu

REPO = pathlib.Path(__file__).resolve().parent.parent

# Machine-readable ran/stalled record (VERDICT r2 weak item 4): a
# chronically stalled tunnel used to yield a green `make test-tpu` that
# validated nothing, with the evidence only in log text. Every on-chip
# attempt now appends {test, outcome, seconds} here; bench.py folds the
# tally into its JSON telemetry so the round record carries it.
TALLY = REPO / "build" / "onchip_tally.json"


def _record(test: str, outcome: str, seconds: float) -> None:
    TALLY.parent.mkdir(exist_ok=True)
    rows = []
    if TALLY.exists():
        try:
            rows = json.loads(TALLY.read_text())
        except (ValueError, OSError):
            rows = []
    rows.append({"test": test, "outcome": outcome, "ts": time.time(),
                 "seconds": round(seconds, 1)})
    TALLY.write_text(json.dumps(rows, indent=1))


def _run_onchip(script: str, timeout: int = 560) -> str:
    test = os.environ.get("PYTEST_CURRENT_TEST", "?").split(" ")[0]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # undo the CPU forcing of conftest
    env["XLA_FLAGS"] = ""  # no virtual host devices
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        # The shared tunnel stalls for minutes at a time; that is an
        # environment condition, not a kernel regression — skip so the
        # gate stays meaningful (real assertion failures still FAIL).
        _record(test, "stalled", time.perf_counter() - t0)
        pytest.skip(f"TPU tunnel stalled (> {timeout}s)")
    _record(test, "ran" if r.returncode == 0 else "failed",
            time.perf_counter() - t0)
    assert r.returncode == 0, f"on-chip script failed:\n{r.stderr[-2000:]}"
    return r.stdout


def test_pallas_kernels_on_chip():
    out = _run_onchip("""
import numpy as np, jax, jax.numpy as jnp
assert any(d.platform != 'cpu' for d in jax.devices()), jax.devices()
from qvz_tpu.ops.pallas_kernels import kmeans_step_fused, pad_rows
from qvz_tpu.spec import kmeans as spec_kmeans

rng = np.random.default_rng(0)
# tie-heavy input: many identical rows => equidistant centroid ties,
# exercising the min-index-over-minima workaround under Mosaic
base = rng.integers(0, 72, size=(64, 100)).astype(np.uint8)
d = np.repeat(base, 64, axis=0)
m = d[[0, 1, 2, 3]].astype(np.int32)
a_ref = spec_kmeans.kmeans_assign(d.astype(np.int32), m)
dp = jax.device_put(pad_rows(d))
a, s, c = kmeans_step_fused(dp, jnp.asarray(m), jnp.int32(d.shape[0]), 4)
a = np.asarray(a)[:d.shape[0]]
assert np.array_equal(a, a_ref), 'argmin tie-break divergence on chip'
print('kmeans pallas on-chip OK')

from qvz_tpu.ops import stats as jx_stats
from qvz_tpu.spec import stats as sp_stats
cl = (np.arange(d.shape[0]) % 3).astype(np.uint8)
c0d, cdd = jx_stats.conditional_counts(d, cl, 3)
c0r, cdr = sp_stats.conditional_counts(d, cl, 3)
assert np.array_equal(np.asarray(c0d), c0r)
assert np.array_equal(np.asarray(cdd), cdr)
print('stats on-chip OK')
""")
    assert "kmeans pallas on-chip OK" in out
    assert "stats on-chip OK" in out


def test_device_encode_parity_on_chip():
    out = _run_onchip("""
import numpy as np, jax
assert any(d.platform != 'cpu' for d in jax.devices()), jax.devices()
from qvz_tpu.constants import DISTORTION_MSE
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState
from qvz_tpu.pipeline import encode as enc

rng = np.random.default_rng(9)
n, cols = 30000, 60
start = rng.integers(20, 45, size=(n, 1))
steps = rng.integers(-3, 4, size=(n, cols - 1))
data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
               71).astype(np.uint8)
dist = make_matrix(DISTORTION_MSE)
kw = dict(ratio=0.5, well_state=WellState.debug(), shards=4,
          want_recon=False)
host = enc.encode(data, dist, use_jax=False, **kw)
dev = enc.encode(data, dist, use_jax=True, **kw)
assert host.compressed == dev.compressed, 'on-chip container divergence'
assert 'quantize' in dev.stats.device_seconds
print('device encode parity on-chip OK')
""")
    assert "device encode parity on-chip OK" in out


def test_device_coder_32_lanes_on_chip():
    """The lane-parallel arithmetic ENCODER on the real chip: a 32-shard
    QVZ2 container byte-identical to the host coder (VERDICT r2
    next-round item 1's done-gate). Includes the compiled-Mosaic/XLA
    integer semantics the CPU backend cannot vouch for."""
    out = _run_onchip("""
import numpy as np, jax, time
assert any(d.platform != 'cpu' for d in jax.devices()), jax.devices()
from qvz_tpu.constants import DISTORTION_MSE
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState
from qvz_tpu.pipeline import encode as enc

rng = np.random.default_rng(13)
n, cols = 64000, 40
start = rng.integers(20, 45, size=(n, 1))
steps = rng.integers(-3, 4, size=(n, cols - 1))
data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
               71).astype(np.uint8)
dist = make_matrix(DISTORTION_MSE)
kw = dict(ratio=0.5, well_state=WellState.debug(), shards=32,
          prime=False, want_recon=False)
host = enc.encode(data, dist, use_jax=False, **kw)
t0 = time.perf_counter()
dev = enc.encode(data, dist, use_jax=True, **kw)
dt = time.perf_counter() - t0
assert host.compressed == dev.compressed, 'device coder divergence'
assert 'device_code' in dev.stats.device_seconds
assert dev.stats.coder_fallback_lanes == 0
print(f'device coder 32-lane parity on-chip OK '
      f'({n * cols / max(dev.stats.phase_seconds["device_code"], 1e-9) / 1e6:.1f} Msym/s coder phase, total {dt:.1f}s)')
# step-batched kernel (QVZ_TPU_CODER_BATCH): compiled-Mosaic vouching
# for the intra-batch correction math — interpret green is not enough
import os
os.environ['QVZ_TPU_CODER_BATCH'] = '8'
t0 = time.perf_counter()
dev8 = enc.encode(data, dist, use_jax=True, **kw)
dt8 = time.perf_counter() - t0
assert host.compressed == dev8.compressed, 'batched coder divergence'
assert dev8.stats.coder_fallback_lanes == 0
print(f'device coder batch-8 parity on-chip OK '
      f'({n * cols / max(dev8.stats.phase_seconds["device_code"], 1e-9) / 1e6:.1f} Msym/s coder phase, total {dt8:.1f}s)')
""")
    assert "device coder 32-lane parity on-chip OK" in out
    assert "device coder batch-8 parity on-chip OK" in out


def test_device_coder_packed_f2_sblow_on_chip():
    """Round-5 kernel defaults at PRODUCTION lane geometry: 256 lanes
    exercises the F=2 slot-packing (the 32-lane test runs F=8), and
    the per-block lower sweep bound (QVZ_TPU_CODER_SBLOW) is vouched
    both on (default) and off against the host coder — compiled
    Mosaic, not interpret mode."""
    out = _run_onchip("""
import numpy as np, jax, os, time
assert any(d.platform != 'cpu' for d in jax.devices()), jax.devices()
from qvz_tpu.constants import DISTORTION_MSE
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState
from qvz_tpu.pipeline import encode as enc

rng = np.random.default_rng(23)
n, cols = 64000, 40
start = rng.integers(20, 45, size=(n, 1))
steps = rng.integers(-3, 4, size=(n, cols - 1))
data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
               71).astype(np.uint8)
dist = make_matrix(DISTORTION_MSE)
kw = dict(ratio=0.5, well_state=WellState.debug(), shards=256,
          prime=False, want_recon=False)
host = enc.encode(data, dist, use_jax=False, **kw)
dev = enc.encode(data, dist, use_jax=True, **kw)
assert host.compressed == dev.compressed, 'F=2 packed coder divergence'
assert dev.stats.coder_fallback_lanes == 0
print('device coder F=2 sblow-on parity on-chip OK')
os.environ['QVZ_TPU_CODER_SBLOW'] = '0'
dev0 = enc.encode(data, dist, use_jax=True, **kw)
assert host.compressed == dev0.compressed, 'sblow-off divergence'
print('device coder F=2 sblow-off parity on-chip OK')
os.environ['QVZ_TPU_QUANT_MERGED'] = '0'
devs = enc.encode(data, dist, use_jax=True, **kw)
assert host.compressed == devs.compressed, 'split-quantize divergence'
print('quantize split-form parity on-chip OK')
del os.environ['QVZ_TPU_QUANT_MERGED']
os.environ['QVZ_TPU_QUANT_COLW'] = '7'
devw = enc.encode(data, dist, use_jax=True, **kw)
assert host.compressed == devw.compressed, 'windowed-quantize divergence'
print('quantize column-window parity on-chip OK')
del os.environ['QVZ_TPU_QUANT_COLW']
os.environ['QVZ_TPU_QUANTIZE_PALLAS'] = '0'
devg = enc.encode(data, dist, use_jax=True, **kw)
assert host.compressed == devg.compressed, 'gather-quantize divergence'
print('quantize kernel-vs-gather parity on-chip OK')
""")
    assert "device coder F=2 sblow-on parity on-chip OK" in out
    assert "device coder F=2 sblow-off parity on-chip OK" in out
    assert "quantize split-form parity on-chip OK" in out
    assert "quantize column-window parity on-chip OK" in out
    assert "quantize kernel-vs-gather parity on-chip OK" in out


def test_device_decode_parity_on_chip():
    """The lane-parallel arithmetic DECODER on the real chip: decoding
    a 16-shard QVZ2 container byte-identical to the host decoder
    (ROADMAP item 13's scan form). Validates the compiled integer
    semantics of the decode scan (reservoir shifts, 42-bit compares,
    exact_div) that the CPU backend cannot vouch for."""
    out = _run_onchip("""
import numpy as np, jax, time
assert any(d.platform != 'cpu' for d in jax.devices()), jax.devices()
from qvz_tpu.constants import DISTORTION_MSE
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState
from qvz_tpu.pipeline import encode as enc
from qvz_tpu.pipeline import decode as dec

rng = np.random.default_rng(29)
n, cols = 48000, 40
start = rng.integers(20, 45, size=(n, 1))
steps = rng.integers(-3, 4, size=(n, cols - 1))
data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
               71).astype(np.uint8)
dist = make_matrix(DISTORTION_MSE)
comp = enc.encode(data, dist, ratio=0.5, well_state=WellState.debug(),
                  shards=16, use_jax=False, want_recon=False).compressed
host = dec.decode(comp)
t0 = time.perf_counter()
dev = dec.decode(comp, device=True)
dt = time.perf_counter() - t0
assert np.array_equal(dev, host), 'device decode divergence on chip'
print(f'device decode 16-lane parity on-chip OK '
      f'({n * cols / dt / 1e6:.1f} Msym/s incl. transfers, {dt:.1f}s)')
# compiled Mosaic decode kernel: the vouching run interpret mode
# cannot provide (integer semantics diverged on hardware before —
# round-2 argmin tie-break)
import os
os.environ['QVZ_TPU_DEC_PALLAS'] = '1'
t0 = time.perf_counter()
devk = dec.decode(comp, device=True)
dtk = time.perf_counter() - t0
assert np.array_equal(devk, host), 'Mosaic decode divergence on chip'
print(f'mosaic decode parity on-chip OK '
      f'({n * cols / dtk / 1e6:.1f} Msym/s incl. transfers, {dtk:.1f}s)')
""")
    assert "device decode 16-lane parity on-chip OK" in out
    assert "mosaic decode parity on-chip OK" in out


def test_mesh_device_coder_on_chip():
    """The mesh-sharded lane coder path compiled on real hardware: a
    1-device Mesh over the chip drives _mesh_lane_kernel (shard_map +
    Mosaic kernel) through the full encode; the container must be
    byte-identical to the host path. Single chip only proves the
    shard_map lowering + kernel composition compiles and stays exact
    on TPU — the N>1 wiring is proven on the virtual CPU mesh
    (dryrun_multichip, tests/test_sharded.py)."""
    out = _run_onchip("""
import numpy as np, jax
assert any(d.platform != 'cpu' for d in jax.devices()), jax.devices()
from jax.sharding import Mesh
from qvz_tpu.constants import DISTORTION_MSE
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState
from qvz_tpu.parallel.mesh import READS_AXIS
from qvz_tpu.pipeline import encode as enc

rng = np.random.default_rng(23)
n, cols = 30000, 60
start = rng.integers(20, 45, size=(n, 1))
steps = rng.integers(-3, 4, size=(n, cols - 1))
data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
               71).astype(np.uint8)
dist = make_matrix(DISTORTION_MSE)
mesh = Mesh(np.asarray(jax.devices()[:1]), (READS_AXIS,))
kw = dict(ratio=0.5, well_state=WellState.debug(), shards=32,
          want_recon=False)
host = enc.encode(data, dist, use_jax=False, **kw)
meshy = enc.encode(data, dist, mesh=mesh, use_jax=True, **kw)
assert host.compressed == meshy.compressed, 'mesh on-chip divergence'
assert 'device_code' in meshy.stats.device_seconds
print('mesh device coder on-chip OK, fallbacks',
      meshy.stats.coder_fallback_lanes)
""")
    assert "mesh device coder on-chip OK" in out


def test_device_wide_geometry_windows_on_chip():
    """The reference's 1022-column ceiling (lines.h:12) through the
    device quantize path on the real chip: unwindowed replication
    would materialize ~ cols x rows x 4 KB of tables (multi-GB); the
    auto column window must keep it bounded AND byte-equal to the
    host encode."""
    out = _run_onchip("""
import numpy as np, jax, os
assert any(d.platform != 'cpu' for d in jax.devices()), jax.devices()
from qvz_tpu.constants import DISTORTION_MSE
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState
from qvz_tpu.pipeline import encode as enc

rng = np.random.default_rng(31)
n, cols = 16384, 1022
start = rng.integers(20, 45, size=(n, 1))
steps = rng.integers(-1, 2, size=(n, cols - 1))
data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 0,
               71).astype(np.uint8)
dist = make_matrix(DISTORTION_MSE)
kw = dict(ratio=0.5, well_state=WellState.debug(), shards=32,
          prime=False, want_recon=False)
host = enc.encode(data, dist, use_jax=False, **kw)
dev = enc.encode(data, dist, use_jax=True, **kw)
assert host.compressed == dev.compressed, 'wide-geometry divergence'
assert dev.stats.coder_fallback_lanes == 0
print('wide-geometry (1022 cols) windowed device parity on-chip OK')
""")
    assert ("wide-geometry (1022 cols) windowed device parity on-chip "
            "OK") in out
