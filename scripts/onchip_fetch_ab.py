"""Focused on-chip A/B: the fine-bucket compact fetch (round 4).

Measures the production device coder at the default shape (W=512, b=4,
500k x 100) with stage timings, asserting byte parity vs the host coder
— the record to beat is build/onchip_perf.json's coder_W512_b4
(compact_fetch 1.147 s of device_code 1.704 s, pow2-bucket fetch).
Appends the measurement to build/onchip_fetch_ab.json.
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
OUT = REPO / "build" / "onchip_fetch_ab.json"


def main():
    import jax

    kind = jax.devices()[0].device_kind
    print("device:", kind, flush=True)

    from qvz_tpu.constants import DISTORTION_MSE
    from qvz_tpu.ops.distortion import make_matrix
    from qvz_tpu.ops.well import WellState
    from qvz_tpu.pipeline import encode as enc

    rng = np.random.default_rng(4)
    n, cols = 500_000, 100
    start = rng.integers(28, 40, size=(n, 1))
    steps = rng.integers(-2, 3, size=(n, cols - 1)) - (
        np.arange(cols - 1) // 40)
    data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 2,
                   41).astype(np.uint8)
    dist = make_matrix(DISTORTION_MSE)
    syms = n * cols

    os.environ["QVZ_TPU_CODER_TIMINGS"] = "1"
    os.environ["QVZ_TPU_DEVICE_MIN_BYTES"] = "0"
    kw = dict(ratio=0.5, well_state=WellState.debug(), want_recon=False,
              prime=False)

    host = enc.encode(data, dist, use_jax=False, shards=512, **kw)
    r = enc.encode(data, dist, use_jax=True, shards=512, **kw)
    assert r.compressed == host.compressed, "warm parity"
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        r = enc.encode(data, dist, use_jax=True, shards=512, **kw)
        wall = time.perf_counter() - t0
        assert r.compressed == host.compressed, "parity"
        assert r.stats.coder_fallback_lanes == 0
        ph = dict(r.stats.phase_seconds)
        rec = {
            "wall_s": round(wall, 3),
            "device_code_s": round(ph.get("device_code", 0.0), 3),
            "scan_s": round(ph.get("device_code/scan", 0.0), 3),
            "compact_fetch_s": round(
                ph.get("device_code/compact_fetch", 0.0), 3),
            "device_code_Msym_s": round(
                syms / ph["device_code"] / 1e6, 1),
        }
        print(json.dumps(rec), flush=True)
        if best is None or rec["device_code_s"] < best["device_code_s"]:
            best = rec
    out = {"ts": time.time(), "device_kind": kind, "best": best,
           "note": "fine-bucket fetch A/B vs coder_W512_b4 record"}
    prev = []
    if OUT.exists():
        try:
            prev = json.loads(OUT.read_text())
        except ValueError:
            prev = []
    prev.append(out)
    OUT.write_text(json.dumps(prev, indent=1))
    print("recorded", flush=True)


if __name__ == "__main__":
    main()
