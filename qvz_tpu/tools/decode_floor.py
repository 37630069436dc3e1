"""v1-decode serial-floor experiment (ROADMAP item 1 / round-2 verdict
item 4 closure).

The v1 container is ONE interleaved adaptive arithmetic stream; its
decode loop is a strict serial chain per symbol:

    tag -> symbol scan -> interval update -> renormalize -> shift new
    payload bits into the tag -> next symbol

Chunk-level parallel decode is structurally impossible: the symbol at
position t is required to update the models AND the interval that
position t+1 reads, and unlike the encoder (whose model replay is
precomputable from the known symbols) the decoder cannot know symbol t
without having decoded 0..t-1. The only question left is constant
factors. This experiment measures the FLOOR of the serial chain with
the model machinery made free: it replays the exact per-symbol
(cum_lo, cum_hi, total, magic) coder inputs recorded from the
encoder's decisions, running only interval update + renormalization +
tag bit-feed against the real payload bits — i.e. a decoder with an
oracle for the scan and the adaptive updates.

Usage: python -m qvz_tpu.tools.decode_floor [n_lines] [cols]
Prints a stage table in Markdown (pasted into DESIGN.md).
"""

from __future__ import annotations

import ctypes
import sys
import time

import numpy as np

from qvz_tpu import native
from qvz_tpu.constants import DISTORTION_MSE
from qvz_tpu.native import runtime as rt
from qvz_tpu.native.runtime import _ptr, _u8p, _u32p
from qvz_tpu.ops.distortion import make_matrix
from qvz_tpu.ops.well import WellState
from qvz_tpu.pipeline import encode as enc_mod


def main(n: int = 500_000, cols: int = 100) -> dict:
    rng = np.random.default_rng(7)
    start = rng.integers(28, 40, size=(n, 1))
    steps = (rng.integers(-2, 3, size=(n, cols - 1))
             - (np.arange(cols - 1) // 40))
    data = np.clip(np.concatenate([start, steps], 1).cumsum(1), 2,
                   41).astype(np.uint8)
    dist = make_matrix(DISTORTION_MSE)
    ws = WellState.debug()

    out = enc_mod.encode(data, dist, ratio=0.5, well_state=ws, shards=1,
                         use_jax=False, want_recon=False)
    comp = out.compressed
    from qvz_tpu.format import container
    parsed = container.parse_container(comp)
    payload = comp[parsed.payload_offset:]

    lib = native.load()
    # exact per-symbol coder inputs from the encoder's decisions
    from qvz_tpu.spec import stats as np_stats
    counts0, cond = np_stats.conditional_counts(
        data, np.zeros(n, dtype=np.uint8), 1)
    design = rt.Design(counts0, cond, 1, 0.5, dist)
    tables = design.tables()
    md, qs, _, _ = rt.quantize_colmajor(
        tables, np.ascontiguousarray(data.T), None, ws.state)
    n_steps = n * (cols + 1)
    rec = np.empty((n_steps, 5), dtype=np.uint32)
    lib.qvz_record_triples_linemajor(
        tables._h, _ptr(md, _u32p), _ptr(qs, _u8p), None, n,
        _ptr(rec, _u32p))

    pay = np.frombuffer(payload, dtype=np.uint8)
    check = ctypes.c_uint32(0)
    floors = []
    for _ in range(3):
        floors.append(float(lib.qvz_interval_floor_v1(
            _ptr(pay, _u8p), len(pay), _ptr(rec, _u32p), n_steps,
            ctypes.byref(check))))
    floor_s = min(floors)

    # full decode (same machine, same stream) for the ratio
    full = []
    for _ in range(3):
        t0 = time.perf_counter()
        rt.decode_lines(tables, payload, n, ws.state)
        full.append(time.perf_counter() - t0)
    full_s = min(full)

    r = {
        "symbols": n_steps,
        "floor_s": round(floor_s, 3),
        "floor_ns_per_sym": round(floor_s / n_steps * 1e9, 1),
        "full_decode_s": round(full_s, 3),
        "full_ns_per_sym": round(full_s / n_steps * 1e9, 1),
        "model_machinery_s": round(full_s - floor_s, 3),
    }
    print("| stage | seconds | ns/symbol |")
    print("|---|---|---|")
    print(f"| interval+renorm+tag chain (oracle scan/update) | "
          f"{r['floor_s']} | {r['floor_ns_per_sym']} |")
    print(f"| full decode (scan + adaptive update included) | "
          f"{r['full_decode_s']} | {r['full_ns_per_sym']} |")
    print(f"| -> model machinery (the optimizable part) | "
          f"{r['model_machinery_s']} | "
          f"{round(r['full_ns_per_sym'] - r['floor_ns_per_sym'], 1)} |")
    return r


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
