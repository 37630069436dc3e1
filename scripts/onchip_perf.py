"""On-chip performance sweep for the device coder/decoder (round 4).

Runs on the REAL TPU (no JAX_PLATFORMS forcing): sweeps the Mosaic
coder's step-batch factor (QVZ_TPU_CODER_BATCH) and lane width, and the
device decoder's scan vs Mosaic-kernel forms (QVZ_TPU_DEC_PALLAS,
QVZ_TPU_DEC_WINDOW), asserting byte parity against the host paths on
every leg so each measurement is also a vouching run. Results append
incrementally to build/onchip_perf.json (a tunnel stall mid-sweep keeps
everything measured so far).

Every leg reports Msym/s plus a roofline placement from
utils/roofline.py's split traffic model — true HBM streams vs the
VMEM-resident counts-table sweep vs VPU integer issue (VERDICT r3
next item 2/3; the kernel is VPU-issue-bound, see SCALING.md round 4). Reference scope:
the arithmetic coder hot loop arith.c:24-205, restructured per
BASELINE.json's north star.
"""

import json
import os
import pathlib
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "build" / "onchip_perf.json"

results: dict = {"ts": time.time(), "legs": {}}
if OUT.exists():
    try:
        prev = json.loads(OUT.read_text())
        results["legs"] = prev.get("legs", {})
    except ValueError:
        pass


def save():
    OUT.parent.mkdir(exist_ok=True)
    OUT.write_text(json.dumps(results, indent=1))


def main():
    import jax

    kind = jax.devices()[0].device_kind
    results["device_kind"] = kind
    save()
    print("device:", kind, flush=True)

    from qvz_tpu.constants import DISTORTION_MSE
    from qvz_tpu.ops.distortion import make_matrix
    from qvz_tpu.ops.well import WellState
    from qvz_tpu.pipeline import decode as dec
    from qvz_tpu.pipeline import encode as enc
    from qvz_tpu.utils import roofline

    peaks = roofline.peaks_for(kind)

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

    def encode_leg(tag, shards, batch):
        if tag in results["legs"] and "error" not in results["legs"][tag]:
            print(tag, "cached", flush=True)
            return None
        os.environ["QVZ_TPU_CODER_BATCH"] = str(batch)
        host = enc.encode(data, dist, use_jax=False, shards=shards,
                          **kw)
        r = enc.encode(data, dist, use_jax=True, shards=shards, **kw)
        assert r.compressed == host.compressed, f"{tag}: warm parity"
        t0 = time.perf_counter()
        r = enc.encode(data, dist, use_jax=True, shards=shards, **kw)
        wall = time.perf_counter() - t0
        assert r.compressed == host.compressed, f"{tag}: parity"
        assert r.stats.coder_fallback_lanes == 0
        ph = r.stats.phase_seconds
        scan = ph.get("device_code/scan", 0.0)
        leg = {
            "shards": shards, "batch": batch, "wall_s": round(wall, 3),
            "device_code_s": round(ph.get("device_code", 0.0), 3),
            "precompute_s": round(ph.get("device_code/precompute", 0.0),
                                  3),
            "scan_s": round(scan, 3),
            "compact_fetch_s": round(
                ph.get("device_code/compact_fetch", 0.0), 3),
            "assemble_s": round(ph.get("device_code/assemble", 0.0), 3),
            "scan_Msym_s": round(syms / scan / 1e6, 1) if scan else None,
            "device_code_Msym_s": round(
                syms / ph["device_code"] / 1e6, 1),
        }
        # roofline vs the fused-scan traffic model (S = the lane plan's
        # slot count, derived once from this container's codebook blocks)
        if "S" not in leg_S_box:
            from qvz_tpu.format import container_v2
            from qvz_tpu.native import runtime as rt
            from qvz_tpu.ops.coder_device import LanePlan
            head = container_v2.parse(host.compressed, blocks_len=None)
            hdr = container_v2.header_size()
            tables = rt.tables_from_blocks(
                host.compressed[hdr:], head.cluster_count, head.columns)
            plan0 = LanePlan(tables, None)
            leg_S_box["S"] = plan0.S
            leg_S_box["M"] = plan0.M
        S = leg_S_box["S"]
        leg["S_slots"] = S
        if scan:
            from qvz_tpu.ops import coder_pallas
            mp = leg_S_box.get("M", 0) if coder_pallas.use_totals() \
                else 0
            L = -(-n // shards)
            hbm_b, vmem_b = roofline.coder_fused_traffic(
                cols * L, shards, S, batch)
            leg["roofline"] = roofline.fused_utilization(
                hbm_b, vmem_b,
                roofline.coder_fused_int_ops(cols * L, shards, S, batch,
                                             m_pad=mp),
                scan, peaks)
        results["legs"][tag] = leg
        save()
        print(tag, json.dumps(leg), flush=True)
        return r

    leg_S_box: dict = {}

    def safe(fn, *a):
        try:
            fn(*a)
        except Exception as e:  # keep sweeping; record the failure
            tag = a[0]
            results["legs"][tag] = {"error": f"{type(e).__name__}: "
                                             f"{str(e)[:300]}"}
            save()
            print(tag, "FAILED:", type(e).__name__, flush=True)

    # --- coder batch sweep at the production lane width -------------
    for batch in (1, 2, 4, 8):
        safe(encode_leg, f"coder_W512_b{batch}", 512, batch)

    # --- attribution A/B at the default point (W=512, b=1): which of
    # the round-5 levers carries how much — lower sweep bound, totals
    # side-table, chunk size (QVZ_TPU_CODER_SC in slots) -------------
    def ab_leg(tag, env_kv):
        if tag in results["legs"] and "error" not in results["legs"][tag]:
            print(tag, "cached", flush=True)
            return
        saved = {k: os.environ.get(k) for k, _ in env_kv}
        try:
            for k, v in env_kv:
                os.environ[k] = v
            encode_leg(tag, 512, 1)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    safe(ab_leg, "coder_W512_b1_sblow_off",
         [("QVZ_TPU_CODER_SBLOW", "0")])
    safe(ab_leg, "coder_W512_b1_totals_off",
         [("QVZ_TPU_CODER_TOTALS", "0")])
    for scs in (128, 256, 512):
        safe(ab_leg, f"coder_W512_b1_sc{scs}",
             [("QVZ_TPU_CODER_SC", str(scs))])

    # --- lane-width sweep at the best batch so far -------------------
    best = min(
        (leg for t, leg in results["legs"].items()
         if t.startswith("coder_W512") and "scan_s" in leg),
        key=lambda leg: leg["scan_s"] or 1e9)
    bb = best["batch"]
    results["best_batch_W512"] = bb
    save()
    for shards in (256, 1024):
        safe(encode_leg, f"coder_W{shards}_b{bb}", shards, bb)

    # --- quantize kernel: split two-pass vs merged single-sweep form
    # (round-5). Pure kernel rate, device-resident operands, the tiny
    # d2h fence forcing completion (remote-attached block_until_ready
    # returns early — the bench.py gotcha) ----------------------------
    def quantize_leg(tag, merged, fuse="0", qrb="1", n_sub=None):
        if tag in results["legs"] and "error" not in results["legs"][tag]:
            print(tag, "cached", flush=True)
            return
        import jax.numpy as jnp

        from qvz_tpu.constants import MODE_RATIO
        from qvz_tpu.native import runtime as rt
        from qvz_tpu.ops import quantize_pallas as qp
        from qvz_tpu.spec import stats as np_stats

        nq = n_sub or n
        dsub = data[:nq]
        c0, cond = np_stats.conditional_counts(
            dsub, np.zeros(nq, np.uint8), 1)
        design = rt.Design(c0, cond, MODE_RATIO, 0.5, dist)
        qt = qp.QuantTables(design.tables())
        drw = np.random.default_rng(9).integers(
            0, 128, size=(nq, cols)).astype(np.uint8)
        data_t = jnp.asarray(np.ascontiguousarray(dsub.T))
        draws_t = jnp.asarray(np.ascontiguousarray(drw.T))

        def fence(outs):
            for o in outs:
                np.asarray(o.reshape(-1)[:1])

        saved = os.environ.get("QVZ_TPU_QUANT_MERGED")
        savedf = os.environ.get("QVZ_TPU_QUANT_FUSE")
        try:
            os.environ["QVZ_TPU_QUANT_MERGED"] = merged
            os.environ["QVZ_TPU_QUANT_FUSE"] = fuse
            os.environ["QVZ_TPU_QUANT_QRBOUND"] = qrb
            outs = qp.quantize_pallas(qt, data_t, draws_t, None, nq)
            fence(outs)                            # warm/compile
            ref = [np.asarray(o) for o in outs]
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                outs = qp.quantize_pallas(qt, data_t, draws_t, None,
                                          nq)
                fence(outs)
                best = min(best, time.perf_counter() - t0)
            for a, b in zip(ref, outs):            # parity inside probe
                assert np.array_equal(a, np.asarray(b)), f"{tag} parity"
        finally:
            if saved is None:
                os.environ.pop("QVZ_TPU_QUANT_MERGED", None)
            else:
                os.environ["QVZ_TPU_QUANT_MERGED"] = saved
            if savedf is None:
                os.environ.pop("QVZ_TPU_QUANT_FUSE", None)
            else:
                os.environ["QVZ_TPU_QUANT_FUSE"] = savedf
            os.environ.pop("QVZ_TPU_QUANT_QRBOUND", None)
        leg = {"wall_s": round(best, 3),
               "Msym_s": round(nq * cols / best / 1e6, 1),
               "merged": merged, "fused_dispatch": fuse,
               "n_reads": nq,
               "rows_mean": round(float(qt.qr2.shape[1] + (
                   qt.sv.mean() if merged == "1"
                   else qt.nb.mean() + qt.sv.mean())), 1)}
        results["legs"][tag] = leg
        save()
        print(tag, json.dumps(leg), flush=True)

    safe(quantize_leg, "quant_split", "0")
    safe(quantize_leg, "quant_merged", "1")
    safe(quantize_leg, "quant_merged_fused", "1", "1")
    # noqrbound x multi-span reproducibly crashes the Mosaic compile
    # helper (attribution-only variant; default compiles at every
    # scale) — attribute the qr bound at single-span scale instead
    safe(quantize_leg, "quant_1span", "1", "1", "1", 65536)
    safe(quantize_leg, "quant_1span_noqrbound", "1", "1", "0", 65536)

    # --- decode: XLA scan form vs Mosaic kernel ----------------------
    host_c = enc.encode(data, dist, use_jax=False, shards=512, **kw)
    comp = host_c.compressed
    want = dec.decode(comp)

    def decode_leg(tag, pallas, window):
        if tag in results["legs"] and "error" not in results["legs"][tag]:
            print(tag, "cached", flush=True)
            return
        os.environ["QVZ_TPU_DEC_PALLAS"] = pallas
        os.environ["QVZ_TPU_DEC_WINDOW"] = window
        d = dec.decode(comp, device=True)      # warm/compile
        assert np.array_equal(d, want), f"{tag}: warm parity"
        t0 = time.perf_counter()
        d = dec.decode(comp, device=True)
        wall = time.perf_counter() - t0
        assert np.array_equal(d, want), f"{tag}: parity"
        leg = {"wall_s": round(wall, 3),
               "Msym_s": round(syms / wall / 1e6, 1),
               "pallas": pallas, "window": window}
        results["legs"][tag] = leg
        save()
        print(tag, json.dumps(leg), flush=True)

    safe(decode_leg, "decode_scan", "0", "1")
    safe(decode_leg, "decode_mosaic_win", "1", "1")
    safe(decode_leg, "decode_mosaic_nowin", "1", "0")

    # --- full-chip occupancy: 1 vs 2 concurrent lane-group kernels
    # (VERDICT r4 item 4). Two independent W=512 kernel invocations
    # inside ONE jitted computation: if the kernel leaves issue slots
    # idle, XLA overlapping them would approach 1x single-kernel wall
    # for 2x the work; a serialized core shows ~2x.
    def concurrency_leg(tag):
        if tag in results["legs"] and "error" not in results["legs"][tag]:
            print(tag, "cached", flush=True)
            return
        import jax
        import jax.numpy as jnp

        from qvz_tpu.ops.coder_pallas import fused_scan_tables

        rng2 = np.random.default_rng(11)
        W, L2, cols2, npc, card = 512, 512, 76, 5, 4
        Sv = npc * card
        nm = cols2 * npc + 1
        mkey = np.full((cols2, Sv), -1, np.int32)
        qsk = np.zeros((cols2, Sv), np.int32)
        sb = np.zeros(nm, np.int32)
        for c_ in range(cols2):
            for j in range(npc):
                m = 1 + c_ * npc + j
                sb[m] = j * card
                mkey[c_, j * card:(j + 1) * card] = m
                qsk[c_, j * card:(j + 1) * card] = np.arange(card)
        icc = np.ones((cols2, Sv), np.int32)
        kq = np.where(mkey >= 0, mkey.astype(np.int64) * 128 + qsk,
                      -1).astype(np.int32)
        g = sb + 4
        mp = 8 * ((npc + 7) // 8)
        tmk = np.full((cols2, mp), -1, np.int32)
        tin = np.zeros((cols2, mp), np.int32)
        for c_ in range(cols2):
            tmk[c_, :npc] = 1 + c_ * npc + np.arange(npc)
            tin[c_, :npc] = card
        tb = (kq, icc, g, tmk, tin, sb)
        T2 = cols2 * L2

        def mkstreams(seed):
            r = np.random.default_rng(seed)
            colx = np.repeat(np.arange(cols2), L2)
            mloc = r.integers(0, npc, (T2, W)).astype(np.int32)
            mid = (1 + colx[:, None] * npc + mloc).astype(np.int32)
            qsv = r.integers(0, card, (T2, W)).astype(np.int32)
            return (jnp.asarray(mid), jnp.asarray(qsv),
                    jnp.zeros((T2, W), jnp.uint32),
                    jnp.ones((T2, W), jnp.uint32),
                    jnp.ones((T2, W), jnp.uint32),
                    jnp.asarray((np.arange(T2) % L2) == 0))

        s1, s2 = mkstreams(1), mkstreams(2)

        def one(st):
            return fused_scan_tables(st, tb, W, Sv, L2)

        two = jax.jit(lambda a, b: (one(a), one(b)))

        def fence(r):
            np.asarray(r[0][0].reshape(-1)[:1])

        fence(one(s1))
        t0 = time.perf_counter()
        fence(one(s1))
        t_one = time.perf_counter() - t0
        ra, rb = two(s1, s2)
        fence(ra)
        t0 = time.perf_counter()
        ra, rb = two(s1, s2)
        fence(ra)
        np.asarray(rb[0][0].reshape(-1)[:1])
        t_two = time.perf_counter() - t0
        leg = {"one_kernel_s": round(t_one, 4),
               "two_kernels_one_jit_s": round(t_two, 4),
               "overlap_x": round(2 * t_one / t_two, 2)
               if t_two else None,
               "note": "overlap_x ~1.0 = fully serialized core; "
                       "~2.0 = perfect overlap"}
        results["legs"][tag] = leg
        save()
        print(tag, json.dumps(leg), flush=True)

    safe(concurrency_leg, "concurrent2_W512")

    # same probe at PRODUCTION table scale: the small-table overlap
    # (1.72x) can vanish when each kernel's VMEM working set (~11 MB
    # of 16) cannot co-reside — measure before wiring group pairing
    def concurrency_prod(tag):
        if tag in results["legs"] and "error" not in results["legs"][tag]:
            print(tag, "cached", flush=True)
            return
        import jax
        import jax.numpy as jnp

        from qvz_tpu.ops.coder_pallas import fused_scan_tables

        W, L2, cols2 = 512, 512, 16
        npc, card = 74, 15                  # S = 1110 like the bench
        Sv = npc * card
        nm = cols2 * npc + 1
        mkey = np.full((cols2, Sv), -1, np.int32)
        qsk = np.zeros((cols2, Sv), np.int32)
        sb = np.zeros(nm, np.int32)
        for c_ in range(cols2):
            for j in range(npc):
                m = 1 + c_ * npc + j
                sb[m] = j * card
                mkey[c_, j * card:(j + 1) * card] = m
                qsk[c_, j * card:(j + 1) * card] = np.arange(card)
        icc = np.ones((cols2, Sv), np.int32)
        kq = np.where(mkey >= 0, mkey.astype(np.int64) * 128 + qsk,
                      -1).astype(np.int32)
        g = sb + card
        mp = 8 * ((npc + 7) // 8)
        tmk = np.full((cols2, mp), -1, np.int32)
        tin = np.zeros((cols2, mp), np.int32)
        for c_ in range(cols2):
            tmk[c_, :npc] = 1 + c_ * npc + np.arange(npc)
            tin[c_, :npc] = card
        tb = (kq, icc, g, tmk, tin, sb)
        T2 = cols2 * L2

        def mkstreams(seed):
            r = np.random.default_rng(seed)
            colx = np.repeat(np.arange(cols2), L2)
            mloc = r.integers(0, npc, (T2, W)).astype(np.int32)
            mid = (1 + colx[:, None] * npc + mloc).astype(np.int32)
            qsv = r.integers(0, card, (T2, W)).astype(np.int32)
            return (jnp.asarray(mid), jnp.asarray(qsv),
                    jnp.zeros((T2, W), jnp.uint32),
                    jnp.ones((T2, W), jnp.uint32),
                    jnp.ones((T2, W), jnp.uint32),
                    jnp.asarray((np.arange(T2) % L2) == 0))

        s1, s2 = mkstreams(1), mkstreams(2)

        def one(st):
            return fused_scan_tables(st, tb, W, Sv, L2)

        two = jax.jit(lambda a, b: (one(a), one(b)))

        def fence(r):
            np.asarray(r[0][0].reshape(-1)[:1])

        fence(one(s1))
        t0 = time.perf_counter()
        fence(one(s1))
        t_one = time.perf_counter() - t0
        ra, rb = two(s1, s2)
        fence(ra)
        t0 = time.perf_counter()
        ra, rb = two(s1, s2)
        fence(ra)
        np.asarray(rb[0][0].reshape(-1)[:1])
        t_two = time.perf_counter() - t0
        leg = {"S": Sv, "one_kernel_s": round(t_one, 4),
               "two_kernels_one_jit_s": round(t_two, 4),
               "overlap_x": round(2 * t_one / t_two, 2)
               if t_two else None}
        results["legs"][tag] = leg
        save()
        print(tag, json.dumps(leg), flush=True)

    safe(concurrency_prod, "concurrent2_W512_S1110")

    results["done"] = True
    save()
    print("sweep complete", flush=True)


if __name__ == "__main__":
    main()
