"""VPU integer-issue microbenchmark (VERDICT r4 items 1a / 3).

The round-4 roofline placed the Mosaic coder kernel at ~33% of a VPU
issue ceiling that was an architectural ESTIMATE (8x128 lanes x 4 ALUs
x ~1 GHz ~= 4.1 Top/s, utils/roofline.py ChipPeaks.vpu_int_tops_est).
This script MEASURES the ceiling on the attached chip with synthetic
Mosaic kernels, so kernel utilization is judged against reality:

  issue_*      — loop-carried but ILP-rich int32 op chains over full
                 (8,128) tiles resident in VMEM: the max sustainable
                 issue rate for add/xor and compare+select mixes.
  codermix_*   — the coder kernel's per-chunk op mix (key delta,
                 unsigned below-compare, eq-compare, two multiply-
                 accumulate range sums, eq-update add) on layouts of
                 the same 2 MB working set:
                   3d_w4: (CH, 4, 128) chunks — the production
                          kernel's shape at W=512 (W8=4). int32 tiles
                          are (8,128); a 4-wide second-minor axis is
                          HALF-PADDED if Mosaic tiles it naively.
                   3d_w8: (CH, 8, 128) — full tiles. This is also
                          exactly the rate a slot-packed W=512 layout
                          (two slot rows folded into the 8 sublanes)
                          would sweep at.
                   2d_*:  (CH, W) lane-major 2-D, full tiles.
                 If 3d_w4 measures ~half the element rate of 3d_w8,
                 the production kernel's W8=4 layout wastes half the
                 VPU and a packed relayout is a ~2x lever.

Op counting: ops_per_elem counts the VPU integer instructions the mix
issues per element per rep at the jaxpr level (compare-mask casts
counted as 1 op), matching utils/roofline.coder_fused_int_ops.

Every codermix leg first runs with reps=6 (reps is a dynamic SMEM
scalar, so check and timing share one executable) and validates a
checksum against a NumPy replay — a miscompiled loop cannot report a
fake rate. Results append to build/vpu_microbench.json.
"""

import json
import pathlib
import time
from functools import partial

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "build" / "vpu_microbench.json"


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {"ts": time.time(), "legs": {}}
    if OUT.exists():
        try:
            results["legs"] = json.loads(OUT.read_text()).get("legs", {})
        except ValueError:
            pass
    kind = jax.devices()[0].device_kind
    results["device_kind"] = kind

    def save():
        OUT.parent.mkdir(exist_ok=True)
        OUT.write_text(json.dumps(results, indent=1))

    save()
    print("device:", kind, flush=True)

    _I32 = jnp.int32
    _U32 = jnp.uint32

    def _time(f, *a):
        # fence with a host readback: block_until_ready is unreliable
        # on this remote-attached backend (returns before execution
        # finishes — same measured gotcha as bench.py's device probes)
        t0 = time.perf_counter()
        np.asarray(f(*a)).ravel()[:1]
        return time.perf_counter() - t0

    # ---------------- pure issue-rate legs ---------------------------
    # 8 accumulator chains over one (8, 128) tile each: independent
    # across chains (ILP 8), loop-carried within a chain and mixed with
    # the loop counter so neither Mosaic nor XLA can strength-reduce
    # the loop away.

    def issue_kernel(x_ref, o_ref, *, reps, op):
        chains = 8
        xs = [x_ref[k] + k for k in range(chains)]

        def body(r, acc):
            if op == "addxor":          # 2 ops/elem/chain: xor + add
                return tuple(a + (x ^ r) for a, x in zip(acc, xs))
            if op == "cmpsel":          # 3 ops/elem/chain: cmp+sub+sel
                return tuple(jnp.where(a > x, a - x, a + r)
                             for a, x in zip(acc, xs))
            raise ValueError(op)

        acc = jax.lax.fori_loop(0, reps, body, tuple(xs))
        o_ref[:] = sum(acc[1:], acc[0])

    def run_issue(tag, op, reps, ops_per_rep_elem):
        x = (np.arange(8 * 8 * 128, dtype=np.int32)
             .reshape(8, 8, 128) % 97)

        @jax.jit
        def f(xd):
            return pl.pallas_call(
                partial(issue_kernel, reps=reps, op=op),
                out_shape=jax.ShapeDtypeStruct((8, 128), _I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(xd)

        xd = jax.device_put(x)
        np.asarray(f(xd))                               # compile + fence
        best = min(_time(f, xd) for _ in range(5))
        ops = reps * ops_per_rep_elem * 8 * 8 * 128     # chains x tile
        leg = {"wall_s": round(best, 4),
               "Top_s": round(ops / best / 1e12, 3), "reps": reps}
        results["legs"][tag] = leg
        save()
        print(tag, json.dumps(leg), flush=True)

    # ---------------- coder-mix layout legs ---------------------------
    # Same 2 MB int32 working set, same op mix, different layouts. Mix
    # per chunk element per rep: d = kw - m (1), below unsigned cmp (1)
    # + cast (1), eq cmp (1) + cast (1), sum(c*below) MAC (2),
    # sum(c*eq) MAC (2), eq-update add (1) -> 10 ops/elem — the
    # totals-form production mix of coder_pallas._kernel2's chunk loop.
    OPS_PER_ELEM = 10
    ELEMS = 512 * 1024                                   # 2 MB of i32

    def mix_kernel(reps_ref, kw_ref, c0_ref, o_ref, c_ref, *, ch, nch):
        c_ref[...] = c0_ref[...]
        red_shape = (kw_ref.shape[1:] if kw_ref.ndim == 3
                     else (1, kw_ref.shape[1]))

        def body(r, carry):
            a0, a1 = carry
            m = (r * 128) & 0x3FF
            qs = (r & 63) + 1

            def chunk(ci, acc):
                b0, b1 = acc
                sl = pl.ds(ci * ch, ch)
                c = c_ref[sl]
                kw = kw_ref[sl]
                d = kw - m
                below = (d.astype(_U32)
                         < qs.astype(_U32)).astype(_I32)
                eq = (d == qs).astype(_I32)
                b0 = b0 + jnp.sum(c * below, axis=0,
                                  keepdims=kw_ref.ndim == 2)
                b1 = b1 + jnp.sum(c * eq, axis=0,
                                  keepdims=kw_ref.ndim == 2)
                c_ref[sl] = c + eq
                return (b0, b1)

            return jax.lax.fori_loop(0, nch, chunk, (a0, a1))

        z = jnp.zeros(red_shape, _I32)
        a0, a1 = jax.lax.fori_loop(0, reps_ref[0], body, (z, z))
        o_ref[...] = a0 + a1

    def _mix_replay(kw, c, reps):
        # checksum of the two accumulators, mod 2^32
        kw = kw.astype(np.int64).ravel()
        cc = c.astype(np.int64).ravel().copy()
        s = 0
        for r in range(reps):
            m = (r * 128) & 0x3FF
            qs = (r & 63) + 1
            d = kw - m
            below = (d >= 0) & (d < qs)
            eq = d == qs
            s += (cc * below).sum() + (cc * eq).sum()
            cc += eq
        return int(s) % (1 << 32)

    def run_mix(tag, shape, reps):
        total = int(np.prod(shape))
        assert total == ELEMS, shape
        rng = np.random.default_rng(7)
        kw = rng.integers(0, 1 << 10, size=shape).astype(np.int32)
        c = rng.integers(0, 4096, size=shape).astype(np.int32)
        row = int(np.prod(shape[1:]))
        ch = max(8, (65536 // row) // 8 * 8)
        ch = min(ch, shape[0])
        nch = shape[0] // ch
        assert nch * ch == shape[0], (shape, ch)
        oshape = shape[1:] if len(shape) == 3 else (1, shape[1])

        @jax.jit
        def f(r, kwd, cd):
            return pl.pallas_call(
                partial(mix_kernel, ch=ch, nch=nch),
                out_shape=jax.ShapeDtypeStruct(oshape, _I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM(shape, _I32)],
            )(r, kwd, cd)

        kwd, cd = jax.device_put(kw), jax.device_put(c)
        chk = 6
        got = np.asarray(f(np.array([chk], np.int32), kwd, cd))
        gsum = int(got.astype(np.int64).sum()) % (1 << 32)
        want = _mix_replay(kw, c, chk)
        assert gsum == want, (tag, gsum, want)
        rd = np.array([reps], np.int32)
        np.asarray(f(rd, kwd, cd))                      # warm + fence
        best = min(_time(f, rd, kwd, cd) for _ in range(5))
        ops = reps * OPS_PER_ELEM * ELEMS
        leg = {"wall_s": round(best, 4),
               "Top_s": round(ops / best / 1e12, 3),
               "elem_G_s": round(reps * ELEMS / best / 1e9, 2),
               "shape": list(shape), "reps": reps, "checksum": "ok"}
        results["legs"][tag] = leg
        save()
        print(tag, json.dumps(leg), flush=True)

    def safe(fn, tag, *a):
        if tag in results["legs"] and \
                "error" not in results["legs"][tag]:
            print(tag, "cached", flush=True)
            return
        try:
            fn(tag, *a)
        except Exception as e:
            results["legs"][tag] = {
                "error": f"{type(e).__name__}: {str(e)[:300]}"}
            save()
            print(tag, "FAILED:", repr(e)[:200], flush=True)

    # ---------------- discriminating variants -------------------------
    # The first sweep measured full-tile codermix at ~1.0 Top/s vs a
    # 6-7 Top/s pure-register ALU ceiling. Three hypotheses, one leg
    # each: (a) int32 multiply is expensive -> select-based masks;
    # (b) VMEM load/store traffic binds -> pure load+add sweep ceiling;
    # (c) the production B=4 batching (one chunk load per 4 steps)
    # amortizes the loads -> batched select mix.

    def selmix_kernel(reps_ref, kw_ref, c0_ref, o_ref, c_ref, *,
                      ch, nch, mode):
        c_ref[...] = c0_ref[...]
        red_shape = kw_ref.shape[1:]

        def body(r, carry):
            a0, a1 = carry

            def chunk(ci, acc):
                b0, b1 = acc
                sl = pl.ds(ci * ch, ch)
                c = c_ref[sl]
                if mode == "sweeponly":        # 1 op/elem + load
                    return (b0 + jnp.sum(c, axis=0), b1)
                kw = kw_ref[sl]
                if mode == "sel":               # 9 ops/elem, no mul
                    m = (r * 128) & 0x3FF
                    qs = (r & 63) + 1
                    d = kw - m
                    below = d.astype(_U32) < qs.astype(_U32)
                    eq = d == qs
                    z = jnp.zeros_like(c)
                    b0 = b0 + jnp.sum(jnp.where(below, c, z), axis=0)
                    b1 = b1 + jnp.sum(jnp.where(eq, c, z), axis=0)
                    c_ref[sl] = c + eq.astype(_I32)
                    return (b0, b1)
                if mode == "sel_b4":            # 4 steps share the load
                    z = jnp.zeros_like(c)
                    upd = None
                    for k in range(4):
                        t = r * 4 + k
                        m = (t * 128) & 0x3FF
                        qs = (t & 63) + 1
                        d = kw - m
                        below = d.astype(_U32) < qs.astype(_U32)
                        eq = d == qs
                        b0 = b0 + jnp.sum(jnp.where(below, c, z),
                                          axis=0)
                        b1 = b1 + jnp.sum(jnp.where(eq, c, z), axis=0)
                        e = eq.astype(_I32)
                        upd = e if upd is None else upd + e
                    c_ref[sl] = c + upd
                    return (b0, b1)
                raise ValueError(mode)

            return jax.lax.fori_loop(0, nch, chunk, (a0, a1))

        z = jnp.zeros(red_shape, _I32)
        a0, a1 = jax.lax.fori_loop(0, reps_ref[0], body, (z, z))
        o_ref[...] = a0 + a1

    def _sel_replay(kw, c, reps, mode):
        kw = kw.astype(np.int64).ravel()
        cc = c.astype(np.int64).ravel().copy()
        s = 0
        if mode == "sweeponly":
            return int(reps * cc.sum()) % (1 << 32)
        for r in range(reps):
            if mode == "sel":
                steps = [r]
            else:
                steps = [r * 4 + k for k in range(4)]
            upd = 0
            for t in steps:
                m = (t * 128) & 0x3FF
                qs = (t & 63) + 1
                d = kw - m
                below = (d >= 0) & (d < qs)
                eq = d == qs
                s += (cc * below).sum() + (cc * eq).sum()
                upd = upd + eq
            cc += upd
        return int(s) % (1 << 32)

    def run_sel(tag, shape, reps, mode, ops_per_elem):
        rng = np.random.default_rng(7)
        kw = rng.integers(0, 1 << 10, size=shape).astype(np.int32)
        c = rng.integers(0, 4096, size=shape).astype(np.int32)
        row = int(np.prod(shape[1:]))
        ch = min(shape[0], max(8, (65536 // row) // 8 * 8))
        nch = shape[0] // ch
        assert nch * ch == shape[0]

        @jax.jit
        def f(r, kwd, cd):
            return pl.pallas_call(
                partial(selmix_kernel, ch=ch, nch=nch, mode=mode),
                out_shape=jax.ShapeDtypeStruct(shape[1:], _I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM(shape, _I32)],
            )(r, kwd, cd)

        kwd, cd = jax.device_put(kw), jax.device_put(c)
        chk = 6
        got = np.asarray(f(np.array([chk], np.int32), kwd, cd))
        gsum = int(got.astype(np.int64).sum()) % (1 << 32)
        want = _sel_replay(kw, c, chk, mode)
        assert gsum == want, (tag, gsum, want)
        rd = np.array([reps], np.int32)
        np.asarray(f(rd, kwd, cd))
        best = min(_time(f, rd, kwd, cd) for _ in range(5))
        elems = reps * int(np.prod(shape))
        if mode == "sel_b4":
            elems *= 4                      # 4 steps per rep
        leg = {"wall_s": round(best, 4),
               "Top_s": round(elems * ops_per_elem / best / 1e12, 3),
               "elem_G_s": round(elems / best / 1e9, 2),
               "shape": list(shape), "reps": reps, "mode": mode,
               "ops_per_elem": ops_per_elem, "checksum": "ok"}
        results["legs"][tag] = leg
        save()
        print(tag, json.dumps(leg), flush=True)

    safe(run_issue, "issue_addxor", "addxor", 2_000_000, 2 * 8)
    safe(run_issue, "issue_cmpsel", "cmpsel", 1_000_000, 3 * 8)

    for tag, shape, reps in (
            ("codermix_3d_w4", (1024, 4, 128), 8000),
            ("codermix_3d_w8", (512, 8, 128), 8000),
            ("codermix_2d_w512", (1024, 512), 8000),
            ("codermix_2d_w1024", (512, 1024), 8000)):
        safe(run_mix, tag, shape, reps)

    # ops_per_elem: sel = sub,cmp,sel,add,cmp,sel,add,(cast,add upd) = 9;
    # sel_b4 per step = sub,2cmp,2sel,2add + amortized upd/writeback
    # ~= 7.5 -> count 8 (conservative); sweeponly = 1 add.
    safe(run_sel, "codermix_sel_3d_w8", (512, 8, 128), 8000, "sel", 9)
    safe(run_sel, "codermix_selb4_3d_w8", (512, 8, 128), 2000,
         "sel_b4", 8)
    safe(run_sel, "sweeponly_3d_w8", (512, 8, 128), 20000,
         "sweeponly", 1)

    results["done"] = True
    save()
    print("microbench complete", flush=True)


if __name__ == "__main__":
    main()
