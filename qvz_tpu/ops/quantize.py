"""Batched quantization pass on device (reference: src/qv_compressor.c:76-136).

Per line, per column the encoder (a) looks up the context index of the
previously *quantized* symbol, (b) dithers between the lo/hi quantizer
with a precomputed 7-bit WELL draw, (c) maps the raw symbol through the
chosen quantizer, and (d) emits the output-alphabet state index plus the
adaptive-model id for the coder. The column recursion is sequential (the
context is the previous quantized value) but embarrassingly parallel over
reads: a lax.scan over columns carrying the (N,) previous-symbol vector,
with all table lookups as vectorized gathers. All ops are exact integer,
so results are bit-identical to the host path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qvz_tpu.constants import ALPHABET_SIZE


@partial(jax.jit, static_argnames=("columns",))
def _quantize_device(data_t, draws_t, cluster_base, columns,
                     ctxmap_flat, pair_base, qratio, qv_flat, qs_flat):
    """data_t/draws_t: (cols, N) int32; cluster_base: (N,) int32 =
    cluster*cols. Tables flat int32. Returns (model_ids, qs, qv) each
    (cols, N) int32."""
    A = ALPHABET_SIZE

    def step(prev, xs):
        col, data_col, draw_col = xs
        cc = cluster_base + col              # (N,) cluster*cols + col
        ctx = ctxmap_flat[cc * A + prev]     # (N,)
        p = pair_base[cc] + ctx
        choice = (draw_col >= qratio[p]).astype(jnp.int32)
        pc = p * 2 + choice
        flat = pc * A + data_col
        qv = qv_flat[flat]
        qs = qs_flat[flat]
        model_id = 1 + pc
        return qv, (model_id, qs, qv)

    cols_idx = jnp.arange(columns, dtype=jnp.int32)
    prev0 = jnp.zeros_like(data_t[0])
    _, (model_ids, qs, qv) = jax.lax.scan(
        step, prev0, (cols_idx, data_t, draws_t))
    return model_ids, qs, qv


def quantize_t(tables, data: np.ndarray, cluster_ids, draws):
    """Device quantization returning COLUMN-MAJOR (cols, N) numpy arrays
    (model_t uint32, qs_t uint8, qv_t uint8) — the layout the QVZ2
    shard coders consume, so no host-side re-transpose is needed."""
    n, cols = data.shape
    if cluster_ids is None:
        cluster_base = jnp.zeros(n, dtype=jnp.int32)
    else:
        cluster_base = jnp.asarray(cluster_ids, dtype=jnp.int32) * cols

    data_t = jnp.asarray(np.ascontiguousarray(data.T), dtype=jnp.int32)
    draws_t = jnp.asarray(np.ascontiguousarray(draws.T), dtype=jnp.int32)
    ctxmap = jnp.asarray(tables.ctxmap.reshape(-1), dtype=jnp.int32)
    pair_base = jnp.asarray(tables.pair_base, dtype=jnp.int32)
    qratio = jnp.asarray(tables.qratio, dtype=jnp.int32)
    qv_flat = jnp.asarray(tables.qv_map.reshape(-1), dtype=jnp.int32)
    qs_flat = jnp.asarray(tables.qs_map.reshape(-1), dtype=jnp.int32)

    model_ids, qs, qv = _quantize_device(
        data_t, draws_t, cluster_base, cols, ctxmap, pair_base, qratio,
        qv_flat, qs_flat)
    return (np.asarray(model_ids, dtype=np.uint32),
            np.asarray(qs, dtype=np.uint8),
            np.asarray(qv, dtype=np.uint8))


def quantize(tables, data: np.ndarray, cluster_ids, draws,
             want_recon: bool = True):
    """Device quantization; API-compatible with native.runtime.quantize."""
    model_t, qs_t, qv_t = quantize_t(tables, data, cluster_ids, draws)
    model_ids = model_t.T.copy()
    syms = qs_t.T.copy()
    recon = qv_t.T.copy() if want_recon else None
    return model_ids, syms, recon
