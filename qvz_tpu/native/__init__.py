"""Native host runtime loader.

Compiles qvz_rt.cpp on demand with g++ (no pip dependencies) and exposes
it through ctypes. Bit-exactness requires: no -march=native (keeps FMA
contraction impossible on baseline x86-64, matching the reference build)
and -ffp-contract=off.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import platform
import subprocess
import tempfile

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "qvz_rt.cpp"
_HDR = _DIR / "qvz_rt.h"

_CXXFLAGS = [
    "-O3", "-std=c++17", "-shared", "-fPIC",
    # AVX2 for the integer hot loops (x86 only — non-x86 hosts build
    # with the compiler's baseline arch). FP results stay bit-identical
    # to the reference: contraction is off (no FMA fusing) and gcc never
    # reorders FP reductions without -ffast-math, so double summation
    # order — which decides discrete codebook outcomes — is preserved.
    *(["-march=x86-64-v3"] if platform.machine() in ("x86_64", "AMD64")
      else []),
    "-ffp-contract=off", "-fno-fast-math",
    "-Wall",
]


def _lib_path() -> pathlib.Path:
    tag = hashlib.sha256(_SRC.read_bytes()
                         + _HDR.read_bytes()).hexdigest()[:16]
    cache = pathlib.Path(
        os.environ.get("QVZ_TPU_CACHE",
                       pathlib.Path.home() / ".cache" / "qvz_tpu"))
    cache.mkdir(parents=True, exist_ok=True)
    return cache / f"libqvz_rt_{tag}.so"


def _build(path: pathlib.Path) -> None:
    with tempfile.TemporaryDirectory() as td:
        tmp = pathlib.Path(td) / path.name
        cmd = ["g++", *_CXXFLAGS, f"-I{_DIR}", "-o", str(tmp),
               str(_SRC)]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, path)


_lib = None


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    path = _lib_path()
    if not path.exists():
        _build(path)
    lib = ctypes.CDLL(str(path))

    c = ctypes
    u8p = c.POINTER(c.c_uint8)
    u32p = c.POINTER(c.c_uint32)
    u64p = c.POINTER(c.c_uint64)
    i32p = c.POINTER(c.c_int32)
    dp = c.POINTER(c.c_double)

    lib.qvz_well_draws7.argtypes = [u32p, c.c_uint64, u8p]
    lib.qvz_well_draws7.restype = None

    lib.qvz_xxh64.argtypes = [u8p, c.c_uint64, c.c_uint64]
    lib.qvz_xxh64.restype = c.c_uint64

    lib.qvz_design_create.argtypes = [
        u64p, u64p, c.c_uint32, c.c_uint32, c.c_int32, c.c_double, dp]
    lib.qvz_design_create.restype = c.c_void_p
    lib.qvz_design_serialized_size.argtypes = [c.c_void_p]
    lib.qvz_design_serialized_size.restype = c.c_int64
    lib.qvz_design_serialized.argtypes = [c.c_void_p, u8p]
    lib.qvz_design_serialized.restype = None
    lib.qvz_design_free.argtypes = [c.c_void_p]
    lib.qvz_design_free.restype = None

    lib.qvz_tables_from_design.argtypes = [c.c_void_p]
    lib.qvz_tables_from_design.restype = c.c_void_p
    lib.qvz_tables_from_blocks.argtypes = [
        u8p, c.c_int64, c.c_uint32, c.c_uint32]
    lib.qvz_tables_from_blocks.restype = c.c_void_p
    lib.qvz_tables_free.argtypes = [c.c_void_p]
    lib.qvz_tables_free.restype = None
    for name, rt in [
        ("qvz_tables_n_pairs", c.c_uint64),
        ("qvz_tables_n_models", c.c_uint32),
        ("qvz_tables_consumed", c.c_int64),
        ("qvz_tables_model_syms_len", c.c_uint64),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = [c.c_void_p]
        fn.restype = rt
    for name, rt in [
        ("qvz_tables_pair_base", u32p),
        ("qvz_tables_ctxmap", i32p),
        ("qvz_tables_qratio", u8p),
        ("qvz_tables_model_card", u32p),
        ("qvz_tables_model_off", u64p),
        ("qvz_tables_model_syms", u8p),
        ("qvz_tables_qv_map", u8p),
        ("qvz_tables_qs_map", u8p),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = [c.c_void_p]
        fn.restype = rt

    lib.qvz_quantize.argtypes = [
        c.c_void_p, u8p, c.c_uint64, u8p, u8p, u32p, u8p, u8p]
    lib.qvz_quantize.restype = None

    lib.qvz_encode_lines.argtypes = [
        u8p, u32p, u8p, c.c_uint64, c.c_uint32, u32p, c.c_uint32, u8p,
        c.c_int64]
    lib.qvz_encode_lines.restype = c.c_int64

    lib.qvz_well_jump.argtypes = [u32p, c.c_uint32, c.c_uint64, u32p]
    lib.qvz_well_jump.restype = None

    i64p = c.POINTER(c.c_int64)
    lib.qvz_kmeans_iter.argtypes = [
        u8p, c.c_uint64, c.c_uint32, i64p, c.c_uint32, u8p, i64p, i64p]
    lib.qvz_kmeans_iter.restype = None

    lib.qvz_stats.argtypes = [u8p, c.c_uint64, c.c_uint32, u8p, u64p, u64p]
    lib.qvz_stats.restype = None

    lib.qvz_encode_fused.argtypes = [
        c.c_void_p, u8p, c.c_uint64, u8p, u32p, dp, u8p, dp, u8p,
        c.c_int64, c.c_int32]
    lib.qvz_encode_fused.restype = c.c_int64

    lib.qvz_decode_lines.argtypes = [
        c.c_void_p, u8p, c.c_uint64, c.c_uint64, u32p, u8p, u8p, c.c_int32]
    lib.qvz_decode_lines.restype = c.c_int32

    lib.qvz_encode_fused_colmajor.argtypes = [
        c.c_void_p, u8p, c.c_uint64, u8p, u32p, dp, u8p, dp, u8p,
        c.c_int64, u32p, u32p]
    lib.qvz_encode_fused_colmajor.restype = c.c_int64

    lib.qvz_quantize_colmajor.argtypes = [
        c.c_void_p, u8p, c.c_uint64, u8p, u32p, dp, u8p, dp, u32p, u8p]
    lib.qvz_quantize_colmajor.restype = None

    lib.qvz_encode_precomputed_colmajor.argtypes = [
        c.c_void_p, u32p, u8p, u8p, c.c_uint64, u8p, c.c_int64, u32p, u32p]
    lib.qvz_encode_precomputed_colmajor.restype = c.c_int64

    lib.qvz_tables_bank_words.argtypes = [c.c_void_p]
    lib.qvz_tables_bank_words.restype = c.c_uint64

    lib.qvz_decode_colmajor.argtypes = [
        c.c_void_p, u8p, c.c_uint64, c.c_uint64, u32p, u8p, u32p, u32p,
        u8p, u8p]
    lib.qvz_decode_colmajor.restype = c.c_int32

    lib.qvz_decode_cluster_prologue.argtypes = [
        c.c_void_p, u8p, c.c_uint64, c.c_uint64, u32p, u8p, u64p]
    lib.qvz_decode_cluster_prologue.restype = c.c_int32

    lib.qvz_replay_model.argtypes = [
        u32p, c.c_uint32, c.c_uint32, u8p, c.c_uint64, u32p]
    lib.qvz_replay_model.restype = None

    lib.qvz_bank_from_stream.argtypes = [
        c.c_void_p, u32p, u8p, u8p, c.c_uint64, u32p]
    lib.qvz_bank_from_stream.restype = None

    lib.qvz_record_triples_linemajor.argtypes = [
        c.c_void_p, u32p, u8p, u8p, c.c_uint64, u32p]
    lib.qvz_record_triples_linemajor.restype = None

    lib.qvz_interval_floor_v1.argtypes = [
        u8p, c.c_uint64, u32p, c.c_uint64, u32p]
    lib.qvz_interval_floor_v1.restype = c.c_double

    _lib = lib
    return lib
