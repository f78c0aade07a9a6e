"""Vectorized numpy reimplementation of Spark's ``xxhash64`` on longs.

Spark's ``F.xxhash64`` (catalyst ``XxHash64``) chains XXH64 over its
arguments: ``hash = hashLong(field, hash)`` starting from seed 42, with
the per-type single-block forms ``hashLong`` (8-byte) and ``hashInt``
(4-byte).  Both are closed-form uint64 arithmetic, so they vectorize
exactly in numpy — verified bit-for-bit against the JVM in
tests/test_operators.py.  This lets Arrow kernels (pandas_udf) compute
hash-derived signatures (MinHash lanes, SimHash votes) over whole
batches with BLAS-shaped array math while producing values IDENTICAL to
the JVM expression ``F.xxhash64(...)`` — the kernel is a drop-in
physical strategy swap, not a semantic change.

Why a kernel at all: higher-order column expressions
(``transform``/``aggregate``/``zip_with``) are interpreted per element
— a 16-lane MinHash over every shingle of every document costs seconds
of expression interpretation at ANY data size (measured: 1.8 s at
sf0.1), while the identical arithmetic over one Arrow batch is a few
milliseconds of numpy.  At 100 TB the kernel shape also wins: fixed-
width long arrays transfer densely over Arrow and the per-row cost is a
handful of vector ops.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

_SEED = np.uint64(42)  # Spark's default xxhash64 seed


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r64 = np.uint64(r)
    return (x << r64) | (x >> (np.uint64(64) - r64))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(inp: np.ndarray, seed) -> np.ndarray:
    """XXH64 of one 8-byte block — Spark ``XxHash64.hashLong``.

    ``inp`` any int dtype (viewed as uint64); ``seed`` scalar or array.
    Returns uint64 (callers ``.view(np.int64)`` for Spark LongType).
    """
    with np.errstate(over="ignore"):
        inp = inp.astype(np.int64).view(np.uint64)
        seed = np.asarray(seed).astype(np.uint64)
        h = seed + _P5 + np.uint64(8)
        h = h ^ (_rotl(inp * _P2, 31) * _P1)
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def hash_int(inp: np.ndarray, seed) -> np.ndarray:
    """XXH64 of one 4-byte block — Spark ``XxHash64.hashInt``
    (how an IntegerType literal argument is folded in)."""
    with np.errstate(over="ignore"):
        inp = np.asarray(inp).astype(np.uint64) & np.uint64(0xFFFFFFFF)
        seed = np.asarray(seed).astype(np.uint64)
        h = seed + _P5 + np.uint64(4)
        h = h ^ (inp * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)


def xxhash64_long(inp: np.ndarray) -> np.ndarray:
    """= Spark ``F.xxhash64(long_col)``; returns int64."""
    return hash_long(inp, _SEED).view(np.int64)


def xxhash64_long_intlit(inp: np.ndarray, lit: int) -> np.ndarray:
    """= Spark ``F.xxhash64(long_col, F.lit(int))``; returns int64.

    Chaining order per XxHash64.eval: the long column folds in first
    (seed 42), then the int literal with the running hash as seed.
    """
    return hash_int(np.full(len(inp), lit, dtype=np.int64), hash_long(inp, _SEED)).view(
        np.int64
    )
