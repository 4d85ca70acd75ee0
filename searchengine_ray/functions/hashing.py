"""Stable, vectorized hashing helpers.

All hashes here are deterministic within this environment and across Ray
workers/processes (no PYTHONHASHSEED dependence):

- ``hash_str_u64``: SipHash-1-3 of utf8 bytes via ``pandas.util.hash_array``
  with the fixed default key — C speed, vectorized over object arrays.
- ``poly_hash_u64``: splitmix64(Σ byte_j·B^j mod 2^64) over each string's
  utf8 bytes (B = FNV prime) — zero-copy from Arrow buffers AND exactly
  reproducible in DuckDB HUGEINT SQL, so every operator whose output is
  a function of string hashes (minhash, simhash) hashes with THIS and
  gets a value-exact oracle (SipHash's keyed rounds have no SQL twin).
- ``splitmix64``: cheap bijective mixer used to combine keys.
- ``doc_id_i64``: the engine's internal document id,
  ``mix(hash(conv_id) ^ mix(turn_idx)) >> 1`` — the 63-bit truncation
  keeps the id a non-negative int64 (Ray groupby / Arrow / DuckDB safe)
  and is what the collision check and range partitioning reason over.
  Internal only — every user-visible output surfaces
  ``(conv_id, turn_idx)``; at 10^12-turn scale this would widen to 128
  bits (two u64 columns) or be replaced by a dense per-bucket
  enumeration to improve delta compression.  The build verifies
  injectivity on its input (count(distinct doc_id) == n_docs).
- ``range_shift``: THE doc_id → doc-range mapping (top bits of the
  63-bit id); every partitioner (runs, docstats, rangemap, merge) must
  use this one definition or postings get misrouted.
- ``term_shard``: crc32(term) % n_shards, the posting-shard partitioner
  (reimagines the per-first-letter buckets of
  reference ``Part A/posting_file_factory.py:25-51`` without the
  alphabet skew).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["splitmix64", "hash_str_u64", "poly_hash_u64", "doc_id_i64",
           "term_shard", "range_shift", "SAMPLE_A", "SAMPLE_M"]

# Affine-hash sampling constants shared by pipelines/sampling.py
# (stratified keep rule) and pipelines/ann.py (seeded embedding sample /
# medoid quantizer).  Single definition on purpose: three DuckDB oracles
# in oracle/sql_ops.py hard-code these values, so an edit to one copy
# must be an edit to all users.  Odd multiplier → bijective mod 2^32;
# power-of-two modulus → the SQL twin is exact integer math.
SAMPLE_A = 2654435761  # Knuth multiplicative constant
SAMPLE_M = 1 << 32


def range_shift(n_ranges: int) -> int:
    """Bit shift mapping a 63-bit doc id to its range:
    ``range = doc_id >> range_shift(n_ranges)``.  n_ranges must be a
    power of two; the single authority for the range partitioning used
    by runs/docstats/rangemap/merge."""
    assert n_ranges >= 1 and n_ranges & (n_ranges - 1) == 0
    return 63 - int(n_ranges.bit_length() - 1) if n_ranges > 1 else 63

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mixer)."""
    with np.errstate(over="ignore"):
        z = x.astype(_U64, copy=True)
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def hash_str_u64(strings) -> np.ndarray:
    """Stable u64 hash of each string in a sequence/array."""
    arr = np.asarray(strings, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(_U64)


_POLY_B = _U64(0x100000001B3)  # FNV prime; odd, so invertible mod 2^64


def poly_hash_u64(strings) -> np.ndarray:
    """u64 hash per string: ``splitmix64(Σ byte_j·B^j mod 2^64)`` over
    the utf8 bytes (j counted from the first byte; empty string → j-sum
    0).  Vectorized straight from the Arrow string buffers — one
    power-gather, one multiply, one ``np.add.reduceat`` — and exactly
    reproducible in DuckDB (reversed-byte Horner in HUGEINT; see
    oracle/sql_ops.py), which is the whole point: operators hashing with
    this get value-exact SQL oracles.  Accepts a pyarrow string array
    (zero-copy) or any iterable of python strings."""
    if isinstance(strings, pa.ChunkedArray):
        flat = strings.combine_chunks()
    elif isinstance(strings, pa.Array):
        flat = strings
    else:
        flat = pa.array(list(strings), pa.string())
    m = len(flat)
    if m == 0:
        return np.empty(0, _U64)
    off0 = flat.offset
    odt = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    offs = np.frombuffer(flat.buffers()[1], dtype=odt)[off0 : off0 + m + 1].astype(np.int64)
    sums = np.zeros(m, _U64)
    lens = np.diff(offs)
    nonempty = np.flatnonzero(lens > 0)
    if len(nonempty):
        data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]].astype(_U64)
        starts = offs[:-1] - offs[0]
        pos = np.arange(len(data), dtype=np.int64) - np.repeat(starts, lens)
        maxlen = int(lens.max())
        bpow = np.empty(maxlen, _U64)
        bpow[0] = 1
        with np.errstate(over="ignore"):
            if maxlen > 1:
                # wrapping cumprod (mod 2^64) — a scalar loop here costs
                # O(longest string) interpreted steps per call, which the
                # whole-text fallback shingles of token-poor documents
                # would turn into megabyte-long loops
                np.cumprod(np.full(maxlen - 1, _POLY_B, _U64), out=bpow[1:])
            contrib = data * bpow[pos]
        # starts[nonempty] is strictly increasing with no empty segment,
        # so reduceat is safe (an empty segment would alias its neighbor)
        sums[nonempty] = np.add.reduceat(contrib, starts[nonempty])
    return splitmix64(sums)


def doc_id_i64(conv_id, turn_idx) -> np.ndarray:
    """Deterministic internal doc id from the user-visible composite key.

    Masked to 63 bits and returned as int64 so the id flows through Ray
    Data groupbys, Arrow and DuckDB without unsigned-overflow conversions
    (and never silently promotes to float64 in numpy searchsorted).
    """
    h = hash_str_u64(conv_id)
    t = np.asarray(turn_idx).astype(_U64)
    return (splitmix64(h ^ splitmix64(t)) >> _U64(1)).astype(np.int64)


def term_shard(terms, n_shards: int) -> np.ndarray:
    """crc32-based shard id per term (stable across processes)."""
    out = np.empty(len(terms), dtype=np.int32)
    for i, t in enumerate(terms):
        out[i] = zlib.crc32(t.encode("utf-8")) % n_shards
    return out
