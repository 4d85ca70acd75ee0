"""Delta + varbyte posting-list codec (vectorized numpy).

The reference keeps postings as Python dicts (``Part C/indexer.py:71-81``)
or pickled lists (``Part A/merger.py:44-48``); this rebuild stores each
posting run as a compact binary blob:

    varbyte(n) | varbyte(delta(doc_id_1..n)) | varbyte(tf_1..n)

- doc_ids must be strictly increasing u64 (delta-encoded, first value
  stored raw).
- varbyte = little-endian 7-bit groups, MSB set ⇒ continuation.

Both directions are vectorized: encode loops only over the ≤10 byte
positions, decode uses ``np.add.reduceat`` over group boundaries.
"""

from __future__ import annotations

import numpy as np

__all__ = ["varbyte_encode", "varbyte_decode", "encode_postings",
           "encode_postings_segments", "decode_postings",
           "decode_postings_concat", "decode_postings_concat_arrow"]

_U64 = np.uint64
_MAX_GROUPS = 10  # ceil(64 / 7)


def varbyte_encode(values: np.ndarray) -> np.ndarray:
    """Encode a u64 array to a uint8 varbyte stream (the byte layout is
    owned by ``_vb_encode_counted`` — ONE encoder, so the bit-identical
    contract between the scalar and segmented paths cannot drift)."""
    return _vb_encode_counted(values)[0]


def _vb_decode_core(b: np.ndarray) -> np.ndarray:
    """Decode one uint8 varbyte block (must end on a group boundary)."""
    is_last = ((b & 0x80) == 0).astype(np.int64)
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    group_id = np.cumsum(is_last) - is_last  # index of each byte's group
    pos = np.arange(b.size, dtype=np.int64) - starts[group_id]
    contrib = (b & 0x7F).astype(_U64) << (_U64(7) * pos.astype(_U64))
    return np.add.reduceat(contrib, starts)


# Decode in cache-sized blocks: the core allocates ~10 temporaries of
# 8 bytes per input byte, so a multi-MB stream streams tens of MB
# through RAM per pass.  This box (and any busy multi-tenant node) is
# memory-bandwidth-starved — whole-buffer decode measured 2× slower
# solo and 5-10× slower with 4 workers decoding concurrently.  256 KiB
# keeps every temporary L2-resident; a varbyte stream may be split at
# any group boundary, so blocked output is bit-identical.
_DECODE_BLOCK = 1 << 18


def varbyte_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a uint8 varbyte stream back to a u64 array."""
    b = np.frombuffer(memoryview(buf), dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    if b.size <= _DECODE_BLOCK:
        return _vb_decode_core(b)
    outs = []
    start, n = 0, b.size
    while start < n:
        end = min(start + _DECODE_BLOCK, n)
        while end < n and b[end - 1] & 0x80:  # ≤9 scalar steps
            end += 1
        outs.append(_vb_decode_core(b[start:end]))
        start = end
    return np.concatenate(outs)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray) -> bytes:
    """Encode one sorted posting run (doc_ids strictly increasing u64).

    Layout: varbyte(n) | varbyte(delta doc_ids) | varbyte(tfs) |
    varbyte(doc_lens).  Carrying doc_len per entry keeps query-time
    norm_tf = tf/doc_len (reference ``Part C/indexer.py:67``) computable
    without a doc-stats lookup per candidate.
    """
    d = np.ascontiguousarray(doc_ids, dtype=_U64)
    n = d.size
    if n:
        deltas = np.empty(n, dtype=_U64)
        deltas[0] = d[0]
        np.subtract(d[1:], d[:-1], out=deltas[1:])
    else:
        deltas = d
    parts = [
        varbyte_encode(np.array([n], dtype=_U64)),
        varbyte_encode(deltas),
        varbyte_encode(np.ascontiguousarray(tfs, dtype=_U64)),
        varbyte_encode(np.ascontiguousarray(doc_lens, dtype=_U64)),
    ]
    return b"".join(p.tobytes() for p in parts)


def _vb_encode_counted(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """varbyte_encode + per-value byte counts (for segmented slicing)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    ngroups = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_GROUPS):
        ngroups += (v >= _U64(1) << _U64(7 * k)).astype(np.int64)
    ends = np.cumsum(ngroups)
    starts = ends - ngroups
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(_MAX_GROUPS):
        mask = ngroups > j
        if not mask.any():
            break
        byte = ((v[mask] >> _U64(7 * j)) & _U64(0x7F)).astype(np.uint8)
        cont = (ngroups[mask] - 1) > j
        byte[cont] |= 0x80
        out[starts[mask] + j] = byte
    return out, ngroups


def _seg_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (the segmented-iota trick)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


# Encode-side cache blocking (same bandwidth argument as _DECODE_BLOCK):
# the segmented encoder allocates ~10 temporaries of 8 bytes per input
# value plus an 8-byte scatter index per OUTPUT byte, so whole-batch
# encodes stream tens of MB.  Split the segment list into runs of at
# most this many input values (a single larger segment stays whole —
# segment size is bounded by chunk_docs at the merge and by per-(term,
# range) run size at tokenize, both cache-scale).
_ENCODE_BLOCK_VALUES = 1 << 16


def encode_postings_segments(doc_ids: np.ndarray, tfs: np.ndarray,
                             doc_lens: np.ndarray, bounds: np.ndarray):
    """Encode MANY posting runs in one vectorized pass.

    ``bounds`` delimits the segments: run i covers
    ``[bounds[i], bounds[i+1])`` of the (within-segment sorted) input
    arrays.  Returns a ``pyarrow.LargeBinaryArray`` whose i-th value is
    BIT-IDENTICAL to ``encode_postings`` over segment i (varbyte is
    per-value, so encoding the concatenated streams once and slicing by
    per-value byte counts reproduces each run's bytes exactly) — but
    without the 4-numpy-call-per-run overhead that dominates when runs
    are tiny (realistic vocabularies make most runs 1-3 postings)."""
    import pyarrow as pa

    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    n_seg = len(bounds) - 1
    if n_seg <= 0:
        return pa.array([], pa.large_binary())
    if bounds[-1] - bounds[0] > _ENCODE_BLOCK_VALUES:
        arrays, i = [], 0
        while i < n_seg:
            j = int(np.searchsorted(bounds,
                                    bounds[i] + _ENCODE_BLOCK_VALUES, "right")) - 1
            j = min(max(j, i + 1), n_seg)  # ≥1 segment per block
            s, e = int(bounds[i]), int(bounds[j])
            arrays.append(_encode_segments_core(
                doc_ids[s:e], tfs[s:e], doc_lens[s:e], bounds[i:j + 1] - s))
            i = j
        return pa.concat_arrays(arrays)
    return _encode_segments_core(doc_ids, tfs, doc_lens,
                                 bounds - bounds[0])


def _encode_segments_core(doc_ids: np.ndarray, tfs: np.ndarray,
                          doc_lens: np.ndarray, bounds: np.ndarray):
    """Single-block segmented encode; ``bounds[0]`` must be 0."""
    import pyarrow as pa

    ns = np.diff(bounds)
    n_seg = len(ns)
    if n_seg == 0:
        return pa.array([], pa.large_binary())
    d = np.ascontiguousarray(doc_ids, dtype=_U64)
    starts = bounds[:-1]
    deltas = np.empty(len(d), dtype=_U64)
    if len(d):
        deltas[0] = d[0]
        np.subtract(d[1:], d[:-1], out=deltas[1:])
        deltas[starts] = d[starts]  # first value of each run stored raw
    nb, nb_cnt = _vb_encode_counted(ns.astype(_U64))
    db, db_cnt = _vb_encode_counted(deltas)
    tb, tb_cnt = _vb_encode_counted(np.ascontiguousarray(tfs, dtype=_U64))
    lb, lb_cnt = _vb_encode_counted(np.ascontiguousarray(doc_lens, dtype=_U64))
    # per-segment byte lengths of each stream
    seg_d = np.add.reduceat(db_cnt, starts) if len(d) else np.zeros(n_seg, np.int64)
    seg_t = np.add.reduceat(tb_cnt, starts) if len(d) else np.zeros(n_seg, np.int64)
    seg_l = np.add.reduceat(lb_cnt, starts) if len(d) else np.zeros(n_seg, np.int64)
    # reduceat with a zero-length trailing segment misbehaves only when a
    # segment is empty — runs always hold >= 1 posting by construction
    seg_total = nb_cnt + seg_d + seg_t + seg_l
    out_len = int(seg_total.sum())
    out = np.empty(out_len, dtype=np.uint8)
    seg_out_start = np.concatenate([[0], np.cumsum(seg_total)[:-1]])
    # scatter each stream: source segments are contiguous and in segment
    # order, so dest = src + repeat(shift_per_segment)
    def scatter(src: np.ndarray, src_seg_start: np.ndarray,
                dst_seg_start: np.ndarray, seg_len: np.ndarray) -> None:
        if src.size == 0:
            return
        shift = dst_seg_start - src_seg_start
        out[np.repeat(shift, seg_len) + np.arange(src.size)] = src
    nb_start = np.cumsum(nb_cnt) - nb_cnt
    d_src = np.concatenate([[0], np.cumsum(seg_d)[:-1]])
    t_src = np.concatenate([[0], np.cumsum(seg_t)[:-1]])
    l_src = np.concatenate([[0], np.cumsum(seg_l)[:-1]])
    scatter(nb, nb_start, seg_out_start, nb_cnt)
    scatter(db, d_src, seg_out_start + nb_cnt, seg_d)
    scatter(tb, t_src, seg_out_start + nb_cnt + seg_d, seg_t)
    scatter(lb, l_src, seg_out_start + nb_cnt + seg_d + seg_t, seg_l)
    offsets = np.concatenate([[0], np.cumsum(seg_total)]).astype(np.int64)
    return pa.Array.from_buffers(
        pa.large_binary(), n_seg,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())],
    )


def decode_postings_concat(blobs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY run blobs in ONE vectorized pass → concatenated
    (doc_ids, tfs, doc_lens), runs in input order (each run's internal
    doc order preserved; the result is NOT globally sorted).

    The per-call numpy overhead of ``decode_postings`` dominates when a
    merge group holds dozens of small runs; this decodes the joined byte
    stream once and recovers per-run value segments from the varbyte
    end-byte counts, with a segmented cumsum for the doc-id deltas.

    Large blob sets are processed in ~``_DECODE_BLOCK``-byte slices of
    consecutive blobs (cache-blocked like ``varbyte_decode`` — the
    gather temporaries here are also 8 bytes per encoded byte); each
    blob decodes independently, so slice-wise concatenation is exact."""
    blobs = [b for b in blobs if b]
    if not blobs:
        e = np.empty(0, np.int64)
        return e, e.copy(), e.copy()
    if len(blobs) > 1:
        total = sum(len(b) for b in blobs)
        if total > _DECODE_BLOCK:
            parts, cur, cur_bytes = [], [], 0
            for b in blobs:
                cur.append(b)
                cur_bytes += len(b)
                if cur_bytes >= _DECODE_BLOCK:
                    parts.append(_decode_concat_core(cur))
                    cur, cur_bytes = [], 0
            if cur:
                parts.append(_decode_concat_core(cur))
            return tuple(
                np.concatenate([p[i] for p in parts]) for i in range(3)
            )
    return _decode_concat_core(blobs)


def decode_postings_concat_arrow(runs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``decode_postings_concat`` fed straight from a pyarrow
    (large_)binary array (no nulls): the array's values buffer IS the
    joined byte stream and its offsets give per-blob lengths, so no
    per-blob Python ``bytes`` objects are materialized — the range-merge
    path hands millions of tiny runs, where ``to_pylist()`` costs a full
    copy plus ~33 B of object overhead per run.  Same cache-blocked
    slicing as the list form (every blob decodes independently, so any
    blob-boundary split concatenates exactly)."""
    import pyarrow as pa

    if isinstance(runs, pa.ChunkedArray):
        runs = runs.combine_chunks()
    m = len(runs)
    e = np.empty(0, np.int64)
    if m == 0:
        return e, e.copy(), e.copy()
    odt = np.int64 if pa.types.is_large_binary(runs.type) else np.int32
    off0 = runs.offset
    offs = np.frombuffer(runs.buffers()[1], dtype=odt)[off0 : off0 + m + 1].astype(np.int64)
    lengths = np.diff(offs)
    total = int(offs[-1] - offs[0])
    if total == 0:
        return e, e.copy(), e.copy()
    data = np.frombuffer(runs.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    # empty blobs contribute no bytes — drop their (zero) lengths only
    lengths = lengths[lengths > 0]
    if len(lengths) > 1 and total > _DECODE_BLOCK:
        ends = np.cumsum(lengths)
        starts = ends - lengths
        bucket = starts // _DECODE_BLOCK
        bnd = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        bnd = np.append(bnd, len(lengths))
        parts = [
            _decode_concat_core_buf(
                data[starts[bnd[i]] : ends[bnd[i + 1] - 1]],
                lengths[bnd[i] : bnd[i + 1]],
            )
            for i in range(len(bnd) - 1)
        ]
        if len(parts) == 1:
            return parts[0]
        return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))
    return _decode_concat_core_buf(data, lengths)


def _decode_concat_core(blobs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    lengths = np.array([len(b) for b in blobs], dtype=np.int64)
    return _decode_concat_core_buf(buf, lengths)


def _decode_concat_core_buf(buf: np.ndarray, lengths: np.ndarray
                            ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Core decode over one contiguous uint8 stream + per-blob byte
    lengths (all > 0; an empty blob would alias its neighbor's reduceat
    segment)."""
    vals = varbyte_decode(buf)
    byte_starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    is_last = ((buf & 0x80) == 0).astype(np.int64)
    nvals = np.add.reduceat(is_last, byte_starts)
    val_starts = np.concatenate([[0], np.cumsum(nvals)[:-1]])
    ns = vals[val_starts].astype(np.int64)
    # gather the three per-blob value sections without a per-blob loop:
    # blob i's data occupies [val_starts[i]+1, val_starts[i]+1+3*ns[i])
    off = _seg_arange(ns)
    d_idx = np.repeat(val_starts + 1, ns) + off
    shift = np.repeat(ns, ns)
    deltas = vals[d_idx]
    tfs = vals[d_idx + shift].astype(np.int64)
    lens = vals[d_idx + 2 * shift].astype(np.int64)
    cs = np.cumsum(deltas, dtype=_U64)
    seg_starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
    base = np.zeros(len(ns), dtype=_U64)
    nz = seg_starts > 0
    base[nz] = cs[seg_starts[nz] - 1]
    ids = (cs - np.repeat(base, ns)).astype(np.int64)
    return ids, tfs, lens


def decode_postings(blob) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a run blob → (doc_ids int64 ascending, tfs int64, doc_lens int64).

    doc_ids are 63-bit (see hashing.doc_id_i64) so the u64→i64 view is lossless.
    """
    vals = varbyte_decode(np.frombuffer(blob, dtype=np.uint8))
    n = int(vals[0]) if vals.size else 0
    deltas = vals[1 : 1 + n]
    tfs = vals[1 + n : 1 + 2 * n].astype(np.int64)
    doc_lens = vals[1 + 2 * n : 1 + 3 * n].astype(np.int64)
    doc_ids = np.cumsum(deltas, dtype=_U64).astype(np.int64)
    return doc_ids, tfs, doc_lens
