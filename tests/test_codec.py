import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.functions.codec import (
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_hand():
    for vals in ([0], [1], [127], [128], [16383], [16384], [2**63 - 1], [2**64 - 1],
                 [0, 1, 127, 128, 300, 2**40, 5]):
        arr = np.array(vals, dtype=np.uint64)
        assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)).size == 0
    assert varbyte_decode(np.array([], dtype=np.uint8)).size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=10000),
        ),
        max_size=100,
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(entries):
    by_id = {e[0]: e for e in entries}
    ids = np.array(sorted(by_id), dtype=np.int64)
    tfs = np.array([by_id[i][1] for i in ids], dtype=np.int64)
    lens = np.array([by_id[i][2] for i in ids], dtype=np.int64)
    di, dt, dl = decode_postings(encode_postings(ids, tfs, lens))
    assert di.tolist() == ids.tolist()
    assert dt.tolist() == tfs.tolist()
    assert dl.tolist() == lens.tolist()
    assert di.dtype == np.int64


# ---- segmented encoder + whole-range merge parity ----------------------

def test_encode_postings_segments_matches_scalar():
    from searchengine_ray.functions.codec import encode_postings_segments

    rng = np.random.default_rng(42)
    # many tiny segments + a few large ones (the realistic-vocabulary shape)
    seg_lens = np.r_[rng.integers(1, 4, size=300), rng.integers(100, 500, size=5)]
    rng.shuffle(seg_lens)
    bounds = np.r_[0, np.cumsum(seg_lens)]
    total = int(bounds[-1])
    ids_parts, tfs, lens = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        n = e - s
        ids_parts.append(np.sort(rng.choice(2**40, size=n, replace=False)))
    ids = np.concatenate(ids_parts).astype(np.int64)
    tfs = rng.integers(1, 900, size=total).astype(np.int64)
    lens = rng.integers(1, 9000, size=total).astype(np.int64)
    segs = encode_postings_segments(ids, tfs, lens, bounds)
    assert len(segs) == len(seg_lens)
    for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        want = encode_postings(ids[s:e], tfs[s:e], lens[s:e])
        assert segs[i].as_py() == want, f"segment {i} bytes differ"


def test_decode_postings_concat_matches_scalar():
    from searchengine_ray.functions.codec import decode_postings_concat

    rng = np.random.default_rng(7)
    blobs, want_i, want_t, want_l = [], [], [], []
    for n in [1, 1, 2, 5, 1, 300, 3]:
        i = np.sort(rng.choice(2**35, size=n, replace=False)).astype(np.int64)
        t = rng.integers(1, 50, size=n).astype(np.int64)
        l = rng.integers(1, 500, size=n).astype(np.int64)
        blobs.append(encode_postings(i, t, l))
        want_i.append(i); want_t.append(t); want_l.append(l)
    di, dt, dl = decode_postings_concat(blobs)
    assert di.tolist() == np.concatenate(want_i).tolist()
    assert dt.tolist() == np.concatenate(want_t).tolist()
    assert dl.tolist() == np.concatenate(want_l).tolist()


def _random_range_inputs(seed, n_fold=25, with_markers=True):
    """Runs + markers for ONE doc range: folded surface variants, entity
    drops, multi-run surfaces, shared doc ids across case variants."""
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    pool = np.sort(rng.choice(2**40, size=400, replace=False)).astype(np.int64)
    words = [f"word{k:03d}" for k in range(n_fold)]
    run_rows = {"surface": [], "df": [], "run": []}
    marker_rows = {"surface": [], "term": [], "dropped": []}
    for k, w in enumerate(words):
        variants = [w] if k % 3 == 0 else [w, w.capitalize()]
        dropped = with_markers and k % 7 == 3
        for v in variants:
            n_runs = 1 + int(rng.integers(0, 3))
            for _ in range(n_runs):
                n = 1 + int(rng.integers(0, 5))
                ids = np.sort(rng.choice(pool, size=n, replace=False))
                tfs = rng.integers(1, 9, size=n).astype(np.int64)
                lens = rng.integers(20, 60, size=n).astype(np.int64)
                run_rows["surface"].append(v)
                run_rows["df"].append(n)
                run_rows["run"].append(encode_postings(ids, tfs, lens))
            if with_markers:
                marker_rows["surface"].append(v)
                marker_rows["term"].append(w)  # fold to lowercase
                marker_rows["dropped"].append(dropped)
    runs_tbl = pa.table(
        {
            "surface": pa.array(run_rows["surface"], pa.string()),
            "df": pa.array(run_rows["df"], pa.int64()),
            "run": pa.array(run_rows["run"], pa.large_binary()),
        }
    )
    markers = (
        pa.table(
            {
                "surface": pa.array(marker_rows["surface"], pa.string()),
                "term": pa.array(marker_rows["term"], pa.string()),
                "dropped": pa.array(marker_rows["dropped"], pa.bool_()),
            }
        )
        if with_markers
        else None
    )
    return runs_tbl, markers, pool


def _groupwise_merge(runs_tbl, markers, rng_id, n_shards, chunk_docs,
                     rangemap_dir=None, range_offsets=None):
    """The old build wiring: assemble COGROUP rows per fold_key and run
    the scalar MergeFoldRangeGroup over each co-group."""
    import pyarrow as pa

    from searchengine_ray.stages.postings import (
        CHUNKS_SCHEMA,
        COGROUP_SCHEMA,
        MergeFoldRangeGroup,
        fold_key_of,
    )

    merger = MergeFoldRangeGroup(
        n_shards=n_shards, chunk_docs=chunk_docs,
        rangemap_dir=rangemap_dir, range_offsets=range_offsets,
    )
    groups = {}
    for i in range(runs_tbl.num_rows):
        s = runs_tbl["surface"][i].as_py()
        groups.setdefault(fold_key_of(s), []).append(
            (s, None, None, runs_tbl["run"][i].as_py())
        )
    if markers is not None:
        for i in range(markers.num_rows):
            s = markers["surface"][i].as_py()
            groups.setdefault(fold_key_of(s), []).append(
                (s, markers["term"][i].as_py(),
                 markers["dropped"][i].as_py(), None)
            )
    outs = []
    for fk in sorted(groups):
        rows = groups[fk]
        g = pa.table(
            {
                "fold_key": pa.array([fk] * len(rows), pa.string()),
                "range": pa.array([rng_id] * len(rows), pa.int32()),
                "surface": pa.array([r[0] for r in rows], pa.string()),
                "term": pa.array([r[1] for r in rows], pa.string()),
                "dropped": pa.array([r[2] for r in rows], pa.bool_()),
                "run": pa.array([r[3] for r in rows], pa.large_binary()),
            },
            schema=COGROUP_SCHEMA,
        )
        outs.append(merger(g))
    return pa.concat_tables(outs) if outs else CHUNKS_SCHEMA.empty_table()


def _sorted_chunks(t):
    return t.sort_by([("term", "ascending"), ("chunk_idx", "ascending")])


def test_merge_range_table_matches_groupwise(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.functions.codec import varbyte_encode
    from searchengine_ray.stages.postings import merge_range_table

    for seed, with_markers in [(1, True), (2, False), (3, True)]:
        runs_tbl, markers, pool = _random_range_inputs(seed, with_markers=with_markers)
        # hashed-id path (no densification)
        got = merge_range_table(runs_tbl, markers, 5, 8, 4)
        want = _groupwise_merge(runs_tbl, markers, 5, 8, 4)
        assert _sorted_chunks(got).equals(_sorted_chunks(want)), f"seed={seed} hashed"
        # dense-id path: rangemap over the full doc pool
        rm_dir = tmp_path / f"rm{seed}"
        rm_dir.mkdir()
        deltas = np.diff(np.r_[np.int64(0), pool]).astype(np.uint64)
        pq.write_table(
            pa.table({"range": pa.array([5], pa.int32()),
                      "ids_blob": pa.array([varbyte_encode(deltas).tobytes()],
                                           pa.large_binary())}),
            rm_dir / "part-0.parquet",
        )
        offsets = {5: 1000}
        got_d = merge_range_table(runs_tbl, markers, 5, 8, 4,
                                  sorted_ids=pool, range_offset=1000)
        want_d = _groupwise_merge(runs_tbl, markers, 5, 8, 4,
                                  rangemap_dir=str(rm_dir), range_offsets=offsets)
        assert _sorted_chunks(got_d).equals(_sorted_chunks(want_d)), f"seed={seed} dense"


def test_cache_blocked_paths_match_unblocked():
    from searchengine_ray.functions import codec
    """The 256 KiB decode blocks and 64k-value encode blocks must be
    bit-invisible: outputs across the block thresholds equal the
    single-block core's (regression for the cache-blocking commit; the
    hypothesis properties above never generate megabyte inputs)."""
    rng = np.random.default_rng(7)
    # > _DECODE_BLOCK bytes of varbyte: mixed magnitudes so group sizes
    # vary and block splits land mid-group without the boundary walk
    vals = rng.integers(0, 2**63, size=200_000, dtype=np.uint64)
    vals[::3] = rng.integers(0, 128, size=len(vals[::3]), dtype=np.uint64)
    buf = codec.varbyte_encode(vals)
    assert buf.nbytes > (1 << 18)
    out = codec.varbyte_decode(buf)
    assert (out == vals).all()
    core = codec._vb_decode_core(buf)
    assert (core == out).all()

    # > _ENCODE_BLOCK_VALUES postings across many segments, plus one
    # single segment larger than the block (must stay whole)
    n_seg, seg = 700, 120  # 84k values > 1<<16
    doc_ids = np.arange(n_seg * seg, dtype=np.uint64)
    tfs = rng.integers(1, 50, size=n_seg * seg, dtype=np.uint64)
    lens = rng.integers(1, 400, size=n_seg * seg, dtype=np.uint64)
    bounds = np.arange(0, n_seg * seg + 1, seg, dtype=np.int64)
    blobs = codec.encode_postings_segments(doc_ids, tfs, lens, bounds)
    for i in (0, n_seg // 2, n_seg - 1):
        s, e = int(bounds[i]), int(bounds[i + 1])
        want = codec.encode_postings(doc_ids[s:e], tfs[s:e], lens[s:e])
        assert blobs[i].as_py() == want, i
    one = codec.encode_postings_segments(
        doc_ids, tfs, lens, np.array([0, n_seg * seg], dtype=np.int64))
    assert one[0].as_py() == codec.encode_postings(doc_ids, tfs, lens)

    # blocked decode_postings_concat over many blobs > _DECODE_BLOCK
    d, t, l = codec.decode_postings_concat([b.as_py() for b in blobs])
    assert (d == doc_ids.astype(np.int64)).all()
    assert (t == tfs.astype(np.int64)).all()
    assert (l == lens.astype(np.int64)).all()


def test_decode_postings_concat_arrow_matches_list():
    """Arrow-buffer decode == list decode, including empty blobs, a
    sliced array view (nonzero Arrow offset), and a chunked column."""
    import pyarrow as pa

    from searchengine_ray.functions.codec import (
        decode_postings_concat, decode_postings_concat_arrow)

    rng = np.random.default_rng(11)
    blobs = []
    for n in [2, 1, 0, 5, 1, 120, 0, 3, 1]:
        i = np.sort(rng.choice(2**35, size=n, replace=False)).astype(np.int64)
        t = rng.integers(1, 50, size=n).astype(np.int64)
        l = rng.integers(1, 500, size=n).astype(np.int64)
        blobs.append(encode_postings(i, t, l) if n else b"")
    want = decode_postings_concat(blobs)

    for arr in (
        pa.array(blobs, pa.large_binary()),
        pa.array(blobs, pa.binary()),
        pa.array([b"\x01\x01\x01\x01"] + blobs, pa.large_binary()).slice(1),
        pa.chunked_array([pa.array(blobs[:4], pa.large_binary()),
                          pa.array(blobs[4:], pa.large_binary())]),
    ):
        got = decode_postings_concat_arrow(arr)
        for w, g in zip(want, got):
            assert w.tolist() == g.tolist()

    empty = decode_postings_concat_arrow(pa.array([], pa.large_binary()))
    assert all(len(x) == 0 for x in empty)
    all_blank = decode_postings_concat_arrow(pa.array([b"", b""], pa.large_binary()))
    assert all(len(x) == 0 for x in all_blank)


def test_decode_postings_concat_arrow_blocked():
    """Many-blob input crosses the cache-block boundary and still
    matches the unblocked scalar decode."""
    import pyarrow as pa

    from searchengine_ray.functions import codec

    rng = np.random.default_rng(13)
    blobs = []
    for _ in range(500):
        n = int(rng.integers(1, 6))
        i = np.sort(rng.choice(2**30, size=n, replace=False)).astype(np.int64)
        t = rng.integers(1, 9, size=n).astype(np.int64)
        l = rng.integers(1, 99, size=n).astype(np.int64)
        blobs.append(encode_postings(i, t, l))
    arr = pa.array(blobs, pa.large_binary())
    want = codec.decode_postings_concat(blobs)
    old_block = codec._DECODE_BLOCK
    codec._DECODE_BLOCK = 256  # force many slices
    try:
        got = codec.decode_postings_concat_arrow(arr)
    finally:
        codec._DECODE_BLOCK = old_block
    for w, g in zip(want, got):
        assert w.tolist() == g.tolist()
