"""SearchService actor pool: result parity with a direct engine, both
routing modes, concurrent batch submission."""

import pyarrow as pa

from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.search import QueryEngine
from searchengine_ray.pipelines.serve import SearchService
from searchengine_ray.sources.transcripts import write_synth_transcripts

QUERIES = ["data spark", "fast merge table", "slow window dup", "key value"]


def test_service_matches_direct_engine(tmp_path):
    src, idx = str(tmp_path / "c"), str(tmp_path / "i")
    write_synth_transcripts(src, n_files=2, n_convs=25, turns_per_conv=5, seed=23)
    build_index(src, idx, profile="simple")
    direct = QueryEngine(idx)
    svc = SearchService(idx, n_workers=2, routing="terms")
    try:
        # single-query parity, both methods
        for q in QUERIES:
            want = direct.search(q, k=8)
            assert svc.search(q, k=8).to_pandas().equals(want.to_pandas())
            assert (
                svc.search(q, k=8, method="wand").to_pandas().equals(want.to_pandas())
            )
        # batch submission returns results in order
        got = svc.search_many(QUERIES * 3, k=8)
        assert len(got) == len(QUERIES) * 3
        for q, res in zip(QUERIES * 3, got):
            assert isinstance(res, pa.Table)
            assert res.to_pandas().equals(direct.search(q, k=8).to_pandas())
        # term routing sent repeated queries to stable workers: the pool
        # served queries and populated actor-side caches
        stats = svc.cache_stats()
        assert sum(s["chunks_cached"] for s in stats) > 0
        # search modes forward through the pool (single + batch paths)
        q = QUERIES[0]
        boost = {"user": 2.0}
        for kwargs in ({"role": "user"}, {"role_boost": boost},
                       {"match_mode": "all"}):
            want = direct.search(q, k=8, **kwargs).to_pandas()
            assert svc.search(q, k=8, **kwargs).to_pandas().equals(want)
            assert svc.search_many([q], k=8, **kwargs)[0].to_pandas().equals(want)
    finally:
        svc.shutdown()


def test_preload_parity(tmp_path):
    """reader.preload() bulk-warms every term's chunks in one scan; the
    warmed engine answers identically and never re-touches parquet."""
    src, idx = str(tmp_path / "c"), str(tmp_path / "i")
    write_synth_transcripts(src, n_files=2, n_convs=15, turns_per_conv=4, seed=43)
    build_index(src, idx, profile="simple")
    cold = QueryEngine(idx)
    warm = QueryEngine(idx)
    n = warm.reader.preload()
    assert n > 0
    assert warm.reader.preload() == 0  # idempotent
    decoded_before = warm.reader.stats["chunks_decoded"]
    for q in QUERIES:
        assert warm.search(q, k=6).to_pandas().equals(cold.search(q, k=6).to_pandas())
    assert warm.reader.stats["chunks_decoded"] == decoded_before


def test_batch_search_distributed(tmp_path):
    """batch_search streams a queries table through an actor pool and
    matches per-query direct-engine results."""
    import pyarrow as pa_

    from searchengine_ray.pipelines.search_batch import batch_search

    src, idx = str(tmp_path / "c"), str(tmp_path / "i")
    write_synth_transcripts(src, n_files=2, n_convs=20, turns_per_conv=5, seed=51)
    build_index(src, idx, profile="simple")
    direct = QueryEngine(idx)
    queries = pa_.table(
        {
            "query_id": pa_.array([f"q{i}" for i in range(len(QUERIES) * 3)]),
            "keywords": pa_.array(QUERIES * 3),
        }
    )
    out = batch_search(idx, queries, k=6).to_pandas()
    for qid, kw in zip(queries["query_id"].to_pylist(), queries["keywords"].to_pylist()):
        got = out[out.query_id == qid].sort_values("rank")
        want = direct.search(kw, k=6).to_pandas()
        assert list(got.conv_id) == list(want.conv_id)
        assert list(got.turn_idx) == list(want.turn_idx)
        assert list(got["rank"]) == list(range(1, len(want) + 1))


def test_service_rr_routing(tmp_path):
    src, idx = str(tmp_path / "c"), str(tmp_path / "i")
    write_synth_transcripts(src, n_files=2, n_convs=10, turns_per_conv=4, seed=29)
    build_index(src, idx, profile="simple")
    direct = QueryEngine(idx)
    svc = SearchService(idx, n_workers=2, routing="rr")
    try:
        q = "data value row"
        want = direct.search(q, k=5).to_pandas()
        # both workers serve the same answer
        assert svc.search(q, k=5).to_pandas().equals(want)
        assert svc.search(q, k=5).to_pandas().equals(want)
    finally:
        svc.shutdown()
