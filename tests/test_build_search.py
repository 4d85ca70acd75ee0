"""Build + search invariants on the synthetic transcript corpus."""

import numpy as np
import pyarrow.dataset as pads
import pytest

from searchengine_ray.functions.tokenize import simple_tokenize_flat
from searchengine_ray.pipelines.build import build_index, compute_doc_weights
from searchengine_ray.pipelines.search import QueryEngine
from searchengine_ray.sources.transcripts import synth_transcripts, write_synth_transcripts

QUERIES = ["index shard merge", "token score rank actor", "cluster memory spill"]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("idx")
    src = str(root / "corpus")
    idx = str(root / "index")
    write_synth_transcripts(src, n_files=3, n_convs=25, turns_per_conv=8, seed=3)
    stats = build_index(src, idx, profile="simple")
    compute_doc_weights(idx)
    return src, idx, stats


def test_per_turn_invariant(built):
    """Every non-empty turn of the input is indexed exactly once under its
    (conv_id, turn_idx) key (per-turn text invariant of BASELINE.json)."""
    src, idx, stats = built
    inp = pads.dataset(src).to_table(columns=["conv_id", "turn_idx", "text"])
    parent, _ = simple_tokenize_flat(inp["text"])
    nonempty = sorted(
        {
            (inp["conv_id"][int(i)].as_py(), inp["turn_idx"][int(i)].as_py())
            for i in set(parent.tolist())
        }
    )
    ds = pads.dataset(f"{idx}/docstats").to_table(columns=["conv_id", "turn_idx"])
    indexed = sorted(zip(ds["conv_id"].to_pylist(), ds["turn_idx"].to_pylist()))
    assert indexed == nonempty
    assert stats["n_docs"] == len(nonempty)


def test_doc_weights_join_path_matches_broadcast(built):
    """Term-join fallback (round-3 VERDICT #3): driver_cap=0 forces the
    shard-aligned map-side join for the df lookup — doc_weights output
    must be bit-identical to the broadcast path the fixture built."""
    src, idx, stats = built
    broadcast = (
        pads.dataset(f"{idx}/doc_weights").to_table().sort_by("doc_id").to_pandas()
    )
    compute_doc_weights(idx, driver_cap=0)  # rewrites doc_weights via join
    joined = (
        pads.dataset(f"{idx}/doc_weights").to_table().sort_by("doc_id").to_pandas()
    )
    assert broadcast.equals(joined)
    compute_doc_weights(idx)  # restore for later fixture users


def test_df_cf_consistency(built):
    src, idx, stats = built
    d = pads.dataset(f"{idx}/dictionary").to_table()
    assert stats["n_terms"] == d.num_rows
    assert stats["n_postings"] == sum(d["df"].to_pylist())
    assert all(df <= stats["n_docs"] for df in d["df"].to_pylist())
    assert all(cf >= df for df, cf in zip(d["df"].to_pylist(), d["cf"].to_pylist()))


def test_wand_equals_exact(built):
    _, idx, _ = built
    qe = QueryEngine(idx)
    for q in QUERIES:
        for k in (3, 10, 50):
            assert qe.search(q, k=k).equals(qe.search(q, k=k, method="wand"))


def test_conversation_search_against_bruteforce(built):
    """Conversation score = max turn blend; best turn = highest rounded
    score then smallest turn_idx; ranking by rounded max then conv_id."""
    from searchengine_ray.functions.rounding import round_half_up
    from searchengine_ray.pipelines.search import ConversationSearch

    _, idx, _ = built
    qe = QueryEngine(idx)
    for q in QUERIES:
        turns = qe.search(q, k=10**9)  # every candidate turn, ranked
        if turns.num_rows == 0:
            continue
        df = turns.to_pandas()
        df["r"] = (np.floor(df.score * 1e6 + 0.5)).astype(np.int64)
        best = (
            df.sort_values(["conv_id", "r", "turn_idx"], ascending=[True, False, True])
            .groupby("conv_id", as_index=False)
            .first()
        )
        best["n"] = df.groupby("conv_id").size().reindex(best.conv_id).values
        best = best.sort_values(["r", "conv_id"], ascending=[False, True]).head(5)
        got = ConversationSearch(qe).search(q, k=5).to_pandas()
        assert list(got.conv_id) == list(best.conv_id)
        assert list(got.best_turn_idx) == list(best.turn_idx)
        assert list(got.n_turns_matched) == list(best.n)
        assert np.allclose(got.score, best.score)


def test_wand_prunes_on_selective_queries(tmp_path):
    """On a Zipf vocabulary (the regime the bench corpus lacks), a
    rare+head query closes the wand candidate set early and block-max
    skipping decodes strictly fewer chunks than exact — with identical
    results."""
    import pyarrow as pa

    rng = np.random.default_rng(5)
    n = 8000
    vocab = np.array([f"w{i:05d}" for i in range(4000)])
    probs = 1.0 / np.arange(1, 4001) ** 1.2
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=30, p=probs)) for _ in range(n)]
    tbl = pa.table(
        {
            "conv_id": pa.array([f"c{i % 499:04d}" for i in range(n)], pa.string()),
            "turn_idx": pa.array([i // 499 for i in range(n)], pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array([0] * n, pa.timestamp("us")),
        }
    )
    idx = str(tmp_path / "zipf_idx")
    build_index(tbl, idx, profile="simple", chunk_docs=512)
    probe = QueryEngine(idx)
    dic = sorted(probe.reader._load_full_dict().items(), key=lambda kv: -kv[1][0])
    rare = next(t for t, v in dic if 3 <= v[0] <= 10)
    q = f"{rare} {dic[0][0]} {dic[1][0]}"

    e1 = QueryEngine(idx)
    r1 = e1.search(q, k=3)
    e2 = QueryEngine(idx)
    r2 = e2.search(q, k=3, method="wand")
    assert r1.to_pandas().equals(r2.to_pandas())
    assert e2.reader.stats["chunks_decoded"] < e1.reader.stats["chunks_decoded"]


def test_conjunctive_match(built):
    """match_mode='all' keeps exactly the docs every term matches, with
    unchanged scores; single-term queries are unaffected."""
    _, idx, _ = built
    qe = QueryEngine(idx)
    q = QUERIES[0]
    union = qe.search(q, k=10**9).to_pandas()
    conj = qe.search(q, k=10**9, match_mode="all").to_pandas()
    assert len(conj) <= len(union)
    merged = conj.merge(union, on=["conv_id", "turn_idx"], suffixes=("", "_u"))
    assert len(merged) == len(conj)
    assert np.allclose(merged.score, merged.score_u)
    # recompute membership by intersecting per-term postings
    terms = list(qe.parse_query(q))
    sets = [set(qe.reader.postings(t)[0].tolist()) for t in terms]
    inter = set.intersection(*sets) if sets else set()
    assert len(conj) == len(inter)
    one = qe.search(terms[0], k=10**9).to_pandas()
    one_all = qe.search(terms[0], k=10**9, match_mode="all").to_pandas()
    assert one.equals(one_all)


def test_context_windows(built):
    from searchengine_ray.pipelines.search import fetch_context_windows

    src, idx, _ = built
    qe = QueryEngine(idx)
    res = qe.search(QUERIES[0], k=3)
    ctx = fetch_context_windows(res, src, window=1).to_pandas()
    hits = set(zip(res["conv_id"].to_pylist(), res["turn_idx"].to_pylist()))
    # every hit appears as its own context row; neighbors within ±1 only
    assert hits <= set(zip(ctx.conv_id, ctx.turn_idx))
    assert (abs(ctx.turn_idx - ctx.hit_turn_idx) <= 1).all()
    assert set(zip(ctx.conv_id, ctx.hit_turn_idx)) == hits
    assert ctx.text.notna().all()


def test_role_boost(built):
    """role_boost multiplies each turn's score by its role's weight and
    re-ranks; weight 1.0 for every role is a no-op."""
    _, idx, _ = built
    qe = QueryEngine(idx)
    q = QUERIES[0]
    base = qe.search(q, k=10**9).to_pandas()
    noop = qe.search(q, k=10**9, role_boost={"user": 1.0}).to_pandas()
    assert noop.equals(base)
    boosted = qe.search(q, k=10**9, role_boost={"user": 2.0, "tool": 0.1}).to_pandas()
    roles = pads.dataset(f"{idx}/docstats").to_table(
        columns=["conv_id", "turn_idx", "role"]
    ).to_pandas()
    m = base.merge(roles, on=["conv_id", "turn_idx"])
    m["want"] = m.score * m.role.map({"user": 2.0, "tool": 0.1}).fillna(1.0)
    got = boosted.merge(m[["conv_id", "turn_idx", "want"]], on=["conv_id", "turn_idx"])
    assert np.allclose(got.score, got.want)


def test_default_k_rule(built):
    """k defaults to round(0.9·n_candidates) — reference ranker.py:38-40."""
    _, idx, _ = built
    qe = QueryEngine(idx)
    allr = qe.search(QUERIES[0], k=10**9)
    dflt = qe.search(QUERIES[0])
    assert dflt.num_rows == round(0.9 * allr.num_rows)


def test_role_filter(built):
    _, idx, _ = built
    qe = QueryEngine(idx)
    res = qe.search(QUERIES[0], k=10**9, role="assistant")
    dm = qe.reader.docmap()
    roles = dict(zip(zip(dm["conv_id"], dm["turn_idx"].tolist()), dm["role"]))
    assert res.num_rows > 0
    for c, t in zip(res["conv_id"].to_pylist(), res["turn_idx"].to_pylist()):
        assert roles[(c, t)] == "assistant"


def test_docmap_point_reads(tmp_path, monkeypatch):
    """Regression (round-2 VERDICT): serving a query must touch O(k)
    docmap rows (row-group point reads), not load the whole forward
    table — and produce exactly the same results as the legacy path."""
    from searchengine_ray.state import index_store

    monkeypatch.setattr(index_store, "DOCMAP_ROW_GROUP", 32)
    src, idx = str(tmp_path / "corpus"), str(tmp_path / "index")
    write_synth_transcripts(src, n_files=2, n_convs=40, turns_per_conv=8, seed=5)
    stats = build_index(src, idx, profile="simple", n_ranges=1)
    qe = QueryEngine(idx)
    res = qe.search(QUERIES[0], k=3)
    assert res.num_rows == 3
    read = qe.reader.stats["docmap_rows_read"]
    assert 0 < read < stats["n_docs"] / 2, (read, stats["n_docs"])

    legacy = QueryEngine(idx)
    legacy.reader._dm_info = None  # force the full-docmap fallback
    assert res.equals(legacy.search(QUERIES[0], k=3))
    assert legacy.reader.stats["docmap_rows_read"] == 0


def test_scores_against_bruteforce(built):
    """Exact path == brute-force recomputation from the raw corpus."""
    src, idx, _ = built
    qe = QueryEngine(idx, profile="simple")
    tbl = pads.dataset(src).to_table(columns=["conv_id", "turn_idx", "text"])
    parent, flat = simple_tokenize_flat(tbl["text"])
    docs = {}
    for p, term in zip(parent.tolist(), flat.to_pylist()):
        key = (tbl["conv_id"][int(p)].as_py(), tbl["turn_idx"][int(p)].as_py())
        docs.setdefault(key, {}).setdefault(term, 0)
        docs[key][term] += 1
    n = len(docs)
    avgdl = sum(sum(d.values()) for d in docs.values()) / n
    dfs = {}
    for d in docs.values():
        for t in d:
            dfs[t] = dfs.get(t, 0) + 1

    query = "index shard merge"
    expected = {}
    for key, d in docs.items():
        dl = sum(d.values())
        bm25 = inner = 0.0
        for t in query.split():
            if t not in d:
                continue
            ntf = d[t] / dl
            bm25 += np.log2(n / dfs[t]) * (ntf * (ntf * 4.0)) / (ntf + 3.0 * (1 - 0.6 + 0.6 * dl / avgdl))
            inner += ntf * np.log10(n / dfs[t])
        if bm25 or inner:
            expected[key] = 0.9 * bm25 + 0.1 * inner

    res = qe.search(query, k=10**9)
    got = {
        (c, t): s
        for c, t, s in zip(
            res["conv_id"].to_pylist(), res["turn_idx"].to_pylist(), res["score"].to_pylist()
        )
    }
    assert set(got) == set(expected)
    for key in expected:
        assert abs(got[key] - expected[key]) < 1e-9


def test_dict_dir_version_stable_across_processes(tmp_path):
    """The dictionary-cache version token must be content-determined:
    built-in hash() is PYTHONHASHSEED-salted per process, which would
    evict every long-lived worker's df-shard cache on each new driver.
    Assert the token matches one computed under a different hash seed,
    and that it changes when the directory content changes."""
    import os
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.build import _dict_dir_version

    d = tmp_path / "dict"
    d.mkdir()
    pq.write_table(pa.table({"term": ["a", "b"], "df": [1, 2]}), d / "part0.parquet")
    v1 = _dict_dir_version(str(d))

    env = dict(os.environ, PYTHONHASHSEED="12345")
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from searchengine_ray.pipelines.build import _dict_dir_version; "
         "print(_dict_dir_version(%r))" % (os.getcwd(), str(d))],
        capture_output=True, text=True, env=env, cwd=os.getcwd(),
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert out.stdout.strip() == v1

    pq.write_table(pa.table({"term": ["c"], "df": [3]}), d / "part1.parquet")
    assert _dict_dir_version(str(d)) != v1


def test_lazy_dictionary_loads_only_touched_shards(built):
    """The term dictionary is crc32-sharded on write (one sNNNNN.parquet
    per posting shard) and loaded lazily: a query must load only the
    shards its terms hash to, memoized per reader; vocabulary() is the
    whole-dictionary path (round-4 VERDICT #3)."""
    import os

    from searchengine_ray.state.index_store import _DICT_SHARD_RE, IndexReader

    src, idx, stats = built
    files = [f for f in os.listdir(os.path.join(idx, "dictionary"))
             if f.endswith(".parquet")]
    assert files and all(_DICT_SHARD_RE.match(f) for f in files)

    eng = QueryEngine(idx)
    assert eng.reader.stats["dict_shards_loaded"] == 0  # nothing at init
    eng.search(QUERIES[0], 5)
    loaded = eng.reader.stats["dict_shards_loaded"]
    assert 0 < loaded < stats["n_shards"]
    eng.search(QUERIES[0], 5)  # memoized: the repeat loads nothing new
    assert eng.reader.stats["dict_shards_loaded"] == loaded
    # whole-dict consumers still see every term
    vocab = set(eng.reader.vocabulary())
    full = pads.dataset(os.path.join(idx, "dictionary")).to_table()
    assert vocab == set(full["term"].to_pylist())

    # legacy fallback: a dictionary dir without the sNNNNN layout loads
    # eagerly on first lookup and stays correct
    import shutil
    legacy = idx + "_legacydict"
    shutil.copytree(idx, legacy)
    ddir = os.path.join(legacy, "dictionary")
    for i, f in enumerate(sorted(os.listdir(ddir))):
        os.rename(os.path.join(ddir, f), os.path.join(ddir, f"part-{i}.parquet"))
    r2 = IndexReader(legacy)
    assert not r2._dict_lazy
    term = next(iter(vocab))
    assert r2.has_term(term) and r2.df(term) == eng.reader.df(term)
