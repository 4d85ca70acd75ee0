"""Round-4 training-data operators (lm_score, dup_spans, srp_dup_pairs,
budget_sample): planted-ground-truth semantics plus value-exact DuckDB
oracle conformance on the same corpus."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.oracle.sql_ops import ops_sql
from searchengine_ray.pipelines import analysis, ann, dedup, sampling

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
).split()

DIM = 64  # matches the testdata embeddings AND the srp oracle default


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """documents + embeddings parquet with planted duplicates:
    docs 1 == 2 (exact text dup), doc 0 all-common tokens, doc 5
    all-rare tokens, doc 6 empty; embeddings 1 == 2 (identical vector),
    the rest near-orthogonal random."""
    rng = np.random.default_rng(23)
    texts = [" ".join(rng.choice(BASE, size=30)) for _ in range(40)]
    texts[1] = texts[2] = " ".join(rng.choice(BASE, size=30))
    texts[0] = "alpha beta alpha beta alpha beta alpha beta"
    texts[5] = "zzzquux yyyplugh xxxthud wwwfoo vvvbar"
    texts[6] = "  "
    tbl = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 40, pa.string()),
            "source": pa.array([f"src{i % 3}" for i in range(40)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    emb = rng.normal(size=(40, DIM)).astype(np.float32)
    emb[2] = emb[1]  # exact embedding dup pair (1, 2)
    etbl = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in emb],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * 40, pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("training_ops")
    pq.write_table(tbl, str(d / "documents.parquet"))
    pq.write_table(etbl, str(d / "embeddings.parquet"))
    return str(d)


def test_dup_spans_flags_planted_dup(planted_dir):
    res = dedup.dup_spans(planted_dir, n=5).to_pandas().set_index("doc_id")
    # exact text dups: every window of doc 1 occurs in doc 2 and vice versa
    assert res.loc[1].dup_frac == 1.0 and res.loc[2].dup_frac == 1.0
    assert res.loc[1].n_windows == 26  # 30 tokens → 26 5-gram windows
    # the rare-token doc shares no 5-gram with anyone
    assert res.loc[5].dup_frac == 0.0
    # doc 6 has no window (2 tokens < 5) → not in the result
    assert 6 not in res.index


def test_dup_spans_within_doc_repeat_is_not_cross_doc(planted_dir):
    """doc 0 repeats its own 5-grams internally; unless another doc
    carries the same gram, self-repeats must not count as duplicated."""
    res = dedup.dup_spans(planted_dir, n=5).to_pandas().set_index("doc_id")
    assert res.loc[0].dup_frac == 0.0


def test_lm_score_orders_common_above_rare(planted_dir):
    res = analysis.lm_score(planted_dir).to_pandas().set_index("doc_id")
    assert len(res) == 40
    # common-token doc scores strictly higher (less negative) than the
    # rare-token doc (each rare token has cf=1)
    assert res.loc[0].avg_logprob > res.loc[5].avg_logprob
    assert res.loc[5].avg_logprob < -3.0
    # token-less doc: n_tokens 0, score 0.0
    assert res.loc[6].n_tokens == 0 and res.loc[6].avg_logprob == 0.0


def test_lm_score_join_path_matches_broadcast(planted_dir):
    a = analysis.lm_score(planted_dir).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    b = analysis.lm_score(planted_dir, driver_cap=3).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert (a.doc_id == b.doc_id).all() and (a.n_tokens == b.n_tokens).all()
    assert np.allclose(a.avg_logprob, b.avg_logprob, rtol=0, atol=1e-9)


def test_srp_finds_identical_embedding(planted_dir):
    res = ann.srp_dup_pairs(planted_dir).to_pandas()
    hit = res[(res.vec_a == 1) & (res.vec_b == 2)]
    assert len(hit) == 1
    assert int(hit.hamming.iloc[0]) == 0
    assert float(hit.cos.iloc[0]) == 1.0


def test_srp_banding_is_lossless_vs_allpairs(planted_dir):
    """Band blocking + verify must equal the brute-force Hamming filter
    (pigeonhole: max_hamming < bands)."""
    res = ann.srp_dup_pairs(planted_dir, nbits=32, bands=8, max_hamming=7)
    t = pq.read_table(f"{planted_dir}/embeddings.parquet")
    mat = (t["embedding"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
           .astype(np.float64).reshape(-1, DIM))
    planes = ann.srp_planes(32, DIM)
    sig = (((mat @ planes.T) >= 0).astype(np.uint64)
           << np.arange(32, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    a, b = np.triu_indices(len(sig), k=1)
    x = sig[a] ^ sig[b]
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    want = {(int(i), int(j)) for i, j in zip(a[ham <= 7], b[ham <= 7])}
    got = set(zip(res["vec_a"].to_pylist(), res["vec_b"].to_pylist()))
    assert got == want


def test_budget_sample_respects_budgets(planted_dir):
    budgets = {"src0": 120, "src1": 60}
    res = sampling.budget_sample(planted_dir, budgets, default=30).to_pandas()
    assert len(res) > 0
    from searchengine_ray.functions.hashing import SAMPLE_A, SAMPLE_M

    docs = pq.read_table(f"{planted_dir}/documents.parquet").to_pandas()
    tok = analysis.lm_score(planted_dir).to_pandas().set_index("doc_id")["n_tokens"]
    for src, grp in docs.groupby("source"):
        budget = budgets.get(src, 30)
        order = sorted(
            grp.doc_id, key=lambda d: ((d * SAMPLE_A) % SAMPLE_M, d))
        run, want = 0, []
        for d in order:
            if run < budget:
                want.append(d)
            run += int(tok.loc[d])
        got = sorted(res[res.source == src].doc_id)
        assert got == sorted(want), src


def test_budget_sample_deterministic(planted_dir):
    a = sampling.budget_sample(planted_dir, {"src0": 100}, default=50).to_pandas()
    b = sampling.budget_sample(planted_dir, {"src0": 100}, default=50).to_pandas()
    key = ["doc_id", "source", "n_tokens"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_embedding_clusters_groups_identical_vectors(planted_dir):
    res = ann.embedding_clusters(planted_dir).to_pandas().set_index("vec_id")
    assert len(res) == 40
    # the planted identical embeddings land in the same cluster with the
    # same (rounded) cosine to its centroid
    assert res.loc[1].cluster == res.loc[2].cluster
    assert res.loc[1].cos == res.loc[2].cos
    assert res.cluster.between(0, 15).all()


def test_source_overlap_counts_planted_cross_source_dup(planted_dir):
    """docs 1 (src1) and 2 (src2) are exact text dups, so sources src1
    and src2 share all 26 of that text's distinct 5-grams."""
    res = dedup.source_overlap(planted_dir, n=5).to_pandas()
    row = res[(res.source_a == "src1") & (res.source_b == "src2")]
    assert len(row) == 1 and int(row.n_shared.iloc[0]) >= 26
    assert (res.source_a < res.source_b).all()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_training_ops_match_sql_oracles(planted_dir):
    """Value-exact conformance vs the DuckDB twins on the planted corpus
    (lm_score / dup_spans / srp_dup_pairs; budget_sample's oracle
    hardcodes the entry budgets, so it runs at those)."""
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{planted_dir}/documents.parquet"))
    con.register("embeddings", pq.read_table(f"{planted_dir}/embeddings.parquet"))
    sqls = ops_sql()
    runs = {
        "lm_score": lambda: analysis.lm_score(planted_dir),
        "dup_spans": lambda: dedup.dup_spans(planted_dir, n=5),
        "srp_dup_pairs": lambda: ann.srp_dup_pairs(planted_dir),
        "budget_sample": lambda: sampling.budget_sample(
            planted_dir, {"src0": 800, "src1": 400}, default=200),
        "embedding_clusters": lambda: ann.embedding_clusters(planted_dir),
        "source_overlap": lambda: dedup.source_overlap(planted_dir, n=5),
    }
    for name, fn in runs.items():
        r = _norm(fn().to_pandas())
        o = _norm(con.execute(sqls[name]).fetchdf())
        assert list(r.columns) == list(o.columns), name
        assert len(r) == len(o), (name, len(r), len(o))
        for c in r.columns:
            if np.issubdtype(r[c].dtype, np.number):
                assert np.allclose(r[c], o[c], rtol=0, atol=1e-9), (name, c)
            else:
                assert (r[c].values == o[c].values).all(), (name, c)


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_corpus")
    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string()),
                  "lang": pa.array([], pa.string()),
                  "source": pa.array([], pa.string()),
                  "n_chars": pa.array([], pa.int64())}),
        str(d / "documents.parquet"))
    pq.write_table(
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32())),
                  "label": pa.array([], pa.int32())}),
        str(d / "embeddings.parquet"))
    return str(d)


def test_empty_corpus_returns_empty_not_crash(empty_dir):
    """Review regression: zero-row inputs must yield empty results —
    srp's unique()-returns-None, budget/pack's schema-less empty sort
    blocks, and the empty lm vocabulary all crashed before the fix."""
    assert ann.srp_dup_pairs(empty_dir).num_rows == 0
    assert ann.embedding_clusters(empty_dir).count() == 0
    assert dedup.source_overlap(empty_dir).count() == 0
    assert sampling.budget_sample(empty_dir, {"src0": 10}).count() == 0
    assert sampling.pack_sequences(empty_dir).count() == 0
    assert dedup.dup_spans(empty_dir).count() == 0
    assert analysis.lm_score(empty_dir).count() == 0


def test_srp_no_band_collision_returns_empty(tmp_path):
    """Opposite vectors: signatures are bitwise complements, so no band
    collides and the candidate set is EMPTY — unique() returns None
    there (review regression)."""
    v = np.ones(DIM, dtype=np.float32)
    pq.write_table(
        pa.table({"vec_id": pa.array([0, 1], pa.int64()),
                  "embedding": pa.array(
                      [list(map(float, v)), list(map(float, -v))],
                      pa.list_(pa.float32())),
                  "label": pa.array([0, 0], pa.int32())}),
        str(tmp_path / "embeddings.parquet"))
    assert ann.srp_dup_pairs(str(tmp_path)).num_rows == 0


def test_srp_hot_bucket_salting_keeps_cluster_connected(tmp_path):
    """A mega-cluster of identical embeddings over-fills every band
    bucket; with a small max_block the bucket is salted (capped
    sub-chunks + bridge pairs).  The pair list is intentionally partial,
    but the cluster must stay CONNECTED and every surviving pair exact
    (hamming 0, cos 1.0) — the size_col="sig" carrier must ride the
    bridge pairs too."""
    n = 120
    v = np.linspace(0.1, 1.0, DIM).astype(np.float32)
    pq.write_table(
        pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([list(map(float, v))] * n,
                                        pa.list_(pa.float32())),
                  "label": pa.array([0] * n, pa.int32())}),
        str(tmp_path / "embeddings.parquet"))
    res = ann.srp_dup_pairs(str(tmp_path), max_block=30).to_pandas()
    assert (res.hamming == 0).all() and (res.cos == 1.0).all()
    # union-find: one component over all n ids
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(res.vec_a, res.vec_b):
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(n)}) == 1


def test_embedding_clusters_kmeans_variant(planted_dir):
    """quantizer="kmeans" (k-means-lite refinement) is the rows-only
    scale variant: same schema, every vector assigned, identical
    embeddings co-clustered."""
    res = ann.embedding_clusters(planted_dir, quantizer="kmeans").to_pandas()
    assert list(res.columns) == ["vec_id", "cluster", "cos"]
    assert len(res) == 40
    r = res.set_index("vec_id")
    assert r.loc[1].cluster == r.loc[2].cluster


def test_srp_rejects_lossy_banding(planted_dir):
    """max_hamming >= bands breaks the pigeonhole completeness contract
    — the function must refuse rather than silently drop pairs."""
    with pytest.raises(ValueError, match="lossy"):
        ann.srp_dup_pairs(planted_dir, nbits=32, bands=8, max_hamming=8)


def test_srp_return_stats_reports_salting(tmp_path, planted_dir):
    """return_stats=True surfaces the completeness flag (round-4 ADVICE):
    a capped band bucket → salted=True (partial pair list); an uncapped
    run → salted=False and a table identical to the plain call."""
    n = 120
    v = np.linspace(0.1, 1.0, DIM).astype(np.float32)
    pq.write_table(
        pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array([list(map(float, v))] * n,
                                        pa.list_(pa.float32())),
                  "label": pa.array([0] * n, pa.int32())}),
        str(tmp_path / "embeddings.parquet"))
    capped, stats = ann.srp_dup_pairs(str(tmp_path), max_block=30,
                                      return_stats=True)
    assert stats == {"salted": True}
    # marker rows must not leak: every returned pair is a real survivor
    assert (capped["hamming"].to_numpy() <= 7).all()
    full, stats2 = ann.srp_dup_pairs(planted_dir, return_stats=True)
    assert stats2 == {"salted": False}
    assert full.equals(ann.srp_dup_pairs(planted_dir))


def test_embedding_dup_pairs_pushes_id_predicate(planted_dir, monkeypatch):
    """The vec_id < max_id cap must be pushed into the parquet read —
    never a full-table driver materialization (round-4 VERDICT "What's
    wrong" #1).  Spies on pq.read_table and asserts the broadcast-side
    read carries the filters= predicate; values checked against a naive
    in-memory all-pairs reference."""
    import pyarrow.parquet as _pq

    calls = []
    orig = _pq.read_table

    def spy(path, *a, **kw):
        t = orig(path, *a, **kw)
        calls.append((str(path), kw.get("filters"), t.num_rows))
        return t

    monkeypatch.setattr(_pq, "read_table", spy)
    res = ann.embedding_dup_pairs(planted_dir, max_id=10, threshold=0.2)
    emb_calls = [c for c in calls if "embeddings" in c[0]]
    assert emb_calls, "broadcast side must come from pq.read_table"
    for _, filters, nrows in emb_calls:
        assert filters is not None, "driver read missing the id predicate"
        assert nrows <= 10
    # naive reference over the capped range
    t = orig(f"{planted_dir}/embeddings.parquet",
             columns=["vec_id", "embedding"])
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)[:10]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    want = sorted((a, b) for a in range(10) for b in range(a + 1, 10)
                  if cos[a, b] >= 0.2)
    got = sorted(zip(res["vec_a"].to_pylist(), res["vec_b"].to_pylist()))
    assert got == want
