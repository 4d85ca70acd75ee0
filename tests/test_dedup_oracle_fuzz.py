"""Property-based oracle conformance for the hash-defined dedup family:
on hypothesis-generated corpora (planted dup pairs, unicode, empties,
sub-shingle shorts), the Ray pipelines must match their DuckDB HUGEINT
SQL twins value-exactly.  Few examples, no shrinking — each example
runs three Ray pipelines."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, Phase, given, settings
from hypothesis import strategies as st

from searchengine_ray.oracle.sql_ops import ops_sql
from searchengine_ray.pipelines import dedup

WORDS = st.sampled_from(
    "alpha beta gamma delta epsilon zeta eta theta İstanbul café 42 "
    "x1 y2 z3 lorem ipsum dolor sit amet the and of".split()
)
TEXT = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=6, max_value=16))
    texts = [draw(TEXT) for _ in range(n)]
    # plant one exact dup and one near-dup so the pair paths light up
    if n >= 4 and texts[0]:
        texts[1] = texts[0]
        texts[3] = (texts[2] + " extra") if texts[2] else "extra"
    return texts


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@given(texts=corpora())
@settings(
    max_examples=4,
    deadline=None,
    phases=[Phase.generate],
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_dedup_family_matches_sql_oracles(texts, tmp_path_factory):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("fz")
    pq.write_table(tbl, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.register("documents", tbl)
    sqls = ops_sql()
    runs = {
        "simhash_pairs": lambda: dedup.simhash_pairs(str(d), max_block=10**6),
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(
            str(d), verify=True, max_block=10**6),
        "dedup_clusters": lambda: dedup.dedup_clusters(str(d), threshold=0.8),
    }
    for name, fn in runs.items():
        r = fn()
        r = r.to_pandas()
        o = con.execute(sqls[name]).fetchdf()
        rn, on = _norm(r), _norm(o)
        assert list(rn.columns) == list(on.columns), (name, rn.columns, on.columns)
        assert len(rn) == len(on), (name, len(rn), len(on), texts)
        for c in rn.columns:
            if np.issubdtype(rn[c].dtype, np.number):
                assert np.allclose(rn[c], on[c], rtol=0, atol=1e-9), (name, c, texts)
            else:
                assert (rn[c].values == on[c].values).all(), (name, c, texts)


@given(texts=corpora())
@settings(
    max_examples=4,
    deadline=None,
    phases=[Phase.generate],
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_round4_text_ops_match_sql_oracles(texts, tmp_path_factory):
    """Same property for the round-4 text operators (lm_score, dup_spans,
    source_overlap): unicode case-mapping, empties and sub-window shorts
    must match the DuckDB twins value-exactly."""
    from searchengine_ray.pipelines import analysis, entry_ops

    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array([f"src{i % 3}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("fz4")
    pq.write_table(tbl, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.register("documents", tbl)
    sqls = ops_sql()
    runs = {
        "lm_score": lambda: analysis.lm_score(str(d)),
        # the driver-entry forms: schema pinned through _collect_table
        # even when a no-window corpus yields zero blocks
        "dup_spans": lambda: entry_ops.q_dup_spans(str(d)),
        "source_overlap": lambda: entry_ops.q_source_overlap(str(d)),
    }
    for name, fn in runs.items():
        r = fn()
        r = r.to_pandas()
        o = con.execute(sqls[name]).fetchdf()
        rn, on = _norm(r), _norm(o)
        assert list(rn.columns) == list(on.columns), (name, rn.columns, on.columns)
        assert len(rn) == len(on), (name, len(rn), len(on), texts)
        for c in rn.columns:
            if np.issubdtype(rn[c].dtype, np.number):
                assert np.allclose(rn[c], on[c], rtol=0, atol=1e-9), (name, c, texts)
            else:
                assert (rn[c].values == on[c].values).all(), (name, c, texts)


NL_TEXT = st.lists(
    st.lists(WORDS, min_size=0, max_size=6).map(" ".join),
    min_size=0, max_size=5,
).map("\n".join)


@given(texts=st.lists(NL_TEXT, min_size=3, max_size=10))
@settings(
    max_examples=4,
    deadline=None,
    phases=[Phase.generate],
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_repetition_stats_matches_sql_oracle(texts, tmp_path_factory):
    """Gopher repetition filters vs the DuckDB twin on newline-bearing
    texts (the sf corpora have no LF, so the line metrics get their real
    signal here): empty lines, empty docs, repeated lines/grams and
    unicode all match value-exactly."""
    from searchengine_ray.pipelines import analysis

    # plant a repetitive doc so the dup fractions light up
    texts = list(texts) + ["dup line\ndup line\nother\n\ndup line",
                           "a b a b a b a b"]
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s0"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("fzr")
    pq.write_table(tbl, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.register("documents", tbl)
    r = _norm(analysis.repetition_stats(str(d)).to_pandas())
    o = _norm(con.execute(ops_sql()["repetition_stats"]).fetchdf())
    assert list(r.columns) == list(o.columns)
    assert len(r) == n == len(o)
    for c in r.columns:
        if np.issubdtype(r[c].dtype, np.number):
            assert np.allclose(r[c], o[c], rtol=0, atol=1e-9), (c, texts)
        else:
            assert (r[c].values == o[c].values).all(), (c, texts)
