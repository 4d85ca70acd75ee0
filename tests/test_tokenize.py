"""Simple-profile tokenizer must match its DuckDB SQL twin exactly."""

import duckdb
import pyarrow as pa

from searchengine_ray.functions.tokenize import (
    STOPWORDS_SIMPLE,
    TOKEN_SPLIT_RE,
    simple_tokenize_flat,
)

TEXTS = [
    "Spark JOIN fast  table!!",
    "the a an of to — stopwords only",
    "",
    "unicode héllo wörld 搜索 123 x y2",
    "a/b c_d e.f  g--h",
    "trailing spaces   ",
]


def test_simple_tokenizer_matches_duckdb():
    parent, flat = simple_tokenize_flat(pa.array(TEXTS, type=pa.string()))
    got = sorted(zip(parent.tolist(), flat.to_pylist()))

    con = duckdb.connect()
    stop = ", ".join(f"'{w}'" for w in STOPWORDS_SIMPLE)
    rows = con.execute(
        f"""
        WITH t AS (SELECT unnest(?) AS text, generate_subscripts(?, 1) - 1 AS row)
        SELECT row, u.term FROM (
            SELECT row, unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS term
            FROM t
        ) u WHERE length(term) >= 2 AND term NOT IN ({stop})
        """,
        [TEXTS, TEXTS],
    ).fetchall()
    con.close()
    assert got == sorted(rows)


def test_stopwords_filtered():
    _, flat = simple_tokenize_flat(pa.array(["the quick брown fox", "THE The the"]))
    toks = flat.to_pylist()
    assert "the" not in toks
    assert "quick" in toks and "fox" in toks
