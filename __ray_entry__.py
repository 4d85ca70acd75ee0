"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in searchengine_ray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline — build the inverted index over the
  transcript table derived from /root/testdata/sf0.001 and run the
  conformance search queries (blend = 0.9·BM25 + 0.1·inner-product).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  (SURVEY.md §2) with its DuckDB twin; compared by the driver at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import pyarrow as pa

    from searchengine_ray.oracle.sql import SEARCH_QUERY_TEXT
    from searchengine_ray.pipelines.entry_queries import engine_for

    eng = engine_for("/root/testdata/sf0.001")
    parts = []
    for q in (SEARCH_QUERY_TEXT, "window merge batch", "dup stream vector"):
        res = eng.search(q, k=10)
        parts.append(
            res.add_column(0, "query", pa.array([q] * res.num_rows, pa.string()))
        )
    return pa.concat_tables(parts)


def queries() -> dict[str, Callable[[str], Any]]:
    from searchengine_ray.pipelines.entry_ops import OPS_QUERIES
    from searchengine_ray.pipelines.entry_queries import SEARCH_CORE_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    out.update(SEARCH_CORE_QUERIES)
    out.update(OPS_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """EVERY queries() entry has a DuckDB twin — including the
    hash-defined operators (fingerprints, minhash_lsh_pairs,
    simhash_pairs), whose string hashes are poly_hash_u64 + splitmix64
    precisely so the full chain (byte polynomial → permutation min /
    bit votes → banding → scores) is reproducible bit-exactly in
    HUGEINT SQL (oracle/sql_ops.py).  The only known deviation is the
    ~2^-64 band-hash collision the engine's LSH grouping admits where
    the SQL checks segment equality."""
    from searchengine_ray.oracle.sql import search_core_sql
    from searchengine_ray.oracle.sql_ops import ops_sql

    out: dict[str, str] = {}
    out.update(search_core_sql())
    out.update(ops_sql())
    return out
