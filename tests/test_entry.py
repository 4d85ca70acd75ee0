"""Driver-contract self-check: every queries() entry must match its
DuckDB oracle exactly (row count, schema, values) — the same comparison
the driver runs at sf0.01, here at sf0.001 for speed."""

import pytest

import __ray_entry__ as entry_mod
from searchengine_ray.oracle.compare import compare_one

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entry_mod.queries()
_SQLS = entry_mod.oracle_sql()


def test_every_query_has_callable_and_most_have_oracles():
    assert _QUERIES
    missing = [n for n in _SQLS if n not in _QUERIES]
    assert not missing, f"oracle without callable: {missing}"


@pytest.mark.parametrize("name", sorted(_SQLS))
def test_query_matches_oracle(name):
    r = compare_one(name, _QUERIES[name], _SQLS[name], SF_DIR)
    assert r["status"] == "OK", r


def test_entry_smoke():
    res = entry_mod.entry()
    assert res.num_rows >= 0
    assert {"conv_id", "turn_idx", "score"} <= set(res.schema.names)
