"""Property-based conformance: on hypothesis-generated corpora (case
variants, slashes, numbers, hashtags, entities), the distributed build
must match the sequential mini-reference engine — dictionary and ranked
results.  A handful of examples, no shrinking (each example is a full
Ray build)."""

import pyarrow as pa
import pyarrow.dataset as pads
import pytest
from hypothesis import HealthCheck, Phase, given, settings
from hypothesis import strategies as st

from searchengine_ray.oracle.mini_reference import MiniReferenceEngine
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.search import QueryEngine

WORDS = st.sampled_from(
    "Corona corona CORONA Virus virus spread Index index batch 2020 "
    "35 Thousand 12% a/b #Tag @who @WHO Donald Trump New York the and "
    "data Data DATA stream".split()
)
TEXT = st.lists(WORDS, min_size=3, max_size=15).map(" ".join)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=8, max_value=24))
    texts = [draw(TEXT) for _ in range(n)]
    return [(f"fz{i % 4:02d}", i // 4, t) for i, t in enumerate(texts)]


@given(rows=corpora())
@settings(
    max_examples=5,
    deadline=None,
    phases=[Phase.generate],  # no shrinking: every example is a Ray build
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_fuzzed_corpus_identity(rows, tmp_path_factory):
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        }
    )
    idx = str(tmp_path_factory.mktemp("fuzz") / "index")
    build_index(tbl, idx, profile="reference", n_ranges=4)

    mini = MiniReferenceEngine()
    mini.build(rows)
    if mini.n_docs == 0:
        pytest.skip("all-empty corpus")

    d = pads.dataset(f"{idx}/dictionary").to_table()
    ray_dict = {
        t: (df, cf)
        for t, df, cf in zip(d["term"].to_pylist(), d["df"].to_pylist(), d["cf"].to_pylist())
    }
    mini_dict = {t: (e["df"], e["cf"]) for t, e in mini.inverted.items()}
    assert ray_dict == mini_dict

    qe = QueryEngine(idx, profile="reference")
    for query in ("corona virus", "Donald Trump 2020", "index data stream"):
        res = qe.search(query, k=10)
        exp = mini.search(query, k=10)
        got = list(zip(res["conv_id"].to_pylist(), res["turn_idx"].to_pylist()))
        assert got == [(c, t) for c, t, _ in exp], query
        for s_got, (_, _, s_exp) in zip(res["score"].to_pylist(), exp):
            assert abs(s_got - s_exp) < 1e-9
