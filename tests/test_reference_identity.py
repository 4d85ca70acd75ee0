"""Rank-identity conformance: the distributed Ray build + search with the
reference profile must match the vendored sequential mini-reference
engine (dict-based, order-dependent case migration) on the synthetic
transcript corpus — same dictionary, same postings, same doc weights,
and rank-identical search results with scores equal to ≤1e-9
(SURVEY §5 rebuild test plan)."""

import numpy as np
import pyarrow.dataset as pads
import pytest

from searchengine_ray.pipelines.build import build_index, compute_doc_weights
from searchengine_ray.pipelines.search import QueryEngine
from searchengine_ray.oracle.mini_reference import MiniReferenceEngine
from searchengine_ray.sources.transcripts import synth_transcripts, write_synth_transcripts

QUERIES = [
    "corona virus spread",
    "Donald Trump New York",
    "#StayHome today people",
    "35 Thousand cases reported",
    "index merge query shard",
    "covid-19 vaccine data",
    "batch stream actor cluster",
    "Ray Data Apache Arrow",
    "12% growth Jun 2020",
    "token score rank worker memory",
]


@pytest.fixture(scope="module", params=[13, 77])
def engines(tmp_path_factory, request):
    seed = request.param
    root = tmp_path_factory.mktemp(f"refid{seed}")
    src = str(root / "corpus")
    idx = str(root / "index")
    write_synth_transcripts(src, n_files=3, n_convs=40, turns_per_conv=6, seed=seed)
    build_index(src, idx, profile="reference")
    compute_doc_weights(idx)
    qe = QueryEngine(idx, profile="reference")

    tbl = synth_transcripts(n_convs=40, turns_per_conv=6, seed=seed)
    mini = MiniReferenceEngine()
    mini.build(
        list(
            zip(
                tbl["conv_id"].to_pylist(),
                tbl["turn_idx"].to_pylist(),
                tbl["text"].to_pylist(),
            )
        )
    )
    return qe, mini, idx


def test_corpus_stats_identical(engines):
    qe, mini, _ = engines
    assert qe.reader.n_docs == mini.n_docs
    assert qe.reader.meta["total_len"] == mini.total_len
    assert abs(qe.reader.avgdl - mini.total_len / mini.n_docs) < 1e-12


def test_dictionary_identical(engines):
    qe, mini, idx = engines
    d = pads.dataset(f"{idx}/dictionary").to_table()
    ray_dict = {
        t: (df, cf)
        for t, df, cf in zip(
            d["term"].to_pylist(), d["df"].to_pylist(), d["cf"].to_pylist()
        )
    }
    mini_dict = {t: (e["df"], e["cf"]) for t, e in mini.inverted.items()}
    assert set(ray_dict) == set(mini_dict), (
        set(ray_dict) - set(mini_dict),
        set(mini_dict) - set(ray_dict),
    )
    for t in mini_dict:
        assert ray_dict[t] == mini_dict[t], t


def test_postings_identical(engines):
    qe, mini, _ = engines
    dm = qe.reader.docmap()
    for term in sorted(mini.inverted):
        ids, tfs, lens = qe.reader.postings(term)
        pos = qe.reader.doc_positions(ids)
        got = {
            (dm["conv_id"][p], int(dm["turn_idx"][p])): (int(tf), int(dl))
            for p, tf, dl in zip(pos, tfs, lens)
        }
        assert got == mini.inverted[term]["postings"], term


def test_doc_weights_identical(engines):
    qe, mini, _ = engines
    w_ids, w_sq = qe.reader.doc_weights()
    dm = qe.reader.docmap()
    pos = qe.reader.doc_positions(w_ids)
    got = {
        (dm["conv_id"][p], int(dm["turn_idx"][p])): w for p, w in zip(pos, w_sq)
    }
    for key, d in mini.docs.items():
        assert abs(got[key] - d["w2"]) < 1.01e-3, key  # both 3dp-rounded


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity(engines, query):
    qe, mini, _ = engines
    res = qe.search(query, k=20)
    exp = mini.search(query, k=20)
    got = list(
        zip(res["conv_id"].to_pylist(), res["turn_idx"].to_pylist(), res["score"].to_pylist())
    )
    assert [(c, t) for c, t, _ in got] == [(c, t) for c, t, _ in exp], query
    for (_, _, sg), (_, _, se) in zip(got, exp):
        assert abs(sg - se) < 1e-9


@pytest.mark.parametrize("query", QUERIES[:3])
def test_rank_identity_default_k(engines, query):
    qe, mini, _ = engines
    res = qe.search(query)
    exp = mini.search(query)
    assert res.num_rows == len(exp)
    got = list(zip(res["conv_id"].to_pylist(), res["turn_idx"].to_pylist()))
    assert got == [(c, t) for c, t, _ in exp]


def test_entity_df_counts_distinct_docs(tmp_path):
    """Regression (round-2 ADVICE): a single doc containing two case
    variants of the same folded entity ('DATA Corona' + 'DATA CORONA')
    must count as ONE document for the P15 df≥2 rule — the entity entry
    is dropped, matching the mini-reference's de-duplicated per-term df.
    A second corpus plants the entity in two distinct docs to check the
    keep side."""
    import pyarrow as pa

    def build_both(rows, tag):
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
        idx = str(tmp_path / tag)
        build_index(tbl, idx, profile="reference", n_ranges=4)
        mini = MiniReferenceEngine()
        mini.build(rows)
        d = pads.dataset(f"{idx}/dictionary").to_table()
        ray_dict = {
            t: (df, cf)
            for t, df, cf in zip(
                d["term"].to_pylist(), d["df"].to_pylist(), d["cf"].to_pylist()
            )
        }
        mini_dict = {t: (e["df"], e["cf"]) for t, e in mini.inverted.items()}
        return ray_dict, mini_dict

    # one doc, two case variants → distinct-doc df = 1 → dropped
    rows = [
        ("c0", 0, "filler words DATA Corona appear with DATA CORONA today"),
        ("c0", 1, "unrelated filler text about streams"),
    ]
    ray_dict, mini_dict = build_both(rows, "drop")
    assert "DATA CORONA" not in ray_dict
    assert ray_dict == mini_dict

    # two distinct docs → df = 2 → kept
    rows2 = [
        ("c0", 0, "filler words DATA Corona appear here today"),
        ("c1", 0, "other filler with DATA CORONA elsewhere"),
    ]
    ray_dict2, mini_dict2 = build_both(rows2, "keep")
    assert "DATA CORONA" in ray_dict2
    assert ray_dict2 == mini_dict2


def test_resolve_fold_group_distinct_df():
    """Unit: resolve_fold_group drops an entity whose case-variant
    surfaces share one doc (same doc_min, df==1 each) and keeps it when
    the doc_mins differ."""
    import pyarrow as pa

    from searchengine_ray.stages.postings import (
        PARTIAL_SCHEMA,
        resolve_fold_group,
    )

    def partials(doc_a, doc_b):
        return pa.table(
            {
                "fold_key": ["data corona", "data corona"],
                "surface": ["DATA Corona", "DATA CORONA"],
                "is_cap": [True, True],
                "is_entity": [True, True],
                "df": [1, 1],
                "doc_min": [doc_a, doc_b],
                "ranges": [[0], [1]],
            },
            schema=PARTIAL_SCHEMA,
        )

    same = resolve_fold_group(partials(42, 42))
    assert same["dropped"].to_pylist() == [True, True]
    assert set(same["term"].to_pylist()) == {"DATA CORONA"}
    diff = resolve_fold_group(partials(42, 43))
    assert diff["dropped"].to_pylist() == [False, False]


def test_entity_min_df_above_two_warns():
    """entity_min_df > 2 falls back to the additive df upper bound for
    df>1 surfaces (may UNDER-drop vs the reference's deduplicated-df
    rule) — pinned to warn so the approximation is never silent."""
    import warnings

    import pyarrow as pa

    from searchengine_ray.stages.postings import PARTIAL_SCHEMA, resolve_fold_group

    g = pa.table(
        {
            "fold_key": ["apple"] * 2, "surface": ["Apple", "apple"],
            "is_cap": [True, False], "is_entity": [True, False],
            "df": [3, 2], "doc_min": [1, 2], "ranges": [[0], [0]],
        },
        schema=PARTIAL_SCHEMA,
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        resolve_fold_group(g, entity_min_df=5)
    assert any("approximately enforced" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        resolve_fold_group(g, entity_min_df=2)  # exact default: silent
    assert not w


def test_non_alpha_first_surfaces_never_fold(tmp_path):
    """Regression: '@WHO' and '@who' (mention tokens survive verbatim)
    must stay DISTINCT dictionary entries in both engines — fold_key_of
    only folds ASCII-alpha-first surfaces, and the mini's UPPER→lower
    migration is gated the same way."""
    import pyarrow as pa

    rows = [("c00", 0, "@WHO virus update"), ("c01", 0, "@who spread data"),
            ("c02", 0, "virus data report")]
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
    idx = str(tmp_path / "idx")
    build_index(tbl, idx, profile="reference", n_ranges=4)
    mini = MiniReferenceEngine()
    mini.build(rows)
    d = pads.dataset(f"{idx}/dictionary").to_table()
    ray_dict = {
        t: (df, cf)
        for t, df, cf in zip(d["term"].to_pylist(), d["df"].to_pylist(),
                             d["cf"].to_pylist())
    }
    mini_dict = {t: (e["df"], e["cf"]) for t, e in mini.inverted.items()}
    assert ray_dict == mini_dict
    assert "@WHO" in ray_dict and "@who" in ray_dict
    assert ray_dict["@WHO"] == (1, 1) and ray_dict["@who"] == (1, 1)


def test_resolve_fold_group_entity_rule_without_folding():
    """With case_folding=False the index emits raw surfaces as terms, so
    the P15 distinct-doc pool must be per SURFACE: an entity seen once
    as 'Trump' (doc A) and once as 'trump' (doc B) is dropped on both
    sides (each emitted term has df=1), never kept by pooling the two
    docs across case variants."""
    import pyarrow as pa

    from searchengine_ray.stages.postings import PARTIAL_SCHEMA, resolve_fold_group

    group = pa.table(
        {
            "fold_key": pa.array(["trump", "trump"], pa.string()),
            "surface": pa.array(["Trump", "trump"], pa.string()),
            "is_cap": pa.array([True, False]),
            "is_entity": pa.array([True, True]),
            "df": pa.array([1, 1], pa.int64()),
            "doc_min": pa.array([100, 200], pa.int64()),
            "ranges": pa.array([[0], [1]], pa.list_(pa.int32())),
        },
        schema=PARTIAL_SCHEMA,
    )
    folded = resolve_fold_group(group, case_folding=True)
    # folding ON: both surfaces resolve to 'trump' with 2 distinct docs -> kept
    assert not any(folded["dropped"].to_pylist())
    unfolded = resolve_fold_group(group, case_folding=False)
    # folding OFF: each surface is its own emitted term with df=1 -> dropped
    assert all(unfolded["dropped"].to_pylist())
    assert unfolded["term"].to_pylist() == unfolded["surface"].to_pylist()
