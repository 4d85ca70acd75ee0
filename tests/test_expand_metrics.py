"""Query expansion plugins, embedding rerank, IR metrics, file IO."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from searchengine_ray.pipelines import metrics
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.expand import (
    EmbeddingKNNExpansion,
    HashWordVectors,
    SpellExpansion,
    SynonymExpansion,
    compute_doc_vectors,
    rerank_by_embedding,
)
from searchengine_ray.pipelines.search import QueryEngine
from searchengine_ray.sources.queries_file import (
    read_labels_csv,
    read_queries_tsv,
    write_results_csv,
)
from searchengine_ray.sources.transcripts import write_synth_transcripts


@pytest.fixture(scope="module")
def qe(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp")
    src, idx = str(root / "c"), str(root / "i")
    write_synth_transcripts(src, n_files=2, n_convs=20, turns_per_conv=8, seed=7)
    build_index(src, idx, profile="simple")
    compute_doc_vectors(idx)
    return QueryEngine(idx)


def test_spell_expansion_corrects_typo(qe):
    exp = SpellExpansion()
    raw = {"indx": 1.0, "merge": 1.0}  # 'indx' → 'index' (distance 1)
    out = exp(raw, qe)
    assert "index" in out and "indx" not in out
    assert out["merge"] == 1.0


def test_spell_expansion_keeps_known(qe):
    out = SpellExpansion()({"index": 1.0}, qe)
    assert out == {"index": 1.0}


def test_synonym_expansion(qe):
    exp = SynonymExpansion({"index": ["shard"]})
    out = exp({"index": 1.0}, qe)
    assert out["index"] == 1.0 and out["shard"] == 0.2
    res_plain = qe.search("index", k=5)
    res_exp = qe.search("index", k=5, expander=exp)
    assert not res_plain.equals(res_exp)  # expansion changes candidates/scores


def test_knn_expansion_only_short_queries(qe):
    exp = EmbeddingKNNExpansion(max_query_terms=2)
    long_q = {"index": 1.0, "merge": 1.0, "shard": 1.0}
    assert exp(long_q, qe) == long_q
    short = exp({"index": 1.0}, qe)
    assert len(short) > 1  # neighbors added
    assert short["index"] >= 1.0


def test_hash_vectors_deterministic():
    v = HashWordVectors(16)
    a, b = v(["word", "other"]), v(["word", "other"])
    assert np.allclose(a, b)
    assert not np.allclose(a[0], a[1])


def test_load_word_vectors_text_format(qe, tmp_path):
    """S5: the reference's `word v1..vD` text model format loads into
    the same callable API as HashWordVectors and plugs into the KNN
    expansion and rerank paths (search_engine_best.py:74-89)."""
    from searchengine_ray.pipelines.expand import load_word_vectors

    path = tmp_path / "model.txt"
    lines = []
    rng = np.random.default_rng(11)
    words = ["index", "merge", "shard", "token", "spill"]
    vecs = rng.normal(size=(len(words), 8)).astype("float32")
    for w, v in zip(words, vecs):
        lines.append(w + " " + " ".join(str(x) for x in v))
    lines.append("index 9 9 9 9 9 9 9 9")  # duplicate: first wins
    path.write_text("\n".join(lines) + "\n")

    model = load_word_vectors(str(path))
    assert model.dim == 8
    got = model(["merge", "nosuchword", "index"])
    assert got.shape == (3, 8)
    assert np.allclose(got[0], vecs[1], atol=1e-6)
    assert np.allclose(got[1], 0.0)          # OOV → zero vector
    assert np.allclose(got[2], vecs[0], atol=1e-6)  # not the duplicate row

    # cap respected
    capped = load_word_vectors(str(path), max_words=2)
    assert capped(["shard"]).sum() == 0.0 and capped(["merge"]).sum() != 0.0

    # plugs into the existing expansion/rerank machinery
    exp = EmbeddingKNNExpansion(vectors=model, max_query_terms=3)
    out = exp({"index": 1.0}, qe)
    assert out["index"] >= 1.0
    res = qe.search("index merge", k=5)
    idx = qe.reader.index_dir
    compute_doc_vectors(idx, vectors=model)  # doc vectors in model space
    try:
        rr = rerank_by_embedding(qe, res, "index merge", vectors=model)
        assert rr.num_rows == res.num_rows
    finally:
        compute_doc_vectors(idx)  # restore default-dim vectors for other tests


def test_rerank_by_embedding(qe):
    res = qe.search("index merge", k=10)
    rr = rerank_by_embedding(qe, res, "index merge")
    assert rr.num_rows == res.num_rows
    assert set(zip(rr["conv_id"].to_pylist(), rr["turn_idx"].to_pylist())) == set(
        zip(res["conv_id"].to_pylist(), res["turn_idx"].to_pylist())
    )
    s = rr["score"].to_numpy()
    assert (np.diff(np.floor(s * 1e6 + 0.5)) <= 0).all()  # ranked desc


# ---------------------------------------------------------------------------
# metrics (hand-computed values, reference Part C/metrics.py semantics)
# ---------------------------------------------------------------------------

TOY = pd.DataFrame(
    {
        "query": [1, 1, 2, 2, 2, 3],
        "doc": ["a", "b", "c", "d", "e", "f"],
        "y_true": [1, 0, 1, 1, 0, 0],
    }
)


def test_precision():
    assert metrics.precision(TOY, True, 1) == 0.5
    assert abs(metrics.precision(TOY) - (0.5 + 2 / 3 + 0) / 3) < 1e-12


def test_precision_at_n():
    assert metrics.precision_at_n(TOY, 1, 2) == 0.5
    assert metrics.precision_at_n(TOY, 3, 1) == 0
    assert metrics.precision_at_n(TOY, 2, 2) == 1.0


def test_recall():
    assert metrics.recall(TOY, {1: 2}) == 0.5
    assert abs(metrics.recall(TOY, {1: 2, 2: 3, 3: 1}) - (0.5 + 2 / 3 + 0) / 3) < 1e-12


def test_map():
    # q1: relevant at rank 1 → AP 1; q2: ranks 1,2 → AP 1; q3: none → 0
    assert abs(metrics.mean_average_precision(TOY) - 2 / 3) < 1e-12


def test_evaluate_join(qe):
    res = {1: qe.search("index merge", k=5), 2: qe.search("cluster spill", k=5)}
    labels_rows = []
    for qid, t in res.items():
        for i, (c, ti) in enumerate(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())):
            labels_rows.append({"query": qid, "doc": f"{c}:{ti}", "y_true": 1 if i < 2 else 0})
    labels = pd.DataFrame(labels_rows)
    m = metrics.evaluate(res, labels)
    assert m["n_joined"] == sum(t.num_rows for t in res.values())
    assert m["precision@5"] == pytest.approx(2 / 5)
    assert m["MAP"] == pytest.approx(1.0)  # relevant docs are ranked first


# ---------------------------------------------------------------------------
# file IO (S3/S4/K3)
# ---------------------------------------------------------------------------

def test_queries_tsv_roundtrip(tmp_path):
    p = tmp_path / "queries.tsv"
    p.write_text("query_id\tinformation_need\tkeywords\n1\tneed one\tspark join\n2\tneed two\tfast table\n")
    t = read_queries_tsv(str(p))
    assert t["query_id"].to_pylist() == [1, 2]
    assert t["keywords"].to_pylist() == ["spark join", "fast table"]

    plain = tmp_path / "queries.txt"
    plain.write_text("spark join\nfast table\n")
    t2 = read_queries_tsv(str(plain))
    assert t2["keywords"].to_pylist() == ["spark join", "fast table"]


def test_labels_csv_and_results_sink(tmp_path, qe):
    lp = tmp_path / "labels.csv"
    lp.write_text("query,tweet,y_true\n1,c1:0,1\n1,c2:3,0\n")
    labels = read_labels_csv(str(lp))
    assert labels["y_true"].to_pylist() == [1, 0]

    res = {1: qe.search("index", k=3)}
    out = tmp_path / "results.csv"
    write_results_csv(str(out), res)
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "query,doc,rank"
    assert len(lines) == 1 + res[1].num_rows


def test_spell_expansion_probes_uppercase_vocab():
    """Entity-like terms live UPPERCASE in the dictionary when no
    lowercase twin exists (postings fold rule); a distance-1 typo must
    still reach them — the lowercase-only candidate probe could not."""
    class _Reader:
        vocab = {"TRUMP": 7, "merge": 3}

        def has_term(self, t):
            return t in self.vocab

        def cf(self, t):
            return self.vocab.get(t, 0)

    class _Engine:
        reader = _Reader()

    out = SpellExpansion()({"trmup": 1.0}, _Engine())
    assert out == {"TRUMP": 1.0}


def test_spell_expansion_picks_highest_corpus_frequency():
    """Among equal-edit-distance candidates the correction with the
    highest corpus frequency wins (pyspellchecker's frequency ranking,
    Part C/SpellChecker.py:9-24), with the term string as a deterministic
    tiebreak — and edits1 candidates pre-empt edits2 entirely."""
    class _Reader:
        vocab = {"cat": 2, "car": 90}

        def has_term(self, t):
            return t in self.vocab

        def cf(self, t):
            return self.vocab.get(t, 0)

    class _Engine:
        reader = _Reader()

    # frequency decides, not the alphabet: "cat" > "car" lexically but
    # car's cf is higher
    assert SpellExpansion()({"caz": 1.0}, _Engine()) == {"car": 1.0}
    # equal cf → the term string breaks the tie deterministically
    _Reader.vocab = {"cat": 5, "car": 5}
    assert SpellExpansion()({"caz": 1.0}, _Engine()) == {"cat": 1.0}
    # a distance-1 hit pre-empts distance-2 candidates however frequent:
    # cart (insert+replace) never competes with car
    _Reader.vocab = {"cart": 1000, "car": 1}
    assert SpellExpansion()({"caz": 1.0}, _Engine()) == {"car": 1.0}
