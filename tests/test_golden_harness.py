"""End-to-end golden harness — the rebuild of the reference's acceptance
test (``Part C/test_part_c_students_old.py``): build an index over a
corpus, run a queries file, join ranked results with qrels, range-check
the metric block.  Labels here are synthesized from a brute-force
relevance oracle so the expected metrics are known."""

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.pipelines import metrics
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.search import QueryEngine
from searchengine_ray.sources.queries_file import (
    read_labels_csv,
    read_queries_tsv,
    write_results_csv,
)
from searchengine_ray.sources.transcripts import write_synth_transcripts

QUERIES = ["index shard merge", "token score rank", "cluster memory spill", "actor worker block"]


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden")
    src, idx = str(root / "c"), str(root / "i")
    write_synth_transcripts(src, n_files=2, n_convs=30, turns_per_conv=8, seed=23)
    build_index(src, idx, profile="simple")
    qe = QueryEngine(idx)

    qfile = root / "queries.tsv"
    qfile.write_text(
        "query_id\tinformation_need\tkeywords\n"
        + "\n".join(f"{i+1}\tneed {i+1}\t{q}" for i, q in enumerate(QUERIES))
        + "\n"
    )
    # labels: top-5 of each query's own results are "relevant" (a
    # self-consistent qrel set → known-perfect early precision)
    rows = []
    for i, q in enumerate(QUERIES):
        res = qe.search(q, k=20)
        for rank, (c, t) in enumerate(
            zip(res["conv_id"].to_pylist(), res["turn_idx"].to_pylist())
        ):
            rows.append(f"{i+1},{c}:{t},{1 if rank < 5 else 0}")
    lfile = root / "labels.csv"
    lfile.write_text("query,doc,y_true\n" + "\n".join(rows) + "\n")
    return root, qe


def test_full_harness_flow(harness):
    root, qe = harness
    queries = read_queries_tsv(str(root / "queries.tsv"))
    assert queries.num_rows == len(QUERIES)
    labels = read_labels_csv(str(root / "labels.csv")).to_pandas()

    results = {}
    for qid, kw in zip(queries["query_id"].to_pylist(), queries["keywords"].to_pylist()):
        res = qe.search(kw, k=20)
        assert res.num_rows > 0, kw
        results[qid] = res

    write_results_csv(str(root / "results.csv"), results)
    assert (root / "results.csv").exists()

    m = metrics.evaluate(results, labels)
    # top-5 are relevant by construction → perfect P@5 and MAP
    assert m["precision@5"] == pytest.approx(1.0)
    assert m["MAP"] == pytest.approx(1.0)
    assert m["recall"] == pytest.approx(1.0)  # all 5 relevant retrieved in top-20
    assert 0 < m["precision"] <= 1


def test_candidate_cap_and_anomaly_cut(harness):
    _, qe = harness
    full = qe.search(QUERIES[0], k=10**9)
    capped = qe.search(QUERIES[0], k=10**9, max_candidates=5)
    assert capped.num_rows <= 5 if full.num_rows >= 5 else capped.num_rows == full.num_rows
    # cap keeps the best-scoring candidates
    assert capped["score"].to_pylist() == full["score"].to_pylist()[: capped.num_rows]

    cut = qe.search(QUERIES[0], k=10**9, anomaly_cut_std=0.0)
    scores = np.array(full["score"].to_pylist())
    expect = int((scores >= scores.mean()).sum())
    assert cut.num_rows == expect


def test_stemming_profile(tmp_path):
    import pyarrow.parquet as pq

    from searchengine_ray.sources.transcripts import synth_transcripts

    src = tmp_path / "c"
    src.mkdir()
    tbl = synth_transcripts(n_convs=6, turns_per_conv=4, seed=31, rich=False)
    pq.write_table(tbl, str(src / "part-0.parquet"))
    idx = str(tmp_path / "i")
    build_index(str(src), idx, profile="reference_stem")
    qe = QueryEngine(idx, profile="reference_stem")
    vocab = set(qe.reader.vocabulary())
    # suffix-stripped forms only (e.g. 'workers'→'worker'); no plural forms
    assert not any(v.endswith("ers") and v[:-1] in vocab for v in vocab)
    assert qe.search("tokens scores", k=3).num_rows > 0  # query stems too
