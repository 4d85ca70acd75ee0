"""Sub-chunk correctness: tiny chunk_docs forces multiple chunks per
(term, range) group — postings must stay globally doc-sorted, WAND must
still match exact, and block-max skipping must operate per sub-chunk."""

import numpy as np
import pytest

from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.search import QueryEngine
from searchengine_ray.sources.transcripts import write_synth_transcripts


@pytest.fixture(scope="module", params=[(4, 7), (8, 16)])
def chunked(tmp_path_factory, request):
    n_ranges, chunk_docs = request.param
    root = tmp_path_factory.mktemp(f"chunk{n_ranges}_{chunk_docs}")
    src, idx = str(root / "c"), str(root / "i")
    write_synth_transcripts(src, n_files=3, n_convs=40, turns_per_conv=6, seed=41)
    build_index(src, idx, profile="simple", n_ranges=n_ranges, chunk_docs=chunk_docs)
    return QueryEngine(idx)


def test_postings_sorted_across_chunks(chunked):
    qe = chunked
    for term in sorted(qe.reader.vocabulary()):
        ids, tfs, lens = qe.reader.postings(term)
        assert (np.diff(ids) > 0).all(), term  # strictly increasing globally
        assert len(ids) == qe.reader.df(term)
        meta = qe.reader.chunk_meta(term)
        assert (np.diff(meta["chunk_idx"]) > 0).all()
        # chunk doc ranges are disjoint and ordered
        assert (meta["doc_min"][1:] > meta["doc_max"][:-1]).all(), term


def test_multiple_chunks_exist(chunked):
    qe = chunked
    max_chunks = max(len(qe.reader.chunk_meta(t)["chunk_idx"]) for t in qe.reader.vocabulary())
    assert max_chunks > 1  # the sub-chunk path is actually exercised


def test_wand_equals_exact_chunked(chunked):
    qe = chunked
    for q in ["index shard merge", "token score rank actor", "cluster memory spill block"]:
        for k in (3, 10, 40):
            assert qe.search(q, k=k).equals(qe.search(q, k=k, method="wand")), (q, k)


def test_chunk_restricted_fetch(chunked):
    qe = chunked
    term = sorted(qe.reader.vocabulary())[0]
    meta = qe.reader.chunk_meta(term)
    first = int(meta["chunk_idx"][0])
    ids, _, _ = qe.reader.postings(term, chunk_ids={first})
    all_ids, _, _ = qe.reader.postings(term)
    assert len(ids) == int(meta["doc_min"].shape[0] and (all_ids <= meta["doc_max"][0]).sum())
