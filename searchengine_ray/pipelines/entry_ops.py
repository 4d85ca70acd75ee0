"""Driver-contract callables for the training-data-pipeline operators.

Every entry matches oracle/sql_ops.py exactly (the minhash / simhash /
fingerprint hashes are poly_hash_u64 + splitmix64, reproduced in
HUGEINT SQL); pytest additionally covers the dedup family against
planted ground truth.
"""

from __future__ import annotations

import pyarrow as pa

from . import analysis
from . import ann
from . import conversations
from . import dedup
from . import events
from ..stages.multimodal import multimodal_meta, resized_meta, sample_frames


def _cast_int64(ds, cols):
    def fix(t: pa.Table) -> pa.Table:
        for c in cols:
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pa.compute.cast(t[c], pa.int64()))
        return t

    return ds.map_batches(fix, batch_format="pyarrow")


def q_token_count_by_source(sf_dir: str):
    return analysis.token_count_by_source(sf_dir)


def q_quality_scores(sf_dir: str):
    return analysis.quality_scores(sf_dir)


def q_lang_id(sf_dir: str):
    return analysis.lang_id(sf_dir)


def q_fingerprints(sf_dir: str):
    return analysis.fingerprints(sf_dir)


def q_repetition_stats(sf_dir: str):
    # pin the schema: a Dataset whose blocks are all empty loses it
    # through to_pandas() (q_dup_spans precedent)
    from .dedup import _collect_table

    return _collect_table(analysis.repetition_stats(sf_dir), analysis._REP_SCHEMA)


def q_dedup_exact(sf_dir: str):
    return _cast_int64(dedup.dedup_exact(sf_dir), ["keep_doc_id"])


def q_ngram_jaccard_pairs(sf_dir: str):
    # uncapped: the driver gate is exact vs the all-pairs SQL oracle (the
    # capped default is the production/scale setting, not the parity one)
    return dedup.ngram_jaccard_pairs(sf_dir, threshold=0.8, max_block=10**9)


def q_minhash_lsh_pairs(sf_dir: str):
    # effectively-uncapped blocks: the SQL oracle has no hot-bucket drop
    return dedup.minhash_lsh_pairs(sf_dir, verify=True, max_block=10**6)


def q_minhash_verified_pairs(sf_dir: str):
    # effectively-uncapped blocks for the same oracle-parity reason
    return dedup.minhash_verified_pairs(sf_dir, threshold=0.8, max_block=10**6)


def q_simhash_pairs(sf_dir: str):
    # max_hamming=3 keeps the 16-bit-band blocking lossless (pigeonhole
    # over 4 bands), so the all-pairs SQL oracle is value-identical
    return dedup.simhash_pairs(sf_dir, max_block=10**6)


def q_ann_cosine_topk(sf_dir: str):
    return ann.brute_force_topk(sf_dir, n_queries=5, k=10)


def q_ann_ivf_topk(sf_dir: str):
    return ann.ivf_topk(sf_dir, n_queries=5, k=10)


def q_ann_ivf_partitioned(sf_dir: str):
    """Probe-pruned search over the persisted cluster-partitioned index."""
    import os

    # cache key includes the source file's size+mtime so a regenerated
    # corpus at the same path can never serve stale clusters, plus a
    # layout version (v2: medoid quantizer) so quantizer changes rebuild
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    tag = os.path.normpath(sf_dir).replace("/", "_").strip("_")
    ivf_dir = f"/tmp/searchengine_ray_ivf_v2_{tag}_{st.st_size}_{int(st.st_mtime)}"
    if not os.path.exists(os.path.join(ivf_dir, "centroids.json")):
        ann.ivf_build(sf_dir, ivf_dir)
    qids, qmat = ann.load_queries(sf_dir, 5)
    return ann.ivf_search(ivf_dir, qids, qmat, k=10)


def q_embedding_dup_pairs(sf_dir: str):
    return ann.embedding_dup_pairs(sf_dir, max_id=300, threshold=0.35)


def q_stratified_sample(sf_dir: str):
    from . import sampling

    return sampling.stratified_sample(
        sf_dir, {"src0": 0.5, "src1": 0.25, "src2": 1.0}, default=0.1
    )


def q_pack_sequences(sf_dir: str):
    from . import sampling

    return sampling.pack_sequences(sf_dir, budget=512)


def q_curation(sf_dir: str):
    from . import curation

    return curation.curate(sf_dir, langs=("en",), min_quality=0.55)


def q_decontaminate(sf_dir: str):
    from . import curation
    from .dedup import _collect_table

    # collect with an EXPLICIT schema: the contamination report is tiny
    # by construction, and a Dataset whose blocks are all empty loses
    # its schema through to_pandas() (observed at sf0.1, where no doc
    # shares an 8-gram with the eval slice) — the driver compare needs
    # (doc_id, n_hits) either way
    return _collect_table(
        curation.decontaminate(sf_dir, eval_max_id=10, n=8),
        pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())]),
    )


def q_multimodal_meta(sf_dir: str):
    return multimodal_meta(sf_dir)


def q_multimodal_resize(sf_dir: str):
    return resized_meta(sf_dir, max_side=256)


def q_multimodal_frames(sf_dir: str):
    return sample_frames(sf_dir, frame_size=256, every=2)


def q_conversation_stats(sf_dir: str):
    return conversations.conversation_stats(sf_dir)


def q_conversation_text(sf_dir: str):
    return conversations.conversation_text(sf_dir)


def q_events_windowed(sf_dir: str):
    return events.events_windowed(sf_dir)


def q_user_sessions(sf_dir: str):
    return events.user_sessions(sf_dir)


def q_tfidf_keywords(sf_dir: str):
    return analysis.tfidf_keywords(sf_dir, k=5)


def q_lm_score(sf_dir: str):
    return analysis.lm_score(sf_dir)


def q_srp_dup_pairs(sf_dir: str):
    return ann.srp_dup_pairs(sf_dir)


def q_embedding_clusters(sf_dir: str):
    return ann.embedding_clusters(sf_dir)


def q_dup_spans(sf_dir: str):
    from .dedup import DUP_SPANS_SCHEMA, _collect_table

    # explicit schema: a corpus with no 5-gram window anywhere yields a
    # zero-block Dataset that would otherwise lose its schema through
    # to_pandas() (the q_decontaminate precedent)
    return _collect_table(dedup.dup_spans(sf_dir, n=5), DUP_SPANS_SCHEMA)


def q_source_overlap(sf_dir: str):
    from .dedup import SOURCE_OVERLAP_SCHEMA, _collect_table

    return _collect_table(
        dedup.source_overlap(sf_dir, n=5), SOURCE_OVERLAP_SCHEMA)


def q_budget_sample(sf_dir: str):
    from . import sampling

    return sampling.budget_sample(sf_dir, {"src0": 800, "src1": 400}, default=200)


def q_dedup_clusters(sf_dir: str):
    return dedup.dedup_clusters(sf_dir, threshold=0.8)


def q_redact_pii(sf_dir: str):
    from . import curation

    return curation.redact_pii(sf_dir)


def q_asof_join(sf_dir: str):
    # collected through _collect_table so an input with no left/right
    # events still reports the typed schema (the q_dup_spans precedent —
    # the driver compare materializes the result regardless)
    from . import joins
    from .dedup import _collect_table

    return _collect_table(joins.asof_prior_event(sf_dir), joins.ASOF_SCHEMA)


def q_range_join(sf_dir: str):
    from . import joins
    from .dedup import _collect_table

    return _collect_table(joins.follow_window_stats(sf_dir), joins.FOLLOW_SCHEMA)


OPS_QUERIES = {
    "token_count_by_source": q_token_count_by_source,
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "repetition_stats": q_repetition_stats,
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "minhash_verified_pairs": q_minhash_verified_pairs,
    "simhash_pairs": q_simhash_pairs,
    "dedup_clusters": q_dedup_clusters,
    "dup_spans": q_dup_spans,
    "tfidf_keywords": q_tfidf_keywords,
    "lm_score": q_lm_score,
    "srp_dup_pairs": q_srp_dup_pairs,
    "budget_sample": q_budget_sample,
    "embedding_clusters": q_embedding_clusters,
    "source_overlap": q_source_overlap,
    "redact_pii": q_redact_pii,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_partitioned": q_ann_ivf_partitioned,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "curation": q_curation,
    "decontaminate": q_decontaminate,
    "stratified_sample": q_stratified_sample,
    "pack_sequences": q_pack_sequences,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frames": q_multimodal_frames,
    "conversation_stats": q_conversation_stats,
    "conversation_text": q_conversation_text,
    "events_windowed": q_events_windowed,
    "user_sessions": q_user_sessions,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
}
