"""DuckDB oracle SQL for the training-data-pipeline operators
(text analysis, dedup, similarity search, multimodal metadata).

Exact twins of the Ray pipelines in pipelines/analysis.py, dedup.py,
ann.py and stages/multimodal.py — same tokenization, same closed-form
scores, same explicit rounding, same thresholds.  Operators whose
semantics are not SQL-expressible (minhash-LSH, simhash, IVF,
fingerprints) intentionally have no entry here; the driver records a
rows-only check and pytest covers them against planted ground truth.
"""

from __future__ import annotations

from ..functions.rounding import sql_round_half_up
from ..functions.tokenize import STOPWORDS_SIMPLE
from ..pipelines.analysis import CJK_RE, LANG_MARKERS
from ..sources.transcripts import TRANSCRIPTS_CTE

_WITH_TRANSCRIPTS = "WITH " + TRANSCRIPTS_CTE.strip()

_STOP = ", ".join(f"'{w}'" for w in STOPWORDS_SIMPLE)
_SPLIT = "regexp_split_to_array(lower(text), '[^a-z0-9]+')"
_WORDS = f"list_filter({_SPLIT}, x -> len(x) >= 1)"


def _marker_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])


# medoid-quantizer IVF twin (ivf_topk defaults: n_queries=5, k=10,
# n_clusters=16, nprobe=4, seed=99; SAMPLE_A/SAMPLE_M from pipelines/ann.py)
_IVF_SQL = """
    WITH cent AS (
        SELECT CAST(embedding AS DOUBLE[]) AS ce,
               row_number() OVER (
                   ORDER BY (vec_id * 2654435761 + 99) % 4294967296) - 1 AS cnum
        FROM embeddings
        ORDER BY (vec_id * 2654435761 + 99) % 4294967296
        LIMIT 16),
    q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id < 5),
    probes AS (
        SELECT query_id, cnum FROM q, cent
        QUALIFY row_number() OVER (
            PARTITION BY query_id
            ORDER BY floor(list_cosine_similarity(qe, ce) * 1000000 + 0.5) DESC,
                     cnum) <= 4),
    assign AS (
        SELECT e.vec_id, cnum FROM embeddings e, cent
        QUALIFY row_number() OVER (
            PARTITION BY e.vec_id
            ORDER BY floor(list_cosine_similarity(
                         CAST(e.embedding AS DOUBLE[]), ce) * 1000000 + 0.5) DESC,
                     cnum) = 1)
    SELECT p.query_id, a.vec_id,
           floor(list_cosine_similarity(qe, CAST(e.embedding AS DOUBLE[]))
                 * 10000 + 0.5) / 10000 AS cos
    FROM probes p
    JOIN assign a USING (cnum)
    JOIN embeddings e ON e.vec_id = a.vec_id
    JOIN q ON q.query_id = p.query_id
    WHERE a.vec_id != p.query_id
    QUALIFY row_number() OVER (
        PARTITION BY p.query_id
        ORDER BY floor(list_cosine_similarity(qe, CAST(e.embedding AS DOUBLE[]))
                       * 1000000 + 0.5) DESC,
                 a.vec_id) <= 10
"""


def ops_sql() -> dict[str, str]:
    r4 = sql_round_half_up
    # minhash_verified_pairs shares this oracle: LSH only PROPOSES
    # candidates there, the filter is the same exact n-gram Jaccard, and
    # at 128 hashes / 32 bands candidate recall for J≥0.8 is complete
    # (miss probability (1−0.8⁴)³² ≈ 5·10⁻⁸ per pair)
    ngram_jaccard = f"""
            WITH words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
            idx AS (
                SELECT doc_id, w, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS i
                FROM words),
            g AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ngram
                FROM idx),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS n FROM g GROUP BY doc_id),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::DOUBLE AS inter
                FROM g a JOIN g b ON a.ngram = b.ngram AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   {sql_round_half_up("inter / (sa.n + sb.n - inter)", 4)} AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.doc_id = pairs.doc_a
            JOIN sizes sb ON sb.doc_id = pairs.doc_b
            WHERE inter / (sa.n + sb.n - inter) >= 0.8
        """
    quality_raw = (
        "0.5 * least(1.0, n_tokens / 50.0) "
        "+ 0.3 * (1 - CASE WHEN n_tokens > 0 THEN stop_hits::DOUBLE / greatest(n_tokens, 1) ELSE 0 END) "
        "+ 0.2 * (1 - CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / greatest(n_chars, 1) ELSE 0 END)"
    )
    return {
        # ---- text analysis ---------------------------------------------
        "token_count_by_source": f"""
            WITH t AS (
                SELECT doc_id, source, n_chars, len({_WORDS})::BIGINT AS n_tokens
                FROM documents)
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_tokens)::BIGINT AS total_tokens,
                   sum(n_chars)::BIGINT AS total_chars
            FROM t GROUP BY source
        """,
        "quality_scores": f"""
            WITH t AS (
                SELECT doc_id,
                       len({_WORDS})::BIGINT AS n_tokens,
                       len(list_filter({_SPLIT}, x -> x IN ({_STOP})))::BIGINT AS stop_hits,
                       length(text)::BIGINT AS n_chars,
                       length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::BIGINT AS n_punct
                FROM documents)
            SELECT doc_id, n_tokens,
                   {r4("CASE WHEN n_tokens > 0 THEN stop_hits::DOUBLE / greatest(n_tokens, 1) ELSE 0 END", 4)} AS stop_ratio,
                   {r4("CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / greatest(n_chars, 1) ELSE 0 END", 4)} AS punct_ratio,
                   {r4(quality_raw, 4)} AS quality
            FROM t
        """,
        "lang_id": f"""
            WITH t AS (
                SELECT doc_id,
                       len(list_filter({_SPLIT}, x -> x IN ({_marker_list('en')})))::BIGINT AS en_hits,
                       len(list_filter({_SPLIT}, x -> x IN ({_marker_list('es')})))::BIGINT AS es_hits,
                       len(list_filter({_SPLIT}, x -> x IN ({_marker_list('de')})))::BIGINT AS de_hits,
                       len(list_filter({_SPLIT}, x -> x IN ({_marker_list('fr')})))::BIGINT AS fr_hits,
                       regexp_matches(text, '{CJK_RE}') AS has_cjk
                FROM documents)
            SELECT doc_id,
                   CASE WHEN has_cjk THEN 'zh'
                        WHEN en_hits >= greatest(es_hits, de_hits, fr_hits, 1) THEN 'en'
                        WHEN es_hits >= greatest(de_hits, fr_hits, 1) THEN 'es'
                        WHEN de_hits >= greatest(fr_hits, 1) THEN 'de'
                        WHEN fr_hits >= 1 THEN 'fr'
                        ELSE 'und' END AS pred_lang,
                   en_hits, es_hits, de_hits, fr_hits, has_cjk
            FROM t
        """,
        # ---- dedup ------------------------------------------------------
        "dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id)::BIGINT AS keep_doc_id,
                   count(*)::BIGINT AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "ngram_jaccard_pairs": ngram_jaccard,
        "minhash_verified_pairs": ngram_jaccard,
        # train/eval contamination: docs sharing any word-8-gram with the
        # eval set (doc_id < 10); n_hits = distinct shared grams
        "decontaminate": f"""
            WITH words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
            idx AS (
                SELECT doc_id, w, unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS i
                FROM words),
            g AS (
                SELECT DISTINCT doc_id,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                       || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
                       || ' ' || w[i+7] AS gram
                FROM idx),
            ev AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10)
            SELECT g.doc_id, count(*)::BIGINT AS n_hits
            FROM g JOIN ev ON ev.gram = g.gram
            WHERE g.doc_id >= 10
            GROUP BY 1
        """,
        # ---- training-mix operators ------------------------------------
        # deterministic affine-hash sampling: exact integer twin of
        # pipelines/sampling.py (SAMPLE_A = 2654435761, M = 2^32)
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE (doc_id::HUGEINT * 2654435761) % 4294967296 <
                  floor(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
                                    WHEN 'src2' THEN 1.0 ELSE 0.1 END
                        * 4294967296)::HUGEINT
        """,
        "pack_sequences": f"""
            WITH t AS (
                SELECT doc_id, len({_WORDS})::BIGINT AS n_tokens
                FROM documents)
            SELECT doc_id, n_tokens,
                   (COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    // 512)::BIGINT AS bin
            FROM t
        """,
        # ---- composed curation pipeline --------------------------------
        "curation": f"""
            WITH f AS (
                SELECT doc_id, md5(text) AS m,
                       len({_WORDS})::BIGINT AS n_tokens,
                       len(list_filter({_SPLIT}, x -> x IN ({_STOP})))::BIGINT AS stop_hits,
                       length(text)::BIGINT AS n_chars,
                       length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::BIGINT AS n_punct,
                       len(list_filter({_SPLIT}, x -> x IN ({_marker_list('en')})))::BIGINT AS en_hits,
                       len(list_filter({_SPLIT}, x -> x IN ({_marker_list('es')})))::BIGINT AS es_hits,
                       len(list_filter({_SPLIT}, x -> x IN ({_marker_list('de')})))::BIGINT AS de_hits,
                       len(list_filter({_SPLIT}, x -> x IN ({_marker_list('fr')})))::BIGINT AS fr_hits,
                       regexp_matches(text, '{CJK_RE}') AS has_cjk
                FROM documents),
            l AS (
                SELECT *, CASE WHEN has_cjk THEN 'zh'
                               WHEN en_hits >= greatest(es_hits, de_hits, fr_hits, 1) THEN 'en'
                               WHEN es_hits >= greatest(de_hits, fr_hits, 1) THEN 'es'
                               WHEN de_hits >= greatest(fr_hits, 1) THEN 'de'
                               WHEN fr_hits >= 1 THEN 'fr'
                               ELSE 'und' END AS pred_lang
                FROM f),
            keep AS (SELECT md5(text) AS m, min(doc_id) AS k
                     FROM documents GROUP BY 1)
            SELECT l.doc_id, l.pred_lang, l.n_tokens,
                   {r4(quality_raw, 4)} AS quality
            FROM l JOIN keep ON keep.m = l.m AND keep.k = l.doc_id
            WHERE l.pred_lang IN ('en') AND {r4(quality_raw, 4)} >= 0.55
        """,
        # ---- similarity search -----------------------------------------
        "ann_cosine_topk": f"""
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 5)
            SELECT query_id, vec_id,
                   {r4("list_cosine_similarity(qe, CAST(embedding AS DOUBLE[]))", 4)} AS cos
            FROM q, embeddings
            WHERE vec_id != query_id
            QUALIFY row_number() OVER (
                PARTITION BY query_id
                ORDER BY floor(list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) * 1000000 + 0.5) DESC,
                         vec_id) <= 10
        """,
        # IVF with the default medoid quantizer is fully SQL-expressible:
        # centroids = the 16 embedding rows with the smallest affine-hash
        # keys (same (vec_id*A+seed)%2^32 order as ann._sample_embeddings),
        # assignment/probes rank on floor(cos*1e6+0.5) with lowest-centroid
        # tie-break — the exact keys the Ray scorers use.  Both ivf entries
        # share it (ann_ivf_partitioned returns ivf_topk's answer from the
        # cluster-partitioned on-disk index).
        "ann_ivf_topk": _IVF_SQL,
        "ann_ivf_partitioned": _IVF_SQL,
        "embedding_dup_pairs": f"""
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings WHERE vec_id < 300)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   {r4("list_cosine_similarity(a.emb, b.emb)", 4)} AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
        """,
        # ---- conversation-level ----------------------------------------
        "conversation_stats": _WITH_TRANSCRIPTS
        + """
            SELECT conv_id, count(*)::BIGINT AS n_turns,
                   sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
                   sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT AS n_assistant,
                   sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)::BIGINT AS n_tool,
                   sum(length(text))::BIGINT AS total_chars
            FROM transcripts GROUP BY conv_id
        """,
        "conversation_text": _WITH_TRANSCRIPTS
        + """
            SELECT conv_id, count(*)::BIGINT AS n_turns,
                   string_agg(text, chr(10) ORDER BY turn_idx) AS full_text
            FROM transcripts GROUP BY conv_id
        """,
        # ---- stream-shaped (events) ------------------------------------
        "events_windowed": f"""
            SELECT event_type,
                   make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
                   count(*)::BIGINT AS n,
                   {r4('sum(value)', 4)} AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "user_sessions": """
            WITH o AS (
                SELECT user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END)::BIGINT AS n_sessions
            FROM o GROUP BY user_id
        """,
        # ---- multimodal -------------------------------------------------
        "multimodal_meta": """
            WITH m AS (
                SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
                       md5(text) AS payload_md5
                FROM documents)
            SELECT doc_id, n_bytes, payload_md5,
                   (n_bytes % 640 + 1)::BIGINT AS width,
                   ((n_bytes * 7) % 480 + 1)::BIGINT AS height
            FROM m
        """,
        "multimodal_resize": """
            WITH m AS (
                SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes
                FROM documents),
            d AS (
                SELECT doc_id, (n_bytes % 640 + 1)::BIGINT AS width,
                       ((n_bytes * 7) % 480 + 1)::BIGINT AS height
                FROM m),
            g AS (SELECT *, greatest(width, height) AS long_side FROM d)
            SELECT doc_id, width, height,
                   CASE WHEN long_side <= 256 THEN width
                        ELSE greatest(1, (width * 256) // long_side) END::BIGINT AS out_w,
                   CASE WHEN long_side <= 256 THEN height
                        ELSE greatest(1, (height * 256) // long_side) END::BIGINT AS out_h
            FROM g
        """,
        "multimodal_frames": """
            WITH m AS (
                SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes
                FROM documents),
            f AS (
                SELECT doc_id, n_bytes,
                       (n_bytes + 255) // 256 AS n_frames
                FROM m),
            s AS (
                SELECT doc_id, n_bytes,
                       unnest(range(0, ((n_frames + 1) // 2)::BIGINT)) AS local_idx
                FROM f)
            SELECT doc_id, (local_idx * 2)::BIGINT AS frame_idx,
                   (local_idx * 2 * 256)::BIGINT AS frame_off,
                   least(256, n_bytes - local_idx * 2 * 256)::BIGINT AS frame_len
            FROM s
        """,
    }
