"""DuckDB oracle SQL for the search-core pipelines.

Each query here is the ANSI-SQL twin of a ``queries()`` callable in
``__ray_entry__``: same derived transcript table (TRANSCRIPTS_CTE), same
tokenizer (sql_tokens_cte == functions.tokenize.simple_tokenize_flat),
same scoring formulas as pipelines/search.py, same explicit rounding
(functions.rounding) and same deterministic ordering — so the driver's
row-count/schema/value-hash comparison is exact.
"""

from __future__ import annotations

from ..functions.rounding import sql_round_half_up
from ..functions.tokenize import sql_tokens_cte
from ..sources.transcripts import N_CONVS, TRANSCRIPTS_CTE

# BM25 constants — reference Part C/ranker.py:62 (k=3, b=0.6); blend
# weights reference ranker.py:32.
_NTF = "(tf.tf::DOUBLE / ds.doc_len)"
_BM25_TERM = (
    f"log2(s.n_docs::DOUBLE / d.df) * ({_NTF} * ({_NTF} * 4.0))"
    f" / ({_NTF} + 3.0 * (1 - 0.6 + 0.6 * ds.doc_len / s.avgdl))"
)
_INNER_TERM = f"{_NTF} * log10(s.n_docs::DOUBLE / d.df)"

def _search_prefix(lemma: bool = False) -> str:
    """The shared CTE prefix (transcripts → tokens → tf/docstats/stats/df).
    With ``lemma=True`` the token stream is lemma-folded through the
    vendored rule lemmatizer's SQL twin (P17, ``simple_lemma`` profile)
    before tf — the exact order the engine applies it in
    ``TokenizeStage._simple_flat``."""
    term_src = "tokens"
    lemma_cte = ""
    if lemma:
        from ..functions.lemmatizer import sql_lemma_expr

        term_src = "ltokens"
        lemma_cte = f""",
ltokens AS (
    SELECT conv_id, turn_idx, {sql_lemma_expr('term')} AS term FROM tokens
)"""
    return (
        "WITH "
        + TRANSCRIPTS_CTE.strip().rstrip(",")
        + ",\n"
        + sql_tokens_cte("transcripts").strip()
        + lemma_cte
        + f""",
tf AS (
    SELECT conv_id, turn_idx, term, count(*)::BIGINT AS tf
    FROM {term_src} GROUP BY conv_id, turn_idx, term
),
docstats AS (
    SELECT conv_id, turn_idx, sum(tf)::BIGINT AS doc_len,
           count(*)::BIGINT AS n_terms, max(tf)::BIGINT AS max_tf,
           sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)::BIGINT AS n_singleton
    FROM tf GROUP BY conv_id, turn_idx
),
stats AS (
    SELECT count(*)::BIGINT AS n_docs, sum(doc_len)::BIGINT AS total_len,
           sum(doc_len)::DOUBLE / count(*) AS avgdl
    FROM docstats
),
df AS (
    SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
    FROM tf GROUP BY term
)
"""
    )


SEARCH_PREFIX = _search_prefix()

# The fixed conformance query (all terms distinct, none stopworded, so
# every q_tf = 1 — mirrors reference searcher.py:69-72).
SEARCH_QUERY_TEXT = "spark join fast table"
_QTERMS = ", ".join(f"('{t}')" for t in SEARCH_QUERY_TEXT.split())

# P17 conformance query: inflected forms that only match through the
# lemmatizer ("sparks"→spark, "joining"→join, "tables"→table) plus one
# exception-table hit ("data"→datum, which also folds the DOC tokens).
LEMMA_QUERY_TEXT = "sparks joining tables data"

# Q15/Q16 synonym expansion twin: q_expanded_search expands with
# SynonymExpansion({"spark": ["stream"], "table": ["row"]}, weight=0.2).
# Expansion weights scale ONLY the inner-product term (q_tf factor,
# ranker.py:45-59); BM25 has no q_tf factor.
_QTERMS_EXPANDED = ", ".join(
    f"('{t}', {w})"
    for t, w in (("spark", 1.0), ("join", 1.0), ("fast", 1.0),
                 ("table", 1.0), ("stream", 0.2), ("row", 0.2))
)

_CAND = f"""
qterms(term) AS (VALUES {_QTERMS}),
cand AS (
    SELECT tf.conv_id, tf.turn_idx,
           sum({_BM25_TERM}) AS bm25,
           sum({_INNER_TERM}) AS inner_p
    FROM tf
    JOIN qterms q ON tf.term = q.term
    JOIN df d ON d.term = tf.term
    JOIN docstats ds ON ds.conv_id = tf.conv_id AND ds.turn_idx = tf.turn_idx
    CROSS JOIN stats s
    GROUP BY tf.conv_id, tf.turn_idx
)
"""


# conjunctive variant: only docs matching EVERY resolved query term
# (count(*) over the tf join = matched-term count; the subquery counts
# the query terms that exist in the corpus at all, = Ray's resolved set)
_CAND_ALL = f"""
qterms(term) AS (VALUES {_QTERMS}),
cand AS (
    SELECT tf.conv_id, tf.turn_idx,
           sum({_BM25_TERM}) AS bm25,
           sum({_INNER_TERM}) AS inner_p
    FROM tf
    JOIN qterms q ON tf.term = q.term
    JOIN df d ON d.term = tf.term
    JOIN docstats ds ON ds.conv_id = tf.conv_id AND ds.turn_idx = tf.turn_idx
    CROSS JOIN stats s
    GROUP BY tf.conv_id, tf.turn_idx
    HAVING count(*) = (SELECT count(*) FROM qterms q2 JOIN df d2 ON d2.term = q2.term)
)
"""

_CAND_WEIGHTED = f"""
qterms(term, w) AS (VALUES {_QTERMS_EXPANDED}),
cand AS (
    SELECT tf.conv_id, tf.turn_idx,
           sum({_BM25_TERM}) AS bm25,
           sum(q.w * {_INNER_TERM}) AS inner_p
    FROM tf
    JOIN qterms q ON tf.term = q.term
    JOIN df d ON d.term = tf.term
    JOIN docstats ds ON ds.conv_id = tf.conv_id AND ds.turn_idx = tf.turn_idx
    CROSS JOIN stats s
    GROUP BY tf.conv_id, tf.turn_idx
)
"""


def _topk_sql(score_expr: str, k: int = 10, extra_join: str = "", where: str = "",
              cand_cte: str | None = None) -> str:
    return (
        SEARCH_PREFIX
        + ", "
        + (cand_cte if cand_cte is not None else _CAND)
        + f"""
SELECT c.conv_id, c.turn_idx, {sql_round_half_up(score_expr, 4)} AS score
FROM cand c {extra_join}
{where}
ORDER BY floor(({score_expr}) * 1000000 + 0.5) DESC, c.conv_id, c.turn_idx
LIMIT {k}
"""
    )


_DW = f"""
dw AS (
    SELECT tf.conv_id, tf.turn_idx,
           floor(sum(pow({_INNER_TERM}, 2)) * 1000 + 0.5) / 1000 AS w2
    FROM tf
    JOIN df d ON d.term = tf.term
    JOIN docstats ds ON ds.conv_id = tf.conv_id AND ds.turn_idx = tf.turn_idx
    CROSS JOIN stats s
    GROUP BY tf.conv_id, tf.turn_idx
)
"""

# Part A blend (Part A/ranker.py:26): 0.5·cosine + 0.5·inner; cosine =
# inner / sqrt(Σw²_doc · Σq_tf²).  Σq_tf² counts RESOLVED terms (q_tf=1
# each): the engine sums over parse_query output, which drops
# dictionary-absent terms, so a hard-coded 4 would break on any corpus
# missing one of the fixed query's terms.
_PART_A_SCORE = (
    "0.5 * (CASE WHEN w.w2 > 0 THEN c.inner_p / sqrt(w.w2 * "
    "(SELECT count(*) FROM qterms q2 JOIN df d2 ON d2.term = q2.term)) "
    "ELSE 0 END)"
    " + 0.5 * c.inner_p"
)


def _lemma_search_sql() -> str:
    """blend top-10 on the lemma-folded index (simple_lemma profile):
    the whole prefix re-derives tf/df over lemmatized tokens and the
    query terms pass through the same SQL lemma expression."""
    from ..functions.lemmatizer import sql_lemma_expr

    qvals = ", ".join(f"('{t}')" for t in LEMMA_QUERY_TEXT.split())
    cand = f"""
qraw(raw) AS (VALUES {qvals}),
qterms AS (SELECT {sql_lemma_expr('raw')} AS term FROM qraw),
cand AS (
    SELECT tf.conv_id, tf.turn_idx,
           sum({_BM25_TERM}) AS bm25,
           sum({_INNER_TERM}) AS inner_p
    FROM tf
    JOIN qterms q ON tf.term = q.term
    JOIN df d ON d.term = tf.term
    JOIN docstats ds ON ds.conv_id = tf.conv_id AND ds.turn_idx = tf.turn_idx
    CROSS JOIN stats s
    GROUP BY tf.conv_id, tf.turn_idx
)
"""
    blend = "0.9 * c.bm25 + 0.1 * c.inner_p"
    return (
        _search_prefix(lemma=True)
        + ", "
        + cand
        + f"""
SELECT c.conv_id, c.turn_idx, {sql_round_half_up(blend, 4)} AS score
FROM cand c
ORDER BY floor(({blend}) * 1000000 + 0.5) DESC, c.conv_id, c.turn_idx
LIMIT 10
"""
    )


def search_core_sql() -> dict[str, str]:
    blend = "0.9 * c.bm25 + 0.1 * c.inner_p"
    part_a = (
        SEARCH_PREFIX + ", " + _CAND + ", " + _DW
        + f"""
SELECT c.conv_id, c.turn_idx, {sql_round_half_up(_PART_A_SCORE, 4)} AS score
FROM cand c JOIN dw w ON w.conv_id = c.conv_id AND w.turn_idx = c.turn_idx
ORDER BY floor(({_PART_A_SCORE}) * 1000000 + 0.5) DESC, c.conv_id, c.turn_idx
LIMIT 10
"""
    )
    return {
        "part_a_blend_topk": part_a,
        "build_doc_stats": SEARCH_PREFIX
        + "SELECT conv_id, turn_idx, doc_len, n_terms, max_tf, n_singleton FROM docstats",
        "build_term_stats": SEARCH_PREFIX + "SELECT term, df, cf FROM df",
        "corpus_stats": SEARCH_PREFIX
        + f"""SELECT n_docs, total_len, {sql_round_half_up('avgdl', 6)} AS avgdl,
              (SELECT count(*) FROM df)::BIGINT AS n_terms FROM stats""",
        "top_terms": SEARCH_PREFIX
        + "SELECT term, df, cf FROM df ORDER BY df DESC, term LIMIT 20",
        "postings_sample": SEARCH_PREFIX
        + """SELECT term, conv_id, turn_idx, tf FROM tf
             WHERE term IN ('spark', 'merge', 'window', 'dup')""",
        "bm25_topk": _topk_sql("c.bm25"),
        "expanded_search": _topk_sql(blend, cand_cte=_CAND_WEIGHTED),
        "conjunctive_topk": _topk_sql(blend, cand_cte=_CAND_ALL),
        "context_windows": SEARCH_PREFIX + ", " + _CAND + f""",
top3 AS (
    SELECT c.conv_id, c.turn_idx
    FROM cand c
    QUALIFY row_number() OVER (
        ORDER BY floor(({blend}) * 1000000 + 0.5) DESC, c.conv_id, c.turn_idx
    ) <= 3)
SELECT t.conv_id, h.turn_idx AS hit_turn_idx, t.turn_idx, t.role, t.text
FROM top3 h
JOIN transcripts t ON t.conv_id = h.conv_id
                  AND abs(t.turn_idx - h.turn_idx) <= 1
""",
        "embedding_rerank_topk": SEARCH_PREFIX + ", " + _CAND + f""",
top20 AS (
    SELECT c.conv_id, c.turn_idx
    FROM cand c
    QUALIFY row_number() OVER (
        ORDER BY floor(({blend}) * 1000000 + 0.5) DESC, c.conv_id, c.turn_idx
    ) <= 20),
docs AS (
    SELECT conv_id, turn_idx,
           (turn_idx * {N_CONVS} + CAST(substr(conv_id, 6) AS BIGINT)) AS src_doc
    FROM top20),
ranked1 AS (
    SELECT c.conv_id, c.turn_idx
    FROM cand c
    ORDER BY floor(({blend}) * 1000000 + 0.5) DESC, c.conv_id, c.turn_idx
    LIMIT 1),
qv AS (
    SELECT CAST(e.embedding AS DOUBLE[]) AS qe
    FROM ranked1 r
    JOIN embeddings e
      ON e.vec_id = r.turn_idx * {N_CONVS} + CAST(substr(r.conv_id, 6) AS BIGINT))
SELECT d.conv_id, d.turn_idx,
       {sql_round_half_up('list_cosine_similarity(qv.qe, CAST(e.embedding AS DOUBLE[]))', 4)} AS cos
FROM docs d JOIN embeddings e ON e.vec_id = d.src_doc CROSS JOIN qv
ORDER BY floor(list_cosine_similarity(qv.qe, CAST(e.embedding AS DOUBLE[])) * 1000000 + 0.5) DESC,
         d.conv_id, d.turn_idx
LIMIT 10
""",
        # Q12 rerank twin: word w = embeddings row vec_id = rank of w in
        # the sorted vocabulary (the engine writes the same mapping
        # through vectors_real.txt + the S5 text loader); doc vector =
        # Σ tf·vec/doc_len over ALL the doc's terms; final = 0.95·
        # (inv-euclid/max) + 0.05·(score/max) over the blend top-20.
        "rerank_search": SEARCH_PREFIX + ", " + _CAND + f""",
vocab AS (
    SELECT term, row_number() OVER (ORDER BY term) - 1 AS r FROM df),
wv AS (
    SELECT v.term, CAST(e.embedding AS DOUBLE[]) AS vec
    FROM vocab v JOIN embeddings e ON e.vec_id = v.r),
dims AS (
    SELECT unnest(range(1, len((SELECT embedding FROM embeddings LIMIT 1)) + 1)) AS pos),
top20 AS (
    SELECT c.conv_id, c.turn_idx, ({blend}) AS s
    FROM cand c
    QUALIFY row_number() OVER (
        ORDER BY floor(({blend}) * 1000000 + 0.5) DESC, c.conv_id, c.turn_idx
    ) <= 20),
dvec AS (
    SELECT tf.conv_id, tf.turn_idx, d.pos,
           sum(tf.tf * wv.vec[d.pos]) / max(ds.doc_len) AS dval
    FROM tf
    JOIN top20 t ON t.conv_id = tf.conv_id AND t.turn_idx = tf.turn_idx
    JOIN wv ON wv.term = tf.term
    JOIN docstats ds ON ds.conv_id = tf.conv_id AND ds.turn_idx = tf.turn_idx
    CROSS JOIN dims d
    GROUP BY tf.conv_id, tf.turn_idx, d.pos),
qv AS (
    -- divide by the RESOLVED term count: the engine means the query
    -- vector over parse_query output, which drops dictionary-absent
    -- terms (scale-dependent: all 4 terms exist at the shipped SFs)
    SELECT d.pos, sum(wv.vec[d.pos])
           / (SELECT count(*) FROM qterms q2 JOIN df d2 ON d2.term = q2.term) AS qval
    FROM qterms q JOIN wv ON wv.term = q.term CROSS JOIN dims d
    GROUP BY d.pos),
dist AS (
    SELECT v.conv_id, v.turn_idx, sqrt(sum(pow(v.dval - q.qval, 2))) AS dist
    FROM dvec v JOIN qv q ON q.pos = v.pos
    GROUP BY v.conv_id, v.turn_idx),
finals AS (
    SELECT t.conv_id, t.turn_idx,
           0.95 * ((1.0 / greatest(d.dist, 1e-12))
                   / max(1.0 / greatest(d.dist, 1e-12)) OVER ())
         + 0.05 * (t.s / max(t.s) OVER ()) AS final
    FROM top20 t JOIN dist d ON d.conv_id = t.conv_id AND d.turn_idx = t.turn_idx)
SELECT conv_id, turn_idx, {sql_round_half_up('final', 4)} AS score
FROM finals
ORDER BY floor(final * 1000000 + 0.5) DESC, conv_id, turn_idx
""",
        "conversation_search": SEARCH_PREFIX + ", " + _CAND + f""",
scored AS (
    SELECT c.conv_id, c.turn_idx, ({blend}) AS s FROM cand c),
agg AS (
    SELECT conv_id, max(floor(s * 1000000 + 0.5)) AS best_r,
           count(*)::BIGINT AS n_turns_matched
    FROM scored GROUP BY conv_id),
best AS (
    SELECT conv_id, turn_idx, s,
           row_number() OVER (PARTITION BY conv_id
               ORDER BY floor(s * 1000000 + 0.5) DESC, turn_idx) AS rn
    FROM scored)
SELECT a.conv_id, b.turn_idx AS best_turn_idx, a.n_turns_matched,
       {sql_round_half_up('b.s', 4)} AS score
FROM agg a JOIN best b ON b.conv_id = a.conv_id AND b.rn = 1
ORDER BY a.best_r DESC, a.conv_id
LIMIT 10
""",
        "inner_topk": _topk_sql("c.inner_p"),
        "blend_topk": _topk_sql(blend),
        "lemma_search": _lemma_search_sql(),
        "role_filter_search": _topk_sql(
            blend,
            extra_join="JOIN transcripts t ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx",
            where="WHERE t.role = 'user'",
        ),
        # BM25F-style field weighting: role weight (user 1.5 / assistant
        # 1.0 / tool 0.25 — entry_queries.ROLE_BOOST) scales the turn score
        "role_boost_search": _topk_sql(
            f"(CASE t.role WHEN 'user' THEN 1.5 WHEN 'tool' THEN 0.25 ELSE 1.0 END) * ({blend})",
            extra_join="JOIN transcripts t ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx",
        ),
        "tfidf_doc_weights": SEARCH_PREFIX
        + f"""SELECT tf.conv_id, tf.turn_idx,
              {sql_round_half_up(f'sum(pow({_INNER_TERM}, 2))', 3)} AS doc_weight_sq
              FROM tf
              JOIN df d ON d.term = tf.term
              JOIN docstats ds ON ds.conv_id = tf.conv_id AND ds.turn_idx = tf.turn_idx
              CROSS JOIN stats s
              GROUP BY tf.conv_id, tf.turn_idx""",
    }
