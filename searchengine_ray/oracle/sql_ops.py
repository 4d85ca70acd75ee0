"""DuckDB oracle SQL for the training-data-pipeline operators
(text analysis, dedup, similarity search, multimodal metadata).

Exact twins of the Ray pipelines in pipelines/analysis.py, dedup.py,
ann.py and stages/multimodal.py — same tokenization, same closed-form
scores, same explicit rounding, same thresholds.  Since round 3 this
includes the hash-defined operators (fingerprints, minhash-LSH,
simhash): their string hash is poly_hash_u64, reproduced bit-exactly
in HUGEINT SQL below, so every entry is value-hash checked — none is
rows-only.
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
# n_clusters=16, nprobe=4, seed=99; SAMPLE_A/SAMPLE_M from functions/hashing.py)
_IVF_SQL = """
    WITH cent AS (
        SELECT CAST(embedding AS DOUBLE[]) AS ce,
               row_number() OVER (
                   ORDER BY (vec_id::HUGEINT * 2654435761 + 99) % 4294967296,
                            vec_id) - 1 AS cnum
        FROM embeddings
        ORDER BY (vec_id::HUGEINT * 2654435761 + 99) % 4294967296, vec_id
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


# --- shared HUGEINT mod-2^64 machinery -----------------------------------
#
# The engine's string/window hashes are numpy uint64 arithmetic
# (wrapping mul/add) finished with splitmix64.  DuckDB reproduces them
# bit-exactly in HUGEINT: all mod-2^64 reductions are bitwise AND masks
# (HUGEINT % is ~50× slower than &, measured), and the two ~2^63.6
# splitmix multipliers are split 32/32 so every intermediate stays
# inside signed-128-bit range (lo*M + ((hi*M) & (2^32-1)) << 32 < 2^97).

_M64 = "18446744073709551615::HUGEINT"   # 2^64 - 1 (AND mask == mod 2^64)
_M32 = "4294967295::HUGEINT"             # 2^32 - 1
_POLY_B = "1099511628211::HUGEINT"       # FNV prime 0x100000001B3


def _splitmix_ctes(pre: str, src: str, keys: str) -> str:
    """CTE chain ``pre1..pre6`` applying splitmix64 to column ``h`` of
    ``src`` (→ column ``z``), carrying ``keys`` through."""
    return f"""
    {pre}1 AS (SELECT {keys}, (h + 11400714819323198485::HUGEINT)
                              & {_M64} AS z FROM {src}),
    {pre}2 AS (SELECT {keys}, xor(z, z >> 30) AS z FROM {pre}1),
    {pre}3 AS (SELECT {keys},
                  ((z & {_M32}) * 13787848793156543929::HUGEINT
                   + (((z >> 32) * 13787848793156543929::HUGEINT)
                      & {_M32}) * 4294967296::HUGEINT)
                  & {_M64} AS z FROM {pre}2),
    {pre}4 AS (SELECT {keys}, xor(z, z >> 27) AS z FROM {pre}3),
    {pre}5 AS (SELECT {keys},
                  ((z & {_M32}) * 10723151780598845931::HUGEINT
                   + (((z >> 32) * 10723151780598845931::HUGEINT)
                      & {_M32}) * 4294967296::HUGEINT)
                  & {_M64} AS z FROM {pre}4),
    {pre}6 AS (SELECT {keys}, xor(z, z >> 31) AS z FROM {pre}5)"""


# signed int64 reinterpretation of a HUGEINT holding a u64 value
# (numpy's .view(np.int64) twin)
def _as_i64(col: str) -> str:
    return (f"CAST(CASE WHEN {col} >= 9223372036854775808::HUGEINT "
            f"THEN {col} - 18446744073709551616::HUGEINT "
            f"ELSE {col} END AS BIGINT)")


# utf8 bytes of a VARCHAR as a HUGEINT list, via the hex dump (DuckDB
# has no BLOB subscript).  strpos on '123456789ABCDEF' returns 0 for
# the missing '0' digit — exactly its value.
def _byte_list(hx: str, n: str) -> str:
    return f"""list_transform(range(1, {n} + 1),
            i -> CAST(strpos('123456789ABCDEF',
                             substring({hx}, CAST(2*i - 1 AS BIGINT), 1)) * 16
                    + strpos('123456789ABCDEF',
                             substring({hx}, CAST(2*i AS BIGINT), 1)) AS HUGEINT))"""


# poly_hash_u64's byte polynomial Σ byte_j·B^j mod 2^64 == Horner over
# the REVERSED byte list (functions/hashing.py::poly_hash_u64 twin,
# before the splitmix finalizer).  Empty byte list → 0, guarded with
# CASE because DuckDB's list_reduce ERRORS on empty input (COALESCE
# does not catch it).
def _poly_accum(bs: str) -> str:
    return (f"CASE WHEN len({bs}) = 0 THEN 0::HUGEINT "
            f"ELSE list_reduce(list_reverse({bs}), "
            f"(acc, x) -> (acc * {_POLY_B} + x) & {_M64}) END")


# Exact integer twin of pipelines/analysis.py::FingerprintStage — a
# winnowed rolling fingerprint over the document's utf-8 bytes:
#   window hash = 16-byte Horner polynomial (FNV base 0x100000001B3)
#                 mod 2^64, splitmix64-finalized;
#   fingerprint = min window hash (whole-doc Horner + splitmix for docs
#                 shorter than one window; 0 for empty docs),
#   reinterpreted as signed int64 (numpy's .view(np.int64)).
# NOTE the window Horner is MSB-first (H = (H·B + byte), bytes in
# order), unlike poly_hash_u64's LSB-first sum — mirror of the numpy.
_FINGERPRINT_SQL = f"""
    WITH raw AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents),
    bytes AS (
        SELECT doc_id, n, {_byte_list('hx', 'n')} AS bs
        FROM raw),
    win AS (
        SELECT doc_id,
               list_reduce(bs[CAST(s + 1 AS BIGINT) : CAST(s + 16 AS BIGINT)],
                           (acc, x) -> (acc * {_POLY_B} + x) & {_M64}) AS h
        FROM bytes, unnest(range(0, n - 15)) AS t(s)
        WHERE n >= 16),
    shorth AS (
        SELECT doc_id,
               list_reduce(bs, (acc, x) -> (acc * {_POLY_B} + x) & {_M64}) AS h
        FROM bytes WHERE n > 0 AND n < 16),
    allh AS (SELECT doc_id, h FROM win UNION ALL SELECT doc_id, h FROM shorth),
    {_splitmix_ctes('s', 'allh', 'doc_id').lstrip()},
    agg AS (SELECT doc_id, min(z) AS m FROM s6 GROUP BY doc_id),
    withempty AS (
        SELECT doc_id, m FROM agg
        UNION ALL
        SELECT doc_id, 0::HUGEINT AS m FROM bytes WHERE n = 0)
    SELECT doc_id, {_as_i64('m')} AS fingerprint
    FROM withempty
"""


# Exact twin of pipelines/dedup.py::simhash_batch + simhash_pairs at
# the entry defaults (max_hamming=3, unbounded max_block): 64-bit
# simhash over word unigrams (every occurrence votes ±1 per bit of its
# poly_hash_u64; votes > 0 set the bit; token-less docs sign 0), pairs
# at Hamming ≤ 3.  The engine blocks on 16-bit bands before verifying —
# lossless here by pigeonhole (3 differing bits cannot touch all 4
# bands), so the all-pairs SQL is value-identical.  bit_count/xor run
# on the signed-int64 reinterpretation (same bits).
_SIMHASH_SQL = f"""
    WITH words AS (SELECT doc_id, {{words}} AS w FROM documents),
    occ AS (SELECT doc_id, unnest(w) AS tok FROM words),
    t0 AS (SELECT doc_id,
            {_poly_accum("list_transform(range(1, length(tok) + 1), "
                         "i -> CAST(ascii(substring(tok, CAST(i AS BIGINT), 1))"
                         " AS HUGEINT))")} AS h
           FROM occ),
    {_splitmix_ctes('m', 't0', 'doc_id').lstrip()},
    votes AS (
        SELECT doc_id, b AS bit,
               sum(CASE WHEN (z >> b) & 1::HUGEINT = 1 THEN 1 ELSE -1 END) AS v
        FROM m6, unnest(range(0, 64)) AS t(b)
        GROUP BY doc_id, b),
    sigs AS (
        SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::HUGEINT << bit)
                                ELSE 0::HUGEINT END) AS s
        FROM votes GROUP BY doc_id
        UNION ALL
        SELECT doc_id, 0::HUGEINT FROM words WHERE len(w) = 0),
    sb AS (SELECT doc_id, {_as_i64('s')} AS s FROM sigs)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.s, b.s))::BIGINT AS hamming
    FROM sb a JOIN sb b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
"""


def _minhash_perm_values(n_hashes: int = 128, seed: int = 1234) -> str:
    """The MinHashStage permutation constants (numpy default_rng(seed),
    same draw order) as a SQL VALUES list ``(i, a, b)``."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**61, size=n_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**61, size=n_hashes, dtype=np.uint64)
    return ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(n_hashes))


# Exact twin of pipelines/dedup.py::minhash_lsh_pairs(verify=True) at
# the entry defaults (128 hashes / 32 bands of 4, threshold 0.7,
# shingle 3, unbounded max_block):
#   shingle = distinct word-3-gram strings (whole original text as the
#   single shingle when a doc has < 3 tokens);
#   minhash_i = min over shingles of splitmix64((poly_hash(g)·a_i + b_i)
#   mod 2^64)  [a_i < 2^61, h < 2^64 → product < 2^125, HUGEINT-safe];
#   candidates = pairs sharing one FULL band (segment equality — the
#   engine groups on a chained band hash whose collisions are ~2^-64,
#   the only, negligible, deviation);
#   est_jaccard = matching minhashes / 128 (≥ threshold), jaccard = the
#   verify=True exact string-set Jaccard, both round-half-up 4.
# MATERIALIZED hints matter: these CTEs are multi-referenced and DuckDB
# would otherwise inline (re-evaluate) them.
_MINHASH_SQL_TMPL = f"""
    WITH words AS (SELECT doc_id, text, {{words}} AS w FROM documents),
    idx AS (SELECT doc_id, w,
                   unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS i
            FROM words),
    g AS MATERIALIZED (
        SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
        FROM idx
        UNION ALL
        SELECT doc_id, text AS gram FROM words WHERE len(w) < 3),
    gdist AS MATERIALIZED (SELECT DISTINCT gram FROM g),
    gb AS (SELECT gram, hex(encode(gram)) AS hx,
                  octet_length(encode(gram)) AS nb
           FROM gdist),
    gh0 AS (SELECT gram, {_poly_accum(_byte_list('hx', 'nb'))} AS h FROM gb),
    {_splitmix_ctes('gm', 'gh0', 'gram').lstrip()},
    perm(i, pa, pb) AS (VALUES {{perm_vals}}),
    ph0 AS (SELECT gram, i,
                   (z * pa::HUGEINT + pb::HUGEINT) & {_M64} AS h
            FROM gm6, perm),
    {_splitmix_ctes('pm', 'ph0', 'gram, i').lstrip()},
    sigflat AS MATERIALIZED (
        SELECT doc_id, i, min(z) AS v
        FROM g JOIN pm6 USING (gram) GROUP BY doc_id, i),
    bandkey AS MATERIALIZED (
        SELECT doc_id, i // 4 AS band,
               CAST(list(v ORDER BY i) AS VARCHAR) AS key
        FROM sigflat GROUP BY doc_id, i // 4),
    cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bandkey a JOIN bandkey b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    estt AS (
        SELECT c.doc_a, c.doc_b,
               sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / 128.0 AS est
        FROM cand c
        JOIN sigflat sa ON sa.doc_id = c.doc_a
        JOIN sigflat sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
        GROUP BY 1, 2),
    kept AS MATERIALIZED (SELECT doc_a, doc_b, est FROM estt WHERE est >= 0.7),
    sizes AS MATERIALIZED (
        SELECT doc_id, count(*)::DOUBLE AS ns FROM g GROUP BY doc_id),
    inter AS (
        SELECT k.doc_a, k.doc_b, count(gb2.gram)::DOUBLE AS it
        FROM kept k
        LEFT JOIN g ga ON ga.doc_id = k.doc_a
        LEFT JOIN g gb2 ON gb2.doc_id = k.doc_b AND gb2.gram = ga.gram
        GROUP BY 1, 2)
    SELECT k.doc_a, k.doc_b,
           {{est_round}} AS est_jaccard,
           {{jac_round}} AS jaccard
    FROM kept k
    JOIN inter USING (doc_a, doc_b)
    JOIN sizes sa ON sa.doc_id = k.doc_a
    JOIN sizes sb ON sb.doc_id = k.doc_b
"""


# Exact twin of pipelines/ann.py::srp_dup_pairs at the entry defaults:
# Rademacher plane sign j,d = parity of splitmix64(seed + j·dim + d)
# (regenerated with the shared HUGEINT splitmix chain), signature bit j
# = (Σ_d emb[d]·sign ≥ 0), pairs at Hamming ≤ max_hamming over the
# nbits-bit signatures, exact cosine on the survivors.  The engine
# blocks on equal-width bit bands before verifying — lossless by
# pigeonhole when max_hamming < bands, so the all-pairs SQL is
# value-identical.
def _srp_sql(nbits: int = 32, dim: int = 64, seed: int = 7777,
             max_hamming: int = 7) -> str:
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    p0 AS (
        SELECT j, d, CAST({seed} + j * {dim} + d AS HUGEINT) AS h
        FROM range(0, {nbits}) t1(j), range(0, {dim}) t2(d)),
    {_splitmix_ctes('sp', 'p0', 'j, d').lstrip()},
    planes AS (
        SELECT j, d, CASE WHEN (z & 1::HUGEINT) = 1::HUGEINT
                          THEN 1.0 ELSE -1.0 END AS sgn
        FROM sp6),
    proj AS (
        SELECT vec_id, j, sum(emb[d + 1] * sgn) AS pr
        FROM e, planes GROUP BY 1, 2),
    sig AS (
        SELECT vec_id, sum(CASE WHEN pr >= 0 THEN (1::BIGINT << j)
                                ELSE 0::BIGINT END)::BIGINT AS s
        FROM proj GROUP BY 1)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           bit_count(xor(a.s, b.s))::BIGINT AS hamming,
           {sql_round_half_up("list_cosine_similarity(ea.emb, eb.emb)", 4)} AS cos
    FROM sig a
    JOIN sig b ON a.vec_id < b.vec_id
    JOIN e ea ON ea.vec_id = a.vec_id
    JOIN e eb ON eb.vec_id = b.vec_id
    WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
"""


def _redact_sql() -> str:
    """Chained regexp_replace twin of curation.redact_batch: counts are
    taken on the text as it stands BEFORE each replacement (same order),
    and both sides compile the same patterns with RE2."""
    from ..pipelines.curation import PII_PATTERNS

    cols, expr = [], "text"
    for name, pat, rep in PII_PATTERNS:
        cols.append(f"length(regexp_extract_all({expr}, '{pat}'))::BIGINT AS {name}")
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return (f"SELECT doc_id, {expr} AS clean_text, " + ", ".join(cols)
            + " FROM documents")


def _repetition_sql(ns: tuple[int, ...] = (2, 3)) -> str:
    """Gopher repetition filters twin of ``analysis.repetition_batch``:
    duplicate-line fraction (LF split, empty lines dropped, no trimming),
    duplicate-word-n-gram fraction and most-frequent-n-gram fraction per
    ``ns`` width — zero-denominator docs score 0.0, fractions 4dp
    half-up.  Grams run over the whole token stream (newlines are just
    separators), exactly like the engine."""
    ctes, cols, joins = [], [], []
    for gn in ns:
        cat = " || ' ' || ".join(f"w[i+{j}]" for j in range(gn))
        ctes.append(f"""
            idx{gn} AS (
                SELECT doc_id, w,
                       unnest(range(1, greatest(len(w) - {gn - 1}, 0) + 1)) AS i
                FROM words),
            g{gn} AS (SELECT doc_id, {cat} AS gram FROM idx{gn}),
            gc{gn} AS (SELECT doc_id, count(*)::BIGINT AS n_g,
                              count(DISTINCT gram)::BIGINT AS n_dg
                       FROM g{gn} GROUP BY 1),
            gt{gn} AS (SELECT doc_id, max(c)::BIGINT AS top_c FROM
                         (SELECT doc_id, gram, count(*)::BIGINT AS c
                          FROM g{gn} GROUP BY 1, 2) GROUP BY 1)""")
        # subtract-then-divide, NOT 1.0 - d/t: the engine computes
        # (total-distinct)/total, and the two float forms land on
        # opposite sides of the 4dp half-up floor for denominators
        # like 160 (1/160 rounds 0.0063 vs 0.0062)
        cols.append(f"""
                   COALESCE(gc{gn}.n_g, 0)::BIGINT AS n_{gn}grams,
                   {sql_round_half_up(f"CASE WHEN gc{gn}.n_g > 0 THEN (gc{gn}.n_g - gc{gn}.n_dg) / gc{gn}.n_g::DOUBLE ELSE 0.0 END", 4)} AS dup_{gn}gram_frac,
                   {sql_round_half_up(f"CASE WHEN gc{gn}.n_g > 0 THEN gt{gn}.top_c / gc{gn}.n_g::DOUBLE ELSE 0.0 END", 4)} AS top_{gn}gram_frac""")
        joins.append(f"""
            LEFT JOIN gc{gn} USING (doc_id)
            LEFT JOIN gt{gn} USING (doc_id)""")
    return f"""
            WITH l0 AS (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS line
                FROM documents),
            l1 AS (SELECT doc_id, line FROM l0 WHERE line <> ''),
            lc AS (SELECT doc_id, count(*)::BIGINT AS n_l,
                          count(DISTINCT line)::BIGINT AS n_dl
                   FROM l1 GROUP BY 1),
            words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
            {",".join(ctes)}
            SELECT d.doc_id,
                   COALESCE(lc.n_l, 0)::BIGINT AS n_lines,
                   {sql_round_half_up("CASE WHEN lc.n_l > 0 THEN (lc.n_l - lc.n_dl) / lc.n_l::DOUBLE ELSE 0.0 END", 4)} AS dup_line_frac,
                   {",".join(cols)}
            FROM documents d
            LEFT JOIN lc USING (doc_id)
            {"".join(joins)}
        """


def ops_sql() -> dict[str, str]:
    r4 = sql_round_half_up
    # minhash_verified_pairs shares this oracle: LSH only PROPOSES
    # candidates there, the filter is the same exact n-gram Jaccard, and
    # at 128 hashes / 32 bands candidate recall for J≥0.8 is complete
    # (miss probability (1−0.8⁴)³² ≈ 5·10⁻⁸ per pair)
    # word-3-gram J≥0.8 pair CTEs, shared by ngram_jaccard_pairs /
    # minhash_verified_pairs (final SELECT below) and the dedup_clusters
    # recursive closure (which uses the filtered pair set as edges)
    jpair_ctes = f"""words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
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
                GROUP BY 1, 2),
            jp AS MATERIALIZED (
                SELECT doc_a, doc_b,
                       inter / (sa.n + sb.n - inter) AS jraw
                FROM pairs
                JOIN sizes sa ON sa.doc_id = pairs.doc_a
                JOIN sizes sb ON sb.doc_id = pairs.doc_b
                WHERE inter / (sa.n + sb.n - inter) >= 0.8)"""
    ngram_jaccard = f"""
            WITH {jpair_ctes}
            SELECT doc_a, doc_b, {sql_round_half_up("jraw", 4)} AS jaccard
            FROM jp
        """
    # connected components over the J≥0.8 pair graph: recursive
    # reachability closure (cluster sizes are dup-group-sized, so the
    # closure is tiny), cluster_id = min reachable doc.  Twin of
    # dedup.dedup_clusters — parity rests on the same complete-recall
    # LSH argument as minhash_verified_pairs.
    dedup_clusters_sql = f"""
            WITH RECURSIVE {jpair_ctes},
            edges AS MATERIALIZED (
                SELECT doc_a AS a, doc_b AS b FROM jp
                UNION ALL SELECT doc_b, doc_a FROM jp),
            walk(doc, reach) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT w.doc, e.b FROM walk w JOIN edges e ON e.a = w.reach),
            cc AS (SELECT doc, min(reach) AS cluster_id FROM walk GROUP BY doc),
            cs AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
                   FROM cc GROUP BY 1)
            SELECT cc.doc AS doc_id, cc.cluster_id, cs.cluster_size,
                   cc.doc = cc.cluster_id AS keep
            FROM cc JOIN cs USING (cluster_id)
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
        "fingerprints": _FINGERPRINT_SQL,
        # Gopher-style repetition filters: duplicate-line fraction (LF
        # split, empty lines dropped, no trimming) plus duplicate- and
        # most-frequent-gram fractions at widths 2 AND 3 —
        # zero-denominator docs score 0.0, fractions 4dp half-up
        # (matches analysis.repetition_batch exactly)
        "repetition_stats": _repetition_sql(),
        "redact_pii": _redact_sql(),
        # ---- dedup ------------------------------------------------------
        "simhash_pairs": _SIMHASH_SQL.format(words=_WORDS),
        "minhash_lsh_pairs": _MINHASH_SQL_TMPL.format(
            words=_WORDS,
            perm_vals=_minhash_perm_values(),
            est_round=sql_round_half_up("k.est", 4),
            jac_round=sql_round_half_up("it / (sa.ns + sb.ns - it)", 4),
        ),
        # exact-dedup twin: the engine's content key is poly_hash_u64 of
        # the utf8 bytes (int64 view) + octet length — reproduced with
        # the shared HUGEINT poly/splitmix chain
        "dedup_exact": f"""
            WITH raw AS (
                SELECT doc_id, hex(encode(text)) AS hx,
                       octet_length(encode(text)) AS n
                FROM documents),
            h0 AS (SELECT doc_id, n,
                          {_poly_accum(_byte_list('hx', 'n'))} AS h
                   FROM raw),
            {_splitmix_ctes('e', 'h0', 'doc_id, n').lstrip()}
            SELECT {_as_i64('z')} AS text_hash, n::BIGINT AS n_bytes,
                   min(doc_id)::BIGINT AS keep_doc_id,
                   count(*)::BIGINT AS n_copies
            FROM e6 GROUP BY z, n
        """,
        "ngram_jaccard_pairs": ngram_jaccard,
        "minhash_verified_pairs": ngram_jaccard,
        "dedup_clusters": dedup_clusters_sql,
        # tf·idf keywords: top-5 per doc by tf·log10(N/df); rank ties
        # break on the shared 1e-6-rounded score then term ascending —
        # identical keys on the Ray side (analysis.tfidf_keywords)
        "tfidf_keywords": f"""
            WITH words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
            occ AS (SELECT doc_id, unnest(w) AS term FROM words),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM occ GROUP BY 1, 2),
            df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                   FROM occ GROUP BY 1),
            n AS (SELECT count(*)::DOUBLE AS nd FROM documents),
            s AS (SELECT doc_id, term, tf * log10(nd / df) AS score
                  FROM tf JOIN df USING (term) CROSS JOIN n),
            r AS (SELECT doc_id, term, score,
                         row_number() OVER (PARTITION BY doc_id
                             ORDER BY floor(score * 1000000 + 0.5) DESC,
                                      term) AS rank
                  FROM s)
            SELECT doc_id, term, rank::BIGINT AS rank,
                   {sql_round_half_up("score", 4)} AS score
            FROM r WHERE rank <= 5
        """,
        # unigram-LM quality score: per-doc mean log10 unigram likelihood
        # under the corpus-fit LM (cf/total); token-less docs score 0.0
        "lm_score": f"""
            WITH words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
            occ AS (SELECT doc_id, unnest(w) AS term FROM words),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM occ GROUP BY 1, 2),
            cf AS (SELECT term, count(*)::DOUBLE AS cf FROM occ GROUP BY 1),
            tot AS (SELECT sum(cf) AS total FROM cf),
            d AS (SELECT tf.doc_id, sum(tf.tf)::BIGINT AS n_tokens,
                         sum(tf.tf * log10(cf.cf / tot.total)) AS lp
                  FROM tf JOIN cf USING (term) CROSS JOIN tot GROUP BY 1)
            SELECT doc_id, n_tokens,
                   {sql_round_half_up("lp / n_tokens", 4)} AS avg_logprob
            FROM d
            UNION ALL
            SELECT doc_id, 0::BIGINT AS n_tokens, 0.0 AS avg_logprob
            FROM words WHERE len(w) = 0
        """,
        # duplicate-passage detection: per doc, word-5-gram windows whose
        # gram occurs in >= 2 distinct docs (dup_spans defaults n=5)
        "dup_spans": f"""
            WITH words AS (SELECT doc_id, {_WORDS} AS w FROM documents),
            idx AS (
                SELECT doc_id, w, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS i
                FROM words),
            wins AS (
                SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       || ' ' || w[i+3] || ' ' || w[i+4] AS gram
                FROM idx),
            nw AS (SELECT doc_id, count(*)::BIGINT AS n_windows
                   FROM wins GROUP BY 1),
            dg AS (SELECT gram FROM wins GROUP BY gram
                   HAVING count(DISTINCT doc_id) >= 2),
            nd AS (SELECT doc_id, count(*)::BIGINT AS n_dup
                   FROM wins JOIN dg USING (gram) GROUP BY 1)
            SELECT nw.doc_id, nw.n_windows,
                   COALESCE(nd.n_dup, 0)::BIGINT AS n_dup,
                   {sql_round_half_up("COALESCE(nd.n_dup, 0) / nw.n_windows::DOUBLE", 4)} AS dup_frac
            FROM nw LEFT JOIN nd USING (doc_id)
        """,
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
        # functions/hashing.py (SAMPLE_A = 2654435761, M = 2^32)
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE (doc_id::HUGEINT * 2654435761) % 4294967296 <
                  floor(CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
                                    WHEN 'src2' THEN 1.0 ELSE 0.1 END
                        * 4294967296)::HUGEINT
        """,
        # token-budget mixture sampling: per-source exclusive prefix sum
        # in affine-hash order vs the entry budgets (src0 800, src1 400,
        # default 200)
        "budget_sample": f"""
            WITH t AS (
                SELECT doc_id, source, len({_WORDS})::BIGINT AS n_tokens,
                       CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                            AS BIGINT) AS hkey
                FROM documents),
            w AS (
                SELECT *, COALESCE(sum(n_tokens) OVER (
                        PARTITION BY source ORDER BY hkey, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS excl
                FROM t)
            SELECT doc_id, source, n_tokens FROM w
            WHERE excl < CASE source WHEN 'src0' THEN 800
                                     WHEN 'src1' THEN 400 ELSE 200 END
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
        # curation groups by raw text here where the engine groups by
        # (poly_hash_u64, n_bytes) — identical output short of a 64-bit
        # same-length hash collision (none on any shipped corpus; the
        # output exposes no hash column either way)
        "curation": f"""
            WITH f AS (
                SELECT doc_id, text AS m,
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
            keep AS (SELECT text AS m, min(doc_id) AS k
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
        "srp_dup_pairs": _srp_sql(),
        # SemDeDup-style cluster assignment: same medoid quantizer and
        # floor(cos·1e6+0.5)/lowest-cnum keys as the IVF twin above.
        # HUGEINT cast (BIGINT overflows at vec_id ≥ ~3.4e9) + vec_id
        # tie-break (keys can collide past 2^32) match the engine's
        # lexsort((ids, key)) — the _srp_sql/budget_sample discipline.
        "embedding_clusters": f"""
            WITH cent AS (
                SELECT CAST(embedding AS DOUBLE[]) AS ce,
                       row_number() OVER (
                           ORDER BY (vec_id::HUGEINT * 2654435761 + 99)
                                    % 4294967296, vec_id) - 1 AS cnum
                FROM embeddings
                ORDER BY (vec_id::HUGEINT * 2654435761 + 99) % 4294967296, vec_id
                LIMIT 16)
            SELECT e.vec_id, cnum::BIGINT AS cluster,
                   {r4("list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ce)", 4)} AS cos
            FROM embeddings e, cent
            QUALIFY row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY floor(list_cosine_similarity(
                             CAST(e.embedding AS DOUBLE[]), ce) * 1000000 + 0.5) DESC,
                         cnum) = 1
        """,
        # cross-source contamination matrix: distinct word-5-grams shared
        # by each source pair (source_overlap defaults n=5)
        "source_overlap": f"""
            WITH words AS (SELECT doc_id, source, {_WORDS} AS w FROM documents),
            idx AS (
                SELECT source, w, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS i
                FROM words),
            g AS (
                SELECT DISTINCT source,
                       w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       || ' ' || w[i+3] || ' ' || w[i+4] AS gram
                FROM idx)
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*)::BIGINT AS n_shared
            FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
            GROUP BY 1, 2
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
        # As-of join twin of joins.asof_prior_event: most recent 'click'
        # at-or-before each 'purchase' per user, inner semantics.  The
        # window-function form (rather than DuckDB's ASOF JOIN) pins the
        # tie rule explicitly: at equal ts rights scan before lefts, and
        # among equal-ts rights the max event_id wins.
        "asof_join": """
            WITH e AS (
                SELECT event_id, user_id, ts, value, event_type
                FROM events WHERE event_type IN ('purchase', 'click')
            ), s AS (
                SELECT *,
                    (event_type = 'purchase') AS is_l,
                    last_value(CASE WHEN event_type = 'click'
                                    THEN event_id END IGNORE NULLS)
                        OVER w AS prior_event_id,
                    last_value(CASE WHEN event_type = 'click'
                                    THEN epoch_us(ts) END IGNORE NULLS)
                        OVER w AS prior_ts_us,
                    last_value(CASE WHEN event_type = 'click'
                                    THEN value END IGNORE NULLS)
                        OVER w AS prior_value
                FROM e
                WINDOW w AS (
                    PARTITION BY user_id
                    ORDER BY ts, (event_type = 'purchase'), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT event_id, user_id, value, prior_event_id,
                   (epoch_us(ts) - prior_ts_us)::BIGINT AS prior_gap_us,
                   prior_value
            FROM s WHERE is_l AND prior_event_id IS NOT NULL
        """,
        # Range-join twin of joins.follow_window_stats: count + 4dp value
        # sum of 'click's in (l.ts, l.ts + 7d] per 'purchase'; integer-µs
        # comparisons so interval semantics can't drift between engines.
        "range_join": f"""
            WITH l AS (
                SELECT event_id, user_id, epoch_us(ts) AS ts_us
                FROM events WHERE event_type = 'purchase'),
            r AS (
                SELECT user_id, epoch_us(ts) AS ts_us, value
                FROM events WHERE event_type = 'click')
            SELECT l.event_id, l.user_id,
                   count(r.ts_us)::BIGINT AS n_follow,
                   {r4('coalesce(sum(r.value), 0)', 4)} AS follow_value
            FROM l LEFT JOIN r ON l.user_id = r.user_id
                AND r.ts_us > l.ts_us
                AND r.ts_us <= l.ts_us + {7 * 86_400_000_000}
            GROUP BY l.event_id, l.user_id
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
