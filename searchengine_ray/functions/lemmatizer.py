"""Vendored rule-based English lemmatizer (P17).

The reference lemmatizes per token with spaCy (``Part C/
parser_module.py:226-237``); spaCy and its model are absent from this
container, so — like the vendored Porter2 that stands in for the
reference's Snowball stemmer (P16) — this module vendors a compact,
deterministic lemmatizer built from PUBLIC knowledge: a WordNet-style
irregular-form exception table plus morphy-style suffix substitution
rules (nouns/verbs; the rule shapes are the ones published in the
WordNet morphy documentation).

Deliberate adaptations, documented here because they are load-bearing
for the oracle contract:

- Real morphy validates each candidate against the WordNet lemma
  dictionary; no corpus ships in this container, so the cascade below
  applies ONE deterministic rule order with length/vowel guards
  instead.  Same trade the Q14/Q15 expansion plugins made.
- No POS information (the reference feeds single tokens to spaCy,
  which mostly guesses noun/verb too): comparative/superlative
  ``-er``/``-est`` are NOT stripped (noun false positives like
  ``water`` outnumber the wins); irregular adjectives ride the
  exception table.
- No add-'e' restoration after ``-ing``/``-ed`` (``merged → merg``):
  restoring 'e' correctly needs a dictionary.  Conflation stays
  self-consistent (``merged``/``merging`` → ``merg``), which is what
  index/query symmetry — and the DuckDB twin — require.

Every rule is expressible as a scalar SQL CASE chain; ``sql_lemma_expr``
emits the DuckDB twin, and ``tests/test_lemmatizer.py`` pins python ==
SQL over the full rule vocabulary plus fuzzed tokens.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["EXCEPTIONS", "MEN_NOT_PLURAL", "lemmatize", "lemmatize_array",
           "sql_lemma_expr"]

# Compact irregular-form table (public WordNet exc / school-grammar
# irregulars).  Keys and values are lowercase; the simple profile only
# ever sees [a-z0-9]+ tokens.
EXCEPTIONS: dict[str, str] = {
    # be / have / do / modal-ish
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    # irregular plurals
    "men": "man", "children": "child", "women": "woman", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "geese": "goose", "oxen": "ox",
    "lives": "life", "wives": "wife", "knives": "knife",
    "leaves": "leaf", "selves": "self", "shelves": "shelf",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "criteria": "criterion", "phenomena": "phenomenon", "data": "datum",
    # irregular adjectives
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "less": "less", "least": "less", "more": "more", "most": "more",
    # irregular verbs (past / participle → base)
    "went": "go", "gone": "go", "goes": "go",
    "said": "say", "made": "make", "ran": "run", "running": "run",
    "came": "come", "took": "take", "taken": "take",
    "saw": "see", "seen": "see", "got": "get", "gotten": "get",
    "knew": "know", "known": "know", "thought": "think",
    "brought": "bring", "bought": "buy", "built": "build",
    "felt": "feel", "found": "find", "gave": "give", "given": "give",
    "held": "hold", "kept": "keep", "left": "leave", "lost": "lose",
    "meant": "mean", "met": "meet", "paid": "pay", "sent": "send",
    "sold": "sell", "told": "tell", "understood": "understand",
    "wrote": "write", "written": "write", "spoke": "speak",
    "spoken": "speak", "stood": "stand", "sat": "sit", "won": "win",
    "wore": "wear", "worn": "wear", "drew": "draw", "drawn": "draw",
    "drove": "drive", "driven": "drive", "ate": "eat", "eaten": "eat",
    "fell": "fall", "fallen": "fall", "grew": "grow", "grown": "grow",
    "heard": "hear", "led": "lead", "read": "read", "ridden": "ride",
    "rose": "rise", "risen": "rise", "sang": "sing", "sung": "sing",
    "threw": "throw", "thrown": "throw", "woke": "wake", "woken": "wake",
}

# Words ending in "men" that are NOT -man compounds ("omen" is not the
# plural of "oman"): the -men → -man rule must not fire on these.  Real
# morphy validates candidates against the WordNet lexicon; this compact
# deny-list covers the common Latin/Greek -men nouns instead.
MEN_NOT_PLURAL = frozenset(
    "omen amen ramen lumen semen specimen regimen abdomen acumen albumen "
    "bitumen stamen hymen cyclamen foramen rumen limen numen gravamen "
    "cognomen catechumen cerumen".split()
)

_VOWELS = "aeiou"


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def _dedouble(s: str) -> str:
    """Porter-style doubled-consonant reduction after stripping
    ``-ing``/``-ed`` (``runn → run``), keeping l/s/z doubles
    (``fall``, ``pass``, ``buzz``) and vowel doubles (``see``)."""
    if len(s) >= 2 and s[-1] == s[-2] and s[-1] not in "lsz" and s[-1] not in _VOWELS:
        return s[:-1]
    return s


def lemmatize(w: str) -> str:
    """Deterministic rule cascade — FIRST matching rule wins.  The
    DuckDB twin in ``sql_lemma_expr`` encodes the identical order and
    guards; change them only in lockstep."""
    e = EXCEPTIONS.get(w)
    if e is not None:
        return e
    n = len(w)
    if n >= 5 and w.endswith("sses"):
        return w[:-2]
    if n >= 5 and (w.endswith("ches") or w.endswith("shes")):
        return w[:-2]
    # "zes" only after a DOUBLE z (buzzes→buzz): plain -ze words
    # (sizes, freezes) pluralize with -s and ride the s-rule instead
    if n >= 4 and w.endswith("xes") or n >= 5 and w.endswith("zzes"):
        return w[:-2]
    if n >= 4 and w.endswith("men") and w not in MEN_NOT_PLURAL:
        return w[:-2] + "an"
    if n >= 5 and w.endswith("ies"):
        return w[:-3] + "y"
    if n >= 5 and w.endswith("ves"):
        return w[:-3] + "f"
    if n >= 5 and w.endswith("eed"):
        return w[:-1]
    if n >= 4 and w.endswith("ied"):
        return w[:-3] + "y"
    if n >= 6 and w.endswith("ing"):
        stem = w[:-3]
        return _dedouble(stem) if _has_vowel(stem) else w
    if n >= 5 and w.endswith("ed"):
        stem = w[:-2]
        return _dedouble(stem) if _has_vowel(stem) else w
    if (n >= 4 and w.endswith("s")
            and not (w.endswith("ss") or w.endswith("us") or w.endswith("is"))):
        return w[:-1]
    return w


def lemmatize_array(flat: pa.Array) -> pa.Array:
    """Vectorized column lemmatization: dictionary-encode so the python
    cascade runs over the batch VOCABULARY only (tokens repeat), then a
    single take maps every occurrence — the hot path never loops over
    occurrences."""
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return flat
    d = flat.dictionary_encode()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    uniq = d.dictionary.to_pylist()
    lemmas = pa.array([lemmatize(w) for w in uniq], pa.string())
    return lemmas.take(d.indices)


# ---------------------------------------------------------------------------
# DuckDB twin
# ---------------------------------------------------------------------------

def _sql_dedouble(stem: str) -> str:
    """CASE expression applying ``_dedouble`` to the SQL string ``stem``."""
    last = f"substring({stem}, length({stem}), 1)"
    prev = f"substring({stem}, length({stem}) - 1, 1)"
    return (
        f"CASE WHEN length({stem}) >= 2 AND {last} = {prev} "
        f"AND {last} NOT IN ('l','s','z','a','e','i','o','u') "
        f"THEN substring({stem}, 1, length({stem}) - 1) ELSE {stem} END"
    )


def sql_lemma_expr(col: str) -> str:
    """Scalar DuckDB expression computing ``lemmatize({col})`` — the
    exception table as a CASE chain, then the suffix cascade with the
    same order and guards as the python side."""
    exc = " ".join(
        f"WHEN {col} = '{k}' THEN '{v}'" for k, v in EXCEPTIONS.items()
    )
    n = f"length({col})"

    def ends(suf: str) -> str:
        return f"{col} LIKE '%{suf}'"

    def strip(k: int) -> str:
        return f"substring({col}, 1, {n} - {k})"

    ing_stem, ed_stem = strip(3), strip(2)
    men_keep = ", ".join(f"'{w}'" for w in sorted(MEN_NOT_PLURAL))
    vowel = "regexp_matches({s}, '[aeiou]')"
    return f"""CASE {exc}
 WHEN {n} >= 5 AND {ends('sses')} THEN {strip(2)}
 WHEN {n} >= 5 AND ({ends('ches')} OR {ends('shes')}) THEN {strip(2)}
 WHEN ({n} >= 4 AND {ends('xes')}) OR ({n} >= 5 AND {ends('zzes')}) THEN {strip(2)}
 WHEN {n} >= 4 AND {ends('men')} AND {col} NOT IN ({men_keep}) THEN {strip(2)} || 'an'
 WHEN {n} >= 5 AND {ends('ies')} THEN {strip(3)} || 'y'
 WHEN {n} >= 5 AND {ends('ves')} THEN {strip(3)} || 'f'
 WHEN {n} >= 5 AND {ends('eed')} THEN substring({col}, 1, {n} - 1)
 WHEN {n} >= 4 AND {ends('ied')} THEN {strip(3)} || 'y'
 WHEN {n} >= 6 AND {ends('ing')} THEN
   CASE WHEN {vowel.format(s=ing_stem)} THEN {_sql_dedouble(ing_stem)} ELSE {col} END
 WHEN {n} >= 5 AND {ends('ed')} THEN
   CASE WHEN {vowel.format(s=ed_stem)} THEN {_sql_dedouble(ed_stem)} ELSE {col} END
 WHEN {n} >= 4 AND {ends('s')} AND NOT ({ends('ss')} OR {ends('us')} OR {ends('is')})
   THEN substring({col}, 1, {n} - 1)
 ELSE {col} END"""
