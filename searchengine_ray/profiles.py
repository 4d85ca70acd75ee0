"""Engine profiles — the rebuild's analogue of the reference's pluggable
engine variants (``Part C/search_engine_1..5.py`` / ``main.py:1-9``).

A profile fixes the tokenizer and the exact scoring constants.  The
conformance target is the reference's engine-2 path
(``Part C/ranker.py:32,62``): blend = 0.9·BM25 + 0.1·inner-product,
BM25 with k=3, b=0.6, idf=log2, tf-idf weights with idf=log10
(``search_engine_2.py:99``), norm_tf = tf/doc_len fed into BM25 with the
reference's quirky ``tf·(tf·(k+1))`` numerator (``ranker.py:82``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Profile:
    name: str
    tokenizer: str  # "simple" | "reference"
    k1: float = 3.0
    b: float = 0.6
    w_bm25: float = 0.9
    w_inner: float = 0.1
    w_cosine: float = 0.0
    # idf bases: BM25 uses log2 (ranker.py:81), tf-idf weights log10
    # (search_engine_2.py:99).  Part A blends 0.5·cos+0.5·inner.
    case_folding: bool = False  # reference I2 capital-letter rule
    entity_rule: bool = False   # reference P15 ≥2-docs entity rule (order-free)
    stemming: bool = False      # reference P16 (Snowball rules subset)
    lemmatization: bool = False  # reference P17 (vendored morphy-style rules)


SIMPLE = Profile(name="simple", tokenizer="simple")
# P17 lemma variant of the simple profile (vendored rule lemmatizer —
# functions/lemmatizer.py; spaCy absent, same treatment as Porter2/P16)
SIMPLE_LEMMA = Profile(name="simple_lemma", tokenizer="simple", lemmatization=True)
SIMPLE_BM25 = Profile(name="simple_bm25", tokenizer="simple", w_bm25=1.0, w_inner=0.0)
SIMPLE_INNER = Profile(name="simple_inner", tokenizer="simple", w_bm25=0.0, w_inner=1.0)
# Part A blend (reference Part A/ranker.py:26): 0.5·cosine + 0.5·inner
SIMPLE_PART_A = Profile(
    name="simple_part_a", tokenizer="simple", w_bm25=0.0, w_inner=0.5, w_cosine=0.5
)
REFERENCE = Profile(
    name="reference", tokenizer="reference", case_folding=True, entity_rule=True
)
# P16 stemming variant (reference parser_module.py:217-225 / stemmer.py:4-14)
REFERENCE_STEM = Profile(
    name="reference_stem", tokenizer="reference", case_folding=True,
    entity_rule=True, stemming=True,
)
# P17 lemma variant (reference parser_module.py:226-237; stem has priority
# over lemma in the reference, so the two flags are mutually exclusive)
REFERENCE_LEMMA = Profile(
    name="reference_lemma", tokenizer="reference", case_folding=True,
    entity_rule=True, lemmatization=True,
)
PROFILES = {
    p.name: p
    for p in (SIMPLE, SIMPLE_LEMMA, SIMPLE_BM25, SIMPLE_INNER, SIMPLE_PART_A,
              REFERENCE, REFERENCE_STEM, REFERENCE_LEMMA)
}


def get_profile(name_or_profile) -> Profile:
    if isinstance(name_or_profile, Profile):
        return name_or_profile
    return PROFILES[name_or_profile]
