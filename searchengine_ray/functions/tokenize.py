"""Tokenization profiles.

The ``simple`` profile is the SQL-reproducible fast path used by the
DuckDB-checked correctness queries: lowercase, split on ``[^a-z0-9]+``,
drop tokens shorter than 2 chars and a fixed stopword list.  It is fully
vectorized with pyarrow.compute kernels (no per-row Python).

The ``reference`` profile (see ``reference_tokenizer.py``) re-implements
the rule set of the reference parser (``Part C/parser_module.py:70-239``)
and is exercised by the rank-identity tests against the vendored
mini-reference oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["STOPWORDS_SIMPLE", "TOKEN_SPLIT_RE", "simple_tokenize_flat", "sql_tokens_cte"]

# Small fixed stopword list shared verbatim with the DuckDB oracles.  The
# reference uses NLTK's english list (parser_module.py:14); the simple
# profile keeps an engine-owned subset so the oracle SQL stays exact.
STOPWORDS_SIMPLE = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that", "are",
)

TOKEN_SPLIT_RE = "[^a-z0-9]+"

_STOP_ARR = pa.array(STOPWORDS_SIMPLE, type=pa.string())


def simple_tokenize_flat(texts) -> tuple[np.ndarray, pa.Array]:
    """Tokenize a string column → (parent_row_indices, kept_tokens).

    Vectorized: utf8_lower → split_pattern_regex → flatten → filter
    (length ≥ 2, not stopword).  Matches DuckDB's
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` + filters.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lowered = pc.utf8_lower(texts)
    toks = pc.split_pattern_regex(lowered, TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.and_(
        pc.greater_equal(pc.utf8_length(flat), 2),
        pc.invert(pc.is_in(flat, value_set=_STOP_ARR)),
    )
    flat = pc.filter(flat, keep)
    parent = pc.filter(parent, keep)
    return parent.to_numpy(zero_copy_only=False).astype(np.int64), flat


def sql_tokens_cte(source: str = "transcripts") -> str:
    """DuckDB fragment producing (conv_id, turn_idx, term) token rows that
    match ``simple_tokenize_flat`` exactly."""
    stop = ", ".join(f"'{w}'" for w in STOPWORDS_SIMPLE)
    return f"""
    raw_tokens AS (
        SELECT conv_id, turn_idx,
               unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS term
        FROM {source}
    ),
    tokens AS (
        SELECT conv_id, turn_idx, term FROM raw_tokens
        WHERE length(term) >= 2 AND term NOT IN ({stop})
    )"""
