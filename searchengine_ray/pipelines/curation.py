"""Corpus curation: the composed training-data pipeline.

The individual operators (language-ID, quality scoring, exact dedup)
exist as standalone pipelines in ``analysis.py`` / ``dedup.py``; real
curation runs them as ONE streaming flow so the corpus is read once:

    read → per-batch features (lang, quality, tokens, content hash)
         → groupby(content hash): keep the min-doc_id copy
         → filter (language allow-list + quality threshold)

One shuffle total (the dedup groupby, keyed on the 64-bit content hash
+ byte length — uniformly distributed, no skew), everything else
vectorized map_batches.  At 100 TB the same plan streams: features are
stateless, the groupby exchanges only (hash, doc_id, lang, quality,
n_tokens) rows — never text — and the winner row is re-emitted from
those columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .analysis import lang_id_batch, quality_batch
from .dedup import content_hash_batch


def curation_features(batch: pa.Table) -> pa.Table:
    """Per-doc curation signals in one pass over the batch."""
    lang = lang_id_batch(batch)
    qual = quality_batch(batch)
    key = content_hash_batch(batch)  # vectorized, no per-row hashing loop
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text_hash": key["text_hash"],
            "n_bytes": key["n_bytes"],
            "pred_lang": lang["pred_lang"],
            "n_tokens": qual["n_tokens"],
            "quality": qual["quality"],
        }
    )


# per-process memo of the decontaminate eval broadcast: ray.get() does
# not cache deserialized objects, so without this every batch re-unpickles
# the eval gram-string SET (the numpy half is zero-copy; the set is not)
_EVAL_MEMO: dict = {}


def _get_eval_once(ref):
    key = ref.hex()
    val = _EVAL_MEMO.get(key)
    if val is None:
        import ray

        if len(_EVAL_MEMO) >= 4:
            _EVAL_MEMO.pop(next(iter(_EVAL_MEMO)))
        _EVAL_MEMO[key] = val = ray.get(ref)
    return val


def decontaminate(sf_dir: str, eval_max_id: int = 10, n: int = 8):
    """Train/eval contamination check: flag every training doc sharing at
    least one word-``n``-gram with the eval set (docs with
    doc_id < ``eval_max_id`` stand in for a benchmark).

    Scale shape: the eval side is SMALL by construction — it is read
    with a pushed-down doc_id predicate (only eval row groups leave
    storage) and broadcast once via ``ray.put`` as (sorted gram-hash
    array, exact gram-string set).  Each training batch streams through
    the vectorized rolling-hash path (``dedup._gram_hashes``: tokens
    hashed once in C, window hashes combined with splitmix64 — no gram
    string materialized) and pre-filters with a ``searchsorted`` against
    the eval hashes; only the rare hash survivors get their gram STRING
    built and confirmed exactly (the driver gate is value-exact and a
    hash collision would inflate n_hits — string confirmation keeps the
    oracle exact while the hash filter does ~all the work).  Nothing
    shuffles.  → (doc_id, n_hits) for contaminated docs only."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    from .dedup import _gram_hashes, _grams_at

    ev = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") < eval_max_id,
    )
    # one tokenize/window pass serves both the hash array and the exact
    # gram strings (the strings come from the same (flat, starts))
    ev_hashes, _, ev_flat, ev_starts = _gram_hashes(ev["text"], n)
    ev_grams = (_grams_at(ev_flat, ev_starts, n) if len(ev_starts)
                else pa.array([], pa.string()))
    ref = ray.put((np.sort(ev_hashes), set(pc.unique(ev_grams).to_pylist())))

    def flag(batch: pa.Table) -> pa.Table:
        # the eval set itself is not "contaminated"
        batch = batch.filter(pc.greater_equal(batch["doc_id"], eval_max_id))
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        hashes, parents, flat, starts = _gram_hashes(batch["text"], n)
        if not len(hashes):
            return empty
        ev_h, ev_strings = _get_eval_once(ref)
        pos = np.searchsorted(ev_h, hashes).clip(0, max(len(ev_h) - 1, 0))
        hit = np.flatnonzero(ev_h[pos] == hashes) if len(ev_h) else np.empty(0, np.int64)
        if not len(hit):
            return empty
        # string-confirm the survivors (tiny by construction) exactly,
        # deduping (doc, gram) pairs as we confirm — only survivor
        # tokens are ever boxed into Python strings
        seen: set[tuple[int, str]] = set()
        counts = np.zeros(batch.num_rows, np.int64)
        for i in hit:
            s = int(starts[int(i)])
            gram = " ".join(flat.slice(s, n).to_pylist())
            p = int(parents[int(i)])
            if gram in ev_strings and (p, gram) not in seen:
                seen.add((p, gram))
                counts[p] += 1
        docs = np.flatnonzero(counts)
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy()[docs], pa.int64()),
                "n_hits": pa.array(counts[docs], pa.int64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(flag, batch_format="pyarrow")


def curate(sf_dir: str, langs=("en",), min_quality: float = 0.55):
    """→ Dataset (doc_id, pred_lang, n_tokens, quality) of the curated
    corpus: deduplicated (exact, keep-first), language-filtered, above
    the quality threshold (threshold compared on the rounded score, as
    the oracle does)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    feats = ds.map_batches(curation_features, batch_format="pyarrow")
    # exact-dedup winner = the min-doc_id row of each content-hash group.
    # Every feature column is a pure function of the text, so within a
    # group all rows are identical and Min() recovers the winner's values
    # without the one-Python-call-per-group map_groups dispatch (groups
    # are ~all singletons on a mostly-unique corpus — that dispatch was
    # the slowest primitive on this hot path).
    kept = feats.groupby(["text_hash", "n_bytes"]).aggregate(
        Min("doc_id", alias_name="doc_id"),
        Min("pred_lang", alias_name="pred_lang"),
        Min("n_tokens", alias_name="n_tokens"),
        Min("quality", alias_name="quality"),
    )

    langs = tuple(langs)

    def flt(t: pa.Table) -> pa.Table:
        lang_ok = np.isin(t["pred_lang"].to_numpy(zero_copy_only=False), langs)
        q_ok = t["quality"].to_numpy() >= min_quality
        return t.filter(pa.array(lang_ok & q_ok)).select(
            ["doc_id", "pred_lang", "n_tokens", "quality"]
        )

    return kept.map_batches(flt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Applied IN ORDER (emails may occur inside URLs; identical order on the
# SQL side makes overlap behavior irrelevant for parity).  Both Arrow
# and DuckDB compile these with RE2, so match semantics are identical.
PII_PATTERNS = (
    ("n_emails", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_urls", r"https?://[^\s]+", "<URL>"),
    ("n_longnums", r"[0-9]{9,}", "<NUM>"),
)


def redact_batch(batch: pa.Table) -> pa.Table:
    """→ (doc_id, clean_text, n_emails, n_urls, n_longnums): PII-class
    spans replaced by typed placeholders, with per-doc match counts
    (counted BEFORE each replacement, like the SQL twin).  Fully
    vectorized: one ``count_substring_regex`` + one
    ``replace_substring_regex`` per pattern over the whole batch."""
    import pyarrow.compute as pc

    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    cols: dict[str, pa.Array] = {"doc_id": batch["doc_id"]}
    counts = {}
    for name, pat, rep in PII_PATTERNS:
        counts[name] = pc.count_substring_regex(text, pat).cast(pa.int64())
        text = pc.replace_substring_regex(text, pat, rep)
    cols["clean_text"] = text
    cols.update(counts)
    return pa.table(cols)


def redact_pii(sf_dir: str):
    """PII-redaction pass over the documents table — the standard
    pre-training cleanup step (emails, URLs, long digit runs → typed
    placeholders).  Stateless ``map_batches``; nothing shuffles, and at
    100 TB this is a pure streaming read → transform → write."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(redact_batch, batch_format="pyarrow")
