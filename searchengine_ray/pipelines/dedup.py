"""Deduplication pipelines over the ``documents`` table.

Four families, each expressed Ray-Data-first:

- exact: content-hash (md5) → hash-partitioned groupby → keep min doc_id.
- n-gram Jaccard: word-3-gram inverted blocking → per-ngram candidate
  pairs → pair-count groupby → Jaccard against broadcast set sizes.
- MinHash + LSH: per-batch vectorized shingle→minhash signatures →
  banded bucket groupby → candidate pairs → signature-estimated Jaccard.
- SimHash: 64-bit signatures, 16-bit band blocking → Hamming≤k pairs.

Scale notes: the blocking groupbys shuffle only (key, doc_id) or
(band, doc_id) rows; per-group pair emission is quadratic in group
size, so at 10^12 scale hot blocks (stop-ngrams, empty bands) must be
capped/salted — `max_block` drops oversized blocks explicitly (logged in
the result), the same guard a production dedup uses.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_str_u64, splitmix64
from ..functions.rounding import round_half_up

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _md5_batch(batch: pa.Table) -> pa.Table:
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
    return pa.table({"text_md5": pa.array(h, pa.string()), "doc_id": batch["doc_id"]})


def dedup_exact(sf_dir: str):
    """→ (text_md5, keep_doc_id=min, n_copies) — one row per distinct text."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        ds.map_batches(_md5_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies"))
    )


# ---------------------------------------------------------------------------
# word n-gram Jaccard
# ---------------------------------------------------------------------------

def _ngrams_batch(batch: pa.Table, n: int = 3) -> pa.Table:
    """Distinct word-3-grams per doc (tokens: lower, split [^a-z0-9]+, len≥1)."""
    toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]), "[^a-z0-9]+")
    out_doc, out_ng = [], []
    for doc_id, words in zip(batch["doc_id"].to_pylist(), toks.to_pylist()):
        words = [w for w in words if w]
        grams = {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
        out_doc.extend([doc_id] * len(grams))
        out_ng.extend(sorted(grams))
    return pa.table(
        {"doc_id": pa.array(out_doc, pa.int64()), "ngram": pa.array(out_ng, pa.string())}
    )


def _pairs_from_group(group: pa.Table, max_block: int = 200) -> pa.Table:
    ids = np.sort(group["doc_id"].to_numpy())
    if len(ids) < 2 or len(ids) > max_block:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    a, b = np.triu_indices(len(ids), k=1)
    return pa.table({"doc_a": pa.array(ids[a]), "doc_b": pa.array(ids[b])})


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, max_block: int = 10**9):
    """→ (doc_a, doc_b, jaccard) for word-3-gram Jaccard ≥ threshold.

    ``max_block`` caps the per-ngram group size (hot/stop ngrams are not
    discriminative); the default is effectively uncapped so the result is
    exact and matches the SQL oracle — at 10^12 scale set a real cap.
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ngrams = ds.map_batches(_ngrams_batch, batch_format="pyarrow")
    # set sizes are one row per doc — small; broadcast into the final filter
    sizes_tbl = (
        ngrams.groupby("doc_id").aggregate(Count(alias_name="n")).to_pandas()
    )
    sizes = dict(zip(sizes_tbl["doc_id"], sizes_tbl["n"]))

    inter = (
        ngrams.groupby("ngram")
        .map_groups(_pairs_from_group, batch_format="pyarrow", fn_kwargs={"max_block": max_block})
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def jaccard_filter(t: pa.Table) -> pa.Table:
        da = t["doc_a"].to_numpy()
        db = t["doc_b"].to_numpy()
        it = t["inter"].to_numpy().astype(np.float64)
        na = np.array([sizes[d] for d in da], dtype=np.float64)
        nb = np.array([sizes[d] for d in db], dtype=np.float64)
        j = it / (na + nb - it)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(da[keep]),
                "doc_b": pa.array(db[keep]),
                "jaccard": pa.array(round_half_up(j[keep], 4)),
            }
        )

    return inter.map_batches(jaccard_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHashStage:
    """Per-batch vectorized minhash signatures over word shingles.

    n_hashes universal-hash permutations of the shingle u64 hashes;
    signatures reduced with ``np.minimum.reduceat`` over per-doc shingle
    segments.  Parameters fixed per instance (actor state)."""

    def __init__(self, n_hashes: int = 128, shingle: int = 3, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**61, size=n_hashes, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61, size=n_hashes, dtype=np.uint64)
        self.n_hashes = n_hashes
        self.shingle = shingle

    def signatures(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """→ (sig matrix [n_docs, n_hashes] u64, n_shingles per doc)."""
        all_sh, bounds = [], [0]
        for t in texts:
            words = [w for w in _simple_words(t)]
            sh = {" ".join(words[i : i + self.shingle]) for i in range(len(words) - self.shingle + 1)} or {t}
            all_sh.extend(sh)
            bounds.append(len(all_sh))
        h = hash_str_u64(all_sh)
        n_docs = len(texts)
        sig = np.full((n_docs, self.n_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            perm = splitmix64(h[:, None] * self.a[None, :] + self.b[None, :])
        starts = np.array(bounds[:-1])
        nonempty = np.flatnonzero(np.diff(bounds) > 0)
        if len(nonempty):
            red = np.minimum.reduceat(perm, starts[nonempty], axis=0)
            sig[nonempty] = red
        return sig, np.diff(bounds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig, n_sh = self.signatures(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_shingles": pa.array(n_sh, pa.int64()),
                "signature": pa.array(list(sig.astype(np.int64)), pa.list_(pa.int64())),
            }
        )


def _simple_words(text: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def minhash_lsh_pairs(sf_dir: str, bands: int = 32, threshold: float = 0.7,
                      verify: bool = False, shingle: int = 3):
    """→ (doc_a, doc_b, est_jaccard[, jaccard]) from banded LSH candidates,
    scored by signature agreement (est_jaccard = matching minhashes /
    n_hashes).  ``verify=True`` recomputes the EXACT shingle Jaccard for
    the surviving candidate pairs (reading only those docs via predicate
    pushdown — candidates are few by construction)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(MinHashStage, batch_format="pyarrow", concurrency=(1, 4))

    n_hashes = 128
    r = n_hashes // bands

    def band_rows(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy()
        sig = np.stack([np.asarray(s) for s in t["signature"].to_pylist()]).astype(np.uint64)
        rows_doc, rows_band, rows_hash = [], [], []
        for bidx in range(bands):
            seg = sig[:, bidx * r : (bidx + 1) * r]
            with np.errstate(over="ignore"):
                bh = seg[:, 0].copy()
                for j in range(1, r):
                    bh = splitmix64(bh ^ seg[:, j])
            rows_doc.append(doc)
            rows_band.append(np.full(len(doc), bidx, dtype=np.int32))
            rows_hash.append(bh.astype(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(rows_band), pa.int32()),
                "band_hash": pa.array(np.concatenate(rows_hash), pa.int64()),
                "doc_id": pa.array(np.concatenate(rows_doc), pa.int64()),
            }
        )

    cand = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(_pairs_from_group, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
    )
    cand_pd = cand.to_pandas()  # candidate pairs are few; verify driver-side
    sig_pd = sigs.to_pandas().set_index("doc_id")["signature"]

    out = {"doc_a": [], "doc_b": [], "est_jaccard": []}
    for da, db in zip(cand_pd.get("doc_a", []), cand_pd.get("doc_b", [])):
        sa, sb = np.asarray(sig_pd[da]), np.asarray(sig_pd[db])
        est = float((sa == sb).mean())
        if est >= threshold:
            out["doc_a"].append(da)
            out["doc_b"].append(db)
            out["est_jaccard"].append(round_half_up([est], 4)[0])
    result = pa.table(
        {
            "doc_a": pa.array(out["doc_a"], pa.int64()),
            "doc_b": pa.array(out["doc_b"], pa.int64()),
            "est_jaccard": pa.array(out["est_jaccard"], pa.float64()),
        }
    )
    if verify and result.num_rows:
        import pyarrow.dataset as pads

        wanted = sorted(set(out["doc_a"]) | set(out["doc_b"]))
        t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(wanted),
        )
        shingles = {}
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            words = _simple_words(text)
            shingles[did] = {
                " ".join(words[i : i + shingle]) for i in range(len(words) - shingle + 1)
            } or {text}
        exact = [
            round_half_up(
                [len(shingles[a] & shingles[b]) / len(shingles[a] | shingles[b])], 4
            )[0]
            for a, b in zip(out["doc_a"], out["doc_b"])
        ]
        result = result.append_column("jaccard", pa.array(exact, pa.float64()))
    return result


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit simhash over word unigrams weighted by tf."""
    out = np.empty(batch.num_rows, dtype=np.uint64)
    for i, text in enumerate(batch["text"].to_pylist()):
        words = _simple_words(text)
        if not words:
            out[i] = 0
            continue
        uniq, counts = np.unique(words, return_counts=True)
        h = hash_str_u64(uniq)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        out[i] = np.uint64(int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2))
    return pa.table(
        {"doc_id": batch["doc_id"], "simhash": pa.array(out.astype(np.int64), pa.int64())}
    )


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """→ (doc_a, doc_b, hamming) via 16-bit-band blocking + verify."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sh = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def band_rows(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy()
        h = t["simhash"].to_numpy().astype(np.uint64)
        parts = []
        for b in range(4):
            seg = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(doc), b, dtype=np.int32)),
                        "band_hash": pa.array(seg),
                        "doc_id": pa.array(doc),
                    }
                )
            )
        return pa.concat_tables(parts)

    cand = (
        sh.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(_pairs_from_group, batch_format="pyarrow")
    )
    cand_pd = cand.to_pandas().drop_duplicates()
    sh_pd = sh.to_pandas().set_index("doc_id")["simhash"]
    out = {"doc_a": [], "doc_b": [], "hamming": []}
    for da, db in zip(cand_pd.get("doc_a", []), cand_pd.get("doc_b", [])):
        d = bin((int(sh_pd[da]) ^ int(sh_pd[db])) & ((1 << 64) - 1)).count("1")
        if d <= max_hamming:
            out["doc_a"].append(da)
            out["doc_b"].append(db)
            out["hamming"].append(d)
    return pa.table(
        {
            "doc_a": pa.array(out["doc_a"], pa.int64()),
            "doc_b": pa.array(out["doc_b"], pa.int64()),
            "hamming": pa.array(out["hamming"], pa.int64()),
        }
    )
