"""Sharded index reader.

Replaces the reference's pickle load of the whole index
(``Part C/indexer.py:91-108``, ``Part C/utils.py:16-41``) with pruned
parquet reads: the term dictionary is small and loaded eagerly; posting
chunks are fetched per query term via hive-partition (shard) pruning +
a term predicate pushed into pyarrow.dataset, so a query touches only
the row groups holding its terms' postings.  Doc stats (the forward
table, reference ``indexer.py:47-48``) are loaded lazily and kept as
doc_id-sorted arrays for binary-search candidate lookup.

Scale note (10^12 turns): the dictionary itself would be sharded by the
same crc32 partitioner and memoized per query-serving actor; docstats
lookups would read only the doc_id ranges of the final top-k, which is
what the sorted layout here already models.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.dataset as pads

from ..functions.codec import decode_postings
from ..functions.hashing import term_shard


class IndexReader:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "index_meta.json")) as f:
            self.meta = json.load(f)
        self.n_docs = self.meta["n_docs"]
        self.avgdl = self.meta["avgdl"]
        self.n_shards = self.meta["n_shards"]
        dic = pads.dataset(os.path.join(index_dir, "dictionary")).to_table()
        self._dict = {
            t: (df, cf, sh)
            for t, df, cf, sh in zip(
                dic["term"].to_pylist(),
                dic["df"].to_pylist(),
                dic["cf"].to_pylist(),
                dic["shard"].to_pylist(),
            )
        }
        self._postings_ds = pads.dataset(
            os.path.join(index_dir, "postings"), partitioning="hive"
        )
        self._docmap = None
        self._doc_weights = None
        from collections import OrderedDict

        self._chunk_cache: OrderedDict = OrderedDict()
        self._meta_cache: dict[str, dict] = {}
        self._cache_postings = 0
        self.cache_max_postings = 20_000_000  # ~decoded entries held per reader

    # -- dictionary ------------------------------------------------------
    def has_term(self, term: str) -> bool:
        return term in self._dict

    def df(self, term: str) -> int:
        return self._dict[term][0]

    def vocabulary(self):
        return self._dict.keys()

    # -- postings --------------------------------------------------------
    def chunk_meta(self, term: str):
        """Chunk metadata rows for WAND: (chunk_idx, doc_min, doc_max,
        max_ntf) — cached (tiny, one row per 128k postings)."""
        cached = self._meta_cache.get(term)
        if cached is not None:
            return cached
        tbl = self._term_chunks(term, columns=["chunk_idx", "doc_min", "doc_max", "max_ntf"])
        order = np.argsort(tbl["chunk_idx"].to_numpy())
        out = {
            "chunk_idx": tbl["chunk_idx"].to_numpy()[order],
            "doc_min": tbl["doc_min"].to_numpy()[order],
            "doc_max": tbl["doc_max"].to_numpy()[order],
            "max_ntf": tbl["max_ntf"].to_numpy()[order],
        }
        self._meta_cache[term] = out
        return out

    def postings(self, term: str, chunk_ids=None):
        """Decoded postings for a term → (ids, tfs, lens) in doc_id order;
        optionally restricted to a set of chunk indices.

        Decoded chunks are LRU-cached (the rebuild of Part A's single-
        bucket-file cache, ``Part A/searcher.py:53-61``): repeated query
        terms skip both the parquet scan and the varbyte decode."""
        if term not in self._dict:
            return None
        chunks = self._chunk_cache.get(term)
        if chunks is None:
            tbl = self._term_chunks(term, columns=["chunk_idx", "run"])
            raw = sorted(zip(tbl["chunk_idx"].to_pylist(), tbl["run"].to_pylist()))
            chunks = [(ci, decode_postings(run)) for ci, run in raw]
            self._cache_put(term, chunks)
        parts = [p for ci, p in chunks if chunk_ids is None or ci in chunk_ids]
        if not parts:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
        if len(parts) == 1:
            return parts[0]
        return tuple(np.concatenate([p[j] for p in parts]) for j in range(3))

    def _cache_put(self, term: str, chunks) -> None:
        self._chunk_cache[term] = chunks
        self._cache_postings += sum(len(p[0]) for _, p in chunks)
        while self._cache_postings > self.cache_max_postings and self._chunk_cache:
            _, old = self._chunk_cache.popitem(last=False)
            self._cache_postings -= sum(len(p[0]) for _, p in old)

    def _term_chunks(self, term: str, columns):
        shard = self._dict[term][2] if term in self._dict else int(term_shard([term], self.n_shards)[0])
        return self._postings_ds.to_table(
            columns=columns,
            filter=(pads.field("shard") == shard) & (pads.field("term") == term),
        )

    # -- doc map / stats -------------------------------------------------
    def doc_positions(self, ids) -> np.ndarray:
        """Positions of posting doc ids in the docmap arrays.  With dense
        ids (index_meta dense_ids) the id IS the position (docmap is
        sorted by the hashed id, which defines the dense rank); legacy
        indexes fall back to binary search."""
        if self.meta.get("dense_ids"):
            return np.asarray(ids, dtype=np.int64)
        return np.searchsorted(self.docmap()["doc_id"], ids)

    def docmap(self):
        """doc_id-sorted arrays: (doc_id, conv_id, turn_idx, doc_len, max_tf, n_curses)."""
        if self._docmap is None:
            t = pads.dataset(os.path.join(self.index_dir, "docstats")).to_table(
                columns=["doc_id", "conv_id", "turn_idx", "role", "tool",
                         "doc_len", "max_tf", "n_curses"]
            )
            ids = t["doc_id"].to_numpy()
            order = np.argsort(ids)
            self._docmap = {
                "doc_id": ids[order],
                "conv_id": t["conv_id"].to_numpy(zero_copy_only=False)[order],
                "turn_idx": t["turn_idx"].to_numpy()[order],
                "role": t["role"].to_numpy(zero_copy_only=False)[order],
                "tool": t["tool"].to_numpy(zero_copy_only=False)[order],
                "doc_len": t["doc_len"].to_numpy()[order],
                "max_tf": t["max_tf"].to_numpy()[order],
                "n_curses": t["n_curses"].to_numpy()[order],
            }
        return self._docmap

    def doc_weights(self):
        """doc_id-sorted Σw² table (built by compute_doc_weights)."""
        if self._doc_weights is None:
            t = pads.dataset(os.path.join(self.index_dir, "doc_weights")).to_table()
            ids = t["doc_id"].to_numpy()
            order = np.argsort(ids)
            self._doc_weights = (ids[order], t["doc_weight_sq"].to_numpy()[order])
        return self._doc_weights
