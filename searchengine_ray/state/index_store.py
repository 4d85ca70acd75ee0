"""Sharded index reader.

Replaces the reference's pickle load of the whole index
(``Part C/indexer.py:91-108``, ``Part C/utils.py:16-41``) with pruned
parquet reads: the term dictionary is crc32-sharded on write (one
``dictionary/sNNNNN.parquet`` per posting shard) and loaded LAZILY —
a query touches only the dictionary shards its terms hash to, memoized
per reader (= per serving actor); posting chunks are fetched per query
term via hive-partition (shard) pruning + a term predicate pushed into
pyarrow.dataset, so a query touches only the row groups holding its
terms' postings.  Doc stats (the forward table, reference
``indexer.py:47-48``) are loaded lazily and kept as doc_id-sorted
arrays for binary-search candidate lookup.

Scale note (10^12 turns): doc lookups for the final top-k go through
``doc_rows`` — point reads of the dense-rank-sorted ``docmap`` artifact
that touch only the row groups holding the requested ranks (O(k) rows,
not O(N)); the full ``docmap()`` load remains only as the
legacy/whole-corpus-export path.  ``vocabulary()`` (spell/KNN expansion)
is the one whole-dictionary consumer — it triggers the full load, which
legacy (non-sNNNNN) dictionary layouts also fall back to eagerly.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.codec import decode_postings
from ..functions.hashing import term_shard

DICT_SCHEMA = pa.schema(
    [("term", pa.string()), ("df", pa.int64()),
     ("cf", pa.int64()), ("shard", pa.int32())]
)

_DICT_SHARD_RE = re.compile(r"^s\d{5}\.parquet$")


def dict_shard_path(dict_dir: str, shard: int) -> str:
    """Path of one crc32 term shard's dictionary slice."""
    return os.path.join(dict_dir, f"s{shard:05d}.parquet")

# docmap files are written with small row groups so a top-k lookup reads
# ~k/DOCMAP_ROW_GROUP groups; build.py stamps the value actually used
# into range_offsets.json
DOCMAP_ROW_GROUP = 4096

# compacted per-shard postings files are term-sorted with small row
# groups so a term predicate prunes to the handful of groups holding
# that term's chunk rows (rows are chunk-sized — up to ~1 MB of run
# blob each — so groups stay well under worker heap)
COMPACT_ROW_GROUP = 32


def _range_sorted(files) -> list[str]:
    """docmap files in NUMERIC range order — lexicographic sort misorders
    rNNNN names once ranges exceed the zero-padding width (r10000 would
    sort before r9999), silently misaligning dense-rank columns."""
    return sorted(
        (f for f in files if f.startswith("r") and f.endswith(".parquet")),
        key=lambda f: int(f[1:-8]),
    )


class IndexReader:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "index_meta.json")) as f:
            self.meta = json.load(f)
        self.n_docs = self.meta["n_docs"]
        self.avgdl = self.meta["avgdl"]
        self.n_shards = self.meta["n_shards"]
        # dictionary: lazy per-shard loading for the sNNNNN layout (a
        # query loads only the shards its terms hash to); legacy layouts
        # (ray-written part files, merged-segment dirs) have no
        # term→file mapping and load eagerly as before
        self._dict_dir = os.path.join(index_dir, "dictionary")
        self._dict_shards: dict[int, dict] = {}
        self._dict_all: dict | None = None
        files = [f for f in os.listdir(self._dict_dir) if f.endswith(".parquet")]
        self._dict_lazy = bool(files) and all(_DICT_SHARD_RE.match(f) for f in files)
        self._postings_ds = pads.dataset(
            os.path.join(index_dir, "postings"), partitioning="hive"
        )
        self._docmap = None
        self._doc_weights = None
        self._dm_info = "unset"
        self._dm_files: dict[int, pq.ParquetFile] = {}
        self._role_col = None
        self.stats = {"docmap_rows_read": 0, "chunks_decoded": 0,
                      "dict_shards_loaded": 0}
        import threading
        from collections import OrderedDict

        # LRU of decoded chunks keyed (term, chunk_idx) — chunk-granular
        # so a WAND block-max skip neither scans nor decodes skipped
        # chunks; guarded by a lock (query threads share the reader)
        self._chunk_cache: OrderedDict = OrderedDict()
        self._term_cis: dict[str, set] = {}
        self._cache_lock = threading.Lock()
        self._meta_cache: dict[str, dict] = {}
        # per-shard compacted-file handles + row-group term stats, parsed
        # ONCE (see _compact_entry); pq.ParquetFile reads are serialized
        # by _pf_lock (query threads share the reader)
        self._compact: dict[int, object] = {}
        self._pf_lock = threading.Lock()
        # LRU of docmap row-group tables — repeated top-k lookups hit the
        # same hot groups; 256 groups × DOCMAP_ROW_GROUP rows is a few MB
        self._dm_rg_cache: OrderedDict = OrderedDict()
        self.dm_rg_cache_max = 256
        # full-term concatenation LRU: re-joining a hot term's ~100 cached
        # chunks cost more than scoring.  Its budget is a SEPARATE
        # cache_max_postings (concatenated copies of chunk data), so a
        # reader's worst-case decoded-postings residency is
        # 2 × cache_max_postings — size cache_max_postings accordingly.
        self._full_cache: OrderedDict = OrderedDict()
        self._full_postings = 0
        self._cache_postings = 0
        self.cache_max_postings = 20_000_000  # ~decoded entries held per reader
        # corpus-stat overrides for multi-segment search: a segment scores
        # with GLOBAL n_docs/avgdl/df so its scores merge bit-exactly with
        # other segments' (pipelines/incremental.py sets these)
        self.df_override: dict[str, int] | None = None

    # -- dictionary ------------------------------------------------------
    def _load_full_dict(self) -> dict:
        """Whole-dictionary load (legacy layouts; ``vocabulary()``
        consumers like spell/KNN expansion).  Idempotent."""
        if self._dict_all is None:
            dic = pads.dataset(self._dict_dir).to_table()
            self._dict_all = {
                t: (df, cf, sh)
                for t, df, cf, sh in zip(
                    dic["term"].to_pylist(),
                    dic["df"].to_pylist(),
                    dic["cf"].to_pylist(),
                    dic["shard"].to_pylist(),
                )
            }
        return self._dict_all

    def _dict_shard(self, shard: int) -> dict:
        """One crc32 shard's term → (df, cf, shard) slice, memoized.
        A duplicate load on a cache-miss race is benign (same data);
        mutations go under _cache_lock like every other reader cache."""
        d = self._dict_shards.get(shard)
        if d is not None:
            return d
        path = dict_shard_path(self._dict_dir, shard)
        if os.path.exists(path):
            t = pq.read_table(path)
            d = {
                term: (df, cf, sh)
                for term, df, cf, sh in zip(
                    t["term"].to_pylist(), t["df"].to_pylist(),
                    t["cf"].to_pylist(), t["shard"].to_pylist(),
                )
            }
        else:  # shard had no postings → no slice file
            d = {}
        with self._cache_lock:
            self._dict_shards[shard] = d
            self.stats["dict_shards_loaded"] += 1
        return d

    def _entry(self, term: str):
        """(df, cf, shard) of a dictionary term, or None — the single
        lookup path: lazy shard load when the layout allows, whole-dict
        fallback otherwise."""
        if self._dict_all is not None:
            return self._dict_all.get(term)
        if not self._dict_lazy:
            return self._load_full_dict().get(term)
        return self._dict_shard(int(term_shard([term], self.n_shards)[0])).get(term)

    def has_term(self, term: str) -> bool:
        return self._entry(term) is not None

    def _entry_or_raise(self, term: str):
        """_entry, but unknown terms raise KeyError naming the term (the
        pre-sharding contract callers catch) instead of a NoneType
        subscript error."""
        ent = self._entry(term)
        if ent is None:
            raise KeyError(term)
        return ent

    def cf(self, term: str) -> int:
        """Corpus frequency (total occurrences) of a dictionary term."""
        return self._entry_or_raise(term)[1]

    def df(self, term: str) -> int:
        if self.df_override is not None:
            return self.df_override[term]
        return self._entry_or_raise(term)[0]

    def vocabulary(self):
        return self._load_full_dict().keys()

    # -- postings --------------------------------------------------------
    def chunk_meta(self, term: str):
        """Chunk metadata rows for WAND: (chunk_idx, doc_min, doc_max,
        max_ntf) — cached (tiny, one row per 128k postings)."""
        cached = self._meta_cache.get(term)
        if cached is not None:
            return cached
        tbl = self._term_chunks(term, columns=["chunk_idx", "doc_min", "doc_max", "max_ntf"])
        return self._put_meta(term, tbl)

    def _put_meta(self, term: str, tbl):
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

        Chunk-granular: when ``chunk_ids`` is given (WAND block-max
        skipping), only the missing chunks are scanned — the chunk_idx
        predicate is pushed into the parquet scan — and only those are
        varbyte-decoded.  Decoded chunks are LRU-cached per (term, chunk)
        (the rebuild of Part A's single-bucket-file cache,
        ``Part A/searcher.py:53-61``), behind a lock since query threads
        share the reader."""
        if self._entry(term) is None:
            return None
        if chunk_ids is None:
            with self._cache_lock:
                full = self._full_cache.get(term)
                if full is not None:
                    self._full_cache.move_to_end(term)
                    return full
        with self._cache_lock:
            have = {
                ci: self._chunk_cache[(term, ci)]
                for ci in self._term_cis.get(term, ())
            }
            for ci in have:
                self._chunk_cache.move_to_end((term, ci))
        meta = self._meta_cache.get(term)
        decoded = {}
        if meta is None:
            # first touch of the term: ONE scan fetches chunk metadata and
            # run blobs together (meta rides in the same row groups)
            tbl = self._term_chunks(
                term,
                columns=["chunk_idx", "doc_min", "doc_max", "max_ntf", "run"],
            )
            meta = self._put_meta(term, tbl)
            decoded = {
                int(ci): decode_postings(run)
                for ci, run in zip(tbl["chunk_idx"].to_pylist(), tbl["run"].to_pylist())
            }
        else:
            # the cached meta names every chunk the term has, so a fully
            # cached term never re-touches parquet (the old path scanned
            # the dataset with an exclusion filter on every warm query)
            want = meta["chunk_idx"] if chunk_ids is None else chunk_ids
            missing = [int(ci) for ci in want if int(ci) not in have]
            if missing:
                tbl = self._term_chunks(
                    term, columns=["chunk_idx", "run"], chunk_ids=missing,
                )
                decoded = {
                    int(ci): decode_postings(run)
                    for ci, run in zip(tbl["chunk_idx"].to_pylist(), tbl["run"].to_pylist())
                }
        if decoded:
            with self._cache_lock:
                # stats under the lock too: postings() runs from query
                # threads and += is a read-modify-write
                self.stats["chunks_decoded"] += len(decoded)
                for ci, p in decoded.items():
                    self._cache_put(term, ci, p)
        merged = {**have, **decoded}
        cis = sorted(merged) if chunk_ids is None else sorted(
            ci for ci in merged if ci in set(chunk_ids)
        )
        parts = [merged[ci] for ci in cis]
        if not parts:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
        out = parts[0] if len(parts) == 1 else tuple(
            np.concatenate([p[j] for p in parts]) for j in range(3)
        )
        if chunk_ids is None:
            with self._cache_lock:
                if term not in self._full_cache:
                    self._full_cache[term] = out
                    self._full_postings += len(out[0])
                    while self._full_postings > self.cache_max_postings and self._full_cache:
                        _, old = self._full_cache.popitem(last=False)
                        self._full_postings -= len(old[0])
        return out

    def _cache_put(self, term: str, ci: int, part) -> None:
        # caller holds _cache_lock
        key = (term, ci)
        if key in self._chunk_cache:
            self._chunk_cache.move_to_end(key)
            return
        self._chunk_cache[key] = part
        self._term_cis.setdefault(term, set()).add(ci)
        self._cache_postings += len(part[0])
        while self._cache_postings > self.cache_max_postings and self._chunk_cache:
            (t2, c2), old = self._chunk_cache.popitem(last=False)
            self._cache_postings -= len(old[0])
            self._term_cis[t2].discard(c2)

    def _cold_terms(self, terms) -> list[str]:
        """Dictionary terms whose meta or any meta-named chunk is not
        resident (LRU eviction can leave meta without chunks)."""
        out = []
        for t in terms:
            if self._entry(t) is None:
                continue
            meta = self._meta_cache.get(t)
            if meta is None:
                out.append(t)
                continue
            have = self._term_cis.get(t, ())
            if any(int(ci) not in have for ci in meta["chunk_idx"]):
                out.append(t)
        return out

    def _ingest_chunk_rows(self, tbl: pa.Table) -> int:
        """Cache meta + decoded chunks from a (term, chunk meta, run)
        table covering one or more terms COMPLETELY."""
        n = 0
        terms_col = tbl["term"].to_pylist()
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(terms_col):
            by_term.setdefault(t, []).append(i)
        for t, rows in by_term.items():
            sub = tbl.take(pa.array(rows, pa.int64()))
            self._put_meta(t, sub)
            decoded = {
                int(ci): decode_postings(run)
                for ci, run in zip(sub["chunk_idx"].to_pylist(), sub["run"].to_pylist())
            }
            n += len(decoded)
            with self._cache_lock:
                for ci, p in decoded.items():
                    self._cache_put(t, ci, p)
        # += is a read-modify-write: same locking rule as postings()
        with self._cache_lock:
            self.stats["chunks_decoded"] += n
        return n

    # -- compacted-shard point reads --------------------------------------
    def _compact_entry(self, shard: int):
        """(ParquetFile, per-row-group term mins, maxs) for a shard's
        compacted postings file, parsed ONCE per reader; None when the
        shard is not compacted (legacy layout → dataset-scan fallback).

        Cold fetches previously went through a pyarrow.dataset scan whose
        footer/statistics machinery re-ran on EVERY query — 295 ms of a
        350 ms cold query at a 30k-term vocabulary, while the actual row
        group reads + varbyte decode were ~10 ms.  Caching the footer and
        binary-searching the term-sorted row-group stats makes a cold
        term fetch a direct read_row_groups point read."""
        ent = self._compact.get(shard, "unset")
        if ent == "unset":
            path = os.path.join(
                self.index_dir, "postings", f"shard={shard}", "compact.parquet"
            )
            ent = None
            if os.path.exists(path):
                pf = pq.ParquetFile(path)
                md = pf.metadata
                names = [md.schema.column(i).name for i in range(md.num_columns)]
                j = names.index("term")
                mins, maxs, ok = [], [], md.num_row_groups > 0
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(j).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if ok:
                    mins = np.array(mins, dtype=object)
                    maxs = np.array(maxs, dtype=object)
                    # binary search needs BOTH arrays monotone; the file is
                    # term-sorted so this holds unless stats were truncated
                    # pathologically — verify once, fall back if violated
                    if all(mins[i] <= mins[i + 1] for i in range(len(mins) - 1)) and \
                       all(maxs[i] <= maxs[i + 1] for i in range(len(maxs) - 1)):
                        ent = (pf, mins, maxs)
            self._compact[shard] = ent
        return ent

    def _point_read(self, shard: int, terms, columns) -> pa.Table | None:
        """Chunk rows for ``terms`` within one shard via direct row-group
        point reads, or None when the shard has no usable compact file
        (caller falls back to the dataset scan).  Row groups holding a
        term satisfy min <= term <= max; stats arrays are monotone
        (term-sorted file), so each term's groups are one searchsorted
        window.  Conservative under any stats truncation: a truncated
        min is <= the true min and a truncated max >= the true max, so
        windows can only widen — the in-memory term filter keeps the
        result exact."""
        ent = self._compact_entry(shard)
        if ent is None:
            return None
        pf, mins, maxs = ent
        groups: set[int] = set()
        for t in terms:
            lo = int(np.searchsorted(maxs, t, side="left"))
            hi = int(np.searchsorted(mins, t, side="right"))
            groups.update(range(lo, hi))
        cols = list(dict.fromkeys(["term", *columns]))
        if not groups:
            schema = pf.schema_arrow
            return pa.table(
                {c: pa.array([], schema.field(c).type) for c in cols}
            )
        with self._pf_lock:
            tbl = pf.read_row_groups(sorted(groups), columns=cols)
        terms = sorted(terms)
        if len(terms) == 1:
            mask = pc.equal(tbl["term"], terms[0])
        else:
            mask = pc.is_in(tbl["term"], value_set=pa.array(terms, pa.string()))
        return tbl.filter(mask)

    def _fetch_chunk_rows(self, want, cols) -> list[pa.Table]:
        """Shared batched-fetch core: group ``want`` terms by their crc32
        shard, point-read compacted shards, and fall back to ONE dataset
        scan with a combined (shard, term) predicate for legacy shards —
        per-term scans re-open every file in the shard for each term,
        which dominates cold-query latency.  Each returned part covers
        its terms completely (a term lives in exactly one shard)."""
        by_shard: dict[int, list[str]] = {}
        for t in want:
            by_shard.setdefault(self._entry_or_raise(t)[2], []).append(t)
        parts: list[pa.Table] = []
        legacy: list[tuple[int, list[str]]] = []
        for shard, ts in sorted(by_shard.items()):
            tbl = self._point_read(shard, ts, cols)
            if tbl is None:
                legacy.append((shard, ts))
            elif tbl.num_rows:
                parts.append(tbl)
        if legacy:
            flt = pads.field("shard").isin(sorted(s for s, _ in legacy)) & \
                pads.field("term").isin(sorted(t for _, ts in legacy for t in ts))
            tbl = self._postings_ds.to_table(columns=cols, filter=flt)
            if tbl.num_rows:
                parts.append(tbl)
        return parts

    def fetch_terms(self, terms) -> int:
        """Batched cold fetch for a query's term set (meta + decoded
        runs).  Returns chunks decoded."""
        want = self._cold_terms(terms)
        if not want:
            return 0
        cols = ["term", "chunk_idx", "doc_min", "doc_max", "max_ntf", "run"]
        return sum(
            self._ingest_chunk_rows(p) for p in self._fetch_chunk_rows(want, cols)
        )

    def fetch_metas(self, terms) -> None:
        """Batched chunk-metadata fetch (no run blobs) for terms whose
        meta is unknown — the WAND path wants bounds for every query
        term before deciding which chunks to decode."""
        want = sorted(
            t for t in terms
            if self._entry(t) is not None and t not in self._meta_cache
        )
        if not want:
            return
        cols = ["term", "chunk_idx", "doc_min", "doc_max", "max_ntf"]
        parts = self._fetch_chunk_rows(want, cols)
        if not parts:
            return
        tbl = pa.concat_tables(parts)
        terms_col = tbl["term"].to_pylist()
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(terms_col):
            by_term.setdefault(t, []).append(i)
        for t, rows in by_term.items():
            self._put_meta(t, tbl.take(pa.array(rows, pa.int64())))

    def preload(self, terms=None) -> int:
        """Bulk-warm the postings caches with ONE streaming dataset scan
        instead of a per-term scan per cold query — the serving-actor
        warmup path.  ``terms=None`` loads the whole dictionary.  The
        scan is consumed batch-by-batch so peak transient memory is one
        record batch, never the whole postings table; retained memory is
        bounded by the LRU budget as usual.  Returns chunks decoded."""
        if terms is not None:
            # the targeted warmup IS the query-path batched fetch — one
            # code path, so fetch fixes (locking, columns, legacy
            # fallback) can never diverge between warmup and query time
            return self.fetch_terms(terms)
        full = self._load_full_dict()  # whole-dict warmup wants every term
        want = set(self._cold_terms(full))
        if not want:
            return 0
        # whole-dictionary warmup: one pass PER SHARD reading the full
        # compacted file (cheaper than per-term point reads when every
        # term is wanted), so peak transient memory is one shard's table
        by_shard: dict[int, list[str]] = {}
        for t in want:
            by_shard.setdefault(full[t][2], []).append(t)
        n = 0
        cols = ["term", "chunk_idx", "doc_min", "doc_max", "max_ntf", "run"]
        for shard, _shard_terms in sorted(by_shard.items()):
            ent = self._compact_entry(shard)
            if ent is not None:
                with self._pf_lock:
                    tbl = ent[0].read(columns=cols)
            else:
                tbl = self._postings_ds.to_table(
                    columns=cols, filter=pads.field("shard") == shard
                )
            if len(want) < len(full):
                # partially warm reader: drop rows of resident terms
                keep = [i for i, t in enumerate(tbl["term"].to_pylist()) if t in want]
                tbl = tbl.take(pa.array(keep, pa.int64()))
            n += self._ingest_chunk_rows(tbl)
            del tbl
        return n

    def _term_chunks(self, term: str, columns, chunk_ids=None):
        ent = self._entry(term)
        shard = ent[2] if ent is not None else int(term_shard([term], self.n_shards)[0])
        tbl = self._point_read(shard, [term], columns)
        if tbl is None:
            flt = (pads.field("shard") == shard) & (pads.field("term") == term)
            if chunk_ids is not None:
                flt = flt & pads.field("chunk_idx").isin(list(chunk_ids))
            return self._postings_ds.to_table(columns=columns, filter=flt)
        if chunk_ids is not None:
            tbl = tbl.filter(
                pc.is_in(tbl["chunk_idx"],
                         value_set=pa.array(sorted(chunk_ids), pa.int32()))
            )
        return tbl.select(columns)

    # -- doc map / stats -------------------------------------------------
    def doc_positions(self, ids) -> np.ndarray:
        """Positions of posting doc ids in the docmap arrays.  With dense
        ids (index_meta dense_ids) the id IS the position (docmap is
        sorted by the hashed id, which defines the dense rank); legacy
        indexes fall back to binary search."""
        if self.meta.get("dense_ids"):
            return np.asarray(ids, dtype=np.int64)
        return np.searchsorted(self.docmap()["doc_id"], ids)

    def _docmap_info(self):
        """(range-start offsets array, row-group size) for the docmap
        point-read path, or None when this index predates the artifact."""
        if self._dm_info == "unset":
            self._dm_info = None
            path = os.path.join(self.index_dir, "range_offsets.json")
            if os.path.isdir(os.path.join(self.index_dir, "docmap")) and os.path.exists(path):
                with open(path) as f:
                    payload = json.load(f)
                rg = payload.get("docmap_row_group")
                if rg:
                    self._dm_info = (np.asarray(payload["offsets"], np.int64), int(rg))
        return self._dm_info

    def _docmap_file(self, rng: int) -> pq.ParquetFile:
        pf = self._dm_files.get(rng)
        if pf is None:
            pf = pq.ParquetFile(
                os.path.join(self.index_dir, "docmap", f"r{rng:04d}.parquet")
            )
            self._dm_files[rng] = pf
        return pf

    def doc_rows(self, positions, columns=("conv_id", "turn_idx")) -> dict[str, np.ndarray]:
        """Serving rows for the given dense ranks — a point read that
        touches only the row groups containing those ranks (O(k) rows),
        not the whole forward table.  Falls back to the in-memory docmap
        for legacy (non-dense / pre-docmap) indexes."""
        pos = np.asarray(positions, dtype=np.int64)
        info = self._docmap_info()
        if info is None or not self.meta.get("dense_ids"):
            dm = self.docmap()
            return {c: dm[c][pos] for c in columns}
        offsets, rg_size = info
        out: dict[str, np.ndarray] = {
            c: np.empty(len(pos), dtype=object) for c in columns
        }
        rngs = np.searchsorted(offsets, pos, side="right") - 1
        local = pos - offsets[rngs]
        for rng in np.unique(rngs):
            m = rngs == rng
            loc = local[m]
            grp = loc // rg_size
            need = np.unique(grp)
            key_cols = tuple(columns)
            parts = []
            for g in need:
                ck = (int(rng), int(g), key_cols)
                # same discipline as postings(): cache dict/stats mutations
                # under _cache_lock, shared ParquetFile reads under _pf_lock
                # (threads share the reader; a duplicate read on a cache
                # miss race is benign)
                with self._cache_lock:
                    t = self._dm_rg_cache.get(ck)
                    if t is not None:
                        self._dm_rg_cache.move_to_end(ck)
                if t is None:
                    with self._pf_lock:
                        pf = self._docmap_file(int(rng))
                        t = pf.read_row_groups([int(g)], columns=list(columns))
                    with self._cache_lock:
                        self.stats["docmap_rows_read"] += t.num_rows
                        self._dm_rg_cache[ck] = t
                        while len(self._dm_rg_cache) > self.dm_rg_cache_max:
                            self._dm_rg_cache.popitem(last=False)
                parts.append(t)
            tbl = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
            # row index inside the concatenation of the selected groups
            sizes = np.array([t.num_rows for t in parts])
            base = np.concatenate([[0], np.cumsum(sizes[:-1])])
            rows = base[np.searchsorted(need, grp)] + (loc - grp * rg_size)
            for c in columns:
                out[c][np.flatnonzero(m)] = tbl[c].to_numpy(zero_copy_only=False)[rows]
        # restore native dtypes (object arrays only exist for the gather)
        for c in columns:
            if len(out[c]) and not isinstance(out[c][0], str):
                out[c] = out[c].astype(np.int64)
        return out

    def conv_codes(self):
        """(conv codes int32, turn_idx int32, conversation strings), all
        in dense-rank order: the conversation-structure columns needed by
        conversation-level aggregation, dictionary-encoded so the hot
        path touches only integers.  Two lazily-loaded integer columns
        (+ the unique conv strings), NOT the full forward table; at
        extreme scale these are per-shard columns owned by each serving
        actor's doc range."""
        if getattr(self, "_conv_codes", None) is None:
            dm_dir = os.path.join(self.index_dir, "docmap")
            if os.path.isdir(dm_dir):
                files = _range_sorted(os.listdir(dm_dir))
                parts = [
                    pq.read_table(os.path.join(dm_dir, f), columns=["conv_id", "turn_idx"])
                    for f in files
                ]
                tbl = (
                    pa.concat_tables(parts)
                    if parts
                    else pa.table({"conv_id": pa.array([], pa.string()),
                                   "turn_idx": pa.array([], pa.int32())})
                )
            else:  # legacy layout: positions index the doc_id-sorted table
                dm = self.docmap()
                tbl = pa.table({"conv_id": pa.array(dm["conv_id"], pa.string()),
                                "turn_idx": pa.array(dm["turn_idx"], pa.int32())})
            enc = pc.dictionary_encode(tbl["conv_id"].combine_chunks())
            self._conv_codes = (
                enc.indices.to_numpy().astype(np.int32),
                tbl["turn_idx"].to_numpy().astype(np.int32),
                enc.dictionary.to_numpy(zero_copy_only=False),
            )
        return self._conv_codes

    def roles(self, positions) -> np.ndarray:
        """Role labels for candidate positions.  A single lazily-loaded
        column in dense order (not the full forward table); at extreme
        scale this becomes a partition-level predicate instead."""
        info = self._docmap_info()
        if info is None or not self.meta.get("dense_ids"):
            return self.docmap()["role"][np.asarray(positions, np.int64)]
        if self._role_col is None:
            files = _range_sorted(os.listdir(os.path.join(self.index_dir, "docmap")))
            parts = [
                pq.read_table(
                    os.path.join(self.index_dir, "docmap", f), columns=["role"]
                )["role"].to_numpy(zero_copy_only=False)
                for f in files
            ]
            self._role_col = np.concatenate(parts) if parts else np.empty(0, object)
        return self._role_col[np.asarray(positions, np.int64)]

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
