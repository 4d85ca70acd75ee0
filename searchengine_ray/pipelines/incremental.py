"""Incremental index updates: delta segments + multi-segment search.

The reference rebuilds its index from scratch on any corpus change
(``Part C/indexer.py`` has no append path).  At 100 TB a full rebuild
per delivery is not viable, and the dense-rank postings layout cannot
absorb new docs in place (ranks are global).  The standard answer is
segments (the Lucene model): an append builds a SELF-CONTAINED delta
index over only the new files, and search fans out across segments.

Exactness: BM25/inner scores depend on corpus-level stats (N, avgdl,
df).  ``MultiIndexEngine`` computes the GLOBAL stats by merging the
segment dictionaries and injects them into every segment's reader
(``IndexReader.df_override``), so each doc's score is computed with the
same constants a full rebuild would use — a doc lives in exactly one
segment, its per-term contributions are identical floats, and the
merged ranking is therefore equal to the full rebuild's (asserted by
``tests/test_incremental.py``).  The dictionary merge
(``merge_segment_dictionaries``) is a vectorized pyarrow group_by on
the driver up to a row cap and a distributed Ray Data groupby over the
dictionary parquet shards beyond it; the serving pool computes the
merged stats ONCE and broadcasts them to its actors via the object
store (``global_stats`` + ``serve.SearchService``) instead of every
actor re-merging.

Caveat (documented, inherent to segments): profiles whose dictionary
folding is corpus-global (the reference P15 entity rule, I2 case
folding) make folding decisions per segment, exactly as Lucene analyzes
per segment; the ``simple`` profile is fold-free and append is exact.

Compaction: ``compact_index`` rebuilds one index from all segment
sources when the segment count grows — the periodic merge every
segmented store needs.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os

import numpy as np
import pyarrow as pa

from ..functions.rounding import round_half_up
from .build import build_index
from .search import RANK_DECIMALS, QueryEngine, _empty_result


def _segments_file(index_dir: str) -> str:
    return os.path.join(index_dir, "segments.json")


@contextlib.contextmanager
def _index_lock(index_dir: str):
    """Exclusive advisory lock serializing index mutations: an append
    (segment build + registration) vs the compaction swap, and appends
    against each other (two unserialized appends would race the
    read-modify-write of segments.json and both claim the same seg-NNN
    name).  The lock file is a SIBLING of ``index_dir`` so its path is
    stable across the swap renames; flock is per-open-file, so nested
    use in one process would deadlock — callers hold it once."""
    path = index_dir.rstrip(os.sep) + ".lock"
    f = open(path, "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(f, fcntl.LOCK_UN)
        f.close()


def segment_dirs(index_dir: str) -> list[str]:
    """Base index + registered delta segments, in append order."""
    out = [index_dir]
    sf = _segments_file(index_dir)
    if os.path.exists(sf):
        with open(sf) as f:
            for name in json.load(f)["segments"]:
                out.append(os.path.join(index_dir, "segments", name))
    return out


def _base_profile(index_dir: str) -> str:
    with open(os.path.join(index_dir, "index_meta.json")) as f:
        return json.load(f)["profile"]


def append_index(source: str, index_dir: str, profile: str | None = None,
                 **build_kwargs) -> str:
    """Append new input files as a delta segment.

    Builds a self-contained index over ``source`` (the NEW files only)
    under ``index_dir/segments/seg-NNN`` — reusing the whole resumable
    build pipeline — and registers it.  Returns the segment path.
    ``profile`` defaults to the BASE index's stamped profile; passing a
    different one is rejected (mixed-analyzer segments score garbage).

    Holds the index mutation lock for the WHOLE append (build included):
    the segment directory lives under ``index_dir`` before it is
    registered, so a compaction swap mid-build would strand the
    half-built files in the renamed-away tree.  Compaction's rebuild
    runs unlocked — an append only ever waits for the brief swap."""
    base_prof = _base_profile(index_dir)
    if profile is None:
        profile = base_prof
    elif profile != base_prof:
        raise ValueError(
            f"segment profile {profile!r} != base index profile {base_prof!r}"
        )
    with _index_lock(index_dir):
        sf = _segments_file(index_dir)
        reg = {"segments": [], "sources": {}}
        if os.path.exists(sf):
            with open(sf) as f:
                reg = json.load(f)
            reg.setdefault("sources", {})
        name = f"seg-{len(reg['segments']):03d}"
        seg_dir = os.path.join(index_dir, "segments", name)
        build_index(source, seg_dir, profile=profile, **build_kwargs)
        reg["segments"].append(name)
        reg["sources"][name] = os.path.abspath(source)
        with open(sf + ".tmp", "w") as f:
            json.dump(reg, f)
        os.replace(sf + ".tmp", sf)
    return seg_dir


def compact_index(sources: list[str], out_dir: str, profile: str = "simple",
                  **build_kwargs) -> str:
    """Merge segments back into one index by rebuilding over all source
    dirs (the periodic compaction of a segmented store)."""
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    # build_index takes one source dir; a multi-dir compaction just
    # passes the union via symlinked staging (cheap, no data copied)
    stage = out_dir + ".staging"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    for i, src in enumerate(sources):
        for f in sorted(os.listdir(src)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(os.path.abspath(src), f),
                           os.path.join(stage, f"s{i:02d}_{f}"))
    build_index(stage, out_dir, profile=profile, **build_kwargs)
    shutil.rmtree(stage)
    # record the TRUE sources: the staging dir is gone, and a later
    # compaction cycle needs real paths, not dead symlink lineage
    with open(os.path.join(out_dir, "compaction_sources.json"), "w") as f:
        json.dump({"sources": [os.path.abspath(s) for s in sources]}, f)
    return out_dir


def _index_sources(index_dir: str) -> list[str]:
    """Original input dirs of base + segments (base from the build
    manifest's partition lineage, segments from the registry)."""
    cs = os.path.join(index_dir, "compaction_sources.json")
    if os.path.exists(cs):
        with open(cs) as f:
            base = list(json.load(f)["sources"])
    else:
        with open(os.path.join(index_dir, "build_manifest.json")) as f:
            man = json.load(f)
        base = sorted(
            {os.path.dirname(rec["lineage"]["path"]) for rec in man["partitions"].values()}
        )
    sf = _segments_file(index_dir)
    if os.path.exists(sf):
        with open(sf) as f:
            reg = json.load(f)
        for name in reg["segments"]:
            src = reg.get("sources", {}).get(name)
            if src is None:
                raise ValueError(
                    f"segment {name} has no recorded source; cannot compact"
                )
            base.append(src)
    # dedupe (a segment staged from a base dir would double-ingest) while
    # keeping order.  Caveat: base sources are DIRECTORIES from lineage —
    # files added to them after the base build get picked up by a
    # compaction even though pre-compaction search never served them.
    seen: set[str] = set()
    out = []
    for s in base:
        a = os.path.abspath(s)
        if a not in seen:
            seen.add(a)
            out.append(a)
    return out


def maybe_compact(index_dir: str, max_segments: int = 4,
                  profile: str | None = None, **build_kwargs) -> bool:
    """Compaction policy: when the delta-segment count exceeds
    ``max_segments``, rebuild base+segments into one index and swap it
    in via two renames.  The old index stays intact until the rebuild is
    complete; if a NEW segment was appended while the rebuild ran, the
    swap is ABORTED (returns False, rebuild discarded) rather than
    deleting the fresh segment — rerun once appends quiesce.  The
    registry re-check and the swap happen under the index mutation lock
    shared with ``append_index``, so an append can never land between
    the check and the renames (it either completed before the check —
    the swap aborts — or it blocks until the swap is done and builds
    against the compacted index).  The long rebuild itself runs
    UNLOCKED so appends stay available during compaction.  The
    two-rename swap is not a single atomic operation: a crash between
    them leaves the old index at ``index_dir + ".old"`` for manual
    restore.  Returns True when a compaction ran."""
    import shutil

    if profile is None:
        profile = _base_profile(index_dir)
    if len(segment_dirs(index_dir)) - 1 <= max_segments:
        return False
    before = segment_dirs(index_dir)
    sources = _index_sources(index_dir)
    new_dir = index_dir + ".compacting"
    compact_index(sources, new_dir, profile=profile, **build_kwargs)
    with _index_lock(index_dir):
        if segment_dirs(index_dir) != before:
            # concurrent append during the rebuild: its docs are not in
            # the compacted output — discard the rebuild, never the
            # segment
            shutil.rmtree(new_dir, ignore_errors=True)
            return False
        old_dir = index_dir + ".old"
        shutil.rmtree(old_dir, ignore_errors=True)
        os.replace(index_dir, old_dir)
        os.replace(new_dir, index_dir)
        shutil.rmtree(old_dir, ignore_errors=True)
    return True


def merge_segment_dictionaries(dirs: list[str],
                               driver_cap: int | None = None) -> pa.Table:
    """Merged ``(term, df)`` over the segment dictionaries, term-sorted.

    Up to ``driver_cap`` total dictionary rows (default
    ``$GRAFT_DICT_MERGE_DRIVER_CAP`` or 2M) the merge is one vectorized
    pyarrow ``group_by`` on the driver — no per-term Python loop.
    Beyond the cap (extreme vocabularies × many segments) it runs as a
    Ray Data groupby over the dictionary parquet shards, so no single
    process k-way-merges the raw rows.  The RESULT is vocabulary-sized
    either way: every reader holds the merged map by design, and the
    serving pool broadcasts it once instead of recomputing per actor."""
    import os as _os

    import pyarrow.dataset as pads

    if driver_cap is None:
        driver_cap = int(_os.environ.get("GRAFT_DICT_MERGE_DRIVER_CAP", "2000000"))
    sets = [pads.dataset(_os.path.join(d, "dictionary")) for d in dirs]
    total = sum(s.count_rows() for s in sets)
    if total <= driver_cap:
        tbl = pa.concat_tables([s.to_table(columns=["term", "df"]) for s in sets])
        out = tbl.group_by("term").aggregate([("df", "sum")])
        # select by NAME: TableGroupBy.aggregate's key/aggregate column
        # order has changed across pyarrow majors — a positional rename
        # would silently swap term and df
        out = pa.table({"term": out["term"], "df": out["df_sum"]})
    else:
        import ray
        import ray.data as rd
        from ray.data.aggregate import Sum

        files = [
            _os.path.join(d, "dictionary", f)
            for d in dirs
            for f in sorted(_os.listdir(_os.path.join(d, "dictionary")))
            if f.endswith(".parquet")
        ]
        ds = rd.read_parquet(files, columns=["term", "df"])
        agg = ds.groupby("term").aggregate(Sum("df", alias_name="df"))
        blocks = [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows]
        if not blocks:  # every segment dictionary empty (degenerate input)
            out = pa.schema([("term", pa.string()), ("df", pa.int64())]).empty_table()
        else:
            out = pa.concat_tables(blocks).select(["term", "df"])
    return out.sort_by("term")


def global_stats(index_dir: str, driver_cap: int | None = None) -> dict:
    """Corpus-global stats of a segmented index: doc count, total/avg
    doc length from the per-segment metas, merged per-term df table.
    Small enough to ``ray.put`` once and share across serving actors."""
    dirs = segment_dirs(index_dir)
    n_docs = 0
    total_len = 0
    for d in dirs:
        with open(os.path.join(d, "index_meta.json")) as f:
            m = json.load(f)
        n_docs += m["n_docs"]
        total_len += m["total_len"]
    return {
        "n_docs": n_docs,
        "total_len": total_len,
        "df_table": merge_segment_dictionaries(dirs, driver_cap=driver_cap),
    }


class MultiIndexEngine:
    """Search across a base index and its delta segments with globally
    correct corpus statistics.

    ``stats``: precomputed ``global_stats()`` output (e.g. broadcast
    through the object store by the serving pool) — skips the per-engine
    dictionary merge.  ``dict_driver_cap`` forwards to
    ``merge_segment_dictionaries`` when stats are computed here."""

    def __init__(self, index_dir: str, profile=None, stats: dict | None = None,
                 dict_driver_cap: int | None = None):
        self.engines = [QueryEngine(d, profile=profile) for d in segment_dirs(index_dir)]
        profiles = {e.reader.meta["profile"] for e in self.engines}
        if len(profiles) > 1:
            raise ValueError(
                f"segments built with different profiles {sorted(profiles)}; "
                "their vocabularies are incompatible — recompact"
            )
        # ---- global stats ------------------------------------------------
        if stats is None:
            stats = global_stats(index_dir, driver_cap=dict_driver_cap)
        n_docs = stats["n_docs"]
        total_len = stats["total_len"]
        df_tbl = stats["df_table"]
        df: dict[str, int] = dict(
            zip(df_tbl["term"].to_pylist(), df_tbl["df"].to_pylist())
        )
        avgdl = total_len / n_docs if n_docs else 0.0
        for e in self.engines:
            e.reader.n_docs = n_docs
            e.reader.avgdl = avgdl
            e.reader.df_override = df
        self.n_docs = n_docs
        self.df = df

    # -- query -----------------------------------------------------------
    def _resolve(self, query: str) -> dict[str, float]:
        """Case resolution against the UNION vocabulary (what a merged
        dictionary would contain), so segment-local gaps cannot drop a
        query term the full rebuild would keep.  Delegates to
        ``parse_query`` with the union-membership predicate — one
        tokenize/resolve implementation for both paths."""
        return self.engines[0].parse_query(query, has_term=self.df.__contains__)

    def search(self, query: str, k: int | None = None, role: str | None = None,
               role_boost: dict[str, float] | None = None,
               match_mode: str = "any") -> pa.Table:
        if match_mode not in ("any", "all"):
            raise ValueError(f"unknown match_mode {match_mode!r}")
        q = self._resolve(query)
        if not q:
            return _empty_result()
        parts = []
        for e in self.engines:
            q_seg = {t: w for t, w in q.items() if e.reader.has_term(t)}
            if not q_seg:
                continue
            if match_mode == "all" and len(q_seg) < len(q):
                # a globally-resolved term is wholly absent from this
                # segment: none of its docs can match ALL terms
                continue
            ids, scores = e._score_exact(q_seg)
            if match_mode == "all" and len(ids):
                ids, scores = e._conjunctive_filter(q_seg, ids, scores)
            if role_boost is not None and len(ids):
                roles = e.reader.roles(e.reader.doc_positions(ids))
                uniq, inv = np.unique(roles, return_inverse=True)
                w_u = np.array([role_boost.get(r, 1.0) for r in uniq.tolist()])
                scores = scores * w_u[inv]
            # explicit k: the global top-k is a subset of the union of
            # per-segment top-k.  k=None: the default-k rule needs the
            # GLOBAL candidate count (after the role filter), so keep
            # every segment row (the full engine also materializes ~all
            # rows for default-k).
            parts.append(e._rank(ids, scores, k if k is not None else 10**18,
                                 role=role))
        if not parts:
            return _empty_result()
        merged = pa.concat_tables(parts)
        scores = merged["score"].to_numpy()
        rounded = round_half_up(scores, RANK_DECIMALS)
        conv = merged["conv_id"].to_numpy(zero_copy_only=False)
        turn = merged["turn_idx"].to_numpy()
        if k is None:
            k = round(0.9 * merged.num_rows)
        k = max(min(k, merged.num_rows), 0)
        order = np.lexsort((turn, conv, -rounded))[:k]
        return pa.table(
            {
                "conv_id": pa.array(conv[order], pa.string()),
                "turn_idx": pa.array(turn[order].astype(np.int32), pa.int32()),
                "score": pa.array(scores[order], pa.float64()),
            }
        )
