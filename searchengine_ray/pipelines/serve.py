"""Distributed query serving: a pool of QueryEngine actors.

The reference serves queries from a single in-process engine
(``Part C/GUI.py`` runs one GUI process over one loaded index).  At
cluster scale, query serving is a pool of long-lived actors, each
holding the warm per-term caches of an ``IndexReader`` — the natural
Ray expression of a stateful serving tier:

- ``SearchWorker``: one actor = one ``QueryEngine`` (postings LRU,
  term-static score LRU, docmap row-group LRU all live actor-side).
  For a segmented index, the merged corpus-global stats are computed
  ONCE on the driver and broadcast to every worker through the object
  store — actors share one merge instead of each re-merging.
- ``SearchService``: the driver-side handle.  Routes each query to a
  worker by **term affinity** — hash of the query's sorted lowercased
  raw tokens, an APPROXIMATION of the resolved term set (case/stem
  variants of one resolved set can land on different workers; exact
  routing would need a driver-side resolver) — so a hot term's postings
  are usually decoded and cached on ONE worker instead of every worker
  re-decoding them (round-robin available for uniform load).
  ``search_many`` pipelines a whole batch of queries and gathers
  results in submission order.

On a multi-node cluster the same class works unchanged: actors spread
across nodes (``scheduling_strategy="SPREAD"``), each reading the
shared index from its node-local page cache / object store.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import ray


@ray.remote(num_cpus=1)
class SearchWorker:
    """One serving actor: engine construction (dictionary load, cache
    allocation) happens once here, queries reuse the warm state."""

    def __init__(self, index_dir: str, profile=None, preload: bool = False,
                 stats=None):
        import os

        from .search import QueryEngine

        if os.path.exists(os.path.join(index_dir, "segments.json")):
            # appended index: serve across base + delta segments with
            # globally-correct stats (broadcast by the pool driver when
            # given), no compaction required
            from .incremental import MultiIndexEngine

            self.engine = MultiIndexEngine(index_dir, profile=profile, stats=stats)
            self._readers = [e.reader for e in self.engine.engines]
        else:
            self.engine = QueryEngine(index_dir, profile=profile)
            self._readers = [self.engine.reader]
        if preload:
            # one bulk scan beats N cold per-term scans; first queries
            # then hit warm caches instead of paying cold-fetch p95
            for r in self._readers:
                r.preload()

    def search(self, query: str, k=None, method: str = "exact",
               role=None, role_boost=None, match_mode: str = "any") -> pa.Table:
        from .search import QueryEngine

        if not isinstance(self.engine, QueryEngine):
            # multi-segment engine (branch on TYPE, not reader count — a
            # one-segment MultiIndexEngine has one reader but no method=
            # parameter): all modes supported; scoring is always exact
            # (wand degrades to exact, never to wrong)
            return self.engine.search(query, k=k, role=role,
                                      role_boost=role_boost, match_mode=match_mode)
        return self.engine.search(query, k=k, method=method, role=role,
                                  role_boost=role_boost, match_mode=match_mode)

    def cache_stats(self) -> dict:
        out = {"chunks_cached": 0, "cached_postings": 0}
        for r in self._readers:
            out["chunks_cached"] += len(r._chunk_cache)
            out["cached_postings"] += r._cache_postings
            for k2, v in r.stats.items():
                out[k2] = out.get(k2, 0) + v
        return out


class SearchService:
    """Driver-side pool handle.

    ``routing="terms"`` (default): queries with the same raw lowercased
    token set hit the same worker — cache-optimal for skewed query
    workloads (an approximation of resolved-term affinity; see module
    docstring).
    ``routing="rr"``: round-robin — latency-optimal for uniform ones.
    """

    def __init__(self, index_dir: str, n_workers: int = 4, profile=None,
                 routing: str = "terms", preload: bool = False):
        import os

        if routing not in ("terms", "rr"):
            raise ValueError(f"unknown routing {routing!r}")
        stats_ref = None
        if os.path.exists(os.path.join(index_dir, "segments.json")):
            # merge the segment dictionaries ONCE; workers read the
            # broadcast copy from the object store (zero-copy per node)
            from .incremental import global_stats

            stats_ref = ray.put(global_stats(index_dir))
        self.workers = [
            SearchWorker.options(scheduling_strategy="SPREAD").remote(
                index_dir, profile, preload, stats_ref
            )
            for _ in range(n_workers)
        ]
        self.routing = routing
        self._rr = 0

    # -- routing ---------------------------------------------------------
    def _pick(self, query: str) -> int:
        if self.routing == "rr":
            # post-increment: the cycle starts at worker 0 (pre-increment
            # left worker 0 cold until the first wrap)
            picked = self._rr
            self._rr = (self._rr + 1) % len(self.workers)
            return picked
        key = " ".join(sorted(query.lower().split()))
        return zlib.crc32(key.encode("utf-8")) % len(self.workers)

    # -- API -------------------------------------------------------------
    def search(self, query: str, k=None, method: str = "exact",
               role=None, role_boost=None, match_mode: str = "any") -> pa.Table:
        ref = self.workers[self._pick(query)].search.remote(
            query, k=k, method=method, role=role,
            role_boost=role_boost, match_mode=match_mode,
        )
        return ray.get(ref)

    def search_many(self, queries, k=None, method: str = "exact",
                    role=None, role_boost=None,
                    match_mode: str = "any") -> list[pa.Table]:
        """Submit every query at once (pipelined across the pool), gather
        in submission order.  Same modes as ``search``."""
        refs = [
            self.workers[self._pick(q)].search.remote(
                q, k=k, method=method, role=role,
                role_boost=role_boost, match_mode=match_mode,
            )
            for q in queries
        ]
        return ray.get(refs)

    def cache_stats(self) -> list[dict]:
        return ray.get([w.cache_stats.remote() for w in self.workers])

    def shutdown(self) -> None:
        for w in self.workers:
            ray.kill(w)
        self.workers = []
