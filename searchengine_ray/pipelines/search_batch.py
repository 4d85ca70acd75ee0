"""Distributed batch search: a query WORKLOAD as a Ray Data pipeline.

The reference's batch mode (``Part C/search_engine_best.py`` main loop)
and our CLI both iterate queries in one process; for evaluation sweeps
over large query files that is a driver-side loop.  Here the queries
table is itself a Dataset and each actor holds a warm ``QueryEngine``
(dictionary + caches built once per actor in ``__init__``), so a
100k-query workload streams through the actor pool with per-actor cache
reuse — the map_batches version of the serving pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def batch_search(index_dir: str, queries, k: int = 10, profile=None,
                 method: str = "exact", concurrency=(1, 4), batch_size: int = 64):
    """queries: pa.Table / Dataset with (query_id, keywords) →
    Dataset (query_id, rank, conv_id, turn_idx, score)."""
    import ray.data as rd

    class Searcher:
        def __init__(self):
            from .search import QueryEngine

            self.engine = QueryEngine(index_dir, profile=profile)

        def __call__(self, batch: pa.Table) -> pa.Table:
            qids, ranks, convs, turns, scores = [], [], [], [], []
            for qid, kw in zip(
                batch["query_id"].to_pylist(), batch["keywords"].to_pylist()
            ):
                res = self.engine.search(kw, k=k, method=method)
                n = res.num_rows
                qids.extend([qid] * n)
                ranks.extend(range(1, n + 1))
                convs.extend(res["conv_id"].to_pylist())
                turns.extend(res["turn_idx"].to_pylist())
                scores.extend(res["score"].to_pylist())
            return pa.table(
                {
                    # type from the input column: a batch whose queries
                    # all miss would otherwise infer null-typed ids and
                    # break concat/sort/write over mixed-schema blocks
                    "query_id": pa.array(qids, type=batch["query_id"].type),
                    "rank": pa.array(ranks, pa.int32()),
                    "conv_id": pa.array(convs, pa.string()),
                    "turn_idx": pa.array(np.asarray(turns, np.int32), pa.int32()),
                    "score": pa.array(scores, pa.float64()),
                }
            )

    ds = queries if hasattr(queries, "map_batches") else rd.from_arrow(queries)
    return ds.map_batches(
        Searcher, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
