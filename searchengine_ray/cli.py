"""Command-line entry points (own their Ray session, unlike the library).

    python -m searchengine_ray.cli build   --source DIR --index DIR [--profile P]
    python -m searchengine_ray.cli append  --source DIR --index DIR [--profile P]
    python -m searchengine_ray.cli compact --index DIR --sources DIR [DIR ...]
    python -m searchengine_ray.cli search  --index DIR --query "..." [--k N] [--wand]
    python -m searchengine_ray.cli batch   --index DIR --queries FILE --out results.csv

``search`` transparently fans out across delta segments when the index
has been appended to (segments.json present).
"""

from __future__ import annotations

import argparse
import json
import os


def _print_results(res) -> None:
    """The tab-separated stdout contract, shared by every search path."""
    for c, t, sc in zip(
        res["conv_id"].to_pylist(), res["turn_idx"].to_pylist(),
        res["score"].to_pylist(),
    ):
        print(f"{c}\t{t}\t{sc:.6f}")


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="searchengine_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index from transcript parquet")
    b.add_argument("--source", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--profile", default="simple")
    b.add_argument("--no-resume", action="store_true")

    a2 = sub.add_parser("append", help="append new input files as a delta segment")
    a2.add_argument("--source", required=True)
    a2.add_argument("--index", required=True)
    a2.add_argument("--profile", default="simple")

    cp = sub.add_parser("compact", help="rebuild one index from segment sources")
    cp.add_argument("--index", required=True, help="output index dir")
    cp.add_argument("--sources", required=True, nargs="+")
    cp.add_argument("--profile", default="simple")

    s = sub.add_parser("search", help="query an index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--wand", action="store_true")
    s.add_argument("--role")

    q = sub.add_parser("batch", help="run a queries file, write results CSV")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--k", type=int, default=10)

    args = ap.parse_args(argv)

    if args.cmd == "build":
        ray = _ray_session()
        from .pipelines.build import build_index

        stats = build_index(
            args.source, args.index, profile=args.profile, resume=not args.no_resume
        )
        print(json.dumps(stats))
        ray.shutdown()
        return 0

    if args.cmd == "append":
        ray = _ray_session()
        from .pipelines.incremental import append_index

        seg = append_index(args.source, args.index, profile=args.profile)
        print(json.dumps({"segment": seg}))
        ray.shutdown()
        return 0

    if args.cmd == "compact":
        ray = _ray_session()
        from .pipelines.incremental import compact_index

        compact_index(args.sources, args.index, profile=args.profile)
        print(json.dumps({"index": args.index}))
        ray.shutdown()
        return 0

    if args.cmd == "search":
        from .pipelines.incremental import MultiIndexEngine, segment_dirs
        from .pipelines.search import QueryEngine

        if len(segment_dirs(args.index)) > 1:
            # segmented: exact scoring (--wand degrades to exact), --role
            # kept.  Own the Ray session: a large segmented dictionary
            # makes global_stats fall back to a Ray Data groupby, which
            # would otherwise auto-init an unconfigured session
            ray = _ray_session()
            qe = MultiIndexEngine(args.index)
            res = qe.search(args.query, k=args.k, role=args.role)
            _print_results(res)
            ray.shutdown()
            return 0
        qe = QueryEngine(args.index)
        res = qe.search(
            args.query, k=args.k,
            method="wand" if args.wand else "exact", role=args.role,
        )
        _print_results(res)
        return 0

    if args.cmd == "batch":
        ray = _ray_session()
        from .pipelines.search_batch import batch_search
        from .sources.queries_file import read_queries_tsv, write_results_csv

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        queries = read_queries_tsv(args.queries)
        refs = batch_search(args.index, queries, k=args.k).to_arrow_refs()
        tbls = [t for t in ray.get(refs) if t.num_rows]
        results = {}
        if tbls:
            # one global sort + group slicing (not a filter per query id)
            flat = pa.concat_tables(tbls)
            order = pc.sort_indices(
                flat, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]
            )
            flat = flat.take(order)
            qcol = flat["query_id"].to_numpy(zero_copy_only=False)
            bounds = np.flatnonzero(
                np.concatenate([[True], qcol[1:] != qcol[:-1]])
            ).tolist() + [len(qcol)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                results[qcol[s]] = flat.slice(s, e - s).select(
                    ["conv_id", "turn_idx", "score"]
                )
        write_results_csv(args.out, results)
        # count per INPUT ROW (duplicate qids collapse in the results
        # dict, which used to inflate the empty count)
        n_empty = sum(
            1 for q in queries["query_id"].to_pylist() if q not in results
        )
        print(f"wrote {args.out} ({queries.num_rows - n_empty} of {queries.num_rows} "
              f"query rows with hits; {n_empty} returned no results)")
        ray.shutdown()
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
