"""`ray job submit` entrypoint for the index build.

On a real multi-node cluster:

    ray job submit --working-dir . -- python jobs/build_job.py \
        --source s3://bucket/transcripts/ --index s3://bucket/index/v1

In this sandbox Ray runs single-node local; the same script works with
local paths (the job driver owns the session; the library never calls
ray.init).  The build is resumable — re-submitting after a failure skips
finished partitions via the index's build manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--profile", default="simple")
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--n-ranges", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from searchengine_ray.pipelines.build import build_index

    stats = build_index(
        args.source, args.index, profile=args.profile,
        n_shards=args.n_shards, n_ranges=args.n_ranges,
    )
    print(json.dumps(stats))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
