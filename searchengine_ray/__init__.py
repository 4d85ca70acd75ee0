"""searchengine_ray — a Ray-Data-native full-text index build + BM25 query engine.

A from-scratch rebuild of the capabilities of GuyShimony/SearchEngine
(reference at /root/reference, studied for behavior only) re-expressed as
Ray Data pipelines:

- tokenization runs as ``map_batches`` over zero-copy Arrow batches
  (vectorized simple profile; compiled-regex actor pool for the
  reference-parity profile),
- per-partition posting-run construction + a ``groupby(term)`` merge
  shuffle produce a sharded, delta+varbyte-compressed inverted index,
- query-time BM25/inner-product scoring reproduces the reference's exact
  formulas (``Part C/ranker.py:62-86``, ``Part C/searcher.py``).

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, tests, bench.py).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy public API (keeps `import searchengine_ray` free of ray/pyarrow
    # import cost until a symbol is actually used)
    if name == "build_index":
        from .pipelines.build import build_index

        return build_index
    if name == "compute_doc_weights":
        from .pipelines.build import compute_doc_weights

        return compute_doc_weights
    if name == "QueryEngine":
        from .pipelines.search import QueryEngine

        return QueryEngine
    if name == "PROFILES":
        from .profiles import PROFILES

        return PROFILES
    if name == "SearchService":
        from .pipelines.serve import SearchService

        return SearchService
    if name == "MultiIndexEngine":
        from .pipelines.incremental import MultiIndexEngine

        return MultiIndexEngine
    if name == "append_index":
        from .pipelines.incremental import append_index

        return append_index
    if name == "compact_index":
        from .pipelines.incremental import compact_index

        return compact_index
    if name == "maybe_compact":
        from .pipelines.incremental import maybe_compact

        return maybe_compact
    if name == "batch_search":
        from .pipelines.search_batch import batch_search

        return batch_search
    if name == "ConversationSearch":
        from .pipelines.search import ConversationSearch

        return ConversationSearch
    raise AttributeError(name)
