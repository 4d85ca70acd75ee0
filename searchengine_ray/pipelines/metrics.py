"""IR evaluation metrics — rebuild of reference ``Part C/metrics.py``.

Semantics preserved exactly:
- ``precision``: per-query mean of y_true, macro-averaged (metrics.py:19);
- ``precision_at_n``: head-slice precision (metrics.py:60) — the slice is
  in result-rank order;
- ``recall``: per-query Σy_true / n_relevant, macro-averaged
  (metrics.py:36-47);
- ``mean_average_precision``: per query, average of P@(position of each
  relevant result); a query present in the frame with no relevant rows
  contributes 0, and — reference-exactly (metrics.py:65-80 divides by
  the number of queries PRESENT in the df) — a query that joined zero
  qrel rows drops out of the MAP/precision denominators entirely, while
  p@n and recall average over ALL queries.

``evaluate`` reproduces the golden harness join: inner-join ranked
results with the qrels on (query, doc)
(``Part C/test_part_c_students_old.py:156-157``).
"""

from __future__ import annotations

import pandas as pd


def precision(df: pd.DataFrame, single: bool = False, query_number=None) -> float:
    if single:
        sub = df[df["query"] == query_number]
        return float(sub["y_true"].mean()) if len(sub) else 0.0
    return float(df.groupby("query")["y_true"].mean().mean())


def precision_at_n(df: pd.DataFrame, query_number, n: int = 5) -> float:
    sub = df[df["query"] == query_number][:n]
    return float(sub["y_true"].mean()) if len(sub) else 0.0


def recall_single(df: pd.DataFrame, num_relevant: int, query_number) -> float:
    sub = df[df["query"] == query_number]
    return float(sub["y_true"].sum() / num_relevant) if num_relevant else 0.0


def recall(df: pd.DataFrame, num_relevant: dict) -> float:
    return sum(recall_single(df, n, q) for q, n in num_relevant.items()) / len(num_relevant)


def average_precision(df: pd.DataFrame, query_number) -> float:
    sub = df[df["query"] == query_number].reset_index(drop=True)
    hits = sub.index[sub["y_true"] == 1].tolist()
    if not hits:
        return 0.0
    return sum(precision_at_n(sub, query_number, i + 1) for i in hits) / len(hits)


def mean_average_precision(df: pd.DataFrame) -> float:
    queries = df["query"].unique()
    if len(queries) == 0:
        return 0.0
    return sum(average_precision(df, q) for q in queries) / len(queries)


def evaluate(results: dict[int, "pa.Table"], labels: pd.DataFrame) -> dict:
    """Join ranked engine results with qrels and compute the metric block
    the reference's harness range-checks (test_part_c_students_old.py:165-195)."""
    rows = []
    for qid, t in results.items():
        for rank, (c, ti) in enumerate(
            zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()), start=1
        ):
            rows.append({"query": qid, "doc": f"{c}:{ti}", "rank": rank})
    res = pd.DataFrame(rows, columns=["query", "doc", "rank"])
    joined = res.merge(labels, how="inner", on=["query", "doc"]).sort_values(
        ["query", "rank"], kind="mergesort"
    )
    n_rel = labels[labels["y_true"] == 1].groupby("query").size().to_dict()
    n_rel = {q: n_rel.get(q, 0) for q in results}
    return {
        "precision": precision(joined) if len(joined) else 0.0,
        "precision@5": (
            sum(precision_at_n(joined, q, 5) for q in results) / len(results)
            if results else 0.0
        ),
        "precision@10": (
            sum(precision_at_n(joined, q, 10) for q in results) / len(results)
            if results else 0.0
        ),
        "recall": recall(joined, n_rel) if len(joined) else 0.0,
        "MAP": mean_average_precision(joined),
        "n_joined": int(len(joined)),
    }
