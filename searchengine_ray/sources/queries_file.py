"""Query/label file readers and result sinks (reference S3/S4/K3/K4).

- ``read_queries_tsv``: TSV with ``query_id, information_need, keywords``
  (reference ``Part C/test_part_c_students_old.py:66``); also accepts
  plain one-query-per-line text (``Part A/search_engine.py:92-94``).
- ``read_labels_csv``: CSV ``query, doc, y_true`` qrels
  (``test_part_c_students_old.py:54-56``).
- ``write_results_csv``: ranked results sink
  (``Part A/search_engine.py:96-112``, ``Part C/search_engine_4.py:167-175``).
- ``write_preprocessed_text``: one line of space-joined terms per doc
  (``Part C/preprocessor.py:39-64``) — the corpus-for-embedding-training
  sink, here a Ray Data pipeline.

Queries/labels are tiny driver-side tables; corpus-sized sinks stream.
"""

from __future__ import annotations

import csv

import pyarrow as pa


def read_queries_tsv(path: str) -> pa.Table:
    qids, needs, keywords = [], [], []
    with open(path, newline="") as f:
        sample = f.read(4096)
        f.seek(0)
        if "\t" in sample:
            rows = list(csv.reader(f, delimiter="\t"))
            header = 0
            if rows and not rows[0][0].strip().isdigit():
                header = 1  # skip header row
            for r in rows[header:]:
                if not r or not r[0].strip():
                    continue
                qids.append(int(r[0]))
                needs.append(r[1] if len(r) > 2 else "")
                keywords.append(r[-1])
        else:
            for i, line in enumerate(f):
                line = line.strip()
                if line:
                    qids.append(i + 1)
                    needs.append("")
                    keywords.append(line)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "information_need": pa.array(needs, pa.string()),
            "keywords": pa.array(keywords, pa.string()),
        }
    )


def read_labels_csv(path: str) -> pa.Table:
    queries, docs, y = [], [], []
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
        header = 1 if rows and not rows[0][-1].strip().lstrip("-").isdigit() else 0
        for r in rows[header:]:
            if not r:
                continue
            queries.append(int(r[0]))
            docs.append(r[1])
            y.append(int(float(r[2])))
    return pa.table(
        {
            "query": pa.array(queries, pa.int64()),
            "doc": pa.array(docs, pa.string()),
            "y_true": pa.array(y, pa.int64()),
        }
    )


def write_results_csv(path: str, results: dict[int, pa.Table]) -> None:
    """{query_id: ranked result table (conv_id, turn_idx, score)} → CSV
    rows (query, doc, rank) like the reference's Results.csv."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query", "doc", "rank"])
        for qid in sorted(results):
            t = results[qid]
            for rank, (c, ti) in enumerate(
                zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()), start=1
            ):
                w.writerow([qid, f"{c}:{ti}", rank])


def write_preprocessed_text(sf_dir_or_ds, out_dir: str, profile: str = "simple") -> None:
    """Tokenized corpus as text: one line of space-joined terms per turn."""
    import ray.data as rd

    from ..sources.transcripts import transcripts_from_documents
    from ..stages.tokenize import TokenizeStage

    ds = (
        transcripts_from_documents(sf_dir_or_ds)
        if isinstance(sf_dir_or_ds, str)
        else sf_dir_or_ds
    )
    tok = ds.map_batches(
        TokenizeStage, fn_constructor_args=(profile,), batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def join_terms(t: pa.Table) -> pa.Table:
        lines = [" ".join(terms) for terms in t["terms"].to_pylist()]
        return pa.table({"text": pa.array(lines, pa.string())})

    tok.map_batches(join_terms, batch_format="pyarrow").write_csv(out_dir)
