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


def _first_nonempty_idx(rows, start=0):
    for i in range(start, len(rows)):
        r = rows[i]
        if r and any(c.strip() for c in r):
            return i
    return None


def read_queries_tsv(path: str) -> pa.Table:
    """TSV queries OR plain one-query-per-line text.

    Routing is by SHAPE, not a byte sniff: the file is TSV only if its
    first non-empty row's first tab-separated field is an integer id (a
    header row counts too, when the row has ≥2 columns).  A plain-text
    query that merely contains a tab must not be misrouted — that used
    to drop the first query as a "header" and then crash on int()."""
    qids, needs, keywords = [], [], []
    with open(path, newline="") as f:
        rows = list(csv.reader(f, delimiter="\t"))
    first_i = _first_nonempty_idx(rows)
    first = rows[first_i] if first_i is not None else None
    # The digit check must sit on a row that itself has ≥2 tab fields:
    # a plain-text file whose first line contains a tab and whose later
    # line is an all-digit QUERY ('2020') must not be classed as TSV.
    # "second" is the first non-empty row strictly AFTER `first` — indexing
    # from first_i+1 (not rows[1:]) so a leading blank line cannot alias
    # `second` to `first` and misroute a headered TSV as plain text.
    second_i = (
        _first_nonempty_idx(rows, first_i + 1) if first_i is not None else None
    )
    second = rows[second_i] if second_i is not None else None
    is_tsv = first is not None and len(first) >= 2 and (
        first[0].strip().isdigit()
        or (second is not None and len(second) >= 2 and second[0].strip().isdigit())
    )
    if is_tsv:
        header = 0 if first[0].strip().isdigit() else 1
        seen_rows = [r for r in rows if r and any(c.strip() for c in r)]
        for r in seen_rows[header:]:
            if not r[0].strip():
                continue
            qids.append(int(r[0]))
            needs.append(r[1] if len(r) > 2 else "")
            keywords.append(r[-1])
    else:
        with open(path) as f:
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
    """CSV qrels ``query, doc, y_true`` — header detection inspects the
    y_true column (column 2, the one the data path reads), skipping
    blank leading rows rather than crashing on them."""
    queries, docs, y = [], [], []
    with open(path, newline="") as f:
        rows = [r for r in csv.reader(f) if r and any(c.strip() for c in r)]
    if not rows:
        return pa.table(
            {
                "query": pa.array([], pa.int64()),
                "doc": pa.array([], pa.string()),
                "y_true": pa.array([], pa.int64()),
            }
        )

    def _numeric(s: str) -> bool:
        try:
            float(s)
            return True
        except ValueError:
            return False

    header = 1 if (len(rows[0]) < 3 or not _numeric(rows[0][2])) else 0
    for r in rows[header:]:
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
    """Tokenized corpus as PLAIN text: one line of space-joined terms per
    turn, with term repetitions preserved (``np.repeat(terms, tfs)`` —
    an embedding trainer needs the counts; within-doc ORDER is the
    index's term order, not the original token stream, a documented
    deviation from ``Part C/preprocessor.py`` whose output is ordered).

    Each Ray block writes one raw ``part-*.txt`` under ``out_dir`` — no
    CSV headers or quoting may pollute the line-per-doc contract."""
    import os
    import uuid

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
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        lines = []
        for terms, tfs in zip(t["terms"].to_pylist(), t["tfs"].to_pylist()):
            words = []
            for term, tf in zip(terms, tfs):
                words.extend([term] * tf)
            lines.append(" ".join(words))
        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.txt")
        with open(name, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    # consume the stream (tiny one-row tables per block)
    tok.map_batches(write_block, batch_format="pyarrow").materialize()
