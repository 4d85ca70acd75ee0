"""CLI surface via real subprocesses (own Ray sessions)."""

import json
import os
import subprocess
import sys

import pytest

from searchengine_ray.sources.transcripts import write_synth_transcripts

ENV = dict(os.environ, RAY_GRAFT_CPUS="4", PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "searchengine_ray.cli", *args],
        capture_output=True, text=True, env=ENV, cwd=REPO, timeout=300,
    )


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    src, idx = str(root / "c"), str(root / "i")
    write_synth_transcripts(src, n_files=2, n_convs=8, turns_per_conv=4, seed=3)
    r = run_cli("build", "--source", src, "--index", idx)
    assert r.returncode == 0, r.stderr[-800:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["n_docs"] > 0
    return root, idx


def test_cli_search(built):
    _, idx = built
    r = run_cli("search", "--index", idx, "--query", "index merge", "--k", "3")
    assert r.returncode == 0, r.stderr[-500:]
    lines = [l for l in r.stdout.strip().splitlines() if "\t" in l]
    assert 1 <= len(lines) <= 3
    conv, turn, score = lines[0].split("\t")
    assert float(score) > 0


def test_cli_append_search(built):
    root, idx = built
    extra = str(root / "extra")
    write_synth_transcripts(extra, n_files=1, n_convs=4, turns_per_conv=3,
                            seed=9, conv_prefix="x_")
    r = run_cli("append", "--source", extra, "--index", idx)
    assert r.returncode == 0, r.stderr[-800:]
    seg = json.loads(r.stdout.strip().splitlines()[-1])["segment"]
    assert os.path.isdir(seg)
    r = run_cli("search", "--index", idx, "--query", "index merge", "--k", "5")
    assert r.returncode == 0, r.stderr[-500:]
    assert any("\t" in l for l in r.stdout.strip().splitlines())


def test_cli_batch(built):
    root, idx = built
    qfile = root / "queries.tsv"
    qfile.write_text("query_id\tneed\tkeywords\n1\tx\tindex merge\n")
    out = root / "results.csv"
    r = run_cli("batch", "--index", idx, "--queries", str(qfile), "--out", str(out), "--k", "3")
    assert r.returncode == 0, r.stderr[-500:]
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "query,doc,rank" and len(lines) > 1


def test_queries_reader_routing_and_blank_rows(tmp_path):
    """Shape-based TSV routing: plain text containing a tab is NOT
    misrouted (used to drop line 1 as a 'header' then crash on int);
    blank leading rows never IndexError."""
    from searchengine_ray.sources.queries_file import (read_labels_csv,
                                                       read_queries_tsv)

    p = tmp_path / "plain.txt"
    p.write_text("covid cases\tnew york\nvaccine rollout\n")
    t = read_queries_tsv(str(p))
    assert t["query_id"].to_pylist() == [1, 2]
    assert t["keywords"].to_pylist() == ["covid cases\tnew york", "vaccine rollout"]

    # tab in line 1 AND an all-digit later QUERY ('2020'): still plain
    # text — the digit check must sit on a row with >=2 tab fields
    p1b = tmp_path / "plain_digit.txt"
    p1b.write_text("covid cases\tnew york\n2020\nvaccine rollout\n")
    t1b = read_queries_tsv(str(p1b))
    assert t1b["query_id"].to_pylist() == [1, 2, 3]
    assert t1b["keywords"].to_pylist() == [
        "covid cases\tnew york", "2020", "vaccine rollout"]

    p2 = tmp_path / "hdr.tsv"
    p2.write_text("query_id\tneed\tkeywords\n1\ta\tcovid cases\n2\tb\tvax\n")
    t2 = read_queries_tsv(str(p2))
    assert t2["query_id"].to_pylist() == [1, 2]
    assert t2["keywords"].to_pylist() == ["covid cases", "vax"]

    p3 = tmp_path / "blank.tsv"
    p3.write_text("\n1\tneed\tcovid cases\n")
    assert read_queries_tsv(str(p3)).num_rows == 1

    # leading blank line BEFORE a headered TSV: `second` must be the row
    # AFTER the header, not the header aliased to itself via rows[1:] —
    # aliasing misrouted this file as plain text (header became query 1)
    p4 = tmp_path / "blank_hdr.tsv"
    p4.write_text("\nquery_id\tneed\tkeywords\n1\ta\tcovid cases\n2\tb\tvax\n")
    t4 = read_queries_tsv(str(p4))
    assert t4["query_id"].to_pylist() == [1, 2]
    assert t4["keywords"].to_pylist() == ["covid cases", "vax"]

    l1 = tmp_path / "l.csv"
    l1.write_text("\nquery,doc,y_true\n1,c0:1,1\n2,c1:0,0\n")
    lt = read_labels_csv(str(l1))
    assert lt["query"].to_pylist() == [1, 2] and lt["y_true"].to_pylist() == [1, 0]
    l2 = tmp_path / "l4.csv"
    l2.write_text("1,c0:1,1,free-text comment\n")
    lt2 = read_labels_csv(str(l2))
    assert lt2.num_rows == 1 and lt2["y_true"].to_pylist() == [1]
