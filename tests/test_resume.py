"""Checkpoint/resume: a rebuild skips finished partitions; invalidating
one partition rebuilds only that partition and downstream stages, and
the final index is semantically identical."""

import json
import os

import pyarrow.dataset as pads

from searchengine_ray.pipelines.build import build_index
from searchengine_ray.sources.transcripts import write_synth_transcripts


def _dictionary(idx):
    t = pads.dataset(f"{idx}/dictionary").to_table()
    return sorted(zip(t["term"].to_pylist(), t["df"].to_pylist(), t["cf"].to_pylist()))


def _stable(stats):
    """Index stats minus the per-run wall-time diagnostics."""
    return {k: v for k, v in stats.items() if k != "stage_sec"}


def test_resume_skips_and_rebuilds(tmp_path):
    src, idx = str(tmp_path / "corpus"), str(tmp_path / "index")
    write_synth_transcripts(src, n_files=4, n_convs=20, turns_per_conv=6, seed=5)

    stats1 = build_index(src, idx, profile="simple")
    dict1 = _dictionary(idx)
    mtimes1 = {f: os.path.getmtime(f"{idx}/tokenized/{f}") for f in os.listdir(f"{idx}/tokenized")}

    # full resume: nothing recomputed
    stats2 = build_index(src, idx, profile="simple")
    mtimes2 = {f: os.path.getmtime(f"{idx}/tokenized/{f}") for f in os.listdir(f"{idx}/tokenized")}
    assert _stable(stats1) == _stable(stats2)
    assert mtimes1 == mtimes2

    # drop one partition record → only that partition re-tokenized
    man_path = f"{idx}/build_manifest.json"
    man = json.load(open(man_path))
    assert "p00001" in man["partitions"]
    del man["partitions"]["p00001"]
    json.dump(man, open(man_path, "w"))
    stats3 = build_index(src, idx, profile="simple")
    mtimes3 = {f: os.path.getmtime(f"{idx}/tokenized/{f}") for f in os.listdir(f"{idx}/tokenized")}
    rebuilt = [f for f in mtimes2 if mtimes3[f] != mtimes2[f]]
    assert rebuilt == ["p00001.parquet"]
    assert _stable(stats3) == _stable(stats1)
    assert _dictionary(idx) == dict1

    # manifest carries lineage + metrics per partition
    man = json.load(open(man_path))
    rec = man["partitions"]["p00001"]
    assert rec["lineage"]["path"].endswith("part-00001.parquet")
    assert rec["metrics"]["rows_in"] > 0 and rec["metrics"]["docs_out"] > 0


def test_removed_input_reconciled(tmp_path):
    """Regression (round-2 ADVICE): deleting an input file between runs
    must not leave ghost tokenized/docstats/runs parts for the stale pid
    — the rebuilt index counts only the surviving documents."""
    src, idx = str(tmp_path / "corpus"), str(tmp_path / "index")
    write_synth_transcripts(src, n_files=4, n_convs=20, turns_per_conv=6, seed=9)
    stats_full = build_index(src, idx, profile="simple")

    # remove the LAST input file: pids of earlier files stay aligned
    removed = sorted(os.listdir(src))[-1]
    os.remove(os.path.join(src, removed))
    stats_less = build_index(src, idx, profile="simple")
    assert stats_less["n_docs"] < stats_full["n_docs"]
    import glob as _glob

    expect = ["p00000.parquet", "p00001.parquet", "p00002.parquet"]
    for pat in ("tokenized/*.parquet", "runs/*/*.parquet", "docstats/*/*.parquet"):
        pids = sorted({os.path.basename(f) for f in _glob.glob(f"{idx}/{pat}")})
        assert pids == expect, pat
    man = json.load(open(f"{idx}/build_manifest.json"))
    assert sorted(man["partitions"]) == ["p00000", "p00001", "p00002"]

    # removing a MIDDLE file shifts every later pid: stale records drop,
    # shifted partitions rebuild, and n_docs matches a fresh build
    middle = sorted(os.listdir(src))[1]
    os.remove(os.path.join(src, middle))
    stats_shift = build_index(src, idx, profile="simple")
    fresh_idx = str(tmp_path / "fresh")
    stats_fresh = build_index(src, fresh_idx, profile="simple")
    assert stats_shift["n_docs"] == stats_fresh["n_docs"]
    assert _dictionary(idx) == _dictionary(fresh_idx)
