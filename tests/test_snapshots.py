"""Snapshot commit / time-travel / crash-safety semantics."""

from __future__ import annotations

import json
import os

import pytest

from hebrew_ner_spark.plans import snapshots as snap


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, n long")


def test_commit_and_read_roundtrip(spark, tmp_path):
    root = str(tmp_path)
    v1 = snap.commit_snapshot(root, {"edges": _df(spark, [("a", 1), ("b", 2)])})
    assert v1 == 1 and snap.current_version(root) == 1
    got = {(r.k, r.n) for r in snap.read_snapshot(spark, root, "edges").collect()}
    assert got == {("a", 1), ("b", 2)}


def test_time_travel_reads_old_version_after_new_commit(spark, tmp_path):
    root = str(tmp_path)
    snap.commit_snapshot(root, {"edges": _df(spark, [("a", 1)])})
    snap.commit_snapshot(root, {"edges": _df(spark, [("a", 9), ("z", 5)])})
    assert snap.current_version(root) == 2
    old = {(r.k, r.n) for r in snap.read_snapshot(spark, root, "edges", version=1).collect()}
    new = {(r.k, r.n) for r in snap.read_snapshot(spark, root, "edges").collect()}
    assert old == {("a", 1)} and new == {("a", 9), ("z", 5)}


def test_unchanged_table_carries_forward(spark, tmp_path):
    root = str(tmp_path)
    snap.commit_snapshot(
        root, {"edges": _df(spark, [("a", 1)]), "nodes": _df(spark, [("n", 7)])}
    )
    snap.commit_snapshot(root, {"edges": _df(spark, [("b", 2)])})
    m2 = snap.read_manifest(root, 2)
    assert m2["tables"]["nodes"]["written_at"] == 1  # pointer reuse, no rewrite
    nodes = {(r.k, r.n) for r in snap.read_snapshot(spark, root, "nodes").collect()}
    assert nodes == {("n", 7)}


def test_crash_before_hint_flip_is_invisible(spark, tmp_path, monkeypatch):
    root = str(tmp_path)
    snap.commit_snapshot(root, {"edges": _df(spark, [("a", 1)])})

    real_replace = os.replace

    def boom(src, dst):
        raise OSError("simulated crash before root-pointer swap")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError):
        snap.commit_snapshot(root, {"edges": _df(spark, [("bad", 0)])})
    monkeypatch.setattr(os, "replace", real_replace)

    # The failed v2 never became current; readers still see v1.
    assert snap.current_version(root) == 1
    got = {(r.k, r.n) for r in snap.read_snapshot(spark, root, "edges").collect()}
    assert got == {("a", 1)}

    # RECOVERY: the rerun recomputes the same version number and must
    # overwrite the orphaned half-written v2 data, not crash on it.
    v2 = snap.commit_snapshot(root, {"edges": _df(spark, [("good", 2)])})
    assert v2 == 2 and snap.current_version(root) == 2
    got = {(r.k, r.n) for r in snap.read_snapshot(spark, root, "edges").collect()}
    assert got == {("good", 2)}


def test_snapshot_log_lists_history(spark, tmp_path):
    root = str(tmp_path)
    snap.commit_snapshot(root, {"edges": _df(spark, [("a", 1)])})
    snap.commit_snapshot(root, {"edges": _df(spark, [("b", 2)])})
    log = snap.snapshot_log(root)
    assert [m["version"] for m in log] == [1, 2]
    assert log[1]["parent"] == 1
    assert log[0]["tables"]["edges"]["n_rows"] == 1


def test_fresh_root_read_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, str(tmp_path), "edges")
