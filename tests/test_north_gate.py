"""The north-rule gates, asserted explicitly:

1. emitted (subj, pred, obj) triples match the reference-derived oracle
   at P/R >= 0.95 (they match exactly — the whole Spark chain is
   value-verified against DuckDB);
2. the end-to-end pipeline job runs and resumes through its checkpoints.
"""

import json
import shutil
import subprocess
import sys

import duckdb

SF = "/root/testdata/sf0.001"


def test_triples_pr_vs_oracle_at_least_095(spark):
    import __spark_entry__ as ent

    qs, oras = ent.queries(), ent.oracle_sql()
    pred = {
        (r.doc_id, r.word_index, r.subj, r.pred, r.obj)
        for r in qs["kg_triples"](spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    gold = {tuple(t) for t in con.execute(oras["kg_triples"]).fetchall()}

    inter = len(pred & gold)
    p = inter / len(pred)
    r = inter / len(gold)
    assert p >= 0.95 and r >= 0.95
    assert p == 1.0 and r == 1.0  # exact, in fact


def test_pipeline_job_runs_and_resumes(tmp_path):
    out = str(tmp_path / "kg")
    cmd = [sys.executable, "scripts/run_pipeline.py", "--sf-dir", SF, "--out", out]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=420, cwd="/root/repo")
    line = [l for l in r1.stdout.splitlines() if l.startswith("PIPELINE_SUMMARY ")]
    assert line, r1.stdout[-2000:] + r1.stderr[-2000:]
    s1 = json.loads(line[0].split(" ", 1)[1])
    assert all(not st["skipped"] for st in s1["stages"].values())
    assert s1["stages"]["triples"]["rows"] > 0

    # crash simulation: lose one bucket of the triples stage
    shutil.rmtree(f"{out}/triples/part_id=3")
    ledger = f"{out}/_lineage/triples.jsonl"
    rows = [json.loads(l) for l in open(ledger)]
    with open(ledger, "w") as f:
        for row in rows:
            if row["part_id"] != 3:
                f.write(json.dumps(row) + "\n")

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=420, cwd="/root/repo")
    line = [l for l in r2.stdout.splitlines() if l.startswith("PIPELINE_SUMMARY ")]
    s2 = json.loads(line[0].split(" ", 1)[1])
    assert s2["stages"]["triples"]["processed"] == [3]       # only the lost bucket
    assert s2["stages"]["tokens"]["skipped"] is True         # everything else skips
    assert s2["stages"]["triples"]["rows"] == s1["stages"]["triples"]["rows"]
