"""Resumability tests (SURVEY.md §5 item 4): kill-after-stage-k semantics
simulated by deleting lineage rows + partition dirs, then asserting that a
rerun recomputes only the missing buckets and the final table is
identical to a from-scratch run."""

import json
import os
import shutil

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg
from hebrew_ner_spark.plans import checkpoint

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return kg.doc_tokens(docs)


def test_stage_runs_then_skips(spark, tmp_path):
    out = str(tmp_path / "wh")
    df = _tokens(spark)
    r1 = checkpoint.run_stage(df, out, "tokens", key="doc_id", n_buckets=4)
    assert r1["processed"] == [0, 1, 2, 3]
    r2 = checkpoint.run_stage(df, out, "tokens", key="doc_id", n_buckets=4)
    assert r2["skipped"] is True

    written = checkpoint.read_stage(spark, out, "tokens")
    assert written.count() == df.count()


def test_resume_recomputes_only_missing_buckets(spark, tmp_path):
    out = str(tmp_path / "wh")
    df = _tokens(spark)
    checkpoint.run_stage(df, out, "tokens", key="doc_id", n_buckets=4, run_id="r1")
    full = checkpoint.read_stage(spark, out, "tokens").toPandas()

    # simulate a crash that lost buckets 1 and 3
    ledger = checkpoint._lineage_path(out, "tokens")
    rows = [json.loads(l) for l in open(ledger)]
    keep = [r for r in rows if r["part_id"] not in (1, 3)]
    with open(ledger, "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    for b in (1, 3):
        shutil.rmtree(os.path.join(out, "tokens", f"part_id={b}"))

    r = checkpoint.run_stage(df, out, "tokens", key="doc_id", n_buckets=4, run_id="r2")
    assert r["processed"] == [1, 3]

    resumed = checkpoint.read_stage(spark, out, "tokens").toPandas()
    key = ["doc_id", "word_index"]
    assert (
        resumed.sort_values(key).reset_index(drop=True)[["doc_id", "word_index", "token"]]
        .equals(full.sort_values(key).reset_index(drop=True)[["doc_id", "word_index", "token"]])
    )

    # lineage records which run recomputed what
    m = checkpoint.stage_metrics(spark, out, "tokens").toPandas()
    assert set(m[m.run_id == "r2"].part_id) == {1, 3}
    assert set(m.part_id) == {0, 1, 2, 3}


def test_bucket_assignment_deterministic(spark):
    df = _tokens(spark)
    a = checkpoint.with_bucket(df, "doc_id", 8).groupBy("part_id").count().toPandas()
    b = checkpoint.with_bucket(df, "doc_id", 8).groupBy("part_id").count().toPandas()
    assert a.sort_values("part_id").equals(b.sort_values("part_id"))
