"""Structured-Streaming incremental tests: exactly-once file ingestion
through the batch stage kernels, and watermarked event-time windows."""

import os
import shutil

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg, relational
from hebrew_ner_spark.streaming import incremental

SF = "/root/testdata/sf0.001"


def test_incremental_triples_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    half1 = docs.where("doc_id % 2 = 0")
    half2 = docs.where("doc_id % 2 = 1")
    half1.coalesce(1).write.parquet(str(tmp_path / "h1"))
    half2.coalesce(1).write.parquet(str(tmp_path / "h2"))

    def land(tmp_dir, name):
        part = [f for f in os.listdir(tmp_dir) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp_dir, part), os.path.join(src, name))

    # first drain: only half1 has landed
    land(str(tmp_path / "h1"), "f1.parquet")
    n1 = incremental.run_incremental_triples(spark, src, out, ckpt)
    assert n1 >= 1
    got1 = spark.read.parquet(f"{out}/triples").count()
    assert got1 == kg.doc_triples(half1).count()

    # second drain: half2 lands; the file-source checkpoint must skip f1
    land(str(tmp_path / "h2"), "f2.parquet")
    incremental.run_incremental_triples(spark, src, out, ckpt)
    got2 = spark.read.parquet(f"{out}/triples").count()
    assert got2 == kg.doc_triples(docs).count()

    # third drain with nothing new: no additional rows
    incremental.run_incremental_triples(spark, src, out, ckpt)
    assert spark.read.parquet(f"{out}/triples").count() == got2


def test_incremental_sink_is_idempotent_under_replay(spark, tmp_path):
    """Exactly-once: replaying the same micro-batches (checkpoint lost,
    files re-read in the same order) must overwrite the per-batch
    directories, not duplicate rows — a plain append sink would double
    the output here."""
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    docs = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id < 40")
    docs.coalesce(1).write.parquet(str(tmp_path / "h"))
    part = [f for f in os.listdir(str(tmp_path / "h")) if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(str(tmp_path / "h"), part), os.path.join(src, "f.parquet"))

    incremental.run_incremental_triples(spark, src, out, ckpt)
    first = spark.read.parquet(f"{out}/triples").count()
    assert first == kg.doc_triples(docs).count()

    # simulate a crash that lost the streaming checkpoint: full replay
    shutil.rmtree(ckpt)
    incremental.run_incremental_triples(spark, src, out, ckpt)
    assert spark.read.parquet(f"{out}/triples").count() == first

    # harder replay: a second file had landed (two batches written), then
    # the checkpoint is lost — the restarted numbering must not leave the
    # old batch_id=1 directory double-counting rows
    docs2 = spark.read.parquet(f"{SF}/documents.parquet").where(
        "doc_id >= 40 AND doc_id < 60"
    )
    docs2.coalesce(1).write.parquet(str(tmp_path / "h2"))
    part2 = [f for f in os.listdir(str(tmp_path / "h2")) if f.endswith(".parquet")][0]
    shutil.copy(
        os.path.join(str(tmp_path / "h2"), part2), os.path.join(src, "g.parquet")
    )
    incremental.run_incremental_triples(spark, src, out, ckpt)
    both = kg.doc_triples(docs.unionByName(docs2)).count()
    assert spark.read.parquet(f"{out}/triples").count() == both
    shutil.rmtree(ckpt)
    incremental.run_incremental_triples(spark, src, out, ckpt)
    assert spark.read.parquet(f"{out}/triples").count() == both


def test_windowed_event_counts_match_batch_up_to_watermark(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", os.path.join(src, "e1.parquet"))

    incremental.run_windowed_event_counts(spark, src, out, ckpt)
    got = {
        (r.hour_ms, r.event_type): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    assert got, "no windows emitted"

    batch = {
        (r.hour_ms, r.event_type): r.n_events
        for r in relational.hourly_event_counts(
            spark.read.parquet(f"{SF}/events.parquet")
        ).collect()
    }
    # append mode emits only watermark-closed windows: emitted subset must
    # match batch exactly, and cover everything older than the last ~3h
    for k, v in got.items():
        assert batch[k] == v
    assert len(got) >= 0.5 * len(batch)
