"""Optimistic-concurrency commit validation (the Iceberg commit
protocol's conflict check, engine-side).

A lakehouse table serializes commits optimistically: a writer stages
changes against a BASE snapshot, and at commit time validates that no
commit it did not see (sequence in (base, now)) already deleted a file
it intends to delete — if one did, the commit FAILS and must rebase.
Failures cascade: a failed commit's deletes never happened, so they
block nobody downstream. That failure-awareness makes validation a
SEQUENTIAL fold over each table's commit log — which is exactly the
Iceberg reality (one table = one serialized log) — while tables are
independent, so the engine shape is a grouped fold: ``applyInPandas``
per table over logs that are metadata-sized by construction (a log of
millions would mean millions of snapshots — compaction debt, not a
scan problem).

The DuckDB oracle unrolls the fold: per-step CTEs carry the success
decisions of commits 0..k-1 into step k's conflict check (bounded
COMMITS_PER_TABLE steps), the opposite construction to the Python fold.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_col

COMMITS_PER_TABLE = 6
FILES_PER_COMMIT = 3
CL_SEED = 109


def synth_commit_log(docs: DataFrame) -> DataFrame:
    """(table_id, seq, base, file_id, action) — a deterministic
    multi-table commit log with real contention: each doc contributes
    one commit (table = doc_id DIV COMMITS_PER_TABLE, seq = doc_id %
    COMMITS_PER_TABLE), staged against base = seq - 1 - (h % 3 lag), so
    many commits are stale by 1-2 sequences; each commit deletes
    FILES_PER_COMMIT files drawn from a small per-table pool (collisions
    guaranteed) and adds one fresh file."""
    h = phash_col(F.col("doc_id").cast("string"), CL_SEED)
    base = docs.select(
        F.expr(f"doc_id DIV {COMMITS_PER_TABLE}").alias("table_id"),
        (F.col("doc_id") % COMMITS_PER_TABLE).cast("long").alias("seq"),
        F.greatest(
            F.lit(-1).cast("long"),
            (F.col("doc_id") % COMMITS_PER_TABLE) - 1 - (h % 3),
        ).alias("base"),
        h.alias("_h"),
    )
    dels = base.select(
        "table_id",
        "seq",
        "base",
        F.explode(F.expr(f"sequence(0, {FILES_PER_COMMIT - 1})")).alias("k"),
    ).select(
        "table_id",
        "seq",
        "base",
        F.expr(
            # per-table pool of 8 files; draw depends on (seq, k)
            "concat('f', CAST((seq * 5 + k * 3 + table_id) % 8 AS STRING))"
        ).alias("file_id"),
        F.lit("del").alias("action"),
    )
    adds = base.select(
        "table_id",
        "seq",
        "base",
        F.concat(F.lit("new"), F.col("seq").cast("string")).alias("file_id"),
        F.lit("add").alias("action"),
    )
    return dels.unionByName(adds)


def validate_commits(log: DataFrame) -> DataFrame:
    """(table_id, seq, ok) — the serialized validation verdict per
    commit: ok = 0 iff some SUCCESSFUL commit with base < seq' < seq
    already deleted a file this commit deletes. One applyInPandas per
    table (the log is metadata-sized; tables are the parallel grain)."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        tbl = int(pdf["table_id"].iloc[0])
        by_seq: dict[int, dict] = {}
        for _, r in pdf.iterrows():
            c = by_seq.setdefault(
                int(r["seq"]), {"base": int(r["base"]), "dels": set()}
            )
            if r["action"] == "del":
                c["dels"].add(r["file_id"])
        deleted_at: dict[str, list[int]] = {}
        out = []
        for seq in sorted(by_seq):
            c = by_seq[seq]
            conflict = any(
                any(c["base"] < s < seq for s in deleted_at.get(f, []))
                for f in c["dels"]
            )
            ok = 0 if conflict else 1
            if ok:
                for f in c["dels"]:
                    deleted_at.setdefault(f, []).append(seq)
            out.append((tbl, seq, ok))
        return pd.DataFrame(out, columns=["table_id", "seq", "ok"])

    return log.groupBy("table_id").applyInPandas(
        fold, "table_id long, seq long, ok long"
    )
