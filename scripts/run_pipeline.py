"""End-to-end KG construction job — the spark-submit ship path.

    spark-submit --master ... --py-files engine.zip scripts/run_pipeline.py \
        [--sf-dir /root/testdata/sf0.001] [--out /tmp/kg_out] \
        [--buckets 8] [--run-id r1]

Stages (each one checkpointed via plans/checkpoint.py: bucketed parquet +
per-partition lineage; a rerun after a crash recomputes only the missing
buckets):

    tokens        documents -> long token table
    labels        mention detection (mapInPandas model stage)
    triples       SVO relation extraction
    triple_counts aggregate over the *checkpointed* triples table
    nodes/edges   entity-linked graph materialization

Prints one JSON summary line (stages processed/skipped, row counts,
lineage) — rerunning with the same --out is the resume path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/kg_out")
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--run-id", default="r1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from hebrew_ner_spark.operators import kg, linking, mentions
    from hebrew_ner_spark.plans import checkpoint
    from hebrew_ner_spark.sources.catalog import load_table

    # under spark-submit the session exists; standalone we build one
    spark = SparkSession.builder.getOrCreate()
    docs = load_table(spark, args.sf_dir, "documents")

    summary: dict = {"out": args.out, "run_id": args.run_id, "stages": {}}

    def stage(name, df, key):
        r = checkpoint.run_stage(
            df, args.out, name, key=key, n_buckets=args.buckets, run_id=args.run_id
        )
        n = checkpoint.read_stage(spark, args.out, name).count()
        summary["stages"][name] = {
            "skipped": r["skipped"], "processed": r["processed"], "rows": n,
        }

    stage("tokens", kg.doc_tokens(docs), key="doc_id")
    stage("labels", mentions.detect_mentions(docs), key="doc_id")
    stage("triples", kg.doc_triples(docs), key="doc_id")

    # downstream consumes the CHECKPOINT, not the source — the cross-stage
    # resume contract
    triples = checkpoint.read_stage(spark, args.out, "triples")
    from pyspark.sql import functions as F

    counts = triples.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("n_evidence")
    )
    stage("triple_counts", counts, key="subj")

    stage("nodes", linking.kg_nodes(docs), key="entity_id")
    stage("edges", linking.kg_edges(docs), key="subj_id")

    summary["lineage_rows"] = sum(
        len(checkpoint.read_lineage(args.out, s)) for s in summary["stages"]
    )

    # Publish the materialized graph as an immutable snapshot version
    # (plans/snapshots.py). Only tables whose stage actually PROCESSED
    # buckets are rewritten — unchanged tables carry the parent manifest's
    # pointers forward (metadata-only commit). Two recovery paths:
    # * no version exists yet (first run, or a crash during a previous
    #   publish after all stages checkpointed): publish both tables;
    # * repair rerun where the graph stages all skipped: publish nothing,
    #   the current version already describes this data.
    from hebrew_ner_spark.plans import snapshots as snap

    graph_root = os.path.join(args.out, "graph")
    publish = {
        t: checkpoint.read_stage(spark, args.out, t)
        for t in ("nodes", "edges")
        if not summary["stages"][t]["skipped"]
    }
    cur = snap.current_version(graph_root)
    if cur is None:
        publish = {
            t: checkpoint.read_stage(spark, args.out, t) for t in ("nodes", "edges")
        }
    version = snap.commit_snapshot(graph_root, publish) if publish else cur
    summary["graph_snapshot_version"] = version
    print("PIPELINE_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
