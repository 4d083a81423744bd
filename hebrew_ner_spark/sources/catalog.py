"""Table catalog: scans and sinks.

In production every stage reads/writes Iceberg tables
(``spark.read.format("iceberg")``) bucketed by ``bucket(N, url)`` so stage
boundaries don't reshuffle, with snapshot ids recorded in the lineage ledger
(see plans/checkpoint.py). The sandbox has no Iceberg runtime jar, so this
module speaks parquet with the same layout and the same call signatures —
swapping the format string is the only change needed on a cluster.

Reference scans S1-S5 (utils/ner.py:32-115, utils/yap.py:138-161) are file/
HTTP parsers; here every source is a columnar table scan so Catalyst gets
predicate pushdown and column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated synthetic warehouse (TESTDATA.md).
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one warehouse table. Parquet here; Iceberg in production."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Checkpoint/materialize sink (S10/S11 analog, utils/data.py:340-442).

    Production: ``df.writeTo(tbl).using("iceberg").partitionedBy(bucket(N,
    "url"))``. Sandbox: parquet with identical partition layout.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
