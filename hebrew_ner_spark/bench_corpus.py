"""Derived benchmark warehouse builder, shared by bench.py and
scripts/bench_scaling.py (previously two hand-maintained copies that had
already diverged in cache-validity semantics).

``build_replicated`` materializes, under ``work``, a warehouse whose
``documents`` table is the source corpus replicated ``rep``-fold with
distinct doc_ids (``doc_id * rep + r`` — collision-free because the remap
is injective on (doc_id, r)); every other catalog table is symlinked to
the source. The build is idempotent and crash-safe: a ``_BUILD_OK``
marker is written LAST and records a fingerprint of the source —
resolved path, expected replicated count, and (name, size, mtime_ns) of
every source parquet part — so a killed mid-write build, a regenerated
sf corpus, or a swapped source dir (even at the same row count) all
invalidate the cache instead of being silently benchmarked.
"""

from __future__ import annotations

import hashlib
import os


def source_fingerprint(sf_dir: str, expected: int) -> str:
    src_docs = os.path.join(sf_dir, "documents.parquet")
    parts = sorted(os.listdir(src_docs)) if os.path.isdir(src_docs) else []
    fp_items = [os.path.realpath(sf_dir), str(expected)] + [
        f"{p}:{os.stat(os.path.join(src_docs, p)).st_size}:"
        f"{os.stat(os.path.join(src_docs, p)).st_mtime_ns}"
        for p in parts
    ]
    return hashlib.md5("|".join(fp_items).encode()).hexdigest() + f":{expected}"


def build_replicated(
    spark, sf_dir: str, work: str, rep: int, partitions: int = 64,
    n_src: int | None = None,
) -> int:
    """Build (or validate and reuse) the replicated warehouse at ``work``.
    Returns the expected documents row count (source_rows * rep).
    Pass ``n_src`` when the caller already counted the source documents
    (bench.py does, to size ``rep``) to avoid a second count job."""
    from pyspark.sql import functions as F

    from hebrew_ner_spark.sources.catalog import TABLES, load_table

    docs = load_table(spark, sf_dir, "documents")
    expected = (docs.count() if n_src is None else n_src) * rep
    docs_dir = os.path.join(work, "documents.parquet")
    marker = os.path.join(work, "_BUILD_OK")
    fingerprint = source_fingerprint(sf_dir, expected)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == fingerprint:
                return expected
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    big = (
        docs.crossJoin(spark.range(rep).withColumnRenamed("id", "_r"))
        .withColumn("doc_id", F.col("doc_id") * rep + F.col("_r"))
        .drop("_r")
    )
    big.repartition(partitions).write.mode("overwrite").parquet(docs_dir)
    for t in TABLES:
        if t != "documents":
            src = os.path.join(sf_dir, t + ".parquet")
            dst = os.path.join(work, t + ".parquet")
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
    with open(marker, "w") as f:
        f.write(fingerprint)
    return expected
