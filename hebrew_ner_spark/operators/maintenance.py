"""Lakehouse table maintenance: compaction planning and Z-order keys.

A 10^12-row Iceberg table rots without maintenance — streaming commits
leave small files, and range queries over uncorrelated columns scan
everything. The two standard fixes, engine-side:

* ``compaction_plan`` — greedy running-total bin packing of the file
  inventory into target-size rewrite groups. The inventory is METADATA
  (one row per file — but a 10^12-row table easily carries 10^8 files),
  so the running total is computed **two-level** like ``build_vocab``'s
  rank: a per-bucket cumsum under a hash-partitioned window plus a
  broadcast table of cumulative bucket offsets. Only the bucket-count
  table (|inventory| / bucket_span rows) crosses a single partition;
  the file-grain rows never do. Executors then rewrite each group
  independently.
* ``zorder_keys`` — Morton (bit-interleaved) sort keys over two integer
  dimensions. Writing data ordered by the Z-curve makes min/max file
  pruning effective for BOTH dimensions at once (the Delta/Iceberg
  Z-ORDER feature). Pure bit arithmetic, unrolled — identical in Spark
  and DuckDB, no UDF.

The sandbox synthesizes a file inventory deterministically from the
documents table (file size = a hash-spread function of doc_id), the
planted-evidence precedent."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TARGET_BYTES = 1_000_000  # compaction rewrite-group target
Z_BITS = 16  # bits per dimension in the Morton code


def synth_file_inventory(docs: DataFrame) -> DataFrame:
    """(file_id, bytes): a skewed small-file inventory — sizes spread
    deterministically across ~3 decades (the shape streaming commits
    actually leave: many tiny files, a few near-target ones)."""
    return docs.select(
        F.col("doc_id").alias("file_id"),
        F.expr(
            "CAST(1000 + (doc_id * doc_id * 2654435761) % 399000 AS BIGINT)"
        ).alias("bytes"),
    )


def compaction_plan(
    files: DataFrame, target: int = TARGET_BYTES, bucket_span: int = 65536
) -> DataFrame:
    """(file_id, bytes, grp): greedy bin packing by running total — file
    f (in file_id order) joins group floor(cumsum_before / target).
    Exactly the plan Iceberg's binpack rewrite produces for an ordered
    inventory, zero data movement. Groups are contiguous in file_id, so
    each rewrite task reads a key range.

    The running total is two-level: ``file_id DIV bucket_span`` is a
    monotone bucket key (ordering by (bucket, file_id) == ordering by
    file_id), so cumsum = per-bucket cumsum (hash-partitioned window)
    + the cumulative byte total of all earlier buckets (a broadcast
    offsets table; the only ordered un-partitioned window runs over
    |inventory|/bucket_span bucket-count rows, never file-grain)."""
    b = files.withColumn(
        "_bkt", F.expr(f"CAST(file_id DIV {bucket_span} AS BIGINT)")
    )
    wl = (
        Window.partitionBy("_bkt")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn("_lb", F.coalesce(F.sum("bytes").over(wl), F.lit(0)))
    offsets = (
        b.groupBy("_bkt")
        .agg(F.sum("bytes").alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_off")
    )
    return local.join(F.broadcast(offsets), "_bkt").select(
        "file_id",
        "bytes",
        F.expr(f"CAST((_lb + _off) DIV {target} AS BIGINT)").alias("grp"),
    )


def _interleave(col: str, shift: int, bits: int = Z_BITS) -> str:
    """SQL: spread ``bits`` low bits of ``col`` to even positions, then
    shift left by ``shift`` (0 = even lanes, 1 = odd lanes)."""
    terms = " + ".join(
        f"(shiftleft(shiftright({col}, {i}) & 1, {2 * i + shift}))" for i in range(bits)
    )
    return f"({terms})"


def zorder_keys(df: DataFrame, xcol: str, ycol: str, bits: int = Z_BITS) -> DataFrame:
    """+ ``zkey``: the Morton interleave of the low ``bits`` of two
    integer columns — x in even bit lanes, y in odd. Sorting by zkey
    before write clusters BOTH dimensions for min/max pruning. Unrolled
    shift/mask terms stay inside whole-stage codegen."""
    expr = f"CAST({_interleave(xcol, 0, bits)} + {_interleave(ycol, 1, bits)} AS BIGINT)"
    return df.withColumn("zkey", F.expr(expr))


# ---------------------------------------------------------------------------
# Manifest-level scan pruning (Iceberg metadata plane)
# ---------------------------------------------------------------------------

PRUNE_LO = 200
PRUNE_HI = 400
PRUNE_PART = 7  # partition transform: day = min_v DIV 100 -> days 0..9


def synth_file_stats(docs: DataFrame) -> DataFrame:
    """(file_id, part_day, min_v, max_v, bytes) — a manifest of
    per-file column statistics, planted closed-form from doc_id.

    min_v spreads over [0, 1000); max_v = min_v + width, CLAMPED to the
    partition's last value — in Iceberg a data file belongs to exactly
    one partition value, so its stats can never cross the partition
    boundary (files span a narrow range when written clustered). Every
    17th file has NULL min/max (stats dropped — e.g. a legacy writer),
    the case a pruner must treat as scan-always; the PARTITION value is
    physical layout and is always present.
    """
    min_v = (F.col("doc_id") * 37) % 1000
    day = (min_v / 100).cast("long")
    has = (F.col("doc_id") % 17) != 0
    return docs.select(
        F.col("doc_id").alias("file_id"),
        day.alias("part_day"),
        F.when(has, min_v).cast("long").alias("min_v"),
        F.when(has, F.least(min_v + F.col("doc_id") % 50, day * 100 + 99))
        .cast("long")
        .alias("max_v"),
        F.expr(
            "CAST(1000 + (doc_id * doc_id * 2654435761) % 399000 AS BIGINT)"
        ).alias("bytes"),
    )


def manifest_prune(
    stats: DataFrame, lo: int = PRUNE_LO, hi: int = PRUNE_HI
) -> DataFrame:
    """(file_id, part_kept, stats_kept, scan) — per-file scan decision
    for the predicate ``v BETWEEN lo AND hi``, the two-level pruning a
    lakehouse scan planner runs BEFORE any executor touches data.

    Level 1 (partition pruning): the truncate transform bounds every
    value in the file to [part_day*100, part_day*100+99] — a guarantee
    of the LAYOUT, valid even for files with dropped stats — so
    partitions whose interval misses [lo, hi] are discarded without
    reading file stats at all (whole manifest branches skipped).
    Level 2 (file stats): three-valued logic — a surviving file is
    scanned iff its [min_v, max_v] overlaps [lo, hi]; NULL stats scan
    ALWAYS (pruning on missing evidence is a wrong-results bug, not an
    optimization). ``scan = part_kept AND stats_kept``. All flags
    BIGINT 0/1; a pure codegen projection over metadata rows (10^8
    rows for a 10^12-row table — itself a Spark job, which is the
    point of doing the planning engine-side).
    """
    part_kept = (F.col("part_day") * 100 <= F.lit(hi)) & (
        F.col("part_day") * 100 + 99 >= F.lit(lo)
    )
    stats_kept = (
        F.col("min_v").isNull()
        | ~((F.col("max_v") < F.lit(lo)) | (F.col("min_v") > F.lit(hi)))
    )
    b = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")  # noqa: E731
    return stats.select(
        "file_id",
        b(part_kept).alias("part_kept"),
        b(stats_kept).alias("stats_kept"),
        b(part_kept & stats_kept).alias("scan"),
        "bytes",
    )


def prune_summary(decisions: DataFrame) -> DataFrame:
    """(n_files, n_scanned, bytes_total, bytes_scanned, skip_share_1e6)
    — the planner's headline: how much of the table the predicate
    never touches. One map-side-combinable aggregate; the share is
    half-up integer micro-units."""
    return decisions.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("scan").cast("long").alias("n_scanned"),
        F.sum("bytes").cast("long").alias("bytes_total"),
        F.sum(F.col("bytes") * F.col("scan")).cast("long").alias("bytes_scanned"),
    ).select(
        "n_files",
        "n_scanned",
        "bytes_total",
        "bytes_scanned",
        F.expr(
            "CAST((2 * (bytes_total - bytes_scanned) * 1000000 + bytes_total)"
            " DIV (2 * bytes_total) AS BIGINT)"
        ).alias("skip_share_1e6"),
    )


# ---------------------------------------------------------------------------
# Snapshot expiry + orphan-file GC
# ---------------------------------------------------------------------------

N_SNAPSHOTS = 4
KEEP_FROM = 2  # retention: expire snapshots < 2


def synth_snapshot_refs(docs: DataFrame) -> DataFrame:
    """(snap, file_id) — which snapshot references which data file,
    planted closed-form: file doc_id enters at snapshot a = doc_id % 4
    and stays for 1 + doc_id % 3 snapshots (clamped to the horizon), the
    add-then-replace lifecycle compaction and CDC rewrites leave. Files
    whose whole lifetime precedes the retention floor become GC
    candidates at every scale factor.
    """
    a = F.col("doc_id") % N_SNAPSHOTS
    last = F.least(a + F.col("doc_id") % 3, F.lit(N_SNAPSHOTS - 1))
    s = F.explode(F.sequence(a, last)).alias("snap")
    return docs.select(F.col("doc_id").alias("file_id"), s).select(
        F.col("snap").cast("long").alias("snap"), "file_id"
    )


def expire_snapshots(refs: DataFrame, keep_from: int = KEEP_FROM) -> DataFrame:
    """(file_id, n_refs, n_kept, orphan) — per-file GC decision when
    snapshots below ``keep_from`` expire.

    Iceberg's expire-snapshots + remove-orphan-files maintenance pass,
    engine-side: a data file may be referenced by MANY snapshots, and it
    is deletable iff NO retained snapshot references it — deleting a
    file any kept snapshot still needs corrupts time travel, so the
    reference count must be computed over the full membership table,
    never per-manifest. One file-keyed aggregate with map-side partial
    sums (the membership table is metadata: |snapshots| x |files| upper
    bound, snapshots a small constant). ``orphan`` rows are the delete
    manifest the GC job executes; flags BIGINT 0/1.
    """
    return refs.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_refs"),
        F.sum(F.when(F.col("snap") >= keep_from, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.when(
            F.sum(F.when(F.col("snap") >= keep_from, 1).otherwise(0)) == 0,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("orphan"),
    )


# --- merge-on-read delete files (Iceberg v2 row-level deletes) --------------
#
# The READ side of row-level deletes: a MoR table's scan must fold two
# delete-file kinds into every data-file read, each with its own
# sequence-number scoping rule (Iceberg spec #position-delete-files /
# #equality-delete-files):
#
#   position deletes (file_id, pos) apply to data files whose data
#     sequence number is <= the delete file's sequence number;
#   equality deletes (column = value) apply to data files whose data
#     sequence number is STRICTLY LESS than the delete file's — a row
#     written in the same commit as an equality delete is NOT deleted
#     by it (that asymmetry is the spec's concurrency contract, and the
#     planted fixtures exercise the boundary on purpose).
#
# Both folds are anti-join shapes: at 10^12 rows the delete files are
# metadata-scale next to the data (and broadcast), so MoR reads cost
# one scan + two broadcast anti-joins — which is exactly why engines
# prefer MoR over copy-on-write for delete-heavy tables.

MOR_FILE_ROWS = 100   # rows per synthetic data file
MOR_POS_SEED = 59
MOR_EQ_LANG_MOD = 7   # equality-delete target derived per doc


def synth_mor_rows(docs: DataFrame) -> DataFrame:
    """(file_id, pos, doc_id, lang, data_seq) — the data-file layout:
    doc_id DIV 100 is the file, doc_id % 100 the row position, and the
    file's data sequence number cycles 1..3 (so every scoping rule has
    rows on both sides of its boundary at every scale factor)."""
    return docs.select(
        (F.col("doc_id") / MOR_FILE_ROWS).cast("long").alias("file_id"),
        (F.col("doc_id") % MOR_FILE_ROWS).cast("long").alias("pos"),
        "doc_id",
        "lang",
    ).withColumn("data_seq", (F.col("file_id") % 3 + 1).cast("long"))


def synth_pos_deletes(docs: DataFrame) -> DataFrame:
    """(file_id, pos, seq) — planted position-delete rows: every doc
    with h60(doc_id) % 5 == 0 is targeted, with the delete's sequence
    number alternating 1 and 3 (so against data_seq 1..3 some deletes
    are too OLD to apply — the <= rule has real work)."""
    from hebrew_ner_spark.functions.hashing import phash_col

    h = phash_col(F.col("doc_id").cast("string"), MOR_POS_SEED)
    return (
        docs.where(h % 5 == 0)
        .select(
            (F.col("doc_id") / MOR_FILE_ROWS).cast("long").alias("file_id"),
            (F.col("doc_id") % MOR_FILE_ROWS).cast("long").alias("pos"),
            F.when((h % 2) == 0, F.lit(3)).otherwise(F.lit(1))
            .cast("long")
            .alias("seq"),
        )
    )


def synth_eq_deletes(spark) -> DataFrame:
    """(lang, seq) — two planted equality deletes: lang 'he' at seq 2
    (applies only to data_seq-1 files: strict rule) and lang 'en' at
    seq 4 (applies to every file)."""
    return spark.createDataFrame(
        [("he", 2), ("en", 4)], "lang string, seq long"
    )


def mor_read(
    rows: DataFrame, pos_del: DataFrame, eq_del: DataFrame
) -> DataFrame:
    """(file_id, pos, doc_id, lang, data_seq) — the merged (live) rows:
    one scan + two broadcast anti-joins carrying each rule's sequence
    predicate inside the join condition."""
    p = pos_del.select(
        F.col("file_id").alias("_pf"),
        F.col("pos").alias("_pp"),
        F.col("seq").alias("_ps"),
    )
    e = eq_del.select(F.col("lang").alias("_el"), F.col("seq").alias("_es"))
    live = rows.join(
        F.broadcast(p),
        (F.col("file_id") == F.col("_pf"))
        & (F.col("pos") == F.col("_pp"))
        & (F.col("data_seq") <= F.col("_ps")),
        "left_anti",
    )
    return live.join(
        F.broadcast(e),
        (F.col("lang") == F.col("_el")) & (F.col("data_seq") < F.col("_es")),
        "left_anti",
    )


def mor_file_stats(
    rows: DataFrame, pos_del: DataFrame, eq_del: DataFrame
) -> DataFrame:
    """(file_id, n_rows, n_pos_deleted, n_eq_deleted, n_live) — the
    per-file delete audit a compaction planner reads (files with high
    delete ratios are rewrite candidates). A row deleted by BOTH kinds
    counts as position-deleted (positions bind tighter than predicates
    — same precedence the live-read anti-join order implies)."""
    p = pos_del.select(
        F.col("file_id").alias("_pf"),
        F.col("pos").alias("_pp"),
        F.col("seq").alias("_ps"),
    )
    e = eq_del.select(F.col("lang").alias("_el"), F.col("seq").alias("_es"))
    flagged = (
        rows.join(
            F.broadcast(p),
            (F.col("file_id") == F.col("_pf"))
            & (F.col("pos") == F.col("_pp"))
            & (F.col("data_seq") <= F.col("_ps")),
            "left",
        )
        .withColumn("posdel", F.col("_pf").isNotNull().cast("long"))
        .join(
            F.broadcast(e),
            (F.col("lang") == F.col("_el")) & (F.col("data_seq") < F.col("_es")),
            "left",
        )
        .withColumn(
            "eqdel",
            ((F.col("posdel") == 0) & F.col("_el").isNotNull()).cast("long"),
        )
    )
    return flagged.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("posdel").cast("long").alias("n_pos_deleted"),
        F.sum("eqdel").cast("long").alias("n_eq_deleted"),
        (F.count("*") - F.sum("posdel") - F.sum("eqdel"))
        .cast("long")
        .alias("n_live"),
    )


# --- partition-spec evolution (Iceberg versioned partition transforms) ------
#
# Iceberg tables EVOLVE their partition spec without rewriting data:
# files written under the old spec keep it forever, and the scan
# planner evaluates each file's partition tuple UNDER ITS OWN SPEC.
# The planted table has two spec generations over the same value
# domain: spec 1 partitions by truncate(100) (the coarse early layout),
# spec 2 by truncate(10) (the refined later one). A range probe prunes
# spec-2 files ~10x more precisely — which is exactly why specs evolve
# — while spec-1 files still prune correctly at their own grain.

SPEC1_WIDTH = 100
SPEC2_WIDTH = 10


def synth_evolved_stats(docs: DataFrame) -> DataFrame:
    """(file_id, spec_v, part_val, min_v, max_v, bytes) — a manifest
    whose first half (even doc_id) was written under spec 1 and second
    half under spec 2; each file's values span a narrow slice bounded
    by its own spec's partition interval."""
    min_v = (F.col("doc_id") * 37) % 1000
    spec_v = (F.col("doc_id") % 2 + 1).cast("long")
    width = F.when(spec_v == 1, F.lit(SPEC1_WIDTH)).otherwise(F.lit(SPEC2_WIDTH))
    part_val = F.expr(
        f"CASE WHEN (doc_id % 2 + 1) = 1 THEN ((doc_id * 37) % 1000) DIV {SPEC1_WIDTH} "
        f"ELSE ((doc_id * 37) % 1000) DIV {SPEC2_WIDTH} END"
    )
    max_v = F.least(min_v + F.col("doc_id") % 50, (part_val + 1) * width - 1)
    return docs.select(
        F.col("doc_id").alias("file_id"),
        spec_v.alias("spec_v"),
        part_val.cast("long").alias("part_val"),
        min_v.cast("long").alias("min_v"),
        max_v.cast("long").alias("max_v"),
        F.expr("CAST(1000 + (doc_id * doc_id * 2654435761) % 399000 AS BIGINT)").alias(
            "bytes"
        ),
    )


def evolved_prune(
    stats: DataFrame, lo: int = PRUNE_LO, hi: int = PRUNE_HI
) -> DataFrame:
    """(file_id, spec_v, part_kept, stats_kept, scan, bytes) — the scan
    decision with the partition interval computed PER FILE under its
    own spec version (the multi-spec manifest evaluation Iceberg scan
    planning does); stats pruning is spec-independent."""
    width = F.when(F.col("spec_v") == 1, F.lit(SPEC1_WIDTH)).otherwise(
        F.lit(SPEC2_WIDTH)
    )
    p_lo = F.col("part_val") * width
    p_hi = (F.col("part_val") + 1) * width - 1
    part_kept = (p_lo <= F.lit(hi)) & (p_hi >= F.lit(lo))
    stats_kept = ~((F.col("max_v") < F.lit(lo)) | (F.col("min_v") > F.lit(hi)))
    b = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")  # noqa: E731
    return stats.select(
        "file_id",
        "spec_v",
        b(part_kept).alias("part_kept"),
        b(stats_kept).alias("stats_kept"),
        b(part_kept & stats_kept).alias("scan"),
        "bytes",
    )


def evolved_prune_summary(decisions: DataFrame) -> DataFrame:
    """(spec_v, n_files, n_part_kept, n_scanned, skip_share_1e6) — the
    payoff per spec generation: the refined spec's partition pruning
    alone discards ~10x more files for the same probe (the reason
    partition specs evolve), exact half-up micro-units."""
    return decisions.groupBy("spec_v").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("part_kept").cast("long").alias("n_part_kept"),
        F.sum("scan").cast("long").alias("n_scanned"),
        F.expr(
            "CAST((2 * (count(*) - sum(scan)) * 1000000 + count(*))"
            " DIV (2 * count(*)) AS BIGINT)"
        ).alias("skip_share_1e6"),
    )


# --- schema evolution (field-id column mapping) ------------------------------


def evolved_schema_read(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """Unified read over two physical schema generations by FIELD ID
    (the Iceberg name-mapping contract: renames are metadata-only,
    added columns NULL-fill in older files, readers never match by
    physical name):

        v1 physical (c_id, c_body)            field ids {1, 2}
        v2 physical (ident, content, score)   field ids {1, 2, 3}
        logical schema: 1 -> id, 2 -> body, 3 -> score

    Output (id, body, score, schema_v). A name-based reader would lose
    field 2 across the rename; the gate's planted rename makes that
    failure mode a hash flip."""
    a = v1.select(
        F.col("c_id").cast("long").alias("id"),
        F.col("c_body").alias("body"),
        F.lit(None).cast("long").alias("score"),
        F.lit(1).cast("long").alias("schema_v"),
    )
    b = v2.select(
        F.col("ident").cast("long").alias("id"),
        F.col("content").alias("body"),
        F.col("score").cast("long").alias("score"),
        F.lit(2).cast("long").alias("schema_v"),
    )
    return a.unionByName(b)


# --- MERGE INTO (three-clause upsert) ----------------------------------------

MERGE_SEED = 101


def synth_order_changes(orders: DataFrame) -> DataFrame:
    """(o_orderkey, op, o_custkey, o_totalprice, o_orderstatus) — a
    deterministic CDC batch over the orders table: hash-selected keys
    update (status -> 'P', custkey shifted), a disjoint set deletes,
    and fresh keys (beyond the key domain) insert.

    The insert-key offset assumes max(o_orderkey) < 10M (true through
    TPC-H sf~2); past that, insert keys would collide with base rows and
    silently break the one-change-per-key / insert-disjointness contract
    cdc_diff's round-trip and the streaming-MV retraction depend on. The
    insert projection therefore folds max(o_orderkey) in via
    broadcast-of-aggregate and ``raise_error``s at evaluation time if
    the domain ever reaches the offset — loud, lazy, zero output change
    while the contract holds."""
    from hebrew_ner_spark.functions.hashing import phash_col

    h = phash_col(F.col("o_orderkey").cast("string"), MERGE_SEED)
    upd = orders.where((h % 11 == 0) & (h % 13 != 0)).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        (F.col("o_custkey") + 7).alias("o_custkey"),
        "o_totalprice",
        F.lit("P").alias("o_orderstatus"),
    )
    dels = orders.where(h % 13 == 0).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
    )
    mx = orders.agg(F.max("o_orderkey").cast("long").alias("_mxkey"))
    ins = (
        orders.crossJoin(F.broadcast(mx))
        .where(h % 17 == 0)
        .select(
            F.expr(
                "CAST(IF(_mxkey < 10000000, o_orderkey + 10000000,"
                " raise_error(concat('synth_order_changes: max(o_orderkey)=',"
                " CAST(_mxkey AS STRING),"
                " ' >= insert offset 10000000; key domains would collide')))"
                " AS BIGINT)"
            ).alias("o_orderkey"),
            F.lit("I").alias("op"),
            "o_custkey",
            "o_totalprice",
            F.lit("O").alias("o_orderstatus"),
        )
    )
    return upd.unionByName(dels).unionByName(ins)


def merge_upsert(target: DataFrame, changes: DataFrame) -> DataFrame:
    """Three-clause MERGE INTO semantics over (key = o_orderkey):

        WHEN MATCHED AND op = 'D' THEN DELETE
        WHEN MATCHED               THEN UPDATE (take change values)
        WHEN NOT MATCHED AND op <> 'D' THEN INSERT

    One full-outer join on the key + a CASE projection — the Iceberg
    copy-on-write MERGE's logical plan (the MoR twin would emit the
    matched keys as delete files instead; `mor_read` gates that read
    path). Exactly-one-change-per-key is the CDC batch contract the
    synth honors (real MERGE raises on cardinality violations)."""
    t = target.select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("t_ck"),
        F.col("o_totalprice").alias("t_tp"),
        F.col("o_orderstatus").alias("t_st"),
    )
    c = changes.select(
        F.col("o_orderkey"),
        "op",
        F.col("o_custkey").alias("c_ck"),
        F.col("o_totalprice").alias("c_tp"),
        F.col("o_orderstatus").alias("c_st"),
    )
    j = t.join(c, "o_orderkey", "full_outer")
    return (
        j.where(
            ~(F.col("op").isNotNull() & F.col("t_ck").isNotNull() & (F.col("op") == "D"))
            & ~(F.col("t_ck").isNull() & (F.col("op") == "D"))
        )
        .select(
            "o_orderkey",
            F.when(F.col("op").isNotNull(), F.col("c_ck"))
            .otherwise(F.col("t_ck"))
            .cast("long")
            .alias("o_custkey"),
            # the money column rides as exact integer cents (the repo's
            # hash-stable output contract: no raw double in a gated column)
            F.expr(
                "CAST(round((CASE WHEN op IS NOT NULL THEN c_tp ELSE t_tp END)"
                " * 100) AS BIGINT)"
            ).alias("o_total_cents"),
            F.when(F.col("op").isNotNull(), F.col("c_st"))
            .otherwise(F.col("t_st"))
            .alias("o_orderstatus"),
        )
    )


# ---------------------------------------------------------------------------
# Join-strategy advisor (CBO arithmetic, oracle-checkable)
# ---------------------------------------------------------------------------
#
# The decision Catalyst's CBO makes from catalog statistics, made
# explicit and deterministic: estimate each table's in-memory bytes
# from exact row counts and column-width arithmetic (fixed widths per
# type + exact mean string lengths — the same model
# spark.sql.statistics uses), then advise per join pair:
#   * BROADCAST  if the smaller side fits the broadcast threshold
#   * BUCKET     if both sides exceed the shuffle-pain threshold
#                (fact-fact: write-time co-location beats repeated SMJ)
#   * SHUFFLE    otherwise (plain sort-merge)
# Thresholds are exact integers, so the advice table is value-hashable
# cross-engine; at a real 10^12-row catalog the same arithmetic runs
# over the Iceberg stats files instead of the data.

ADV_NUM_W = 8        # bytes per numeric/timestamp column
ADV_STR_OVERHEAD = 4  # per-string overhead added to the mean length
# Gate-scaled thresholds chosen so ALL THREE strategies fire on the sf
# catalog (production: 10 MiB autoBroadcastJoinThreshold, ~1 GiB bucket
# pain point — same arithmetic, bigger constants):
ADV_BROADCAST = 50_000    # broadcast the smaller side below this
ADV_BUCKET = 500_000      # both sides above this => bucket advice

# (table, [numeric+ts cols], [string cols]) — the catalog's width model
ADV_SCHEMAS = {
    "region": (["r_regionkey"], ["r_name"]),
    "nation": (["n_nationkey", "n_regionkey"], ["n_name"]),
    "customer": (["c_custkey", "c_nationkey", "c_acctbal"],
                 ["c_name", "c_mktsegment"]),
    "orders": (["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
               ["o_orderstatus", "o_orderpriority"]),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                  "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                  "l_shipdate"],
                 ["l_returnflag", "l_linestatus"]),
}

ADV_PAIRS = [
    ("region", "nation"),
    ("nation", "customer"),
    ("customer", "orders"),
    ("orders", "lineitem"),
]


def table_size_stats(tables: dict) -> DataFrame:
    """(tbl, n_rows, est_bytes) — exact-integer size model per table:
    n_rows * (8 * n_numeric + sum(mean_len + 4 per string col)), mean
    string length as the half-up integer of the exact sums."""
    out = None
    for tbl, (nums, strs) in ADV_SCHEMAS.items():
        df = tables[tbl]
        aggs = [F.count("*").cast("long").alias("n_rows")]
        for c in strs:
            aggs.append(F.sum(F.length(c)).cast("long").alias(f"_len_{c}"))
        row = df.agg(*aggs)
        width = F.lit(ADV_NUM_W * len(nums))
        for c in strs:
            width = width + F.expr(
                f"CAST((2 * _len_{c} + n_rows) DIV (2 * n_rows) AS BIGINT)"
                f" + {ADV_STR_OVERHEAD}"
            )
        stat = row.select(
            F.lit(tbl).alias("tbl"),
            "n_rows",
            (F.col("n_rows") * width).cast("long").alias("est_bytes"),
        )
        out = stat if out is None else out.unionByName(stat)
    return out


def join_advice(stats: DataFrame) -> DataFrame:
    """(left_tbl, right_tbl, l_bytes, r_bytes, strategy) — the advisor's
    verdict per canonical join pair over the size-stat table (a
    metadata-grain self-join)."""
    pairs = stats.sparkSession.createDataFrame(
        ADV_PAIRS, "left_tbl string, right_tbl string"
    )
    l = stats.select(F.col("tbl").alias("left_tbl"),
                     F.col("est_bytes").alias("l_bytes"))
    r = stats.select(F.col("tbl").alias("right_tbl"),
                     F.col("est_bytes").alias("r_bytes"))
    return (
        pairs.join(F.broadcast(l), "left_tbl")
        .join(F.broadcast(r), "right_tbl")
        .select(
            "left_tbl", "right_tbl", "l_bytes", "r_bytes",
            F.when(
                F.least("l_bytes", "r_bytes") <= ADV_BROADCAST,
                F.lit("BROADCAST"),
            )
            .when(
                (F.col("l_bytes") > ADV_BUCKET) & (F.col("r_bytes") > ADV_BUCKET),
                F.lit("BUCKET"),
            )
            .otherwise(F.lit("SHUFFLE"))
            .alias("strategy"),
        )
    )


# ---------------------------------------------------------------------------
# Materialized-view rewrite + incremental view maintenance (IVM)
# ---------------------------------------------------------------------------

MV_BUCKETS = 8


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def orders_mv(orders: DataFrame) -> DataFrame:
    """(o_orderstatus, bucket, revenue_cents, n_orders) — the
    materialized summary at a grain FINER than the queries it serves
    (bucket = o_orderkey % MV_BUCKETS), so rollup-rewrite and IVM both
    have room to act. At 10^12 rows this table is what the warehouse
    scans instead of the facts."""
    return (
        orders.groupBy(
            "o_orderstatus",
            (F.col("o_orderkey") % MV_BUCKETS).cast("long").alias("bucket"),
        )
        .agg(
            F.sum(_cents("o_totalprice")).cast("long").alias("revenue_cents"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


def mv_rollup(mv: DataFrame) -> DataFrame:
    """(o_orderstatus, revenue_cents, n_orders) answered FROM the MV —
    the classic aggregate-rewrite (sum of sums / sum of counts); the
    gate's oracle computes the same answer from the BASE table, so the
    row set certifies the rewrite's correctness."""
    return mv.groupBy("o_orderstatus").agg(
        F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        F.sum("n_orders").cast("long").alias("n_orders"),
    )


def mv_delta(orders: DataFrame, changes: DataFrame) -> DataFrame:
    """(o_orderstatus, bucket, d_cents, d_n) — the ADDITIVE delta a CDC
    batch induces on the MV: matched rows retract their old contribution
    (old status read via a key join against the pre-image of the batch's
    keys — the original base under the one-change-per-key CDC contract),
    updates/inserts add the new one. Metadata-sized grain."""
    key_bucket = (F.col("o_orderkey") % MV_BUCKETS).cast("long")
    old = (
        changes.where(F.col("op").isin("U", "D"))
        .select("o_orderkey")
        .join(orders, "o_orderkey")
        .select(
            "o_orderstatus",
            key_bucket.alias("bucket"),
            (-_cents("o_totalprice")).alias("d_cents"),
            F.lit(-1).cast("long").alias("d_n"),
        )
    )
    new = changes.where(F.col("op").isin("U", "I")).select(
        "o_orderstatus",
        key_bucket.alias("bucket"),
        _cents("o_totalprice").alias("d_cents"),
        F.lit(1).cast("long").alias("d_n"),
    )
    return (
        old.unionByName(new)
        .groupBy("o_orderstatus", "bucket")
        .agg(
            F.sum("d_cents").cast("long").alias("d_cents"),
            F.sum("d_n").cast("long").alias("d_n"),
        )
    )


def apply_mv_delta(mv: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold an additive delta onto the MV: full-outer merge on the
    group key, zeroed groups vanish (exactly what a recompute would
    produce)."""
    return (
        mv.join(delta, ["o_orderstatus", "bucket"], "full_outer")
        .select(
            "o_orderstatus",
            "bucket",
            (
                F.coalesce("revenue_cents", F.lit(0))
                + F.coalesce("d_cents", F.lit(0))
            ).cast("long").alias("revenue_cents"),
            (
                F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0))
            ).cast("long").alias("n_orders"),
        )
        .where(F.col("n_orders") > 0)
    )


def mv_incremental(orders: DataFrame, changes: DataFrame) -> DataFrame:
    """The MV maintained INCREMENTALLY under the CDC batch — additive
    deltas only, never a base-table rescan of the MV itself; the gate's
    oracle IS the recompute over the merged base. Composition of
    ``mv_delta`` + ``apply_mv_delta`` (the streaming IVM job folds the
    same two kernels per micro-batch)."""
    return apply_mv_delta(orders_mv(orders), mv_delta(orders, changes))


# ---------------------------------------------------------------------------
# SCD Type-2 dimension collapse (crawl snapshots -> validity intervals)
# ---------------------------------------------------------------------------
#
# The crawl-history table holds EVERY snapshot of every url; the
# dimension a KG wants is the Type-2 form — one row per *distinct
# consecutive version* with [valid_from, valid_to) intervals and an
# is_current flag, so facts can join "page text as of t" without
# scanning all snapshots (reference corpora are single-snapshot —
# ner_app.py never faces the version axis; this is the 10^12-page
# lakehouse shape of it). Gaps-and-islands collapse: a change row
# starts a new version, lead() closes it. Both windows and the filter
# share ONE hash partitioning on the natural key, so the whole build
# is a single shuffle regardless of snapshot count; at 10^12 rows the
# key space (url) is huge and uniform — no skew handling needed.


def scd2_collapse(
    hist: DataFrame, key: str = "url", ts: str = "warc_ts", attr: str = "text"
) -> DataFrame:
    """(key, attr, valid_from, valid_to, is_current, version_no) —
    consecutive snapshots with identical ``attr`` collapse into one
    validity interval; ``valid_to`` is NULL on the open (current) row.
    """
    w = Window.partitionBy(key).orderBy(ts)
    chg = hist.select(
        key,
        ts,
        attr,
        (
            F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr))
        ).alias("_chg"),
    ).where("_chg")
    return chg.select(
        key,
        attr,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.lead(ts).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version_no"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram + range-selectivity estimation (the CBO's stats
# plane: what ANALYZE TABLE materializes and the optimizer consults)
# ---------------------------------------------------------------------------
#
# join_advice (above) prices joins from row counts; range predicates
# need value DISTRIBUTION. The classic answer is the equi-depth
# histogram: B buckets of equal row count along the sort order, each
# carrying [lo, hi] bounds. Build discipline at 10^12 rows: NO global
# window — a monotone composite key (cents, orderkey) gets the same
# two-level global rank as the z-order layout (range-slice buckets,
# window inside slices, broadcast offsets), then the ntile bucket is
# closed-form arithmetic on the rank. The gate's oracle uses DuckDB's
# NATIVE ntile over a single window — two independent algorithms, same
# bucket assignment.
#
# Estimation replays the optimizer's continuous-uniform interpolation
# per bucket, in exact integers (DECIMAL(38,0) intermediate — row count
# x cent width x 1e6 overflows int64 at warehouse scale): micro-rows =
# n * overlap * 1e6 DIV width. Every predicate's estimate sits next to
# the ACTUAL count, so the report certifies estimator error, not just
# replay agreement.

HIST_BUCKETS = 16
# inclusive [lo, hi] cent ranges: broad band, mid band, narrow point
# band, upper tail reaching past max(o_totalprice)
SEL_PREDICATES = [
    (0, 10_000_000),
    (10_000_000, 20_000_000),
    (3_000_000, 3_050_000),
    (40_000_000, 60_000_000),
]


def equi_depth_histogram(
    orders: DataFrame, buckets: int = HIST_BUCKETS, slices: int = 64
) -> DataFrame:
    """(bucket, lo_cents, hi_cents, n_rows) — ntile(buckets) over
    (cents, o_orderkey) without a global window."""
    k = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        F.col("o_orderkey").alias("okey"),
    ).withColumn(
        # monotone composite: orderkey < 1e8 by contract, so the
        # composite preserves (c, okey) lexicographic order in one long
        "ok",
        F.expr("c * 100000000 + okey"),
    )
    bounds = k.agg(
        F.min("ok").alias("_mn"), F.max("ok").alias("_mx"),
        F.count("*").alias("_n"),
        F.max("okey").alias("_mxo"),
    )
    # the okey < 1e8 contract the composite depends on is ENFORCED, not
    # assumed: the bounds aggregate carries max(okey) and the bucket
    # expression raise_errors (lazily, zero cost while honored) instead
    # of silently reordering rows past the domain bound
    b = k.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt",
        F.expr(
            f"CASE WHEN _mxo >= 100000000 THEN CAST(raise_error(concat("
            f"'equi_depth_histogram: max(o_orderkey)=', CAST(_mxo AS STRING),"
            f" ' >= 1e8; composite key (c, okey) would reorder')) AS BIGINT) "
            f"WHEN _mx = _mn THEN CAST(0 AS BIGINT) "
            f"ELSE CAST((ok - _mn) * {slices - 1} AS BIGINT) DIV (_mx - _mn) END"
        ),
    )
    local = b.withColumn(
        "_lr",
        F.row_number().over(Window.partitionBy("_bkt").orderBy("ok")),
    )
    offsets = (
        b.groupBy("_bkt")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_off")
    )
    ranked = local.join(F.broadcast(offsets), "_bkt").withColumn(
        "_r", F.col("_off") + F.col("_lr")
    )
    # ntile from the 1-based global rank: the first (_n % B) buckets
    # hold q+1 rows, the rest q (greatest() guards the q=0 DIV)
    q = f"(_n DIV {buckets})"
    rem = f"(_n % {buckets})"
    tiled = ranked.withColumn(
        "bucket",
        F.expr(
            f"CASE WHEN _r <= ({q} + 1) * {rem} "
            f"THEN (_r - 1) DIV ({q} + 1) "
            f"ELSE {rem} + (_r - {rem} * ({q} + 1) - 1) DIV greatest({q}, 1) "
            f"END + 1"
        ).cast("long"),
    )
    return tiled.groupBy("bucket").agg(
        F.min("c").alias("lo_cents"),
        F.max("c").alias("hi_cents"),
        F.count("*").cast("long").alias("n_rows"),
    )


def selectivity_report(
    orders: DataFrame,
    buckets: int = HIST_BUCKETS,
    predicates: list = None,
) -> DataFrame:
    """(pred_id, lo_cents, hi_cents, est_micro, actual_rows, err_micro)
    — per-bucket uniform interpolation summed in exact micro-rows next
    to the true count of each inclusive [lo, hi] range."""
    preds = predicates if predicates is not None else SEL_PREDICATES
    spark = orders.sparkSession
    pdf = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(preds)],
        "pred_id long, lo_cents long, hi_cents long",
    )
    hist = equi_depth_histogram(orders, buckets)
    # rename the bucket bounds first: pdf carries lo/hi_cents too
    h = hist.select(
        F.col("bucket"),
        F.col("lo_cents").alias("blo"),
        F.col("hi_cents").alias("bhi"),
        F.col("n_rows").alias("bn"),
    )
    j = h.crossJoin(F.broadcast(pdf)).select(
        "pred_id",
        "lo_cents",
        "hi_cents",
        F.greatest("lo_cents", "blo").alias("ovlo"),
        F.least("hi_cents", "bhi").alias("ovhi"),
        "blo",
        "bhi",
        "bn",
    )
    contrib = j.withColumn(
        "c_micro",
        F.expr(
            "CASE WHEN ovhi < ovlo THEN CAST(0 AS BIGINT) "
            "WHEN bhi = blo THEN bn * CAST(1000000 AS BIGINT) "
            "ELSE CAST(CAST(bn AS DECIMAL(38,0)) * (ovhi - ovlo) * 1000000 "
            "DIV (bhi - blo) AS BIGINT) END"
        ),
    )
    est = contrib.groupBy("pred_id", "lo_cents", "hi_cents").agg(
        F.sum("c_micro").cast("long").alias("est_micro")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    actual = (
        orders.select(cents.alias("c"))
        .crossJoin(F.broadcast(pdf))
        .where((F.col("c") >= F.col("lo_cents")) & (F.col("c") <= F.col("hi_cents")))
        .groupBy("pred_id")
        .agg(F.count("*").cast("long").alias("actual_rows"))
    )
    return (
        est.join(actual, "pred_id", "left")
        .select(
            "pred_id",
            "lo_cents",
            "hi_cents",
            "est_micro",
            F.coalesce("actual_rows", F.lit(0)).cast("long")
            .alias("actual_rows"),
            F.abs(
                F.col("est_micro")
                - F.coalesce("actual_rows", F.lit(0)) * 1_000_000
            ).cast("long").alias("err_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Selinger-style join-order enumeration (the CBO's ordering decision,
# completing the stats plane: sizes -> selectivity -> join order)
# ---------------------------------------------------------------------------
#
# Over the region-nation-customer-orders FK chain, enumerate every
# LEFT-DEEP order whose prefixes stay connected (no cross products —
# for a 4-node path that is the 8 interval extensions) and price each
# with the textbook model: |I join T on k| = |I| * |T| DIV
# max(ndv_I(k), ndv_T(k)), ndv preserved through joins, cost = C_out
# (sum of intermediate join sizes). Everything is exact integers with
# DECIMAL(38,0) intermediates (row-count products overflow int64 at
# warehouse scale; the QUOTIENTS are row estimates and always fit).
# The stats themselves are one aggregate per table — at 10^12 rows
# they'd come from Iceberg NDV sketches, same arithmetic.

JO_CHAIN = ["region", "nation", "customer", "orders"]
# adjacency: (left table, right table) -> (left key col, right key col)
JO_EDGES = {
    ("region", "nation"): ("r_regionkey", "n_regionkey"),
    ("nation", "customer"): ("n_nationkey", "c_nationkey"),
    ("customer", "orders"): ("c_custkey", "o_custkey"),
}


def _left_deep_orders(chain: list) -> list:
    """All connected-prefix permutations of a path graph (interval
    extensions), in deterministic recursion order."""
    n, res = len(chain), []

    def rec(lo, hi, seq):
        if len(seq) == n:
            res.append(tuple(seq))
            return
        if lo > 0:
            rec(lo - 1, hi, seq + [chain[lo - 1]])
        if hi < n - 1:
            rec(lo, hi + 1, seq + [chain[hi + 1]])

    for i in range(n):
        rec(i, i, [chain[i]])
    return res


def join_order_costs(tables: dict) -> DataFrame:
    """(rank, plan, est_rows, cost) — every valid left-deep order of
    the FK chain priced from per-table stats, ranked by (cost, plan).
    One scalar-aggregate pass per table crossJoined into a single stats
    row; the enumeration is a literal struct array over that row —
    metadata-grain end to end, zero collect."""
    stats = None
    for t in JO_CHAIN:
        keys = set()
        for (a, b), (ka, kb) in JO_EDGES.items():
            if a == t:
                keys.add(ka)
            if b == t:
                keys.add(kb)
        aggs = [F.count("*").cast("long").alias(f"n_{t}")] + [
            F.countDistinct(k).cast("long").alias(f"ndv_{t}_{k}")
            for k in sorted(keys)
        ]
        row = tables[t].agg(*aggs)
        stats = row if stats is None else stats.crossJoin(row)

    def edge_for(t, placed):
        for (a, b), (ka, kb) in JO_EDGES.items():
            if a == t and b in placed:
                return b, kb, ka
            if b == t and a in placed:
                return a, ka, kb
        raise ValueError(f"{t} not adjacent to {placed}")  # pragma: no cover

    structs = []
    for order in _left_deep_orders(JO_CHAIN):
        placed = {order[0]}
        est = f"CAST(n_{order[0]} AS DECIMAL(38,0))"
        terms = []
        for t in order[1:]:
            s, sk, tk = edge_for(t, placed)
            est = (
                f"(({est}) * n_{t} DIV "
                f"greatest(ndv_{s}_{sk}, ndv_{t}_{tk}))"
            )
            terms.append(est)
            placed.add(t)
        plan = ">".join(o[0].upper() for o in order)
        structs.append(
            f"named_struct('plan', '{plan}', "
            f"'est_rows', CAST({terms[-1]} AS BIGINT), "
            f"'cost', CAST({' + '.join(terms)} AS BIGINT))"
        )
    exploded = stats.select(
        F.explode(F.expr("array(" + ", ".join(structs) + ")")).alias("p")
    ).select("p.*")
    wr = Window.orderBy("cost", "plan")
    return exploded.select(
        F.row_number().over(wr).cast("long").alias("rank"),
        "plan",
        "est_rows",
        "cost",
    )


# ---------------------------------------------------------------------------
# Change-data-feed generation (snapshot diff -> CDC ops), the inverse
# of MERGE: cdc_diff(old, merge_upsert(old, changes)) == changes for
# batches whose updates actually change a column (no-op updates are
# invisible in state and correctly absent from the feed).
# ---------------------------------------------------------------------------


def cdc_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(o_orderkey, op, o_custkey, o_total_cents, o_orderstatus) — the
    change batch transforming ``old`` into ``new`` (both keyed by
    o_orderkey, money already integer cents): keys only in old emit D
    with the OLD row, keys only in new emit I, keys in both with any
    column differing emit U with the NEW row. One full-outer join on
    the key + a CASE projection — the read path of a changelog feed
    (Delta CDF / Iceberg changelog) computed from two snapshots."""
    o = old.select(
        "o_orderkey",
        F.col("o_custkey").alias("o_ck"),
        F.col("o_total_cents").alias("o_tc"),
        F.col("o_orderstatus").alias("o_st"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        "o_orderkey",
        F.col("o_custkey").alias("n_ck"),
        F.col("o_total_cents").alias("n_tc"),
        F.col("o_orderstatus").alias("n_st"),
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, "o_orderkey", "full_outer")
    # null-safe inequality on every column: a NULL column value must
    # compare as a difference, not vanish (<=> is null-safe equality)
    changed = ~(
        F.expr("o_ck <=> n_ck") & F.expr("o_tc <=> n_tc")
        & F.expr("o_st <=> n_st")
    )
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    return (
        j.withColumn(
            "op",
            F.when(in_old & ~in_new, F.lit("D"))
            .when(~in_old & in_new, F.lit("I"))
            .when(changed, F.lit("U")),
        )
        .where(F.col("op").isNotNull())
        .select(
            "o_orderkey",
            "op",
            F.when(F.col("op") == "D", F.col("o_ck"))
            .otherwise(F.col("n_ck")).cast("long").alias("o_custkey"),
            F.when(F.col("op") == "D", F.col("o_tc"))
            .otherwise(F.col("n_tc")).cast("long").alias("o_total_cents"),
            F.when(F.col("op") == "D", F.col("o_st"))
            .otherwise(F.col("n_st")).alias("o_orderstatus"),
        )
    )
