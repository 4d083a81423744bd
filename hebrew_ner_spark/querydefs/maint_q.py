"""Gates for table maintenance (operators/maintenance.py).

Oracles replay the bin-pack window and the Morton interleave with
DuckDB's native bit operators (`>>`/`<<`/`&`) against Spark's
shiftleft/shiftright — identical values, independent spelling. CTE
names are mnt-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import maintenance
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

T = maintenance.TARGET_BYTES
B = maintenance.Z_BITS


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "maint_compaction_plan",
    oracle=f"""
    WITH mntfiles AS (
      SELECT doc_id AS file_id,
             CAST(1000 + (doc_id * doc_id * 2654435761) % 399000 AS BIGINT) AS bytes
      FROM documents
    )
    SELECT file_id, bytes,
           CAST(coalesce(sum(bytes) OVER
             (ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) // {T} AS BIGINT) AS grp
    FROM mntfiles
    """,
)
def maint_compaction_plan(spark, sf_dir):
    """Greedy binpack rewrite groups over the synthesized small-file
    inventory: one running-total window over metadata, groups contiguous
    in file_id (each rewrite task reads a key range)."""
    return maintenance.compaction_plan(
        maintenance.synth_file_inventory(_docs(spark, sf_dir))
    )


def _duck_interleave(col: str, shift: int) -> str:
    terms = " + ".join(
        f"((({col} >> {i}) & 1) << {2 * i + shift})" for i in range(B)
    )
    return f"({terms})"


@query(
    "maint_zorder_keys",
    oracle=f"""
    SELECT doc_id,
           CAST({_duck_interleave("(doc_id % 65536)", 0)}
                + {_duck_interleave("(n_chars % 65536)", 1)} AS BIGINT) AS zkey
    FROM documents
    """,
)
def maint_zorder_keys(spark, sf_dir):
    """Morton Z-order write keys over (doc_id, n_chars): bit interleave
    in pure codegen arithmetic; sorting by zkey clusters both dimensions
    for file-level min/max pruning."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % 65536).alias("_zx"),
        (F.col("n_chars") % 65536).alias("_zy"),
    )
    return maintenance.zorder_keys(docs, "_zx", "_zy").select("doc_id", "zkey")


# ---------------------------------------------------------------------------
# Manifest-level scan pruning
# ---------------------------------------------------------------------------

_LO = maintenance.PRUNE_LO
_HI = maintenance.PRUNE_HI

_MNT_STATS = """
mntstats AS (
  SELECT doc_id AS file_id,
         ((doc_id * 37) % 1000) // 100 AS part_day,
         CASE WHEN doc_id % 17 <> 0 THEN (doc_id * 37) % 1000 END AS min_v,
         CASE WHEN doc_id % 17 <> 0 THEN
           least((doc_id * 37) % 1000 + doc_id % 50,
                 (((doc_id * 37) % 1000) // 100) * 100 + 99) END AS max_v,
         CAST(1000 + (doc_id * doc_id * 2654435761) % 399000 AS BIGINT) AS bytes
  FROM documents
)
"""

_MNT_DECIDE = f"""
mntdec AS (
  SELECT file_id,
         CAST(CASE WHEN part_day * 100 <= {_HI}
                    AND part_day * 100 + 99 >= {_LO} THEN 1 ELSE 0 END
              AS BIGINT) AS part_kept,
         CAST(CASE WHEN min_v IS NULL
                    OR NOT (max_v < {_LO} OR min_v > {_HI}) THEN 1 ELSE 0 END
              AS BIGINT) AS stats_kept,
         bytes
  FROM mntstats
)
"""


@query(
    "maint_manifest_prune",
    oracle=f"""
    WITH {_MNT_STATS},
    {_MNT_DECIDE}
    SELECT file_id, part_kept, stats_kept,
           CAST(part_kept * stats_kept AS BIGINT) AS scan, bytes
    FROM mntdec
    """,
)
def maint_manifest_prune(spark, sf_dir):
    """Two-level Iceberg scan planning: partition-transform pruning,
    then min/max file-stats pruning with NULL-stats conservatism."""
    return maintenance.manifest_prune(
        maintenance.synth_file_stats(_docs(spark, sf_dir))
    )


@query(
    "maint_prune_summary",
    oracle=f"""
    WITH {_MNT_STATS},
    {_MNT_DECIDE},
    mntsum AS (
      SELECT CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(part_kept * stats_kept) AS BIGINT) AS n_scanned,
             CAST(sum(bytes) AS BIGINT) AS bytes_total,
             CAST(sum(bytes * part_kept * stats_kept) AS BIGINT) AS bytes_scanned
      FROM mntdec
    )
    SELECT n_files, n_scanned, bytes_total, bytes_scanned,
           CAST((2 * (bytes_total - bytes_scanned) * 1000000 + bytes_total)
                // (2 * bytes_total) AS BIGINT) AS skip_share_1e6
    FROM mntsum
    """,
)
def maint_prune_summary(spark, sf_dir):
    """Planner headline: files/bytes the predicate never touches
    (half-up micro-unit skip share)."""
    return maintenance.prune_summary(
        maintenance.manifest_prune(
            maintenance.synth_file_stats(_docs(spark, sf_dir))
        )
    )


@query(
    "maint_expire_orphans",
    oracle=f"""
    WITH mntrefs AS (
      SELECT s.v AS snap, doc_id AS file_id
      FROM documents, (SELECT unnest(range({maintenance.N_SNAPSHOTS})) AS v) s
      WHERE s.v >= doc_id % {maintenance.N_SNAPSHOTS}
        AND s.v <= least(doc_id % {maintenance.N_SNAPSHOTS} + doc_id % 3,
                         {maintenance.N_SNAPSHOTS - 1})
    )
    SELECT file_id,
           CAST(count(*) AS BIGINT) AS n_refs,
           CAST(sum(CASE WHEN snap >= {maintenance.KEEP_FROM} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(CASE WHEN sum(CASE WHEN snap >= {maintenance.KEEP_FROM}
                              THEN 1 ELSE 0 END) = 0
                THEN 1 ELSE 0 END AS BIGINT) AS orphan
    FROM mntrefs GROUP BY file_id
    """,
)
def maint_expire_orphans(spark, sf_dir):
    """Snapshot expiry GC: per-file reference counts over the planted
    snapshot membership; orphan = referenced by no retained snapshot."""
    return maintenance.expire_snapshots(
        maintenance.synth_snapshot_refs(_docs(spark, sf_dir))
    )


# --- merge-on-read row-level deletes -----------------------------------------

from hebrew_ner_spark.functions.hashing import phash_duck as _mor_phash  # noqa: E402

_MOR = f"""
mrr AS (
  SELECT CAST(doc_id // {maintenance.MOR_FILE_ROWS} AS BIGINT) AS file_id,
         CAST(doc_id % {maintenance.MOR_FILE_ROWS} AS BIGINT) AS pos,
         doc_id, lang,
         CAST((doc_id // {maintenance.MOR_FILE_ROWS}) % 3 + 1 AS BIGINT)
           AS data_seq
  FROM documents
),
mpd AS (
  SELECT CAST(doc_id // {maintenance.MOR_FILE_ROWS} AS BIGINT) AS file_id,
         CAST(doc_id % {maintenance.MOR_FILE_ROWS} AS BIGINT) AS pos,
         CAST(CASE WHEN h % 2 = 0 THEN 3 ELSE 1 END AS BIGINT) AS seq
  FROM (SELECT doc_id,
               {_mor_phash('CAST(doc_id AS VARCHAR)', maintenance.MOR_POS_SEED)} AS h
        FROM documents)
  WHERE h % 5 = 0
),
med(dlang, dseq) AS (VALUES ('he', CAST(2 AS BIGINT)), ('en', CAST(4 AS BIGINT)))
"""


@query(
    "maint_mor_read",
    oracle=f"""
    WITH {_MOR}
    SELECT file_id, pos, doc_id, lang, data_seq FROM mrr r
    WHERE NOT EXISTS (SELECT 1 FROM mpd p
                      WHERE p.file_id = r.file_id AND p.pos = r.pos
                        AND r.data_seq <= p.seq)
      AND NOT EXISTS (SELECT 1 FROM med e
                      WHERE e.dlang = r.lang AND r.data_seq < e.dseq)
    """,
)
def maint_mor_read(spark, sf_dir):
    """Iceberg v2 merge-on-read scan: position deletes (data_seq <=
    delete seq) and equality deletes (data_seq STRICTLY < delete seq)
    folded as broadcast anti-joins — the boundary rows on both rules
    are planted, so a <= / < mixup flips the hash."""
    docs = _docs(spark, sf_dir)
    return maintenance.mor_read(
        maintenance.synth_mor_rows(docs),
        maintenance.synth_pos_deletes(docs),
        maintenance.synth_eq_deletes(spark),
    )


@query(
    "maint_mor_stats",
    oracle=f"""
    WITH {_MOR},
    mfl AS (
      SELECT r.file_id,
             CASE WHEN EXISTS (SELECT 1 FROM mpd p
                               WHERE p.file_id = r.file_id AND p.pos = r.pos
                                 AND r.data_seq <= p.seq)
                  THEN 1 ELSE 0 END AS posdel,
             CASE WHEN NOT EXISTS (SELECT 1 FROM mpd p
                                   WHERE p.file_id = r.file_id AND p.pos = r.pos
                                     AND r.data_seq <= p.seq)
                   AND EXISTS (SELECT 1 FROM med e
                               WHERE e.dlang = r.lang AND r.data_seq < e.dseq)
                  THEN 1 ELSE 0 END AS eqdel
      FROM mrr r
    )
    SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(posdel) AS BIGINT) AS n_pos_deleted,
           CAST(sum(eqdel) AS BIGINT) AS n_eq_deleted,
           CAST(count(*) - sum(posdel) - sum(eqdel) AS BIGINT) AS n_live
    FROM mfl GROUP BY file_id
    """,
)
def maint_mor_stats(spark, sf_dir):
    """Per-file delete audit (the compaction planner's rewrite-candidate
    input); position deletes bind tighter than equality predicates."""
    docs = _docs(spark, sf_dir)
    return maintenance.mor_file_stats(
        maintenance.synth_mor_rows(docs),
        maintenance.synth_pos_deletes(docs),
        maintenance.synth_eq_deletes(spark),
    )


# --- partition-spec + schema evolution ---------------------------------------

_EVOLVED = f"""
mev AS (
  SELECT doc_id AS file_id,
         CAST(doc_id % 2 + 1 AS BIGINT) AS spec_v,
         CAST(CASE WHEN doc_id % 2 + 1 = 1
                   THEN ((doc_id * 37) % 1000) // {maintenance.SPEC1_WIDTH}
                   ELSE ((doc_id * 37) % 1000) // {maintenance.SPEC2_WIDTH}
              END AS BIGINT) AS part_val,
         CAST((doc_id * 37) % 1000 AS BIGINT) AS min_v,
         CAST(CASE WHEN doc_id % 2 + 1 = 1 THEN {maintenance.SPEC1_WIDTH}
                   ELSE {maintenance.SPEC2_WIDTH} END AS BIGINT) AS width,
         CAST(1000 + (doc_id * doc_id * 2654435761) % 399000 AS BIGINT) AS bytes
  FROM documents
),
mev2 AS (
  SELECT file_id, spec_v, part_val, min_v,
         least(min_v + file_id % 50, (part_val + 1) * width - 1) AS max_v,
         width, bytes
  FROM mev
),
mevd AS (
  SELECT file_id, spec_v,
         CAST(CASE WHEN part_val * width <= {maintenance.PRUNE_HI}
                    AND (part_val + 1) * width - 1 >= {maintenance.PRUNE_LO}
              THEN 1 ELSE 0 END AS BIGINT) AS part_kept,
         CAST(CASE WHEN max_v < {maintenance.PRUNE_LO}
                     OR min_v > {maintenance.PRUNE_HI}
              THEN 0 ELSE 1 END AS BIGINT) AS stats_kept,
         bytes
  FROM mev2
)
"""


@query(
    "maint_spec_evolution",
    oracle=f"""
    WITH {_EVOLVED}
    SELECT file_id, spec_v, part_kept, stats_kept,
           CAST(part_kept * stats_kept AS BIGINT) AS scan, bytes
    FROM mevd
    """,
)
def maint_spec_evolution(spark, sf_dir):
    """Multi-spec manifest pruning: each file's partition interval is
    evaluated under ITS OWN spec version (coarse truncate(100) early
    files, refined truncate(10) later ones) — the Iceberg
    partition-evolution read contract."""
    return maintenance.evolved_prune(
        maintenance.synth_evolved_stats(_docs(spark, sf_dir))
    )


@query(
    "maint_spec_evolution_summary",
    oracle=f"""
    WITH {_EVOLVED}
    SELECT spec_v, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(part_kept) AS BIGINT) AS n_part_kept,
           CAST(sum(part_kept * stats_kept) AS BIGINT) AS n_scanned,
           CAST((2 * (count(*) - sum(part_kept * stats_kept)) * 1000000
                 + count(*)) // (2 * count(*)) AS BIGINT) AS skip_share_1e6
    FROM mevd GROUP BY spec_v
    """,
)
def maint_spec_evolution_summary(spark, sf_dir):
    """The payoff per spec generation: the refined spec's partition
    pruning discards ~10x more files for the same probe."""
    return maintenance.evolved_prune_summary(
        maintenance.evolved_prune(
            maintenance.synth_evolved_stats(_docs(spark, sf_dir))
        )
    )


@query(
    "maint_schema_evolution",
    oracle="""
    SELECT doc_id AS id, text AS body, CAST(NULL AS BIGINT) AS score,
           CAST(1 AS BIGINT) AS schema_v
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, text, CAST(n_chars AS BIGINT), CAST(2 AS BIGINT)
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def maint_schema_evolution(spark, sf_dir):
    """Field-id column mapping across a rename + an added column: v1
    files (c_id, c_body) and v2 files (ident, content, score) read as
    one logical (id, body, score) — matching by physical NAME instead
    of field id would lose the renamed column and flip the hash."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    v1 = docs.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("c_id"), F.col("text").alias("c_body")
    )
    v2 = docs.where(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("ident"),
        F.col("text").alias("content"),
        F.col("n_chars").alias("score"),
    )
    return maintenance.evolved_schema_read(v1, v2)


# --- MERGE INTO upsert --------------------------------------------------------

_MRG_H = _mor_phash("CAST(o_orderkey AS VARCHAR)", maintenance.MERGE_SEED)

_MRG_CHANGES = f"""
mgh AS (SELECT *, {_MRG_H} AS h FROM orders),
mgc AS (
  SELECT o_orderkey, 'U' AS op, o_custkey + 7 AS o_custkey,
         o_totalprice, 'P' AS o_orderstatus
  FROM mgh WHERE h % 11 = 0 AND h % 13 <> 0
  UNION ALL
  SELECT o_orderkey, 'D', o_custkey, o_totalprice, o_orderstatus
  FROM mgh WHERE h % 13 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, 'I', o_custkey, o_totalprice, 'O'
  FROM mgh WHERE h % 17 = 0
)
"""


@query(
    "maint_merge_upsert",
    oracle=f"""
    WITH {_MRG_CHANGES}
    SELECT coalesce(t.o_orderkey, c.o_orderkey) AS o_orderkey,
           CAST(CASE WHEN c.op IS NOT NULL THEN c.o_custkey
                ELSE t.o_custkey END AS BIGINT) AS o_custkey,
           CAST(round((CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
                ELSE t.o_totalprice END) * 100) AS BIGINT) AS o_total_cents,
           CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus
    FROM orders t FULL OUTER JOIN mgc c ON t.o_orderkey = c.o_orderkey
    WHERE NOT coalesce(c.op = 'D', FALSE)
    """,
)
def maint_merge_upsert(spark, sf_dir):
    """Three-clause MERGE (matched-delete / matched-update /
    not-matched-insert) over a deterministic CDC batch — one full-outer
    join + CASE projection, the copy-on-write MERGE logical plan."""
    orders = load_table(spark, sf_dir, "orders")
    return maintenance.merge_upsert(
        orders, maintenance.synth_order_changes(orders)
    )


# --- optimistic-concurrency commit validation ---------------------------------

from hebrew_ner_spark.operators import commitlog as _cl  # noqa: E402

_CL_H = _mor_phash("CAST(doc_id AS VARCHAR)", _cl.CL_SEED)

_CL_LOG = f"""
clb AS (
  SELECT CAST(doc_id // {_cl.COMMITS_PER_TABLE} AS BIGINT) AS table_id,
         CAST(doc_id % {_cl.COMMITS_PER_TABLE} AS BIGINT) AS seq,
         CAST(greatest(-1, (doc_id % {_cl.COMMITS_PER_TABLE}) - 1 - (h % 3))
              AS BIGINT) AS base
  FROM (SELECT doc_id, {_CL_H} AS h FROM documents)
),
cld AS (
  SELECT table_id, seq, base,
         'f' || CAST((seq * 5 + ks.k * 3 + table_id) % 8 AS VARCHAR) AS file_id,
         'del' AS action
  FROM clb, (SELECT unnest(range({_cl.FILES_PER_COMMIT})) AS k) ks
),
cla AS (
  SELECT table_id, seq, base, 'new' || CAST(seq AS VARCHAR) AS file_id,
         'add' AS action
  FROM clb
),
cl AS (SELECT * FROM cld UNION ALL SELECT * FROM cla),
cb AS (SELECT DISTINCT table_id, seq, base FROM cl)
"""


def _cl_steps() -> str:
    parts = [
        "ok0 AS (SELECT table_id, CAST(0 AS BIGINT) AS seq,"
        " CAST(1 AS BIGINT) AS ok FROM cb WHERE seq = 0)"
    ]
    acc = "ok0"
    for k in range(1, _cl.COMMITS_PER_TABLE):
        prev = acc
        parts.append(f"""
okp{k} AS (SELECT * FROM {prev}),
ok{k} AS (
  SELECT b.table_id, CAST({k} AS BIGINT) AS seq,
         CAST(CASE WHEN EXISTS (
            SELECT 1 FROM cl m
            JOIN cl d ON d.table_id = m.table_id AND d.action = 'del'
                     AND d.file_id = m.file_id
            JOIN okp{k} u ON u.table_id = d.table_id AND u.seq = d.seq
                         AND u.ok = 1
            WHERE m.table_id = b.table_id AND m.seq = {k}
              AND m.action = 'del'
              AND d.seq > b.base AND d.seq < {k}
         ) THEN 0 ELSE 1 END AS BIGINT) AS ok
  FROM cb b WHERE b.seq = {k}
),
oka{k} AS (SELECT * FROM okp{k} UNION ALL SELECT * FROM ok{k})""")
        acc = f"oka{k}"
    return ",".join(parts), acc


_CL_STEPS, _CL_FINAL = _cl_steps()


@query(
    "maint_commit_conflicts",
    oracle=f"""
    WITH {_CL_LOG},
    {_CL_STEPS}
    SELECT table_id, seq, ok FROM {_CL_FINAL}
    """,
)
def maint_commit_conflicts(spark, sf_dir):
    """Optimistic-concurrency validation of a contended multi-table
    commit log: a commit fails iff a SUCCESSFUL commit it did not see
    (base < seq' < seq) already deleted a file it deletes; failures
    cascade (a failed commit blocks nobody). Grouped sequential fold
    per table vs the oracle's unrolled per-step decisions."""
    return _cl.validate_commits(
        _cl.synth_commit_log(_docs(spark, sf_dir).select("doc_id"))
    )


# ---------------------------------------------------------------------------
# Join-strategy advisor (CBO arithmetic over catalog statistics)
# ---------------------------------------------------------------------------


def _advisor_oracle() -> str:
    stats_arms = []
    for tbl, (nums, strs) in maintenance.ADV_SCHEMAS.items():
        width = f"{maintenance.ADV_NUM_W * len(nums)}"
        for c in strs:
            width += (
                f" + ((2 * sum(length({c})) + count(*)) // (2 * count(*))"
                f" + {maintenance.ADV_STR_OVERHEAD})"
            )
        stats_arms.append(
            f"SELECT '{tbl}' AS tbl, "
            f"CAST(count(*) * ({width}) AS BIGINT) AS est_bytes FROM {tbl}"
        )
    stats_sql = " UNION ALL ".join(stats_arms)
    pairs_vals = ", ".join(
        f"('{l}', '{r}')" for l, r in maintenance.ADV_PAIRS
    )
    return f"""
    WITH stats AS ({stats_sql}),
    pairs(left_tbl, right_tbl) AS (VALUES {pairs_vals})
    SELECT p.left_tbl, p.right_tbl,
           l.est_bytes AS l_bytes, r.est_bytes AS r_bytes,
           CASE WHEN least(l.est_bytes, r.est_bytes)
                     <= {maintenance.ADV_BROADCAST} THEN 'BROADCAST'
                WHEN l.est_bytes > {maintenance.ADV_BUCKET}
                     AND r.est_bytes > {maintenance.ADV_BUCKET} THEN 'BUCKET'
                ELSE 'SHUFFLE' END AS strategy
    FROM pairs p
    JOIN stats l ON l.tbl = p.left_tbl
    JOIN stats r ON r.tbl = p.right_tbl
    """


@query("maint_join_advisor", oracle=_advisor_oracle())
def maint_join_advisor(spark, sf_dir):
    """The CBO's join-strategy decision as an oracle-checkable table:
    exact-integer size model (row counts x type widths + exact mean
    string lengths) -> BROADCAST / SHUFFLE / BUCKET per canonical pair.
    Thresholds are gate-scaled so all three verdicts fire (pytest pins
    that spread); at 10^12 rows the identical arithmetic runs over
    Iceberg stats files instead of the data."""
    tables = {t: load_table(spark, sf_dir, t) for t in maintenance.ADV_SCHEMAS}
    return maintenance.join_advice(maintenance.table_size_stats(tables))


# ---------------------------------------------------------------------------
# Materialized-view rewrite + incremental view maintenance
# ---------------------------------------------------------------------------

_MERGED_BASE = f"""
    {_MRG_CHANGES},
    merged AS (
      SELECT coalesce(t.o_orderkey, c.o_orderkey) AS o_orderkey,
             CAST(round((CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
                  ELSE t.o_totalprice END) * 100) AS BIGINT) AS cents,
             CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus
                  ELSE t.o_orderstatus END AS o_orderstatus
      FROM orders t FULL OUTER JOIN mgc c ON t.o_orderkey = c.o_orderkey
      WHERE NOT coalesce(c.op = 'D', FALSE)
    )
"""


@query(
    "rel_mv_rewrite",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def rel_mv_rewrite(spark, sf_dir):
    """Aggregate-rewrite correctness: the per-status revenue answered
    from the finer-grain MV (sum of sums) must equal the base-table
    aggregate — the oracle never sees the MV."""
    return maintenance.mv_rollup(
        maintenance.orders_mv(load_table(spark, sf_dir, "orders"))
    )


@query(
    "rel_mv_incremental",
    oracle=f"""
    WITH {_MERGED_BASE}
    SELECT o_orderstatus,
           CAST(o_orderkey % {maintenance.MV_BUCKETS} AS BIGINT) AS bucket,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           count(*) AS n_orders
    FROM merged GROUP BY 1, 2
    """,
)
def rel_mv_incremental(spark, sf_dir):
    """IVM == recompute: the MV maintained additively under the CDC
    batch (retract old contributions via a key join, add new ones, drop
    zeroed groups) must equal the MV recomputed over the merged base —
    the oracle IS that recompute, so a missed retraction, a
    double-applied update or a surviving empty group all flip the
    hash."""
    orders = load_table(spark, sf_dir, "orders")
    return maintenance.mv_incremental(
        orders, maintenance.synth_order_changes(orders)
    )


_HB = maintenance.HIST_BUCKETS

_HIST_SQL = f"""
mh AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         ntile({_HB}) OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                                     o_orderkey) AS bucket
  FROM orders
),
mhist AS (
  SELECT CAST(bucket AS BIGINT) AS bucket,
         CAST(min(c) AS BIGINT) AS lo_cents,
         CAST(max(c) AS BIGINT) AS hi_cents,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM mh GROUP BY bucket
)
"""

_PRED_SQL = "(VALUES " + ", ".join(
    f"({i}, {lo}, {hi})" for i, (lo, hi) in enumerate(maintenance.SEL_PREDICATES)
) + ") AS p(pred_id, plo, phi)"


@query(
    "maint_eqdepth_hist",
    oracle=f"WITH {_HIST_SQL} SELECT * FROM mhist",
)
def maint_eqdepth_hist(spark, sf_dir):
    """The ANALYZE-style equi-depth histogram over order totals: the
    Spark side assigns ntile buckets via the two-level global rank (no
    single-partition window), the oracle via DuckDB's NATIVE ntile —
    two independent algorithms must produce identical bucket bounds
    and counts (operators/maintenance.py equi_depth_histogram)."""
    return maintenance.equi_depth_histogram(
        load_table(spark, sf_dir, "orders")
    )


@query(
    "maint_selectivity_est",
    oracle=f"""
    WITH {_HIST_SQL},
    mj AS (
      SELECT CAST(p.pred_id AS BIGINT) AS pred_id,
             CAST(p.plo AS BIGINT) AS lo_cents,
             CAST(p.phi AS BIGINT) AS hi_cents,
             greatest(p.plo, h.lo_cents) AS ovlo,
             least(p.phi, h.hi_cents) AS ovhi,
             h.lo_cents AS blo, h.hi_cents AS bhi, h.n_rows AS bn
      FROM mhist h, {_PRED_SQL}
    ),
    mc AS (
      SELECT pred_id, lo_cents, hi_cents,
             CASE WHEN ovhi < ovlo THEN CAST(0 AS BIGINT)
                  WHEN bhi = blo THEN bn * CAST(1000000 AS BIGINT)
                  ELSE CAST(CAST(bn AS HUGEINT) * (ovhi - ovlo) * 1000000
                            // (bhi - blo) AS BIGINT) END AS c_micro
      FROM mj
    ),
    mest AS (
      SELECT pred_id, lo_cents, hi_cents,
             CAST(sum(c_micro) AS BIGINT) AS est_micro
      FROM mc GROUP BY 1, 2, 3
    ),
    mact AS (
      SELECT CAST(p.pred_id AS BIGINT) AS pred_id,
             CAST(count(*) AS BIGINT) AS actual_rows
      FROM orders o, {_PRED_SQL}
      WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) BETWEEN p.plo AND p.phi
      GROUP BY p.pred_id
    )
    SELECT e.pred_id, e.lo_cents, e.hi_cents, e.est_micro,
           CAST(coalesce(a.actual_rows, 0) AS BIGINT) AS actual_rows,
           CAST(abs(e.est_micro - coalesce(a.actual_rows, 0) * 1000000)
                AS BIGINT) AS err_micro
    FROM mest e LEFT JOIN mact a USING (pred_id)
    """,
)
def maint_selectivity_est(spark, sf_dir):
    """Range-predicate cardinality estimates from the histogram
    (continuous-uniform interpolation, exact micro-row integers with a
    DECIMAL(38,0)/HUGEINT intermediate) reported NEXT TO the actual
    counts — the gate certifies both the estimator arithmetic and its
    observable error (operators/maintenance.py selectivity_report)."""
    return maintenance.selectivity_report(
        load_table(spark, sf_dir, "orders")
    )


def _jo_oracle() -> str:
    """Build the join-order oracle from the SAME chain/edge constants
    and enumeration the operator uses (retuning cannot desync plan and
    oracle); the arithmetic replays in HUGEINT // instead of
    DECIMAL(38,0) DIV."""
    from hebrew_ner_spark.operators.maintenance import (
        JO_CHAIN,
        JO_EDGES,
        _left_deep_orders,
    )

    scalars = []
    for t in JO_CHAIN:
        scalars.append(f"(SELECT count(*) FROM {t}) AS n_{t}")
        for (a, b), (ka, kb) in JO_EDGES.items():
            if a == t:
                scalars.append(
                    f"(SELECT count(DISTINCT {ka}) FROM {t}) AS ndv_{t}_{ka}"
                )
            if b == t:
                scalars.append(
                    f"(SELECT count(DISTINCT {kb}) FROM {t}) AS ndv_{t}_{kb}"
                )

    def edge_for(t, placed):
        for (a, b), (ka, kb) in JO_EDGES.items():
            if a == t and b in placed:
                return b, kb, ka
            if b == t and a in placed:
                return a, ka, kb
        raise ValueError(t)

    rows = []
    for order in _left_deep_orders(JO_CHAIN):
        placed = {order[0]}
        est = f"CAST(n_{order[0]} AS HUGEINT)"
        terms = []
        for t in order[1:]:
            s, sk, tk = edge_for(t, placed)
            est = (
                f"(({est}) * n_{t} // "
                f"greatest(ndv_{s}_{sk}, ndv_{t}_{tk}))"
            )
            terms.append(est)
            placed.add(t)
        plan = ">".join(o[0].upper() for o in order)
        rows.append(
            f"SELECT '{plan}' AS plan, "
            f"CAST({terms[-1]} AS BIGINT) AS est_rows, "
            f"CAST({' + '.join(terms)} AS BIGINT) AS cost FROM jos"
        )
    return f"""
    WITH jos AS (SELECT {', '.join(scalars)}),
    jop AS ({' UNION ALL '.join(rows)})
    SELECT CAST(row_number() OVER (ORDER BY cost, plan) AS BIGINT) AS rank,
           plan, est_rows, cost
    FROM jop
    """


@query("maint_join_order", oracle=_jo_oracle())
def maint_join_order(spark, sf_dir):
    """Selinger-style left-deep join-order enumeration over the FK
    chain, priced from per-table row counts + exact NDVs with the
    textbook containment estimate and C_out cost — the ordering
    decision next to the advisor's strategy decision
    (operators/maintenance.py join_order_costs)."""
    return maintenance.join_order_costs(
        {t: load_table(spark, sf_dir, t) for t in maintenance.JO_CHAIN}
    )


@query(
    "maint_cdc_diff",
    oracle=f"""
    WITH {_MRG_CHANGES}
    SELECT o_orderkey, op,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS o_total_cents,
           o_orderstatus
    FROM mgc
    """,
)
def maint_cdc_diff(spark, sf_dir):
    """Changelog-feed generation as the INVERSE of MERGE: diffing the
    base against its merged result must reproduce the original CDC
    batch exactly (D rows carry the old image, U/I the new) — the
    oracle is the closed-form change batch itself, so the driver row
    certifies the MERGE/DIFF round trip end to end
    (operators/maintenance.py cdc_diff)."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import functions as F

    old = orders.select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
            "o_total_cents"
        ),
        "o_orderstatus",
    )
    merged = maintenance.merge_upsert(
        orders, maintenance.synth_order_changes(orders)
    )
    return maintenance.cdc_diff(old, merged)
