"""Gates: knowledge fusion (fact confidence x source reliability).

The oracle unrolls the fixed FUSION_ITERS mutual-reinforcement rounds as
MATERIALIZED DuckDB CTEs (the kg_hits rule: without MATERIALIZED the
nested scalar-max subqueries re-evaluate each round exponentially) and
replays the exact integer arithmetic — SUM in HUGEINT cast back,
truncating ``//`` == Spark ``DIV`` on non-negatives, GREATEST(max, 1)
rescale guard — so confidences and reliabilities match bit-for-bit.

Host attribution in the gate is closed-form from doc_id (doc_id % 4
shards, the weblinks _host_shard discipline) so the oracle never runs an
extractor or URL parser; the production entry point is the same operator
over host_of(url)-keyed triples from the web lifecycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import fusion, kg
from hebrew_ner_spark.operators.fusion import FUSION_ITERS, FUSION_SCALE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS, PREDICATE_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_ENTS_SQL = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"
_PREDS_SQL = "(" + ", ".join(f"'{t}'" for t in PREDICATE_TERMS) + ")"

N_FUSION_HOSTS = 4

# distinct (host, subj, pred, obj) assertions, host sharded closed-form
_ASSERTIONS_CTE = f"""
    toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    w AS (
      SELECT doc_id, token,
             lag(token)  OVER (PARTITION BY doc_id ORDER BY word_index) AS subj,
             lead(token) OVER (PARTITION BY doc_id ORDER BY word_index) AS obj
      FROM toks
    ),
    a AS MATERIALIZED (
      SELECT DISTINCT
             'ex' || CAST(doc_id % {N_FUSION_HOSTS} AS VARCHAR) || '.example.net' AS host,
             subj, token AS pred, obj
      FROM w
      WHERE token IN {_PREDS_SQL} AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
    )
"""


def _fusion_oracle(iters: int, out: str) -> str:
    """Unrolled fusion rounds; ``out`` is 'facts' or 'hosts'."""
    s = FUSION_SCALE
    rounds = [
        f"""
    r0 AS (SELECT host, CAST({s} AS BIGINT) AS v
           FROM (SELECT DISTINCT host FROM a))"""
    ]
    prev_rel = "r0"
    for k in range(1, iters + 1):
        rounds.append(
            f"""
    c{k}r AS MATERIALIZED (
      SELECT subj, pred, obj, CAST(SUM(v) AS BIGINT) AS r,
             COUNT(*) AS n_hosts
      FROM a JOIN {prev_rel} USING (host) GROUP BY 1, 2, 3),
    c{k} AS MATERIALIZED (
      SELECT subj, pred, obj,
             CAST((r * {s}) // (SELECT GREATEST(MAX(r), 1) FROM c{k}r)
                  AS BIGINT) AS v,
             n_hosts
      FROM c{k}r),
    r{k}r AS MATERIALIZED (
      SELECT host, CAST(CAST(SUM(v) AS HUGEINT) // COUNT(*) AS BIGINT) AS r,
             COUNT(*) AS n_facts
      FROM a JOIN c{k} USING (subj, pred, obj) GROUP BY 1),
    r{k} AS MATERIALIZED (
      SELECT host,
             CAST((r * {s}) // (SELECT GREATEST(MAX(r), 1) FROM r{k}r)
                  AS BIGINT) AS v,
             n_facts
      FROM r{k}r)"""
        )
        prev_rel = f"r{k}"
    if out == "facts":
        tail = f"SELECT subj, pred, obj, n_hosts, v AS conf_1e6 FROM c{iters}"
    elif out == "resolved":
        tail = f"""SELECT subj, pred, obj, conf_1e6, n_alternatives FROM (
          SELECT subj, pred, obj, v AS conf_1e6,
                 row_number() OVER (PARTITION BY subj, pred
                                    ORDER BY v DESC, n_hosts DESC, obj DESC)
                   AS rn,
                 CAST(count(*) OVER (PARTITION BY subj, pred) AS BIGINT)
                   AS n_alternatives
          FROM c{iters}) WHERE rn = 1"""
    elif out == "calibration":
        bin_w = fusion.FUSION_SCALE // fusion.N_CALIBRATION_BINS
        tail = f"""SELECT CAST(bin AS BIGINT) AS bin, n_facts, sum_conf_1e6,
                 n_correct,
                 CAST((2 * sum_conf_1e6 + n_facts) // (2 * n_facts) AS BIGINT)
                   AS mean_conf_1e6,
                 CAST((2 * n_correct * 1000000 + n_facts) // (2 * n_facts)
                      AS BIGINT) AS acc_1e6,
                 CAST((2 * ABS(n_correct * 1000000 - sum_conf_1e6) + n_facts)
                      // (2 * n_facts) AS BIGINT) AS gap_1e6
          FROM (
            SELECT LEAST(c.v // {bin_w}, {fusion.N_CALIBRATION_BINS - 1}) AS bin,
                   CAST(count(*) AS BIGINT) AS n_facts,
                   CAST(sum(c.v) AS BIGINT) AS sum_conf_1e6,
                   CAST(sum(CASE WHEN c.rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_correct
            FROM (
              SELECT v, row_number() OVER (PARTITION BY subj, pred
                         ORDER BY v DESC, n_hosts DESC, obj DESC) AS rn
              FROM c{iters}) c
            GROUP BY 1)"""
    else:
        tail = f"SELECT host, n_facts, v AS rel_1e6 FROM r{iters}"
    return f"WITH {_ASSERTIONS_CTE}, {','.join(rounds)}\n    {tail}"


def _assertions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return kg.doc_triples(docs).select(
        F.concat(
            F.lit("ex"),
            (F.col("doc_id") % N_FUSION_HOSTS).cast("string"),
            F.lit(".example.net"),
        ).alias("host"),
        "subj",
        "pred",
        "obj",
    )


@query("kg_fact_fusion", oracle=_fusion_oracle(FUSION_ITERS, "facts"))
def kg_fact_fusion(spark, sf_dir):
    """Fused fact confidences after FUSION_ITERS reinforcement rounds."""
    return fusion.fact_confidences(_assertions(spark, sf_dir))


@query("kg_source_reliability", oracle=_fusion_oracle(FUSION_ITERS, "hosts"))
def kg_source_reliability(spark, sf_dir):
    """Fused per-host source reliabilities (same rounds, host side)."""
    return fusion.source_reliability(_assertions(spark, sf_dir))


@query("kg_fusion_calibration", oracle=_fusion_oracle(FUSION_ITERS, "calibration"))
def kg_fusion_calibration(spark, sf_dir):
    """Reliability-diagram bins for the fused confidences: per decile
    bin, fact count, exact sum of conf, slot-winner count, and the
    half-up |accuracy - mean confidence| gap (the ECE integrand).
    Slot-keyed argmax + fact-keyed label join + a <=10-group rollup —
    every aggregate map-side combinable (operators/fusion.py
    fusion_calibration; Knowledge Vault's calibration curve)."""
    return fusion.fusion_calibration(_assertions(spark, sf_dir))


# ---------------------------------------------------------------------------
# fact source diversity (evidence grain — no vote dedup)
# ---------------------------------------------------------------------------

# Evidence-grain assertions: every (doc, position) pattern match is one
# page-evidence row (no DISTINCT — diversity measures raw evidence mass).
# Hosts are sharded doc_id % 6 with a doc_id % 3 TLD so n_tlds is
# non-vacuous (6 hosts over 3 TLDs).
N_DIVERSITY_HOSTS = 6

_EVIDENCE_CTE = f"""
    fsd_toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    fsd_w AS (
      SELECT doc_id, token,
             lag(token)  OVER (PARTITION BY doc_id ORDER BY word_index) AS subj,
             lead(token) OVER (PARTITION BY doc_id ORDER BY word_index) AS obj
      FROM fsd_toks
    ),
    fsd_a AS MATERIALIZED (
      SELECT 'ex' || CAST(doc_id % {N_DIVERSITY_HOSTS} AS VARCHAR)
               || '.example.'
               || (CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN 'net' WHEN 1 THEN 'org' ELSE 'io' END) AS host,
             subj, token AS pred, obj
      FROM fsd_w
      WHERE token IN {_PREDS_SQL} AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
    ),
    fsd_h AS (
      SELECT subj, pred, obj, host, CAST(COUNT(*) AS BIGINT) AS nh
      FROM fsd_a GROUP BY 1, 2, 3, 4
    )
"""

_DIVERSITY_SQL = f"""
WITH {_EVIDENCE_CTE}
SELECT subj, pred, obj,
       CAST(SUM(nh) AS BIGINT) AS n_pages,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(COUNT(DISTINCT string_split(host, '.')[-1]) AS BIGINT) AS n_tlds,
       CAST((2 * 1000000 * SUM(CAST(nh AS HUGEINT) * nh)
             + CAST(SUM(nh) AS HUGEINT) * SUM(nh))
            // (2 * CAST(SUM(nh) AS HUGEINT) * SUM(nh)) AS BIGINT) AS herf_1e6
FROM fsd_h GROUP BY 1, 2, 3
"""


def _evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return kg.doc_triples(docs).select(
        F.concat(
            F.lit("ex"),
            (F.col("doc_id") % N_DIVERSITY_HOSTS).cast("string"),
            F.lit(".example."),
            F.element_at(
                F.array(F.lit("net"), F.lit("org"), F.lit("io")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ),
        ).alias("host"),
        "subj",
        "pred",
        "obj",
    )


@query("kg_fact_diversity", oracle=_DIVERSITY_SQL)
def kg_fact_diversity(spark, sf_dir):
    """Per-fact source diversity (pages/hosts/TLDs + host Herfindahl)."""
    return fusion.fact_source_diversity(_evidence(spark, sf_dir))


@query("kg_resolved_facts", oracle=_fusion_oracle(FUSION_ITERS, "resolved"))
def kg_resolved_facts(spark, sf_dir):
    """Truth-discovery resolution: the argmax object per (subj, pred)
    slot under fused confidence, deterministic tie order, with the
    contradiction count retained."""
    return fusion.resolve_facts(_assertions(spark, sf_dir))
