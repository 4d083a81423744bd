"""Entity linking + canonicalization + graph-materialization queries.

The connected-components oracle uses a recursive transitive-closure CTE —
exact component agreement, not just counts, against the Spark label-
propagation loop.
"""

from __future__ import annotations

from hebrew_ner_spark.operators import canonicalize, dedup, linking
from hebrew_ner_spark.querydefs.dedup_q import _BANDS_CTE, _PAIRS_SQL
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_ENTS_SQL = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"


def _dim_values() -> str:
    terms = sorted(ENTITY_TERMS)
    half = len(terms) // 2
    rows = ", ".join(
        f"({i + 1}, '{t if i < half else t.capitalize()}')" for i, t in enumerate(terms)
    )
    return f"dim(entity_id, canonical_name) AS (SELECT * FROM (VALUES {rows}))"


_SPANS_CTE = f"""
toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
lblx AS (
  SELECT doc_id, word_index, token,
         token IN {_ENTS_SQL} AS is_ent,
         coalesce(lag(token) OVER (PARTITION BY doc_id ORDER BY word_index)
                  IN {_ENTS_SQL}, FALSE) AS prev_ent
  FROM toks
),
flagged AS (
  SELECT *, sum(CASE WHEN is_ent AND NOT prev_ent THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id
  FROM lblx
),
spans AS (
  SELECT doc_id, min(word_index) AS lo, max(word_index) AS hi,
         string_agg(token, ' ' ORDER BY word_index) AS surface
  FROM flagged WHERE is_ent GROUP BY doc_id, span_id
)
"""

_LINKED_SQL = """
SELECT s.doc_id, s.lo, s.hi, s.surface,
       CAST(coalesce(d1.entity_id, d2.entity_id, d3.entity_id) AS BIGINT) AS entity_id,
       CAST(CASE WHEN d1.entity_id IS NOT NULL THEN 1
                 WHEN d2.entity_id IS NOT NULL THEN 2
                 WHEN d3.entity_id IS NOT NULL THEN 3
                 ELSE 0 END AS BIGINT) AS tier
FROM spans s
LEFT JOIN dim d1 ON s.surface = d1.canonical_name
LEFT JOIN dim d2 ON s.surface = lower(d2.canonical_name)
LEFT JOIN dim d3 ON string_split(s.surface, ' ')[1] = lower(d3.canonical_name)
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "link_entity_dim",
    oracle=f"WITH {_dim_values()} SELECT CAST(entity_id AS BIGINT) AS entity_id, canonical_name FROM dim",
)
def link_entity_dim(spark, sf_dir):
    return linking.entity_dim(spark)


@query(
    "link_mentions",
    oracle=f"WITH {_SPANS_CTE}, {_dim_values()} {_LINKED_SQL}",
)
def link_mentions(spark, sf_dir):
    """J7 tiered alias resolution of mention surfaces (broadcast x3)."""
    return linking.linked_mentions(_docs(spark, sf_dir))


@query(
    "kg_nodes",
    oracle=f"""
    WITH {_SPANS_CTE}, {_dim_values()},
    linked AS ({_LINKED_SQL})
    SELECT CAST(l.entity_id AS BIGINT) AS entity_id, d.canonical_name,
           count(*) AS n_mentions, count(DISTINCT l.doc_id) AS n_docs
    FROM linked l JOIN dim d ON l.entity_id = d.entity_id
    GROUP BY l.entity_id, d.canonical_name
    """,
)
def kg_nodes_q(spark, sf_dir):
    """Materialized KG node table."""
    return linking.kg_nodes(_docs(spark, sf_dir))


@query(
    "kg_edges",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    w AS (
      SELECT doc_id, word_index, token,
             lag(token)  OVER (PARTITION BY doc_id ORDER BY word_index) AS subj,
             lead(token) OVER (PARTITION BY doc_id ORDER BY word_index) AS obj
      FROM toks
    ),
    t AS (
      SELECT doc_id, subj, token AS pred, obj FROM w
      WHERE token IN ('agg', 'filter', 'join', 'merge', 'scan', 'sort')
        AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
    ),
    {_dim_values()}
    SELECT CAST(ds.entity_id AS BIGINT) AS subj_id, t.pred,
           CAST(do_.entity_id AS BIGINT) AS obj_id, count(*) AS n_evidence
    FROM t
    JOIN dim ds ON t.subj = lower(ds.canonical_name)
    JOIN dim do_ ON t.obj = lower(do_.canonical_name)
    GROUP BY ds.entity_id, t.pred, do_.entity_id
    """,
)
def kg_edges_q(spark, sf_dir):
    """Materialized KG edge table (entity-id resolved, evidence-counted)."""
    return linking.kg_edges(_docs(spark, sf_dir))


@query(
    "cc_dedup_components",
    oracle=f"""
    WITH RECURSIVE {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, count(*) AS n_inter
      FROM pairs p
      JOIN sh a ON a.doc_id = p.doc_a
      JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
      GROUP BY p.doc_a, p.doc_b
    ),
    nd AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST((2 * (n_inter) * 1000000 + (sa.n_sh + sb.n_sh - n_inter)) // (2 * (sa.n_sh + sb.n_sh - n_inter)) AS BIGINT) >= 500000
    ),
    sym AS (SELECT doc_a AS a, doc_b AS b FROM nd UNION SELECT doc_b, doc_a FROM nd),
    base AS (SELECT DISTINCT a, a AS b FROM sym UNION SELECT a, b FROM sym),
    reach(a, b) AS (
      SELECT a, b FROM base
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS doc_id, min(b) AS component_id FROM reach GROUP BY a
    """,
)
def cc_dedup_components(spark, sf_dir):
    """G6: duplicate-document clusters via distributed label propagation;
    oracle computes exact transitive closure recursively. Consumes
    near_dup_pairs_all, so over-cap mega clusters still unify through
    their hub edges — but hub routing is an approximation the exact
    oracle cannot express, so the GATE fails loudly if any over-cap
    bucket exists at the gated scale (otherwise a divergence would
    surface as an opaque hash mismatch). The capped production path
    itself is pinned by tests/test_skew.py."""
    d = _docs(spark, sf_dir)
    over = dedup.lsh_overflow(d).limit(1).count()
    if over:
        raise AssertionError(
            "cc_dedup_components gate: over-cap LSH bucket present at the "
            "gated scale — the exact-transitive-closure oracle cannot model "
            "hub-edge routing; regenerate test data or raise MAX_BUCKET"
        )
    pairs = dedup.near_dup_pairs_all(d)
    return canonicalize.dedup_components(pairs)


@query(
    "kg_edges_salted",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    w AS (
      SELECT doc_id, word_index, token,
             lag(token)  OVER (PARTITION BY doc_id ORDER BY word_index) AS subj,
             lead(token) OVER (PARTITION BY doc_id ORDER BY word_index) AS obj
      FROM toks
    ),
    t AS (
      SELECT doc_id, subj, token AS pred, obj FROM w
      WHERE token IN ('agg', 'filter', 'join', 'merge', 'scan', 'sort')
        AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
    ),
    {_dim_values()}
    SELECT CAST(ds.entity_id AS BIGINT) AS subj_id, t.pred,
           CAST(do_.entity_id AS BIGINT) AS obj_id, count(*) AS n_evidence
    FROM t
    JOIN dim ds ON t.subj = lower(ds.canonical_name)
    JOIN dim do_ ON t.obj = lower(do_.canonical_name)
    GROUP BY ds.entity_id, t.pred, do_.entity_id
    """,
)
def kg_edges_salted(spark, sf_dir):
    """Graph-edge materialization through the two-phase salted plan —
    the mega-entity-safe variant of kg_edges, output-identical."""
    from pyspark.sql import functions as F

    from hebrew_ner_spark.operators import kg
    from hebrew_ner_spark.plans.skew import salted_agg

    d = _docs(spark, sf_dir)
    dim = linking.entity_dim(spark)
    lower_dim = F.broadcast(
        dim.select(F.lower("canonical_name").alias("_name"), "entity_id")
    )
    triples = kg.doc_triples(d)
    s = lower_dim.select(F.col("_name").alias("subj"), F.col("entity_id").alias("subj_id"))
    o = lower_dim.select(F.col("_name").alias("obj"), F.col("entity_id").alias("obj_id"))
    resolved = triples.join(F.broadcast(s), "subj").join(F.broadcast(o), "obj")
    return salted_agg(
        resolved,
        ["subj_id", "pred", "obj_id"],
        buckets=8,
        partial_aggs=[F.count("*").alias("_pc")],
        final_aggs=[F.sum("_pc").cast("long").alias("n_evidence")],
    )
