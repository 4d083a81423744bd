"""Gates: cross-KG entity alignment (PARIS bootstrap round).

Graph A is built from even doc_ids, graph B from odd doc_ids with every
subject renamed ``subj || '_b'`` — two honestly disjoint extractions
whose subjects nonetheless denote the same closed entity vocabulary, so
the planted truth is that ``x_b`` should align to ``x`` wherever the
feature evidence supports it (asserted exactly by pytest; the gates
hash-compare the full candidate/assignment tables against the oracle).
Weights are exact integers (1e6 DIV df), the ranked assignment pins the
(score DESC, ea ASC) tie rule, so both engines match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import align, kg
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS, PREDICATE_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_ENTS_SQL = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"
_PREDS_SQL = "(" + ", ".join(f"'{t}'" for t in PREDICATE_TERMS) + ")"


def _triples_cte(name: str, parity: int, rename: bool) -> str:
    out_subj = "subj || '_b'" if rename else "subj"
    return f"""
    {name} AS (
      SELECT DISTINCT {out_subj} AS subj, pred, obj FROM (
        SELECT doc_id, token AS pred,
               lag(token)  OVER (PARTITION BY doc_id ORDER BY word_index) AS subj,
               lead(token) OVER (PARTITION BY doc_id ORDER BY word_index) AS obj
        FROM (
          SELECT doc_id,
                 generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
                 unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id % 2 = {parity})
      )
      WHERE pred IN {_PREDS_SQL} AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
    )"""


_SCORES_CTE = f"""
    {_triples_cte("ta", 0, False)},
    {_triples_cte("tb", 1, True)},
    fa AS (SELECT subj AS ea, pred, obj FROM ta),
    fb AS (SELECT subj AS eb, pred, obj FROM tb),
    dft AS (SELECT pred, obj, count(*) AS df FROM (
              SELECT pred, obj FROM fa UNION ALL SELECT pred, obj FROM fb)
            GROUP BY 1, 2),
    sc AS (SELECT ea, eb, count(*) AS n_shared,
                  CAST(SUM(1000000 // df) AS BIGINT) AS score_1e6
           FROM fa JOIN dft USING (pred, obj) JOIN fb USING (pred, obj)
           GROUP BY 1, 2)
"""


def _ab(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = kg.doc_triples(docs.where("doc_id % 2 = 0")).select("subj", "pred", "obj")
    b = kg.doc_triples(docs.where("doc_id % 2 = 1")).select(
        F.concat(F.col("subj"), F.lit("_b")).alias("subj"), "pred", "obj"
    )
    return a, b


@query("kg_align_scores", oracle=f"WITH {_SCORES_CTE} SELECT * FROM sc")
def kg_align_scores(spark, sf_dir):
    """Weighted shared-feature candidate scores between the two graphs."""
    return align.align_scores(*_ab(spark, sf_dir))


@query(
    "kg_align_best",
    oracle=f"""
    WITH {_SCORES_CTE}
    SELECT eb, ea, n_shared, score_1e6 FROM (
      SELECT eb, ea, n_shared, score_1e6,
             row_number() OVER (PARTITION BY eb
                                ORDER BY score_1e6 DESC, ea ASC) AS rk
      FROM sc)
    WHERE rk = 1
    """,
)
def kg_align_best(spark, sf_dir):
    """Per-B-entity best alignment (deterministic tie rule)."""
    return align.align_best(*_ab(spark, sf_dir))


@query(
    "kg_sameas_components",
    oracle=f"""
    WITH RECURSIVE {_SCORES_CTE},
    best AS (
      SELECT eb, ea FROM (
        SELECT eb, ea,
               row_number() OVER (PARTITION BY eb
                                  ORDER BY score_1e6 DESC, ea ASC) AS rk
        FROM sc)
      WHERE rk = 1),
    e AS (SELECT 'A:' || ea AS a, 'B:' || eb AS b FROM best),
    sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    base AS (SELECT DISTINCT a, a AS b FROM sym UNION SELECT a, b FROM sym),
    reach(a, b) AS (
      SELECT a, b FROM base
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS vertex, min(b) AS component FROM reach GROUP BY a
    """,
)
def kg_sameas_components(spark, sf_dir):
    """owl:sameAs closure over the cross-KG best alignments: canonical
    merged entity ids via pointer-doubling connected components vs the
    exact recursive-closure oracle (operators/align.py
    sameas_components)."""
    return align.sameas_components(*_ab(spark, sf_dir))
