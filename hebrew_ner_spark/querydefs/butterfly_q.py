"""Gates: butterfly (2x2-biclique) census over the entity-document
bipartite graph. Right-pivot wedge counting with the hard-cap /
loud-overflow contract: the default-cap gates count over every doc
(max degree 18 = the term vocabulary), the capped twin (cap 12 —
inside the corpus degree range, so ~3/5 of docs are over-cap) gates
BOTH the exclusion arithmetic and the overflow report. CTE names
bf-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import butterfly
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_TERMS = ", ".join(f"'{t}'" for t in ENTITY_TERMS)
_CAP_LOW = 12  # forced under the corpus max degree: exclusion is real

_EDGES_CTE = f"""
bfm AS (
  SELECT DISTINCT token AS lft, doc_id AS rgt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents)
  WHERE token IN ({_TERMS})
)
"""


def _ok_cte(cap: int) -> str:
    return f"""
bfrd AS (SELECT rgt, CAST(count(*) AS BIGINT) AS rdeg FROM bfm GROUP BY rgt),
bfok AS (SELECT m.lft, m.rgt FROM bfm m JOIN bfrd d ON d.rgt = m.rgt
         WHERE d.rdeg <= {cap}),
bfpc AS (
  SELECT a.lft AS e1, b.lft AS e2, CAST(count(*) AS BIGINT) AS c
  FROM bfok a JOIN bfok b ON a.rgt = b.rgt AND a.lft < b.lft
  GROUP BY a.lft, b.lft
)
"""


def _stats_sql(cap: int) -> str:
    return f"""
    WITH {_EDGES_CTE},
    {_ok_cte(cap)}
    SELECT
      (SELECT CAST(count(DISTINCT lft) AS BIGINT) FROM bfok) AS n_left,
      (SELECT CAST(count(DISTINCT rgt) AS BIGINT) FROM bfok) AS n_right,
      (SELECT CAST(count(*) AS BIGINT) FROM bfok) AS n_edges,
      (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT)
       FROM (SELECT count(*) AS d FROM bfok GROUP BY rgt)) AS wedges,
      (SELECT CAST(count(*) AS BIGINT) FROM bfpc) AS pairs,
      (SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) FROM bfpc)
        AS butterflies
    """


def _edges(spark, sf_dir):
    return butterfly.entity_doc_edges(load_table(spark, sf_dir, "documents"))


@query("graph_butterflies", oracle=_stats_sql(butterfly.BF_MAX_RIGHT_DEG))
def graph_butterflies(spark, sf_dir):
    """Global butterfly census (wedges, co-occurring pairs, butterflies)
    at the default cap — every doc eligible on this corpus
    (operators/butterfly.py butterfly_stats)."""
    return butterfly.butterfly_stats(_edges(spark, sf_dir))


@query("graph_butterflies_capped", oracle=_stats_sql(_CAP_LOW))
def graph_butterflies_capped(spark, sf_dir):
    """The same census with the cap forced under the corpus max degree
    — over-cap docs are excluded from every count, and the exclusion
    arithmetic itself is what this gate hashes."""
    return butterfly.butterfly_stats(_edges(spark, sf_dir), max_right_deg=_CAP_LOW)


@query(
    "graph_butterfly_degrees",
    oracle=f"""
    WITH {_EDGES_CTE},
    {_ok_cte(butterfly.BF_MAX_RIGHT_DEG)},
    bfw AS (
      SELECT m.lft, CAST(sum(d.rdeg - 1) AS BIGINT) AS wedges
      FROM bfok m JOIN bfrd d ON d.rgt = m.rgt GROUP BY m.lft
    ),
    bfb AS (
      SELECT lft, CAST(sum(b) AS BIGINT) AS butterflies FROM (
        SELECT e1 AS lft, c * (c - 1) // 2 AS b FROM bfpc
        UNION ALL
        SELECT e2, c * (c - 1) // 2 FROM bfpc
      ) GROUP BY lft
    )
    SELECT w.lft AS "left", w.wedges,
           CAST(coalesce(b.butterflies, 0) AS BIGINT) AS butterflies
    FROM bfw w LEFT JOIN bfb b ON b.lft = w.lft
    """,
)
def graph_butterfly_degrees(spark, sf_dir):
    """Per-entity wedge / butterfly participation
    (operators/butterfly.py butterfly_degrees)."""
    return butterfly.butterfly_degrees(_edges(spark, sf_dir))


@query(
    "graph_butterfly_overflow",
    oracle=f"""
    WITH {_EDGES_CTE}
    SELECT rgt AS "right", CAST(count(*) AS BIGINT) AS rdeg
    FROM bfm GROUP BY rgt HAVING count(*) > {_CAP_LOW}
    """,
)
def graph_butterfly_overflow(spark, sf_dir):
    """The non-silent exclusion report at the forced-low cap: every
    over-cap doc surfaces here and is absent from the capped census
    (operators/butterfly.py butterfly_overflow)."""
    return butterfly.butterfly_overflow(_edges(spark, sf_dir), max_right_deg=_CAP_LOW)
