"""Gate: MIS-centered canopy blocking over the shared-band cheap
metric. The oracle replays the capped band-bucket pair weights, every
Luby round over the tight graph (affine priorities mod a prime above
the doc-id domain), the isolated-vertex center rule, and the loose
membership join. CTE names cp-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import canopy, dedup
from hebrew_ner_spark.operators.symbreak import (
    MIS_MAX_ROUNDS,
    PRIO_ADD,
    PRIO_MUL,
)
from hebrew_ner_spark.querydefs.dedup_q import _bands_cte
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_T2 = canopy.CANOPY_T2_BANDS
_T1 = canopy.CANOPY_T1_BANDS
_PM = canopy.CANOPY_PRIO_MOD
_R = MIS_MAX_ROUNDS

_PAIRS_CTE = f"""
cpok AS (SELECT band, band_key FROM bands
         GROUP BY band, band_key
         HAVING count(DISTINCT doc_id) <= {dedup.MAX_BUCKET}),
cpk AS (SELECT b.doc_id, b.band, b.band_key
        FROM bands b JOIN cpok USING (band, band_key)),
cpw AS (
  SELECT l.doc_id AS a, r.doc_id AS b, CAST(count(*) AS BIGINT) AS w
  FROM cpk l
  JOIN cpk r ON l.band = r.band AND l.band_key = r.band_key
            AND l.doc_id < r.doc_id
  GROUP BY 1, 2
),
cpt AS (SELECT a, b FROM cpw WHERE w >= {_T2}),
cpl AS (SELECT a, b FROM cpw WHERE w >= {_T1}),
cptsym AS (SELECT a AS src, b AS dst FROM cpt
           UNION ALL SELECT b, a FROM cpt)
"""


def _mis_rounds() -> str:
    parts = [
        f"""cpact0 AS MATERIALIZED (
  SELECT v, CAST((v * {PRIO_MUL} + {PRIO_ADD}) % {_PM} AS BIGINT) AS p
  FROM (SELECT DISTINCT src AS v FROM cptsym)
),
cpmis0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS v WHERE FALSE)"""
    ]
    for i in range(1, _R + 1):
        parts.append(
            f"""cpnm{i} AS MATERIALIZED (
  SELECT e.src AS v, min(u2.p) AS nmin
  FROM cptsym e
  JOIN cpact{i - 1} u1 ON u1.v = e.src
  JOIN cpact{i - 1} u2 ON u2.v = e.dst
  GROUP BY e.src
),
cpent{i} AS MATERIALIZED (
  SELECT a.v FROM cpact{i - 1} a LEFT JOIN cpnm{i} m ON m.v = a.v
  WHERE m.nmin IS NULL OR a.p < m.nmin
),
cpmis{i} AS MATERIALIZED (
  SELECT v FROM cpmis{i - 1} UNION ALL SELECT v FROM cpent{i}
),
cpact{i} AS MATERIALIZED (
  SELECT a.v, a.p FROM cpact{i - 1} a
  WHERE a.v NOT IN (SELECT v FROM cpent{i})
    AND a.v NOT IN (SELECT e.dst FROM cptsym e JOIN cpent{i} x ON x.v = e.src)
)"""
        )
    return ",\n".join(parts)


@query(
    "er_canopies",
    oracle=f"""
    WITH {_bands_cte('documents')},
    {_PAIRS_CTE},
    {_mis_rounds()},
    cpcent AS (
      SELECT doc_id AS center FROM documents
      WHERE doc_id IN (SELECT v FROM cpmis{_R})
         OR doc_id NOT IN (SELECT v FROM cpact0)
    ),
    cpsym AS (SELECT a, b FROM cpl UNION ALL SELECT b, a FROM cpl),
    cpmem AS (
      SELECT s.a AS doc_id, s.b AS center
      FROM cpsym s JOIN cpcent c ON c.center = s.b
      UNION
      SELECT center, center FROM cpcent
    )
    SELECT m.doc_id, m.center,
           CAST(CASE WHEN c.center IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_center
    FROM cpmem m LEFT JOIN cpcent c ON c.center = m.doc_id
    """,
)
def er_canopies(spark, sf_dir):
    """Canopy blocking with MIS-chosen centers over the shared-band
    cheap metric: tight-graph independence, loose membership, isolated
    docs as their own canopy (operators/canopy.py canopy_assign)."""
    return canopy.canopy_assign(load_table(spark, sf_dir, "documents"))
