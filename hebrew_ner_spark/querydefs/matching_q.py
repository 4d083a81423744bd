"""Gate: synchronous Gale-Shapley stable matching over hash-derived
two-sided preferences (16x16). The oracle replays preference
construction (portable hash + row_number) and all 24 proposal rounds
as unrolled CTEs, so the hash certifies the entire deferred-acceptance
schedule; stability (zero blocking pairs) is asserted separately in
pytest against the classic sequential algorithm."""

from __future__ import annotations

from hebrew_ner_spark.functions.hashing import phash_duck
from hebrew_ner_spark.operators import matching
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table  # noqa: F401

_N = matching.GS_N
_R = matching.GS_ROUNDS
_KEY = "CAST(p AS VARCHAR) || '|' || CAST(a AS VARCHAR)"
_HP = phash_duck(_KEY, matching.GS_SEED_P)
_HA = phash_duck(_KEY, matching.GS_SEED_A)

_PREF_CTE = f"""
gsg AS (
  SELECT CAST(pp.x AS BIGINT) AS p, CAST(aa.x AS BIGINT) AS a
  FROM (SELECT unnest(range({_N})) AS x) pp,
       (SELECT unnest(range({_N})) AS x) aa
),
gspp AS (
  SELECT p, a,
         CAST(row_number() OVER (PARTITION BY p ORDER BY {_HP}, a) - 1
              AS BIGINT) AS idx
  FROM gsg
),
gsar AS (
  SELECT a, p,
         CAST(row_number() OVER (PARTITION BY a ORDER BY {_HA}, p)
              AS BIGINT) AS rk
  FROM gsg
)
"""


def _round_ctes() -> str:
    parts = [
        f"""gsptr0 AS MATERIALIZED (
  SELECT CAST(unnest(range({_N})) AS BIGINT) AS p, CAST(0 AS BIGINT) AS ptr
),
gsm0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS p WHERE FALSE
)"""
    ]
    for k in range(1, _R + 1):
        parts.append(
            f"""gsfr{k} AS MATERIALIZED (
  SELECT t.p, t.ptr FROM gsptr{k - 1} t
  WHERE t.ptr < {_N} AND t.p NOT IN (SELECT p FROM gsm{k - 1})
),
gspr{k} AS MATERIALIZED (
  SELECT pp.a, f.p FROM gsfr{k} f
  JOIN gspp pp ON pp.p = f.p AND pp.idx = f.ptr
),
gscd{k} AS MATERIALIZED (
  SELECT DISTINCT a, p FROM (
    SELECT a, p FROM gspr{k}
    UNION ALL
    SELECT m.a, m.p FROM gsm{k - 1} m
    WHERE m.a IN (SELECT a FROM gspr{k})
  )
),
gsrk{k} AS MATERIALIZED (
  SELECT c.a, c.p, r.rk,
         row_number() OVER (PARTITION BY c.a ORDER BY r.rk, c.p) AS rn
  FROM gscd{k} c JOIN gsar r ON r.a = c.a AND r.p = c.p
),
gsptr{k} AS MATERIALIZED (
  SELECT t.p,
         CAST(t.ptr + CASE WHEN t.p IN
              (SELECT p FROM gsrk{k} WHERE rn > 1) THEN 1 ELSE 0 END
              AS BIGINT) AS ptr
  FROM gsptr{k - 1} t
),
gsm{k} AS MATERIALIZED (
  SELECT a, p FROM gsm{k - 1}
  WHERE a NOT IN (SELECT a FROM gsrk{k} WHERE rn = 1)
  UNION ALL
  SELECT a, p FROM gsrk{k} WHERE rn = 1
)"""
        )
    return ",\n".join(parts)


@query(
    "web_stable_matching",
    oracle=f"""
    WITH {_PREF_CTE},
    {_round_ctes()}
    SELECT m.a AS acceptor, m.p AS proposer,
           r.rk AS a_rank, pp.idx AS p_idx
    FROM gsm{_R} m
    JOIN gsar r ON r.a = m.a AND r.p = m.p
    JOIN gspp pp ON pp.p = m.p AND pp.a = m.a
    """,
)
def web_stable_matching(spark, sf_dir):
    """Proposer-optimal stable matching by synchronous deferred
    acceptance over hash-derived preferences, full round schedule
    replayed by the oracle (operators/matching.py stable_matching)."""
    return matching.stable_matching(spark)
