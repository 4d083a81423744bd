"""Gates for SimRank node similarity (operators/simrank.py).

The oracle unrolls the identical exact-integer rounds (the fusion /
Lloyd / k-truss discipline: iteration count imported from the operator,
so retuning cannot desync plan and oracle); pytest pins the closed
forms independently. CTE names sr-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import simrank
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

SR_CAP_TEST = 3  # planted: the 28 in-degree-4 nodes overflow

M = simrank.SR_MOD
_N = simrank.SR_C_NUM
_D = simrank.SR_C_DEN
U = simrank.SR_UNIT

# the deterministic test graph, closed-form from doc_id
_SRE = f"""
sre AS (
  SELECT DISTINCT
         'n' || CAST((5 * (doc_id % {M})) % 61 AS VARCHAR) AS src,
         'n' || CAST(((doc_id % {M}) * (doc_id % {M}) + 3 * (doc_id % {M}) + 1)
                     % 64 AS VARCHAR) AS dst
  FROM documents
  WHERE (5 * (doc_id % {M})) % 61
        <> ((doc_id % {M}) * (doc_id % {M}) + 3 * (doc_id % {M}) + 1) % 64
)
"""

_SRI = f"""
srp AS (SELECT DISTINCT dst AS node, src AS parent FROM sre),
srdg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM srp GROUP BY node),
sri AS (SELECT srp.node, srp.parent, deg FROM srp
        JOIN srdg ON srp.node = srdg.node
        WHERE deg <= {simrank.SR_MAX_DEG}),
srn AS (SELECT node FROM sri UNION SELECT parent FROM sri)
"""


def _round_ctes(k: int) -> str:
    """Round k: orientation closure of s_{k-1} (diagonal + both
    orientations) -> two in-edge joins -> per-pair decay/normalize."""
    prev = (
        f"SELECT node AS i, node AS j, CAST({U} AS BIGINT) AS s FROM srn"
        if k == 1
        else f"""
        SELECT node AS i, node AS j, CAST({U} AS BIGINT) AS s FROM srn
        UNION ALL SELECT node_a, node_b, s_1e6 FROM srs{k - 1}
        UNION ALL SELECT node_b, node_a, s_1e6 FROM srs{k - 1}
        """
    )
    return f"""
srx{k} AS ({prev}),
src{k} AS (
  SELECT ia.node AS a, jb.node AS b, ia.deg AS da, jb.deg AS db,
         CAST(sum(t.s) AS BIGINT) AS tot
  FROM srx{k} t
  JOIN sri ia ON ia.parent = t.i
  JOIN sri jb ON jb.parent = t.j
  WHERE ia.node < jb.node
  GROUP BY ia.node, jb.node, ia.deg, jb.deg
),
srs{k} AS (
  SELECT a AS node_a, b AS node_b,
         ({_N} * tot) // ({_D} * da * db) AS s_1e6
  FROM src{k}
  WHERE ({_N} * tot) // ({_D} * da * db) > 0
)"""


_ROUNDS = ",".join(_round_ctes(k) for k in range(1, simrank.SR_ITERS + 1))


def _edges(spark, sf_dir):
    return simrank.synth_sr_edges(load_table(spark, sf_dir, "documents"))


@query(
    "kg_simrank",
    oracle=f"""
    WITH {_SRE}, {_SRI}, {_ROUNDS}
    SELECT node_a, node_b, s_1e6 FROM srs{simrank.SR_ITERS}
    """,
)
def kg_simrank(spark, sf_dir):
    """SimRank after the unrolled rounds: sparse nonzero pairs with
    exact micro-unit scores — the entity-dedup candidate signal."""
    return simrank.simrank_scores(_edges(spark, sf_dir))


@query(
    "kg_simrank_overflow",
    oracle=f"""
    WITH {_SRE},
    sro AS (SELECT DISTINCT dst AS node, src AS parent FROM sre)
    SELECT node, CAST(count(*) AS BIGINT) AS in_deg
    FROM sro GROUP BY node HAVING count(*) > {SR_CAP_TEST}
    """,
)
def kg_simrank_overflow(spark, sf_dir):
    """The hub-exclusion report at a planted low cap (the graph's
    in-degree-4 nodes overflow it) — non-silent by construction."""
    return simrank.simrank_overflow(_edges(spark, sf_dir), max_deg=SR_CAP_TEST)
