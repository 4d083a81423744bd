"""Gate: regular path query  scan . (join|merge)* . agg  over the
extracted KG — automaton-product reachability vs a recursive-closure
oracle over the same product graph (set semantics; the recursive
UNION's row dedup is exactly the visited-set absorption). CTE names
rq-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import linking, rpq
from hebrew_ner_spark.querydefs.graph_q import _dim_values, _docs, _edges_ctes
from hebrew_ner_spark.registry import query

_TRANS_VALUES = ", ".join(
    f"({a}, '{p}', {b})" for a, p, b in rpq.RPQ_TRANSITIONS
)


@query(
    "kg_rpq_reach",
    oracle=f"""
    WITH RECURSIVE {_dim_values()},
    {_edges_ctes()},
    rqe AS (SELECT DISTINCT subj_id, pred, obj_id FROM e),
    rqt(st_from, tpred, st_to) AS (VALUES {_TRANS_VALUES}),
    rqr(src, v, st) AS (
      SELECT DISTINCT subj_id, subj_id, 0 FROM rqe
      UNION
      SELECT r.src, x.obj_id, t.st_to
      FROM rqr r
      JOIN rqe x ON x.subj_id = r.v
      JOIN rqt t ON t.st_from = r.st AND t.tpred = x.pred
    )
    SELECT DISTINCT src, v AS dst FROM rqr WHERE st = {rpq.RPQ_ACCEPT}
    """,
)
def kg_rpq_reach(spark, sf_dir):
    """SPARQL-style property path scan.(join|merge)*.agg: entity pairs
    accepted by the compiled NFA under set semantics
    (operators/rpq.py rpq_reach)."""
    return rpq.rpq_reach(linking.kg_edges(_docs(spark, sf_dir)))
