"""Gate: integer push-PPR with residual certificate over the host
graph, seeded at host 0. The oracle unrolls the synchronous push
rounds as materialized CTEs with the identical truncating-division
cascade (gain/stay/share/leftover) — mass is conserved exactly, so
the hash certifies every intermediate division, not just the ranks."""

from __future__ import annotations

from hebrew_ner_spark.operators import pprpush, weblinks
from hebrew_ner_spark.querydefs.centrality_q import _GRAPH_CTE
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_S = pprpush.PPR_SCALE
_E = pprpush.PPR_EPS
_R = pprpush.PPR_ROUNDS
_SEED = 0


def _push_ctes() -> str:
    parts = [
        f"""ppdeg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
           FROM ctsym GROUP BY src),
pp0 AS MATERIALIZED (
  SELECT v, deg, CAST(0 AS BIGINT) AS pi,
         CAST(CASE WHEN v = {_SEED} THEN {_S} ELSE 0 END AS BIGINT) AS r
  FROM ppdeg
)"""
    ]
    for k in range(1, _R + 1):
        parts.append(
            f"""ppx{k} AS MATERIALIZED (
  SELECT v, deg, pi, r, (r > {_E} * deg) AS is_push,
         CASE WHEN r > {_E} * deg THEN r // 4 ELSE 0 END AS gain
  FROM pp{k - 1}
),
ppy{k} AS MATERIALIZED (
  SELECT v, deg, pi, r, is_push, gain,
         CASE WHEN is_push THEN (r - gain) // 2 ELSE 0 END AS stay
  FROM ppx{k}
),
ppz{k} AS MATERIALIZED (
  SELECT v, deg, pi, r, is_push, gain, stay,
         CASE WHEN is_push THEN (r - gain - stay) // deg ELSE 0 END AS share
  FROM ppy{k}
),
ppi{k} AS MATERIALIZED (
  SELECT e.dst AS v, CAST(sum(p.share) AS BIGINT) AS inc
  FROM ctsym e JOIN ppz{k} p ON p.v = e.src AND p.is_push
  GROUP BY e.dst
),
pp{k} AS MATERIALIZED (
  SELECT z.v, z.deg, CAST(z.pi + z.gain AS BIGINT) AS pi,
         CAST(CASE WHEN z.is_push
              THEN z.stay + (z.r - z.gain - z.stay - z.share * z.deg)
              ELSE z.r END + coalesce(i.inc, 0) AS BIGINT) AS r
  FROM ppz{k} z LEFT JOIN ppi{k} i ON i.v = z.v
)"""
        )
    return ",\n".join(parts)


@query(
    "kg_ppr_push",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_push_ctes()}
    SELECT v AS vertex, pi AS ppr_scaled, r AS residual
    FROM pp{_R}
    """,
)
def kg_ppr_push(spark, sf_dir):
    """Local-computation PPR: synchronous integer push rounds with the
    ACL residual certificate in the output — the per-entity twin of
    the global power-iteration PPR (operators/pprpush.py ppr_push)."""
    docs = load_table(spark, sf_dir, "documents")
    return pprpush.ppr_push(weblinks.synth_farm_host_edges(docs), seed=0)


@query(
    "kg_ppr_sweepcut",
    oracle=f"""
    WITH {_GRAPH_CTE},
    {_push_ctes()},
    swm2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM ctsym),
    swrank AS (
      SELECT v, deg,
             CAST(row_number() OVER (ORDER BY (pi * {pprpush.SWEEP_SCALE} // deg)
                                     DESC, v ASC) AS BIGINT) AS rk
      FROM pp{_R} WHERE pi > 0
    ),
    swe AS (
      SELECT ra.rk AS rka, rb.rk AS rkb
      FROM ctund e
      LEFT JOIN swrank ra ON ra.v = e.a
      LEFT JOIN swrank rb ON rb.v = e.b
    ),
    swen AS (
      SELECT CASE WHEN rka IS NOT NULL AND rkb IS NOT NULL
                  THEN least(rka, rkb) ELSE coalesce(rka, rkb) END AS rk,
             CAST(count(*) AS BIGINT) AS n_enter
      FROM swe WHERE rka IS NOT NULL OR rkb IS NOT NULL GROUP BY 1
    ),
    swcl AS (
      SELECT greatest(rka, rkb) AS rk, CAST(count(*) AS BIGINT) AS n_close
      FROM swe WHERE rka IS NOT NULL AND rkb IS NOT NULL GROUP BY 1
    ),
    swcum AS (
      SELECT r.rk, r.v,
             CAST(sum(r.deg) OVER (ORDER BY r.rk ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS vol,
             CAST(sum(coalesce(en.n_enter, 0)) OVER (ORDER BY r.rk
                    ROWS UNBOUNDED PRECEDING)
                  - sum(coalesce(cl.n_close, 0)) OVER (ORDER BY r.rk
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cut
      FROM swrank r
      LEFT JOIN swen en ON en.rk = r.rk
      LEFT JOIN swcl cl ON cl.rk = r.rk
    ),
    swphi AS (
      SELECT rk, v, cut, vol,
             CAST(cut * {pprpush.SWEEP_SCALE} // least(vol, m.m2 - vol)
                  AS BIGINT) AS phi_1e6
      FROM swcum CROSS JOIN swm2 m
      WHERE least(vol, m.m2 - vol) > 0
    )
    SELECT rk, v, cut, vol, phi_1e6,
           CAST(CASE WHEN row_number() OVER (ORDER BY phi_1e6 ASC, rk ASC) = 1
                     THEN 1 ELSE 0 END AS BIGINT) AS is_best
    FROM swphi
    """,
)
def kg_ppr_sweepcut(spark, sf_dir):
    """ACL sweep cut over the pushed PPR vector: per-prefix conductance
    via rank-histogram cumsums (no per-prefix pass), minimum-phi prefix
    flagged — the local cluster of Andersen-Chung-Lang
    (operators/pprpush.py ppr_sweep_cut)."""
    docs = load_table(spark, sf_dir, "documents")
    return pprpush.ppr_sweep_cut(weblinks.synth_farm_host_edges(docs), seed=0)
