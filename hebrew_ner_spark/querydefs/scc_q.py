"""Gates: strongly connected components + Broder bow-tie on the host graph.

Oracles replay the closed-form synthetic host graph from doc_id
arithmetic, compute EXACT pairwise reachability with a recursive CTE
(the host graph is vocabulary-sized — 16 vertices — so the closure is
trivial for DuckDB while the Spark side runs the real distributed
peeling algorithm), and derive SCC labels as min-mutual-reach. All
CTEs carry the scc_/bt_ prefixes (shared-fragment collision rule).
"""

from __future__ import annotations

from hebrew_ner_spark.operators import scc
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


_SCC_CTES = """
scc_k AS (SELECT doc_id AS d, doc_id % 12 AS k FROM documents),
scc_e0 AS (
  SELECT k AS s, (k - (k % 3)) + ((k % 3) + 1) % 3 AS t FROM scc_k
  UNION ALL SELECT k, k + 3 FROM scc_k WHERE d % 5 = 0 AND k < 9
  UNION ALL SELECT 12, k FROM scc_k WHERE d % 7 = 0
  UNION ALL SELECT k, 13 FROM scc_k WHERE d % 11 = 0
  UNION ALL SELECT 14, 15 FROM scc_k WHERE d % 13 = 0
  UNION ALL SELECT 15, 14 FROM scc_k WHERE d % 13 = 1
),
scc_edges AS (SELECT DISTINCT printf('ex%02d.example.net', s) AS src,
                              printf('ex%02d.example.net', t) AS dst
              FROM scc_e0 WHERE s <> t),
scc_nodes AS (SELECT src AS v FROM scc_edges UNION SELECT dst FROM scc_edges),
scc_reach(a, b) AS (
  SELECT src, dst FROM scc_edges
  UNION
  SELECT r.a, e.dst FROM scc_reach r JOIN scc_edges e ON r.b = e.src
),
scc_mut AS (
  SELECT r1.a AS u, r1.b AS w FROM scc_reach r1 JOIN scc_reach r2
    ON r1.a = r2.b AND r1.b = r2.a
  UNION SELECT v, v FROM scc_nodes
),
scc_lab AS (SELECT u AS host, min(w) AS scc_id FROM scc_mut GROUP BY u)
"""


@query(
    "web_host_scc",
    oracle=f"""
    WITH RECURSIVE {_SCC_CTES}
    SELECT host, scc_id,
           CAST(count(*) OVER (PARTITION BY scc_id) AS BIGINT) AS scc_size
    FROM scc_lab
    """,
)
def web_host_scc(spark, sf_dir):
    """Distributed SCC (coloring + backward-mark peeling, pointer-jumped
    forward fixpoint) on the planted host graph — exact partition vs the
    recursive mutual-reachability closure."""
    return scc.scc_components(scc.synth_host_edges(_docs(spark, sf_dir)))


@query(
    "web_bowtie",
    oracle=f"""
    WITH RECURSIVE {_SCC_CTES},
    bt_sizes AS (SELECT scc_id, count(*) AS n FROM scc_lab GROUP BY scc_id),
    bt_core AS (SELECT scc_id FROM bt_sizes ORDER BY n DESC, scc_id LIMIT 1),
    bt_corev AS (SELECT host AS v FROM scc_lab
                 WHERE scc_id = (SELECT scc_id FROM bt_core)),
    bt_fwd(v) AS (
      SELECT v FROM bt_corev
      UNION SELECT e.dst FROM bt_fwd f JOIN scc_edges e ON e.src = f.v
    ),
    bt_bwd(v) AS (
      SELECT v FROM bt_corev
      UNION SELECT e.src FROM bt_bwd b JOIN scc_edges e ON e.dst = b.v
    )
    SELECT l.host, l.scc_id,
           CASE WHEN l.scc_id = (SELECT scc_id FROM bt_core) THEN 'CORE'
                WHEN l.host IN (SELECT v FROM bt_bwd) THEN 'IN'
                WHEN l.host IN (SELECT v FROM bt_fwd) THEN 'OUT'
                ELSE 'OTHER' END AS part
    FROM scc_lab l
    """,
)
def web_bowtie(spark, sf_dir):
    """Broder bow-tie decomposition: CORE = largest SCC (min-id tie
    break), IN/OUT via frontier closures seeded at the core, the
    tendril/tube/disconnected remainder as OTHER."""
    return scc.bowtie_parts(scc.synth_host_edges(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------------
# HyperBall: per-node ball estimates + the neighborhood function
# ---------------------------------------------------------------------------

from hebrew_ner_spark.operators import hyperball  # noqa: E402
from hebrew_ner_spark.operators.sketches import (  # noqa: E402
    ALPHA_1E6,
    HLL_M,
    HLL_SEED,
    LC_LUT_DUCK,
    LC_THRESHOLD,
)

_P30 = 1 << 30
_P31 = 1 << 31
_P47 = 1 << 47
_R = hyperball.HYPERBALL_RADIUS

# true balls via a depth-bounded recursive walk (min over arrival depths
# = distance), then the SAME exact-integer HLL registers + estimator the
# Spark side folds edge-wise — two opposite constructions, one hash.
_HB_CTES = f"""
hb_reach(a, b, t) AS (
  SELECT v, v, 0 FROM scc_nodes
  UNION
  SELECT r.a, e.dst, r.t + 1 FROM hb_reach r
  JOIN scc_edges e ON e.src = r.b WHERE r.t < {_R}
),
hb_d AS (SELECT a, b, min(t) AS d FROM hb_reach GROUP BY a, b),
hb_ball AS (
  SELECT d.a AS host, tt.t, d.b AS w
  FROM hb_d d JOIN (SELECT unnest(range({_R} + 1)) AS t) tt ON d.d <= tt.t
),
hb_rows AS (
  SELECT host, t, h >> 52 AS reg_idx,
         CAST(CASE WHEN h % {_P30} = 0 THEN 31
                   ELSE 31 - length(bin(h % {_P30})) END AS BIGINT) AS rho
  FROM (SELECT host, t,
               CAST(concat('0x', substr(md5(w || ':{HLL_SEED}'), 1, 15))
                    AS BIGINT) AS h
        FROM hb_ball)
),
hb_regs AS (SELECT host, t, reg_idx, max(rho) AS reg_max
            FROM hb_rows GROUP BY host, t, reg_idx),
hb_est AS (
  SELECT host, t,
         CAST(CASE WHEN v_zero > 0
                    AND ({ALPHA_1E6} * ({_P47} // s)) // 1000000 <= {LC_THRESHOLD}
                   THEN ({LC_LUT_DUCK})[CAST(v_zero AS INT)]
                   ELSE ({ALPHA_1E6} * ({_P47} // s)) // 1000000
              END AS BIGINT) AS est_ball,
         v_zero
  FROM (SELECT host, t,
               CAST({HLL_M} - count(*) AS BIGINT) AS v_zero,
               CAST(sum(CAST(1 AS BIGINT) << CAST(31 - reg_max AS INT))
                    + ({HLL_M} - count(*)) * CAST({_P31} AS BIGINT)
                    AS BIGINT) AS s
        FROM hb_regs GROUP BY host, t)
)
"""


@query(
    "web_hyperball",
    oracle=f"""
    WITH RECURSIVE {_SCC_CTES},
    {_HB_CTES}
    SELECT host, CAST(t AS BIGINT) AS t, est_ball, v_zero FROM hb_est
    """,
)
def web_hyperball(spark, sf_dir):
    """HyperBall (Boldi-Vigna) out-ball HLL estimates per host per
    radius 0..3, folded edge-wise — vs true recursive-CTE balls pushed
    through the identical integer registers + estimator."""
    return hyperball.hyperball_estimates(scc.synth_host_edges(_docs(spark, sf_dir)))


@query(
    "web_neighborhood_fn",
    oracle=f"""
    WITH RECURSIVE {_SCC_CTES},
    {_HB_CTES},
    hb_nf AS (SELECT CAST(t AS BIGINT) AS t, CAST(sum(est_ball) AS BIGINT) AS nf
              FROM hb_est GROUP BY t)
    SELECT t, nf,
           CAST(CASE WHEN nf * 10 >=
                  9 * (SELECT nf FROM hb_nf WHERE t = {_R}) THEN 1 ELSE 0
           END AS BIGINT) AS ge90
    FROM hb_nf
    """,
)
def web_neighborhood_fn(spark, sf_dir):
    """Neighborhood function nf(t) = sum of ball estimates, with the
    exact-integer 90%-of-horizon effective-diameter indicator."""
    return hyperball.neighborhood_function(scc.synth_host_edges(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------------
# Luby MIS: parallel local-minima rounds vs SEQUENTIAL greedy oracle
# ---------------------------------------------------------------------------

from hebrew_ner_spark.functions.hashing import phash_duck  # noqa: E402

_MIS_P = phash_duck("host", scc.MIS_SEED)

# the parallel rounds provably compute the greedy-by-(priority, host)
# MIS, so the oracle runs the OPPOSITE construction: a one-node-per-step
# sequential greedy along the priority order, carrying the accepted set
# as a list through a recursive CTE (vocabulary-grain — 16 hosts).
_MIS_CTES = f"""
mis_sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM scc_edges WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM scc_edges WHERE src <> dst
  )
),
mis_ord AS (
  -- explicit DISTINCT: under WITH RECURSIVE this DuckDB version drops
  -- the dedup of a plain top-level UNION in non-recursive CTEs, so
  -- scc_nodes can carry duplicate vertices
  SELECT host, p, row_number() OVER (ORDER BY p, host) AS rn
  FROM (SELECT DISTINCT v AS host, {_MIS_P} AS p FROM scc_nodes)
),
mis_greedy(rn, mis) AS (
  SELECT 0, CAST([] AS VARCHAR[])
  UNION ALL
  SELECT g.rn + 1,
         CASE WHEN NOT EXISTS (
                SELECT 1 FROM mis_sym e
                WHERE e.src = (SELECT host FROM mis_ord WHERE rn = g.rn + 1)
                  AND list_contains(g.mis, e.dst))
              THEN list_append(
                g.mis, (SELECT host FROM mis_ord WHERE rn = g.rn + 1))
              ELSE g.mis END
  FROM mis_greedy g WHERE g.rn < (SELECT max(rn) FROM mis_ord)
),
mis_final AS (SELECT mis FROM mis_greedy ORDER BY rn DESC LIMIT 1)
"""


@query(
    "web_host_mis",
    oracle=f"""
    WITH RECURSIVE {_SCC_CTES},
    {_MIS_CTES}
    SELECT o.host, o.p AS priority,
           CAST(CASE WHEN list_contains((SELECT mis FROM mis_final), o.host)
                THEN 1 ELSE 0 END AS BIGINT) AS in_mis
    FROM mis_ord o
    """,
)
def web_host_mis(spark, sf_dir):
    """Luby-style MIS with deterministic hash priorities (conflict-free
    crawl batches): parallel local-minima rounds on Spark vs the
    sequential greedy the rounds provably equal, replayed in DuckDB."""
    return scc.host_mis(scc.synth_host_edges(_docs(spark, sf_dir)))


@query(
    "web_harmonic_centrality",
    oracle=f"""
    WITH RECURSIVE {_SCC_CTES},
    {_HB_CTES},
    hb_h AS (
      SELECT host, t, est_ball,
             lag(est_ball) OVER (PARTITION BY host ORDER BY t) AS prev
      FROM hb_est
    )
    SELECT host,
           CAST(sum((2 * greatest(est_ball - prev, 0) * 1000000 + t)
                    // (2 * t)) AS BIGINT) AS harmonic_1e6
    FROM hb_h WHERE t >= 1 GROUP BY host
    """,
)
def web_harmonic_centrality(spark, sf_dir):
    """HyperBall harmonic centrality per host: per-distance shell
    deltas of the ball estimates priced at 1/t, half-up micro-units,
    shells clamped at 0 against LUT-switchover dips
    (operators/hyperball.py harmonic_centrality)."""
    return hyperball.harmonic_centrality(
        scc.synth_host_edges(_docs(spark, sf_dir))
    )
