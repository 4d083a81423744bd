"""Gates: dependency-pattern triples, typed edges, lift, triangles.

Oracles mirror the Spark semantics in window-function SQL (lag/lead for the
pattern context, self-joins for pairs/triangles). Integer-only arithmetic
throughout — the lift oracle uses the same (2*num + den) // (2*den)
round-half-up identity as the Spark plan (DuckDB ``//`` == Spark ``DIV``,
the carried r1 parity rule), with HUGEINT intermediates cast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hebrew_ner_spark.operators import graphstats, kg
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ADJECTIVE_TERMS, ENTITY_TERMS, PREDICATE_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_ENTS_SQL = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"
_PREDS_SQL = "(" + ", ".join(f"'{t}'" for t in PREDICATE_TERMS) + ")"
_ADJS_SQL = "(" + ", ".join(f"'{t}'" for t in ADJECTIVE_TERMS) + ")"

_TOKS_CTE = """
toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
         unnest(string_split(text, ' ')) AS token
  FROM documents
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# Context window: tokens at offsets -2..+2 around each index. NULL-safe:
# every NOT-IN test is guarded by IS NOT NULL so a document boundary never
# yields a NULL predicate (which DuckDB would treat as no-match, matching
# the Spark i-bounds guards only by accident).
#
# ``deppat_sql`` parametrizes the whole chain over the token-source CTE
# (and a CTE-name prefix, house namespace rule) so coref_q can replay the
# identical cascade over sieve-resolved tokens.


def deppat_sql(src: str = "toks", p: str = "") -> str:
    return f"""
    {p}w AS (
      SELECT doc_id, word_index, token,
             lag(token, 1)  OVER {p}win AS pm1,
             lag(token, 2)  OVER {p}win AS pm2,
             lead(token, 1) OVER {p}win AS pp1,
             lead(token, 2) OVER {p}win AS pp2
      FROM {src}
      WINDOW {p}win AS (PARTITION BY doc_id ORDER BY word_index)
    ),
    {p}m AS (
      SELECT doc_id, word_index, token, pm1, pm2, pp1, pp2,
             CASE
               WHEN token IN {_PREDS_SQL} AND pm1 IN {_ENTS_SQL} AND pp1 IN {_ENTS_SQL}
                 THEN 'svo'
               WHEN token IN {_PREDS_SQL}
                    AND pm1 IS NOT NULL AND pm1 NOT IN {_ENTS_SQL} AND pm1 NOT IN {_PREDS_SQL}
                    AND pm2 IN {_ENTS_SQL} AND pp1 IN {_ENTS_SQL}
                 THEN 'svo_gap_subj'
               WHEN token IN {_PREDS_SQL} AND pm1 IN {_ENTS_SQL}
                    AND pp1 IS NOT NULL AND pp1 NOT IN {_ENTS_SQL} AND pp1 NOT IN {_PREDS_SQL}
                    AND pp2 IN {_ENTS_SQL}
                 THEN 'svo_gap_obj'
               WHEN token IN {_ENTS_SQL} AND pp1 IN {_ENTS_SQL}
                 THEN 'appos'
               WHEN token IN {_ADJS_SQL} AND pp1 IN {_ENTS_SQL}
                 THEN 'has_attr'
             END AS pattern
      FROM {p}w
    )
    SELECT doc_id, word_index, pattern,
           CASE pattern WHEN 'svo' THEN pm1 WHEN 'svo_gap_subj' THEN pm2
                        WHEN 'svo_gap_obj' THEN pm1 WHEN 'appos' THEN token
                        ELSE pp1 END AS subj,
           CASE WHEN pattern LIKE 'svo%' THEN token
                WHEN pattern = 'appos' THEN 'appos'
                ELSE 'has_attr' END AS pred,
           CASE pattern WHEN 'svo_gap_obj' THEN pp2
                        WHEN 'has_attr' THEN token
                        ELSE pp1 END AS obj
    FROM {p}m WHERE pattern IS NOT NULL
"""


_DEPPAT_ORACLE = f"""
    WITH {_TOKS_CTE},
    {deppat_sql()}
"""


@query("kg_triples_deppat", oracle=_DEPPAT_ORACLE)
def kg_triples_deppat(spark, sf_dir):
    """Five dependency patterns, one codegen'd transform, zero shuffles."""
    return kg.doc_triples_patterns(_docs(spark, sf_dir))


_TYPED_COUNTS_ORACLE = f"""
    WITH t AS ({_DEPPAT_ORACLE})
    SELECT pattern, subj, pred, obj, count(*) AS n_evidence
    FROM t GROUP BY 1, 2, 3, 4
"""


@query("kg_edges_typed", oracle=_TYPED_COUNTS_ORACLE)
def kg_edges_typed(spark, sf_dir):
    return kg.typed_edge_counts(_docs(spark, sf_dir))


@query("kg_edges_typed_salted", oracle=_TYPED_COUNTS_ORACLE)
def kg_edges_typed_salted(spark, sf_dir):
    """The same aggregate through the two-phase salted plan."""
    return kg.typed_edge_counts(_docs(spark, sf_dir), salt_buckets=8)


def _noisy_or_oracle() -> str:
    from hebrew_ner_spark.operators.kg import EXTRACTOR_PRIOR_1E6

    flags = ",\n             ".join(
        f"MAX(CASE WHEN pattern = '{k}' THEN 1 ELSE 0 END) AS f_{k}"
        for k in EXTRACTOR_PRIOR_1E6
    )
    acc = None
    for k, prior in EXTRACTOR_PRIOR_1E6.items():
        miss = (
            f"CAST(CASE WHEN f_{k} = 1 THEN {1_000_000 - prior}"
            " ELSE 1000000 END AS BIGINT)"
        )
        acc = miss if acc is None else f"(({acc}) * ({miss})) // 1000000"
    n_pat = " + ".join(f"f_{k}" for k in EXTRACTOR_PRIOR_1E6)
    return f"""
    WITH nor_t AS ({_DEPPAT_ORACLE}),
    nor_f AS (
      SELECT subj, pred, obj,
             {flags}
      FROM nor_t GROUP BY 1, 2, 3
    )
    SELECT subj, pred, obj,
           CAST({n_pat} AS BIGINT) AS n_patterns,
           CAST(1000000 - ({acc}) AS BIGINT) AS conf_1e6
    FROM nor_f
    """


@query("kg_extractor_noisy_or", oracle=_noisy_or_oracle())
def kg_extractor_noisy_or(spark, sf_dir):
    """Knowledge-Vault noisy-OR fusion of the five pattern extractors:
    fixed-point 1 - prod(1 - p_i) over firing patterns per triple."""
    return kg.extractor_noisy_or(_docs(spark, sf_dir))


@query(
    "kg_cooc_lift",
    oracle=f"""
    WITH {_TOKS_CTE},
    de AS (SELECT DISTINCT doc_id, token FROM toks WHERE token IN {_ENTS_SQL}),
    n AS (SELECT count(*) AS n_docs FROM documents),
    df AS (SELECT token, count(*) AS c FROM de GROUP BY 1),
    p AS (SELECT x.token AS ea, y.token AS eb, count(*) AS c_ab
          FROM de x JOIN de y ON x.doc_id = y.doc_id AND x.token < y.token
          GROUP BY 1, 2)
    SELECT p.ea, p.eb, p.c_ab,
           CAST((2000000 * CAST((SELECT n_docs FROM n) AS HUGEINT) * p.c_ab
                 + CAST(da.c AS HUGEINT) * db.c)
                // (2 * CAST(da.c AS HUGEINT) * db.c) AS BIGINT) AS lift_1e6
    FROM p
    JOIN df da ON p.ea = da.token
    JOIN df db ON p.eb = db.token
    """,
)
def kg_cooc_lift(spark, sf_dir):
    """Exact-integer association strength for KG edge weighting."""
    return graphstats.cooc_lift(_docs(spark, sf_dir))



# Shared oracle fragment: documents -> tokens -> SVO pairs -> weighted
# undirected edges (the same edge set every graph-analytics gate consumes).
_EDGES_CTE = f"""
    toks AS (
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
      SELECT subj, obj FROM w
      WHERE token IN {_PREDS_SQL} AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
            AND subj <> obj
    ),
    ew AS (SELECT least(subj, obj) AS a, greatest(subj, obj) AS b, count(*) AS n
           FROM t GROUP BY 1, 2)
"""

# Above-mean sparsified edges (operators/graphstats.above_mean_edges).
_SPARSE_EW = """
    tot AS (SELECT count(*) AS n_edges, sum(n) AS total_n FROM ew),
    ews AS (SELECT a, b, n FROM ew, tot WHERE n * n_edges > total_n)
"""


@query(
    "kg_triangles",
    oracle=f"""
    WITH {_EDGES_CTE},
    {_SPARSE_EW},
    e AS (SELECT a, b FROM ews)
    SELECT e1.a AS ea, e1.b AS eb, e2.b AS ec
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def kg_triangles(spark, sf_dir):
    """Node-iterator++ triangles (above-mean-weight edges) vs the naive
    3-way-join oracle."""
    return graphstats.triangles(_docs(spark, sf_dir))


@query(
    "kg_link_pred",
    oracle=f"""
    WITH {_EDGES_CTE},
    {_SPARSE_EW},
    e AS (SELECT a, b FROM ews),
    sym AS (SELECT a AS z, b AS x FROM e UNION ALL SELECT b AS z, a AS x FROM e),
    deg AS (SELECT z, count(*) AS d FROM sym GROUP BY 1),
    wed AS (SELECT s1.x AS a, s2.x AS b, s1.z
            FROM sym s1 JOIN sym s2 ON s1.z = s2.z AND s1.x < s2.x),
    cand AS (SELECT w.a, w.b, w.z FROM wed w
             LEFT JOIN e ON e.a = w.a AND e.b = w.b
             WHERE e.a IS NULL)
    SELECT c.a, c.b, count(*) AS n_common,
           CAST(SUM(1000000 // d) AS BIGINT) AS ra_1e6
    FROM cand c JOIN deg ON deg.z = c.z
    GROUP BY 1, 2
    """,
)
def kg_link_pred(spark, sf_dir):
    """Resource-allocation link prediction (non-adjacent pairs, exact
    integer 1e6 DIV deg evidence) vs the naive self-join oracle."""
    return graphstats.link_pred_ra(_docs(spark, sf_dir))


@query(
    "kg_paths_2hop",
    oracle=f"""
    WITH {_EDGES_CTE},
    e AS (SELECT DISTINCT subj, obj FROM t)
    SELECT e1.subj AS a, e2.obj AS c, count(DISTINCT e1.obj) AS n_mids
    FROM e e1 JOIN e e2 ON e1.obj = e2.subj
    WHERE e1.subj <> e2.obj
    GROUP BY 1, 2
    """,
)
def kg_paths_2hop(spark, sf_dir):
    """2-hop reachability counts — link-prediction features."""
    return graphstats.paths_2hop(_docs(spark, sf_dir))


# LPA oracle: unroll the exact synchronous rounds the Spark plan runs.
# Iteration count IMPORTED from the operator (never hardcoded — retuning
# LPA_ITERS cannot desync plan and oracle; same discipline as PageRank).
from hebrew_ner_spark.operators.graphstats import LPA_ITERS as _LPA_ITERS  # noqa: E402


def _lpa_ctes(iters: int) -> tuple[str, str]:
    """(WITH-body, final-label-CTE-name) — shared by the LPA gate and
    the modularity gate built on its partition."""
    rounds = []
    prev = "l0"
    for k in range(1, iters + 1):
        rounds.append(
            f"""
    l{k} AS (
      SELECT entity, community FROM (
        SELECT s.src AS entity, l.community, sum(s.n) AS w,
               row_number() OVER (PARTITION BY s.src
                                  ORDER BY sum(s.n) DESC, l.community ASC) AS rk
        FROM sym s JOIN {prev} l ON s.dst = l.entity
        GROUP BY s.src, l.community)
      WHERE rk = 1
    )"""
        )
        prev = f"l{k}"
    body = f"""{_EDGES_CTE},
    {_SPARSE_EW},
    sym AS (SELECT a AS src, b AS dst, n FROM ews
            UNION ALL SELECT b AS src, a AS dst, n FROM ews),
    l0 AS (SELECT DISTINCT src AS entity, src AS community FROM sym),
    {",".join(rounds)}"""
    return body, prev


def _lpa_oracle(iters: int) -> str:
    body, prev = _lpa_ctes(iters)
    return f"""
    WITH {body}
    SELECT entity, community FROM {prev}
    """


@query("kg_communities_lpa", oracle=_lpa_oracle(_LPA_ITERS))
def kg_communities_lpa(spark, sf_dir):
    """Weighted label propagation, fixed synchronous rounds, vs the
    unrolled-CTE oracle."""
    return graphstats.label_propagation(_docs(spark, sf_dir))


# k-core oracle: unroll exactly KCORE_ORACLE_ROUNDS peel rounds (imported,
# never hardcoded). Peeling is monotone, so rounds past the fixpoint are
# no-ops; the operator raises if convergence needs MORE rounds than the
# oracle runs, so the two sides cannot silently diverge.
from hebrew_ner_spark.operators.graphstats import (  # noqa: E402
    KCORE_K as _KCORE_K,
    KCORE_ORACLE_ROUNDS as _KCORE_ROUNDS,
)


def _kcore_oracle(k: int, rounds: int) -> str:
    # MATERIALIZED: each round references the previous one three times;
    # DuckDB inlines plain CTEs, which would expand 3^rounds copies of the
    # whole corpus scan (observed: fd exhaustion at 8 rounds).
    parts = ["s0 AS MATERIALIZED (SELECT a, b FROM sym)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    d{i} AS MATERIALIZED (SELECT a FROM s{i - 1} GROUP BY a HAVING count(*) < {k}),
    s{i} AS MATERIALIZED (
      SELECT s.a, s.b FROM s{i - 1} s
      WHERE NOT EXISTS (SELECT 1 FROM d{i} x WHERE x.a = s.a)
        AND NOT EXISTS (SELECT 1 FROM d{i} x WHERE x.a = s.b)
    ),
    p{i} AS MATERIALIZED (
      SELECT DISTINCT a AS entity, CAST({i - 1} AS BIGINT) AS peel_round
      FROM s{i - 1}
      WHERE a NOT IN (SELECT a FROM s{i})
    )"""
        )
    peel_union = " UNION ALL ".join(
        f"SELECT entity, peel_round FROM p{i}" for i in range(1, rounds + 1)
    )
    return f"""
    WITH {_EDGES_CTE},
    {_SPARSE_EW},
    sym AS (SELECT a, b FROM ews UNION ALL SELECT b, a FROM ews),
    {",".join(parts)},
    peeled AS ({peel_union}),
    nodes AS (SELECT DISTINCT a AS entity FROM s0)
    SELECT n.entity, coalesce(p.peel_round, -1) AS peel_round
    FROM nodes n LEFT JOIN peeled p ON p.entity = n.entity
    """


@query("kg_kcore", oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def kg_kcore(spark, sf_dir):
    """k-core peel trace (onion decomposition) of the above-mean entity
    graph: iterative peeling to fixpoint vs the same rounds unrolled as
    materialized CTEs. peel_round = -1 marks k-core survivors; the node-
    presence diff between consecutive edge sets defines the round (a
    node stranded edgeless by its neighbors' removal peels with them)."""
    return graphstats.kcore_peel(_docs(spark, sf_dir))


def _ktruss_oracle(k: int, rounds: int) -> str:
    # MATERIALIZED for the same reason as _kcore_oracle: each round
    # references the previous one several times. Support is a correlated
    # wedge count over the symmetrized survivor set.
    parts = ["ktt0 AS MATERIALIZED (SELECT a, b FROM ews)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"""
    kty{i} AS MATERIALIZED (
      SELECT a, b FROM ktt{i - 1} UNION ALL SELECT b, a FROM ktt{i - 1}
    ),
    ktt{i} AS MATERIALIZED (
      SELECT e.a, e.b FROM ktt{i - 1} e
      WHERE (SELECT count(*) FROM kty{i} x, kty{i} z
             WHERE x.a = e.a AND z.a = e.b AND z.b = x.b) >= {k - 2}
    ),
    ktq{i} AS MATERIALIZED (
      SELECT e.a, e.b, CAST({i - 1} AS BIGINT) AS peel_round
      FROM ktt{i - 1} e
      WHERE NOT EXISTS (SELECT 1 FROM ktt{i} u WHERE u.a = e.a AND u.b = e.b)
    )"""
        )
    peel_union = " UNION ALL ".join(
        f"SELECT a, b, peel_round FROM ktq{i}" for i in range(1, rounds + 1)
    )
    return f"""
    WITH {_EDGES_CTE},
    {_SPARSE_EW},
    {",".join(parts)},
    ktpeeled AS ({peel_union})
    SELECT e.a, e.b, coalesce(p.peel_round, -1) AS peel_round
    FROM ktt0 e LEFT JOIN ktpeeled p ON p.a = e.a AND p.b = e.b
    """


@query(
    "kg_ktruss",
    oracle=_ktruss_oracle(graphstats.KTRUSS_K, graphstats.KTRUSS_ORACLE_ROUNDS),
)
def kg_ktruss(spark, sf_dir):
    """k-truss peel trace (edge grain) of the above-mean entity graph:
    iterative triangle-support peeling to fixpoint vs the same rounds
    unrolled as materialized CTEs. peel_round = -1 marks truss edges —
    the high-confidence relational core (every edge corroborated by
    >= k-2 triangles of surviving facts)."""
    return graphstats.ktruss_peel(_docs(spark, sf_dir))


# Shared CTE chain for the link-prediction ranking eval: wedge scores for
# ALL pairs (positives keep their scores), positive labels from the edge
# list, two-way symmetrization, and the filtered per-source rank
# (rn - positives_above) under the pinned (ra DESC, n_common DESC, dst)
# tie order — bit-identical to the Spark window.
_LP_RANKS_CTES = f"""{_EDGES_CTE},
    {_SPARSE_EW},
    e AS (SELECT a, b FROM ews),
    sym AS (SELECT a AS z, b AS x FROM e UNION ALL SELECT b AS z, a AS x FROM e),
    deg AS (SELECT z, count(*) AS d FROM sym GROUP BY 1),
    wed AS (SELECT s1.x AS a, s2.x AS b, s1.z
            FROM sym s1 JOIN sym s2 ON s1.z = s2.z AND s1.x < s2.x),
    scored AS (SELECT w.a, w.b, CAST(count(*) AS BIGINT) AS n_common,
                      CAST(SUM(1000000 // d) AS BIGINT) AS ra_1e6
               FROM wed w JOIN deg ON deg.z = w.z GROUP BY 1, 2),
    lab AS (SELECT s.a, s.b, s.n_common, s.ra_1e6,
                   CASE WHEN e.a IS NULL THEN 0 ELSE 1 END AS is_pos
            FROM scored s LEFT JOIN e ON e.a = s.a AND e.b = s.b),
    dir AS (SELECT a AS src, b AS dst, n_common, ra_1e6, is_pos FROM lab
            UNION ALL
            SELECT b AS src, a AS dst, n_common, ra_1e6, is_pos FROM lab),
    rkd AS (SELECT src, dst, n_common, ra_1e6, is_pos,
                   row_number() OVER (PARTITION BY src
                     ORDER BY ra_1e6 DESC, n_common DESC, dst) AS rn,
                   coalesce(sum(is_pos) OVER (PARTITION BY src
                     ORDER BY ra_1e6 DESC, n_common DESC, dst
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS prev_pos
            FROM dir),
    lpr AS (SELECT src, dst, n_common, ra_1e6,
                   CAST(rn - prev_pos AS BIGINT) AS rank
            FROM rkd WHERE is_pos = 1)"""


@query(
    "kg_lp_ranks",
    oracle=f"""
    WITH {_LP_RANKS_CTES}
    SELECT src, dst, n_common, ra_1e6, rank FROM lpr
    """,
)
def kg_lp_ranks(spark, sf_dir):
    """Filtered per-source rank of every existing edge among its
    same-source RA candidates — the KG-completion ranking protocol."""
    return graphstats.link_pred_ranks(_docs(spark, sf_dir))


@query(
    "kg_lp_mrr",
    oracle=f"""
    WITH {_LP_RANKS_CTES}
    SELECT CAST(count(*) AS BIGINT) AS n_pos,
           CAST(CASE WHEN count(*) = 0 THEN 0 ELSE
             (2 * sum(1000000 // rank) + count(*)) // (2 * count(*)) END
             AS BIGINT) AS mrr_1e6,
           CAST(sum(CASE WHEN rank <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
           CAST(sum(CASE WHEN rank <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
           CAST(sum(CASE WHEN rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits10
    FROM lpr
    """,
)
def kg_lp_mrr(spark, sf_dir):
    """Exact-integer MRR / hits@k over the filtered link-prediction
    ranks (reciprocal = 1e6 DIV rank, mean round-half-up)."""
    return graphstats.link_pred_mrr(_docs(spark, sf_dir))


# Type-propagation oracle: identical seeding hash + unrolled clamped
# rounds (iters imported — retuning cannot desync plan and oracle).
from hebrew_ner_spark.functions.hashing import phash_duck as _tp_phd  # noqa: E402
from hebrew_ner_spark.operators.graphstats import (  # noqa: E402
    TYPEPROP_ITERS as _TP_ITERS,
    TYPEPROP_SEED as _TP_SEED,
)
from hebrew_ner_spark.querydefs.kg_chain import _etype_duck as _tp_etype  # noqa: E402

_TP_HASH = _tp_phd("'TPS|' || entity", _TP_SEED)


def _typeprop_oracle(iters: int) -> str:
    rounds = []
    prev = "t0"
    for k in range(1, iters + 1):
        rounds.append(
            f"""
    t{k} AS (
      SELECT entity, etype FROM seeds
      UNION ALL
      SELECT entity, etype FROM (
        SELECT s.src AS entity, l.etype, sum(s.n) AS w,
               row_number() OVER (PARTITION BY s.src
                                  ORDER BY sum(s.n) DESC, l.etype ASC) AS rk
        FROM sym s JOIN {prev} l ON s.dst = l.entity
        WHERE s.src NOT IN (SELECT entity FROM seeds)
        GROUP BY s.src, l.etype)
      WHERE rk = 1
    )"""
        )
        prev = f"t{k}"
    return f"""
    WITH {_EDGES_CTE},
    {_SPARSE_EW},
    sym AS (SELECT a AS src, b AS dst, n FROM ews
            UNION ALL SELECT b AS src, a AS dst, n FROM ews),
    nodes AS (SELECT DISTINCT src AS entity FROM sym),
    seeds AS (SELECT entity, {_tp_etype("entity")} AS etype
              FROM nodes WHERE {_TP_HASH} % 2 = 0),
    t0 AS (SELECT entity, etype FROM seeds),
    {",".join(rounds)}
    SELECT entity, etype, CAST({_TP_HASH} % 2 <> 0 AS BIGINT) AS inferred FROM {prev}
    """


@query("kg_type_propagation", oracle=_typeprop_oracle(_TP_ITERS))
def kg_type_propagation(spark, sf_dir):
    """Semi-supervised entity typing: clamped seeds (hash-selected half
    of the nodes, gazetteer classes), weighted majority-vote propagation
    for the rest, fixed synchronous rounds vs the unrolled-CTE oracle
    (operators/graphstats.py type_propagation)."""
    return graphstats.type_propagation(_docs(spark, sf_dir))


@query(
    "kg_pra_features",
    oracle=f"""
    WITH pra_t AS ({_DEPPAT_ORACLE}),
    pra_e AS (SELECT DISTINCT subj, pred, obj FROM pra_t WHERE subj <> obj)
    SELECT e1.subj AS a, e2.obj AS c, e1.pred AS pred1, e2.pred AS pred2,
           CAST(count(DISTINCT e1.obj) AS BIGINT) AS n_paths
    FROM pra_e e1 JOIN pra_e e2 ON e1.obj = e2.subj
    WHERE e1.subj <> e2.obj
    GROUP BY 1, 2, 3, 4
    """,
)
def kg_pra_features(spark, sf_dir):
    """PRA path-type features: distinct-mid counts per (pred1, pred2)
    relation sequence over the typed triple store (operators/graphstats.py
    pra_path_features — distinct typed edges before the wedge join,
    hub-cap contract shared with link_pred_ra)."""
    return graphstats.pra_path_features(_docs(spark, sf_dir))


@query(
    "kg_clustering",
    oracle=f"""
    WITH {_EDGES_CTE},
    {_SPARSE_EW},
    ccsym AS (SELECT a, b FROM ews UNION ALL SELECT b, a FROM ews),
    ccdeg AS (SELECT a AS entity, CAST(count(*) AS BIGINT) AS deg
              FROM ccsym GROUP BY a),
    cctri AS (
      SELECT s1.a AS entity, CAST(count(*) AS BIGINT) AS n_tri
      FROM ccsym s1
      JOIN ccsym s2 ON s2.a = s1.b
      JOIN ccsym s3 ON s3.a = s2.b AND s3.b = s1.a
      GROUP BY s1.a
    )
    SELECT d.entity, d.deg,
           CAST(coalesce(t.n_tri // 2, 0) AS BIGINT) AS n_tri,
           CASE WHEN d.deg < 2 THEN 0
                ELSE CAST((2 * (2 * (coalesce(t.n_tri // 2, 0)) * 1000000)
                           + (d.deg * (d.deg - 1)))
                          // (2 * (d.deg * (d.deg - 1))) AS BIGINT) END AS cc_1e6
    FROM ccdeg d LEFT JOIN cctri t ON t.entity = d.entity
    """,
)
def kg_clustering(spark, sf_dir):
    """Per-node local clustering coefficient (Watts-Strogatz) in exact
    micro-units. The oracle counts directed closed walks per corner
    (each triangle twice per node) — a different enumeration than the
    Spark orientation-minimal corner explode, so agreement gates the
    counting itself."""
    return graphstats.clustering_coefficient(_docs(spark, sf_dir))


# Bounded reachability oracle: the OPPOSITE construction to the Spark
# plan. Spark does min-plus doubling (log2(H) self-joins, each squaring
# the hop horizon); the oracle grows paths one hop at a time through a
# depth-bounded recursive CTE and takes the min per pair. They agree
# only if both min-hop semantics are exact. Horizon/order imported from
# the operator so retuning cannot desync plan and oracle.
_BR_H = graphstats.REACH_MAX_HOPS
_BR_N = graphstats.REACH_N_NODES

_BOUNDED_REACH_ORACLE = f"""
    WITH RECURSIVE brce AS (
      SELECT DISTINCT 'n' || CAST(doc_id % {_BR_N} AS VARCHAR) AS src,
                      'n' || CAST((doc_id * 7 + 13) % {_BR_N} AS VARCHAR) AS dst
      FROM documents
      WHERE (doc_id % {_BR_N}) <> ((doc_id * 7 + 13) % {_BR_N})
    ),
    brcp AS (
      SELECT src, dst, 1 AS hops FROM brce
      UNION
      SELECT p.src, e.dst, p.hops + 1
      FROM brcp p JOIN brce e ON e.src = p.dst
      WHERE p.hops < {_BR_H}
    )
    SELECT src, dst, CAST(min(hops) AS BIGINT) AS min_hops
    FROM brcp GROUP BY 1, 2
"""


@query("kg_bounded_reach", oracle=_BOUNDED_REACH_ORACLE)
def kg_bounded_reach(spark, sf_dir):
    """Bounded all-pairs min-hop reachability over the planted sparse
    graph (operators/graphstats.py bounded_reach): min-plus doubling —
    ceil(log2 H) relay-keyed self-joins + min aggregates — vs the
    oracle's one-hop-at-a-time depth-bounded recursive CTE. Includes
    cycle returns (src == dst at the cycle length) on both engines."""
    return graphstats.bounded_reach(
        graphstats.synth_sparse_edges(_docs(spark, sf_dir))
    )


# weighted twin: min TOTAL WEIGHT over <= horizon hops, min-plus matrix
# squaring vs the opposite construction (hop-at-a-time recursive CTE
# accumulating walk weights, min at the end). Runs on the SimRank sparse
# graph (shared parents -> genuinely alternative routes) with portable
# hash weights. The horizon is imported so retuning cannot desync.
from hebrew_ner_spark.functions.hashing import phash_duck as _wr_phash  # noqa: E402
from hebrew_ner_spark.operators.graphstats import (  # noqa: E402
    WREACH_HORIZON as _WR_H,
    WREACH_SEED as _WR_SEED,
    WREACH_W_MOD as _WR_MOD,
)
from hebrew_ner_spark.querydefs.simrank_q import _SRE as _WR_SRE  # noqa: E402

_WREACH_ORACLE = f"""
    WITH RECURSIVE {_WR_SRE},
    wre AS (
      SELECT src, dst,
             CAST(({_wr_phash("src || '|' || dst", _WR_SEED)})
                  % {_WR_MOD} + 10 AS BIGINT) AS w
      FROM sre
    ),
    wrp AS (
      SELECT src, dst, w, 1 AS hops FROM wre
      UNION
      SELECT p.src, e.dst, p.w + e.w, p.hops + 1
      FROM wrp p JOIN wre e ON e.src = p.dst
      WHERE p.hops < {_WR_H}
    )
    SELECT src, dst, CAST(min(w) AS BIGINT) AS min_w
    FROM wrp GROUP BY 1, 2
"""


@query("kg_weighted_reach", oracle=_WREACH_ORACLE)
def kg_weighted_reach(spark, sf_dir):
    """Bounded-horizon weighted shortest paths (the Dijkstra-class
    capability): min-plus squaring vs the recursive-CTE walk oracle —
    exact because any <= 2^k-hop walk splits at its midpoint."""
    return graphstats.weighted_reach(
        graphstats.weighted_sr_edges(_docs(spark, sf_dir))
    )


# ---------------------------------------------------------------------------
# Graph partition quality
# ---------------------------------------------------------------------------

from hebrew_ner_spark.functions.hashing import phash_duck as _pq_phash  # noqa: E402
from hebrew_ner_spark.operators import linking as _pq_linking  # noqa: E402
from hebrew_ner_spark.querydefs.graph_q import _dim_values as _pq_dim  # noqa: E402
from hebrew_ner_spark.querydefs.graph_q import _edges_ctes as _pq_edges  # noqa: E402

_PQ_HS = _pq_phash("CAST(src AS VARCHAR)", graphstats.PART_SEED)
_PQ_HD = _pq_phash("CAST(dst AS VARCHAR)", graphstats.PART_SEED)


@query(
    "kg_partition_quality",
    oracle=f"""
    WITH {_pq_dim()},
    {_pq_edges("pq")},
    pq_e AS (SELECT subj_id AS src, obj_id AS dst FROM pqe),
    pq_f AS (
      SELECT kk.k,
             CASE WHEN {_PQ_HS} % kk.k <> {_PQ_HD} % kk.k THEN 1 ELSE 0 END AS cut,
             {_PQ_HS} % kk.k AS part
      FROM pq_e, (SELECT unnest([8, 32]) AS k) kk
    ),
    pq_k AS (SELECT k, CAST(count(*) AS BIGINT) AS n_edges,
                    CAST(sum(cut) AS BIGINT) AS n_cut
             FROM pq_f GROUP BY k),
    pq_l AS (SELECT k, CAST(max(n) AS BIGINT) AS max_load
             FROM (SELECT k, part, count(*) AS n FROM pq_f GROUP BY k, part)
             GROUP BY k)
    SELECT CAST(pq_k.k AS BIGINT) AS k, n_edges, n_cut,
           CAST((2 * n_cut * 1000000 + n_edges) // (2 * n_edges) AS BIGINT)
             AS cut_share_1e6,
           max_load,
           CAST((2 * max_load * pq_k.k * 1000000 + n_edges)
                // (2 * n_edges) AS BIGINT) AS balance_1e6
    FROM pq_k JOIN pq_l ON pq_k.k = pq_l.k
    """,
)
def kg_partition_quality(spark, sf_dir):
    """Edge-cut share + straggler load of hash partitioning at k=8/32
    over the materialized edge table — the pre-bucketing design metric."""
    from pyspark.sql import functions as F

    e = _pq_linking.kg_edges(_docs(spark, sf_dir)).select(
        F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
    )
    return graphstats.partition_quality(e)


# --- 1-WL color refinement ----------------------------------------------------

from hebrew_ner_spark.operators.graphstats import WL_INIT as _WL_INIT  # noqa: E402
from hebrew_ner_spark.operators.graphstats import WL_ROUNDS as _WL_R  # noqa: E402
from hebrew_ner_spark.operators.simrank import synth_sr_edges as _wl_edges  # noqa: E402


def _wl_round_ctes(k: int) -> str:
    prev = f"wc{k - 1}"
    return f"""
wi{k} AS (
  SELECT e.dst AS node,
         string_agg(CAST(c.color AS VARCHAR), ','
                    ORDER BY CAST(c.color AS VARCHAR)) AS in_sig
  FROM sre e JOIN {prev} c ON c.node = e.src GROUP BY e.dst
),
wo{k} AS (
  SELECT e.src AS node,
         string_agg(CAST(c.color AS VARCHAR), ','
                    ORDER BY CAST(c.color AS VARCHAR)) AS out_sig
  FROM sre e JOIN {prev} c ON c.node = e.dst GROUP BY e.src
),
wc{k} AS (
  SELECT c.node,
         {_wr_phash(
             "CAST(c.color AS VARCHAR) || '|' || coalesce(i.in_sig, '')"
             " || '|' || coalesce(o.out_sig, '')", 0)} AS color
  FROM {prev} c
  LEFT JOIN wi{k} i ON i.node = c.node
  LEFT JOIN wo{k} o ON o.node = c.node
)"""


_WL_BASE = (
    f"{_WR_SRE},\n"
    "wn AS (SELECT src AS node FROM sre UNION SELECT dst FROM sre),\n"
    f"wc0 AS (SELECT node, {_wr_phash(chr(39) + _WL_INIT + chr(39), 0)} AS color FROM wn)"
    + ",".join([""] + [_wl_round_ctes(k) for k in range(1, _WL_R + 1)])
)


@query(
    "kg_wl_colors",
    oracle=f"WITH {_WL_BASE} SELECT node, color FROM wc{_WL_R}",
)
def kg_wl_colors(spark, sf_dir):
    """Directed 1-WL color refinement after 3 rounds — the canonical
    structural-role partition, unrolled-round replay (sorted neighbor
    multisets canonicalized to the identical string both engines hash)."""
    return graphstats.wl_colors(_wl_edges(_docs(spark, sf_dir)))


@query(
    "kg_wl_partition",
    oracle=f"""
    WITH {_WL_BASE}
    SELECT color, CAST(count(*) AS BIGINT) AS n_nodes
    FROM wc{_WL_R} GROUP BY color
    """,
)
def kg_wl_partition(spark, sf_dir):
    """The structural-class histogram (how many WL-indistinguishable
    role groups the graph carries)."""
    return graphstats.wl_partition(_wl_edges(_docs(spark, sf_dir)))


@query("kg_reach_recursive", oracle=_BOUNDED_REACH_ORACLE)
def kg_reach_recursive(spark, sf_dir):
    """Native-recursion twin of kg_bounded_reach: Spark 4's WITH
    RECURSIVE computes the bounded min-hop table (one materialized
    level per step), against the same DuckDB recursive oracle — and,
    transitively, against the min-plus doubling plan, a three-way
    agreement across two recursion engines and one squaring algorithm
    (operators/graphstats.py bounded_reach_recursive)."""
    return graphstats.bounded_reach_recursive(
        graphstats.synth_sparse_edges(_docs(spark, sf_dir))
    )


def _modularity_oracle() -> str:
    body, prev = _lpa_ctes(_LPA_ITERS)
    return f"""
    WITH {body},
    mqlab AS (SELECT entity, community FROM {prev}),
    mqw AS (SELECT CAST(sum(n) AS BIGINT) AS w FROM ews),
    mqst AS (SELECT src AS entity, CAST(sum(n) AS BIGINT) AS s
             FROM sym GROUP BY src),
    mqin AS (
      SELECT la.community, CAST(sum(e.n) AS BIGINT) AS w_in
      FROM ews e
      JOIN mqlab la ON la.entity = e.a
      JOIN mqlab lb ON lb.entity = e.b AND la.community = lb.community
      GROUP BY la.community
    ),
    mqsc AS (
      SELECT l.community, CAST(count(*) AS BIGINT) AS n_v,
             CAST(sum(st.s) AS BIGINT) AS s_tot
      FROM mqlab l JOIN mqst st USING (entity) GROUP BY l.community
    )
    SELECT s.community, s.n_v,
           CAST(coalesce(i.w_in, 0) AS BIGINT) AS w_in, s.s_tot,
           CAST(4 * w.w * coalesce(i.w_in, 0) - s.s_tot * s.s_tot
                AS BIGINT) AS q_num,
           CAST(4 * w.w * w.w AS BIGINT) AS q_den
    FROM mqsc s LEFT JOIN mqin i USING (community) CROSS JOIN mqw w
    """


@query("graph_modularity", oracle=_modularity_oracle())
def graph_modularity(spark, sf_dir):
    """Weighted Newman modularity of the LPA partition, exact integer
    pieces (Q * 4W^2 per community; negative-capable q_num emitted
    undivided — the assortativity precedent); the oracle replays LPA's
    rounds AND the modularity aggregation
    (operators/netstruct.py modularity_pieces)."""
    from hebrew_ner_spark.operators import netstruct

    docs = _docs(spark, sf_dir)
    return netstruct.modularity_pieces(
        graphstats.above_mean_edges(docs),
        graphstats.label_propagation(docs),
    )
