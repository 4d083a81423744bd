"""ANN similarity-search queries + DuckDB oracles.

Cosines are computed with the same sequential fold order in both engines
(Spark aggregate over zip_with; DuckDB list_sum over list_transform) so the
micro-unit scores hash identically.
"""

from __future__ import annotations

from hebrew_ner_spark.operators import simsearch
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

D = simsearch.DIM
Q = simsearch.DEFAULT_QUERIES
K = simsearch.DEFAULT_K
BITS = simsearch.LSH_BITS

_DOT_QE = (
    f"list_sum(list_transform(range(1, {D + 1}), "
    "i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))"
)

def _e_cte(src: str = "embeddings") -> str:
    return f"""
e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(range(1, {D + 1}),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
  FROM {src}
)
"""


_E_CTE = _e_cte()

def _buckets_cte(bits: int = BITS, src: str = "embeddings") -> str:
    return f"""
sm AS (
  SELECT j, list_transform(range(0, {D}), d ->
           CASE WHEN CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || '_' ||
                     CAST(d AS VARCHAR) || ':0'), 1, 15)) AS BIGINT) & 1 = 1
                THEN 1 ELSE -1 END) AS signs
  FROM (SELECT unnest(range(0, {bits})) AS j)
),
dots AS (
  SELECT eb.vec_id, sm.j,
         list_sum(list_transform(range(1, {D + 1}),
              i -> CAST(eb.embedding[i] AS DOUBLE) * sm.signs[i])) AS dot
  FROM {src} eb CROSS JOIN sm
),
b AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
)
"""


_BUCKETS_CTE = _buckets_cte()


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# Trained-centroid memo, keyed per (read-only) corpus dir — the same
# pattern as graph_q._CC_OVERFLOW_CHECKED. ann_kmeans_cells, ann_ivf_topk
# and ann_ivf_recall all need the SAME trained index; without the memo
# each gate (x bench reps) re-runs the full two-pass Lloyd training.
# kmeans_centroids already returns a driver-local relation (n_cells rows
# by construction), so the memo stores its rows and rebuilds a local
# relation per call — a few KB, session-restart-safe, not a data path.
_CENTS_MEMO: dict = {}


def _trained_cents(spark, sf_dir):
    if sf_dir not in _CENTS_MEMO:
        cents = simsearch.kmeans_centroids(_emb(spark, sf_dir))
        _CENTS_MEMO[sf_dir] = (cents.collect(), cents.schema)
    rows, schema = _CENTS_MEMO[sf_dir]
    return spark.createDataFrame(rows, schema)


@query(
    "ann_brute_topk",
    oracle=f"""
    WITH {_E_CTE},
    qset AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e WHERE vec_id < {Q}),
    s AS (
      SELECT qset.qid, e.vec_id AS nid,
             CAST(round({_DOT_QE} / (e.nrm * qset.qn) * 1000000.0) AS BIGINT) AS cos_1e6
      FROM e CROSS JOIN qset WHERE e.vec_id <> qset.qid
    )
    SELECT qid, nid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_1e6 DESC, nid) AS BIGINT) AS rank,
           cos_1e6
    FROM s QUALIFY rank <= {K}
    """,
)
def ann_brute_topk(spark, sf_dir):
    return simsearch.brute_topk(_emb(spark, sf_dir))


@query(
    "ann_lsh_buckets",
    oracle=f"WITH {_BUCKETS_CTE} SELECT vec_id, bucket FROM b",
)
def ann_lsh_buckets(spark, sf_dir):
    return simsearch.rp_lsh_buckets(_emb(spark, sf_dir))


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH {_E_CTE},
    {_BUCKETS_CTE},
    side AS (SELECT e.vec_id, e.embedding, e.nrm, b.bucket FROM e JOIN b USING (vec_id)),
    qset AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn, bucket FROM side WHERE vec_id < {Q}),
    s AS (
      SELECT qset.qid, e.vec_id AS nid,
             CAST(round({_DOT_QE} / (e.nrm * qset.qn) * 1000000.0) AS BIGINT) AS cos_1e6
      FROM side e JOIN qset USING (bucket) WHERE e.vec_id <> qset.qid
    )
    SELECT qid, nid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_1e6 DESC, nid) AS BIGINT) AS rank,
           cos_1e6
    FROM s QUALIFY rank <= {K}
    """,
)
def ann_lsh_topk(spark, sf_dir):
    return simsearch.rp_lsh_topk(_emb(spark, sf_dir))


_ND_BITS = simsearch.NEAR_DUP_BITS

_PAIR_COS = (
    f"list_sum(list_transform(range(1, {D + 1}), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    " / (a.nrm * c.nrm) * 1000000.0"
)


def _near_dup_oracle(src: str = "embeddings", extra_cte: str = "") -> str:
    return f"""
    WITH {extra_cte}{_e_cte(src)},
    {_buckets_cte(_ND_BITS, src)},
    side AS (SELECT e.vec_id, e.embedding, e.nrm, b.bucket FROM e JOIN b USING (vec_id)),
    okb AS (SELECT bucket FROM b GROUP BY bucket
            HAVING count(*) <= {simsearch.NEAR_DUP_MAX_BUCKET})
    SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
           CAST(floor({_PAIR_COS} + 0.5) AS BIGINT) AS cos_1e6
    FROM side a
    JOIN okb ON okb.bucket = a.bucket
    JOIN side c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE CAST(floor({_PAIR_COS} + 0.5) AS BIGINT) >= 350000
    """


@query("emb_near_dups", oracle=_near_dup_oracle())
def emb_near_dups(spark, sf_dir):
    """LSH-bucketed near-duplicate pairs: candidates by rp-LSH bucket
    equi-key, exact cosine verified per bucket via grouped-map matmul —
    zero driver materialization (the 10^12-row plan shape)."""
    return simsearch.embedding_near_dups(_emb(spark, sf_dir))


_SKEW_COPIES = 48
_SKEW_CTE = f"""
emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT 1000000 + r AS vec_id, embedding
  FROM embeddings CROSS JOIN (SELECT unnest(range(0, {_SKEW_COPIES})) AS r)
  WHERE vec_id = 0
),
"""


def _planted_emb(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    copies = (
        emb.where(F.col("vec_id") == 0)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(_SKEW_COPIES - 1))).alias("r"),
            "embedding",
        )
        .select((F.lit(1000000) + F.col("r")).alias("vec_id"), "embedding")
    )
    return emb.unionByName(copies)


@query(
    "emb_near_dups_skew",
    oracle=_near_dup_oracle("emb2", _SKEW_CTE),
)
def emb_near_dups_skew(spark, sf_dir):
    """Mega-bucket fixture: 48 exact copies of one vector land in a single
    LSH bucket (the boilerplate-page shape). The grouped-map scorer must
    emit every copy pair at cos 1e6 without driver involvement."""
    return simsearch.embedding_near_dups(_planted_emb(spark, sf_dir))


@query(
    "emb_near_dup_overflow",
    oracle=f"""
    WITH {_SKEW_CTE.rstrip().rstrip(',')},
    {_buckets_cte(_ND_BITS, 'emb2')}
    SELECT bucket, count(*) AS n_vecs FROM b GROUP BY bucket HAVING count(*) > 40
    """,
)
def emb_near_dup_overflow(spark, sf_dir):
    """The non-silent drop counter: with the cap forced under the planted
    cluster size, its bucket must surface here (and would be excluded from
    pairwise scoring at the same cap)."""
    return simsearch.near_dup_overflow(_planted_emb(spark, sf_dir), max_bucket=40)


_CELLS = simsearch.IVF_CELLS
_PROBES = simsearch.IVF_PROBES
_ITERS = simsearch.KMEANS_ITERS

# --- seeded-k-means IVF oracle -------------------------------------------
# Mirrors operators/simsearch.py kmeans_centroids exactly: micro-unit
# integer vectors, integer dots, truncating integer mean, and the
# idot/cnorm double only at the final compare — every iteration unrolled
# as CTEs. HUGEINT list_sum/sum are cast back down (memory rule) and
# `//` / `DIV` both truncate toward zero (verified for negatives).

_MV_CTE = """
mv AS (
  SELECT vec_id, list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS mv
  FROM embeddings
)
"""

_IDOT = f"CAST(list_sum(list_transform(range(1, {D + 1}), i -> mv.mv[i] * c.cent[i])) AS DOUBLE)"
_CNORM = f"sqrt(CAST(list_sum(list_transform(range(1, {D + 1}), i -> c.cent[i] * c.cent[i])) AS DOUBLE))"


def _lloyd_ctes(iters: int = _ITERS, n_cells: int = _CELLS) -> tuple[str, str]:
    """(cte_sql, final_centroid_cte_name): c0 = seed, then per iteration
    sI (score) -> aI (argmax cell) -> cI (integer-mean update)."""
    parts = [
        f"c0 AS (SELECT vec_id AS cell, mv AS cent FROM mv WHERE vec_id < {n_cells})"
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(f"""
s{it} AS (
  SELECT mv.vec_id, c.cell, {_IDOT} / {_CNORM} AS score
  FROM mv CROSS JOIN {prev} c
  WHERE {_CNORM} > 0
)""")
        parts.append(f"""
a{it} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS r
    FROM s{it}) WHERE r = 1
)""")
        parts.append(f"""
c{it} AS (
  SELECT cell, list(cv ORDER BY dim) AS cent FROM (
    SELECT a{it}.cell, x.dim, CAST(sum(x.val) // count(*) AS BIGINT) AS cv
    FROM (SELECT vec_id, generate_subscripts(mv, 1) AS dim, unnest(mv) AS val FROM mv) x
    JOIN a{it} USING (vec_id)
    GROUP BY a{it}.cell, x.dim) GROUP BY cell
)""")
        prev = f"c{it}"
    return ",\n".join(parts), prev


_LLOYD_SQL, _CFINAL = _lloyd_ctes()

# search-time assignment + query probes against the trained centroids
_IVF_CTE = f"""
{_LLOYD_SQL},
fin AS (
  SELECT mv.vec_id, c.cell, {_IDOT} / {_CNORM} AS score
  FROM mv CROSS JOIN {_CFINAL} c
  WHERE {_CNORM} > 0
),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS r
    FROM fin) WHERE r = 1
),
probes AS (
  SELECT qid, cell FROM (
    SELECT vec_id AS qid, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS r
    FROM fin WHERE vec_id < {Q}) WHERE r <= {_PROBES}
)
"""


@query(
    "ann_kmeans_cells",
    oracle=f"""
    WITH {_MV_CTE},
    {_IVF_CTE}
    SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM cells
    """,
)
def ann_kmeans_cells(spark, sf_dir):
    """The trained index itself: every vector's cell after the seeded
    Lloyd iterations — the most directly debuggable k-means surface
    (any drift in a sum, mean, or tie-break shows here first)."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    return simsearch.ivf_assign(emb, cents=_trained_cents(spark, sf_dir)).select(
        "vec_id", F.col("cell").cast("long").alias("cell")
    )


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH {_E_CTE},
    {_MV_CTE},
    {_IVF_CTE},
    s AS (
      SELECT p.qid, e.vec_id AS nid,
             CAST(round(list_sum(list_transform(range(1, {D + 1}),
                    i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  / (e.nrm * qv.nrm) * 1000000.0) AS BIGINT) AS cos_1e6
      FROM probes p
      JOIN cells cl ON cl.cell = p.cell
      JOIN e ON e.vec_id = cl.vec_id
      JOIN e qv ON qv.vec_id = p.qid
      WHERE e.vec_id <> p.qid
    )
    SELECT qid, nid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_1e6 DESC, nid) AS BIGINT) AS rank,
           cos_1e6
    FROM s QUALIFY rank <= {K}
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed top-k over the seeded-k-means index: probe the 2
    nearest of 16 trained cells (2 Lloyd iterations, exact integer
    arithmetic end-to-end — see kmeans_centroids)."""
    return simsearch.ivf_topk(
        _emb(spark, sf_dir), cents=_trained_cents(spark, sf_dir)
    )


@query(
    "ann_recall",
    oracle=f"""
    WITH {_E_CTE},
    qset AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e WHERE vec_id < {Q}),
    s AS (
      SELECT qset.qid, e.vec_id AS nid,
             CAST(round({_DOT_QE} / (e.nrm * qset.qn) * 1000000.0) AS BIGINT) AS cos_1e6
      FROM e CROSS JOIN qset WHERE e.vec_id <> qset.qid
    ),
    brute AS (
      SELECT qid, nid FROM (
        SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos_1e6 DESC, nid) AS r
        FROM s) WHERE r <= {K}
    ),
    {_BUCKETS_CTE},
    side AS (SELECT e.vec_id, e.embedding, e.nrm, b.bucket FROM e JOIN b USING (vec_id)),
    qb AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn, bucket FROM side WHERE vec_id < {Q}),
    ls AS (
      SELECT qb.qid, e.vec_id AS nid,
             CAST(round({_DOT_QE.replace('qset.', 'qb.')} / (e.nrm * qb.qn) * 1000000.0) AS BIGINT) AS cos_1e6
      FROM side e JOIN qb USING (bucket) WHERE e.vec_id <> qb.qid
    ),
    lsh AS (
      SELECT qid, nid FROM (
        SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos_1e6 DESC, nid) AS r
        FROM ls) WHERE r <= {K}
    )
    SELECT 'rp_lsh' AS method,
           CAST((SELECT count(*) FROM brute) AS BIGINT) AS n_brute,
           CAST((SELECT count(*) FROM lsh JOIN brute USING (qid, nid)) AS BIGINT) AS n_hit,
           CAST((2 * ((SELECT count(*) FROM lsh JOIN brute USING (qid, nid))) * 1000000 + ((SELECT count(*) FROM brute))) // (2 * ((SELECT count(*) FROM brute))) AS BIGINT) AS recall_1e6
    """,
)
def ann_recall(spark, sf_dir):
    """Recall@k of the RP-LSH path against exact brute force — the
    quality/cost tradeoff metric an ANN deployment is tuned by. One
    Spark plan, no driver-side counts."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    brute = simsearch.brute_topk(emb).select("qid", "nid")
    lsh = simsearch.rp_lsh_topk(emb).select("qid", "nid")
    nb = brute.agg(F.count("*").cast("long").alias("n_brute"))
    nh = lsh.join(brute, ["qid", "nid"]).agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return nb.crossJoin(nh).select(
        F.lit("rp_lsh").alias("method"),
        "n_brute",
        "n_hit",
        F.expr(
"CAST((2 * (n_hit) * 1000000 + (n_brute)) DIV (2 * (n_brute)) AS BIGINT)"
        ).alias("recall_1e6"),
    )


@query(
    "ann_ivf_recall",
    oracle=f"""
    WITH {_E_CTE},
    qset AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e WHERE vec_id < {Q}),
    bs AS (
      SELECT qset.qid, e.vec_id AS nid,
             CAST(round({_DOT_QE} / (e.nrm * qset.qn) * 1000000.0) AS BIGINT) AS cos_1e6
      FROM e CROSS JOIN qset WHERE e.vec_id <> qset.qid
    ),
    brute AS (
      SELECT qid, nid FROM (
        SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos_1e6 DESC, nid) AS r
        FROM bs) WHERE r <= {K}
    ),
    {_MV_CTE.strip().rstrip()},
    {_IVF_CTE.strip()},
    ivs AS (
      SELECT p.qid, e.vec_id AS nid,
             CAST(round(list_sum(list_transform(range(1, {D + 1}),
                    i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                  / (e.nrm * qv.nrm) * 1000000.0) AS BIGINT) AS cos_1e6
      FROM probes p
      JOIN cells cl ON cl.cell = p.cell
      JOIN e ON e.vec_id = cl.vec_id
      JOIN e qv ON qv.vec_id = p.qid
      WHERE e.vec_id <> p.qid
    ),
    ivf AS (
      SELECT qid, nid FROM (
        SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos_1e6 DESC, nid) AS r
        FROM ivs) WHERE r <= {K}
    )
    SELECT 'ivf_kmeans' AS method,
           CAST((SELECT count(*) FROM brute) AS BIGINT) AS n_brute,
           CAST((SELECT count(*) FROM ivf JOIN brute USING (qid, nid)) AS BIGINT) AS n_hit,
           CAST((2 * ((SELECT count(*) FROM ivf JOIN brute USING (qid, nid))) * 1000000 + ((SELECT count(*) FROM brute))) // (2 * ((SELECT count(*) FROM brute))) AS BIGINT) AS recall_1e6
    """,
)
def ann_ivf_recall(spark, sf_dir):
    """Recall@k of the trained-IVF path against exact brute force — the
    number the index is tuned by; compare with ann_recall's rp_lsh row.
    (tests/test_simsearch.py additionally pins trained > seed recall at
    equal probe count.)"""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    brute = simsearch.brute_topk(emb).select("qid", "nid")
    ivf = simsearch.ivf_topk(emb, cents=_trained_cents(spark, sf_dir)).select(
        "qid", "nid"
    )
    nb = brute.agg(F.count("*").cast("long").alias("n_brute"))
    nh = ivf.join(brute, ["qid", "nid"]).agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return nb.crossJoin(nh).select(
        F.lit("ivf_kmeans").alias("method"),
        "n_brute",
        "n_hit",
        F.expr(
"CAST((2 * (n_hit) * 1000000 + (n_brute)) DIV (2 * (n_brute)) AS BIGINT)"
        ).alias("recall_1e6"),
    )


# --- TransE link scoring over the entity graph -----------------------------
# The relation vectors are literals derived once driver-side (phash_py) and
# embedded identically in the Spark plan and the oracle.

from hebrew_ner_spark.operators import linking  # noqa: E402
from hebrew_ner_spark.querydefs.graph_q import (  # noqa: E402
    _dim_values,
    _edges_ctes,
)

_RV_VALUES = ", ".join(
    f"('{p}', CAST({v} AS BIGINT[]))"
    for p, v in simsearch.transe_relation_vectors().items()
)


@query(
    "kg_transe_topk",
    oracle=f"""
    WITH {_dim_values()},
    {_edges_ctes()},
    rv(pred, rvv) AS (VALUES {_RV_VALUES}),
    mvv AS (SELECT vec_id, list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
              AS mv FROM embeddings),
    nodes AS (SELECT DISTINCT eid FROM
               (SELECT subj_id AS eid FROM e
                UNION ALL SELECT obj_id FROM e)),
    nv AS (SELECT n.eid, m.mv FROM nodes n JOIN mvv m ON m.vec_id = n.eid),
    heads AS (SELECT DISTINCT subj_id, pred FROM e),
    sc AS (SELECT h.subj_id, h.pred, t.eid AS tail_id,
                  list_sum(list_transform(range(1, {simsearch.DIM} + 1),
                    j -> abs(hv.mv[j] + r.rvv[j] - t.mv[j]))) AS energy
           FROM heads h
           JOIN nv hv ON hv.eid = h.subj_id
           JOIN rv r ON r.pred = h.pred
           CROSS JOIN nv t
           WHERE t.eid <> h.subj_id),
    rkd AS (SELECT subj_id, pred, tail_id, energy,
                   row_number() OVER (PARTITION BY subj_id, pred
                                      ORDER BY energy, tail_id) AS rk
            FROM sc)
    SELECT subj_id, pred, tail_id, CAST(energy AS BIGINT) AS energy,
           CAST(rk AS BIGINT) AS rk
    FROM rkd WHERE rk <= {simsearch.TRANSE_K}
    """,
)
def kg_transe_topk(spark, sf_dir):
    """TransE link scoring: top-k minimum-L1-energy candidate tails per
    observed (head, relation) over micro-unit quantized embeddings."""
    from hebrew_ner_spark.sources.catalog import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    return simsearch.transe_topk(linking.kg_edges(docs), _emb(spark, sf_dir))


@query(
    "kg_transe_rank",
    oracle=f"""
    WITH {_dim_values()},
    {_edges_ctes()},
    rv(pred, rvv) AS (VALUES {_RV_VALUES}),
    mvv AS (SELECT vec_id, list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
              AS mv FROM embeddings),
    nodes AS (SELECT DISTINCT eid FROM
               (SELECT subj_id AS eid FROM e
                UNION ALL SELECT obj_id FROM e)),
    nv AS (SELECT n.eid, m.mv FROM nodes n JOIN mvv m ON m.vec_id = n.eid),
    heads AS (SELECT DISTINCT subj_id, pred FROM e),
    sc AS (SELECT h.subj_id, h.pred, t.eid AS tail_id,
                  list_sum(list_transform(range(1, {simsearch.DIM} + 1),
                    j -> abs(hv.mv[j] + r.rvv[j] - t.mv[j]))) AS energy
           FROM heads h
           JOIN nv hv ON hv.eid = h.subj_id
           JOIN rv r ON r.pred = h.pred
           CROSS JOIN nv t
           WHERE t.eid <> h.subj_id),
    truth AS (SELECT DISTINCT subj_id, pred, obj_id AS tail_id FROM e),
    lab AS (SELECT sc.*, CASE WHEN tr.tail_id IS NULL THEN 0 ELSE 1 END
                           AS is_pos
            FROM sc LEFT JOIN truth tr USING (subj_id, pred, tail_id)),
    rkd AS (SELECT subj_id, pred, tail_id, energy, is_pos,
                   row_number() OVER (PARTITION BY subj_id, pred
                                      ORDER BY energy, tail_id) AS rn,
                   coalesce(sum(is_pos) OVER (PARTITION BY subj_id, pred
                     ORDER BY energy, tail_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS prev_pos
            FROM lab)
    SELECT subj_id, pred, tail_id, CAST(energy AS BIGINT) AS energy,
           CAST(rn - prev_pos AS BIGINT) AS rank
    FROM rkd WHERE is_pos = 1
    """,
)
def kg_transe_rank(spark, sf_dir):
    """TransE evaluation: filtered rank of every TRUE tail among its
    (head, relation) candidates by integer L1 energy."""
    from hebrew_ner_spark.sources.catalog import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    return simsearch.transe_ranks(linking.kg_edges(docs), _emb(spark, sf_dir))


# --- SemDeDup gate ----------------------------------------------------
# Planted twins (exact copies of vecs 0..9 at 1000000+i, the
# emb_near_dups_skew pattern) give the drop rule real work at
# tau = 0.95: each twin shares its source's cell and cosine 10^6, so
# exactly the ten copies drop (keep-lowest). The oracle retrains the
# seeded Lloyd index over the planted table by redefining ONLY the mv
# CTE — the whole _IVF_CTE chain is source-agnostic above mv.

_SEM_COPIES = 10
_SEM_CTE = f"""
emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT 1000000 + vec_id AS vec_id, embedding
  FROM embeddings WHERE vec_id < {_SEM_COPIES}
),
mv AS (
  SELECT vec_id, list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS mv
  FROM emb2
)
"""

_SEM_PAIR_COS = (
    f"list_sum(list_transform(range(1, {D + 1}), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
    " / (a.nrm * c.nrm) * 1000000.0"
)

_SEM_MEMO: dict = {}


def _sem_planted(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    twins = emb.where(F.col("vec_id") < _SEM_COPIES).select(
        (F.lit(1000000) + F.col("vec_id")).alias("vec_id"), "embedding"
    )
    return emb.unionByName(twins)


def _sem_cents(spark, sf_dir):
    if sf_dir not in _SEM_MEMO:
        cents = simsearch.kmeans_centroids(_sem_planted(spark, sf_dir))
        _SEM_MEMO[sf_dir] = (cents.collect(), cents.schema)
    rows, schema = _SEM_MEMO[sf_dir]
    return spark.createDataFrame(rows, schema)


@query(
    "emb_semdedup",
    oracle=f"""
    WITH {_SEM_CTE},
    {_IVF_CTE},
    seme AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(range(1, {D + 1}),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
               AS nrm
      FROM emb2
    ),
    semside AS (
      SELECT e.vec_id, e.embedding, e.nrm, c.cell
      FROM seme e JOIN cells c USING (vec_id)
    ),
    semdrop AS (
      SELECT DISTINCT c.vec_id
      FROM semside a JOIN semside c
        ON a.cell = c.cell AND a.vec_id < c.vec_id
      WHERE CAST(floor({_SEM_PAIR_COS} + 0.5) AS BIGINT)
            >= {simsearch.SEMDEDUP_TAU_1E6}
    )
    SELECT s.vec_id, CAST(s.cell AS BIGINT) AS cell,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM semside s LEFT JOIN semdrop d ON d.vec_id = s.vec_id
    """,
)
def emb_semdedup(spark, sf_dir):
    """SemDeDup over the planted-twin corpus: trained-cell-local exact
    cosine, keep-lowest drop rule — exactly the ten twins drop
    (operators/simsearch.py semantic_dedup)."""
    return simsearch.semantic_dedup(
        _sem_planted(spark, sf_dir), cents=_sem_cents(spark, sf_dir)
    )


# --- approximate DBSCAN gate ------------------------------------------

_DB_EPS = simsearch.DBSCAN_EPS_1E6
_DB_MP = simsearch.DBSCAN_MIN_PTS


@query(
    "emb_dbscan",
    oracle=f"""
    WITH RECURSIVE {_E_CTE},
    {_buckets_cte(_ND_BITS)},
    dbside AS (SELECT e.vec_id, e.embedding, e.nrm, b.bucket
               FROM e JOIN b USING (vec_id)),
    dbokb AS (SELECT bucket FROM b GROUP BY bucket
              HAVING count(*) <= {simsearch.NEAR_DUP_MAX_BUCKET}),
    dbp AS (
      SELECT a.vec_id AS va, c.vec_id AS vb
      FROM dbside a
      JOIN dbokb ON dbokb.bucket = a.bucket
      JOIN dbside c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      WHERE CAST(floor({_PAIR_COS} + 0.5) AS BIGINT) >= {_DB_EPS}
    ),
    dbsym AS (SELECT va AS v, vb AS u FROM dbp UNION ALL SELECT vb, va FROM dbp),
    dbdeg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM dbsym GROUP BY v),
    dbroles AS (
      SELECT e.vec_id, coalesce(d.deg, 0) + 1 >= {_DB_MP} AS is_core
      FROM e LEFT JOIN dbdeg d ON d.v = e.vec_id
    ),
    dbcore AS (SELECT vec_id FROM dbroles WHERE is_core),
    dbce AS (
      SELECT s.v, s.u FROM dbsym s
      JOIN dbcore a ON a.vec_id = s.v
      JOIN dbcore b ON b.vec_id = s.u
    ),
    dbbase AS (SELECT DISTINCT v AS a, v AS b FROM dbce
               UNION SELECT v, u FROM dbce),
    dbreach(a, b) AS (
      SELECT a, b FROM dbbase
      UNION
      SELECT r.a, s.u FROM dbreach r JOIN dbce s ON r.b = s.v
    ),
    dbcomp AS (SELECT a AS vec_id, min(b) AS component FROM dbreach GROUP BY a),
    dbcc AS (
      SELECT c.vec_id,
             CAST(coalesce(k.component, c.vec_id) AS BIGINT) AS cluster
      FROM dbcore c LEFT JOIN dbcomp k ON k.vec_id = c.vec_id
    ),
    dbbord AS (
      SELECT s.v AS vec_id, CAST(min(cc.cluster) AS BIGINT) AS bcluster
      FROM dbsym s JOIN dbcc cc ON cc.vec_id = s.u GROUP BY s.v
    )
    SELECT r.vec_id,
           CASE WHEN r.is_core THEN 'core'
                WHEN bo.bcluster IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(coalesce(cc.cluster, bo.bcluster, -1) AS BIGINT) AS cluster
    FROM dbroles r
    LEFT JOIN dbcc cc ON cc.vec_id = r.vec_id
    LEFT JOIN dbbord bo ON bo.vec_id = r.vec_id
    """,
)
def emb_dbscan(spark, sf_dir):
    """Approximate DBSCAN over the LSH eps-neighbor graph: core/
    border/noise roles + min-core-id clusters, composed entirely from
    gated primitives (operators/simsearch.py dbscan_approx)."""
    return simsearch.dbscan_approx(_emb(spark, sf_dir))
