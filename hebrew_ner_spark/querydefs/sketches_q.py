"""Sketch queries + DuckDB oracles (HyperLogLog cardinality, Count-Min
frequency).

Every estimate is exact-integer (operators/sketches.py docstring), so the
oracles replay registers, counter grids, and the final estimates
bit-for-bit: the same portable 60-bit md5 hash, ``>>`` / ``//`` integer
steps, and bitlen-via-``bin()`` rho on both engines.

``sk_hll_merge``'s oracle exploits the mergeability identity instead of
re-deriving both branches: max-of-partition-maxes IS the global max, so
the union sketch of the doc_id-parity halves equals the whole-corpus
sketch, and the oracle emits the direct whole-corpus estimate under BOTH
column names. The gate therefore asserts Spark's merge path == Spark's
direct path == DuckDB's direct computation in one hash; the algebraic
identity is additionally pytest-pinned (tests/test_sketches.py) so a
broken merge cannot hide behind a broken direct path.
"""

from __future__ import annotations

from hebrew_ner_spark.operators import sketches
from hebrew_ner_spark.operators.sketches import (
    ALPHA_1E6,
    CMS_D,
    CMS_SEED,
    CMS_W,
    HLL_M,
    HLL_SEED,
    LC_LUT_DUCK,
    LC_THRESHOLD,
)
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_POW2_30 = 1 << 30
_POW2_31 = 1 << 31
_POW2_47 = 1 << 47


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# (lang, token) item stream — identical to sketches.doc_tokens
_TOKS = """
    SELECT lang, t.token
    FROM documents, LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
    WHERE t.token <> ''
"""

# (lang, reg_idx, rho) under the portable hash; h >> 52 = top 8 of 60
# bits, rho = leading-zero rank of the low 30 bits
_HLL_ROWS = f"""
    SELECT lang,
           h >> 52 AS reg_idx,
           CAST(CASE WHEN h % {_POW2_30} = 0 THEN 31
                     ELSE 31 - length(bin(h % {_POW2_30})) END AS BIGINT) AS rho
    FROM (SELECT lang,
                 CAST(concat('0x', substr(md5(token || ':{HLL_SEED}'), 1, 15)) AS BIGINT) AS h
          FROM toks)
"""

_HLL_REGS = f"""
    SELECT lang, reg_idx, max(rho) AS reg_max
    FROM ({_HLL_ROWS}) GROUP BY lang, reg_idx
"""

# integer HLL estimate (raw + LUT linear-counting correction) from a
# register table named `regs`
_RAW = f"CAST(({ALPHA_1E6} * ({_POW2_47} // s)) // 1000000 AS BIGINT)"
_HLL_EST = f"""
    SELECT lang,
           CAST(CASE WHEN v_zero > 0 AND {_RAW} <= {LC_THRESHOLD}
                     THEN ({LC_LUT_DUCK})[CAST(v_zero AS INT)]
                     ELSE {_RAW} END AS BIGINT) AS est_distinct,
           v_zero
    FROM (SELECT lang,
                 CAST({HLL_M} - count(*) AS BIGINT) AS v_zero,
                 CAST(sum(CAST(1 AS BIGINT) << CAST(31 - reg_max AS INT))
                      + ({HLL_M} - count(*)) * CAST({_POW2_31} AS BIGINT) AS BIGINT) AS s
          FROM regs GROUP BY lang)
"""


@query(
    "sk_hll_registers",
    oracle=f"""
    WITH toks AS ({_TOKS})
    {_HLL_REGS}
    """,
)
def sk_hll_registers(spark, sf_dir):
    """The HLL register table itself — the sketch's entire state, pinned
    value-by-value so estimate bugs can't hide in the fold."""
    return sketches.hll_registers(
        sketches.doc_tokens(_docs(spark, sf_dir)), "lang", "token"
    )


@query(
    "sk_hll_estimate",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    regs AS ({_HLL_REGS}),
    est AS ({_HLL_EST}),
    exact AS (SELECT lang, CAST(count(DISTINCT token) AS BIGINT) AS true_distinct
              FROM toks GROUP BY lang)
    SELECT est.lang, est.est_distinct, exact.true_distinct, est.v_zero
    FROM est JOIN exact USING (lang)
    """,
)
def sk_hll_estimate(spark, sf_dir):
    """Integer raw-HLL vocabulary-size estimate per language, alongside
    the exact distinct count it approximates."""
    return sketches.vocab_hll(_docs(spark, sf_dir))


@query(
    "sk_hll_merge",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    regs AS ({_HLL_REGS}),
    est AS ({_HLL_EST})
    SELECT lang, est_distinct AS est_merged, est_distinct AS est_full FROM est
    """,
)
def sk_hll_merge(spark, sf_dir):
    """Mergeability: per-half sketches (doc_id parity) max-merged must
    estimate exactly what the whole-corpus sketch estimates."""
    return sketches.vocab_hll_merged(_docs(spark, sf_dir))


# (crow, bucket) per token per CMS row j — seeds CMS_SEED..CMS_SEED+d-1
_CMS_GRID = f"""
    SELECT CAST(j AS BIGINT) AS crow,
           CAST(concat('0x', substr(md5(token || ':' || CAST({CMS_SEED} + j AS VARCHAR)), 1, 15))
                AS BIGINT) % {CMS_W} AS bucket
    FROM toks, LATERAL (SELECT unnest(range(0, {CMS_D})) AS j)
"""

_CMS_COUNTERS = f"""
    SELECT crow, bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM ({_CMS_GRID}) GROUP BY crow, bucket
"""


@query(
    "sk_cms_counters",
    oracle=f"""
    WITH toks AS ({_TOKS})
    {_CMS_COUNTERS}
    """,
)
def sk_cms_counters(spark, sf_dir):
    """The full d x w Count-Min grid (<= 2048 cells), value-pinned."""
    return sketches.token_cms(_docs(spark, sf_dir))


@query(
    "sk_cms_heavy",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    cms AS ({_CMS_COUNTERS}),
    tc AS (SELECT token, CAST(count(*) AS BIGINT) AS true_cnt FROM toks GROUP BY token),
    top AS (SELECT token, true_cnt FROM tc ORDER BY true_cnt DESC, token ASC LIMIT 20),
    probe AS (
      SELECT token, CAST(j AS BIGINT) AS crow,
             CAST(concat('0x', substr(md5(token || ':' || CAST({CMS_SEED} + j AS VARCHAR)), 1, 15))
                  AS BIGINT) % {CMS_W} AS bucket
      FROM top, LATERAL (SELECT unnest(range(0, {CMS_D})) AS j)
    ),
    est AS (SELECT token, min(cnt) AS est_cnt
            FROM probe JOIN cms USING (crow, bucket) GROUP BY token)
    SELECT top.token, top.true_cnt, est.est_cnt
    FROM top JOIN est USING (token)
    """,
)
def sk_cms_heavy(spark, sf_dir):
    """CMS point estimates for the top-20 true heavy hitters; one-sided
    (est_cnt >= true_cnt) with collision mass bounded by n/w per row."""
    return sketches.token_heavy_hitters(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# KMV bottom-k gates. Oracles replay sketch, estimate, and pairwise
# Jaccard bit-for-bit via ranked windows over the portable hash — the
# Spark side reaches the same rows through the bucket-prefix pruning, so
# the two-level shortcut is value-pinned against the naive construction.
# CTE names are kmv-prefixed.

from hebrew_ner_spark.operators.sketches import (  # noqa: E402
    _KMV_NUM_SHIFT,
    KMV_K,
    KMV_SEED,
)

_KMV_SKETCH = f"""
kmvd AS (
  SELECT DISTINCT lang,
         CAST(concat('0x', substr(md5(token || ':{KMV_SEED}'), 1, 15)) AS BIGINT) AS hv
  FROM toks),
kmvs AS (
  SELECT lang, r, hv FROM (
    SELECT lang, hv,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY hv) AS BIGINT) AS r
    FROM kmvd)
  WHERE r <= {KMV_K})
"""


@query(
    "sk_kmv_sketch",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    {_KMV_SKETCH}
    SELECT lang, r, hv FROM kmvs
    """,
)
def sk_kmv_sketch(spark, sf_dir):
    """Bottom-k distinct-token sketch per language stratum; the ranking
    window sees only the bucket-prefix survivors (~k rows per key), not
    the vocabulary."""
    return sketches.kmv_sketch(
        sketches.doc_tokens(_docs(spark, sf_dir)), "lang", "token"
    )


@query(
    "sk_kmv_estimate",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    {_KMV_SKETCH}
    SELECT lang, CAST(count(*) AS BIGINT) AS n_sk,
           CAST(CASE WHEN count(*) < {KMV_K} THEN count(*)
                ELSE ({KMV_K - 1} * CAST({1 << (60 - _KMV_NUM_SHIFT)} AS BIGINT))
                     // (1 + (max(CASE WHEN r = {KMV_K} THEN hv END)
                              // {1 << _KMV_NUM_SHIFT}))
                END AS BIGINT) AS est_distinct
    FROM kmvs GROUP BY lang
    """,
)
def sk_kmv_estimate(spark, sf_dir):
    """(k-1)·H/h_(k) cardinality estimate per stratum — exact when the
    sketch holds the whole set, overflow-safe coarsened division
    otherwise."""
    sk = sketches.kmv_sketch(
        sketches.doc_tokens(_docs(spark, sf_dir)), "lang", "token"
    )
    return sketches.kmv_estimate(sk, "lang")


@query(
    "sk_kmv_jaccard",
    oracle=f"""
    WITH toks AS ({_TOKS}),
    {_KMV_SKETCH},
    kmvp AS (
      SELECT a.lang AS key_a, b.lang AS key_b
      FROM (SELECT DISTINCT lang FROM kmvs) a
      JOIN (SELECT DISTINCT lang FROM kmvs) b ON a.lang < b.lang),
    kmvu AS (
      SELECT key_a, key_b, hv, max(ia) AS ia, max(ib) AS ib FROM (
        SELECT p.key_a, p.key_b, s.hv, 1 AS ia, 0 AS ib
        FROM kmvp p JOIN kmvs s ON s.lang = p.key_a
        UNION ALL
        SELECT p.key_a, p.key_b, s.hv, 0, 1
        FROM kmvp p JOIN kmvs s ON s.lang = p.key_b
      ) GROUP BY key_a, key_b, hv),
    kmvt AS (
      SELECT key_a, key_b, ia, ib,
             row_number() OVER (PARTITION BY key_a, key_b ORDER BY hv) AS r
      FROM kmvu)
    SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(ia * ib) AS BIGINT) AS n_both,
           CAST((2 * 1000000 * sum(ia * ib) + count(*))
                // (2 * count(*)) AS BIGINT) AS jaccard_1e6
    FROM kmvt WHERE r <= {KMV_K} GROUP BY key_a, key_b
    """,
)
def sk_kmv_jaccard(spark, sf_dir):
    """Pairwise vocabulary-overlap estimate between language strata from
    merged bottom-k sketches — the set-intersection capability HLL
    lacks; pair expansion is sketch-grain, never corpus-grain."""
    sk = sketches.kmv_sketch(
        sketches.doc_tokens(_docs(spark, sf_dir)), "lang", "token"
    )
    return sketches.kmv_pair_jaccard(sk, "lang")


# Join-size estimation: grids over the doc-parity halves of the token
# stream; est = min-row dot product, true = exact sum of count products.
# CTE names are cj-prefixed.
def _cj_grid(toks_cte: str) -> str:
    return f"""
    SELECT crow, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
      SELECT CAST(j AS BIGINT) AS crow,
             CAST(concat('0x', substr(md5(token || ':' || CAST({CMS_SEED} + j AS VARCHAR)), 1, 15))
                  AS BIGINT) % {CMS_W} AS bucket
      FROM {toks_cte}, LATERAL (SELECT unnest(range(0, {CMS_D})) AS j)
    ) GROUP BY crow, bucket
    """


@query(
    "sk_cms_join_est",
    oracle=f"""
    WITH cjtoka AS (
      SELECT t.token FROM documents,
             LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
      WHERE t.token <> '' AND doc_id % 2 = 0),
    cjtokb AS (
      SELECT t.token FROM documents,
             LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
      WHERE t.token <> '' AND doc_id % 2 = 1),
    cjga AS ({_cj_grid("cjtoka")}),
    cjgb AS ({_cj_grid("cjtokb")}),
    cjdot AS (
      SELECT a.crow, sum(a.cnt * b.cnt) AS dot
      FROM cjga a JOIN cjgb b ON a.crow = b.crow AND a.bucket = b.bucket
      GROUP BY a.crow),
    cjest AS (SELECT CAST(min(dot) AS BIGINT) AS est_pairs FROM cjdot),
    cjfa AS (SELECT token, count(*) AS fa FROM cjtoka GROUP BY token),
    cjfb AS (SELECT token, count(*) AS fb FROM cjtokb GROUP BY token),
    cjtrue AS (SELECT CAST(coalesce(sum(fa * fb), 0) AS BIGINT) AS true_pairs
               FROM cjfa JOIN cjfb USING (token))
    SELECT true_pairs, est_pairs FROM cjtrue, cjest
    """,
)
def sk_cms_join_est(spark, sf_dir):
    """Equi-join cardinality estimate from two Count-Min grids (the
    pre-shuffle sizing primitive): one-sided min-row inner product vs
    the exact Σ fA·fB — grids are constant-size, the estimate costs a
    2048-cell join."""
    from pyspark.sql import functions as F

    toks = sketches.doc_tokens_with_id(_docs(spark, sf_dir))
    a = toks.where(F.col("doc_id") % 2 == 0).select("token")
    b = toks.where(F.col("doc_id") % 2 == 1).select("token")
    return sketches.cms_join_size(a, b, "token")


# ---------------------------------------------------------------------------
# AMS F2 (tug-of-war second-moment / self-join-size estimate)
# ---------------------------------------------------------------------------

_AMS_CNT = f"""
    SELECT token, CAST(count(*) AS BIGINT) AS c FROM ({_TOKS}) GROUP BY token
"""

_AMS_X = f"""
    SELECT CAST(i AS BIGINT) AS i, CAST(sum((1 - 2 * (CAST(concat('0x',
                 substr(md5(token || ':' || CAST({sketches.AMS_SEED} + i
                                               AS VARCHAR)), 1, 15))
               AS BIGINT) % 2)) * c) AS BIGINT) AS x
    FROM cnt, unnest(range(0, {sketches.AMS_K})) AS u(i)
    GROUP BY i
"""


@query(
    "sk_ams_counters",
    oracle=f"""
    WITH cnt AS ({_AMS_CNT})
    {_AMS_X}
    """,
)
def sk_ams_counters(spark, sf_dir):
    """The K tug-of-war counters — the entire mergeable sketch state
    (K longs; shard sketches merge by addition)."""
    return sketches.ams_counters(
        sketches.doc_tokens(_docs(spark, sf_dir)), "token"
    )


@query(
    "sk_ams_f2",
    oracle=f"""
    WITH cnt AS ({_AMS_CNT}),
    xs AS ({_AMS_X}),
    grp AS (
      SELECT i % {sketches.AMS_G} AS g,
             (2 * sum(x * x) + {sketches.AMS_K // sketches.AMS_G})
               // (2 * {sketches.AMS_K // sketches.AMS_G}) AS m
      FROM xs GROUP BY 1
    ),
    rk AS (SELECT m, row_number() OVER (ORDER BY m, g) AS rnk FROM grp),
    med AS (
      SELECT CAST((2 * sum(CASE WHEN rnk IN (2, 3) THEN m ELSE 0 END) + 2)
                  // 4 AS BIGINT) AS f2_ams
      FROM rk
    ),
    ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM cnt)
    SELECT f2_exact, f2_ams,
           CAST((2 * abs(f2_ams - f2_exact) * 1000000 + f2_exact)
                // (2 * f2_exact) AS BIGINT) AS rel_err_1e6
    FROM ex, med
    """,
)
def sk_ams_f2(spark, sf_dir):
    """Median-of-means AMS estimate of the token self-join size next to
    the exact F2 — the join-size planning sketch; the estimate is
    deterministic under the seed family so the gate pins the sketch
    arithmetic and the error stays visible in-row."""
    return sketches.ams_f2_estimate(
        sketches.doc_tokens(_docs(spark, sf_dir)), "token"
    )


from hebrew_ner_spark.functions.hashing import phash_duck as _ps_phd  # noqa: E402
from hebrew_ner_spark.operators.sketches import (  # noqa: E402
    PS_K as _PS_K,
    PS_M as _PS_M,
    PS_SEED as _PS_SEED,
)

_PS_H = _ps_phd("CAST(item AS VARCHAR)", _PS_SEED)


@query(
    "sk_priority_sample",
    oracle=f"""
    WITH psw AS (
      SELECT CAST(doc_id % 64 AS BIGINT) AS item,
             CAST(count(*) AS BIGINT) AS w
      FROM documents GROUP BY 1
    ),
    psp AS (
      SELECT item, w, ({_PS_H}) % {_PS_M} + 1 AS u,
             CAST((w * {_PS_M}) // (({_PS_H}) % {_PS_M} + 1) AS BIGINT) AS prio
      FROM psw
    ),
    psr AS (
      SELECT item, w, u, prio,
             row_number() OVER (ORDER BY prio DESC, item ASC) AS rk
      FROM psp
    ),
    pst AS (SELECT prio AS tau FROM psr WHERE rk = {_PS_K + 1})
    SELECT r.item, r.w, CAST(r.u AS BIGINT) AS u, r.prio,
           CAST(CASE WHEN r.rk <= {_PS_K} THEN 1 ELSE 0 END AS BIGINT)
             AS in_sample,
           CAST(CASE WHEN r.rk <= {_PS_K} THEN greatest(r.w, t.tau)
                ELSE 0 END AS BIGINT) AS est
    FROM psr r CROSS JOIN pst t
    """,
)
def sk_priority_sample(spark, sf_dir):
    """Priority sampling (DLT): k-item weighted host sample with the
    max(w, tau) subset-sum estimator, deterministic by pinned hash
    (operators/sketches.py priority_sample)."""
    return sketches.priority_sample(
        sketches.host_weights(_docs(spark, sf_dir))
    )
