"""Mergeable cardinality / frequency sketches: HyperLogLog distinct
counting and Count-Min frequency estimation, exact-integer and
oracle-reproducible.

Why these belong in the engine: the reference pipeline's corpus stats
are exact aggregations (utils/data.py vocabulary builds, counter
passes) — fine at its single-machine corpus scale, but at the north
rule's web scale "how many distinct tokens / URLs / entities per
stratum" is the canonical sketch workload. An exact
``count(distinct x)`` shuffles EVERY distinct item; an HLL register
table is 256 bigints per group, built with map-side partial
aggregation (``groupBy(key, register) max(rho)`` combines inside each
partition before the shuffle), and is MERGEABLE: registers from two
corpus shards / crawl snapshots / streaming micro-batches combine by
element-wise max into exactly the sketch of the union — the property
``sk_hll_merge`` pins cross-engine and ``test_sketches.py`` pins as an
algebraic invariant. Count-Min is the same story for frequencies: a
d x w counter grid (4 x 512 here) answers "estimated count of any
token" with one-sided error (est >= true, overestimate bounded by
n/w per row, min over d rows), without materializing the full
vocabulary — the heavy-hitter primitive for stop-list construction,
skew-key detection (plans/skew.py consumers), and frequency-capped
sampling at corpus scale.

Determinism contract (the repo-wide pattern — cf. operators/pagerank.py,
operators/dedup.py): every hash is the portable 60-bit md5 prefix
(functions/hashing.py), every arithmetic step is int64 with truncating
division, so the DuckDB oracle reproduces registers, counters, AND the
final estimates bit-for-bit. The one float in textbook HLL — the
harmonic mean E = alpha * m^2 / sum(2^-M_j) — is restated in integers:

    S   = sum_j 2^(31 - M_j)           (M_j in [0, 31]; empty => 2^31)
    T   = 2^47 DIV S                   (m^2 * 2^31 = 2^47 for m = 256)
    est = (ALPHA_1E6 * T) DIV 10^6     (alpha_256 = 0.7213/(1+1.079/256))

S <= 256 * 2^31 = 2^39 and ALPHA_1E6 * T <= 7.2e5 * 2^39 < 2^63, so
everything stays in exact int64. rho (leading-zero rank of the low 30
hash bits) avoids float log2 via string length: both engines' ``bin()``
render integers without leading zeros, so bitlen(w) = length(bin(w))
and rho = 31 - bitlen(w), CASE-guarded at w = 0 (rho = 31).

Small-range (linear-counting) correction without engine-divergent
floats: textbook HLL switches to m * ln(m / V) (V = empty registers)
when the raw estimate is below 2.5 * m — ln() is float, so instead the
255 possible corrected values are precomputed ONCE driver-side
(``_LC_LUT``) and embedded as an integer array literal in BOTH the
Spark plan and the DuckDB oracle. Neither engine ever evaluates a
float: the correction is a 1-based array lookup by ``v_zero``, guarded
by the integer condition ``v_zero > 0 AND raw <= 640``. Production
knob: raise HLL_P for tighter error (1.04/sqrt(2^p)).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_col

# --- HyperLogLog ------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 registers; rel. error ~ 1.04/sqrt(256) = 6.5%
HLL_M = 1 << HLL_P
HLL_SEED = 71
ALPHA_1E6 = 718_272  # floor(1e6 * 0.7213 / (1 + 1.079/256))
_POW2_52 = 1 << 52  # top-8-of-60 register index divisor
_POW2_30 = 1 << 30  # low 30 bits form the rank word
_POW2_31 = 1 << 31
_POW2_47 = 1 << 47  # m^2 * 2^31

# Linear-counting lookup: _LC_LUT[v - 1] = round(m * ln(m / v)) for
# v in [1, 255] empty registers. Computed once here (the only float in
# the module, evaluated driver-side at import) and shipped to both
# engines as a literal — cross-engine exact by construction.
_LC_LUT = [int(round(HLL_M * math.log(HLL_M / v))) for v in range(1, HLL_M)]
LC_THRESHOLD = 5 * HLL_M // 2  # 2.5 * m, the standard regime switch
LC_LUT_SPARK = "array(" + ",".join(f"{x}L" for x in _LC_LUT) + ")"
LC_LUT_DUCK = "[" + ",".join(f"CAST({x} AS BIGINT)" for x in _LC_LUT) + "]"

# Count-Min
CMS_D = 4
CMS_W = 512
CMS_SEED = 401


def _hll_idx_rho(item: Column) -> tuple[Column, Column]:
    """(register_index, rho) of one item under the portable hash."""
    h = phash_col(item, HLL_SEED)
    idx = F.shiftright(h, 52).cast("long")  # top 8 of the 60 hash bits
    w = h % F.lit(_POW2_30)
    rho = (
        F.when(w == 0, F.lit(31))
        .otherwise(F.lit(31) - F.length(F.bin(w)))
        .cast("long")
    )
    return idx.alias("reg_idx"), rho.alias("rho")


def hll_registers(items: DataFrame, key: str, item: str) -> DataFrame:
    """(key, reg_idx, reg_max): the HLL register table per group.

    One aggregation: map-side partial max per (key, reg_idx) inside each
    scan partition, then a register-table-sized shuffle — per group at
    most 256 rows regardless of item count. This IS the sketch: constant
    size, mergeable by max, the state a 1000-executor distinct-count
    carries instead of the items themselves.
    """
    idx, rho = _hll_idx_rho(F.col(item))
    return (
        items.select(F.col(key), idx, rho)
        .groupBy(key, "reg_idx")
        .agg(F.max("rho").alias("reg_max"))
    )


def hll_estimate(registers: DataFrame, key: str) -> DataFrame:
    """(key, est_distinct, v_zero) from a register table.

    Integer-only raw HLL estimator (module docstring derivation);
    ``v_zero`` = empty registers, the small-range-regime indicator.
    """
    # shiftleft with a *column* bit count needs the SQL form (the Python
    # API only takes a literal int)
    s_present = F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(31 - reg_max AS INT))"))
    n_present = F.count("*")
    v_zero = (F.lit(HLL_M) - n_present).cast("long")
    s_total = (s_present + v_zero * F.lit(_POW2_31)).cast("long")
    agg = registers.groupBy(key).agg(
        v_zero.alias("v_zero"), s_total.alias("_s")
    )
    # truncating integer division (DIV) — float '/' + cast would round
    # across integer boundaries and diverge from the DuckDB '//' oracle
    raw = f"({ALPHA_1E6} * ({_POW2_47} DIV _s)) DIV 1000000"
    est = F.expr(
        f"CASE WHEN v_zero > 0 AND {raw} <= {LC_THRESHOLD} "
        f"THEN element_at({LC_LUT_SPARK}, CAST(v_zero AS INT)) "
        f"ELSE {raw} END"
    ).cast("long")
    return agg.select(F.col(key), est.alias("est_distinct"), "v_zero")


def hll_merge(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Element-wise max of two register tables = sketch of the union.

    The mergeability identity — what lets shard-local sketches combine
    on a coordinator (or across streaming micro-batches) without ever
    re-reading items. unionByName + one max-agg; both inputs are
    already register-table-sized.
    """
    return (
        a.unionByName(b)
        .groupBy(key, "reg_idx")
        .agg(F.max("reg_max").alias("reg_max"))
    )


def doc_tokens(docs: DataFrame) -> DataFrame:
    """(lang, token) whitespace tokens — the sketch gates' item stream.

    Plain split so the DuckDB oracle reproduces tokenization verbatim
    (string_split + empty filter); narrow scan->project->explode,
    no shuffle.
    """
    return (
        docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )


def doc_tokens_with_id(docs: DataFrame) -> DataFrame:
    """(doc_id, token) — the doc-keyed twin of doc_tokens, for gates
    that stratify the item stream by document residue."""
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )


def vocab_hll(docs: DataFrame) -> DataFrame:
    """(lang, est_distinct, true_distinct, v_zero): HLL vocabulary-size
    estimate per language stratum next to the exact count.

    The exact count exists only to make the gate self-evidencing at test
    scale — at 100 TB you run ONLY the sketch side (the exact branch is
    the shuffle the sketch exists to avoid).
    """
    toks = doc_tokens(docs)
    est = hll_estimate(hll_registers(toks, "lang", "token"), "lang")
    exact = toks.groupBy("lang").agg(
        F.countDistinct("token").alias("true_distinct")
    )
    return est.join(exact, "lang").select(
        "lang", "est_distinct", "true_distinct", "v_zero"
    )


def vocab_hll_merged(docs: DataFrame) -> DataFrame:
    """(lang, est_merged, est_full): estimate from merging per-half
    sketches (split by doc_id parity) vs the whole-corpus sketch.

    est_merged == est_full on every row is the mergeability proof the
    oracle hash-checks; the pytest asserts it algebraically.
    """
    toks_a = doc_tokens(docs.where(F.col("doc_id") % 2 == 0))
    toks_b = doc_tokens(docs.where(F.col("doc_id") % 2 == 1))
    merged = hll_merge(
        hll_registers(toks_a, "lang", "token"),
        hll_registers(toks_b, "lang", "token"),
        "lang",
    )
    est_m = hll_estimate(merged, "lang").select(
        "lang", F.col("est_distinct").alias("est_merged")
    )
    est_f = hll_estimate(
        hll_registers(doc_tokens(docs), "lang", "token"), "lang"
    ).select("lang", F.col("est_distinct").alias("est_full"))
    return est_m.join(est_f, "lang")


# --- Count-Min sketch -------------------------------------------------------


def cms_counters(items: DataFrame, item: str) -> DataFrame:
    """(row, bucket, cnt): the d x w Count-Min counter grid.

    Each item lands in one bucket per row (d independent seeded hashes);
    the grid is built in ONE aggregation over the d-exploded stream —
    map-side partials collapse each scan partition to <= d*w rows before
    the shuffle, so the shuffle moves counter grids, not items. Grid
    size is constant (2048 cells) no matter the corpus.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("crow"),
                (phash_col(F.col(item), CMS_SEED + j) % CMS_W).alias("bucket"),
            )
            for j in range(CMS_D)
        ]
    )
    return (
        items.select(F.explode(rows).alias("rb"))
        .select("rb.crow", "rb.bucket")
        .groupBy("crow", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(counters: DataFrame, candidates: DataFrame, item: str) -> DataFrame:
    """(item, est_cnt): point estimates for candidate items.

    est = min over the d rows of the counter each candidate hashes into.
    One-sided: est >= true count always; overestimate is collision mass,
    bounded in expectation by n/w per row. The candidate side is tiny
    (heavy-hitter shortlist), so the join broadcasts it.
    """
    probes = candidates.select(
        F.col(item),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("crow"),
                        (phash_col(F.col(item), CMS_SEED + j) % CMS_W).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("rb"),
    ).select(item, "rb.crow", "rb.bucket")
    return (
        counters.join(F.broadcast(probes), ["crow", "bucket"])
        .groupBy(item)
        .agg(F.min("cnt").alias("est_cnt"))
    )


def token_cms(docs: DataFrame) -> DataFrame:
    """(row, bucket, cnt) Count-Min grid over the corpus token stream."""
    return cms_counters(doc_tokens(docs).select("token"), "token")


def token_heavy_hitters(docs: DataFrame, k: int = 20) -> DataFrame:
    """(token, true_cnt, est_cnt): CMS estimates for the top-k true
    heavy hitters, est >= true by construction.

    The true counts exist for the same reason as vocab_hll's exact
    branch — gate evidence. A production heavy-hitter pass gets the
    shortlist from the grid itself (probe the distinct tokens of a
    sample) and never runs the full groupBy.
    """
    toks = doc_tokens(docs).select("token")
    true_cnt = toks.groupBy("token").agg(F.count("*").alias("true_cnt"))
    top = (
        true_cnt.orderBy(F.desc("true_cnt"), F.asc("token")).limit(k)
    )
    est = cms_estimate(token_cms(docs), top.select("token"), "token")
    return top.join(est, "token").select("token", "true_cnt", "est_cnt")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketches.
#
# HLL answers "how many distinct" but cannot intersect; the KMV sketch —
# the k smallest hash values of a set — additionally supports UNION
# (merge arrays, keep k smallest) and hence JACCARD between strata
# (Bar-Yossef et al. 2002; the DataSketches theta family): the bottom-k
# of A ∪ B is a uniform sample of the union, and the fraction of it
# present in both sketches estimates |A∩B| / |A∪B|. Everything below is
# exact-integer over the portable 60-bit hash, so oracles replay values
# bit-for-bit.

KMV_K = 128
KMV_SEED = 77
KMV_BKT_SHIFT = 48  # 60-bit hash >> 48 = 4096 value-range buckets


def kmv_sketch(items: DataFrame, key: str, item: str, k: int = KMV_K) -> DataFrame:
    """(key, r, hv): the k smallest distinct hash values per group,
    r = 1-based rank.

    Scale shape — the naive form (rank every distinct value per key,
    keep k) sorts ENTIRE per-key vocabularies through a window. Here the
    window only ever sees ~k survivors: distinct (key, hv) rows carry a
    value-range bucket (hv >> KMV_BKT_SHIFT); a per-key cumulative count
    over the ≤4096 bucket rows finds the bucket prefix that must contain
    the k minima ("cum_before < k" — same two-level discipline as
    build_vocab / token_budget_sample); only rows in kept buckets reach
    the ranking window. With uniform hashes the kept prefix carries
    O(k) rows per key regardless of vocabulary size."""
    d = (
        items.select(F.col(key), phash_col(F.col(item), KMV_SEED).alias("hv"))
        .distinct()
        .withColumn("bkt", F.shiftright("hv", KMV_BKT_SHIFT))
    )
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy(key)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep = (
        d.groupBy(key, "bkt")
        .agg(F.count("*").alias("_n"))
        .withColumn("_cb", F.coalesce(F.sum("_n").over(wcum), F.lit(0)))
        .where(F.col("_cb") < k)
        .select(key, "bkt")
    )
    wr = Window.partitionBy(key).orderBy("hv")
    return (
        d.join(F.broadcast(keep), [key, "bkt"])
        .withColumn("r", F.row_number().over(wr).cast("long"))
        .where(F.col("r") <= k)
        .select(key, "r", "hv")
    )


# 127 * 2^53 < 2^63: the estimator divides in a 7-bit-coarsened domain
# so (k-1) * numerator never overflows int64 (hv near 2^60 otherwise
# forces a 127 * 2^60 intermediate). Both engines coarsen identically.
_KMV_NUM_SHIFT = 7


def kmv_estimate(sk: DataFrame, key: str, k: int = KMV_K) -> DataFrame:
    """(key, n_sk, est_distinct): the KMV cardinality estimate
    (k-1) * H / h_(k) with H = 2^60 the hash space — exact count when the
    sketch holds the whole set (n_sk < k), the textbook unbiased
    estimator otherwise, in overflow-safe integer arithmetic."""
    h_space = 1 << (60 - _KMV_NUM_SHIFT)
    agg = sk.groupBy(key).agg(
        F.count("*").cast("long").alias("n_sk"),
        F.max(F.when(F.col("r") == k, F.col("hv"))).alias("_hk"),
    )
    return agg.select(
        key,
        "n_sk",
        F.expr(
            f"CAST(CASE WHEN n_sk < {k} THEN n_sk "
            f"ELSE ({k - 1} * CAST({h_space} AS BIGINT)) "
            f"     DIV (1 + (_hk DIV {1 << _KMV_NUM_SHIFT})) END AS BIGINT)"
        ).alias("est_distinct"),
    )


def kmv_pair_jaccard(sk: DataFrame, key: str, k: int = KMV_K) -> DataFrame:
    """(key_a, key_b, n_eval, n_both, jaccard_1e6) for every unordered
    key pair: the bottom-k of the MERGED sketch is a uniform sample of
    A ∪ B; the fraction of its values present in both input sketches
    estimates Jaccard (half-up micro-units).

    Pair expansion is sketch-grain — P pairs x ≤2k rows — so this is for
    stratum-level keys (languages, hosts, crawl snapshots), never
    item-grain; the corpus itself is touched only by kmv_sketch."""
    a = sk.select(F.col(key).alias("key_a"), "hv")
    b = sk.select(F.col(key).alias("key_b"), "hv")
    keys = sk.select(F.col(key).alias("key_a")).distinct()
    pairs = keys.join(
        keys.select(F.col("key_a").alias("key_b")),
        F.col("key_a") < F.col("key_b"),
    )
    ra = pairs.join(a, "key_a").select(
        "key_a", "key_b", "hv", F.lit(1).alias("_ia"), F.lit(0).alias("_ib")
    )
    rb = pairs.join(b, "key_b").select(
        "key_a", "key_b", "hv", F.lit(0).alias("_ia"), F.lit(1).alias("_ib")
    )
    u = (
        ra.unionByName(rb)
        .groupBy("key_a", "key_b", "hv")
        .agg(F.max("_ia").alias("_ia"), F.max("_ib").alias("_ib"))
    )
    from pyspark.sql.window import Window

    wr = Window.partitionBy("key_a", "key_b").orderBy("hv")
    topk = u.withColumn("_r", F.row_number().over(wr)).where(F.col("_r") <= k)
    return topk.groupBy("key_a", "key_b").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.col("_ia") * F.col("_ib")).cast("long").alias("n_both"),
        F.expr(
            "CAST((2 * 1000000 * sum(_ia * _ib) + count(*)) DIV (2 * count(*)) AS BIGINT)"
        ).alias("jaccard_1e6"),
    )


def cms_join_size(a_items: DataFrame, b_items: DataFrame, item: str) -> DataFrame:
    """(true_pairs, est_pairs): equi-join cardinality estimate from two
    Count-Min grids — the optimizer primitive for sizing a shuffle
    BEFORE running it (AMS/CMS inner-product estimator: |A ⋈ B| =
    Σ_v fA(v)·fB(v) ≈ min_d Σ_j cmsA[d][j]·cmsB[d][j]).

    One-sided like the point estimate (colliding keys only ADD mass),
    so est_pairs >= true_pairs always. Both grids are constant-size
    (d x w = 2048 cells): the dot products cost a grid-grain join —
    at 10^12 rows you build each grid in one pass (map-side combined)
    and the estimate itself is free. true_pairs is the exact
    Σ-of-products (one agg per side + one key join) for gate pinning;
    a production caller skips it."""
    ca = cms_counters(a_items, item)
    cb = cms_counters(b_items, item)
    dots = (
        ca.join(
            cb.select("crow", "bucket", F.col("cnt").alias("_cntb")),
            ["crow", "bucket"],
        )
        .groupBy("crow")
        .agg(F.sum(F.col("cnt") * F.col("_cntb")).alias("_dot"))
    )
    est = dots.agg(F.min("_dot").cast("long").alias("est_pairs"))
    fa = a_items.groupBy(item).agg(F.count("*").alias("_fa"))
    fb = b_items.groupBy(item).agg(F.count("*").alias("_fb"))
    true = (
        fa.join(fb, item)
        .agg(F.coalesce(F.sum(F.col("_fa") * F.col("_fb")), F.lit(0)).cast("long").alias("true_pairs"))
    )
    return true.crossJoin(est)


# ---------------------------------------------------------------------------
# AMS F2 sketch (Alon-Matias-Szegedy second frequency moment)
# ---------------------------------------------------------------------------
#
# F2 = sum_t c_t^2 is the exact self-join size on a key — the quantity
# a join planner wants BEFORE shuffling 10^12 rows. The AMS tug-of-war
# sketch estimates it from K counters: X_i = sum_t sign_i(t) * c_t with
# 4-wise-independent-ish signs (portable-hash parity here), E[X_i^2] =
# F2. Median-of-means over G groups bounds the error; everything is
# exact integer arithmetic both engines replay (the estimate is
# deterministic given the seed family, so the gate pins the SKETCH, and
# the exact F2 rides in the same row to keep the error visible).
#
# Scale shape: one (token) count aggregate, then a K-way explode of the
# VOCABULARY-grain counts (never the corpus), K partial sums = one tiny
# aggregate; the sketch is K longs, mergeable across shards by addition.

AMS_K = 16      # counters
AMS_G = 4       # median-of-means groups (K/G counters per group)
AMS_SEED = 877


def ams_counters(items: DataFrame, item: str) -> DataFrame:
    """(i, x) — the K tug-of-war counters over the item multiset:
    x_i = sum_t sign_i(t) * c_t, sign_i(t) = 1 - 2*(phash(t, seed+i)%2).
    One portable hash per (vocab item, counter)."""
    cnt = items.groupBy(item).agg(F.count("*").alias("c"))
    fanned = cnt.select(
        F.col(item).alias("_t"), "c",
        F.explode(F.array(*[F.lit(i) for i in range(AMS_K)])).alias("i"),
    )
    sign = F.lit(1) - 2 * (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("_t"),
                                  (F.lit(AMS_SEED) + F.col("i")).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % 2
    )
    return (
        fanned.select(F.col("i").cast("long").alias("i"),
                      (sign * F.col("c")).alias("sx"))
        .groupBy("i")
        .agg(F.sum("sx").cast("long").alias("x"))
    )


def ams_f2_estimate(items: DataFrame, item: str) -> DataFrame:
    """(f2_exact, f2_ams, rel_err_1e6) — median-of-means AMS estimate
    next to the exact second moment. Group means over K/G counters,
    median of the G means = mean of the two middle order statistics
    (G = 4, pinned), all half-up integers."""
    cnt = items.groupBy(item).agg(F.count("*").alias("c"))
    exact = cnt.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    per_g = AMS_K // AMS_G
    grp = (
        ams_counters(items, item)
        .select((F.col("i") % AMS_G).alias("g"), (F.col("x") * F.col("x")).alias("x2"))
        .groupBy("g")
        .agg(
            F.expr(f"CAST((2 * sum(x2) + {per_g}) DIV (2 * {per_g}) AS BIGINT)")
            .alias("m")
        )
    )
    # median of the 4 group means = mean of the two middle order stats
    from pyspark.sql import Window

    ranked = grp.select(
        "m", F.row_number().over(Window.orderBy("m", "g")).alias("rnk")
    )
    med = ranked.agg(
        F.expr(
            "CAST((2 * (sum(CASE WHEN rnk IN (2, 3) THEN m ELSE 0 END)) + 2)"
            " DIV 4 AS BIGINT)"
        ).alias("f2_ams")
    )
    return exact.crossJoin(med).select(
        "f2_exact", "f2_ams",
        F.expr(
            "CAST((2 * abs(f2_ams - f2_exact) * 1000000 + f2_exact)"
            " DIV (2 * f2_exact) AS BIGINT)"
        ).alias("rel_err_1e6"),
    )


# --- priority sampling (Duffield-Lund-Thorup, JACM 2007) --------------------

PS_K = 8
PS_SEED = 907
PS_M = 1 << 20  # hash-uniform denominator


def priority_sample(weighted: DataFrame, k: int = PS_K) -> DataFrame:
    """(item, w, u, prio, in_sample, est) — priority sampling: the
    k-item weighted sample whose per-item estimator
    ``est = max(w, tau)`` (tau = the (k+1)-th priority) makes ANY
    subset-sum unbiasedly estimable from the sample alone — the DLT
    result that one extra sample slot buys near-optimal variance
    (Szegedy 2006). THE way to keep a tiny weighted representative of
    a huge keyed aggregate (host traffic, entity evidence) that still
    answers group-sum queries.

    Pinned integer formulation: u = portable_hash(item) % M + 1 (a
    uniform integer in [1, M]); priority = (w * M) DIV u — the integer
    surrogate of the classical q = w/u' with u' = u/M uniform in
    (0, 1], identical on both engines (the truncation perturbs ranks
    only where true priorities are within one part in M, and BOTH
    engines truncate identically, so the schedule is deterministic);
    tau = the (k+1)-th largest priority (ties broken by item id);
    in_sample = rank <= k; est = greatest(w, tau) inside the sample,
    0 outside. Items with w >= tau are "certainties" and carry their
    exact weight — the DLT structural property pytest pins.

    Shape: one rank window over the ITEM-grain weight table (items =
    groups, already aggregated — tiny relative to data), tau folded
    back by broadcast; nothing touches the underlying data twice.
    ``weighted`` must carry columns (item, w)."""
    from hebrew_ner_spark.functions.hashing import phash_col

    from pyspark.sql import Window

    pr = weighted.select(
        "item",
        F.col("w").cast("long").alias("w"),
        (phash_col(F.col("item").cast("string"), PS_SEED) % PS_M + 1)
        .cast("long")
        .alias("u"),
    ).select(
        "item",
        "w",
        "u",
        F.expr(f"(w * {PS_M}) DIV u").cast("long").alias("prio"),
    )
    ranked = pr.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("prio"), F.asc("item"))),
    )
    # tau as a 1-row AGGREGATE, not a filtered row: when the universe
    # has <= k items no (k+1)-th priority exists and a where(rk == k+1)
    # table would be EMPTY — the broadcast crossJoin below would then
    # annihilate every row (a silently wrong empty sample). DLT defines
    # this regime as tau = 0 with every item a certainty (est = w),
    # which coalesce gives exactly (ADVICE r4).
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == k + 1, F.col("prio"))), F.lit(0)
        )
        .cast("long")
        .alias("tau")
    )
    return (
        ranked.crossJoin(F.broadcast(tau))
        .select(
            "item",
            "w",
            "u",
            "prio",
            (F.col("rk") <= k).cast("long").alias("in_sample"),
            F.when(
                F.col("rk") <= k, F.greatest(F.col("w"), F.col("tau"))
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("est"),
        )
    )


def host_weights(docs: DataFrame) -> DataFrame:
    """(item, w) — documents per host, the weighted universe for the
    priority-sample gate."""
    return docs.groupBy(
        (F.col("doc_id") % 64).cast("long").alias("item")
    ).agg(F.count("*").cast("long").alias("w"))
