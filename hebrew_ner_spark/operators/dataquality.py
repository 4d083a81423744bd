"""Data-quality validation suite (expectations/constraint checks — the
Deequ/Great-Expectations capability): uniqueness, not-null, range,
value-set, and referential-integrity rules evaluated as exact counts,
reported long-form per rule.

Why this is engine work: at 10^12 rows validation IS a Spark job —
every rule is one aggregate or one anti-join over the table, and the
report (a handful of rows) is what gates the pipeline stage (publish /
quarantine). The synthetic tables are constraint-clean by construction,
so the gate runs the suite twice: once over the clean table (every rule
passes — the zero-violation contract is itself checked) and once over a
deterministically corrupted twin whose planted violation counts both
engines derive from the portable hash.

Corruption precedence (a row's hash can select several corruptions;
the CASE chain pins one deterministic outcome both engines replay):
NULL custkey > orphan custkey; the other rules touch disjoint columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_col

DQ_SEED = 83
ORDER_STATUSES = ("F", "O", "P")


def corrupt_orders(orders: DataFrame) -> DataFrame:
    """The planted-violation twin: hash-selected rows get a NULL
    custkey (h%97), an orphan custkey (h%79), a negated total (h%89),
    an out-of-set status (h%101); rows with h%103 == 0 are DUPLICATED
    (unique-key violations)."""
    h = phash_col(F.col("o_orderkey").cast("string"), DQ_SEED)
    base = orders.select(
        "o_orderkey",
        F.when(h % 97 == 0, F.lit(None).cast("long"))
        .when(h % 79 == 0, F.col("o_custkey") + 1_000_000)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(h % 89 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(h % 101 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    dups = base.where(h % 103 == 0)
    return base.unionByName(dups)


def _rule_row(name: str, column: str, viol, total):
    return F.struct(
        F.lit(name).alias("rule"),
        F.lit(column).alias("column"),
        viol.cast("long").alias("n_violations"),
        total.cast("long").alias("n_rows"),
        F.when(viol == 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("ok"),
    )


def orders_quality_report(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(rule, column, n_violations, n_rows, ok) — the five-rule suite:

    * unique(o_orderkey)            duplicate-occurrence count
    * not_null(o_custkey)           NULL count
    * range(o_totalprice > 0)       non-positive count
    * in_set(o_orderstatus)         out-of-vocabulary count
    * fk(o_custkey -> customer)     orphan count (NULLs exempt — the
                                    not-null rule owns those)

    Each rule is one aggregate (uniqueness via a grouped count) or one
    broadcast anti-join; the report is rule-grain, never row-grain.
    """
    total = orders.agg(F.count("*").alias("n")).collect()[0]["n"]
    n = F.lit(int(total))
    dup = orders.groupBy("o_orderkey").agg(F.count("*").alias("c")).agg(
        F.coalesce(F.sum(F.expr("CASE WHEN c > 1 THEN c ELSE 0 END")), F.lit(0)).alias(
            "v"
        )
    )
    nul = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v")
    )
    rng = orders.agg(
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v")
    )
    st_set = ", ".join(f"'{s}'" for s in ORDER_STATUSES)
    enm = orders.agg(
        F.sum(
            F.expr(f"CASE WHEN o_orderstatus IN ({st_set}) THEN 0 ELSE 1 END")
        ).alias("v")
    )
    fk = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").alias("v"))
    )
    rows = [
        ("unique", "o_orderkey", dup),
        ("not_null", "o_custkey", nul),
        ("range_positive", "o_totalprice", rng),
        ("in_set", "o_orderstatus", enm),
        ("fk_customer", "o_custkey", fk),
    ]
    out = None
    for name, col, df in rows:
        r = df.select(
            _rule_row(name, col, F.col("v"), n).alias("r")
        ).select("r.*")
        out = r if out is None else out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Benford first-digit audit (data forensics)
# ---------------------------------------------------------------------------
#
# Organic money amounts follow Benford's law P(d) = log10(1 + 1/d);
# fabricated or corrupted columns don't — the classic forensic screen a
# 10^12-row financial fact table runs as one aggregate. The expected
# shares are pinned as exact 1e6 integers (they sum to exactly
# 1,000,000), the observed shares are half-up micro-units, and the
# deviation column makes the screen's verdict directly readable.
# First significant digit via CAST(cents AS STRING)[0] — no float log,
# identical in both engines.

BENFORD_1E6 = {
    1: 301_030, 2: 176_091, 3: 124_939, 4: 96_910, 5: 79_181,
    6: 66_947, 7: 57_992, 8: 51_153, 9: 45_757,
}


def benford_audit(df: DataFrame, amount_col: str) -> DataFrame:
    """(digit, n, share_1e6, benford_1e6, dev_1e6) over the positive
    integer-cents amounts of ``amount_col`` (a money double)."""
    lut = F.expr(
        "map(" + ", ".join(
            f"{d}, {v}L" for d, v in BENFORD_1E6.items()
        ) + ")"
    )
    cents = F.round(F.col(amount_col) * 100).cast("long")
    d = (
        df.select(cents.alias("_c"))
        .where(F.col("_c") > 0)
        .select(
            F.substring(F.col("_c").cast("string"), 1, 1).cast("long")
            .alias("digit")
        )
    )
    counts = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            F.expr("CAST((2 * n * 1000000 + _t) DIV (2 * _t) AS BIGINT)")
            .alias("share_1e6"),
            lut[F.col("digit")].alias("benford_1e6"),
        )
        .select(
            "digit", "n", "share_1e6", "benford_1e6",
            F.abs(F.col("share_1e6") - F.col("benford_1e6")).cast("long")
            .alias("dev_1e6"),
        )
    )


# ---------------------------------------------------------------------------
# Re-identification risk audit: k-anonymity / l-diversity
# ---------------------------------------------------------------------------
#
# Before a web-scale corpus (or its customer-side metadata) is released
# for training, the governance pass asks: does any quasi-identifier
# combination isolate fewer than k individuals, and do those classes
# carry diverse sensitive values? Both audits are ONE aggregate over
# the table — at 10^12 rows this is a groupBy on the QI columns with
# map-side partial aggregation; the report is class-grain (bounded by
# the QI domain product, metadata-sized), never row-grain.
#
# QI here: (nation, market segment, coarse balance band); sensitive
# attribute: the exact balance (cents). Bands use true floor() so
# negative balances band consistently in both engines.

K_ANON = 5
L_DIV = 3
ANON_BAND = 1000  # acctbal band width (currency units)


def k_anonymity_classes(customer: DataFrame) -> DataFrame:
    """(c_nationkey, c_mktsegment, bal_band, class_size, l_distinct,
    k_risky, l_risky) — one row per occupied QI class."""
    band = F.floor(F.col("c_acctbal") / ANON_BAND).cast("long")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        customer.select(
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "c_mktsegment",
            band.alias("bal_band"),
            cents.alias("_cents"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(
            F.count("*").cast("long").alias("class_size"),
            F.countDistinct("_cents").cast("long").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "class_size",
            "l_distinct",
            F.when(F.col("class_size") < K_ANON, F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("k_risky"),
            F.when(F.col("l_distinct") < L_DIV, F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("l_risky"),
        )
    )


def anonymity_summary(classes: DataFrame) -> DataFrame:
    """(n_classes, k_risky_classes, records_at_risk, min_class_size,
    l_risky_classes) — the one-row release/quarantine verdict."""
    return classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("k_risky").cast("long").alias("k_risky_classes"),
        F.sum(F.col("k_risky") * F.col("class_size")).cast("long")
        .alias("records_at_risk"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.sum("l_risky").cast("long").alias("l_risky_classes"),
    )


# ---------------------------------------------------------------------------
# Tukey IQR fence outliers (robust per-group numeric screening)
# ---------------------------------------------------------------------------


def iqr_outliers(orders: DataFrame) -> DataFrame:
    """(o_orderpriority, n_rows, q1, q3, iqr, n_low, n_high) — classic
    1.5xIQR fence counts per priority over WHOLE-DOLLAR totals (the
    bounded-integer grain quantiles.exact_quantiles requires: the dollar
    histogram is capped by max price, corpus-size independent). Fences
    stay exact: v is an outlier iff 2*(v - q3) > 3*iqr (high) or
    2*(q1 - v) > 3*iqr (low) — cross-multiplied, no halves, no floats."""
    from hebrew_ner_spark.operators.quantiles import exact_quantiles

    base = orders.select(
        "o_orderpriority",
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT) DIV 100"
        ).alias("v"),
    )
    q = (
        exact_quantiles(base, "o_orderpriority", F.col("v"), [25, 75])
        .groupBy("o_orderpriority")
        .agg(
            F.max(F.when(F.col("q") == 25, F.col("v"))).alias("q1"),
            F.max(F.when(F.col("q") == 75, F.col("v"))).alias("q3"),
        )
    )
    return (
        base.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.first("q1").cast("long").alias("q1"),
            F.first("q3").cast("long").alias("q3"),
            (F.first("q3") - F.first("q1")).cast("long").alias("iqr"),
            F.sum(
                F.when(
                    2 * (F.col("q1") - F.col("v")) > 3 * (F.col("q3") - F.col("q1")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_low"),
            F.sum(
                F.when(
                    2 * (F.col("v") - F.col("q3")) > 3 * (F.col("q3") - F.col("q1")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_high"),
        )
    )


DP_SEED_A, DP_SEED_B = 271, 577


def _geometric_half(h):
    """Geometric(1/2) variate from a 60-bit hash in EXACT integer
    bit arithmetic: the count of trailing ones of h. P(G = k) =
    2^-(k+1) exactly (hash bits are uniform), computed portably as
    bitlen(h XOR (h+1)) - 1 — no logs, no floats."""
    return F.expr(
        f"CAST(length(bin({h} ^ ({h} + 1))) AS BIGINT) - 1"
    )


def dp_count_release(
    df: DataFrame, key_col: str, release_seeds: tuple[int, int]
) -> DataFrame:
    """(grp, true_count, noise, released) — epsilon = ln(2)
    differentially-private count release per group via SEEDED discrete
    Laplace noise: noise = G_a - G_b with G_* independent
    Geometric(1/2) variates derived from the group key's portable
    hash (difference of geometrics IS the discrete Laplace / two-sided
    geometric with p = 1/2, the exact mechanism for sensitivity-1
    counts at eps = ln 2; Ghosh-Roughgarden-Sundararajan 2009 show it
    universally optimal for counts).

    Determinism contract: production DP draws fresh randomness per
    release; the ENGINE surface gated here is the mechanism plumbing —
    exact integer noise generation from uniform bits, group-keyed
    application, no floats. ``release_seeds`` is therefore REQUIRED
    (no default, ADVICE r4): noise derived from (key, seed) is exactly
    invertible by anyone who knows the seed, so a pinned seed must be
    an explicit opt-in test configuration (the gate passes the module
    constants), never an ambient default a production caller could
    inherit. A real release must draw a fresh nonce per release — the
    per-release epsilon composes — and project true_count away
    (true_count rides in the output here as test surface only).

    Shape: one group count + two hash computations per GROUP row (not
    per data row) — the noise join is group-grain, the count map-side
    combinable."""
    from hebrew_ner_spark.functions.hashing import phash_sql_expr

    counts = df.groupBy(F.col(key_col).alias("grp")).agg(
        F.count("*").cast("long").alias("true_count")
    )
    seed_a, seed_b = release_seeds
    ha = phash_sql_expr("grp", int(seed_a))
    hb = phash_sql_expr("grp", int(seed_b))
    return counts.select(
        "grp",
        "true_count",
        (_geometric_half(ha) - _geometric_half(hb)).cast("long").alias("noise"),
    ).select(
        "grp",
        "true_count",
        "noise",
        (F.col("true_count") + F.col("noise")).cast("long").alias("released"),
    )


# --- two-sample Kolmogorov-Smirnov drift test -------------------------

KS_ALPHA_C2_1E6 = 1_844_164  # c(0.05)^2 = 1.358^2 in micro-units


def ks_two_sample(
    samples: DataFrame, pair_col: str = "pair", src_col: str = "src",
    val_col: str = "v",
) -> DataFrame:
    """(pair, n1, n2, d_num, d_den, ks_1e6, reject_05) — the exact
    two-sample Kolmogorov-Smirnov statistic per comparison pair, over a
    long-form input of (pair, src in {1, 2}, v BIGINT) observations.

    Exactness contract: D = max_x |F1(x) - F2(x)| is computed as the
    integer pair d_num = max |cum1 * n2 - cum2 * n1|, d_den = n1 * n2 —
    one groupBy on (pair, v), one per-pair ordered window for the two
    cumulative counts, one max aggregate. No floats until the DECISION,
    where both engines evaluate the identical double expression
    d_num^2 > c(alpha)^2 * (n1 + n2) * n1 * n2 (large-sample critical
    value, alpha = 0.05); the gate corpus sits far from the boundary on
    every pair, and d_num/d_den ride along so any flip is diagnosable.

    Shape at 10^12 rows: state is distinct-value grain per pair (the
    window sorts within pair only); n1/n2 are per-pair one-row
    aggregates joined back broadcast-style. The same shape as the
    equi-depth histogram builder (maintenance.py), with the drift
    decision replacing the bucket emit. Cites Kolmogorov (1933) /
    Smirnov (1939); the two-sided large-sample critical value is the
    standard c(alpha) * sqrt((n1+n2)/(n1*n2)) form."""
    from pyspark.sql import Window

    counts = (
        samples.groupBy(pair_col, val_col)
        .agg(
            F.sum(F.when(F.col(src_col) == 1, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col(src_col) == 2, 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
    )
    w = Window.partitionBy(pair_col).orderBy(val_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        pair_col,
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    ns = samples.groupBy(pair_col).agg(
        F.sum(F.when(F.col(src_col) == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col(src_col) == 2, 1).otherwise(0)).cast("long").alias("n2"),
    )
    d = (
        cum.join(ns, pair_col)
        .groupBy(pair_col, "n1", "n2")
        .agg(
            F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")))
            .cast("long")
            .alias("d_num")
        )
    )
    return d.select(
        F.col(pair_col).alias("pair"),
        "n1",
        "n2",
        "d_num",
        (F.col("n1") * F.col("n2")).cast("long").alias("d_den"),
        F.expr("d_num * 1000000 DIV (n1 * n2)").cast("long").alias("ks_1e6"),
        F.expr(
            f"CAST(CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE) * 1000000.0 > "
            f"{KS_ALPHA_C2_1E6}.0 * CAST(n1 + n2 AS DOUBLE) * CAST(n1 AS DOUBLE) "
            f"* CAST(n2 AS DOUBLE) AS BIGINT)"
        ).alias("reject_05"),
    )


def orders_drift_samples(orders: DataFrame) -> DataFrame:
    """(pair, src, v) — three KS comparison pairs over order totals in
    integer cents: status_f_vs_o (two real subpopulations), parity_null
    (odd/even orderkey split of ONE distribution — the calibration pair
    that must accept), planted_drift (even keys vs odd keys scaled
    +5% — must reject)."""
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    drift = F.expr("CAST(round(o_totalprice * 105) AS BIGINT)")
    even = F.col("o_orderkey") % 2 == 0
    f_vs_o = orders.where(F.col("o_orderstatus").isin("F", "O")).select(
        F.lit("status_f_vs_o").alias("pair"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(2).alias("src"),
        cents.alias("v"),
    )
    parity = orders.select(
        F.lit("parity_null").alias("pair"),
        F.when(even, 1).otherwise(2).alias("src"),
        cents.alias("v"),
    )
    planted = orders.select(
        F.lit("planted_drift").alias("pair"),
        F.when(even, 1).otherwise(2).alias("src"),
        F.when(even, cents).otherwise(drift).alias("v"),
    )
    return f_vs_o.unionByName(parity).unionByName(planted)
