"""Relational/analytic operators over the warehouse tables.

These are the engine's general-purpose OLAP surface: heavy aggregation,
dimension joins, rollups, windowed top-k, sessionization, and a
deterministic Poisson-style bootstrap (A11 analog). They double as the
shuffle-heavy benchmark queries at sf0.1 (lineitem 600k rows here; the
same plans hold at 100 TB).

Plan-shape notes:
* pricing summary: one hash aggregate with map-side partial agg; all
  measures are integer-scaled (cents / 1e-4 / 1e-6 units) so sums are
  exact and associative — no floating-point summation-order drift.
* revenue-by-nation: fact scan joins two dims that are both broadcast
  (customer at this SF, nation always); only the final groupBy shuffles.
* top-k per group: window rank bounded by the partition — the top-k
  never materializes a global sort.
* sessionization: the classic gap-window (lag + running sum) pattern;
  one shuffle on user_id.
* bootstrap: resampling weights derive from the portable hash, so the
  whole B-replica bootstrap is one explode + one aggregate — no RNG
  state, exactly reproducible, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hebrew_ner_spark.sources.catalog import load_table

SESSION_GAP_MIN = 30
BOOTSTRAP_B = 32


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-flavor aggregate with exact integer-scaled measures."""
    cents = "CAST(round(l_extendedprice * 100) AS BIGINT)"
    disc = "CAST(round(l_discount * 100) AS BIGINT)"
    tax = "CAST(round(l_tax * 100) AS BIGINT)"
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)").alias("sum_qty"),
            F.expr(f"CAST(sum({cents}) AS BIGINT)").alias("sum_base_cents"),
            F.expr(f"CAST(sum({cents} * (100 - {disc})) AS BIGINT)").alias("sum_disc_1e4"),
            F.expr(
                f"CAST(sum({cents} * (100 - {disc}) * (100 + {tax})) AS BIGINT)"
            ).alias("sum_charge_1e6"),
            F.expr(
                f"CAST((sum({cents}) * 1000000) DIV count(*) AS BIGINT)"
            ).alias("avg_price_cents_1e6"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation with explicit broadcast dims."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias(
                "revenue_cents"
            ),
            F.count("*").alias("n_orders"),
        )
    )


def order_rollup(orders: DataFrame) -> DataFrame:
    """A12 analog: rollup over (priority, status) — free in Spark/DuckDB.

    grouping_id disambiguates subtotal rows from genuine NULL groups."""
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias(
            "revenue_cents"
        ),
        F.grouping_id().cast("long").alias("gid"),
    )


def topk_customers_per_nation(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Window top-k: biggest customers by order revenue within nation."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias(
                "revenue_cents"
            )
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("revenue_cents"), F.asc("o_custkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
            "revenue_cents",
            "rank",
        )
    )


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization: a new session opens after gap_min idle.

    (user_id, session_id, n_events, duration_ms, value_cents)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gapped = events.withColumn(
        "new_session",
        F.when(
            F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(F.lag(F.col("ts").cast("timestamp")).over(w))
            > gap_min * 60_000,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return gapped.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_millis(F.max(F.col("ts").cast("timestamp"))) - F.unix_millis(F.min(F.col("ts").cast("timestamp")))).alias("duration_ms"),
        F.expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").alias(
            "value_cents"
        ),
    )


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling-window aggregate keyed by truncated hour (epoch ms)."""
    return events.groupBy(
        F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias("hour_ms"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").alias(
            "value_cents"
        ),
    )


def bootstrap_revenue(orders: DataFrame, b: int = BOOTSTRAP_B) -> DataFrame:
    """A11/E6: deterministic bootstrap of mean order price.

    Resample weight for (order, replica i) = universal_hash_i(base) % 3
    (mean 1, like a coarse Poisson(1)) where base is ONE portable md5 per
    order and the per-replica hashes are (a_i * base + b_i) mod 2^31-1 —
    exact int64 in both engines, and b-times fewer md5 evaluations than
    hashing (order, replica) pairs. One explode (b-fold) + one aggregate
    — the single-pass bootstrap the survey prescribes over A11's loop.
    """
    from hebrew_ner_spark.functions.hashing import MINHASH_P, minhash_coeffs

    structs = ", ".join(
        f"named_struct('replica', {r}, 'ca', {a}L, 'cb', {bb}L)"
        for r, (a, bb) in enumerate(minhash_coeffs(b))
    )
    weighted = (
        orders.select(
            "o_orderkey",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
            F.expr(
                "CAST(conv(substr(md5(concat(CAST(o_orderkey AS STRING), ':0')), "
                f"1, 15), 16, 10) AS BIGINT) % {MINHASH_P}"
            ).alias("b31"),
        )
        .select(
            "o_orderkey",
            "cents",
            "b31",
            F.explode(F.expr(f"array({structs})")).alias("rc"),
        )
        .select(
            "o_orderkey",
            "cents",
            F.col("rc.replica").alias("replica"),
            F.expr(f"((rc.ca * b31 + rc.cb) % {MINHASH_P}) % 3").alias("w"),
        )
    )
    return weighted.groupBy("replica").agg(
        # exact integer division: at ~14 significant digits a double
        # quotient is only precise to ~1e-3, so round() would be unstable
        F.expr(
            "CAST((sum(w * cents) * 1000000) DIV sum(w) AS BIGINT)"
        ).alias("mean_cents_1e6"),
        F.expr("CAST(sum(w) AS BIGINT)").alias("n_resampled"),
    ).withColumn("replica", F.col("replica").cast("long"))


FUNNEL_STEPS = ["view", "click", "purchase"]


def event_funnel(events: DataFrame, steps: list[str] | None = None) -> DataFrame:
    """(step_index, step, n_users, conv_from_prev_1e6, conv_from_first_1e6):
    the ordered conversion funnel — a user counts at step k only if they
    performed step k STRICTLY AFTER their qualifying step k-1 event (the
    standard product-analytics semantics, not mere set membership).

    Scale shape: one user-keyed min-timestamp aggregate per step, each
    filtered map-side by event_type (pushed to the scan) and joined to
    the previous step's user table on user_id — user-cardinality tables,
    AQE-broadcast when small, key-partitioned otherwise; never
    event-grain joins. Timestamps compare as exact epoch millis.
    """
    steps = steps or FUNNEL_STEPS
    ms = F.unix_millis(F.col("ts").cast("timestamp"))  # NTZ parquet; session tz UTC
    prev = None
    counts = []
    for i, step in enumerate(steps):
        ev = events.where(F.col("event_type") == step).select(
            "user_id", ms.alias("_ms")
        )
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("_ms").alias("step_ms"))
        else:
            cur = (
                ev.join(prev.withColumnRenamed("step_ms", "_prev_ms"), "user_id")
                .where(F.col("_ms") > F.col("_prev_ms"))
                .groupBy("user_id")
                .agg(F.min("_ms").alias("step_ms"))
            )
        counts.append(
            cur.agg(F.count("*").cast("long").alias("n_users")).select(
                F.lit(i).cast("long").alias("step_index"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w_prev = Window.orderBy("step_index")
    return (
        out.withColumn("_first", F.first("n_users").over(
            w_prev.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ))
        .withColumn("_prev", F.lag("n_users").over(w_prev))
        .select(
            "step_index",
            "step",
            "n_users",
            F.expr(
                "CASE WHEN _prev IS NULL THEN CAST(1000000 AS BIGINT) "
                "WHEN _prev = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((2 * n_users * 1000000 + _prev) DIV (2 * _prev) AS BIGINT) END"
            ).alias("conv_from_prev_1e6"),
            F.expr(
                "CASE WHEN _first = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((2 * n_users * 1000000 + _first) DIV (2 * _first) AS BIGINT) END"
            ).alias("conv_from_first_1e6"),
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """(cohort_day, offset_days, n_users): the retention matrix — users
    grouped by first-activity day, counted on each later active day
    (distinct (user, day) grain). Days are exact integer epoch-millis
    DIV 86400000 so both engines bucket identically (no timezone
    arithmetic). Two user-keyed aggregates + one broadcast-or-keyed
    join; the matrix itself is (days x days)-bounded — tiny."""
    day = F.expr("unix_millis(CAST(ts AS TIMESTAMP)) DIV 86400000")
    active = events.select("user_id", day.alias("day")).distinct()
    cohort = active.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_days"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


def json_prop_stats(events: DataFrame) -> DataFrame:
    """(event_type, n_events, n_with_k, sum_k, max_k): semi-structured
    column handling — extract the integer property ``$.k`` from the JSON
    ``props`` column and aggregate per event type. get_json_object is a
    codegen JVM expression (no Python JSON parsing); the aggregate is
    the usual map-side-combined shape over a closed type set."""
    k = F.get_json_object("props", "$.k").cast("long")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count("k").cast("long").alias("n_with_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
    )


def _per_key_median(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """(key, out) — exact percentile_disc(0.5) per key: the smallest v
    with 2 * cum(v) >= total, via a value histogram + cumulative window
    (at most |distinct values| rows per key cross the window, never the
    raw series)."""
    hist = df.groupBy(key, val).agg(F.count("*").alias("_c"))
    w = (
        Window.partitionBy(key)
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        key,
        F.col(val).alias("_v"),
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(Window.partitionBy(key)).alias("_tot"),
    )
    return (
        cum.where(2 * F.col("_cum") >= F.col("_tot"))
        .groupBy(key)
        .agg(F.min("_v").cast("long").alias(out))
    )


def event_count_anomalies(events: DataFrame, k: int = 3) -> DataFrame:
    """(event_type, hour_ms, n_events, med, mad, anomaly) — robust
    outlier flags over the hourly ingest series, the monitoring table a
    resumable 10^12-row pipeline keeps next to its data (BASELINE's
    "metrics tables"): hours whose count deviates from the per-type
    median by more than k MADs. Median/MAD instead of mean/stddev
    because ingest series have heavy tails — one crawler burst poisons
    a mean forever but moves a median not at all; and both are EXACT
    integers here (percentile_disc via histogram + cumulative window),
    so the flag is reproducible across engines bit-for-bit, unlike any
    float zscore. MAD = 0 (constant series) flags any deviation.

    Scale shape: two median passes over per-(type, value) HISTOGRAMS —
    the windows never see the raw hourly series, only its distinct
    counts — plus two broadcast joins (|event types| rows). anomaly is
    BIGINT 0/1.
    """
    counts = hourly_event_counts(events).select(
        "event_type", "hour_ms", F.col("n_events").cast("long").alias("n_events")
    )
    med = _per_key_median(counts, "event_type", "n_events", "med")
    with_med = counts.join(F.broadcast(med), "event_type").withColumn(
        "_dev", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = _per_key_median(with_med, "event_type", "_dev", "mad")
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "hour_ms",
            "n_events",
            "med",
            "mad",
            F.when(F.col("_dev") > k * F.col("mad"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("anomaly"),
        )
    )


def session_windows_native(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """(user_id, sess_start_ms, sess_end_ms, n_events, value_cents) —
    sessionization through Spark's NATIVE ``session_window`` aggregate
    (the merging-session-state operator Structured Streaming uses),
    cross-validated against the manual gaps-and-islands construction.

    Semantics pinned: session windows are half-open — an event exactly
    ``gap`` after the previous one starts a NEW session (the manual
    ``sessionize`` uses strict >; the synthetic micro-precision
    timestamps never land on the boundary, and the oracle states the
    native >= rule, so the gate is exact and the difference documented).
    ``sess_end_ms`` is last event + gap, the spec's window end."""
    sw = F.session_window(
        F.col("ts").cast("timestamp"), f"{gap_min} minutes"
    )
    return (
        events.groupBy("user_id", sw.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            ).alias("value_cents"),
        )
        .select(
            "user_id",
            F.unix_millis("w.start").alias("sess_start_ms"),
            F.unix_millis("w.end").alias("sess_end_ms"),
            "n_events",
            "value_cents",
        )
    )


# ---------------------------------------------------------------------------
# Bitmap index (popcount counting at metadata grain)
# ---------------------------------------------------------------------------
#
# The low-cardinality-predicate index a warehouse keeps next to the
# data: one bit per row per predicate value, packed into 32-bit words
# keyed by (file, word) — counting rows matching `status = X` becomes a
# popcount SUM over the index words, never a fact scan. Rows map to
# fixed positions (o_orderkey), each key sets exactly one bit, so the
# per-word SUM of distinct powers IS the bitwise OR; both engines
# evaluate bit_count identically on the packed longs.

BM_WORD = 32  # bits per index word (keys are unique -> sum == OR)


def orders_status_bitmap(orders: DataFrame) -> DataFrame:
    """(o_orderstatus, word_id, bits) — the packed bitmap index."""
    return (
        orders.select(
            "o_orderstatus",
            (F.col("o_orderkey") / BM_WORD).cast("long").alias("word_id"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(o_orderkey % {BM_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("o_orderstatus", "word_id")
        .agg(F.sum("bit").cast("long").alias("bits"))
    )


def bitmap_status_counts(bitmap: DataFrame) -> DataFrame:
    """(o_orderstatus, n_orders) answered from the INDEX: popcount sum
    over the words — the gate's oracle counts the base table directly,
    so a double-set bit, a dropped word or a packing overflow flips the
    hash."""
    return bitmap.groupBy("o_orderstatus").agg(
        F.sum(F.bit_count(F.col("bits"))).cast("long").alias("n_orders")
    )


# ---------------------------------------------------------------------------
# Event-sequence analytics: Markov transitions + Theil-Sen robust trend
# ---------------------------------------------------------------------------


def event_transitions(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """(from_type, to_type, n, prob_1e6) — the first-order Markov
    transition matrix of the event stream: consecutive same-user events
    within the session gap, row-normalized per from_type with half-up
    micro-unit shares. One window shuffle on user_id + one |types|^2
    aggregate — the matrix is vocabulary-grain, never row-grain."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .withColumn("_next_us", F.lead(us).over(w))
        .where(
            F.col("to_type").isNotNull()
            & (F.col("_next_us") - us <= gap_min * 60_000_000)
        )
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("CAST((2 * n * 1000000 + _tot) DIV (2 * _tot) AS BIGINT)")
            .alias("prob_1e6"),
        )
    )


def theil_sen_trend(events: DataFrame) -> DataFrame:
    """(event_type, n_hours, n_pairs, slope_1e6) — the Theil-Sen
    estimator over each type's hourly-count series: the median of all
    pairwise slopes (dy/dx across hour pairs), the robust answer to "is
    ingest drifting?" (one burst hour corrupts an OLS slope, but moves
    the median of slopes barely at all). Median convention: for even
    ``n_pairs`` this reports the LOWER middle slope (rank
    ``(n_pairs + 1) DIV 2`` in the (v, dy, dx) order) rather than the
    mean of the two middle slopes — a deliberate exact-integer
    convention (averaging two ratios would force a rational mean), and
    the oracle pins the identical rank.

    Scale shape: the pair join is over the HOURLY AGGREGATE, so pair
    count grows with the square of the time span, not the row count —
    720 hours of 10^12 events is still only ~259k pairs/type. Slopes
    order by their exact double ratio (small-integer dy/dx is IEEE-
    identical across engines) with a (dy, dx) tiebreak; the reported
    value is re-derived from the median pair in exact integers,
    half-away-from-zero (sign-split — Spark DIV and DuckDB // both
    truncate toward zero, so the negative branch negates a positive
    division)."""
    hc = (
        hourly_event_counts(events)
        .select(
            "event_type",
            F.expr("hour_ms DIV 3600000").alias("h"),
            F.col("n_events").cast("long").alias("n"),
        )
    )
    a = hc.select(
        "event_type", F.col("h").alias("h1"), F.col("n").alias("n1")
    )
    b = hc.select(
        "event_type", F.col("h").alias("h2"), F.col("n").alias("n2")
    )
    pairs = (
        a.join(b, "event_type")
        .where(F.col("h1") < F.col("h2"))
        .select(
            "event_type",
            (F.col("n2") - F.col("n1")).alias("dy"),
            (F.col("h2") - F.col("h1")).alias("dx"),
        )
        .withColumn("v", F.col("dy").cast("double") / F.col("dx"))
        .withColumn(
            "slope_1e6",
            F.expr(
                "CAST(CASE WHEN dy >= 0 "
                "THEN (2 * dy * 1000000 + dx) DIV (2 * dx) "
                "ELSE -((2 * -dy * 1000000 + dx) DIV (2 * dx)) "
                "END AS BIGINT)"
            ),
        )
    )
    wo = Window.partitionBy("event_type").orderBy("v", "dy", "dx")
    ranked = pairs.withColumn("_rn", F.row_number().over(wo))
    stats = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    hours = hc.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours")
    )
    med = (
        ranked.join(F.broadcast(stats), "event_type")
        .where(F.col("_rn") == F.expr("(n_pairs + 1) DIV 2"))
        .select("event_type", "slope_1e6")
    )
    return (
        hours.join(F.broadcast(stats), "event_type")
        .join(med, "event_type")
        .select("event_type", "n_hours", "n_pairs", "slope_1e6")
    )


SESSION_PATH_K = 5   # leading events kept per session path
SESSION_PATH_TOP = 20


def session_paths(
    events: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    k: int = SESSION_PATH_K,
    top: int = SESSION_PATH_TOP,
) -> DataFrame:
    """(rank, path, n_sessions) — the top in-session event-type
    sequences ('view>click>purchase'), truncated to the first ``k``
    events per session: the product-analytics path report behind the
    funnel. One window shuffle on user builds sessions, one aggregate
    per (user, session) builds paths ARRAY-SIDE (sort the collected
    struct list, slice, join — no per-event window), one
    vocabulary-grain count; the final rank orders the path-count table,
    bounded by |types|^k rows, never by traffic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    sess = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "_brk",
            F.when(
                us - F.lag(us).over(w) > gap_min * 60_000_000, 1
            ).otherwise(0),
        )
        .withColumn("_sid", F.sum("_brk").over(w))
    )
    paths = (
        sess.groupBy("user_id", "_sid")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros(F.col("ts").cast("timestamp")).alias(
                            "t"
                        ),
                        F.col("event_id").alias("e"),
                        F.col("event_type").alias("y"),
                    )
                )
            ).alias("_evs")
        )
        .select(
            F.array_join(
                F.slice(F.expr("transform(_evs, x -> x.y)"), 1, k), ">"
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    wr = Window.orderBy(F.desc("n_sessions"), "path")
    return (
        counts.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= top)
        .select("rank", "path", "n_sessions")
    )


def type_hour_association(events: DataFrame) -> DataFrame:
    """(event_type, hod, n, exp_micro, delta_micro) — the contingency
    audit of event type x hour-of-day: observed cell counts next to the
    independence expectation row_total*col_total/total in exact
    micro-units (DECIMAL(38,0) intermediate — the product overflows
    int64 at warehouse row counts) and the absolute deviation. A flat
    delta column says the axes are independent; structure in it is the
    seasonality/affinity signal. Three broadcast joins over
    vocabulary-grain marginals; cells are |types| x 24."""
    obs = (
        events.select(
            "event_type",
            F.hour(F.col("ts").cast("timestamp")).cast("long").alias("hod"),
        )
        .groupBy("event_type", "hod")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rowt = obs.groupBy("event_type").agg(F.sum("n").alias("_rt"))
    colt = obs.groupBy("hod").agg(F.sum("n").alias("_ct"))
    tot = obs.agg(F.sum("n").alias("_tot"))
    return (
        obs.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "hod")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "hod",
            "n",
            F.expr(
                "CAST(CAST(_rt AS DECIMAL(38,0)) * _ct * 1000000 DIV _tot"
                " AS BIGINT)"
            ).alias("exp_micro"),
        )
        .withColumn(
            "delta_micro",
            F.abs(F.col("n") * 1_000_000 - F.col("exp_micro")).cast("long"),
        )
    )


# --- CUSUM sustained-shift detection ----------------------------------

CUSUM_REF_HOURS = 600   # in-control reference window (hours 0..599)
CUSUM_GRID_HOURS = 720  # full monitored horizon
CUSUM_K_DEN = 2         # allowance k = mu / 2 (tuned to ~half the shift)
CUSUM_H_MUL = 4         # decision interval h = 4 * mu


def cusum_alarms(events: DataFrame) -> DataFrame:
    """(event_type, t, x, s_1e3, mu_1e3) — one-sided upper CUSUM alarm
    hours over the per-type hourly count series, with a planted
    sustained 2x traffic surge on the 'click' type from hour 600 (the
    planted-anomaly twin pattern of dq_orders_corrupted; multiplicative
    so the shift-to-allowance ratio x'/mu = 2 is scale-free — the
    detector fires at EVERY sf, not just the gate corpus).

    The Page (1954) recursion S_t = max(0, S_{t-1} + x_t - mu - k) is
    sequential ON ITS FACE, but distributes exactly via the prefix-sum
    identity S_t = P_t - min(0, min_{j<=t} P_j) with
    P_t = sum_{i<=t} (x_i - mu - k) — two ordered windows per series,
    NO iteration, no state loop (contrast Kleinberg burst.py, whose
    Viterbi genuinely needs its rounds). All arithmetic rides in
    milli-units: mu from the in-control reference window by integer
    DIV, k = mu DIV 2, alarm iff S > 4 * mu. Zero-filled hour grid so
    silent hours count against the mean.

    Shape at scale: per-series windows partition by event_type — state
    is series-grain, embarrassingly parallel across series; the grid
    explode is bins * types rows. Detection contract on the gate
    corpus: exactly one alarming type (the planted one), first alarm
    within ~8 hours of the shift, zero false alarms elsewhere —
    structurally non-vacuous. Cites Page (Biometrika 1954)."""
    from pyspark.sql import Window

    hour_ms = F.unix_millis(F.date_trunc("hour", F.col("ts")))
    raw = (
        events.select(
            "event_type",
            hour_ms.alias("hms"),
        )
        .crossJoin(
            F.broadcast(events.agg(F.min(hour_ms).alias("h0")))
        )
        .select(
            "event_type",
            F.expr("(hms - h0) DIV 3600000").cast("long").alias("t"),
        )
        .groupBy("event_type", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    types = events.select("event_type").distinct()
    grid = types.crossJoin(
        F.broadcast(
            events.sparkSession.range(CUSUM_GRID_HOURS).select(
                F.col("id").cast("long").alias("t")
            )
        )
    )
    x = (
        grid.join(raw, ["event_type", "t"], "left")
        .select(
            "event_type",
            "t",
            (
                F.coalesce("c", F.lit(0))
                * F.when(
                    (F.col("event_type") == "click")
                    & (F.col("t") >= CUSUM_REF_HOURS),
                    2,
                ).otherwise(1)
            )
            .cast("long")
            .alias("x"),
        )
    )
    mu = (
        x.where(F.col("t") < CUSUM_REF_HOURS)
        .groupBy("event_type")
        .agg(
            F.expr(f"sum(x) * 1000 DIV {CUSUM_REF_HOURS}")
            .cast("long")
            .alias("mu_1e3")
        )
    )
    w = Window.partitionBy("event_type").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = x.join(F.broadcast(mu), "event_type").withColumn(
        "d",
        F.col("x") * 1000 - F.col("mu_1e3") - F.expr(f"mu_1e3 DIV {CUSUM_K_DEN}"),
    )
    s = d.withColumn("pt", F.sum("d").over(w)).withColumn(
        "s_1e3", F.col("pt") - F.least(F.lit(0), F.min("pt").over(w))
    )
    return s.where(F.col("s_1e3") > CUSUM_H_MUL * F.col("mu_1e3")).select(
        "event_type", "t", "x", F.col("s_1e3").cast("long").alias("s_1e3"), "mu_1e3"
    )
