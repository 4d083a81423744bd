"""Relational/analytic queries + DuckDB oracles (the shuffle-heavy bench
set: aggregation, broadcast joins, rollup, windowed top-k, sessionization,
deterministic bootstrap)."""

from __future__ import annotations

from hebrew_ner_spark.operators import relational
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_DISC = "CAST(round(l_discount * 100) AS BIGINT)"
_TAX = "CAST(round(l_tax * 100) AS BIGINT)"


@query(
    "rel_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum({_CENTS}) AS BIGINT) AS sum_base_cents,
           CAST(sum({_CENTS} * (100 - {_DISC})) AS BIGINT) AS sum_disc_1e4,
           CAST(sum({_CENTS} * (100 - {_DISC}) * (100 + {_TAX})) AS BIGINT) AS sum_charge_1e6,
           CAST((sum({_CENTS}) * 1000000) // count(*) AS BIGINT) AS avg_price_cents_1e6,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_pricing_summary(spark, sf_dir):
    return relational.pricing_summary(load_table(spark, sf_dir, "lineitem"))


@query(
    "rel_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def rel_revenue_by_nation(spark, sf_dir):
    return relational.revenue_by_nation(spark, sf_dir)


@query(
    "rel_order_rollup",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rel_order_rollup(spark, sf_dir):
    return relational.order_rollup(load_table(spark, sf_dir, "orders"))


@query(
    "rel_topk_customers",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey, r.o_custkey AS custkey,
             r.revenue_cents,
             CAST(row_number() OVER (PARTITION BY c.c_nationkey
                                     ORDER BY r.revenue_cents DESC, r.o_custkey) AS BIGINT) AS rank
      FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
    )
    SELECT nationkey, custkey, revenue_cents, rank FROM ranked WHERE rank <= 3
    """,
)
def rel_topk_customers(spark, sf_dir):
    return relational.topk_customers_per_nation(spark, sf_dir)


@query(
    "evt_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w)
                       > {relational.SESSION_GAP_MIN} * 60000 THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM s GROUP BY user_id, session_id
    """,
)
def evt_sessionize(spark, sf_dir):
    return relational.sessionize(load_table(spark, sf_dir, "events"))


@query(
    "evt_hourly_counts",
    oracle="""
    SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY 1, 2
    """,
)
def evt_hourly_counts(spark, sf_dir):
    return relational.hourly_event_counts(load_table(spark, sf_dir, "events"))


from hebrew_ner_spark.functions.hashing import MINHASH_P as _MINHASH_P
from hebrew_ner_spark.functions.hashing import minhash_coeffs as _mc

_BOOT_COEFFS = ", ".join(
    f"({r}, {a}, {b})" for r, (a, b) in enumerate(_mc(relational.BOOTSTRAP_B))
)


@query(
    "rel_bootstrap_ci",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR) || ':0'),
                         1, 15)) AS BIGINT) % {_MINHASH_P} AS b31
      FROM orders
    ),
    rc AS (SELECT * FROM (VALUES {_BOOT_COEFFS}) AS t(replica, ca, cb)),
    w AS (
      SELECT o_orderkey, cents, rc.replica,
             ((CAST(ca AS BIGINT) * b31 + cb) % {_MINHASH_P}) % 3 AS w
      FROM base CROSS JOIN rc
    )
    SELECT CAST(replica AS BIGINT) AS replica,
           CAST((sum(w * cents) * 1000000) // sum(w) AS BIGINT) AS mean_cents_1e6,
           CAST(sum(w) AS BIGINT) AS n_resampled
    FROM w GROUP BY replica
    """,
)
def rel_bootstrap_ci(spark, sf_dir):
    """A11/E6: single-pass deterministic bootstrap of mean order value."""
    return relational.bootstrap_revenue(load_table(spark, sf_dir, "orders"))


@query(
    "rel_big_join_smj",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def rel_big_join_smj(spark, sf_dir):
    """Fact-to-fact join with an explicit sort-merge hint: at warehouse
    scale neither side of lineitem ⋈ orders broadcasts, so the plan must
    shuffle both sides by the join key — here the hint forces the
    strategy the optimizer would pick at 100 TB, exercising the SMJ path
    that every other (dimension) join in this engine deliberately avoids."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").hint("merge")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.expr(
                "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            ).alias("revenue_cents"),
        )
    )
