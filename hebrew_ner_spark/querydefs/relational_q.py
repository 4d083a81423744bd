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


from hebrew_ner_spark.operators.relational import FUNNEL_STEPS  # noqa: E402


def _funnel_ctes(steps: list[str]) -> str:
    parts = []
    for i, step in enumerate(steps):
        if i == 0:
            parts.append(
                f"s0 AS (SELECT user_id, min(epoch_ms(ts)) AS step_ms"
                f" FROM events WHERE event_type = '{step}' GROUP BY user_id)"
            )
        else:
            parts.append(
                f"""s{i} AS (
      SELECT e.user_id, min(epoch_ms(e.ts)) AS step_ms
      FROM events e JOIN s{i - 1} p ON e.user_id = p.user_id
      WHERE e.event_type = '{step}' AND epoch_ms(e.ts) > p.step_ms
      GROUP BY e.user_id)"""
            )
        parts.append(
            f"c{i} AS (SELECT CAST({i} AS BIGINT) AS step_index,"
            f" '{step}' AS step, CAST(count(*) AS BIGINT) AS n_users FROM s{i})"
        )
    union = " UNION ALL ".join(f"SELECT * FROM c{i}" for i in range(len(steps)))
    return ",\n    ".join(parts) + f",\n    u AS ({union})"


@query(
    "evt_funnel",
    oracle=f"""
    WITH {_funnel_ctes(FUNNEL_STEPS)},
    w AS (SELECT step_index, step, n_users,
                 lag(n_users) OVER (ORDER BY step_index) AS _prev,
                 first_value(n_users) OVER (ORDER BY step_index
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS _first
          FROM u)
    SELECT step_index, step, n_users,
           CASE WHEN _prev IS NULL THEN CAST(1000000 AS BIGINT)
                WHEN _prev = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((2 * n_users * 1000000 + _prev) // (2 * _prev) AS BIGINT)
           END AS conv_from_prev_1e6,
           CASE WHEN _first = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((2 * n_users * 1000000 + _first) // (2 * _first) AS BIGINT)
           END AS conv_from_first_1e6
    FROM w
    """,
)
def evt_funnel(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase, strict
    temporal order) with per-step user counts and exact integer
    conversion rates (operators/relational.py event_funnel)."""
    return relational.event_funnel(load_table(spark, sf_dir, "events"))


@query(
    "evt_retention",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
    cohort AS (SELECT user_id, min(day) AS cohort_day FROM active GROUP BY user_id)
    SELECT cohort_day, day - cohort_day AS offset_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM active JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
)
def evt_retention(spark, sf_dir):
    """Cohort retention matrix: first-activity-day cohorts counted at
    each active-day offset, exact integer epoch-day buckets
    (operators/relational.py cohort_retention)."""
    return relational.cohort_retention(load_table(spark, sf_dir, "events"))


@query(
    "evt_json_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type
    """,
)
def evt_json_stats(spark, sf_dir):
    """Semi-structured props column: JVM-side JSON extraction of $.k
    aggregated per event type (operators/relational.py
    json_prop_stats)."""
    return relational.json_prop_stats(load_table(spark, sf_dir, "events"))


@query(
    "evt_count_anomalies",
    oracle="""
    WITH an_c AS (
      SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS hour_ms,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    an_h AS (SELECT event_type, n_events AS v, count(*) AS c
             FROM an_c GROUP BY 1, 2),
    an_m AS (
      SELECT event_type, CAST(min(v) AS BIGINT) AS med FROM (
        SELECT event_type, v,
               sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
               sum(c) OVER (PARTITION BY event_type) AS tot
        FROM an_h) WHERE 2 * cum >= tot GROUP BY event_type
    ),
    an_d AS (
      SELECT an_c.*, med, abs(n_events - med) AS dev
      FROM an_c JOIN an_m USING (event_type)
    ),
    an_dh AS (SELECT event_type, dev AS v, count(*) AS c
              FROM an_d GROUP BY 1, 2),
    an_mad AS (
      SELECT event_type, CAST(min(v) AS BIGINT) AS mad FROM (
        SELECT event_type, v,
               sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
               sum(c) OVER (PARTITION BY event_type) AS tot
        FROM an_dh) WHERE 2 * cum >= tot GROUP BY event_type
    )
    SELECT event_type, hour_ms, n_events, med, mad,
           CAST(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END AS BIGINT) AS anomaly
    FROM an_d JOIN an_mad USING (event_type)
    """,
)
def evt_count_anomalies(spark, sf_dir):
    """Robust (median/MAD, exact-integer) outlier flags over the hourly
    ingest series — the pipeline's monitoring table."""
    return relational.event_count_anomalies(load_table(spark, sf_dir, "events"))


@query(
    "evt_session_window_native",
    oracle=f"""
    WITH t AS (SELECT user_id, ts, epoch_us(ts) AS tu,
                      CAST(round(value * 100) AS BIGINT) AS vc
               FROM events),
    g AS (SELECT *, CASE WHEN tu - lag(tu) OVER w
                              >= {relational.SESSION_GAP_MIN} * 60000000
                         THEN 1 ELSE 0 END AS brk
          FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
    s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tu)
                         AS BIGINT) AS sid
          FROM g)
    SELECT user_id,
           CAST(min(tu) // 1000 AS BIGINT) AS sess_start_ms,
           CAST(max(tu) // 1000 + {relational.SESSION_GAP_MIN} * 60000
                AS BIGINT) AS sess_end_ms,
           count(*) AS n_events,
           CAST(sum(vc) AS BIGINT) AS value_cents
    FROM s GROUP BY user_id, sid
    """,
)
def evt_session_window_native(spark, sf_dir):
    """Spark's native session_window vs the gaps-and-islands oracle —
    the two constructions agree only if the merging-window semantics
    (half-open gap boundary, end = last + gap) are exactly right."""
    return relational.session_windows_native(load_table(spark, sf_dir, "events"))


@query(
    "rel_bitmap_words",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(o_orderkey // {relational.BM_WORD} AS BIGINT) AS word_id,
           CAST(sum(CAST(1 AS BIGINT) << (o_orderkey % {relational.BM_WORD}))
                AS BIGINT) AS bits
    FROM orders GROUP BY 1, 2
    """,
)
def rel_bitmap_words(spark, sf_dir):
    """The packed 32-bit-word bitmap index over order status — keys are
    unique so the per-word sum of distinct powers IS the bitwise OR."""
    return relational.orders_status_bitmap(load_table(spark, sf_dir, "orders"))


@query(
    "rel_bitmap_count",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def rel_bitmap_count(spark, sf_dir):
    """Predicate counting answered from the bitmap index via popcount —
    the oracle counts the BASE table, so the index round-trip
    (pack -> popcount) is certified end to end."""
    return relational.bitmap_status_counts(
        relational.orders_status_bitmap(load_table(spark, sf_dir, "orders"))
    )


@query(
    "evt_transitions",
    oracle=f"""
    WITH tr AS (
      SELECT user_id, ts, event_id, event_type,
             lead(event_type) OVER w AS to_type,
             lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    trc AS (
      SELECT event_type AS from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM tr
      WHERE to_type IS NOT NULL
        AND gap_us <= {relational.SESSION_GAP_MIN} * 60000000
      GROUP BY 1, 2
    ),
    trt AS (SELECT from_type, sum(n) AS tot FROM trc GROUP BY from_type)
    SELECT from_type, to_type, n,
           CAST((2 * n * 1000000 + tot) // (2 * tot) AS BIGINT) AS prob_1e6
    FROM trc JOIN trt USING (from_type)
    """,
)
def evt_transitions(spark, sf_dir):
    """First-order Markov transition matrix of the in-session event
    stream, with exact half-up micro-unit row shares
    (operators/relational.py event_transitions)."""
    return relational.event_transitions(load_table(spark, sf_dir, "events"))


@query(
    "evt_trend_theilsen",
    oracle="""
    WITH th AS (
      SELECT event_type, epoch_ms(date_trunc('hour', ts)) // 3600000 AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tp AS (
      SELECT a.event_type,
             b.n - a.n AS dy, b.h - a.h AS dx,
             CAST(b.n - a.n AS DOUBLE) / (b.h - a.h) AS v
      FROM th a JOIN th b ON a.event_type = b.event_type AND a.h < b.h
    ),
    tps AS (
      SELECT *, CAST(CASE WHEN dy >= 0
                          THEN (2 * dy * 1000000 + dx) // (2 * dx)
                          ELSE -((2 * -dy * 1000000 + dx) // (2 * dx))
                     END AS BIGINT) AS slope_1e6,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY v, dy, dx) AS rn,
             count(*) OVER (PARTITION BY event_type) AS np
      FROM tp
    ),
    tmed AS (
      SELECT event_type, slope_1e6,
             CAST(np AS BIGINT) AS n_pairs
      FROM tps WHERE rn = (np + 1) // 2
    ),
    thh AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
            FROM th GROUP BY event_type)
    SELECT event_type, n_hours, n_pairs, slope_1e6
    FROM tmed JOIN thh USING (event_type)
    """,
)
def evt_trend_theilsen(spark, sf_dir):
    """Theil-Sen robust ingest-trend estimate per event type: median of
    pairwise hourly-count slopes, selected by exact-ratio order with a
    pinned (dy, dx) tiebreak and re-derived half-away-from-zero in
    integers (operators/relational.py theil_sen_trend)."""
    return relational.theil_sen_trend(load_table(spark, sf_dir, "events"))


@query(
    "evt_session_paths",
    oracle=f"""
    WITH spv AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > {relational.SESSION_GAP_MIN} * 60000000
                  THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sps AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS sid
      FROM spv
    ),
    spp AS (
      SELECT array_to_string(
               list_slice(list(event_type ORDER BY ts, event_id),
                          1, {relational.SESSION_PATH_K}), '>') AS path
      FROM sps GROUP BY user_id, sid
    ),
    spc AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM spp GROUP BY path)
    SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path)
                AS BIGINT) AS rank,
           path, n_sessions
    FROM spc
    QUALIFY rank <= {relational.SESSION_PATH_TOP}
    """,
)
def evt_session_paths(spark, sf_dir):
    """Top in-session event-type sequences (first 5 events, '>'-joined),
    built array-side per session with a pinned (ts, event_id) order
    (operators/relational.py session_paths)."""
    return relational.session_paths(load_table(spark, sf_dir, "events"))


@query(
    "evt_type_hour_assoc",
    oracle="""
    WITH aob AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    art AS (SELECT event_type, sum(n) AS rt FROM aob GROUP BY 1),
    act AS (SELECT hod, sum(n) AS ct FROM aob GROUP BY 1),
    att AS (SELECT sum(n) AS tot FROM aob)
    SELECT event_type, hod, n,
           CAST(CAST(rt AS HUGEINT) * ct * 1000000 // tot AS BIGINT)
             AS exp_micro,
           CAST(abs(n * 1000000 -
                CAST(CAST(rt AS HUGEINT) * ct * 1000000 // tot AS BIGINT))
                AS BIGINT) AS delta_micro
    FROM aob JOIN art USING (event_type) JOIN act USING (hod), att
    """,
)
def evt_type_hour_assoc(spark, sf_dir):
    """Contingency audit of event type x hour-of-day: observed counts
    next to the exact-integer independence expectation and deviation
    (operators/relational.py type_hour_association)."""
    return relational.type_hour_association(
        load_table(spark, sf_dir, "events")
    )


_CU_REF = relational.CUSUM_REF_HOURS
_CU_GRID = relational.CUSUM_GRID_HOURS


@query(
    "evt_cusum",
    oracle=f"""
    WITH cur AS (
      SELECT event_type,
             CAST((epoch_ms(date_trunc('hour', ts)) -
                   (SELECT min(epoch_ms(date_trunc('hour', ts))) FROM events))
                  // 3600000 AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    cug AS (
      SELECT et.event_type, g.t
      FROM (SELECT DISTINCT event_type FROM cur) et
      CROSS JOIN (SELECT unnest(range(0, {_CU_GRID})) AS t) g
    ),
    cux AS (
      SELECT g.event_type, g.t,
             coalesce(r.c, 0) *
             CASE WHEN g.event_type = 'click' AND g.t >= {_CU_REF}
                  THEN 2 ELSE 1 END AS x
      FROM cug g LEFT JOIN cur r ON r.event_type = g.event_type AND r.t = g.t
    ),
    cumu AS (
      SELECT event_type, CAST(sum(x) * 1000 // {_CU_REF} AS BIGINT) AS mu_1e3
      FROM cux WHERE t < {_CU_REF} GROUP BY event_type
    ),
    cud AS (
      SELECT x.event_type, x.t, x.x, m.mu_1e3,
             x.x * 1000 - m.mu_1e3 - (m.mu_1e3 // {relational.CUSUM_K_DEN}) AS d
      FROM cux x JOIN cumu m USING (event_type)
    ),
    cup AS (
      SELECT event_type, t, x, mu_1e3,
             sum(d) OVER (PARTITION BY event_type ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS pt
      FROM cud
    ),
    cus AS (
      SELECT event_type, t, x, mu_1e3,
             pt - least(0, min(pt) OVER (PARTITION BY event_type ORDER BY t
                                         ROWS UNBOUNDED PRECEDING)) AS s_1e3
      FROM cup
    )
    SELECT event_type, t, x, CAST(s_1e3 AS BIGINT) AS s_1e3, mu_1e3
    FROM cus WHERE s_1e3 > {relational.CUSUM_H_MUL} * mu_1e3
    """,
)
def evt_cusum(spark, sf_dir):
    """Page's CUSUM as two ordered windows (prefix-sum running-min
    identity — no recursion): alarm hours per event-type series with a
    planted sustained shift; exactly one type may alarm
    (operators/relational.py cusum_alarms)."""
    return relational.cusum_alarms(load_table(spark, sf_dir, "events"))
