"""Gates for the data-quality validation suite (operators/dataquality.py).

Two runs of the same five-rule suite: the clean table (every rule must
report zero violations — the all-pass contract is itself gated) and the
hash-corrupted twin (each planted violation class surfaces with its
exact count). CTE names dq-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.functions.hashing import phash_duck
from hebrew_ner_spark.operators import dataquality
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_ST = ", ".join(f"'{s}'" for s in dataquality.ORDER_STATUSES)

_H = phash_duck("CAST(o_orderkey AS VARCHAR)", dataquality.DQ_SEED)

_CORRUPT = f"""
dqh AS (SELECT *, {_H} AS h FROM orders),
dqb AS (
  SELECT o_orderkey,
         CASE WHEN h % 97 = 0 THEN NULL
              WHEN h % 79 = 0 THEN o_custkey + 1000000
              ELSE o_custkey END AS o_custkey,
         CASE WHEN h % 89 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN h % 101 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         h
  FROM dqh
),
dqc AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM dqb
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM dqb
  WHERE h % 103 = 0
)
"""


def _report_sql(src: str) -> str:
    return f"""
    dqn AS (SELECT count(*) AS n FROM {src}),
    dqdup AS (
      SELECT CAST(coalesce(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT) AS v
      FROM (SELECT o_orderkey, count(*) AS c FROM {src} GROUP BY o_orderkey)
    ),
    dqnul AS (SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS v FROM {src}),
    dqrng AS (SELECT CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS v FROM {src}),
    dqenm AS (SELECT CAST(sum(CASE WHEN o_orderstatus IN ({_ST}) THEN 0
                               ELSE 1 END) AS BIGINT) AS v FROM {src}),
    dqfk AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM {src} o
      WHERE o.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    ),
    dqr AS (
      SELECT 'unique' AS rule, 'o_orderkey' AS "column", v FROM dqdup
      UNION ALL SELECT 'not_null', 'o_custkey', v FROM dqnul
      UNION ALL SELECT 'range_positive', 'o_totalprice', v FROM dqrng
      UNION ALL SELECT 'in_set', 'o_orderstatus', v FROM dqenm
      UNION ALL SELECT 'fk_customer', 'o_custkey', v FROM dqfk
    )
    SELECT rule, "column", v AS n_violations,
           CAST((SELECT n FROM dqn) AS BIGINT) AS n_rows,
           CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS BIGINT) AS ok
    FROM dqr
    """


def _tables(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


@query(
    "dq_orders_clean",
    oracle=f"WITH {_report_sql('orders')}",
)
def dq_orders_clean(spark, sf_dir):
    """The suite over the clean table: five rules, zero violations —
    the publish-gate all-pass contract, verified as values."""
    orders, customer = _tables(spark, sf_dir)
    return dataquality.orders_quality_report(orders, customer)


@query(
    "dq_orders_corrupted",
    oracle=f"WITH {_CORRUPT}, {_report_sql('dqc')}",
)
def dq_orders_corrupted(spark, sf_dir):
    """The suite over the hash-corrupted twin: every planted violation
    class (duplicates, NULL keys, orphan FKs, negated totals, bad
    statuses) surfaces with its exact count."""
    orders, customer = _tables(spark, sf_dir)
    return dataquality.orders_quality_report(
        dataquality.corrupt_orders(orders), customer
    )


_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {v}" for d, v in dataquality.BENFORD_1E6.items()
) + " END"


@query(
    "dq_benford",
    oracle=f"""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
    ),
    cnt AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY digit),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS _t FROM cnt)
    SELECT digit, n,
           (2 * n * 1000000 + _t) // (2 * _t) AS share_1e6,
           CAST({_BENFORD_CASE} AS BIGINT) AS benford_1e6,
           abs((2 * n * 1000000 + _t) // (2 * _t) - ({_BENFORD_CASE}))
             AS dev_1e6
    FROM cnt, tot
    """,
)
def dq_benford(spark, sf_dir):
    """Benford first-digit screen over order totals (integer cents) —
    observed vs expected shares in exact micro-units, per digit."""
    orders, _ = _tables(spark, sf_dir)
    return dataquality.benford_audit(orders, "o_totalprice")


_QI = """
dqk AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
dqcls AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT cents) AS BIGINT) AS l_distinct
  FROM dqk GROUP BY 1, 2, 3
),
dqflag AS (
  SELECT *,
         CAST(CASE WHEN class_size < 5 THEN 1 ELSE 0 END AS BIGINT) AS k_risky,
         CAST(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END AS BIGINT) AS l_risky
  FROM dqcls
)
"""


@query(
    "dq_k_anonymity",
    oracle=f"""
    WITH {_QI}
    SELECT c_nationkey, c_mktsegment, bal_band, class_size, l_distinct,
           k_risky, l_risky
    FROM dqflag
    """,
)
def dq_k_anonymity(spark, sf_dir):
    """Per-QI-class re-identification audit: class sizes and sensitive-
    value diversity for (nation, segment, floor-banded balance), with
    k<5 / l<3 risk flags. One map-side-combining aggregate; the report
    is bounded by the QI domain product, not the row count
    (operators/dataquality.py k_anonymity_classes)."""
    return dataquality.k_anonymity_classes(
        load_table(spark, sf_dir, "customer")
    )


@query(
    "dq_anon_summary",
    oracle=f"""
    WITH {_QI}
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(k_risky) AS BIGINT) AS k_risky_classes,
           CAST(sum(k_risky * class_size) AS BIGINT) AS records_at_risk,
           CAST(min(class_size) AS BIGINT) AS min_class_size,
           CAST(sum(l_risky) AS BIGINT) AS l_risky_classes
    FROM dqflag
    """,
)
def dq_anon_summary(spark, sf_dir):
    """The one-row release/quarantine verdict over the k-anonymity
    class table (operators/dataquality.py anonymity_summary)."""
    return dataquality.anonymity_summary(
        dataquality.k_anonymity_classes(load_table(spark, sf_dir, "customer"))
    )


@query(
    "dq_iqr_outliers",
    oracle="""
    WITH iqb AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS v
      FROM orders
    ),
    iqq AS (
      SELECT o_orderpriority,
             CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v)
                  AS BIGINT) AS q1,
             CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY v)
                  AS BIGINT) AS q3
      FROM iqb GROUP BY 1
    )
    SELECT b.o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
           q1, q3, q3 - q1 AS iqr,
           CAST(sum(CASE WHEN 2 * (q1 - v) > 3 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN 2 * (v - q3) > 3 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM iqb b JOIN iqq USING (o_orderpriority)
    GROUP BY 1, q1, q3
    """,
)
def dq_iqr_outliers(spark, sf_dir):
    """Tukey 1.5xIQR fence counts per priority over whole-dollar order
    totals: quartiles via the sort-free integer histogram percentile on
    the Spark side vs DuckDB's NATIVE percentile_disc in the oracle (two
    independent algorithms), fences cross-multiplied so no halves or
    floats exist anywhere (operators/dataquality.py iqr_outliers)."""
    return dataquality.iqr_outliers(load_table(spark, sf_dir, "orders"))


from pyspark.sql import functions as F  # noqa: E402

from hebrew_ner_spark.functions.hashing import phash_duck as _phd  # noqa: E402
from hebrew_ner_spark.operators.dataquality import (  # noqa: E402
    DP_SEED_A as _DPA,
    DP_SEED_B as _DPB,
)


def _geo_duck(h: str) -> str:
    return f"(CAST(length(bin(xor({h}, {h} + 1))) AS BIGINT) - 1)"


@query(
    "dq_dp_release",
    oracle=f"""
    WITH dpc AS (
      SELECT CAST(c_nationkey AS BIGINT) AS grp,
             CAST(count(*) AS BIGINT) AS true_count
      FROM customer GROUP BY 1
    ),
    dph AS (
      SELECT grp, true_count,
             {_phd("CAST(grp AS VARCHAR)", "_A_")} AS ha,
             {_phd("CAST(grp AS VARCHAR)", "_B_")} AS hb
      FROM dpc
    )
    SELECT grp, true_count,
           CAST({_geo_duck('ha')} - {_geo_duck('hb')} AS BIGINT) AS noise,
           CAST(true_count + {_geo_duck('ha')} - {_geo_duck('hb')}
                AS BIGINT) AS released
    FROM dph
    """.replace("_A_", str(_DPA)).replace("_B_", str(_DPB)),
)
def dq_dp_release(spark, sf_dir):
    """Seeded discrete-Laplace (eps = ln 2) count release per customer
    nation: exact-integer geometric noise from trailing-ones bit
    arithmetic — the DP mechanism plumbing, deterministic by pinned
    seed (operators/dataquality.py dp_count_release)."""
    from hebrew_ner_spark.operators.dataquality import dp_count_release

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "c_nationkey", F.col("c_nationkey").cast("long")
    )
    # the pinned seed pair is the explicit opt-in test configuration
    # (release_seeds has no default — see the operator's docstring)
    return dp_count_release(cust, "c_nationkey", (_DPA, _DPB))


_KS_SAMPLES = """
kss AS (
  SELECT 'status_f_vs_o' AS pair,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 2 END AS src,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_orderstatus IN ('F', 'O')
  UNION ALL
  SELECT 'parity_null',
         CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END,
         CAST(round(o_totalprice * 100) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'planted_drift',
         CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END,
         CASE WHEN o_orderkey % 2 = 0
              THEN CAST(round(o_totalprice * 100) AS BIGINT)
              ELSE CAST(round(o_totalprice * 105) AS BIGINT) END
  FROM orders
)
"""


@query(
    "dq_ks_drift",
    oracle=f"""
    WITH {_KS_SAMPLES},
    ksc AS (
      SELECT pair, v,
             CAST(sum(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN src = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM kss GROUP BY pair, v
    ),
    kscum AS (
      SELECT pair,
             sum(c1) OVER (PARTITION BY pair ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum1,
             sum(c2) OVER (PARTITION BY pair ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cum2
      FROM ksc
    ),
    ksn AS (
      SELECT pair,
             CAST(sum(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN src = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM kss GROUP BY pair
    ),
    ksd AS (
      SELECT c.pair, n.n1, n.n2,
             CAST(max(abs(c.cum1 * n.n2 - c.cum2 * n.n1)) AS BIGINT) AS d_num
      FROM kscum c JOIN ksn n ON n.pair = c.pair
      GROUP BY c.pair, n.n1, n.n2
    )
    SELECT pair, n1, n2, d_num,
           CAST(n1 * n2 AS BIGINT) AS d_den,
           CAST(d_num * 1000000 // (n1 * n2) AS BIGINT) AS ks_1e6,
           CAST(CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE) * 1000000.0 >
                {dataquality.KS_ALPHA_C2_1E6}.0 * CAST(n1 + n2 AS DOUBLE)
                * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) AS BIGINT)
             AS reject_05
    FROM ksd
    """,
)
def dq_ks_drift(spark, sf_dir):
    """Exact two-sample KS over three order-total pairs: two real
    subpopulations (accept), a parity null split (accept — the
    calibration contract), and a planted +5% drift twin (reject)
    (operators/dataquality.py ks_two_sample)."""
    orders = load_table(spark, sf_dir, "orders")
    return dataquality.ks_two_sample(dataquality.orders_drift_samples(orders))
