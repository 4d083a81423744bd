"""Kleinberg-style burst detection over crawl-time bins (trending
tokens), as a pure whole-stage-codegen Viterbi — zero Python, zero UDF.

Kleinberg's two-state automaton (KDD 2002 "Bursty and Hierarchical
Structure in Streams", batch formulation): a token is either at its
baseline rate (state 0) or bursting (state 1, rate >= s x baseline);
entering the burst state costs gamma, so isolated wobbles don't flip
the state — the hysteresis that separates a trend from noise. The KG
use: entity/predicate trending intervals across crawl snapshots drive
crawl-frontier priority and staleness-discounted fact confidence.

Exact-integer surrogate costs (the repo-wide no-float-in-gated-columns
rule; Kleinberg's -log binomial likelihoods are transcendental, the
automaton structure — not the exact cost curve — carries the
semantics): with r = the token's share of bin traffic in micro-units
and R = its overall share,

    cost(state 0, bin) = max(0, r - R)            (high rate at baseline)
    cost(state 1, bin) = max(0, s*R - r)          (low rate while bursting)
    transition 0 -> 1 costs GAMMA; all others free.

The decode is THE showcase of built-in-only dynamic programming: the
per-token bin series folds through ONE ``aggregate`` HOF whose
accumulator carries, per state, the best (cost, path-id) pair — path id
= the state bits packed LSB-first into a BIGINT, so lexicographic
(cost, id) comparison via ``least`` over structs both breaks ties
deterministically AND replaces backtracking entirely (the winning id IS
the state sequence; prefix-monotone, so the DP argument survives the
tiebreak). The oracle does the opposite: exhaustive enumeration of all
2^BINS paths with the same (cost, id) argmin — the two engines agree
only if the DP is exactly right, the CRF-gate standard.

Shape at 10^12 rows: the count matrix is one groupBy (tokens x bins —
vocabulary-sized, not corpus-sized); the DP runs inside a projection
over one row per token. BINS is a constant (the automaton state space
must fit the packed-id BIGINT: BINS <= 62); a longer history folds into
coarser bins, not more states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_col

BURST_BINS = 16          # time bins (packed path id -> BINS <= 62)
BURST_S_NUM = 2          # burst threshold multiplier s = 2x baseline
BURST_S_DEN = 1
BURST_GAMMA = 100_000    # enter-burst cost, micro-units of share
BURST_SPIKE = 8          # planted spike multiplier (synthetic trend)
BURST_SEED = 93          # seed for the deterministic spike placement
BURST_SPIKE_MOD = 6      # ~1/6 of (token, bin) cells spike
_INF = 1 << 50


def token_bins(events: DataFrame, bins: int = BURST_BINS) -> DataFrame:
    """(tok, b, c, n) — the dense token-x-bin count matrix with planted
    deterministic spikes.

    The synthetic events table is rate-uniform by construction, so the
    trend structure is planted: cells where h60(tok|b) % SPIKE_MOD == 0
    multiply their count by SPIKE — both engines derive the identical
    placement from the portable hash (the planted-skew convention).
    ``n`` is the bin's total AFTER planting (rates stay consistent).
    Bins are equal-width time slices; missing cells densify to c = 0.
    """
    d = events.select(
        F.col("event_type").alias("tok"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    bounds = d.agg(F.min("t").alias("tmn"), F.max("t").alias("tmx"))
    binned = (
        d.crossJoin(F.broadcast(bounds))
        .select(
            "tok",
            F.expr(f"((t - tmn) * {bins}) DIV (tmx - tmn + 1)").alias("b"),
        )
        .groupBy("tok", "b")
        .agg(F.count("*").alias("c_raw"))
    )
    toks = d.select("tok").distinct()
    grid = toks.crossJoin(
        d.sparkSession.range(bins).select(F.col("id").alias("b"))
    )
    dense = grid.join(binned, ["tok", "b"], "left").select(
        "tok",
        "b",
        F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
    )
    spiked = dense.select(
        "tok",
        "b",
        F.when(
            phash_col(F.concat_ws("|", "tok", "b"), BURST_SEED)
            % BURST_SPIKE_MOD
            == 0,
            F.col("c_raw") * BURST_SPIKE,
        )
        .otherwise(F.col("c_raw"))
        .cast("long")
        .alias("c"),
    )
    totals = spiked.groupBy("b").agg(F.sum("c").alias("n"))
    return spiked.join(F.broadcast(totals), "b").select("tok", "b", "c", "n")


def burst_costs(
    tb: DataFrame, s_num: int = BURST_S_NUM, s_den: int = BURST_S_DEN
) -> DataFrame:
    """(tok, b, r_1e6, base_1e6, cost0, cost1) — per-cell automaton
    emission costs from exact micro-unit shares."""
    w = tb.groupBy("tok").agg(
        F.sum("c").alias("tot_c"), F.sum("n").alias("tot_n")
    )
    return (
        tb.join(F.broadcast(w), "tok")
        .select(
            "tok",
            "b",
            F.expr("CASE WHEN n = 0 THEN CAST(0 AS BIGINT) "
                   "ELSE (c * 1000000) DIV n END").alias("r_1e6"),
            F.expr("(tot_c * 1000000) DIV tot_n").alias("base_1e6"),
        )
        .select(
            "tok",
            "b",
            "r_1e6",
            "base_1e6",
            F.greatest(F.lit(0).cast("long"), F.col("r_1e6") - F.col("base_1e6")).alias(
                "cost0"
            ),
            F.greatest(
                F.lit(0).cast("long"),
                F.expr(f"(base_1e6 * {s_num}) DIV {s_den}") - F.col("r_1e6"),
            ).alias("cost1"),
        )
    )


# the one-HOF Viterbi: per-state best (cost, packed path id), least()
# over structs = lexicographic (cost, id) min — deterministic ties AND
# no backtracking (the winning id is the state sequence)
_DP = f"""
aggregate(
  arr,
  named_struct('d0', CAST(0 AS BIGINT), 'i0', CAST(0 AS BIGINT),
               'd1', CAST({_INF} AS BIGINT), 'i1', CAST(0 AS BIGINT),
               't', CAST(0 AS BIGINT)),
  (a, x) -> named_struct(
    'd0', least(named_struct('d', a.d0, 'i', a.i0),
                named_struct('d', a.d1, 'i', a.i1)).d + x.c0,
    'i0', least(named_struct('d', a.d0, 'i', a.i0),
                named_struct('d', a.d1, 'i', a.i1)).i,
    'd1', least(named_struct('d', a.d0 + {BURST_GAMMA}, 'i', a.i0),
                named_struct('d', a.d1, 'i', a.i1)).d + x.c1,
    'i1', least(named_struct('d', a.d0 + {BURST_GAMMA}, 'i', a.i0),
                named_struct('d', a.d1, 'i', a.i1)).i
          + shiftleft(CAST(1 AS BIGINT), CAST(a.t AS INT)),
    't', a.t + 1),
  a -> least(named_struct('d', a.d0, 'i', a.i0),
             named_struct('d', a.d1, 'i', a.i1)))
"""


def burst_path(costs: DataFrame) -> DataFrame:
    """(tok, cost, path_id) — the optimal automaton path per token:
    minimal total cost, ties broken toward the lexicographically
    smallest packed state sequence (LSB = bin 0). One agg to build the
    ordered cost array, one projection for the whole DP."""
    arr = costs.groupBy("tok").agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct("
            "'b', b, 'c0', cost0, 'c1', cost1))),"
            " e -> named_struct('c0', e.c0, 'c1', e.c1))"
        ).alias("arr")
    )
    return arr.select(
        "tok",
        F.expr(_DP + ".d").alias("cost"),
        F.expr(_DP + ".i").alias("path_id"),
    )


def burst_states(costs: DataFrame, bins: int = BURST_BINS) -> DataFrame:
    """(tok, b, state) — the decoded per-bin automaton state, unpacked
    from the winning path id."""
    p = burst_path(costs)
    return p.select(
        "tok",
        F.explode(F.expr(f"sequence(0, {bins - 1})")).alias("b"),
        "path_id",
    ).select(
        "tok",
        F.col("b").cast("long").alias("b"),
        F.expr("shiftright(path_id, CAST(b AS INT)) & 1").alias("state"),
    )


def burst_intervals(costs: DataFrame, bins: int = BURST_BINS) -> DataFrame:
    """(tok, b_lo, b_hi, len) — maximal bursting runs (the trending
    intervals a frontier scheduler consumes), gaps-and-islands over the
    decoded states."""
    st = burst_states(costs, bins).where(F.col("state") == 1)
    isl = st.withColumn(
        "isl",
        F.col("b")
        - F.row_number().over(Window.partitionBy("tok").orderBy("b")),
    )
    return isl.groupBy("tok", "isl").agg(
        F.min("b").alias("b_lo"),
        F.max("b").alias("b_hi"),
        F.count("*").alias("len"),
    ).select("tok", "b_lo", "b_hi", "len")
