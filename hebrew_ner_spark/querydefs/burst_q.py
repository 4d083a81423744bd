"""Gates for Kleinberg-style burst detection (operators/burst.py).

The decode oracle is EXHAUSTIVE ENUMERATION: all 2^BINS state paths per
token, scored long-form (emission sum + gamma per 0->1 rise via
bit_count), argmin with the same (cost, path_id) tie order the Spark
DP's struct-least carries. The engines agree only if the one-HOF
Viterbi is exactly right — the CRF-gate standard applied to the
built-in-only DP. Upstream cells (counts, costs) gate separately so a
drift localizes. CTE names b-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.functions.hashing import phash_duck
from hebrew_ner_spark.operators import burst
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

B = burst.BURST_BINS
G = burst.BURST_GAMMA
MASK = (1 << B) - 1

_BTB = f"""
bd AS (SELECT event_type AS tok, epoch_us(ts) AS t FROM events),
bb AS (SELECT min(t) AS tmn, max(t) AS tmx FROM bd),
bn AS (SELECT tok, ((t - tmn) * {B}) // (tmx - tmn + 1) AS b FROM bd, bb),
bc AS (SELECT tok, b, count(*) AS c_raw FROM bn GROUP BY tok, b),
bgrid AS (SELECT tok, b FROM (SELECT DISTINCT tok FROM bd) bt, range({B}) r(b)),
bdn AS (SELECT bgrid.tok, bgrid.b, coalesce(c_raw, 0) AS c_raw
        FROM bgrid LEFT JOIN bc ON bgrid.tok = bc.tok AND bgrid.b = bc.b),
bsp AS (SELECT tok, b,
               CAST(CASE WHEN ({phash_duck("tok || '|' || b", burst.BURST_SEED)})
                              % {burst.BURST_SPIKE_MOD} = 0
                         THEN c_raw * {burst.BURST_SPIKE} ELSE c_raw END
                    AS BIGINT) AS c
        FROM bdn),
btot AS (SELECT b, CAST(sum(c) AS BIGINT) AS n FROM bsp GROUP BY b),
btb AS (SELECT tok, bsp.b, c, n FROM bsp JOIN btot ON bsp.b = btot.b)
"""

_BE = f"""
bw AS (SELECT tok, CAST(sum(c) AS BIGINT) AS tot_c,
              CAST(sum(n) AS BIGINT) AS tot_n FROM btb GROUP BY tok),
bcst AS (SELECT btb.tok, b,
                CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
                     ELSE (c * 1000000) // n END AS r_1e6,
                (tot_c * 1000000) // tot_n AS base_1e6
         FROM btb JOIN bw ON btb.tok = bw.tok),
be AS (SELECT tok, b, r_1e6, base_1e6,
              greatest(CAST(0 AS BIGINT), r_1e6 - base_1e6) AS cost0,
              greatest(CAST(0 AS BIGINT),
                       (base_1e6 * {burst.BURST_S_NUM}) // {burst.BURST_S_DEN}
                         - r_1e6) AS cost1
       FROM bcst)
"""

# exhaustive path enumeration + (cost, path) argmin
_BBEST = f"""
bp AS (SELECT p FROM range({1 << B}) r(p)),
bpc AS (SELECT tok, p,
               CAST(sum(CASE WHEN (p >> CAST(b AS INT)) & 1 = 0
                             THEN cost0 ELSE cost1 END) AS BIGINT) AS emit
        FROM be, bp GROUP BY tok, p),
btc AS (SELECT tok, p,
               emit + {G} * bit_count(CAST(p & ~(p * 2) & {MASK} AS BIGINT))
                 AS cost
        FROM bpc),
bbest AS (SELECT tok, p, cost FROM btc
          QUALIFY row_number() OVER (PARTITION BY tok ORDER BY cost, p) = 1)
"""


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _costs(spark, sf_dir):
    return burst.burst_costs(burst.token_bins(_events(spark, sf_dir)))


@query(
    "burst_bins",
    oracle=f"WITH {_BTB} SELECT tok, b, c, n FROM btb",
)
def burst_bins(spark, sf_dir):
    """The planted token-x-bin count matrix (spike placement included —
    any drift in the hash or densification cascades into the decode)."""
    return burst.token_bins(_events(spark, sf_dir))


@query(
    "burst_costs",
    oracle=f"""
    WITH {_BTB}, {_BE}
    SELECT tok, b, r_1e6, base_1e6, cost0, cost1 FROM be
    """,
)
def burst_costs(spark, sf_dir):
    """The automaton emission costs (micro-unit shares vs baseline)."""
    return _costs(spark, sf_dir)


@query(
    "burst_path",
    oracle=f"""
    WITH {_BTB}, {_BE}, {_BBEST}
    SELECT tok, cost, CAST(p AS BIGINT) AS path_id FROM bbest
    """,
)
def burst_path(spark, sf_dir):
    """The optimal path per token: one-HOF Viterbi vs exhaustive 2^16
    enumeration, cost AND packed state sequence both bit-exact."""
    return burst.burst_path(_costs(spark, sf_dir))


@query(
    "burst_states",
    oracle=f"""
    WITH {_BTB}, {_BE}, {_BBEST}
    SELECT tok, CAST(r.b AS BIGINT) AS b,
           CAST((p >> CAST(r.b AS INT)) & 1 AS BIGINT) AS state
    FROM bbest, range({B}) r(b)
    """,
)
def burst_states(spark, sf_dir):
    """The decoded per-bin states (the long-form consumers read)."""
    return burst.burst_states(_costs(spark, sf_dir))


@query(
    "burst_intervals",
    oracle=f"""
    WITH {_BTB}, {_BE}, {_BBEST},
    bst AS (SELECT tok, CAST(r.b AS BIGINT) AS b
            FROM bbest, range({B}) r(b)
            WHERE (p >> CAST(r.b AS INT)) & 1 = 1),
    bisl AS (SELECT tok, b,
                    b - row_number() OVER (PARTITION BY tok ORDER BY b) AS isl
             FROM bst)
    SELECT tok, min(b) AS b_lo, max(b) AS b_hi, count(*) AS len
    FROM bisl GROUP BY tok, isl
    """,
)
def burst_intervals(spark, sf_dir):
    """Maximal trending intervals (gaps-and-islands over the decode) —
    the table a crawl-frontier scheduler consumes."""
    return burst.burst_intervals(_costs(spark, sf_dir))
