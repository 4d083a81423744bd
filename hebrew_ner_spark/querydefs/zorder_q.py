"""Gates for the Z-order layout + multi-dim pruning payoff
(operators/zorder.py).

The oracle replays the whole chain long-form — epoch micros, broadcast
bounds, trunc-div quantizer, the unrolled shift/mask Morton interleave
(the SAME Python loop emits both engines' expressions), one global
row_number for the equal-row file cut (the oracle may single-thread what
the Spark side does two-level), per-file min/max stats, and the probe
count joins. Everything integer; CTE names zx-prefixed."""

from __future__ import annotations

from hebrew_ner_spark.operators import zorder
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

FILES = zorder.Z_FILES

_D = "SELECT event_id, CAST(user_id AS BIGINT) AS u, epoch_us(ts) AS t FROM events"

_B = "SELECT min(u) AS mn_u, max(u) AS mx_u, min(t) AS mn_t, max(t) AS mx_t FROM zxd"

_Q = (
    "SELECT event_id, "
    + zorder.quantize_duck("u", "mn_u", "mx_u")
    + " AS q_u, "
    + zorder.quantize_duck("t", "mn_t", "mx_t")
    + " AS q_t FROM zxd, zxb"
)

_K = (
    "SELECT event_id, q_u, q_t, "
    + zorder.interleave_duck(["q_u", "q_t"])
    + " AS zkey FROM zxq"
)

_KEYS_BASE = f"WITH zxd AS ({_D}), zxb AS ({_B}), zxq AS ({_Q}), zxk AS ({_K})"

# equal-row-count file cut along an order column (global rank oracle-side)
def _files_sql(order_col: str, src: str, files: int = FILES) -> str:
    return f"""
    SELECT event_id,
           ((row_number() OVER (ORDER BY {order_col}, event_id) - 1) * {files})
             // (count(*) OVER ()) AS file_id
    FROM {src}
    """


_STATS = """
    SELECT file_id, count(*) AS n_rows,
           min(u) AS mn_u, max(u) AS mx_u,
           min(t) AS mn_t, max(t) AS mx_t
    FROM zxf JOIN zxd USING (event_id)
    GROUP BY file_id
"""


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@query(
    "zx_keys",
    oracle=f"{_KEYS_BASE} SELECT event_id, q_u, q_t, zkey FROM zxk",
)
def zx_keys(spark, sf_dir):
    """The Morton keys themselves: quantizer + interleave bit-for-bit.
    Any drift here silently reshapes every file downstream, so the key
    table gets its own hash row."""
    return zorder.zorder_keys(_events(spark, sf_dir))


@query(
    "zx_file_stats",
    oracle=f"""
    {_KEYS_BASE},
    zxf AS ({_files_sql('zkey', 'zxk')})
    {_STATS}
    """,
)
def zx_file_stats(spark, sf_dir):
    """Per-file Iceberg-manifest stats under the z-order layout — the
    two-level distributed rank must cut the exact same equal-row files
    as the oracle's single global window (monotone-bucket argument)."""
    laid = zorder.layout(_events(spark, sf_dir), "zorder")
    return zorder.file_stats(laid)


@query(
    "zx_prune_compare",
    oracle=f"""
    {_KEYS_BASE},
    zxlin AS (SELECT event_id, t AS okey FROM zxd),
    zxboth AS (
      SELECT 'zorder' AS layout, event_id, file_id
      FROM ({_files_sql('zkey', 'zxk')})
      UNION ALL
      SELECT 'linear_ts' AS layout, event_id, file_id
      FROM ({_files_sql('okey', 'zxlin')})
    ),
    zxst AS (
      SELECT layout, file_id, min(u) AS mn_u, max(u) AS mx_u,
             min(t) AS mn_t, max(t) AS mx_t
      FROM zxboth JOIN zxd USING (event_id)
      GROUP BY layout, file_id
    ),
    zxnf AS (SELECT layout, count(*) AS n_files FROM zxst GROUP BY layout),
    zxu AS (SELECT DISTINCT u AS pu FROM zxd),
    zxtb AS (SELECT min(t) AS tmn, max(t) AS tmx FROM zxd),
    zxw AS (
      SELECT w, tmn + ((tmx - tmn + 1) * w) // {zorder.Z_TS_PROBES} AS plo,
             tmn + ((tmx - tmn + 1) * (w + 1)) // {zorder.Z_TS_PROBES} AS phi_excl
      FROM range({zorder.Z_TS_PROBES}) r(w), zxtb
    ),
    zxbyu AS (
      SELECT s.layout, 'by_user' AS probe_family,
             count(DISTINCT p.pu) AS n_probes,
             count(*) AS files_touched
      FROM zxu p JOIN zxst s ON s.mn_u <= p.pu AND p.pu <= s.mx_u
      GROUP BY s.layout
    ),
    zxbyt AS (
      SELECT s.layout, 'by_ts' AS probe_family,
             count(DISTINCT p.w) AS n_probes,
             count(*) AS files_touched
      FROM zxw p JOIN zxst s ON s.mn_t < p.phi_excl AND p.plo <= s.mx_t
      GROUP BY s.layout
    )
    SELECT layout, probe_family, n_probes, files_touched, n_files
    FROM (SELECT * FROM zxbyu UNION ALL SELECT * FROM zxbyt) zx
    JOIN zxnf USING (layout)
    """,
)
def zx_prune_compare(spark, sf_dir):
    """The payoff: files a stats-pruning planner must scan per probe
    family under z-order vs time-linear layout, same file count. The
    multi-dim claim is in the numbers: by_user collapses from the
    linear layout's every-file worst case, by_ts stays sub-linear."""
    return zorder.prune_compare(_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Graph-layout compressibility (Elias-gamma gap coding under orderings)
# ---------------------------------------------------------------------------

from hebrew_ner_spark.operators import weblinks as _wl  # noqa: E402

_GAMMA_GRAPH = f"""
    hs AS (SELECT DISTINCT doc_id % {_wl.FARM_HOSTS} AS h FROM documents),
    bg AS (
      SELECT least(h, (h * 17 + 3) % {_wl.FARM_HOSTS}) AS a,
             greatest(h, (h * 17 + 3) % {_wl.FARM_HOSTS}) AS b
      FROM hs WHERE h <> (h * 17 + 3) % {_wl.FARM_HOSTS}
      UNION
      SELECT least(h, (h * 29 + 11) % {_wl.FARM_HOSTS}),
             greatest(h, (h * 29 + 11) % {_wl.FARM_HOSTS})
      FROM hs WHERE h <> (h * 29 + 11) % {_wl.FARM_HOSTS}
    ),
    farm AS (SELECT x.h AS a, y.h AS b FROM hs x, hs y
             WHERE x.h >= {_wl.FARM_LO} AND y.h >= {_wl.FARM_LO}
               AND x.h < y.h),
    und AS (SELECT a, b FROM bg UNION SELECT a, b FROM farm),
    sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
    deg AS (SELECT a, count(*) AS d FROM sym GROUP BY a),
    lab AS (SELECT a AS node,
                   row_number() OVER (ORDER BY d DESC, a) - 1 AS dlab
            FROM deg),
    nat AS (SELECT a AS src, b AS dst FROM sym),
    dgr AS (SELECT la.dlab AS src, lb.dlab AS dst
            FROM sym JOIN lab la ON la.node = sym.a
                     JOIN lab lb ON lb.node = sym.b),
    nn AS (SELECT count(*) AS n_nodes FROM deg)
"""

_GAMMA_COST = """
    SELECT '{name}' AS ordering,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(2 * length(bin(CASE WHEN prev IS NULL THEN dst + 1
                                        ELSE dst - prev END)) - 1) AS BIGINT)
             AS total_bits
    FROM (SELECT src, dst,
                 lag(dst) OVER (PARTITION BY src ORDER BY dst) AS prev
          FROM {rel})
"""


@query(
    "zx_graph_gamma",
    oracle=f"""
    WITH {_GAMMA_GRAPH},
    costs AS ({_GAMMA_COST.format(name="natural", rel="nat")}
              UNION ALL
              {_GAMMA_COST.format(name="degree", rel="dgr")})
    SELECT ordering, CAST(n_nodes AS BIGINT) AS n_nodes, n_edges, total_bits,
           (2 * total_bits * 1000000 + n_edges) // (2 * n_edges)
             AS bits_per_edge_1e6
    FROM costs CROSS JOIN nn
    """,
)
def zx_graph_gamma(spark, sf_dir):
    """WebGraph-style storage audit of the planted host graph: total
    Elias-gamma bits of the sorted adjacency gaps under the natural and
    the hubs-first (degree desc) labelings. The degree ordering must
    cost fewer bits here (pytest-pinned), the Boldi-Vigna effect the
    relabel exists for."""
    return zorder.gamma_code_cost(
        _wl.synth_farm_host_edges(load_table(spark, sf_dir, "documents"))
    )
