"""Z-order (Morton-curve) data layout + multi-dimensional pruning payoff.

``maintenance.zorder_keys`` ships the raw key primitive (interleave two
already-integer columns) and ``maintenance.manifest_prune`` gates HOW a
lakehouse scan planner uses per-file min/max stats; this module closes
the loop between them — it gates WHY the write-time layout decides
whether those stats are worth anything. A table sorted by one
column has tight file stats on that column only — probe any OTHER
dimension and every file's [min, max] spans the whole domain, so pruning
keeps everything (a full scan wearing metadata clothes). Interleaving
the bits of several dimensions into one Morton key and laying files out
along it bounds every file to a small hyper-rectangle, so file stats
prune on ALL interleaved dimensions at once — Iceberg/Delta's
``OPTIMIZE ZORDER BY``, the standard multi-dim clustering move for a
10^12-row events/pages table probed by (user, time) or (host, time).

Everything is exact integer arithmetic (quantize by trunc division over
broadcast 1-row global bounds, interleave as an unrolled sum of
shift/mask terms both engines evaluate bit-for-bit), so the DuckDB
oracle replays the full key -> rank -> file -> stats -> probe chain.

Shape at 10^12 rows:

* global dim bounds: ONE map-side-combined min/max agg, broadcast back
  as a 1-row frame (no driver collect);
* the Morton key: a pure codegen projection (shift/and/or over longs);
* file assignment: two-level global rank — rank inside a monotone
  key-range bucket (hash-partitioned window) + broadcast cumulative
  bucket offsets, the ``build_vocab`` discipline — so the layout sort
  never funnels through one task; ``file_id = (rank-1)*F DIV n``, the
  equal-row-count files a writer actually emits;
* file stats + probe counting are metadata-grain (F rows), the whole
  point: the planner answers "which files can contain user u" from F
  rows instead of 10^12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Z_BITS = 8       # quantization bits per dimension
Z_FILES = 64     # synthetic file count for the layout simulation
Z_BUCKETS = 64   # rank buckets for the two-level layout sort
Z_TS_PROBES = 16 # disjoint time windows in the ts probe family


def _quantize_sql(v: str, mn: str, mx: str, bits: int = Z_BITS) -> str:
    """Spark-SQL fragment mapping v in [mn, mx] to [0, 2^bits - 1] by
    exact trunc division (operands nonnegative after the shift, so Spark
    DIV == DuckDB // on the oracle side); a degenerate dimension
    (mx == mn) quantizes to 0 everywhere."""
    top = (1 << bits) - 1
    return (
        f"CASE WHEN {mx} = {mn} THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(({v} - {mn}) * {top} AS BIGINT) DIV ({mx} - {mn}) END"
    )


def _interleave_sql(qcols: list[str], bits: int = Z_BITS) -> str:
    """Unrolled Morton interleave: bit j of dimension i lands at
    position j*ndim + i — the ``maintenance._interleave`` lane spread
    (this module adds the quantize/layout/payoff chain on top of that
    shared key primitive). ndim*bits <= 62 keeps it in int64."""
    nd = len(qcols)
    assert nd * bits <= 62, "Morton key must fit a signed 64-bit long"
    if nd == 2:
        from hebrew_ner_spark.operators.maintenance import _interleave

        return (
            f"CAST({_interleave(qcols[0], 0, bits)}"
            f" + {_interleave(qcols[1], 1, bits)} AS BIGINT)"
        )
    terms = [
        f"(shiftleft(shiftright({q}, {j}) & 1, {j * nd + i}))"
        for j in range(bits)
        for i, q in enumerate(qcols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def interleave_duck(qcols: list[str], bits: int = Z_BITS) -> str:
    """The identical interleave in DuckDB syntax (>> & <<)."""
    nd = len(qcols)
    terms = [
        f"((({q} >> {j}) & 1) << {j * nd + i})"
        for j in range(bits)
        for i, q in enumerate(qcols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def quantize_duck(v: str, mn: str, mx: str, bits: int = Z_BITS) -> str:
    """The identical quantizer in DuckDB syntax (// floor-div == Spark
    trunc DIV on the nonnegative operands the shift guarantees)."""
    top = (1 << bits) - 1
    return (
        f"CASE WHEN {mx} = {mn} THEN CAST(0 AS BIGINT) "
        f"ELSE CAST((({v} - {mn}) * {top}) // ({mx} - {mn}) AS BIGINT) END"
    )


def event_dims(events: DataFrame) -> DataFrame:
    """(event_id, u, t) — the two clustering dimensions at exact integer
    grain: user id and epoch microseconds."""
    return events.select(
        "event_id",
        F.col("user_id").cast("long").alias("u"),
        # NTZ parquet; session tz pinned UTC -> epoch_us(ts) on the oracle
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )


def zorder_keys(events: DataFrame, bits: int = Z_BITS) -> DataFrame:
    """(event_id, q_u, q_t, zkey) — quantized dims + Morton key.

    Bounds arrive as a broadcast 1-row crossJoin (global min/max agg);
    the key itself is one codegen projection.
    """
    d = event_dims(events)
    bounds = d.agg(
        F.min("u").alias("mn_u"),
        F.max("u").alias("mx_u"),
        F.min("t").alias("mn_t"),
        F.max("t").alias("mx_t"),
    )
    qu = _quantize_sql("u", "mn_u", "mx_u", bits)
    qt = _quantize_sql("t", "mn_t", "mx_t", bits)
    return (
        d.crossJoin(F.broadcast(bounds))
        .select(
            "event_id",
            F.expr(qu).alias("q_u"),
            F.expr(qt).alias("q_t"),
        )
        .select(
            "event_id",
            "q_u",
            "q_t",
            F.expr(_interleave_sql(["q_u", "q_t"], bits)).alias("zkey"),
        )
    )


def _file_assign(
    keyed: DataFrame, order_col: str, files: int, buckets: int = Z_BUCKETS
) -> DataFrame:
    """(event_id, file_id) — equal-row-count files along ``order_col``
    (ties broken by event_id), via the two-level global rank: bucket =
    monotone value-range slice, window inside buckets, broadcast offsets.
    """
    bounds = keyed.agg(
        F.min(order_col).alias("_mn"),
        F.max(order_col).alias("_mx"),
        F.count("*").alias("_n"),
    )
    b = keyed.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt",
        F.expr(
            f"CASE WHEN _mx = _mn THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(({order_col} - _mn) * {buckets - 1} AS BIGINT) DIV (_mx - _mn) END"
        ),
    )
    local = b.withColumn(
        "_lr",
        F.row_number().over(
            Window.partitionBy("_bkt").orderBy(order_col, "event_id")
        ),
    )
    counts = b.groupBy("_bkt").agg(F.count("*").alias("_cnt"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_bkt", "_off")
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .select(
            "event_id",
            ((F.col("_off") + F.col("_lr") - 1) * files).alias("_num"),
            F.col("_n"),
        )
        .select("event_id", F.expr("_num DIV _n").alias("file_id"))
    )


def layout(events: DataFrame, scheme: str, files: int = Z_FILES) -> DataFrame:
    """(event_id, u, t, file_id) under a layout scheme: 'zorder' (Morton
    key over user x time) or 'linear_ts' (time-sorted — the layout an
    append-only ingest produces naturally)."""
    d = event_dims(events)
    if scheme == "zorder":
        keyed = zorder_keys(events).select("event_id", "zkey")
        assigned = _file_assign(keyed, "zkey", files)
    elif scheme == "linear_ts":
        assigned = _file_assign(d.select("event_id", "t"), "t", files)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown layout scheme: {scheme}")
    return d.join(assigned, "event_id")


def file_stats(laid: DataFrame) -> DataFrame:
    """(file_id, n_rows, mn_u, mx_u, mn_t, mx_t) — the per-file column
    stats an Iceberg manifest records for the laid-out table."""
    return laid.groupBy("file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("u").alias("mn_u"),
        F.max("u").alias("mx_u"),
        F.min("t").alias("mn_t"),
        F.max("t").alias("mx_t"),
    )


def prune_compare(events: DataFrame, files: int = Z_FILES) -> DataFrame:
    """(layout, probe_family, n_probes, files_touched, n_files) — the
    payoff table: how many files each probe family's planner must scan
    under each layout, from file stats alone.

    Probe families: one equality probe per distinct user ('by_user'),
    and ``Z_TS_PROBES`` equal-width disjoint time windows ('by_ts').
    Every count is exact; the joins are broadcast (probes x F metadata
    rows). The z-order claim this gate pins: by_user touches FAR fewer
    files than linear_ts's all-files worst case, while by_ts stays
    sub-linear — the bounded-hyper-rectangle property.
    """
    d = event_dims(events)
    users = d.select(F.col("u").alias("pu")).distinct()
    tb = d.agg(F.min("t").alias("tmn"), F.max("t").alias("tmx"))
    windows = (
        d.sparkSession.range(Z_TS_PROBES)
        .select(F.col("id").alias("w"))
        .crossJoin(F.broadcast(tb))
        .select(
            "w",
            F.expr(
                f"tmn + ((tmx - tmn + 1) * w) DIV {Z_TS_PROBES}"
            ).alias("plo"),
            F.expr(
                f"tmn + ((tmx - tmn + 1) * (w + 1)) DIV {Z_TS_PROBES}"
            ).alias("phi_excl"),
        )
    )
    out = []
    for scheme in ("zorder", "linear_ts"):
        st = file_stats(layout(events, scheme, files)).persist()
        nf = st.select(F.count("*").alias("n_files"))
        by_user = (
            users.join(
                F.broadcast(st),
                (F.col("mn_u") <= F.col("pu")) & (F.col("pu") <= F.col("mx_u")),
            )
            .agg(
                F.count_distinct("pu").alias("n_probes"),
                F.count("*").alias("files_touched"),
            )
            .crossJoin(F.broadcast(nf))
            .select(
                F.lit(scheme).alias("layout"),
                F.lit("by_user").alias("probe_family"),
                "n_probes",
                "files_touched",
                "n_files",
            )
        )
        by_ts = (
            windows.join(
                F.broadcast(st),
                (F.col("mn_t") < F.col("phi_excl")) & (F.col("plo") <= F.col("mx_t")),
            )
            .agg(
                F.count_distinct("w").alias("n_probes"),
                F.count("*").alias("files_touched"),
            )
            .crossJoin(F.broadcast(nf))
            .select(
                F.lit(scheme).alias("layout"),
                F.lit("by_ts").alias("probe_family"),
                "n_probes",
                "files_touched",
                "n_files",
            )
        )
        out.append(by_user.unionByName(by_ts))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


# ---------------------------------------------------------------------------
# Graph-layout compressibility audit (WebGraph/BV gap coding)
# ---------------------------------------------------------------------------
#
# The zx_* gates audit what a LAYOUT buys multi-dimensional scans; this
# one audits what a NODE ORDERING buys adjacency-list storage — the
# Boldi-Vigna WebGraph observation that a good relabeling (hubs first,
# similar lists adjacent) shrinks the Elias-gamma-coded destination
# gaps. At 10^12 edges the serialized graph IS a storage line item, and
# the orderings' costs are pure integer arithmetic both engines replay:
# gamma(x) = 2*bitlen(x) - 1 bits; a sorted adjacency list costs
# gamma(first+1) + sum gamma(d_i - d_{i-1}).


def gamma_code_cost(und_edges: DataFrame) -> DataFrame:
    """(ordering, n_nodes, n_edges, total_bits, bits_per_edge_1e6) —
    Elias-gamma adjacency-coding cost of the symmetrized graph under
    two labelings: 'natural' (raw node ids) and 'degree'
    (rank by degree desc, id asc — the WebGraph-style hubs-first
    relabel). The label table is node-grain metadata (its rank window
    is a single tiny partition here; swap in the two-level rank of
    operators/labels.py for a 10^9-node corpus); the per-source gap
    windows partition by src — fully distributed. bits_per_edge is
    half-up integer micro-bits."""
    und = und_edges.select("a", "b")
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("_d"))
    lab = deg.select(
        F.col("a").alias("node"),
        (
            F.row_number().over(Window.orderBy(F.desc("_d"), F.asc("a"))) - 1
        ).cast("long").alias("dlab"),
    )

    def cost(adj: DataFrame, name: str) -> DataFrame:
        w = Window.partitionBy("src").orderBy("dst")
        g = adj.select(
            "src", "dst", F.lag("dst").over(w).alias("_prev")
        ).select(
            (
                2 * F.length(F.bin(
                    F.when(F.col("_prev").isNull(), F.col("dst") + 1)
                    .otherwise(F.col("dst") - F.col("_prev"))
                )) - 1
            ).cast("long").alias("bits")
        )
        return g.agg(
            F.lit(name).alias("ordering"),
            F.count("*").cast("long").alias("n_edges"),
            F.sum("bits").cast("long").alias("total_bits"),
        )

    natural = sym.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    degree = (
        sym.join(lab, sym.a == lab.node).select(
            F.col("dlab").alias("src"), F.col("b")
        )
        .join(lab, F.col("b") == lab.node)
        .select("src", F.col("dlab").alias("dst"))
    )
    nn = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    out = cost(natural, "natural").unionByName(cost(degree, "degree"))
    return out.crossJoin(F.broadcast(nn)).select(
        "ordering", "n_nodes", "n_edges", "total_bits",
        F.expr(
            "CAST((2 * total_bits * 1000000 + n_edges) DIV (2 * n_edges)"
            " AS BIGINT)"
        ).alias("bits_per_edge_1e6"),
    )
