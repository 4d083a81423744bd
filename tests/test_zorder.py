"""Z-order layout: Morton-key closed forms, equal-row file cut vs a
single global window, degenerate dims, the multi-dim pruning payoff
invariant, and the no-single-partition-sort plan shape."""

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import zorder


def _morton(qu: int, qt: int, bits: int = zorder.Z_BITS) -> int:
    z = 0
    for j in range(bits):
        z |= ((qu >> j) & 1) << (j * 2 + 0)
        z |= ((qt >> j) & 1) << (j * 2 + 1)
    return z


def _mk_events(spark, rows):
    """rows: (event_id, user_id, ts_string)"""
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestMortonKey:
    def test_closed_form_interleave(self, spark):
        # corners of the quantized grid + a mid point
        rows = [
            (0, 0, "2024-01-01 00:00:00"),    # (q_u, q_t) = (0, 0)
            (1, 255, "2024-01-01 00:00:00"),  # u max -> q_u = 255
            (2, 0, "2024-01-02 00:00:00"),    # t max -> q_t = 255
            (3, 255, "2024-01-02 00:00:00"),  # both max
        ]
        got = {
            r.event_id: (r.q_u, r.q_t, r.zkey)
            for r in zorder.zorder_keys(_mk_events(spark, rows)).collect()
        }
        assert got[0] == (0, 0, 0)
        assert got[1] == (255, 0, _morton(255, 0))
        assert got[2] == (0, 255, _morton(0, 255))
        assert got[3] == (255, 255, (1 << 16) - 1)

    def test_quantizer_monotone_and_bounded(self, spark):
        rows = [(i, i * 7 % 97, "2024-01-01 00:00:00") for i in range(97)]
        keys = zorder.zorder_keys(_mk_events(spark, rows)).collect()
        by_u = sorted((r.q_u for r in keys))
        assert by_u[0] == 0 and by_u[-1] == (1 << zorder.Z_BITS) - 1
        # degenerate time dimension -> q_t = 0 everywhere
        assert all(r.q_t == 0 for r in keys)

    def test_python_reference_parity(self, spark):
        rows = [
            (i, (i * 31) % 11, f"2024-01-01 00:{i:02d}:00") for i in range(40)
        ]
        keys = {r.event_id: r for r in zorder.zorder_keys(_mk_events(spark, rows)).collect()}
        assert all(
            keys[i].zkey == _morton(keys[i].q_u, keys[i].q_t) for i in range(40)
        )


class TestFileCut:
    def test_two_level_rank_equals_global_sort(self, spark):
        rows = [
            (i, (i * 13) % 29, f"2024-01-01 {i % 24:02d}:{(i * 7) % 60:02d}:00")
            for i in range(200)
        ]
        ev = _mk_events(spark, rows)
        laid = zorder.layout(ev, "zorder", files=16)
        keys = zorder.zorder_keys(ev).collect()
        order = sorted(keys, key=lambda r: (r.zkey, r.event_id))
        want = {
            r.event_id: (idx * 16) // len(order) for idx, r in enumerate(order)
        }
        got = {r.event_id: r.file_id for r in laid.collect()}
        assert got == want

    def test_files_equal_row_counts(self, spark):
        rows = [(i, i % 7, f"2024-01-01 00:00:{i % 60:02d}") for i in range(128)]
        laid = zorder.layout(_mk_events(spark, rows), "zorder", files=16)
        sizes = [
            r.n_rows for r in zorder.file_stats(laid).collect()
        ]
        assert len(sizes) == 16 and all(s == 8 for s in sizes)

    def test_no_single_partition_exchange(self, spark):
        rows = [(i, i % 7, f"2024-01-01 00:00:{i % 60:02d}") for i in range(64)]
        plan = (
            zorder.layout(_mk_events(spark, rows), "zorder")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the event-grain rank must be bucket-partitioned (never a
        # global unpartitioned window over event rows); the only
        # unpartitioned windows/exchanges left are the 1-row bounds
        # aggs and the <= Z_BUCKETS-row offset table
        assert "row_number() windowspecdefinition(_bkt" in plan


class TestPruningPayoff:
    def test_zorder_wins_on_the_unclustered_dim(self, spark, sf_dir):
        from hebrew_ner_spark.sources.catalog import load_table

        ev = load_table(spark, sf_dir, "events")
        rows = {
            (r.layout, r.probe_family): r
            for r in zorder.prune_compare(ev, files=16).collect()
        }
        zu, lu = rows[("zorder", "by_user")], rows[("linear_ts", "by_user")]
        zt, lt = rows[("zorder", "by_ts")], rows[("linear_ts", "by_ts")]
        # time-linear layout is the all-files worst case for user probes
        assert lu.files_touched == lu.n_probes * lu.n_files
        # z-order prunes real work off it
        assert zu.files_touched < lu.files_touched
        # and stays sub-linear on time probes (never the all-files case)
        assert zt.files_touched < zt.n_probes * zt.n_files
        # while linear_ts is near-perfect on its own sort dimension
        assert lt.files_touched <= zt.files_touched


def test_gamma_cost_matches_python_and_degree_wins(spark):
    """Gamma coding cost equals a pure-python replay on a fixed graph,
    and the hubs-first relabel strictly beats the natural order on the
    planted-farm graph (the Boldi-Vigna effect the gate exists for)."""
    import collections

    from hebrew_ner_spark.operators.weblinks import synth_farm_host_edges
    from hebrew_ner_spark.operators.zorder import gamma_code_cost

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    edges = synth_farm_host_edges(docs)
    out = {r.ordering: (r.n_nodes, r.n_edges, r.total_bits)
           for r in gamma_code_cost(edges).collect()}

    pairs = [(r.a, r.b) for r in edges.collect()]
    sym = pairs + [(b, a) for a, b in pairs]
    deg = collections.Counter(a for a, b in sym)
    order = sorted(deg, key=lambda v: (-deg[v], v))
    lab = {v: i for i, v in enumerate(order)}

    def gamma(x):
        return 2 * x.bit_length() - 1

    def cost(f):
        adj = collections.defaultdict(list)
        for a, b in sym:
            adj[f(a)].append(f(b))
        tot = 0
        for s in adj:
            prev = None
            for d in sorted(adj[s]):
                tot += gamma(d + 1 if prev is None else d - prev)
                prev = d
        return tot

    assert out["natural"] == (len(deg), len(sym), cost(lambda v: v))
    assert out["degree"] == (len(deg), len(sym), cost(lambda v: lab[v]))
    assert out["degree"][2] < out["natural"][2]
