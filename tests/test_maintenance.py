"""Table-maintenance tests: bin packing and Z-order keys."""

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import maintenance


def test_compaction_groups_respect_target(spark):
    files = spark.createDataFrame(
        [(i, b) for i, b in enumerate([400, 400, 400, 900, 100, 100, 1200, 50])],
        "file_id long, bytes long",
    )
    out = {r.file_id: r.grp for r in maintenance.compaction_plan(files, target=1000).collect()}
    # cumsums before: 0,400,800,1200,2100,2200,2300,3500 -> groups 0,0,0,1,2,2,2,3
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 2, 6: 2, 7: 3}


def test_compaction_group_sizes_bounded(spark):
    """Every group's total is < target + its last file's size (greedy
    invariant), and groups are contiguous in file_id."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inv = maintenance.synth_file_inventory(docs)
    out = maintenance.compaction_plan(inv).orderBy("file_id").collect()
    by_grp = {}
    last_grp = 0
    for r in out:
        assert r.grp >= last_grp  # contiguity / monotonicity
        last_grp = r.grp
        by_grp.setdefault(r.grp, []).append(r.bytes)
    for g, sizes in by_grp.items():
        assert sum(sizes) < maintenance.TARGET_BYTES + sizes[-1]


def test_compaction_two_level_crosses_buckets(spark):
    """With bucket_span=4 the 8-file fixture spans two cumsum buckets;
    the cross-bucket offsets must reproduce the global running total —
    and the file-grain window must be hash-partitioned (the plan's only
    un-partitioned ordered window runs over bucket counts)."""
    sizes = [400, 400, 400, 900, 100, 100, 1200, 50]
    files = spark.createDataFrame(
        [(i, b) for i, b in enumerate(sizes)], "file_id long, bytes long"
    )
    out = {
        r.file_id: r.grp
        for r in maintenance.compaction_plan(
            files, target=1000, bucket_span=4
        ).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 2, 6: 2, 7: 3}
    import re

    plan = maintenance.compaction_plan(files, target=1000, bucket_span=4)
    phys = plan._jdf.queryExecution().executedPlan().toString()
    # the file-grain window must be partitioned by the bucket key:
    # windowspecdefinition(_bkt#N, file_id#M ASC ...) — the un-partitioned
    # ordered window may appear only over the bucket-count aggregate (_n)
    assert re.search(r"windowspecdefinition\(_bkt#\d+L?, file_id#", phys)
    assert not re.search(r"windowspecdefinition\(file_id#", phys)


def test_zorder_interleave_closed_form(spark):
    df = spark.createDataFrame(
        [(0, 0b1010, 0b0110)], "doc_id long, x long, y long"
    )
    z = maintenance.zorder_keys(df, "x", "y").collect()[0].zkey
    want = 0
    for i in range(16):
        want |= ((0b1010 >> i) & 1) << (2 * i)
        want |= ((0b0110 >> i) & 1) << (2 * i + 1)
    assert z == want == 0b01101100


def test_zorder_locality(spark):
    """Points close in both dims are close in zkey: the max zkey gap
    within a 2x2 block is far below the gap across distant blocks."""
    rows = [(i * 100 + j, i, j) for i in range(4) for j in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, x long, y long")
    z = {(r.x, r.y): r.zkey for r in maintenance.zorder_keys(df, "x", "y").collect()}
    block = [z[(x, y)] for x in (0, 1) for y in (0, 1)]
    far = z[(3, 3)]
    assert max(block) - min(block) == 3          # 2x2 block is 4 consecutive codes
    assert far - max(block) > 10


def test_manifest_prune_decisions(spark):
    docs = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    out = maintenance.manifest_prune(maintenance.synth_file_stats(docs)).collect()
    lo, hi = maintenance.PRUNE_LO, maintenance.PRUNE_HI
    n_part_skip = n_stat_skip = n_scan = 0
    for r in out:
        d = (r["file_id"] * 37) % 1000 // 100
        part_overlap = d * 100 <= hi and d * 100 + 99 >= lo
        assert r["part_kept"] == int(part_overlap)
        if r["file_id"] % 17 == 0:
            # NULL stats: never pruned at the stats level
            assert r["stats_kept"] == 1
        else:
            mn = (r["file_id"] * 37) % 1000
            mx = min(mn + r["file_id"] % 50, d * 100 + 99)
            assert r["stats_kept"] == int(not (mx < lo or mn > hi))
        assert r["scan"] == r["part_kept"] * r["stats_kept"]
        n_part_skip += 1 - r["part_kept"]
        n_stat_skip += r["part_kept"] * (1 - r["stats_kept"])
        n_scan += r["scan"]
    # non-vacuous at every level
    assert n_part_skip > 0 and n_stat_skip > 0 and n_scan > 0


def test_manifest_prune_never_drops_overlapping_file(spark):
    # losslessness: a file whose true stats range overlaps the predicate
    # is ALWAYS scanned (stats range is inside the partition interval by
    # construction, so partition pruning cannot drop it either)
    docs = spark.range(0, 800).withColumnRenamed("id", "doc_id")
    lo, hi = maintenance.PRUNE_LO, maintenance.PRUNE_HI
    for r in maintenance.manifest_prune(maintenance.synth_file_stats(docs)).collect():
        if r["file_id"] % 17 == 0:
            continue
        mn = (r["file_id"] * 37) % 1000
        mx = min(mn + r["file_id"] % 50, (mn // 100) * 100 + 99)
        if not (mx < lo or mn > hi):
            assert r["scan"] == 1, r


def test_prune_summary_closed_form(spark):
    rows = [  # (file_id, part_day, min_v, max_v, bytes)
        (1, 2, 250, 260, 100),   # scanned
        (2, 8, 850, 860, 300),   # partition-pruned
        (3, 2, 210, 215, 600),   # scanned
    ]
    df = spark.createDataFrame(
        rows, "file_id long, part_day long, min_v long, max_v long, bytes long"
    )
    got = maintenance.prune_summary(maintenance.manifest_prune(df)).collect()[0]
    assert (got["n_files"], got["n_scanned"]) == (3, 2)
    assert (got["bytes_total"], got["bytes_scanned"]) == (1000, 700)
    assert got["skip_share_1e6"] == 300000


def test_expire_snapshots_closed_form(spark):
    refs = spark.createDataFrame(
        [(0, 10), (1, 10),            # file 10: expired snaps only -> orphan
         (0, 11), (2, 11),            # file 11: one kept ref
         (3, 12)],                    # file 12: kept only
        "snap long, file_id long",
    )
    got = sorted(
        tuple(r)
        for r in maintenance.expire_snapshots(refs, keep_from=2)
        .select("file_id", "n_refs", "n_kept", "orphan")
        .collect()
    )
    assert got == [(10, 2, 0, 1), (11, 2, 1, 0), (12, 1, 1, 0)]


def test_expire_snapshots_synth_nonvacuous_and_consistent(spark):
    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = maintenance.expire_snapshots(
        maintenance.synth_snapshot_refs(docs)
    ).collect()
    assert any(r["orphan"] == 1 for r in out)
    assert any(r["orphan"] == 0 and r["n_kept"] < r["n_refs"] for r in out)
    for r in out:
        # python replay of the planted lifecycle
        a = r["file_id"] % 4
        last = min(a + r["file_id"] % 3, 3)
        assert r["n_refs"] == last - a + 1
        assert r["n_kept"] == max(0, last - max(a, 2) + 1)
        assert r["orphan"] == int(r["n_kept"] == 0)


class TestMergeOnRead:
    def _dfs(self, spark, rows, pos, eq):
        r = spark.createDataFrame(
            rows, "file_id long, pos long, doc_id long, lang string, data_seq long"
        )
        p = spark.createDataFrame(pos, "file_id long, pos long, seq long")
        e = spark.createDataFrame(eq, "lang string, seq long")
        return r, p, e

    def test_sequence_boundary_asymmetry(self, spark):
        # position delete at seq 2: applies to data_seq <= 2 (BOTH rows);
        # equality delete at seq 2: applies to data_seq < 2 (first only)
        rows = [
            (0, 0, 0, "he", 1),
            (1, 0, 100, "he", 2),
        ]
        r, p, e = self._dfs(
            spark, rows, [(0, 0, 2), (1, 0, 2)], [("he", 2)]
        )
        from hebrew_ner_spark.operators import maintenance as mnt

        # position deletes alone kill both
        live_pos = mnt.mor_read(r, p, e.limit(0)).collect()
        assert live_pos == []
        # equality delete alone kills only the data_seq-1 row
        live_eq = {
            x.doc_id for x in mnt.mor_read(r, p.limit(0), e).collect()
        }
        assert live_eq == {100}

    def test_old_position_delete_does_not_apply(self, spark):
        from hebrew_ner_spark.operators import maintenance as mnt

        rows = [(0, 0, 0, "xx", 3)]
        r, p, e = self._dfs(spark, rows, [(0, 0, 1)], [])
        assert len(mnt.mor_read(r, p, e).collect()) == 1

    def test_stats_precedence_and_totals(self, spark):
        from hebrew_ner_spark.operators import maintenance as mnt

        # row 0: both rules hit -> counts as position-deleted only
        rows = [(0, 0, 0, "he", 1), (0, 1, 1, "he", 1), (0, 2, 2, "xx", 1)]
        r, p, e = self._dfs(spark, rows, [(0, 0, 3)], [("he", 4)])
        st = mnt.mor_file_stats(r, p, e).collect()[0]
        assert (st.n_rows, st.n_pos_deleted, st.n_eq_deleted, st.n_live) == (
            3, 1, 1, 1,
        )
        live = {x.doc_id for x in mnt.mor_read(r, p, e).collect()}
        assert live == {2} and len(live) == st.n_live

    def test_deletes_broadcast(self, spark, sf_dir):
        from hebrew_ner_spark.operators import maintenance as mnt
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        plan = (
            mnt.mor_read(
                mnt.synth_mor_rows(docs),
                mnt.synth_pos_deletes(docs),
                mnt.synth_eq_deletes(spark),
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("BroadcastHashJoin") + plan.count(
            "BroadcastNestedLoopJoin"
        ) >= 2
        assert "SortMergeJoin" not in plan


class TestPartitionEvolution:
    def test_refined_spec_prunes_tighter(self, spark, sf_dir):
        from hebrew_ner_spark.operators import maintenance as mnt
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        summ = {
            r.spec_v: r
            for r in mnt.evolved_prune_summary(
                mnt.evolved_prune(mnt.synth_evolved_stats(docs))
            ).collect()
        }
        s1, s2 = summ[1], summ[2]
        # partition pruning alone keeps far fewer files under the
        # refined spec (probe width 201 of domain 1000: ~3/10 coarse
        # partitions overlap vs ~21/100 refined)
        assert s2.n_part_kept * s1.n_files < s1.n_part_kept * s2.n_files
        assert s2.skip_share_1e6 > s1.skip_share_1e6

    def test_files_never_leak_their_partition(self, spark, sf_dir):
        """Every planted file's [min_v, max_v] stays inside its own
        spec's partition interval — the layout guarantee partition
        pruning is allowed to rely on."""
        from hebrew_ner_spark.operators import maintenance as mnt
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        for r in mnt.synth_evolved_stats(docs).collect():
            w = mnt.SPEC1_WIDTH if r.spec_v == 1 else mnt.SPEC2_WIDTH
            assert r.part_val * w <= r.min_v <= r.max_v <= (r.part_val + 1) * w - 1


class TestSchemaEvolution:
    def test_rename_maps_by_field_id(self, spark):
        from hebrew_ner_spark.operators import maintenance as mnt

        v1 = spark.createDataFrame([(1, "old")], ["c_id", "c_body"])
        v2 = spark.createDataFrame([(2, "new", 9)], ["ident", "content", "score"])
        rows = {r.id: (r.body, r.score, r.schema_v)
                for r in mnt.evolved_schema_read(v1, v2).collect()}
        assert rows == {1: ("old", None, 1), 2: ("new", 9, 2)}


class TestMergeUpsert:
    def test_three_clause_semantics(self, spark):
        from hebrew_ner_spark.operators import maintenance as mnt

        target = spark.createDataFrame(
            [(1, 10, 5.0, "F"), (2, 20, 6.0, "O"), (3, 30, 7.0, "P")],
            "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
        )
        changes = spark.createDataFrame(
            [
                (1, "U", 11, 5.5, "P"),   # matched update
                (2, "D", 20, 6.0, "O"),   # matched delete
                (9, "I", 90, 9.0, "O"),   # not-matched insert
                (8, "D", 80, 8.0, "F"),   # not-matched delete: no-op
            ],
            "o_orderkey long, op string, o_custkey long, o_totalprice double, o_orderstatus string",
        )
        got = {
            r.o_orderkey: (r.o_custkey, r.o_total_cents, r.o_orderstatus)
            for r in mnt.merge_upsert(target, changes).collect()
        }
        assert got == {
            1: (11, 550, "P"),
            3: (30, 700, "P"),
            9: (90, 900, "O"),
        }

    def test_cdc_batch_is_disjoint_per_key(self, spark, sf_dir):
        from hebrew_ner_spark.operators import maintenance as mnt
        from hebrew_ner_spark.sources.catalog import load_table

        orders = load_table(spark, sf_dir, "orders")
        ch = mnt.synth_order_changes(orders)
        from pyspark.sql import functions as F

        assert ch.groupBy("o_orderkey").count().where("count > 1").count() == 0
        ops = {r.op for r in ch.select("op").distinct().collect()}
        assert ops == {"U", "D", "I"}


def test_join_advisor_all_three_strategies_fire(spark):
    """The gate-scaled thresholds must keep all three verdict branches
    live on the sf catalog (an all-BROADCAST table proves nothing), and
    the size model must match a hand computation on a fixture."""
    from hebrew_ner_spark.operators.maintenance import (
        ADV_NUM_W,
        ADV_SCHEMAS,
        ADV_STR_OVERHEAD,
        join_advice,
        table_size_stats,
    )
    from hebrew_ner_spark.sources.catalog import load_table

    tables = {t: load_table(spark, "/root/testdata/sf0.01", t)
              for t in ADV_SCHEMAS}
    stats = table_size_stats(tables)
    out = join_advice(stats).collect()
    verdicts = {r.strategy for r in out}
    assert verdicts == {"BROADCAST", "SHUFFLE", "BUCKET"}

    # size model spot check: region = n_rows * (8*1 + mean_len(r_name)+4)
    reg = tables["region"]
    n = reg.count()
    tot_len = reg.agg(F.sum(F.length("r_name"))).collect()[0][0]
    mean_len = (2 * tot_len + n) // (2 * n)
    exp = n * (ADV_NUM_W + mean_len + ADV_STR_OVERHEAD)
    got = {r.tbl: r.est_bytes for r in stats.collect()}["region"]
    assert got == exp


def test_mv_incremental_equals_recompute_and_drops_empty_groups(spark):
    """Constructed base + CDC: the maintained MV equals a recompute over
    the merged base, and a fully-deleted group vanishes."""
    from hebrew_ner_spark.operators.maintenance import (
        merge_upsert,
        mv_incremental,
    )

    base = spark.createDataFrame(
        [
            (8, 100, 10.0, "F"),    # bucket 0, lone member -> deleted
            (1, 101, 20.0, "O"),
            (9, 102, 30.0, "O"),    # bucket 1 with key 1
            (2, 103, 40.0, "F"),    # updated -> status P
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderstatus string",
    )
    changes = spark.createDataFrame(
        [
            (8, "D", 100, 10.0, "F"),
            (2, "U", 110, 45.0, "P"),
            (12, "I", 120, 5.0, "O"),   # bucket 4
        ],
        "o_orderkey long, op string, o_custkey long, o_totalprice double, o_orderstatus string",
    )
    maintained = {
        (r.o_orderstatus, r.bucket): (r.revenue_cents, r.n_orders)
        for r in mv_incremental(base, changes).collect()
    }
    merged = merge_upsert(base, changes)   # carries o_total_cents
    recomputed = {
        (r.o_orderstatus, r.bucket): (r.revenue_cents, r.n_orders)
        for r in merged.groupBy(
            "o_orderstatus",
            (F.col("o_orderkey") % 8).cast("long").alias("bucket"),
        )
        .agg(
            F.sum("o_total_cents").cast("long").alias("revenue_cents"),
            F.count("*").cast("long").alias("n_orders"),
        )
        .collect()
    }
    assert maintained == recomputed
    assert ("F", 0) not in maintained            # deleted group vanished
    assert maintained[("P", 2)] == (4500, 1)     # update retract+add
    assert maintained[("O", 4)] == (500, 1)      # insert


class TestScd2:
    def _hist(self, spark, rows):
        from datetime import datetime

        return spark.createDataFrame(
            [(u, datetime(2024, 1, d), t) for u, d, t in rows],
            "url string, warc_ts timestamp, text string",
        )

    def test_unchanged_runs_collapse(self, spark):
        from hebrew_ner_spark.operators.maintenance import scd2_collapse

        rows = [
            ("u", 1, "a"), ("u", 2, "a"), ("u", 3, "b"),
            ("u", 4, "b"), ("u", 5, "a"),
        ]
        out = scd2_collapse(self._hist(spark, rows)).collect()
        assert [(r.text, r.valid_from.day,
                 r.valid_to.day if r.valid_to else None,
                 r.is_current, r.version_no) for r in sorted(out, key=lambda r: r.version_no)] == [
            ("a", 1, 3, False, 1),
            ("b", 3, 5, False, 2),
            ("a", 5, None, True, 3),   # value returning reopens a NEW version
        ]

    def test_single_snapshot_is_current(self, spark):
        from hebrew_ner_spark.operators.maintenance import scd2_collapse

        out = scd2_collapse(self._hist(spark, [("u", 1, "a")])).collect()
        assert len(out) == 1 and out[0].is_current and out[0].version_no == 1

    def test_intervals_tile_per_key(self, spark):
        # [valid_from, valid_to) intervals abut exactly: each close
        # equals the next open, and only the last row is open-ended
        from hebrew_ner_spark.operators.maintenance import scd2_collapse

        rows = [("u", d, t) for d, t in enumerate("aabbccaa", start=1)]
        out = sorted(
            scd2_collapse(self._hist(spark, rows)).collect(),
            key=lambda r: r.version_no,
        )
        for prev, nxt in zip(out, out[1:]):
            assert prev.valid_to == nxt.valid_from
        assert out[-1].valid_to is None and out[-1].is_current


class TestEqDepthHistogram:
    def _orders(self, spark, prices):
        return spark.createDataFrame(
            [(i, float(p)) for i, p in enumerate(prices)],
            "o_orderkey long, o_totalprice double",
        )

    def test_uneven_split_front_loads_extra_rows(self, spark):
        # 10 rows into 4 buckets: sizes 3,3,2,2 (ntile semantics)
        h = maintenance.equi_depth_histogram(
            self._orders(spark, range(1, 11)), buckets=4
        )
        sizes = {r.bucket: r.n_rows for r in h.collect()}
        assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}

    def test_fewer_rows_than_buckets(self, spark):
        h = maintenance.equi_depth_histogram(
            self._orders(spark, [5, 9]), buckets=16
        ).collect()
        assert {r.bucket: r.n_rows for r in h} == {1: 1, 2: 1}

    def test_bounds_follow_sort_order(self, spark):
        h = sorted(
            maintenance.equi_depth_histogram(
                self._orders(spark, [40, 10, 30, 20]), buckets=2
            ).collect(),
            key=lambda r: r.bucket,
        )
        assert (h[0].lo_cents, h[0].hi_cents) == (1000, 2000)
        assert (h[1].lo_cents, h[1].hi_cents) == (3000, 4000)

    def test_selectivity_interpolation(self, spark):
        # one bucket [1000, 2000] cents with 4 rows; predicate covering
        # half the width estimates 2 rows (2e6 micro)
        orders = self._orders(spark, [10, 13, 17, 20])
        rep = maintenance.selectivity_report(
            orders, buckets=1, predicates=[(1000, 1500), (5000, 6000)]
        ).collect()
        by_id = {r.pred_id: r for r in rep}
        assert by_id[0].est_micro == 2_000_000
        assert by_id[0].actual_rows == 2
        assert by_id[0].err_micro == 0
        # disjoint predicate: zero estimate, zero actual
        assert by_id[1].est_micro == 0 and by_id[1].actual_rows == 0

    def test_point_bucket_contributes_fully(self, spark):
        # all-equal values -> bucket width 0 -> whole count, not DIV 0
        rep = maintenance.selectivity_report(
            self._orders(spark, [10, 10, 10]), buckets=1,
            predicates=[(500, 1500)],
        ).collect()[0]
        assert rep.est_micro == 3_000_000 and rep.actual_rows == 3


class TestJoinOrder:
    def test_left_deep_orders_are_interval_extensions(self):
        from hebrew_ner_spark.operators.maintenance import (
            JO_CHAIN,
            _left_deep_orders,
        )

        orders = _left_deep_orders(JO_CHAIN)
        assert len(orders) == 8  # 4 * 2^(4-2) interval extensions / 2
        idx = {t: i for i, t in enumerate(JO_CHAIN)}
        for o in orders:
            # every prefix must occupy a contiguous chain interval
            for k in range(1, len(o) + 1):
                pos = sorted(idx[t] for t in o[:k])
                assert pos == list(range(pos[0], pos[0] + k))
        assert len(set(orders)) == 8

    def test_costs_closed_form_and_fk_winner(self, spark):
        from hebrew_ner_spark.operators.maintenance import join_order_costs

        # |R|=2, |N|=4 (2 per region), |C|=8 (2 per nation),
        # |O|=16 (2 per customer) — perfect FK chain, so every join
        # keeps the bigger side's cardinality and the cheapest plans
        # avoid touching orders until last
        region = spark.createDataFrame(
            [(r,) for r in range(2)], "r_regionkey long"
        )
        nation = spark.createDataFrame(
            [(n, n % 2) for n in range(4)],
            "n_nationkey long, n_regionkey long",
        )
        customer = spark.createDataFrame(
            [(c, c % 4) for c in range(8)],
            "c_custkey long, c_nationkey long",
        )
        orders_t = spark.createDataFrame(
            [(o, o % 8) for o in range(16)],
            "o_orderkey long, o_custkey long",
        )
        out = {
            r.plan: (r.est_rows, r.cost, r.rank)
            for r in join_order_costs(
                {
                    "region": region,
                    "nation": nation,
                    "customer": customer,
                    "orders": orders_t,
                }
            ).collect()
        }
        assert len(out) == 8
        # final estimate is |O| = 16 for EVERY order (FK chain)
        assert all(v[0] == 16 for v in out.values())
        # R>N>C>O: intermediates 4, 8, 16 -> cost 28; O-first pays 16
        # at every step: 16+16+16 = 48
        assert out["R>N>C>O"][1] == 28
        assert out["O>C>N>R"][1] == 48
        # the best rank belongs to a plan that defers orders to the end
        best = min(out.values(), key=lambda v: v[2])
        assert best[1] == min(v[1] for v in out.values())


class TestCdcDiff:
    def _t(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_total_cents long, "
            "o_orderstatus string",
        )

    def test_diff_classifies_and_skips_noops(self, spark):
        from hebrew_ner_spark.operators.maintenance import cdc_diff

        old = self._t(spark, [
            (1, 10, 100, "F"),   # unchanged -> absent from the feed
            (2, 20, 200, "O"),   # updated
            (3, 30, 300, "P"),   # deleted
        ])
        new = self._t(spark, [
            (1, 10, 100, "F"),
            (2, 21, 200, "P"),
            (4, 40, 400, "O"),   # inserted
        ])
        got = {r.o_orderkey: (r.op, r.o_custkey, r.o_total_cents,
                              r.o_orderstatus)
               for r in cdc_diff(old, new).collect()}
        assert got == {
            2: ("U", 21, 200, "P"),   # new image
            3: ("D", 30, 300, "P"),   # old image
            4: ("I", 40, 400, "O"),
        }

    def test_merge_then_diff_round_trips(self, spark):
        """cdc_diff(base, merge_upsert(base, changes)) == changes for a
        batch whose updates genuinely change a column."""
        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators.maintenance import (
            cdc_diff,
            merge_upsert,
            synth_order_changes,
        )

        orders = spark.read.parquet(
            "/root/testdata/sf0.001/orders.parquet"
        )
        changes = synth_order_changes(orders)
        merged = merge_upsert(orders, changes)
        old = orders.select(
            "o_orderkey", "o_custkey",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
                "o_total_cents"
            ),
            "o_orderstatus",
        )
        got = {
            (r.o_orderkey, r.op, r.o_custkey, r.o_total_cents,
             r.o_orderstatus)
            for r in cdc_diff(old, merged).collect()
        }
        want = {
            (r.o_orderkey, r.op, r.o_custkey,
             int(round(r.o_totalprice * 100)), r.o_orderstatus)
            for r in changes.collect()
        }
        assert got == want and want
