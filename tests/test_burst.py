"""Burst automaton: one-HOF Viterbi vs Python brute force (costs, path,
tie order), hysteresis semantics, interval merging, corpus spikes."""

from itertools import product

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import burst


def _brute(costs, gamma=burst.BURST_GAMMA):
    """costs: list of (cost0, cost1) per bin. Returns (cost, path_id)
    argmin with (cost, id) tie order, id bits LSB-first."""
    T = len(costs)
    best = None
    for bits in product([0, 1], repeat=T):
        c, prev = 0, 0
        for t, s in enumerate(bits):
            if s == 1 and prev == 0:
                c += gamma
            c += costs[t][s]
            prev = s
        pid = sum(b << t for t, b in enumerate(bits))
        if best is None or (c, pid) < best:
            best = (c, pid)
    return best


def _path_df(spark, costs):
    rows = [("t", b, c0, c1) for b, (c0, c1) in enumerate(costs)]
    df = spark.createDataFrame(rows, "tok string, b long, cost0 long, cost1 long")
    r = burst.burst_path(df).collect()[0]
    return (r.cost, r.path_id)


class TestViterbiExactness:
    def test_vs_brute_force_fuzz(self, spark):
        # deterministic cost grids covering flats, spikes, plateaus, ties
        from hebrew_ner_spark.functions.hashing import phash_py

        for case in range(6):
            T = 8
            costs = [
                (
                    phash_py(f"c0|{case}|{t}") % 300_000,
                    phash_py(f"c1|{case}|{t}") % 300_000,
                )
                for t in range(T)
            ]
            assert _path_df(spark, costs) == _brute(costs), case

    def test_tie_order_prefers_low_path_id(self, spark):
        # two bins, all costs zero except gamma: staying at baseline
        # (path 0) ties nothing — make a real tie: gamma=0 impossible
        # via constants, so craft equal-cost alternatives instead:
        # cost0 = gamma on bin 0 makes paths 0b01 (enter burst, pay
        # gamma, skip cost0) and 0b00 (pay cost0) both cost gamma.
        costs = [(burst.BURST_GAMMA, 0), (0, burst.BURST_GAMMA * 100)]
        got = _path_df(spark, costs)
        assert got == _brute(costs)
        assert got[1] == 0  # the tie resolves to the smaller path id

    def test_hysteresis_isolated_wobble_stays_baseline(self, spark):
        # a single bin where bursting would save less than gamma
        save = burst.BURST_GAMMA - 1
        costs = [(0, save), (save, 0), (0, save)]
        cost, pid = _path_df(spark, costs)
        assert pid == 0  # not worth entering
        # but a saving above gamma flips exactly that bin
        save2 = burst.BURST_GAMMA + 1
        costs2 = [(0, save2), (save2, 0), (0, save2)]
        cost2, pid2 = _path_df(spark, costs2)
        assert pid2 == 0b010

    def test_run_extension_is_free(self, spark):
        # gamma is paid once per run: two adjacent profitable bins
        # burst together even when each alone is marginal
        half = burst.BURST_GAMMA // 2 + 1
        costs = [(0, 0), (half, 0), (half, 0), (0, 0)]
        cost, pid = _path_df(spark, costs)
        assert pid == 0b0110
        assert cost == burst.BURST_GAMMA


class TestCorpusBursts:
    def test_states_land_on_planted_spikes(self, spark, sf_dir):
        from hebrew_ner_spark.functions.hashing import phash_py
        from hebrew_ner_spark.sources.catalog import load_table

        ev = load_table(spark, sf_dir, "events")
        costs = burst.burst_costs(burst.token_bins(ev))
        st = burst.burst_states(costs)
        burst_cells = {(r.tok, r.b) for r in st.where("state = 1").collect()}
        assert burst_cells, "planted spikes must produce bursts"
        planted = {
            (tok, b)
            for (tok, b) in {
                (r.tok, r.b) for r in st.select("tok", "b").collect()
            }
            if phash_py(f"{tok}|{b}", burst.BURST_SEED) % burst.BURST_SPIKE_MOD == 0
        }
        # every decoded burst bin is a planted spike (uniform base rates
        # never clear the 2x threshold on their own)
        assert burst_cells <= planted

    def test_intervals_merge_adjacent_bins(self, spark):
        # synthetic costs with a 3-bin profitable plateau
        rows = []
        for b in range(8):
            c0 = 500_000 if b in (2, 3, 4) else 0
            c1 = 0 if b in (2, 3, 4) else 500_000
            rows.append(("t", b, c0, c1))
        df = spark.createDataFrame(rows, "tok string, b long, cost0 long, cost1 long")
        got = [
            (r.b_lo, r.b_hi, r.len) for r in burst.burst_intervals(df).collect()
        ]
        assert got == [(2, 4, 3)]

    def test_decode_plan_has_no_python(self, spark):
        rows = [("t", b, 0, 1) for b in range(4)]
        df = spark.createDataFrame(rows, "tok string, b long, cost0 long, cost1 long")
        plan = (
            burst.burst_path(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "ArrowEval" not in plan
