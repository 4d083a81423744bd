"""Closed-form fixtures for the binned interval-overlap join."""

from __future__ import annotations

from hebrew_ner_spark.operators.kg import interval_overlap_join


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, v_from long, v_to long"
    )


def _win(spark, rows):
    return spark.createDataFrame(rows, "w_id long, w_from long, w_to long")


def _brute(ivs, wins):
    out = set()
    for s, p, o, lo, hi in ivs:
        for w, wlo, whi in wins:
            if lo <= whi and wlo <= hi:
                out.add((w, s, p, o, lo, hi, max(lo, wlo), min(hi, whi)))
    return out


def test_exactly_once_across_bins(spark):
    # long interval and long window share several bins (bin_w=2);
    # the pair must come out exactly once
    ivs = [("a", "p", "x", 0, 7)]
    wins = [(0, 0, 7)]
    rows = interval_overlap_join(_iv(spark, ivs), _win(spark, wins), 2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["ov_from"], r["ov_to"], r["ov_len"]) == (0, 7, 8)


def test_matches_brute_force(spark):
    ivs = [
        ("a", "p", "x", 0, 1), ("b", "p", "x", 2, 5), ("c", "p", "y", 4, 4),
        ("d", "q", "z", 0, 9), ("e", "q", "z", 7, 8), ("f", "q", "w", 3, 3),
    ]
    wins = [(0, 0, 0), (1, 1, 3), (2, 4, 9), (3, 0, 9), (4, 6, 6)]
    got = {
        (r["w_id"], r["subj"], r["pred"], r["obj"], r["v_from"], r["v_to"],
         r["ov_from"], r["ov_to"])
        for r in interval_overlap_join(
            _iv(spark, ivs), _win(spark, wins), 2
        ).collect()
    }
    assert got == _brute(ivs, wins)
    # and with a different bin width the result is identical
    got3 = {
        (r["w_id"], r["subj"], r["pred"], r["obj"], r["v_from"], r["v_to"],
         r["ov_from"], r["ov_to"])
        for r in interval_overlap_join(
            _iv(spark, ivs), _win(spark, wins), 3
        ).collect()
    }
    assert got3 == got


def test_disjoint_pairs_absent(spark):
    ivs = [("a", "p", "x", 0, 1)]
    wins = [(0, 3, 4)]
    assert (
        interval_overlap_join(_iv(spark, ivs), _win(spark, wins), 2).count() == 0
    )


def test_randomized_brute_force_sweep(spark):
    # deterministic LCG cloud over a wider axis, multiple bin widths
    x = 424242
    ivs, wins = [], []
    for i in range(120):
        x = (x * 1103515245 + 12345) % (1 << 31)
        lo = x % 50
        x = (x * 1103515245 + 12345) % (1 << 31)
        ln = x % 12
        ivs.append((f"s{i}", "p", f"o{i}", lo, lo + ln))
    for w in range(15):
        x = (x * 1103515245 + 12345) % (1 << 31)
        lo = x % 55
        x = (x * 1103515245 + 12345) % (1 << 31)
        wins.append((w, lo, lo + x % 9))
    expect = _brute(ivs, wins)
    for bw in (1, 2, 5, 16):
        got = {
            (r["w_id"], r["subj"], r["pred"], r["obj"], r["v_from"],
             r["v_to"], r["ov_from"], r["ov_to"])
            for r in interval_overlap_join(
                _iv(spark, ivs), _win(spark, wins), bw
            ).collect()
        }
        assert got == expect, f"bin width {bw}"
