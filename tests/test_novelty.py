"""Closed-form novelty-share fixtures."""

from __future__ import annotations

from hebrew_ner_spark.operators.crawl import novelty_share


def _hist(spark, rows):
    return spark.createDataFrame(rows, "v long, text string")


def test_novelty_closed_form(spark):
    # v0: shingles {a b c, b c d} ; v1: same + {x y z} ; v2: all old
    rows = [
        (0, "a b c d"),          # shingles: "a b c", "b c d"
        (1, "a b c d"),          # old
        (1, "x y z"),            # new: "x y z"
        (2, "a b c d x y z"),    # all shingles previously seen? no:
                                 # "c d x", "d x y" are NEW at v2
    ]
    out = {r["v"]: r for r in novelty_share(_hist(spark, rows)).collect()}
    assert out[0]["n_shingles"] == 2 and out[0]["n_new"] == 2
    assert out[0]["new_share_1e6"] == 1_000_000
    assert out[1]["n_shingles"] == 3 and out[1]["n_new"] == 1
    # v2 shingles: a b c, b c d, c d x, d x y, x y z -> 5 total, 2 new
    assert out[2]["n_shingles"] == 5 and out[2]["n_new"] == 2
    assert out[2]["new_share_1e6"] == 400_000


def test_duplicate_docs_do_not_inflate(spark):
    rows = [(0, "p q r"), (0, "p q r"), (1, "p q r")]
    out = {r["v"]: r for r in novelty_share(_hist(spark, rows)).collect()}
    assert out[0]["n_shingles"] == 1 and out[0]["n_new"] == 1
    assert out[1]["n_new"] == 0
