"""robots.txt politeness: REP longest-match precedence and tie rules."""

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import robots


def _decide(spark, urls, rules_rows):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    r = spark.createDataFrame(rules_rows, "host string, prefix string, rule_allow long")
    out = robots.robots_decisions(u, r)
    return {row.url: (row.allowed, row.rule_len) for row in out.collect()}


def test_rep_longest_match_and_ties(spark):
    rules = [
        ("h.example.net", "/p/", 0),
        ("h.example.net", "/p/1", 1),
        ("h.example.net", "/p/12", 0),
        ("h.example.net", "/q/", 0),
        ("h.example.net", "/q/", 1),
    ]
    got = _decide(
        spark,
        [
            "https://h.example.net/p/2",    # /p/ deny
            "https://h.example.net/p/1",    # /p/1 allow beats /p/
            "https://h.example.net/p/10",   # /p/1 still longest
            "https://h.example.net/p/12",   # /p/12 deny beats /p/1
            "https://h.example.net/p/123",  # /p/12 still longest
            "https://h.example.net/q/5",    # tie at len 3 -> Allow wins
            "https://h.example.net/r/9",    # no rule -> default allow
            "https://other.example.net/p/12",  # no rules for host
        ],
        rules,
    )
    assert got["https://h.example.net/p/2"] == (0, 3)
    assert got["https://h.example.net/p/1"] == (1, 4)
    assert got["https://h.example.net/p/10"] == (1, 4)
    assert got["https://h.example.net/p/12"] == (0, 5)
    assert got["https://h.example.net/p/123"] == (0, 5)
    assert got["https://h.example.net/q/5"] == (1, 3)
    assert got["https://h.example.net/r/9"] == (1, 0)
    assert got["https://other.example.net/p/12"] == (1, 0)


def test_synth_probes_hit_every_rule_class(spark):
    """At sf0.001 the decision table must contain planted evidence for
    deny, nested allow, tie-allow, and default-allow — the gate is
    non-vacuous by construction."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = robots.robots_decisions(
        robots.synth_probe_urls(docs), robots.synth_robots_rules(docs)
    ).cache()
    try:
        private = d.where(F.col("url").contains("/private/"))
        assert private.count() > 0
        assert private.where(F.col("allowed") == 1).count() == 0
        ties = d.where(F.col("url").contains("/q/"))
        assert ties.count() > 0  # tie -> allow, len 3
        assert ties.where((F.col("allowed") == 1) & (F.col("rule_len") == 3)).count() == ties.count()
        # even-shard /p/ paths: denied unless decimal prefix 1-not-12
        assert d.where((F.col("allowed") == 0) & (F.col("rule_len") == 3)).count() > 0
        assert d.where((F.col("allowed") == 1) & (F.col("rule_len") == 4)).count() > 0
        # odd shards: default allow with rule_len 0
        assert d.where((F.col("allowed") == 1) & (F.col("rule_len") == 0)).count() > 0
    finally:
        d.unpersist()


def test_decision_plan_single_frontier_scan(spark):
    """The frontier relation appears ONCE in the physical plan (no
    self-join-back) and the rule side is broadcast."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = robots.robots_decisions(
        robots.synth_probe_urls(docs), robots.synth_robots_rules(docs)
    )
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert phys.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in phys
