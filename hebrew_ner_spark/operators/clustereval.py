"""B-cubed cluster evaluation for entity-resolution / dedup quality.

The standard ER metric (Bagga & Baldwin 1998): per item, precision is
|pred-cluster ∩ gold-cluster| / |pred-cluster| and recall the same over
the gold size; the corpus score is the item mean. Pairwise P/R rewards
giant clusters quadratically; B³ weighs every item once — it is what a
dedup/canonicalization stage should report at 10^12 scale.

Exact-integer evaluation: the item-sum collapses to the (pred, gold)
contingency grain — Σ_items |p∩g|/|p| = Σ_{(p,g)} n_pg²/n_p — so the
whole metric is three partial-aggregating groupBys and two cluster-keyed
joins, no window, no per-item state. Per-term micro-unit rounding uses
the repo's half-up idiom, identical in Spark and DuckDB, so the gate is
hash-exact. A mega-cluster is one row on its key side; the contingency
table is bounded by min(#pred, #gold) rows per cluster.

No reference counterpart (the reference evaluates span F1, E1/E2 —
``operators/labels.py``); B³ covers the cluster grain those metrics
cannot see."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 1_000_000


def bcubed_prf(assign: DataFrame) -> DataFrame:
    """(n_items, precision_1e6, recall_1e6, f1_1e6) — one row.

    ``assign`` needs (item, pred, gold): one row per item with its
    predicted and gold cluster labels (label types are opaque; items
    must be unique). Per-(pred, gold) cell terms are rounded half-up to
    micro-units before the item-mean (deterministic on both engines;
    error bounded by 5e-7 per cell). f1 guards the P+R=0 case to 0 —
    the cross-engine NULL-division class ADVICE r2 flagged."""
    cells = assign.groupBy("pred", "gold").agg(F.count("*").alias("n_pg"))
    psz = cells.groupBy("pred").agg(F.sum("n_pg").alias("n_p"))
    gsz = cells.groupBy("gold").agg(F.sum("n_pg").alias("n_g"))
    terms = (
        cells.join(psz, "pred")
        .join(gsz, "gold")
        .select(
            "n_pg",
            F.expr(
                f"CAST((2 * {M} * n_pg * n_pg + n_p) DIV (2 * n_p) AS BIGINT)"
            ).alias("p_term"),
            F.expr(
                f"CAST((2 * {M} * n_pg * n_pg + n_g) DIV (2 * n_g) AS BIGINT)"
            ).alias("r_term"),
        )
    )
    sums = terms.agg(
        F.sum("n_pg").cast("long").alias("n_items"),
        F.sum("p_term").cast("long").alias("_sp"),
        F.sum("r_term").cast("long").alias("_sr"),
    )
    pr = sums.select(
        "n_items",
        F.expr("CAST((2 * _sp + n_items) DIV (2 * n_items) AS BIGINT)").alias(
            "precision_1e6"
        ),
        F.expr("CAST((2 * _sr + n_items) DIV (2 * n_items) AS BIGINT)").alias(
            "recall_1e6"
        ),
    )
    return pr.select(
        "n_items",
        "precision_1e6",
        "recall_1e6",
        F.expr(
            """
            CAST(CASE WHEN precision_1e6 + recall_1e6 = 0 THEN 0
                 ELSE (2 * 2 * precision_1e6 * recall_1e6
                       + (precision_1e6 + recall_1e6))
                      DIV (2 * (precision_1e6 + recall_1e6)) END AS BIGINT)
            """
        ).alias("f1_1e6"),
    )


def dedup_bcubed_assign(docs: DataFrame, components: DataFrame) -> DataFrame:
    """(item, pred, gold) for dedup-cluster eval: pred = the near-dup
    component (docs outside any component are singletons keyed by their
    own id), gold = the exact-duplicate group (min doc_id per identical
    text — byte equality is the one unarguable gold standard a corpus
    carries for free). Exact dups are near dups, so recall should hold
    at 1e6 while near-merges price precision."""
    gold = docs.groupBy("text").agg(F.min("doc_id").alias("gold"))
    g = docs.select("doc_id", "text").join(gold, "text").select("doc_id", "gold")
    comp = components.select(
        F.col("doc_id"), F.col("component_id").alias("_c")
    )
    return (
        g.join(comp, "doc_id", "left")
        .select(
            F.col("doc_id").alias("item"),
            F.coalesce("_c", F.col("doc_id")).cast("long").alias("pred"),
            F.col("gold").cast("long").alias("gold"),
        )
    )


def filter_agreement_kappa(flags: DataFrame) -> DataFrame:
    """(lang, n_docs, n_both_keep, n_rule_only, n_lr_only, n_both_drop,
    po_1e6, pe_1e6, kappa_1e6) — Cohen's kappa between two keep/drop
    raters per language stratum.

    ``flags`` needs (lang, rk, lk): BIGINT 0/1 keep decisions from the
    two raters for the same document. Chance-corrected agreement is the
    standard check before trusting a cheap filter as a proxy for an
    expensive one (or before ensembling them): raw agreement po is
    inflated whenever both raters mostly keep (or mostly drop).

    Exact integer arithmetic over the 2x2 contingency:
      po = (a + d) / n,  pe = ((a+b)(a+c) + (c+d)(b+d)) / n^2,
      kappa = (n(a+d) - E) / (n^2 - E)  with E = (a+b)(a+c)+(c+d)(b+d).
    kappa can be negative (worse-than-chance), so rounding is symmetric
    half-up-by-magnitude — spelled identically on both engines instead
    of leaning on either engine's integer-division sign convention. The
    pe == 1 degenerate stratum (all mass in one cell) reports kappa =
    po (1e6): agreement is total and chance correction is undefined.

    Scale shape: ONE map-side-combinable groupBy over lang (bounded key
    space, partial aggregation absorbs any per-lang skew); the four
    cells are conditional sums in the same pass, and everything after
    is per-row arithmetic on the tiny per-lang table.
    """
    cells = flags.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.expr("rk * lk")).cast("long").alias("n_both_keep"),
        F.sum(F.expr("rk * (1 - lk)")).cast("long").alias("n_rule_only"),
        F.sum(F.expr("(1 - rk) * lk")).cast("long").alias("n_lr_only"),
        F.sum(F.expr("(1 - rk) * (1 - lk)")).cast("long").alias("n_both_drop"),
    )
    e = (
        "((n_both_keep + n_rule_only) * (n_both_keep + n_lr_only)"
        " + (n_lr_only + n_both_drop) * (n_rule_only + n_both_drop))"
    )
    num = f"(n_docs * (n_both_keep + n_both_drop) - {e})"
    den = f"(n_docs * n_docs - {e})"
    return cells.select(
        "lang",
        "n_docs",
        "n_both_keep",
        "n_rule_only",
        "n_lr_only",
        "n_both_drop",
        F.expr(
            f"CAST((2 * (n_both_keep + n_both_drop) * {M} + n_docs)"
            f" DIV (2 * n_docs) AS BIGINT)"
        ).alias("po_1e6"),
        F.expr(
            f"CAST((2 * {e} * {M} + n_docs * n_docs)"
            f" DIV (2 * n_docs * n_docs) AS BIGINT)"
        ).alias("pe_1e6"),
        F.expr(
            f"""
            CAST(CASE
              WHEN {den} = 0 THEN {M}
              WHEN {num} >= 0
                THEN (2 * {num} * {M} + {den}) DIV (2 * {den})
              ELSE -((2 * -{num} * {M} + {den}) DIV (2 * {den}))
            END AS BIGINT)
            """
        ).alias("kappa_1e6"),
    )


def blocking_quality(
    candidates: DataFrame, gold_pairs: DataFrame, corpus: DataFrame
) -> DataFrame:
    """(n_docs, n_cand, n_gold, n_hit, pair_completeness_1e6,
    reduction_ratio_1e6) — the two numbers every ER blocking scheme is
    judged by (Christen's survey): pair completeness = share of gold
    duplicate pairs the blocker's candidate set retains (recall of the
    blocking stage — what it silently loses), and reduction ratio =
    1 - |candidates| / C(n, 2) (how much of the quadratic comparison
    space it avoids). A blocker is only as good as BOTH: all-pairs has
    PC = 1 and RR = 0; a degenerate blocker has RR ~ 1 and PC ~ 0.

    Inputs are ordered (doc_a < doc_b) distinct pair tables. The hit
    count is one pair-keyed join; n is one count — no pair
    materialization of the C(n, 2) denominator, which exists only as
    arithmetic. Exact half-up micro-units; PC of an empty gold set is
    defined as 1e6 (nothing to lose).
    """
    hits = candidates.join(gold_pairs, ["doc_a", "doc_b"], "left_semi")
    counts = (
        corpus.agg(F.count("*").cast("long").alias("n_docs"))
        .crossJoin(candidates.agg(F.count("*").cast("long").alias("n_cand")))
        .crossJoin(gold_pairs.agg(F.count("*").cast("long").alias("n_gold")))
        .crossJoin(hits.agg(F.count("*").cast("long").alias("n_hit")))
    )
    return counts.select(
        "n_docs",
        "n_cand",
        "n_gold",
        "n_hit",
        F.expr(
            f"""
            CAST(CASE WHEN n_gold = 0 THEN {M}
                 ELSE (2 * n_hit * {M} + n_gold) DIV (2 * n_gold)
                 END AS BIGINT)
            """
        ).alias("pair_completeness_1e6"),
        F.expr(
            f"""
            CAST(CASE WHEN n_docs < 2 THEN {M}
                 ELSE (2 * (n_docs * (n_docs - 1) DIV 2 - n_cand) * {M}
                       + n_docs * (n_docs - 1) DIV 2)
                      DIV (2 * (n_docs * (n_docs - 1) DIV 2))
                 END AS BIGINT)
            """
        ).alias("reduction_ratio_1e6"),
    )
