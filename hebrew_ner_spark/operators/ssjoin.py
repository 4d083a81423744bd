"""Exact set-similarity join with prefix filtering (AllPairs / PPJoin
family — Bayardo et al. WWW'07, Vernica et al. SIGMOD'10 for the
MapReduce formulation).

The EXACT complement to the approximate MinHash-LSH path in
``operators/dedup.py``: LSH trades false negatives for speed; the prefix
filter is lossless — every pair with shingle-set Jaccard >= t shares at
least one element in its frequency-ordered prefix, so candidate
generation from a prefix inverted index misses nothing. Both operators
use the SAME similarity (Jaccard over distinct word-k-shingle sets,
``dedup.doc_shingles``), which pins a cross-operator invariant: at equal
threshold, ``ssjoin_pairs`` is a superset of ``near_dup_jaccard``
(pytest-gated). The exact join is the tool when "no false negatives" is
a contract — e.g. eval-set decontamination before training.

Why shingles and not raw tokens: a token-set join on a web corpus is
adversarially dense (every page shares the stopword vocabulary, so the
TRUE result is quadratic in near-duplicate-free text); k-shingles are
discriminative, so both the candidate index and the answer stay sparse.

Shape at 10^12 docs:

* the shingle document-frequency table is one map-side-combined
  aggregate (distinct-shingle-sized);
* ordering rarest-first builds the candidate index from the RAREST
  (1 - t) fraction of each doc's shingles — boilerplate shingles land in
  suffixes and never key a bucket, which is the point of the ordering;
* candidate generation is one aggregation per prefix shingle + an
  array-side pair explosion (the ``dedup._bucket_pairs`` discipline),
  with the same hard ``cap`` + non-silent overflow contract: a prefix
  shingle shared by more than ``cap`` docs is excluded from pair
  generation and surfaced by ``ssjoin_overflow`` (count-only);
* the size filter den*min(s_a,s_b) >= num*max(s_a,s_b) prunes inside
  the pair explosion (J(x,y) <= min/max, exact integer cross-multiply);
* exact verification touches only candidates: one shingle-keyed
  intersection join + per-doc set sizes, |A∪B| = |A|+|B|-|A∩B|.

The threshold is an integer fraction num/den so the keep decision
(den * n_inter >= num * n_union) is exact in both engines — no float
ever enters a gated column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators.dedup import SHINGLE_K, _shingle_rows

SSJ_NUM = 5     # default Jaccard threshold 5/10 = 0.5 (near_dup_jaccard's)
SSJ_DEN = 10
SSJ_CAP = 4096  # pairwise-explosion ceiling per prefix shingle


def _sh_distinct(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Distinct (doc_id, shingle) via the codegen zip-shingle fast path
    plus ONE dedup exchange. ssjoin consumes the shingle table from four
    plan branches (df, prefix regroup, verify a/b); materializing the
    distinctness as an exchange (rather than the interpreted
    array_distinct HOF of ``dedup.doc_shingles``) lets ReuseExchange run
    the expensive shingling scan once and fan the shuffle files out to
    every branch — measured 2x on the whole join at sf0.1."""
    return _shingle_rows(docs, k).dropDuplicates(["doc_id", "shingle"])


def prefix_shingles(
    docs: DataFrame, num: int = SSJ_NUM, den: int = SSJ_DEN, k: int = SHINGLE_K
) -> DataFrame:
    """(doc_id, s, shingle): each doc's frequency-ordered prefix.

    Shingles sort by (document frequency ASC, shingle ASC) — a total
    order both engines reproduce — and the prefix keeps the first
    p = s - ceil(t*s) + 1 of them (ceil via integer (num*s + den - 1)
    DIV den). Losslessness: if two sets with Jaccard >= t had disjoint
    prefixes, every common element would have to rank after the later
    prefix end, leaving at most ceil(t*s) - 1 slots for an overlap that
    must be >= ceil(t*s) — the standard prefix-filter argument,
    pytest-pinned against brute force.
    """
    sh = _sh_distinct(docs, k)
    df = sh.groupBy("shingle").agg(F.count("*").cast("long").alias("df"))
    ordered = (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("ord"),
            F.count("*").cast("long").alias("s"),
        )
    )
    p = f"CAST(s - (({num} * s + {den} - 1) DIV {den}) + 1 AS INT)"
    return ordered.select(
        "doc_id",
        "s",
        F.explode(F.expr(f"slice(transform(ord, x -> x.shingle), 1, {p})")).alias(
            "shingle"
        ),
    )


def ssjoin_candidates(
    docs: DataFrame,
    num: int = SSJ_NUM,
    den: int = SSJ_DEN,
    cap: int = SSJ_CAP,
    k: int = SHINGLE_K,
    pref: DataFrame | None = None,
) -> DataFrame:
    """Distinct (doc_a < doc_b, s_a, s_b) candidate pairs sharing a
    prefix shingle; set sizes ride along so verification never has to
    join them back.

    One aggregation per prefix shingle + array-side pair explosion with
    the size filter applied INSIDE the explosion; prefix shingles shared
    by more than ``cap`` docs are excluded here and surfaced (count-only)
    by ``ssjoin_overflow`` — excluding them breaks the no-false-negative
    contract loudly, never silently.
    """
    pref = prefix_shingles(docs, num, den, k) if pref is None else pref
    grouped = (
        pref.groupBy("shingle")
        .agg(F.expr("array_sort(collect_set(struct(doc_id, s)))").alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= cap))
    )
    return (
        grouped.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(sequence(0, size(ids) - 2), i ->
                      transform(sequence(i + 1, size(ids) - 1), j ->
                        named_struct('doc_a', ids[i].doc_id, 's_a', ids[i].s,
                                     'doc_b', ids[j].doc_id, 's_b', ids[j].s))))
                    """
                )
            ).alias("p")
        )
        .where(F.expr(f"{den} * least(p.s_a, p.s_b) >= {num} * greatest(p.s_a, p.s_b)"))
        .select("p.doc_a", "p.doc_b", "p.s_a", "p.s_b")
        .distinct()
    )


def ssjoin_overflow(
    docs: DataFrame,
    num: int = SSJ_NUM,
    den: int = SSJ_DEN,
    cap: int = SSJ_CAP,
    k: int = SHINGLE_K,
    pref: DataFrame | None = None,
) -> DataFrame:
    """(shingle, n_docs) for prefix shingles above the pairwise cap — the
    docs whose exactness contract the cap suspended. Count-only."""
    pref = prefix_shingles(docs, num, den, k) if pref is None else pref
    return (
        pref.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") > cap)
    )


def ssjoin_pairs(
    docs: DataFrame,
    num: int = SSJ_NUM,
    den: int = SSJ_DEN,
    cap: int = SSJ_CAP,
    k: int = SHINGLE_K,
) -> DataFrame:
    """(doc_a, doc_b, n_inter, n_union, jaccard_1e6): ALL pairs with
    shingle-set Jaccard >= num/den (exact, modulo loudly-surfaced
    over-cap prefix shingles). The quadratic verify step is bounded to
    candidates. Docs shorter than k tokens have empty shingle sets and
    are excluded — the ``near_dup_jaccard`` convention.
    """
    sh = _sh_distinct(docs, k)
    cand = ssjoin_candidates(docs, num, den, cap, k)
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        # s_a/s_b are functional in (doc_a, doc_b) — grouping by them
        # adds no grain, it just carries the sizes through
        .groupBy("doc_a", "doc_b", "s_a", "s_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        inter.withColumn("n_union", F.expr("s_a + s_b - n_inter").cast("long"))
        .where(F.expr(f"{den} * n_inter >= {num} * n_union"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_union",
            # exact integer round-half-up: (2a*1e6 + b) DIV 2b
            F.expr(
                "CAST((2 * n_inter * 1000000 + n_union) DIV (2 * n_union) AS BIGINT)"
            ).alias("jaccard_1e6"),
        )
    )


CONT_NUM = 9    # containment threshold 9/10 = 0.9
CONT_DEN = 10


def containment_pairs(
    docs: DataFrame,
    num: int = CONT_NUM,
    den: int = CONT_DEN,
    cap: int = SSJ_CAP,
    k: int = SHINGLE_K,
) -> DataFrame:
    """(doc_a, doc_b, s_a, s_b, n_inter, cont_1e6): DIRECTED
    near-superset detection — every ordered pair with shingle
    containment C(a->b) = |A∩B| / |A| >= num/den. The asymmetric
    complement to the Jaccard joins: a short quote inside a long page
    has high containment but LOW Jaccard, so both the LSH tier and
    ssjoin_pairs miss it BY DESIGN; this operator is how a pipeline
    finds subsumed documents (quotes, partial mirrors, stale supersets)
    for supersede decisions.

    Prefix filter, containment form: order shingles globally
    (df ASC, shingle ASC); the CONTAINED side keeps its standard
    prefix of s - ceil(t*s) + 1 (if C >= t and the prefix misses B,
    the >= ceil(t*s) common shingles must all sit in a suffix of
    length ceil(t*s) - 1 — contradiction), while the CONTAINER side
    must index its FULL set (no size filter either — any size ratio
    is admissible, which is the point). Shingles shared by more than
    ``cap`` docs are excluded from the index and surfaced count-only
    by ``containment_overflow`` — loud, never silent. Verification
    touches candidates only; the keep decision den*n_inter >= num*s_a
    is exact integer."""
    sh = _sh_distinct(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("s"))
    safe = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= cap)
        .select("shingle")
    )
    pref = prefix_shingles(docs, num, den, k)
    cand = (
        pref.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"), "shingle")
        .join(
            sh.join(safe, "shingle").select(
                F.col("doc_id").alias("doc_b"), "shingle"
            ),
            "shingle",
        )
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "s_a")
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "s_a")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        inter.where(F.expr(f"{den} * n_inter >= {num} * s_a"))
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "s_a",
            "s_b",
            "n_inter",
            F.expr(
                "CAST((2 * n_inter * 1000000 + s_a) DIV (2 * s_a) AS BIGINT)"
            ).alias("cont_1e6"),
        )
    )


def containment_overflow(
    docs: DataFrame, cap: int = SSJ_CAP, k: int = SHINGLE_K
) -> DataFrame:
    """(shingle, n_docs) for shingles above the container-index cap —
    the documents whose containment contract the cap suspended."""
    sh = _sh_distinct(docs, k)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .where(F.col("n_docs") > cap)
    )
