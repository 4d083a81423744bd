"""Text-analysis operators for a large-scale training-data pipeline.

Language ID, quality scoring, token counting and document fingerprinting
over the `documents` table. All kernels are JVM-side built-ins (regex /
array higher-order functions) so every per-document stage is one narrow
whole-stage-codegen span — the only shuffle in this module is the global
token-frequency aggregate, which benefits from map-side partial aggregation.

Reference parity: digit normalization P5 (utils/functions.py:14-21), the
char-class normalizers P6-P9 (utils/ner.py:226-258, utils/hebrew.py:3-19)
and the length filter P4 (utils/functions.py:142) are the reference's
text-hygiene surface; the quality/langid/fingerprint operators are the
scale-pipeline generalization (training-data curation over 10^12 docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_sql_expr, shingles_col
from hebrew_ner_spark.operators.kg import with_tokens

# Closed-class filler words of the synthetic corpus; doubles as the
# stopword list for the quality score. Frozen — oracles embed the same set.
STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]

FINGERPRINT_K = 5  # winnowing-style k-gram size


def normalize_digits(col: Column) -> Column:
    """P5: every digit -> '0' before dictionary lookup (functions.py:14-21)."""
    return F.regexp_replace(col, "[0-9]", "0")


def normalize_hebrew_finals(col: Column) -> Column:
    """P6: final-form Hebrew letters -> base forms (utils/ner.py:226-239)."""
    return F.translate(col, "ךםןףץ", "כמנפצ")


def strip_trailing_yud(col: Column) -> Column:
    """P8: drop a trailing yud (utils/ner.py:255-258)."""
    return F.regexp_replace(col, "י$", "")


def normalize_gershayim(col: Column) -> Column:
    """P9 (restricted form): ASCII double-quote -> gershayim inside
    Hebrew words. The faithful reference pair is below."""
    return F.regexp_replace(col, '(?<=[א-ת])"(?=[א-ת])', "״")


def quotes_to_gershayim(col: Column) -> Column:
    """P9 forward, faithful: EVERY '"' -> '״' (utils/hebrew.py:3-10 does a
    plain global re.sub with no context restriction)."""
    return F.regexp_replace(col, '"', "״")


def gershayim_to_quotes(col: Column) -> Column:
    """P9 inverse: every '״' -> '"' (utils/hebrew.py:12-19)."""
    return F.regexp_replace(col, "״", '"')


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality statistics — one narrow stage, zero shuffles.

    Columns mirror what a web-corpus curation filter needs: token count,
    type count, mean token length, stopword ratio, punctuation density.
    Ratios are emitted at micro precision (x1e6, bigint) so the correctness
    hash is exact across engines.
    """
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    toks = with_tokens(docs)
    return toks.select(
        "doc_id",
        F.col("n_chars"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_types"),
        F.expr(
            "CAST((2 * (aggregate(toks, 0L, (a, t) -> a + length(t))) * 1000000 + (size(toks))) DIV (2 * (size(toks))) AS BIGINT)"
        ).alias("mean_tok_len_1e6"),
        F.expr(
            f"CAST((2 * (size(filter(toks, t -> array_contains({stop_arr}, t)))) * 1000000 + (size(toks))) DIV (2 * (size(toks))) AS BIGINT)"
        ).alias("stopword_ratio_1e6"),
        F.expr(
            "CAST((2 * (length(regexp_replace(text, '[a-zA-Z0-9א-ת ]', ''))) * 1000000 + (length(text))) DIV (2 * (length(text))) AS BIGINT)"
        ).alias("punct_ratio_1e6"),
    )


# GPT-2-style pretokenizer alternation: optional leading space + a
# letter run | digit run | punctuation run. Engine-portable by
# construction: the alternatives are disjoint on their first non-space
# character, so Java's leftmost-first scan (Spark) and RE2's
# leftmost-longest scan (DuckDB) match identically, and there is no
# lookaround (RE2 has none). The whitespace class is EXPLICIT, not \s:
# Java's default \s includes vertical tab (\x0b) while RE2's does not,
# so \s would silently diverge on any document containing one — pinned
# by the cross-engine fuzz in tests. Exotic blanks (\x85,  ) are
# outside BOTH engines' default \s and intentionally count as
# punctuation runs. Pure-whitespace runs are deliberately unmatched —
# they are separators, not tokens.
BPE_REGEX = r" ?\p{L}+| ?\p{N}+| ?[^\t\n\x0b\f\r \p{L}\p{N}]+"


def subword_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_subword_tokens): the two token budgets an
    LLM-corpus pipeline prices documents by — whitespace tokens and
    BPE-style pretokenizer matches (a tight upper bound on real BPE
    token count, since merges only ever fuse within one pretoken).
    Both are codegen column expressions: zero shuffles, two-column scan.
    """
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_REGEX))
        .cast("long")
        .alias("n_subword_tokens"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Character-class language heuristic: hebrew vs latin vs other.

    The script whose letters dominate wins; ties/no-letters -> 'und'.
    (n-gram models plug into the same contract; the classifier is a pure
    column expression so it runs in codegen.)
    """
    heb = "length(regexp_replace(text, '[^א-ת]', ''))"
    lat = "length(regexp_replace(text, '[^a-zA-Z]', ''))"
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        F.expr(
            f"""
            CASE WHEN {heb} > {lat} THEN 'he'
                 WHEN {lat} > 0 THEN 'en'
                 ELSE 'und' END
            """
        ).alias("detected_lang"),
    )


def token_freq(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """Corpus-level token frequency (the Zipf table).

    The classic skewed aggregate: partial map-side combine keeps the
    shuffle proportional to |vocab| per partition, not corpus size.
    """
    return (
        with_tokens(docs)
        .select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
    )


def doc_fingerprints(docs: DataFrame, k: int = FINGERPRINT_K) -> DataFrame:
    """Winnowing-style document fingerprint: min 60-bit hash over k-gram
    shingles (docs shorter than k tokens get the hash of the whole text).

    Equal fingerprints => near-identical prefixes/content with high
    probability; used as a cheap pre-cluster key before MinHash.
    """
    toks = with_tokens(docs).withColumn("sh", shingles_col("toks", k))
    hashed = toks.withColumn(
        "fingerprint",
        F.expr(
            "CASE WHEN size(sh) = 0 THEN "
            "  CAST(conv(substr(md5(concat(text, ':', '0')), 1, 15), 16, 10) AS BIGINT) "
            "ELSE array_min(transform(sh, s -> "
            "  CAST(conv(substr(md5(concat(s, ':', '0')), 1, 15), 16, 10) AS BIGINT))) END"
        ),
    )
    return hashed.select("doc_id", "fingerprint")


WINNOW_W = 4  # winnowing window: grams per selection window


def winnow_fingerprints(
    docs: DataFrame, k: int = FINGERPRINT_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, pos, fp): TRUE winnowing (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003) — the fingerprint SET, not just the global min that
    ``doc_fingerprints`` keeps as a pre-cluster key.

    Per document: positional k-gram hashes, then for every window of
    ``w`` consecutive grams select the minimal ``(hash, pos)`` pair
    (min hash, leftmost tie — one deterministic rule, mirrored in the
    oracle), dedupe selections. The guarantee this buys (and the pytest
    pins): any shared token run of length >= w + k - 1 between two
    documents produces at least one shared fingerprint hash, and at most
    1/~(w) of positions are kept — bounded-density, position-robust
    near-dup evidence.

    Scale shape: pure per-document array algebra inside the codegen map
    stage — zero shuffles, like the rest of the fingerprint family. A
    document shorter than ``w`` grams winnows its single truncated
    window; shorter than ``k`` tokens yields no fingerprints.
    """
    h = phash_sql_expr(f"concat_ws(' ', slice(toks, i + 1, {k}))", 0)
    return (
        with_tokens(docs)
        .withColumn(
            "gp",
            F.expr(
                f"""
                CASE WHEN size(toks) < {k} THEN
                  CAST(array() AS array<struct<h: bigint, pos: bigint>>)
                ELSE transform(sequence(0, size(toks) - {k}),
                               i -> struct({h} AS h, bigint(i) AS pos))
                END
                """
            ),
        )
        .withColumn(
            "sel",
            F.expr(
                f"""
                CASE WHEN size(gp) = 0 THEN gp
                ELSE array_distinct(transform(
                       sequence(0, greatest(size(gp) - {w}, 0)),
                       j -> array_min(slice(gp, j + 1, {w}))))
                END
                """
            ),
        )
        .select("doc_id", F.explode("sel").alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("fp"))
    )


def length_filter(docs: DataFrame, max_tokens: int = 250) -> DataFrame:
    """P4: drop documents with >= max_tokens tokens
    (MAX_SENTENCE_LENGTH analog, utils/data.py:19)."""
    return with_tokens(docs).where(F.size("toks") < max_tokens).drop("toks")


# --- shared quality predicate (single source for plan + compositions) -------

QUALITY_MIN_TOKENS = 20
QUALITY_MAX_TOKENS = 200


def quality_pass_expr(toks: str = "toks") -> Column:
    """Boolean Column: does a document (with array column ``toks``) pass
    the curation thresholds (length window, stopword ceiling < 0.4,
    type/token floor > 0.25)? Exact integer cross-multiplication — no
    float ratio ever computed, so DuckDB mirrors it verbatim."""
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    return F.expr(
        f"""
        size({toks}) BETWEEN {QUALITY_MIN_TOKENS} AND {QUALITY_MAX_TOKENS}
        AND size(filter({toks}, t -> array_contains({stop_arr}, t))) * 5 < size({toks}) * 2
        AND size(array_distinct({toks})) * 4 > size({toks})
        """
    )


def quality_pass_sql(toks: str = "toks") -> str:
    """The identical predicate as a DuckDB fragment over a list column."""
    stop_sql = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    return (
        f"len({toks}) BETWEEN {QUALITY_MIN_TOKENS} AND {QUALITY_MAX_TOKENS}"
        f" AND len(list_filter({toks}, t -> list_contains({stop_sql}, t))) * 5 < len({toks}) * 2"
        f" AND len(list_distinct({toks})) * 4 > len({toks})"
    )


# --- char-trigram commonness score ------------------------------------------

TRIGRAM_DF_DENOM = 10  # "common" = document frequency > corpus_size / 10


def char_trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, g): DISTINCT character trigrams per document (codegen
    transform over substring — no UDF; empty for docs shorter than 3)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN length(text) < 3 THEN array()"
                " ELSE array_distinct(transform(sequence(0, length(text) - 3),"
                " i -> substring(text, i + 1, 3))) END"
            )
        ).alias("g"),
    )


def trigram_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_trigrams, n_common, common_ratio_1e6): the share of a
    document's distinct char trigrams that are corpus-common (document
    frequency > |corpus| / TRIGRAM_DF_DENOM — a scale-free threshold, so
    no global top-k sort funnels through one task). A crude char-LM
    proxy: gibberish and boilerplate-free body text separate cleanly.
    Two shuffles: the trigram DF aggregate and the per-doc rollup; the
    common-set join is trigram-vocabulary-sized (AQE broadcasts it)."""
    tg = char_trigrams(docs)
    n_docs = docs.agg(F.count("*").alias("_n"))
    common = (
        tg.groupBy("g")
        .agg(F.count("*").alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("_df") * TRIGRAM_DF_DENOM > F.col("_n"))
        .select("g", F.lit(1).alias("_c"))
    )
    scored = tg.join(common, "g", "left").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_trigrams"),
        F.sum(F.coalesce(F.col("_c"), F.lit(0))).cast("long").alias("n_common"),
    )
    return scored.select(
        "doc_id",
        "n_trigrams",
        "n_common",
        F.expr(
            "CAST((2 * n_common * 1000000 + n_trigrams) DIV (2 * n_trigrams) AS BIGINT)"
        ).alias("common_ratio_1e6"),
    )


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, surprisal_bits, mean_bits_1e6): integer unigram
    cross-entropy — the CCNet-style LM-perplexity quality filter, exact.

    Per-token surprisal is the bit-length gap ``bitlen(T) - bitlen(cnt)``
    (T = corpus token occurrences, cnt = the token's corpus frequency):
    an integer within 1 bit of ``-log2 p(token)``, so per-doc mean bits
    orders documents exactly like unigram perplexity would, with no float
    log anywhere — the score replays bit-for-bit cross-engine (the same
    ``length(bin(x))`` trick the HLL sketch uses, sketches.py).

    Shape at 10^12 docs: the Zipf table is one map-side-combined aggregate
    (vocab-sized output); the doc side pre-aggregates to (doc, token, c)
    grain BEFORE the vocabulary join, so the token-keyed shuffle carries
    distinct-types-per-doc rows, not every occurrence; the scalar total T
    is a broadcast-folded crossJoin. Two keyed shuffles end to end.
    """
    tok = (
        with_tokens(docs)
        .select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    freq = token_freq(docs)
    # T = total occurrences: a narrow doc-side scan (sum of array sizes),
    # NOT a second pass over the Zipf aggregate
    total = with_tokens(docs).agg(
        F.sum(F.size("toks")).cast("long").alias("_t")
    )
    scored = (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "c",
            (F.length(F.bin(F.col("_t"))) - F.length(F.bin(F.col("n"))))
            .cast("long")
            .alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("s")).cast("long").alias("surprisal_bits"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "surprisal_bits",
        F.expr(
            "CAST((2 * surprisal_bits * 1000000 + n_tokens) DIV (2 * n_tokens) AS BIGINT)"
        ).alias("mean_bits_1e6"),
    )


BACKOFF_BITS = 2  # Stupid Backoff alpha as a power of two: 2^-2 = 0.25


def bigram_score(docs: DataFrame, lm_docs: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_scored, n_backoff, bits, mean_bits_1e6): integer bigram
    LM score with Stupid Backoff (Brants et al. 2007) — the context-aware
    upgrade of unigram_surprisal's CCNet-style quality filter, still with
    no float log anywhere:

    * seen bigram:  bits = bitlen(cnt(w1)) - bitlen(cnt(w1 w2))
      (within 1 bit of -log2 of the conditional MLE; >= 0 since the
      bigram count never exceeds its context count);
    * unseen:       bits = BACKOFF_BITS + bitlen(T) - bitlen(cnt(w2))
      (alpha x unigram probability, alpha = 2^-BACKOFF_BITS);
    * first token:  unigram bits (no context).

    Shape at 10^12 docs: the bigram Zipf table is one map-side-combined
    aggregate (distinct-bigram-sized); the doc side pre-aggregates to
    (doc, w1, w2, c) grain BEFORE the joins, so the bigram-keyed shuffle
    carries distinct pairs per doc, not occurrences; unigram counts join
    by token key (AQE-broadcast on closed vocabularies, tiered hot/tail
    at web scale — the alphabet_encode discipline); T is one
    broadcast-folded scalar. n_backoff is a data-quality signal in its
    own right (out-of-distribution word order).

    ``lm_docs`` is the reference corpus the LM tables are built from
    (default: ``docs`` itself — self-scoring, where backoff is provably
    never taken). The production shape scores a crawl DELTA against the
    base corpus's persisted LM tables: unseen word order then actually
    backs off, which is the filter signal.
    """
    toks = with_tokens(docs)
    lm_toks = toks if lm_docs is None else with_tokens(lm_docs)
    pairs_expr = F.expr(
        """
        CASE WHEN size(toks) < 2 THEN array()
             ELSE transform(sequence(0, size(toks) - 2),
                            i -> named_struct('w1', toks[i], 'w2', toks[i + 1]))
        END
        """
    )
    corpus_big = (
        lm_toks.select(F.explode(pairs_expr).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").cast("long").alias("cb"))
    )
    uni = token_freq(docs if lm_docs is None else lm_docs)
    total = lm_toks.agg(F.sum(F.size("toks")).cast("long").alias("_t"))

    dpairs = (
        toks.select("doc_id", F.explode(pairs_expr).alias("p"))
        .groupBy("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    pair_bits = (
        dpairs.join(corpus_big, ["w1", "w2"], "left")
        .join(uni.select(F.col("token").alias("w1"), F.col("n").alias("n1")), "w1")
        .join(uni.select(F.col("token").alias("w2"), F.col("n").alias("n2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "c",
            F.expr(
                f"""CASE WHEN cb IS NOT NULL
                         THEN length(bin(n1)) - length(bin(cb))
                         ELSE {BACKOFF_BITS} + length(bin(_t)) - length(bin(n2))
                    END"""
            ).cast("long").alias("s"),
            F.expr("CASE WHEN cb IS NULL THEN c ELSE 0 END").cast("long").alias("bk"),
        )
    )
    first_bits = (
        toks.where(F.size("toks") >= 1)
        .select("doc_id", F.col("toks")[0].alias("token"))
        .join(uni, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.lit(1).cast("long").alias("c"),
            (F.length(F.bin(F.col("_t"))) - F.length(F.bin(F.col("n"))))
            .cast("long")
            .alias("s"),
            F.lit(0).cast("long").alias("bk"),
        )
    )
    return (
        pair_bits.unionByName(first_bits)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_scored"),
            F.sum("bk").cast("long").alias("n_backoff"),
            F.sum(F.col("c") * F.col("s")).cast("long").alias("bits"),
        )
        .select(
            "doc_id",
            "n_scored",
            "n_backoff",
            "bits",
            F.expr(
                "CAST((2 * bits * 1000000 + n_scored) DIV (2 * n_scored) AS BIGINT)"
            ).alias("mean_bits_1e6"),
        )
    )


def token_drift_tv(hist: DataFrame, v_a: int, v_b: int) -> DataFrame:
    """(n_tokens_a, n_tokens_b, n_types, tv_1e6) — total-variation
    distance between two crawl snapshots' token distributions:
    TV = (1/2) * sum over types of |p_a(t) - p_b(t)|. THE drift alarm a
    recurring-ingest pipeline puts on its tokenizer/extractor: TV ~ 0
    means the new crawl speaks the same language as the old one; a jump
    means either the web moved or the pipeline broke.

    Exactness: |c_a/N_a - c_b/N_b| cross-multiplies to
    |c_a*N_b - c_b*N_a| / (N_a*N_b) — summed in integers (one HUGEINT-
    safe BIGINT sum; counts and totals are bounded by corpus size) and
    divided once at the end, half-up. No per-type rounding at all, so
    the result is the mathematically exact TV at micro precision.

    Scale shape: one token-keyed count aggregate per side (map-side
    combinable), a full-outer join on token (missing side = 0), then a
    scalar fold. The totals ride as two broadcast-sized one-row tables
    crossJoined in (the kmeans-scalar precedent), never collected.
    """
    def side(v: int, name: str) -> DataFrame:
        toks = (
            hist.where(F.col("v") == v)
            .select(F.explode(F.split("text", " ")).alias("token"))
            .where(F.col("token") != "")
        )
        return toks.groupBy("token").agg(
            F.count("*").cast("long").alias(name)
        )
    a = side(v_a, "c_a")
    b = side(v_b, "c_b")
    j = a.join(b, "token", "full_outer").select(
        F.coalesce("c_a", F.lit(0)).cast("long").alias("c_a"),
        F.coalesce("c_b", F.lit(0)).cast("long").alias("c_b"),
    )
    tot = (
        j.agg(
            F.sum("c_a").cast("long").alias("n_a"),
            F.sum("c_b").cast("long").alias("n_b"),
        )
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n_a").cast("long").alias("n_tokens_a"),
            F.max("n_b").cast("long").alias("n_tokens_b"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.expr("abs(c_a * n_b - c_b * n_a)"))
            .cast("long")
            .alias("_num"),
        )
        .select(
            "n_tokens_a",
            "n_tokens_b",
            "n_types",
            F.expr(
                "CAST((2 * _num * 1000000 + 2 * n_tokens_a * n_tokens_b)"
                " DIV (2 * 2 * n_tokens_a * n_tokens_b) AS BIGINT)"
            ).alias("tv_1e6"),
        )
    )


DRIFT_TOP_K = 20


def token_drift_heavy(
    hist: DataFrame, v_a: int, v_b: int, k: int = DRIFT_TOP_K
) -> DataFrame:
    """(token, c_a, c_b, delta_x, rank) — the k tokens driving the
    distributional drift between two snapshots, ranked by the exact
    cross-multiplied mass |c_a*N_b - c_b*N_a| (the same integer the TV
    distance sums, so "top drift tokens" and "total drift" are the same
    currency). The triage view behind the txt_drift_tv alarm: WHAT
    moved — a vocabulary shift, one template exploding, a tokenizer
    regression on punctuation.

    Scale shape: same count-aggregate + full-outer join as the TV fold,
    then rank <= k over ONE unkeyed window — but ordered on a value
    computed AT the (token) grain, so Spark's WindowGroupLimit partial
    top-k bounds every map task's exchange contribution at k rows; the
    single reducer sees tasks*k rows, never the vocabulary.
    """
    from pyspark.sql import Window

    def side(v: int, name: str) -> DataFrame:
        return (
            hist.where(F.col("v") == v)
            .select(F.explode(F.split("text", " ")).alias("token"))
            .where(F.col("token") != "")
            .groupBy("token")
            .agg(F.count("*").cast("long").alias(name))
        )

    j = side(v_a, "c_a").join(side(v_b, "c_b"), "token", "full_outer").select(
        "token",
        F.coalesce("c_a", F.lit(0)).cast("long").alias("c_a"),
        F.coalesce("c_b", F.lit(0)).cast("long").alias("c_b"),
    )
    tot = j.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
    )
    scored = j.crossJoin(F.broadcast(tot)).select(
        "token",
        "c_a",
        "c_b",
        F.expr("abs(c_a * n_b - c_b * n_a)").cast("long").alias("delta_x"),
    )
    # global top-k as orderBy + limit -> TakeOrderedAndProject: each task
    # forwards its local k, the driver merges tasks*k rows. An UNKEYED
    # rank<=k window does NOT get the WindowGroupLimit rewrite here, so
    # it would sort the whole vocabulary through one task; the rank is
    # attached afterwards by a window over the k survivors only.
    top = scored.orderBy(F.col("delta_x").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("delta_x").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# --- Heaps-law vocabulary growth (corpus-size planning) ---------------------
#
# V(n) = distinct word-k-shingle types among the first n token positions
# of the corpus (deterministic doc_id order). The curve that answers "how
# much NEW vocabulary does the next crawl slice buy" — dataset-scaling
# planning reads its slope (Heaps' law V ~ K*n^beta) directly. Exact at
# power-of-two checkpoints; no sampling, no floats.

HEAPS_K = 3          # shingle width (token types saturate the closed vocab)
HEAPS_OFF_SPAN = 1024  # docs per offset bucket (two-level cumsum grain)


def shingle_first_pos(docs: DataFrame, k: int = HEAPS_K) -> DataFrame:
    """(sh, first_pos) — each distinct word-k-shingle's first global
    token position (position = tokens before this doc + in-doc index,
    doc_id order).

    Doc offsets resolve two-level (the build_vocab / compaction-cumsum
    discipline): within-bucket window + one window over the bucket-total
    table (doc_count / SPAN rows), so no doc-grain data funnels through
    a single task. Shingle indexing is one codegen transform; the first
    position is one min aggregate."""
    lens = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n"),
        (F.col("doc_id") / HEAPS_OFF_SPAN).cast("long").alias("bkt"),
    )
    local = lens.withColumn(
        "loc",
        F.coalesce(
            F.sum("n").over(
                Window.partitionBy("bkt")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    btot = lens.groupBy("bkt").agg(F.sum("n").alias("bn"))
    boff = btot.withColumn(
        "boff",
        F.coalesce(
            F.sum("bn").over(
                Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bkt", "boff")
    offs = local.join(F.broadcast(boff), "bkt").select(
        "doc_id", (F.col("loc") + F.col("boff")).cast("long").alias("off")
    )
    sh = docs.select("doc_id", F.split("text", " ").alias("t")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(t) < {k} THEN array() "
                f"ELSE transform(sequence(0, size(t) - {k}), i -> "
                f"named_struct('i', CAST(i AS BIGINT), "
                f"'sh', concat_ws(' ', slice(t, i + 1, {k})))) END"
            )
        ).alias("e"),
    )
    return (
        sh.join(offs, "doc_id")
        .select("e.sh", (F.col("off") + F.col("e.i")).alias("p"))
        .groupBy("sh")
        .agg(F.min("p").cast("long").alias("first_pos"))
    )


def heaps_curve(docs: DataFrame, k: int = HEAPS_K) -> DataFrame:
    """(kbit, checkpoint, new_types, vocab_size) — vocabulary growth at
    power-of-two prefixes: bucket kbit = bitlen(first_pos + 1), so
    ``vocab_size`` at checkpoint 2^kbit - 1 tokens is the cumulative
    type count (exact: first_pos <= 2^kbit - 2 <=> the shingle starts
    inside the prefix). The cumsum window runs over <= 62 bucket rows."""
    fp = shingle_first_pos(docs, k)
    buckets = (
        fp.select(F.expr("length(bin(first_pos + 1))").cast("long").alias("kbit"))
        .groupBy("kbit")
        .agg(F.count("*").alias("new_types"))
    )
    w = Window.orderBy("kbit").rowsBetween(Window.unboundedPreceding, 0)
    return buckets.select(
        "kbit",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(kbit AS INT)) - 1").alias(
            "checkpoint"
        ),
        "new_types",
        F.sum("new_types").over(w).cast("long").alias("vocab_size"),
    )


# ---------------------------------------------------------------------------
# Unseen-vocabulary mass (Chao1 + Good-Turing)
# ---------------------------------------------------------------------------


def vocab_richness(docs: DataFrame) -> DataFrame:
    """(lang, n_tokens, n_types, f1, f2, chao1, unseen_p_1e6) — how much
    vocabulary the corpus has NOT yet shown, per language, at the word-
    TRIGRAM grain (the closed synthetic unigram vocabulary saturates —
    31 types, zero hapaxes — which would make the gate vacuous; the
    trigram species space is open, the same reason heaps_curve counts
    3-shingles): Chao1
    species-richness (S + f1^2 / (2*f2), the abundance-based lower
    bound) and the Good-Turing unseen-probability mass f1/N, both from
    the hapax (f1) and doubleton (f2) counts. The companion to the
    Heaps curve (heaps_curve): that one says how fast types arrive,
    this one says how many remain. All half-up integers; f2 = 0 uses
    the bias-corrected Chao1 form f1*(f1-1)/2 (+S), finite on both
    engines.

    Plan: one (lang, token) count aggregate (map-side combined,
    skew-free high-cardinality keys), one (lang, count) frequency-of-
    frequencies aggregate (metadata-grain), one final per-lang
    projection — no sorts, no windows."""
    tok = docs.select(
        "lang",
        F.explode(
            F.expr(
                """
                CASE WHEN size(split(text, ' ')) < 3 THEN array()
                     ELSE transform(sequence(0, size(split(text, ' ')) - 3),
                                    i -> concat_ws(' ',
                                                   slice(split(text, ' '),
                                                         i + 1, 3)))
                END
                """
            )
        ).alias("token"),
    )
    cnt = tok.groupBy("lang", "token").agg(F.count("*").alias("c"))
    fof = cnt.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
    )
    return fof.select(
        "lang", "n_tokens", "n_types", "f1", "f2",
        F.expr(
            "CAST(CASE WHEN f2 > 0 THEN n_types + (2 * f1 * f1 + 2 * f2)"
            " DIV (4 * f2) ELSE n_types + (f1 * (f1 - 1)) DIV 2 END"
            " AS BIGINT)"
        ).alias("chao1"),
        F.expr(
            "CAST((2 * f1 * 1000000 + n_tokens) DIV (2 * n_tokens)"
            " AS BIGINT)"
        ).alias("unseen_p_1e6"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency audit (bitlen buckets, no floats)
# ---------------------------------------------------------------------------


def zipf_buckets(docs: DataFrame) -> DataFrame:
    """(rank_kbit, n_types, min_freq, max_freq, mean_freq_bits_1e6) —
    the Zipf diagnostic with zero floats: frequency-rank tokens
    (count desc, token asc — total order, resume-stable), bucket by
    bitlen(rank), report each bucket's mean frequency BIT LENGTH in
    micro-bits. Under Zipf's law freq ~ C/rank, so mean_freq_bits falls
    by ~1 per rank_kbit step — the slope the audit reads; a corpus of
    duplicated boilerplate flattens it.

    Plan note: the rank is a window over the VOCABULARY-grain count
    table ordered by (count, token) — for a 10^9-type web vocabulary
    swap in the two-level rank (operators/labels.py); the bucket
    aggregate is <= 62 rows."""
    from pyspark.sql import Window

    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    ranked = cnt.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("token")))
        .cast("long")
        .alias("rank"),
    )
    b = ranked.select(
        F.length(F.bin(F.col("rank"))).cast("long").alias("rank_kbit"),
        "c",
        (F.length(F.bin(F.col("c")))).cast("long").alias("fbits"),
    )
    return b.groupBy("rank_kbit").agg(
        F.count("*").cast("long").alias("n_types"),
        F.min("c").cast("long").alias("min_freq"),
        F.max("c").cast("long").alias("max_freq"),
        F.expr(
            "CAST((2 * sum(fbits) * 1000000 + count(*))"
            " DIV (2 * count(*)) AS BIGINT)"
        ).alias("mean_freq_bits_1e6"),
    )


RAKE_SCALE = 1_000_000


def rake_keyphrases(docs: DataFrame) -> DataFrame:
    """(doc_id, phrase, rake_scaled) — RAKE keyphrase extraction (Rose,
    Engel, Cramer & Cowley 2010): candidate phrases are maximal runs of
    non-stopword tokens (split at the frozen STOPWORDS), scored by the
    degree/frequency ratio of their constituent words.

    Exact-integer formulation (the repo contract): per document,
    freq(w) = occurrences of w inside candidate phrases, deg(w) = sum
    of the lengths of the phrase occurrences containing w (so deg
    counts w's co-occurrence neighborhood including itself, the
    canonical RAKE degree); phrase score = sum over its word TOKENS
    (with multiplicity) of (deg(w) * RAKE_SCALE) DIV freq(w) —
    truncating division, deterministic on both engines. Repeated
    phrases in one document collapse to one row (their scores are
    identical because word statistics are document-grain).

    Shape at scale: segment ids come from one running sum over the
    token stream (window partitioned by doc_id — no corpus-grain
    shuffle); phrase assembly, word statistics and scoring are all
    groupBy/join keyed by doc_id — per-document work that parallelizes
    by document count, the embarrassing dimension at 10^12 docs."""
    from pyspark.sql import Window

    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    toks = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
        )
        .where(F.col("token") != "")
        .withColumn(
            "is_stop", F.expr(f"CAST(array_contains({stop_arr}, token) AS INT)")
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    words = (
        toks.withColumn("seg", F.sum("is_stop").over(w))
        .where(F.col("is_stop") == 0)
        .select("doc_id", "seg", "pos", "token")
    )
    phrases = words.groupBy("doc_id", "seg").agg(
        F.expr(
            "concat_ws(' ', transform(array_sort(collect_list("
            "named_struct('pos', pos, 'token', token))), s -> s.token))"
        ).alias("phrase"),
        F.count("*").cast("long").alias("plen"),
    )
    occ = words.join(phrases.select("doc_id", "seg", "plen"), ["doc_id", "seg"])
    stats = occ.groupBy("doc_id", "token").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    scored = (
        words.join(stats, ["doc_id", "token"])
        .groupBy("doc_id", "seg")
        .agg(
            F.sum(F.expr(f"(deg * {RAKE_SCALE}) DIV freq"))
            .cast("long")
            .alias("rake_scaled")
        )
    )
    return (
        phrases.join(scored, ["doc_id", "seg"])
        .select("doc_id", "phrase", "rake_scaled")
        .distinct()
    )


def token_drift_psi(hist: DataFrame, v_a: int, v_b: int) -> DataFrame:
    """(n_tokens_a, n_tokens_b, n_types, psi_bits_1e3) — Population
    Stability Index between two crawl snapshots' token distributions,
    the industry-standard drift alarm next to the exact TV distance
    (token_drift_tv): PSI = sum over types (p_a - p_b) * log(p_a/p_b).

    Pinned integer formulation (the repo's bitlen-log2 idiom, cf.
    unigram_surprisal / the Fellegi-Sunter weights): add-one smoothing
    (p'_x = (c_x + 1) / (N_x + T), T = type count — PSI is undefined on
    zero bins), log2 at whole-bit resolution via
    L = bitlen((c_a+1)(N_b+T)) - bitlen((c_b+1)(N_a+T)), and the
    probability gap as the exact cross-multiplied integer
    diff = (c_a+1)(N_b+T) - (c_b+1)(N_a+T). diff and L always share
    sign (bitlen is monotone), so every term diff * L is >= 0 and the
    single half-up division at the end is portable. Milli-bit scale
    keeps 2 * sum * 1000 < 2^63 through ~10^8-token snapshots; beyond
    that drop the scale (the oracle scales with it).

    Scale shape: identical to token_drift_tv — two token-keyed counts,
    one full-outer join, totals folded back by broadcast, one scalar
    aggregate. Zero collects."""
    def side(v: int, name: str) -> DataFrame:
        toks = (
            hist.where(F.col("v") == v)
            .select(F.explode(F.split("text", " ")).alias("token"))
            .where(F.col("token") != "")
        )
        return toks.groupBy("token").agg(
            F.count("*").cast("long").alias(name)
        )

    j = side(v_a, "c_a").join(side(v_b, "c_b"), "token", "full_outer").select(
        F.coalesce("c_a", F.lit(0)).cast("long").alias("c_a"),
        F.coalesce("c_b", F.lit(0)).cast("long").alias("c_b"),
    )
    tot = j.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum("c_b").cast("long").alias("n_b"),
        F.count("*").cast("long").alias("n_t"),
    )
    terms = j.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        "n_t",
        F.expr("(c_a + 1) * (n_b + n_t)").alias("xa"),
        F.expr("(c_b + 1) * (n_a + n_t)").alias("xb"),
    )
    return (
        terms.select(
            "n_a",
            "n_b",
            "n_t",
            F.expr(
                "(xa - xb) * (CAST(length(bin(xa)) AS BIGINT)"
                " - CAST(length(bin(xb)) AS BIGINT))"
            ).alias("term"),
        )
        .agg(
            F.max("n_a").alias("n_tokens_a"),
            F.max("n_b").alias("n_tokens_b"),
            F.max("n_t").alias("n_types"),
            F.sum("term").cast("long").alias("_num"),
            F.max(F.expr("(n_a + n_t) * (n_b + n_t)")).alias("_den"),
        )
        .select(
            "n_tokens_a",
            "n_tokens_b",
            "n_types",
            F.expr(
                "CAST((2 * _num * 1000 + _den) DIV (2 * _den) AS BIGINT)"
            ).alias("psi_bits_1e3"),
        )
    )


# --- interpolated Kneser-Ney bigram LM --------------------------------

KN_D_NUM = 3  # absolute discount D = 3/4 (exact rational)
KN_D_DEN = 4


def kneser_ney_bigrams(docs: DataFrame) -> DataFrame:
    """(w1, w2, c12, p_1e6) — interpolated Kneser-Ney conditional
    probability for every SEEN bigram, in exact integer pieces.

    Kneser-Ney (1995; Chen-Goodman 1998 interpolated form) is the
    reference smoothing for count-based LMs — the continuation-count
    idea ("how many contexts does w2 follow?") is what distinguishes
    it from the Stupid-Backoff scorer above (bigram_score), which
    backs off by raw unigram frequency. With absolute discount
    D = 3/4, multiplying through by 4 * c1 * N1b clears every
    denominator:

        P(w2|w1) = [max(4*c12 - 3, 0) * N1b + 3 * N1w1 * N1c2]
                   / (4 * c1 * N1b)

    where c1 = count of context w1, N1w1 = distinct continuations of
    w1, N1c2 = distinct left-contexts of w2, N1b = distinct bigrams.
    The emitted micro-unit probability is num * 10^6 DIV den — every
    input an aggregation count, no float anywhere. (At 10^12-token
    scale num would ride DECIMAL(38) — c12 * N1b exceeds int64 there;
    the gate corpus stays far inside.)

    Shape at scale: the bigram table is one map-side-combined
    aggregate; c1 / N1w1 / N1c2 are groupBys OF THAT TABLE (not of
    the corpus); N1b is a one-row broadcast. Joins are bigram-keyed;
    closed vocabularies AQE-broadcast, open ones use the tiered
    hot/tail discipline (alphabet_encode)."""
    toks = with_tokens(docs)
    pairs_expr = F.expr(
        """
        CASE WHEN size(toks) < 2 THEN array()
             ELSE transform(sequence(0, size(toks) - 2),
                            i -> named_struct('w1', toks[i], 'w2', toks[i + 1]))
        END
        """
    )
    big = (
        toks.select(F.explode(pairs_expr).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").cast("long").alias("c12"))
    )
    c1 = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1w1"),
    )
    n1c2 = big.groupBy("w2").agg(F.count("*").cast("long").alias("n1c2"))
    n1b = big.agg(F.count("*").cast("long").alias("n1b"))
    return (
        big.join(c1, "w1")
        .join(n1c2, "w2")
        .crossJoin(F.broadcast(n1b))
        .select(
            "w1",
            "w2",
            "c12",
            F.expr(
                f"""CAST((greatest({KN_D_DEN} * c12 - {KN_D_NUM}, 0) * n1b
                          + {KN_D_NUM} * n1w1 * n1c2) * 1000000
                         DIV ({KN_D_DEN} * c1 * n1b) AS BIGINT)"""
            ).alias("p_1e6"),
        )
    )


def kneser_ney_normalization(docs: DataFrame) -> DataFrame:
    """(w1, c1, n1w1, lhs, den, ok) — the closed-form proof that the
    interpolated KN distribution sums to EXACTLY one per context:

        sum_{w2 in V} num(w1, w2)
          = (4*c1 - 3*N1w1) * N1b                     [seen mass]
            + 3 * N1w1 * (N1b - sum_{seen w2} N1c2)   [unseen backoff]
            + 3 * N1w1 * sum_{seen w2} N1c2           [seen backoff]
          = 4 * c1 * N1b = den.

    The identity needs only seen-bigram tables (the unseen sum
    telescopes through sum_V N1c2 = N1b), so verifying it is
    aggregation-cheap at any scale; ok = 1 rows are the contract."""
    toks = with_tokens(docs)
    pairs_expr = F.expr(
        """
        CASE WHEN size(toks) < 2 THEN array()
             ELSE transform(sequence(0, size(toks) - 2),
                            i -> named_struct('w1', toks[i], 'w2', toks[i + 1]))
        END
        """
    )
    big = (
        toks.select(F.explode(pairs_expr).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").cast("long").alias("c12"))
    )
    c1 = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count("*").cast("long").alias("n1w1"),
    )
    n1c2 = big.groupBy("w2").agg(F.count("*").cast("long").alias("n1c2"))
    n1b = big.agg(F.count("*").cast("long").alias("n1b"))
    seen = (
        big.join(n1c2, "w2")
        .groupBy("w1")
        .agg(
            F.sum(F.expr(f"greatest({KN_D_DEN} * c12 - {KN_D_NUM}, 0)"))
            .cast("long")
            .alias("seen_disc"),
            F.sum("n1c2").cast("long").alias("seen_n1c2"),
        )
    )
    return (
        c1.join(seen, "w1")
        .crossJoin(F.broadcast(n1b))
        .select(
            "w1",
            "c1",
            "n1w1",
            F.expr(
                f"CAST(seen_disc * n1b + {KN_D_NUM} * n1w1 * n1b AS BIGINT)"
            ).alias("lhs"),
            F.expr(f"CAST({KN_D_DEN} * c1 * n1b AS BIGINT)").alias("den"),
            F.expr(
                f"CAST(CAST(seen_disc * n1b + {KN_D_NUM} * n1w1 * n1b = "
                f"{KN_D_DEN} * c1 * n1b AS INT) AS BIGINT)"
            ).alias("ok"),
        )
    )
