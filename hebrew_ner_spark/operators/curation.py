"""Training-data curation operators: PII redaction, repetition signals,
token-budget sampling.

These generalize the reference's corpus-preparation stance (its CoNLL
pipeline filters sentences by length and normalizes text before
training — utils/data.py length filters, utils/hebrew.py normalizers)
into the three curation stages an LLM web-corpus pipeline runs after
dedup/quality: strip PII, drop degenerate-repetition documents (the
Gopher repetition rules), and cut a deterministic token-budget sample
per language stratum.

Scale notes (the reason these shapes were chosen):

* ``redact_pii`` is pure codegen column expressions — zero shuffles,
  regexes engine-portable (no lookaround, explicit classes) so the
  DuckDB oracle replays them exactly.
* ``repetition_stats`` shuffles on (doc_id, gram) — high-cardinality,
  skew-free keys with map-side partial aggregation; nothing quadratic.
* ``token_budget_sample`` is the part naive implementations get wrong
  at 100 TB: a per-stratum running sum is a single-task window over the
  whole stratum. Here the prefix is resolved at BUCKET grain first
  (≤ N_BUCKETS rows per stratum — trivially small), and only the ONE
  boundary bucket per stratum (~1/N_BUCKETS of the data) is resolved at
  document grain. Both windows are deterministic (portable-hash order),
  so the sample is reproducible across runs, partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_col

# Engine-portable PII patterns: ASCII classes only, no lookaround, no
# backreferences — the Java (Spark) and RE2 (DuckDB) subsets agree.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"

# Redaction order is part of the contract (each pass sees the previous
# pass's output): emails first (they can contain digit runs), then IPs,
# then phones.
_REDACTIONS = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]

N_BUCKETS = 256  # token_budget_sample bucket fan-out
SAMPLE_SEED = 7


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted, n_email, n_ip, n_phone): counts are measured on
    the ORIGINAL text, then the three patterns are replaced in a fixed
    order. One narrow codegen stage, zero shuffles, no Python."""
    red = F.col(text_col)
    for pat, tag in _REDACTIONS:
        red = F.regexp_replace(red, pat, tag)
    return docs.select(
        "doc_id",
        red.alias("redacted"),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(F.col(text_col), F.lit(IPV4_RE)).cast("long").alias("n_ip"),
        F.regexp_count(F.col(text_col), F.lit(PHONE_RE)).cast("long").alias("n_phone"),
    )


def _grams(toks_col: str, k: int) -> F.Column:
    """All word k-grams (NOT distinct — repetition needs multiplicity)."""
    return F.expr(
        f"""
        CASE WHEN size({toks_col}) < {k} THEN array()
             ELSE transform(sequence(0, size({toks_col}) - {k}),
                            i -> concat_ws(' ', slice({toks_col}, i + 1, {k})))
        END
        """
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document:

    * ``top2_frac_1e6``  — occurrences of the most frequent 2-gram over
      total 2-grams (Gopher "top n-gram fraction");
    * ``dup5_frac_1e6``  — fraction of 5-gram occurrences that are
      repeats of an earlier occurrence (Gopher "duplicate n-gram
      fraction").

    Fractions use the repo's exact integer half-up rounding, so the
    DuckDB oracle matches bit-for-bit. Documents too short for a k-gram
    report 0 (no evidence of repetition). Shuffle keys are
    (doc_id, gram): high-cardinality, partial-agg friendly, skew-free.
    """
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    base = toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))

    def _agg(k: int):
        g = toks.select(
            "doc_id", F.explode(_grams("toks", k)).alias("gram")
        )
        per_gram = g.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
        return per_gram.groupBy("doc_id").agg(
            F.sum("cnt").alias(f"tot{k}"),
            F.max("cnt").alias(f"max{k}"),
            F.count("*").alias(f"n_distinct{k}"),
        )

    a2, a5 = _agg(2), _agg(5)
    joined = base.join(a2, "doc_id", "left").join(a5, "doc_id", "left")
    return joined.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "CASE WHEN tot2 IS NULL THEN CAST(0 AS BIGINT) ELSE "
            "CAST((2 * max2 * 1000000 + tot2) DIV (2 * tot2) AS BIGINT) END"
        ).alias("top2_frac_1e6"),
        F.expr(
            "CASE WHEN tot5 IS NULL THEN CAST(0 AS BIGINT) ELSE "
            "CAST((2 * (tot5 - n_distinct5) * 1000000 + tot5) DIV (2 * tot5) AS BIGINT) END"
        ).alias("dup5_frac_1e6"),
    )


def token_budget_sample(docs: DataFrame, budget_per_lang: int) -> DataFrame:
    """Deterministic per-language token-budget sample: keep the hash-order
    prefix of each lang stratum whose cumulative token count fits the
    budget. Two-level resolution (bucket prefix + one boundary bucket at
    doc grain) — see module docstring for why the naive per-stratum
    window does not survive 100 TB.

    Selection rule (identical in the oracle): within each lang, docs
    order by (bucket, h, doc_id) where h = phash('SMP|' || doc_id) and
    bucket = h % N_BUCKETS; a doc is kept iff its cumulative token count
    (inclusive) under that order <= budget. Bucket-major order is what
    makes the two-level resolution exact — full prefix buckets are kept
    wholesale, and only the first over-budget bucket needs doc grain.
    """
    d = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        phash_col(F.concat(F.lit("SMP|"), F.col("doc_id").cast("string")), SAMPLE_SEED).alias("h"),
    ).withColumn("bucket", F.col("h") % N_BUCKETS)

    # bucket grain: <= N_BUCKETS rows per lang — the window is tiny
    bt = d.groupBy("lang", "bucket").agg(F.sum("n_toks").alias("btoks"))
    wb = Window.partitionBy("lang").orderBy("bucket")
    bt = bt.withColumn("bcum", F.sum("btoks").over(wb)).withColumn(
        "bprev", F.col("bcum") - F.col("btoks")
    )

    full = bt.where(F.col("bcum") <= budget_per_lang).select("lang", "bucket")
    boundary = bt.where(
        (F.col("bprev") < budget_per_lang) & (F.col("bcum") > budget_per_lang)
    ).select("lang", "bucket", "bprev")

    kept_full = d.join(F.broadcast(full), ["lang", "bucket"], "left_semi")

    # doc grain only inside the one boundary bucket per lang (~1/N_BUCKETS
    # of each stratum)
    wd = Window.partitionBy("lang").orderBy("h", "doc_id")
    bdocs = (
        d.join(F.broadcast(boundary), ["lang", "bucket"])
        .withColumn("dcum", F.sum("n_toks").over(wd))
        .where(F.col("bprev") + F.col("dcum") <= budget_per_lang)
    )

    return kept_full.select("lang", "doc_id", "n_toks").unionByName(
        bdocs.select("lang", "doc_id", "n_toks")
    )


def dedup_canonical(docs: DataFrame) -> DataFrame:
    """(component_id, keep_doc_id, n_members, n_dropped): canonical-copy
    selection over near-duplicate clusters — the curation step that turns
    dedup CLUSTERS into a KEEP decision (C4/CCNet keep the richest copy;
    docs in no cluster are implicitly kept).

    Survivor rule is deterministic: longest text wins, doc_id ascending
    breaks ties. One shuffle of the component table (cluster membership
    is LSH-capped upstream, so no window partition exceeds the bucket
    cap); the doc-length side joins at doc grain before the window, so
    text itself never shuffles — only (doc_id, n_chars).
    """
    from hebrew_ner_spark.operators import canonicalize, dedup

    comp = canonicalize.dedup_components(dedup.near_dup_pairs_all(docs))
    stats = docs.select("doc_id", F.length("text").cast("long").alias("n_chars"))
    j = comp.join(stats, "doc_id")
    sel = Window.partitionBy("component_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    members = Window.partitionBy("component_id")
    return (
        j.withColumn("rk", F.row_number().over(sel))
        .withColumn("n_members", F.count("*").over(members).cast("long"))
        .where(F.col("rk") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("keep_doc_id"),
            "n_members",
            (F.col("n_members") - F.lit(1)).cast("long").alias("n_dropped"),
        )
    )


BOILER_K = 3  # word-gram size for cross-document boilerplate detection
BOILER_DF_DENOM = 100  # boilerplate = gram present in > n_docs/100 documents


def boilerplate_ngrams(
    docs: DataFrame, k: int = BOILER_K, denom: int = BOILER_DF_DENOM
) -> DataFrame:
    """(gram, df): word k-grams whose DOCUMENT frequency clears the
    scale-free corpus threshold ``df * BOILER_DF_DENOM > n_docs`` — the
    header/footer/navigation boilerplate table a stripping pass consumes
    (the cross-document mirror of Gopher's within-document repetition
    signals above). Per-doc grams dedup BEFORE the aggregate (presence,
    not multiplicity, defines boilerplate), so the shuffle carries
    distinct (doc, gram) rows; the df aggregate is map-side combined and
    the scalar corpus size is a broadcast-folded crossJoin — no global
    top-k sort anywhere.
    """
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toks.select(
        "doc_id", F.explode(F.array_distinct(_grams("toks", k))).alias("gram")
    )
    n_docs = docs.agg(F.count("*").alias("_n"))
    return (
        grams.groupBy("gram")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("df") * denom > F.col("_n"))
        .select("gram", "df")
    )


def boilerplate_fraction(
    docs: DataFrame, k: int = BOILER_K, denom: int = BOILER_DF_DENOM
) -> DataFrame:
    """(doc_id, n_grams, n_boiler, boiler_ratio_1e6): the share of each
    document's k-gram OCCURRENCES covered by the corpus boilerplate
    table — the per-doc strip/keep quality signal. The boilerplate side
    is corpus-thresholded (tiny by construction: AQE broadcasts it), so
    the join adds no doc-side shuffle; docs shorter than k report 0/0
    with ratio 0 (explode_outer keeps them as a null-gram row that
    count(gram) ignores — no back-join against the doc table, one
    doc-keyed exchange total)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toks.select(
        "doc_id", F.explode_outer(_grams("toks", k)).alias("gram")
    )
    boiler = boilerplate_ngrams(docs, k, denom).select(
        "gram", F.lit(1).alias("_b")
    )
    return (
        grams.join(boiler, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gram").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_b"), F.lit(0))).cast("long").alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            F.expr(
                "CASE WHEN n_grams = 0 THEN CAST(0 AS BIGINT) ELSE "
                "CAST((2 * n_boiler * 1000000 + n_grams) DIV (2 * n_grams) AS BIGINT) END"
            ).alias("boiler_ratio_1e6"),
        )
    )


PPL_HEAD_Q = 33  # head = cleanest third (lowest surprisal), CCNet's split
PPL_MID_Q = 67


def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, mean_bits_1e6, bucket): CCNet's perplexity
    bucketing (Wenzek et al. 2020) — per-language head/middle/tail split
    of the corpus by LM score, used to stratify training-data sampling
    toward the cleanest third. The LM score is the exact-integer unigram
    surprisal (textstats.unigram_surprisal); thresholds are the
    per-language integer percentile_disc 33/67 from the sort-free
    histogram quantiles (operators/quantiles.py) — deterministic and
    resume-stable, unlike approxQuantile.

    Plan shape: surprisal's two keyed shuffles, one (lang, score)
    histogram aggregate (map-side combined, <= |distinct scores| rows
    per language), one per-lang window over that tiny histogram, and a
    BROADCAST of the per-language threshold table back onto the doc
    side — the labeling pass itself is map-side.
    """
    from hebrew_ner_spark.operators.quantiles import exact_quantiles
    from hebrew_ner_spark.operators.textstats import unigram_surprisal

    s = unigram_surprisal(docs).join(docs.select("doc_id", "lang"), "doc_id")
    qs = exact_quantiles(
        s, "lang", F.col("mean_bits_1e6"), [PPL_HEAD_Q, PPL_MID_Q]
    )
    th = qs.groupBy("lang").agg(
        F.min(F.when(F.col("q") == PPL_HEAD_Q, F.col("v"))).alias("p_head"),
        F.min(F.when(F.col("q") == PPL_MID_Q, F.col("v"))).alias("p_mid"),
    )
    return s.join(F.broadcast(th), "lang").select(
        "doc_id",
        "lang",
        "mean_bits_1e6",
        F.when(F.col("mean_bits_1e6") <= F.col("p_head"), F.lit("head"))
        .when(F.col("mean_bits_1e6") <= F.col("p_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def curation_pipeline(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, mean_bits_1e6, bucket): the composed curation
    funnel a training corpus actually runs —

      1. quality gate (textstats.quality_pass_expr: length window,
         stopword ceiling, type/token floor — per-doc codegen, no
         shuffle);
      2. exact-dedup survivorship (min doc_id per text md5 — one window
         on the uniform hash key; non-canonical copies drop);
      3. perplexity keep (CCNet head+middle; thresholds computed on the
         FULL corpus before any filtering — pinned contract, so the
         funnel's stages commute with threshold derivation and a resumed
         run sees identical cuts).

    Stage order is part of the contract but stages are independent
    predicates, so Catalyst is free to fuse the quality CASE and the
    dedup window into the surprisal join's shuffle boundaries. Output is
    the kept corpus manifest a packer/sampler consumes.
    """
    from hebrew_ner_spark.operators.textstats import quality_pass_expr

    toks = docs.withColumn("toks", F.split("text", " "))
    q = toks.where(quality_pass_expr("toks")).select("doc_id")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    survivors = (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("doc_id")
    )
    ppl = perplexity_buckets(docs).where(F.col("bucket") != "tail")
    return (
        ppl.join(q, "doc_id", "left_semi")
        .join(survivors, "doc_id", "left_semi")
        .select(
            "doc_id",
            "lang",
            F.col("mean_bits_1e6"),
            "bucket",
        )
    )


def data_card(docs: DataFrame) -> DataFrame:
    """(lang, bucket, n_docs, share_1e6): corpus composition report over
    the kept output of curation_pipeline — the 'data card' table a
    training run records next to its manifest. One map-side-combined
    aggregate over the funnel output plus a broadcast-folded total."""
    kept = curation_pipeline(docs)
    per = kept.groupBy("lang", "bucket").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    total = kept.agg(F.count("*").alias("_t"))
    return per.crossJoin(F.broadcast(total)).select(
        "lang",
        "bucket",
        "n_docs",
        F.expr(
            "CAST((2 * n_docs * 1000000 + _t) DIV (2 * _t) AS BIGINT)"
        ).alias("share_1e6"),
    )


# Mixture resampling: temperature exponent is fixed at alpha = 1/2
# (sqrt scaling, the mBERT/XLM-R family's low-resource-upweighting
# range) because 1/2 is the one exponent with an EXACT integer form —
# isqrt — so the sampled corpus is bit-reproducible across engines,
# partitionings and runs. MIX_M is the keep-hash modulus.
MIX_M = 1_048_576  # 2^20
MIX_WSCALE = 1_000_000  # weight = isqrt(n_docs * MIX_WSCALE)


def _isqrt_col(x: F.Column) -> F.Column:
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    return (
        F.when((s + 1) * (s + 1) <= x, s + 1)
        .when(s * s > x, s - 1)
        .otherwise(s)
        .cast("long")
    )


def mixture_shares(docs: DataFrame, target: int, strat_col: str = "lang") -> DataFrame:
    """(lang, n_docs, weight, natural_share_1e6, target_share_1e6,
    keep_threshold): the temperature-resampled mixture plan table.

    weight_g = isqrt(n_g * MIX_WSCALE)  (i.e. sqrt(n_g), integer-scaled);
    target share is weight_g / sum(weights); keep_threshold is the
    per-stratum cutoff ``floor(target * MIX_M * w_g / (W * n_g))`` capped
    at MIX_M, so keeping documents with hash % MIX_M < threshold yields
    an expected ``target``-document corpus at the temperature shares —
    upweighting low-resource strata, downsampling the head.

    Scale shape: ONE map-side-combined count per stratum (strata are a
    closed small set — languages, sources), a broadcast-folded total, and
    pure integer arithmetic on the ≤|strata|-row table. int64 bounds:
    target * MIX_M * weight must stay < 2^63 — holds through n_g ~ 10^9
    per stratum at gate targets; at the 10^12-doc corpus swap these four
    columns to DECIMAL(38,0) (both engines' decimal arithmetic is exact;
    the table is tiny so decimal cost is irrelevant).
    """
    per = docs.groupBy(F.col(strat_col).alias("lang")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    per = per.withColumn("weight", _isqrt_col(F.col("n_docs") * MIX_WSCALE))
    tot = per.agg(
        F.sum("n_docs").alias("_n"), F.sum("weight").alias("_w")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "weight",
        F.expr("CAST((2 * n_docs * 1000000 + _n) DIV (2 * _n) AS BIGINT)").alias(
            "natural_share_1e6"
        ),
        F.expr("CAST((2 * weight * 1000000 + _w) DIV (2 * _w) AS BIGINT)").alias(
            "target_share_1e6"
        ),
        F.expr(
            f"CAST(least(CAST({MIX_M} AS BIGINT), "
            f"(CAST({int(target)} AS BIGINT) * {MIX_M} * weight) DIV (_w * n_docs)) "
            "AS BIGINT)"
        ).alias("keep_threshold"),
    )


def mixture_sample(docs: DataFrame, target: int, strat_col: str = "lang") -> DataFrame:
    """(doc_id, lang): the temperature-resampled corpus — documents whose
    portable keep-hash falls under their stratum's threshold. The join
    against the ≤|strata|-row share table is broadcast (map-side), the
    keep test is one codegen'd comparison, and the decision is a pure
    function of (doc_id, stratum counts) — reproducible across runs and
    engines, no RNG state, no shuffle beyond the stratum count agg."""
    shares = mixture_shares(docs, target, strat_col)
    keep_hash = phash_col(
        F.concat(F.lit("mix|"), F.col("doc_id").cast("string")), 0
    ) % MIX_M
    return (
        docs.select("doc_id", F.col(strat_col).alias("lang"), keep_hash.alias("_h"))
        .join(F.broadcast(shares.select("lang", "keep_threshold")), "lang")
        .where(F.col("_h") < F.col("keep_threshold"))
        .select("doc_id", "lang")
    )


PASSAGE_LEN = 10  # tokens per non-overlapping passage window


def passage_dedup(docs: DataFrame, p: int = PASSAGE_LEN) -> DataFrame:
    """(doc_id, n_passages, n_dup_passages, dup_frac_1e6): exact
    duplicated-passage signal — the scalable stand-in for
    suffix-array exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): tile each document
    into consecutive NON-overlapping ``p``-token passages and mark a
    passage duplicated when its corpus-wide occurrence count exceeds 1
    (within-doc repeats count — verbatim self-repetition is the same
    removal target). Complements cur_boilerplate (cross-doc *presence*
    of short grams) with occurrence-grain long-window evidence, at 1/p
    the gram volume of a sliding window.

    Scale shape: only (doc_id, passage_hash) int64 pairs ever shuffle —
    never text. One map-side-combined count at passage-hash grain, one
    hash-keyed equi-join back to occurrence grain (a viral passage is a
    hot join key — AQE skew-join splits it), one doc-keyed aggregate.
    The doc left join keeps short documents (< p tokens) as zero rows.
    """
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    occ = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""
                CASE WHEN size(toks) < {p} THEN array()
                     ELSE transform(sequence(0, size(toks) DIV {p} - 1),
                                    i -> concat_ws(' ', slice(toks, i * {p} + 1, {p})))
                END
                """
            )
        ).alias("passage"),
    ).select("doc_id", phash_col(F.col("passage"), 1).alias("ph"))
    tot = occ.groupBy("ph").agg(F.count("*").alias("tot"))
    per_doc = (
        occ.join(tot, "ph")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_passages"),
            F.sum(F.when(F.col("tot") > 1, 1).otherwise(0)).cast("long").alias(
                "n_dup_passages"
            ),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_passages", F.lit(0)).cast("long").alias("n_passages"),
            F.coalesce("n_dup_passages", F.lit(0)).cast("long").alias("n_dup_passages"),
            F.expr(
                "CASE WHEN coalesce(n_passages, 0) = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((2 * n_dup_passages * 1000000 + n_passages) "
                "DIV (2 * n_passages) AS BIGINT) END"
            ).alias("dup_frac_1e6"),
        )
    )


CDC_DIVISOR = 8  # expected content-defined chunk length in tokens
CDC_SEED = 5  # boundary-hash seed
CDC_CHUNK_SEED = 6  # chunk-identity hash seed


def cdc_bounds_expr(toks_col: str = "toks") -> str:
    """Spark SQL fragment: chunk-boundary index array [-1, cuts..., n-1].

    A boundary falls AFTER token i when the token's portable hash is
    0 mod CDC_DIVISOR — a pure function of token CONTENT, so inserting
    or deleting one token only perturbs the two chunks around the edit
    (the FastCDC property fixed windows lack; passage_dedup's tiling
    shifts every downstream window). Expected chunk length is
    CDC_DIVISOR tokens.
    """
    from hebrew_ner_spark.functions.hashing import phash_sql_expr

    h = phash_sql_expr("t", CDC_SEED)
    return f"""concat(array(CAST(-1 AS BIGINT)),
              filter(transform({toks_col},
                               (t, i) -> IF(pmod({h}, {CDC_DIVISOR}) = 0,
                                            CAST(i AS BIGINT),
                                            CAST(-1 AS BIGINT))),
                     x -> x >= 0),
              array(CAST(size({toks_col}) - 1 AS BIGINT)))"""


def cdc_chunks_expr(toks_col: str = "toks", bnd_col: str = "bnd") -> str:
    """Spark SQL fragment: chunk texts from a precomputed boundary array
    (materialize ``cdc_bounds_expr`` into ``bnd_col`` first — the
    boundary array is referenced four times here, and a named column
    guarantees it is computed once rather than leaning on codegen
    subexpression elimination). Everything is array-side: no shuffle
    until the chunk hashes aggregate.
    """
    return f"""
    filter(
      transform(
        sequence(1, size({bnd_col}) - 1),
        j -> CASE WHEN {bnd_col}[j] > {bnd_col}[j - 1]
                  THEN concat_ws(' ', slice({toks_col},
                                            CAST({bnd_col}[j - 1] + 2 AS INT),
                                            CAST({bnd_col}[j] - {bnd_col}[j - 1] AS INT)))
                  ELSE NULL END),
      x -> x IS NOT NULL)
    """


def cdc_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks, dup_frac_1e6): duplicated-chunk
    signal over content-defined chunks — the shift-RESISTANT sibling of
    passage_dedup: a one-token edit leaves every other chunk's identity
    intact, so near-verbatim quotes with small insertions still light
    up. Same scale shape: only (doc_id, hash) int64 pairs cross the
    wire, one hash-grain count, one hash-keyed join back, one doc-keyed
    aggregate.
    """
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).withColumn(
        "bnd", F.expr(cdc_bounds_expr("toks"))
    )
    occ = toks.select(
        "doc_id", F.explode(F.expr(cdc_chunks_expr("toks", "bnd"))).alias("chunk")
    ).select("doc_id", phash_col(F.col("chunk"), CDC_CHUNK_SEED).alias("ph"))
    tot = occ.groupBy("ph").agg(F.count("*").alias("tot"))
    per_doc = (
        occ.join(tot, "ph")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("tot") > 1, 1).otherwise(0)).cast("long").alias(
                "n_dup_chunks"
            ),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
            F.expr(
                "CASE WHEN coalesce(n_chunks, 0) = 0 THEN CAST(0 AS BIGINT) "
                "ELSE CAST((2 * n_dup_chunks * 1000000 + n_chunks) "
                "DIV (2 * n_chunks) AS BIGINT) END"
            ).alias("dup_frac_1e6"),
        )
    )


DUP_SPAN_L = 6  # minimum duplicated-substring length, in tokens


def _gram_positions(docs: DataFrame, L: int = DUP_SPAN_L) -> DataFrame:
    """(doc_id, pos, gram): every L-gram with its 0-based token position,
    on the codegen zip-slice fast path (dedup._shingle_rows' shape plus
    posexplode for the position)."""
    from hebrew_ner_spark.operators.kg import with_tokens

    toks = with_tokens(docs).select("doc_id", "toks")
    n = f"greatest(size(toks) - {L - 1}, 0)"
    zipped = toks.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(*[F.expr(f"slice(toks, {i + 1}, {n})") for i in range(L)])
        ).alias("pos", "g"),
    )
    return zipped.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.concat_ws(" ", *[f"g.{i}" for i in range(L)]).alias("gram"),
    )


def dup_spans(docs: DataFrame, L: int = DUP_SPAN_L) -> DataFrame:
    """(doc_id, span_start, span_end, span_len, n_grams): maximal token
    spans covered by corpus-duplicated L-grams — the exact-substring
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), in its gram-cover formulation: a maximal
    duplicated substring of length m >= L is covered by exactly its
    m - L + 1 duplicated grams, which are CONTIGUOUS positions, so
    merging flagged positions whose gap <= L - 1 (token-span overlap)
    recovers the substring spans without any suffix array. The spans are
    what a curation pass cuts out of the text (vs. dropping whole docs —
    the passage/CDC/LSH family's grain).

    Plan shape at 10^12 docs: one codegen gram scan; one gram-keyed
    map-side-combined count (> 1 filter makes the dup-gram table
    collision-sized, not corpus-sized); one gram-keyed join flags
    positions; one per-doc window builds the runs. The gram join's key
    distribution is the corpus's duplication profile — AQE skew split
    applies; a boilerplate mega-gram flags many positions but each doc
    contributes at most its own length.
    """
    gp = _gram_positions(docs, L)
    dup = gp.groupBy("gram").agg(F.count("*").alias("n")).where(F.col("n") > 1)
    flagged = gp.join(dup.select("gram"), "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = flagged.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) > L - 1, 1).otherwise(0),
    ).withColumn("grp", F.sum("brk").over(w))
    return (
        runs.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + L - 1).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_grams"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias("span_len"),
            "n_grams",
        )
    )


def dup_span_fraction(docs: DataFrame, L: int = DUP_SPAN_L) -> DataFrame:
    """(doc_id, n_toks, dup_tokens, dup_1e6): per-document fraction of
    tokens inside duplicated substrings — the keep/cut curation signal
    over ``dup_spans`` (merged spans are disjoint, so their lengths sum
    to the covered-token count). Docs with no duplicated span report 0."""
    spans = dup_spans(docs, L).groupBy("doc_id").agg(
        F.sum("span_len").cast("long").alias("dup_tokens")
    )
    sizes = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_toks")
    )
    return (
        sizes.join(spans, "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
        .withColumn(
            "dup_1e6",
            F.expr(
                "CAST((2 * dup_tokens * 1000000 + n_toks) DIV (2 * n_toks) AS BIGINT)"
            ),
        )
    )


CHUNK_W = 8  # tokens per retrieval chunk
CHUNK_S = 4  # stride (overlap = CHUNK_W - CHUNK_S)


def chunk_windows(docs: DataFrame, w: int = CHUNK_W, s: int = CHUNK_S) -> DataFrame:
    """(doc_id, chunk_id, start, n_tokens, chunk): overlapping retrieval
    chunks — the RAG/embedding prep counterpart of passage_dedup's
    non-overlapping tiles. Windows of ``w`` tokens every ``s`` tokens;
    the last window starts at the smallest multiple of ``s`` that still
    reaches the final token, so coverage is total and the tail chunk may
    be short (the standard keep-the-tail convention). A document of
    <= w tokens yields exactly one whole-document chunk.

    Scale shape: per-document array algebra in the codegen map stage —
    zero shuffles, like every extractor in the curation family. The
    chunk count per doc is ceil((n-w)/s)+1, emitted via one sequence +
    transform; chunk text is sliced, never re-scanned.
    """
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"""
                    transform(
                      sequence(0, CASE WHEN size(toks) <= {w} THEN 0
                                       ELSE (size(toks) - {w} + {s} - 1) DIV {s} END),
                      i -> struct(bigint(i * {s}) AS start,
                                  slice(toks, i * {s} + 1, {w}) AS ctoks))
                    """
                )
            ).alias("chunk_id", "c"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("c.start").alias("start"),
            F.expr("size(c.ctoks)").cast("long").alias("n_tokens"),
            F.expr("concat_ws(' ', c.ctoks)").alias("chunk"),
        )
    )


def triples_in_dup_spans(docs: DataFrame, L: int = DUP_SPAN_L) -> DataFrame:
    """(doc_id, word_index, subj, pred, obj, in_dup): each extracted
    triple occurrence flagged 1 when its full token window
    [word_index-1, word_index+1] lies inside a corpus-duplicated
    substring span — the curation x KG bridge: facts harvested from
    boilerplate/content-farm repeats should not count as independent
    evidence (the same reason fact fusion dedupes per host).

    Join shape: both sides are doc-keyed and per-doc bounded (spans are
    merged-disjoint, triples <= doc length), so the containment test is
    one doc_id equi-join plus a range predicate — never a band join.
    The max-flag groupBy restores occurrence grain (a triple sits in at
    most one merged span, but the aggregate makes that a non-assumption).
    """
    from hebrew_ner_spark.operators import kg

    tr = kg.doc_triples(docs)
    spans = dup_spans(docs, L).select(
        F.col("doc_id").alias("_sd"), "span_start", "span_end"
    )
    j = tr.join(
        spans,
        (tr["doc_id"] == spans["_sd"])
        & (F.col("span_start") <= F.col("word_index") - 1)
        & (F.col("word_index") + 1 <= F.col("span_end")),
        "left",
    )
    return (
        j.groupBy("doc_id", "word_index", "subj", "pred", "obj")
        .agg(
            F.max(
                F.when(F.col("_sd").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("in_dup")
        )
    )


def pred_dup_evidence(docs: DataFrame, L: int = DUP_SPAN_L) -> DataFrame:
    """(pred, n_occ, n_dup, dup_share_1e6): per-predicate share of triple
    evidence that comes out of duplicated substrings — the discount
    table a fact-fusion pass consults (a predicate whose evidence is
    mostly boilerplate deserves a lower prior)."""
    return (
        triples_in_dup_spans(docs, L)
        .groupBy("pred")
        .agg(
            F.count("*").cast("long").alias("n_occ"),
            F.sum("in_dup").cast("long").alias("n_dup"),
            F.expr(
                "CAST((2 * 1000000 * sum(in_dup) + count(*)) DIV (2 * count(*)) AS BIGINT)"
            ).alias("dup_share_1e6"),
        )
    )


def dedup_quality_priority(docs: DataFrame) -> DataFrame:
    """(component_id, keep_doc_id, keep_score_1e6, n_members) —
    canonical-copy selection by QUALITY score instead of raw length:
    among near-duplicate cluster members the highest quality_lr score
    survives (score desc, doc_id asc ties). Longest-copy selection
    (dedup_canonical) keeps boilerplate-padded mirrors; quality-priority
    keeps the cleanest rendering of the same content — the survivor rule
    modern curation stacks (RefinedWeb/FineWeb) actually use.

    Plan shape mirrors dedup_canonical: the component table joins the
    (doc_id, score) pair at doc grain — text never shuffles — and
    max(struct(score, -doc_id, doc_id)) is the map-side-combinable
    argmax, so no window sort over cluster members at all (an
    improvement over the row_number form: mega-clusters fold partially
    per partition).
    """
    from hebrew_ner_spark.operators import canonicalize, dedup
    from hebrew_ner_spark.operators.training import quality_lr_scores

    comp = canonicalize.dedup_components(dedup.near_dup_pairs_all(docs))
    scores = quality_lr_scores(docs).select("doc_id", "score_1e6")
    j = comp.join(scores, "doc_id")
    return (
        j.groupBy("component_id")
        .agg(
            F.max(
                F.struct(
                    F.col("score_1e6").alias("s"),
                    (-F.col("doc_id")).alias("negid"),
                    F.col("doc_id").alias("d"),
                )
            ).alias("_w"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select(
            "component_id",
            F.col("_w.d").alias("keep_doc_id"),
            F.col("_w.s").cast("long").alias("keep_score_1e6"),
            "n_members",
        )
    )


PARETO_BKT = 1000  # score-bucket width for the two-level prefix max


def pareto_frontier(scored: DataFrame) -> DataFrame:
    """(doc_id, score_1e6, n_tokens) — the Pareto skyline of the corpus
    under (maximize quality score, maximize length): documents no other
    document beats-or-ties on both axes with at least one strict win.
    The classic skyline operator (Borzsony/Kossmann/Stocker, ICDE'01),
    which curation uses to pick showcase/eval documents that trade
    quality against length without a hand-tuned scalarization.

    Scale shape — the naive skyline is an all-pairs anti-join; this is
    three bounded aggregates instead:

    1. collapse to score grain: ``max(n_tokens)`` per distinct
       ``score_1e6`` (map-side combinable; <= 1e6 rows by construction
       since scores are integer micro-units of a mean in [-0.5, 0.5)).
    2. strict-prefix max over descending score = the dominating length
       threshold H(score). Resolved two-level like token_budget_sample:
       an unkeyed window ONLY over the <= 1000-row bucket table, plus a
       keyed window within each bucket (partitions <= PARETO_BKT rows).
       No window ever sees document grain.
    3. a score-grain row survives iff smax > H(score) (strictly — an
       equal-length higher-score doc dominates); doc rows re-attach by
       broadcast equi-join on (score_1e6, n_tokens == smax). Ties on
       both axes all survive (neither dominates).
    """
    s = scored.select("doc_id", "score_1e6", "n_tokens")
    g = s.groupBy("score_1e6").agg(F.max("n_tokens").alias("smax"))
    g = g.withColumn("bkt", F.expr(f"(score_1e6 + 500000) DIV {PARETO_BKT}"))
    b = g.groupBy("bkt").agg(F.max("smax").alias("bmax"))
    w_b = (
        Window.orderBy(F.col("bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hb = b.select("bkt", F.max("bmax").over(w_b).alias("hb"))
    w_in = (
        Window.partitionBy("bkt")
        .orderBy(F.col("score_1e6").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = (
        g.withColumn("hw", F.max("smax").over(w_in))
        .join(F.broadcast(hb), "bkt")
        .where(
            F.col("smax")
            > F.greatest(
                F.coalesce(F.col("hb"), F.lit(-1)),
                F.coalesce(F.col("hw"), F.lit(-1)),
            )
        )
        .select("score_1e6", F.col("smax").alias("n_tokens"))
    )
    return s.join(F.broadcast(sky), ["score_1e6", "n_tokens"]).select(
        "doc_id", "score_1e6", "n_tokens"
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling")
# ---------------------------------------------------------------------------
#
# Select web documents that LOOK like a small high-quality target domain
# by importance weight under hashed n-gram bag-of-words models:
#   log w(x) = sum_f count_f(x) * (log p_f - log q_f)
# with p the target-slice feature distribution and q the raw-corpus one,
# both add-one smoothed over B hashed buckets. The log is the repo's
# exact-integer bit-length gap (textstats.unigram_surprisal idiom), so
# every weight is a deterministic integer the DuckDB oracle replays.
#
# Scale shape (the reason DSIR is THE importance-sampling method that
# survives 10^12 docs): both distributions live in ONE B-row LUT —
# B = 256 here, 10^4-10^5 in production, either way broadcastable —
# so scoring the whole corpus is explode -> hash -> one (doc_id, f)
# aggregate -> broadcast-join the LUT -> one doc-grain aggregate.
# No shuffle ever carries more than the tokenized corpus itself, and
# the quantile threshold is the sort-free histogram percentile
# (operators/quantiles.py), not a global sort.

DSIR_B = 256          # hashed feature buckets (production: 10^4-10^5)
DSIR_SEED = 421
DSIR_TARGET_SRC = ("src0", "src1", "src2", "src3")  # target-domain slice
DSIR_KEEP_Q = 75      # resample the top quartile by mean importance


def _dsir_features(docs: DataFrame) -> DataFrame:
    """(doc_id, f, c) — hashed unigram+bigram bucket counts per doc.
    Bigrams are space-joined so they can never collide with a unigram
    string before hashing."""
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(F.col("toks"), _grams("toks", 2))
        ).alias("gram"),
    )
    return (
        grams.select(
            "doc_id",
            (phash_col(F.col("gram"), DSIR_SEED) % DSIR_B).alias("f"),
        )
        .groupBy("doc_id", "f")
        .agg(F.count("*").alias("c"))
    )


def _dsir_scores_from(feats: DataFrame, docs: DataFrame) -> DataFrame:
    """LUT from an (optionally persisted) shared feature table — so the
    weights path tokenizes the corpus ONCE, not once per distribution."""
    feats = feats.join(docs.select("doc_id", "source"), "doc_id")
    lut = feats.groupBy("f").agg(
        (F.lit(1) + F.coalesce(
            F.sum(F.when(F.col("source").isin(*DSIR_TARGET_SRC), F.col("c"))),
            F.lit(0),
        )).cast("long").alias("tp"),
        (F.lit(1) + F.sum("c")).cast("long").alias("tq"),
    )
    tot = lut.agg(
        F.sum("tp").cast("long").alias("_tp"),
        F.sum("tq").cast("long").alias("_tq"),
    )
    bl = lambda c: F.length(F.bin(c))  # noqa: E731
    return (
        lut.crossJoin(F.broadcast(tot))
        .select(
            "f", "tp", "tq",
            (
                (bl(F.col("tp")) - bl(F.col("_tp")))
                - (bl(F.col("tq")) - bl(F.col("_tq")))
            ).cast("long").alias("score_bits"),
        )
    )


def dsir_scores(docs: DataFrame) -> DataFrame:
    """(f, tp, tq, score_bits) — the B-row importance LUT:
    tp = 1 + target-slice count of bucket f, tq = 1 + corpus count
    (add-one smoothing keeps every bucket finite in both models);
    score_bits = (bitlen(tp) - bitlen(Tp)) - (bitlen(tq) - bitlen(Tq)),
    the integer log2(p_f / q_f) up to the idiom's +-1 bit."""
    return _dsir_scores_from(_dsir_features(docs), docs)


def dsir_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, n_feats, weight_bits, mean_wbits_1e6) — per-doc DSIR
    importance: weight_bits = sum_f c_f * score_bits(f); the mean is
    half-up integer micro-bits per feature occurrence, the
    length-debiased measure the sampler thresholds on."""
    from hebrew_ner_spark.operators.graphstats import _evict, _persist

    _evict("dsir")
    feats = _persist("dsir", _dsir_features(docs))
    scores = _dsir_scores_from(feats, docs).select("f", "score_bits")
    return (
        feats.join(F.broadcast(scores), "f")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("score_bits")).cast("long")
            .alias("weight_bits"),
        )
        .select(
            "doc_id", "n_feats", "weight_bits",
            F.expr(
                "CAST((2 * weight_bits * 1000000"
                " + CASE WHEN weight_bits >= 0 THEN n_feats ELSE -n_feats END)"
                " DIV (2 * n_feats) AS BIGINT)"
            ).alias("mean_wbits_1e6"),
        )
    )


def dsir_sample(docs: DataFrame) -> DataFrame:
    """(doc_id, mean_wbits_1e6, keep) — keep every doc whose mean
    importance clears the exact corpus-wide percentile_disc(KEEP_Q)
    threshold (ties INCLUDED — deterministic, so the kept share can
    exceed 25% exactly when weights tie at the boundary)."""
    from hebrew_ner_spark.operators.quantiles import exact_quantiles

    w = dsir_weights(docs).withColumn("_all", F.lit("all"))
    th = (
        exact_quantiles(w, "_all", F.col("mean_wbits_1e6"), [DSIR_KEEP_Q])
        .select(F.col("v").alias("_th"))
    )
    return w.crossJoin(F.broadcast(th)).select(
        "doc_id", "mean_wbits_1e6",
        (F.col("mean_wbits_1e6") >= F.col("_th")).cast("long").alias("keep"),
    )
