"""Training-data curation: leakage-free splits, contamination audit,
KG negative sampling.

The reference emits labeled spans; the 100 TB use-case for that output
is *training data* — and the three operators every training pipeline
needs on day one are (a) a deterministic, growth-stable train/val/test
split, (b) an audit that near-duplicate documents do not straddle the
split boundary (eval contamination — the well-documented failure mode of
web-scale corpora), and (c) negative samples for embedding/link-predictor
training over the materialized graph.

All three are pure joins/aggs over the portable 60-bit md5 hash
(functions/hashing.py), so DuckDB oracles reproduce every row exactly:

* ``doc_splits`` — bucket = phash('split|' || doc_id) % 100; the split is
  a pure function of the document identity, so it never moves when the
  corpus grows (row_number would reshuffle everyone), survives
  repartitioning, and needs no state. 80/10/10.
* ``split_contamination`` — near-dup pairs (the existing LSH + exact
  Jaccard chain) joined to both endpoints' splits; pairs with
  ``split_a != split_b`` are leaks. Scale shape: the pair table is tiny
  next to the corpus; two shuffle joins on doc id, AQE-broadcast when
  small.
* ``negative_samples`` — for each distinct edge and i < NEG_K, corrupt
  the object to the entity at dense rank
  ``phash(subj|pred|obj|i) % V`` (shifted by one when it collides with
  the true object — guaranteed ``neg != obj`` for V > 1). Dense ranks
  come from a two-level rank (bucketed window + cumulative offsets, the
  ``build_vocab`` discipline) so a 10^8-node graph never funnels through
  one window task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark.storagelevel import StorageLevel

from hebrew_ner_spark.functions.hashing import phash_col
from hebrew_ner_spark.operators import dedup

NEG_K = 3

# previous invocation's persisted rank table (see negative_samples) —
# the one-table-per-session eviction discipline (alphabet_encode._LAST_TOKS)
_LAST_RANKS = None
TRAIN_PCT = 80  # bucket < 80 -> train
VAL_PCT = 10  # bucket < 90 -> val; else test
RANK_BUCKET = 64  # ids per rank bucket (two-level dense rank)


def doc_splits(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, split): hash-stable 80/10/10 assignment."""
    bucket = (
        phash_col(F.concat(F.lit("split|"), F.col("doc_id").cast("string")), 0) % 100
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


def split_contamination(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, split_a, split_b, jaccard_1e6): near-duplicate
    pairs whose endpoints fall in different splits — each row is an
    eval-set leak. Empty output is the healthy state."""
    pairs = dedup.near_dup_jaccard(docs)
    s = doc_splits(docs).select("doc_id", "split")
    return (
        pairs.join(
            s.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            s.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
        .where(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard_1e6")
    )


DECON_K = 8  # decontamination n-gram width (GPT-3 used 13; corpus docs
# here average ~50 tokens, so 8 keeps the gate non-vacuous while the
# mechanism is width-agnostic)


def decontaminate_ngrams(docs: DataFrame, k: int = DECON_K) -> DataFrame:
    """(doc_id, n_shared_grams): train-split documents sharing >= 1 exact
    word k-gram with any test-split document — the GPT-3-style exact
    decontamination pass that complements split_contamination's
    near-dup audit (a doc can quote an eval item verbatim without being
    a near-dup of it).

    Scale shape: the eval split is the SMALL side by construction (10%
    of buckets, and real eval sets are thousands of docs, not billions)
    — its distinct k-grams broadcast, so the train side never shuffles:
    one narrow scan + broadcast join + partial-agg groupBy(doc_id).
    """
    from pyspark.sql import functions as F

    from hebrew_ner_spark.functions.hashing import shingles_col

    split = doc_splits(docs).select("doc_id", "split")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toks.select(
        "doc_id", F.explode(shingles_col("toks", k)).alias("gram")
    )
    test_grams = (
        grams.join(split.where("split = 'test'"), "doc_id", "left_semi")
        .select("gram")
        .distinct()
    )
    train_grams = grams.join(split.where("split = 'train'"), "doc_id", "left_semi")
    return (
        train_grams.join(F.broadcast(test_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )


def dense_entity_ranks(edges: DataFrame) -> DataFrame:
    """(entity_id, r): dense 0-based rank of every node of the edge
    table, ordered by entity_id. Two-level: row_number within a
    DIV-bucket (monotone in id, so bucket-major order == id order) plus
    broadcast cumulative offsets; the only unpartitioned window runs
    over the bucket-count table (V / RANK_BUCKET rows)."""
    nodes = (
        edges.select(F.col("subj_id").alias("entity_id"))
        .unionByName(edges.select(F.col("obj_id").alias("entity_id")))
        .distinct()
        .withColumn("bkt", F.expr(f"entity_id DIV {RANK_BUCKET}"))
    )
    local = nodes.withColumn(
        "local_rank",
        F.row_number().over(Window.partitionBy("bkt").orderBy("entity_id")),
    )
    offsets = (
        nodes.groupBy("bkt")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "off")
    )
    return local.join(F.broadcast(offsets), "bkt").select(
        "entity_id", (F.col("off") + F.col("local_rank") - 1).cast("long").alias("r")
    )


def negative_samples(edges: DataFrame, k: int = NEG_K) -> DataFrame:
    """(subj_id, pred, obj_id, neg_i, neg_obj_id): k deterministic
    corrupted objects per distinct edge, never equal to the true object.

    Plan: rank the node set once; join the true object's rank in, explode
    the k sample indices, map each hashed rank back to an entity through
    a second join keyed on rank. Both joins are node-table-sized on one
    side — AQE broadcasts them while the graph is small and degrades to
    shuffle joins at web scale. The rank table is referenced three times
    (obj-rank join, count, neg-rank join), so it is persisted with the
    one-table-per-session eviction discipline — otherwise the two-window
    rank subplan executes three times per invocation.
    """
    global _LAST_RANKS
    if _LAST_RANKS is not None:
        try:
            _LAST_RANKS.unpersist()
        except Exception:
            pass  # previous SparkSession already stopped; cache died with it
    ranks = dense_entity_ranks(edges).persist(StorageLevel.MEMORY_AND_DISK_DESER)
    _LAST_RANKS = ranks
    v = ranks.agg(F.count("*").alias("_v"))
    e = (
        edges.select("subj_id", "pred", "obj_id")
        .join(ranks.select(F.col("entity_id").alias("obj_id"), F.col("r").alias("_r_obj")), "obj_id")
        .crossJoin(F.broadcast(v))
        .select(
            "subj_id",
            "pred",
            "obj_id",
            "_r_obj",
            "_v",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_i"),
        )
    )
    raw = phash_col(
        F.concat_ws(
            "|",
            F.col("subj_id").cast("string"),
            F.col("pred"),
            F.col("obj_id").cast("string"),
            F.col("neg_i").cast("string"),
        ),
        0,
    ) % F.col("_v")
    neg_rank = F.when(raw == F.col("_r_obj"), (raw + 1) % F.col("_v")).otherwise(raw)
    return (
        e.withColumn("_nr", neg_rank)
        .join(ranks.select(F.col("r").alias("_nr"), F.col("entity_id").alias("neg_obj_id")), "_nr")
        .select("subj_id", "pred", "obj_id", F.col("neg_i").cast("long").alias("neg_i"), "neg_obj_id")
    )


# --- sequence packing (concat-and-chunk) ------------------------------------

PACK_SEED = 11       # deterministic pack order, independent of SAMPLE_SEED
PACK_BUCKETS = 256   # offset fan-out: per-(lang,bucket) windows, never
                     # one window task per stratum


def pack_sequences(docs: DataFrame, seq_len: int) -> DataFrame:
    """Concat-and-chunk sequence packing: lay every language's documents
    end-to-end in a deterministic order and cut the token stream into
    fixed ``seq_len`` chunks — the standard pretraining batch layout
    (documents cross chunk boundaries; nothing is padded or dropped
    except the final partial chunk's tail remains partial).

    Output: one row per (document x chunk) piece —
      (lang, chunk_id, doc_id, piece_start, piece_len, chunk_pos)
    where piece_start indexes into the document's tokens, chunk_pos into
    the chunk. Invariants (pytest-pinned): pieces of a doc are contiguous
    and sum to its token count; every chunk except each lang's last holds
    exactly seq_len tokens; the layout is partition-invariant and stable
    under corpus growth within a bucket-prefix (same two-level discipline
    as token_budget_sample).

    Scale shape: a doc's global token offset = its lang-bucket's prefix
    sum (a broadcast table of <= PACK_BUCKETS rows per lang) + a window
    cumsum WITHIN its (lang, bucket) partition — PACK_BUCKETS-way
    parallel, so no stratum ever funnels through one window task. The
    chunk fan-out is an explode of at most ceil(n_toks/seq_len)+1 rows
    per doc — linear, no join.
    """
    d = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        phash_col(
            F.concat(F.lit("PCK|"), F.col("doc_id").cast("string")), PACK_SEED
        ).alias("h"),
    ).withColumn("bucket", F.col("h") % PACK_BUCKETS)

    # bucket-grain prefix sums: tiny table, broadcast back
    bt = d.groupBy("lang", "bucket").agg(F.sum("n_toks").alias("btoks"))
    wb = Window.partitionBy("lang").orderBy("bucket")
    bt = bt.select(
        "lang",
        "bucket",
        (F.sum("btoks").over(wb) - F.col("btoks")).alias("bprev"),
    )

    # doc-grain offsets inside each (lang, bucket) — parallel windows
    wd = Window.partitionBy("lang", "bucket").orderBy("h", "doc_id")
    offs = (
        d.join(F.broadcast(bt), ["lang", "bucket"])
        .withColumn(
            "off", F.col("bprev") + F.sum("n_toks").over(wd) - F.col("n_toks")
        )
        .where(F.col("n_toks") > 0)
    )

    # integer DIV, not `/`: float division is exact only below 2^53 and
    # this offset is a corpus-wide token count
    L = F.lit(seq_len)
    first_c = F.expr(f"off DIV {seq_len}")
    last_c = F.expr(f"(off + n_toks - 1) DIV {seq_len}")
    pieces = offs.select(
        "lang",
        "doc_id",
        "off",
        "n_toks",
        F.explode(F.sequence(first_c, last_c)).alias("chunk_id"),
    )
    c_lo = F.col("chunk_id") * L
    c_hi = c_lo + L
    lo = F.greatest(F.col("off"), c_lo)
    hi = F.least(F.col("off") + F.col("n_toks"), c_hi)
    return pieces.select(
        "lang",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "doc_id",
        (lo - F.col("off")).cast("long").alias("piece_start"),
        (hi - lo).cast("long").alias("piece_len"),
        (lo - c_lo).cast("long").alias("chunk_pos"),
    )


def decontaminate_ngrams_bloom(docs: DataFrame, k: int = DECON_K) -> DataFrame:
    """decontaminate_ngrams for eval-gram sets too big to broadcast
    whole: the train side is first pruned MAP-SIDE by the eval grams'
    Bloom bitset (operators/bloomfilter.py — O(m) bits regardless of
    eval cardinality, no probe shuffle), then the exact gram equi-join
    verifies only the pruned superset, so the keyed shuffle carries
    ~(true matches + false positives) instead of every train gram.

    Gated contract: output == decontaminate_ngrams exactly — Bloom
    pruning has no false negatives and the verify join removes the
    false positives.
    """
    from pyspark.sql import functions as F

    from hebrew_ner_spark.functions.hashing import shingles_col
    from hebrew_ner_spark.operators.bloomfilter import bloom_bits, bloom_prune

    split = doc_splits(docs).select("doc_id", "split")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    grams = toks.select(
        "doc_id", F.explode(shingles_col("toks", k)).alias("gram")
    )
    test_grams = (
        grams.join(split.where("split = 'test'"), "doc_id", "left_semi")
        .select("gram")
        .distinct()
    )
    train_grams = grams.join(split.where("split = 'train'"), "doc_id", "left_semi")
    pruned = bloom_prune(train_grams, "gram", bloom_bits(test_grams, "gram"))
    return (
        pruned.join(test_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )


EVAL_QUOTA = 40  # docs per (split, lang) stratum in eval_sample


def eval_sample(docs: DataFrame, quota: int = EVAL_QUOTA) -> DataFrame:
    """(doc_id, lang, split, pick_rank): exact-quota stratified eval set —
    the first ``quota`` documents per (split, lang) stratum in portable-
    hash order. The companion to ``doc_splits``: splits give *membership*,
    this cuts a fixed-size, reproducible evaluation subset per stratum
    (human-eval batches, per-language leaderboards) that never moves when
    unrelated documents are added, because the order key is a pure
    function of document identity (reference's fixed dev/test files,
    utils/data.py CoNLL splits, generalized to per-stratum quotas).

    Scale shape: rank <= k over a window is exactly the pattern Spark's
    WindowGroupLimit rewrites into a per-partition partial top-k BEFORE
    the shuffle (the kg_entity_summary plan) — each map task forwards at
    most ``quota`` rows per stratum it sees, so the exchange carries
    O(strata x quota x tasks) rows, never the corpus. No global sort,
    no driver state.
    """
    # split is a pure function of doc_id — recompute it inline rather
    # than joining doc_splits back (which would shuffle the corpus on
    # doc_id just to attach a derivable column)
    bucket = (
        phash_col(F.concat(F.lit("split|"), F.col("doc_id").cast("string")), 0) % 100
    )
    ranked = docs.select(
        "doc_id",
        "lang",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
        phash_col(F.concat(F.lit("esample|"), F.col("doc_id").cast("string")), 0).alias(
            "ord"
        ),
    )
    w = Window.partitionBy("split", "lang").orderBy("ord", "doc_id")
    return (
        ranked.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= quota)
        .select("doc_id", "lang", "split", "pick_rank")
    )


def training_manifest(docs: DataFrame, mixture_target: int) -> DataFrame:
    """(doc_id, lang, n_toks, split, quality_pass, in_mixture,
    eval_rank): the per-document TRAINING MANIFEST — the one table a
    run records to answer "why is/isn't this document in my batch?".
    Composes the independent per-doc decisions side by side (each is a
    pure function of document identity + corpus statistics, so the
    manifest is reproducible row-for-row):

    * split           — hash-stable 80/10/10 (doc_splits)
    * quality_pass    — the curation threshold predicate
    * in_mixture      — temperature-resampled keep (mixture_sample)
    * eval_rank       — pick_rank if inside the stratified eval quota,
                        else NULL

    Scale shape: three broadcast joins (mixture shares table, eval picks
    — both tiny by construction) onto one narrow doc scan; the only wide
    work is what the composed operators already pay. Deliberately NOT a
    filter: downstream stages filter the manifest, the manifest itself
    records every document's disposition (the data-card discipline).
    """
    from hebrew_ner_spark.operators import curation
    from hebrew_ner_spark.operators.textstats import quality_pass_expr

    bucket = (
        phash_col(F.concat(F.lit("split|"), F.col("doc_id").cast("string")), 0) % 100
    )
    base = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        F.split("text", " ").alias("toks"),
        # split is derivable from doc_id — inline, never a corpus join
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    ).withColumn("quality_pass", quality_pass_expr("toks").cast("long"))
    mix = curation.mixture_sample(docs, mixture_target).select(
        "doc_id", F.lit(1).cast("long").alias("in_mixture")
    )
    ev = eval_sample(docs).select("doc_id", F.col("pick_rank").alias("eval_rank"))
    return (
        base.join(mix, "doc_id", "left")
        .join(ev, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_toks",
            "split",
            "quality_pass",
            F.coalesce("in_mixture", F.lit(0)).cast("long").alias("in_mixture"),
            "eval_rank",
        )
    )


FEATURE_BUCKETS = 64


def feature_hash(docs: DataFrame, n_buckets: int = FEATURE_BUCKETS) -> DataFrame:
    """(doc_id, bucket, cnt): the hashing-trick document vectorizer
    (Weinberger et al. 2009) — token counts folded into a fixed bucket
    space by the portable 60-bit hash, the vocabulary-free feature prep
    a trillion-token corpus needs (no global vocab build, no OOV, fixed
    width).

    Plan: posexplode -> in-row hash -> one map-side-combined aggregate
    at (doc, bucket) grain. The hash is the shared phash, so the DuckDB
    oracle folds identically; bucket = phash % n_buckets on NON-NEGATIVE
    hashes (60-bit, sign never enters)."""
    from hebrew_ner_spark.functions.hashing import phash_sql_expr

    h = phash_sql_expr("token", 0)
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .select("doc_id", F.expr(f"CAST({h} % {n_buckets} AS BIGINT)").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle (per-epoch corpus permutation)
# ---------------------------------------------------------------------------

SHUFFLE_SEED = 977
SHUFFLE_BUCKETS = 1 << 10  # top 10 hash bits; scale ~ corpus/1e6 in prod


def global_shuffle(
    docs: DataFrame,
    epoch: int = 0,
    n_shards: int = 8,
    n_buckets: int = SHUFFLE_BUCKETS,
) -> DataFrame:
    """(doc_id, pos, shard) — a deterministic pseudo-random PERMUTATION
    of the whole corpus for training epoch ``epoch``, without a global
    sort.

    Every LM training run shuffles its corpus once per epoch; at 10^12
    documents a ``orderBy(rand())`` is a full-corpus total sort through
    one range partitioner and is neither resumable nor reproducible.
    Here the shuffle key is the portable 60-bit hash of
    (epoch, doc_id) — a different permutation every epoch, identical on
    every rerun/resume — and the global position comes from the
    package's two-level rank: bucket = top hash bits (so bucket-major
    order IS key order), row_number within each bucket, plus broadcast
    cumulative bucket offsets. The only unpartitioned window runs over
    the ``n_buckets``-row count table; everything else is map-side.
    ``shard = pos % n_shards`` deals positions round-robin so shards are
    balanced to within one row with no total-count action. Ties are
    impossible: (hash, doc_id) ordering makes collisions harmless.
    """
    key = phash_col(
        F.concat(
            F.lit(f"shuf|{epoch}|"), F.col("doc_id").cast("string")
        ),
        SHUFFLE_SEED,
    )
    shift = 60 - int(n_buckets).bit_length() + 1  # top log2(n_buckets) bits
    keyed = docs.select(
        "doc_id", key.alias("k")
    ).withColumn("bkt", F.shiftright(F.col("k"), shift))
    local = keyed.withColumn(
        "local_rank",
        F.row_number().over(Window.partitionBy("bkt").orderBy("k", "doc_id")),
    )
    offsets = (
        keyed.groupBy("bkt")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "off")
    )
    return local.join(F.broadcast(offsets), "bkt").select(
        "doc_id",
        (F.col("off") + F.col("local_rank") - 1).cast("long").alias("pos"),
        ((F.col("off") + F.col("local_rank") - 1) % n_shards)
        .cast("long")
        .alias("shard"),
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear quality scorer (fastText-style filter inference)
# ---------------------------------------------------------------------------

LR_SEED = 41
LR_THRESHOLD_1E6 = 0  # keep iff mean feature weight > 0


def lr_weights_expr(bucket_col: str) -> "F.Column":
    """Integer micro-unit weight of a feature bucket: a deterministic
    seeded projection of the bucket id into [-500000, 500000) — the
    stand-in for trained classifier weights (no training labels exist
    in the sandbox; the INFERENCE plan is the deliverable). Pure
    codegen, replayable in DuckDB."""
    from hebrew_ner_spark.functions.hashing import phash_sql_expr

    h = phash_sql_expr(f"CAST({bucket_col} AS STRING)", LR_SEED)
    return F.expr(f"CAST({h} % 1000000 - 500000 AS BIGINT)")


def quality_lr_scores(docs: DataFrame, n_buckets: int = FEATURE_BUCKETS) -> DataFrame:
    """(doc_id, n_tokens, score_1e6, keep) — the linear text-quality
    classifier every big-corpus curation stack runs (CCNet's fastText
    LM filter, Gopher/RefinedWeb quality models), as pure Spark
    inference: score = (sum over tokens of w[h(token) % B]) / n_tokens
    in exact half-up micro-units.

    The weight table is a FUNCTION of the bucket id (seeded projection),
    not a lookup: the model applies map-side with zero joins and zero
    broadcast state — at 10^12 documents the scorer is one posexplode +
    one doc-keyed map-side-combinable aggregate, the same shape as
    feature_hash. A real trained model swaps lr_weights_expr for a
    broadcast of its B weights (B is fixed and small by construction —
    the entire point of the hashing trick). ``keep`` is BIGINT 0/1 on
    the integer threshold, so the filter composes with the curation
    pipeline's other exact predicates.
    """
    from hebrew_ner_spark.functions.hashing import phash_sql_expr

    h = phash_sql_expr("token", 0)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    w = lr_weights_expr(f"CAST({h} % {n_buckets} AS BIGINT)")
    scored = (
        toks.select("doc_id", w.alias("_w"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("_w").cast("long").alias("_sw"),
        )
    )
    # half-up integer mean (matches the house rounding idiom for
    # possibly-negative numerators: floor((2a + b) / (2b)) is half-up
    # for both signs when b > 0)
    return scored.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "CAST(FLOOR((2 * _sw + n_tokens) / (2 * n_tokens)) AS BIGINT)"
        ).alias("score_1e6"),
        F.when(
            F.expr("FLOOR((2 * _sw + n_tokens) / (2 * n_tokens))")
            > F.lit(LR_THRESHOLD_1E6),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# Curriculum ordering (difficulty-bucket-major, shuffled within bucket)
# ---------------------------------------------------------------------------


def curriculum_order(docs: DataFrame, epoch: int = 0) -> DataFrame:
    """(doc_id, diff_bucket, pos) — the curriculum permutation: documents
    ordered by a difficulty bucket (log2 token-count — short-first, the
    standard length curriculum), pseudo-randomly shuffled WITHIN each
    bucket by the epoch-keyed hash.

    Same two-level-rank engine shape as global_shuffle — the composite
    sort key (diff_bucket, hash, doc_id) maps to a composite rank bucket
    (diff_bucket * 2^10 + top hash bits), which is monotone in the sort
    key by construction, so bucket-major concatenation IS the curriculum
    order and the only unpartitioned window sees the bucket-count table.
    Deterministic, rerun-identical, fresh within-bucket order per epoch.
    """
    k = phash_col(
        F.concat(F.lit(f"curr|{epoch}|"), F.col("doc_id").cast("string")),
        SHUFFLE_SEED,
    )
    n_tok = F.size(F.split("text", " "))
    diff = F.when(n_tok <= 0, F.lit(0)).otherwise(
        F.length(F.expr("bin(size(split(text, ' ')))"))
    ).cast("long")
    keyed = docs.select(
        "doc_id", diff.alias("diff_bucket"), k.alias("k")
    ).withColumn(
        "bkt", F.col("diff_bucket") * 1024 + F.shiftright(F.col("k"), 50)
    )
    local = keyed.withColumn(
        "local_rank",
        F.row_number().over(Window.partitionBy("bkt").orderBy("k", "doc_id")),
    )
    offsets = (
        keyed.groupBy("bkt")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "off")
    )
    return local.join(F.broadcast(offsets), "bkt").select(
        "doc_id",
        "diff_bucket",
        (F.col("off") + F.col("local_rank") - 1).cast("long").alias("pos"),
    )


WSAMPLE_QUOTA = 50
WSAMPLE_SEED = 11


def weighted_sample(docs: DataFrame, quota: int = WSAMPLE_QUOTA) -> DataFrame:
    """(doc_id, lang, n_tokens, priority, pick_rank) — deterministic
    length-weighted sample: ``quota`` docs per language, preferring long
    documents, without ever being a fixed top-k by length (which would
    pick the same giant pages every run and starve the middle mass).

    Priority-order sampling (Duffield-Lund-Thorup '07): priority =
    u / w with u uniform; take the k smallest. Here u is the portable
    60-bit hash of the doc id (a pure function of identity — membership
    is stable under corpus growth, the eval_sample property) and the
    division is integer (u DIV w): w <= ~1e4 tokens against a 2^60
    numerator leaves ~46 bits of priority resolution, and the
    quantization is identical on both engines — which float u/w would
    not be. Inclusion odds scale ~linearly with w.

    Scale shape: rank <= k over (lang) windows = WindowGroupLimit
    partial top-k before the exchange (the eval_sample plan); the
    shuffle carries O(strata x quota x tasks) rows, never the corpus.
    """
    u = phash_col(
        F.concat(F.lit("wsmp|"), F.col("doc_id").cast("string")), WSAMPLE_SEED
    )
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        u.alias("_u"),
    ).withColumn(
        "priority",
        F.expr("_u DIV greatest(n_tokens, 1L)").cast("long"),
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        scored.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= quota)
        .select("doc_id", "lang", "n_tokens", "priority", "pick_rank")
    )
