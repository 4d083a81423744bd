"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The training-data curation core. Design points that matter at 100 TB:

* **Exact dedup** groups by a content hash — the shuffle key is the 32-char
  md5, uniformly distributed, so no skew regardless of how many copies of
  one page exist; the heavy `text` column never shuffles (column pruning:
  only the hash + doc_id move).
* **MinHash/LSH** materializes a (doc, seed, minhash) signature table whose
  size is H rows/doc independent of document length; candidate generation
  is a self-equi-join on (band, band_key) — banding bounds the join
  fan-out, and identical-band mega-clusters are exactly the AQE skew-join
  case (enabled in session.py).
* **Verification** computes exact k-gram Jaccard only for LSH candidates —
  the quadratic step never touches non-candidate pairs.
* **SimHash** is computed array-side per document with higher-order
  functions (zero Python, zero shuffle); near-pair blocking splits the
  60-bit key into 4 x 15-bit bands (Hamming distance <= 3 guarantees a
  shared band; we verify with bit_count(xor)).

All hashes are the portable 60-bit md5 prefix (functions/hashing.py), so
the DuckDB oracles reproduce every signature bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import (
    MINHASH_P,
    minhash_coeffs,
    phash_sql_expr,
    shingles_col,
)
from hebrew_ner_spark.operators.kg import with_tokens

SHINGLE_K = 3          # word k-grams for MinHash / Jaccard
NUM_HASHES = 16        # MinHash signature length
LSH_BANDS = 4          # 4 bands x 4 rows
SIMHASH_BITS = 60
SIMHASH_BANDS = 4      # 4 x 15-bit blocks
HAMMING_MAX = 3        # verified Hamming radius
MAX_BUCKET = 4096      # pairwise-explosion ceiling per band bucket


def doc_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Long distinct (doc_id, shingle) table (Jaccard verification input,
    where per-doc distinctness IS the semantics)."""
    return (
        with_tokens(docs)
        .withColumn("sh", shingles_col("toks", k))
        .select("doc_id", F.explode("sh").alias("shingle"))
    )


def _shingle_rows(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """NON-distinct (doc_id, shingle) rows on the whole-stage-codegen fast
    path: k shifted slices of the token array zipped and exploded, then one
    concat — no higher-order functions anywhere. transform/array_distinct
    (shingles_col) are codegen-fallback, interpreted per element; on a
    1.28M-doc corpus this zip shape measured 1.9x faster end-to-end and
    lifted the 2->8-core scaling efficiency of the signature pass from
    ~0.55 to ~0.88 (interpreted eval's allocation churn was the
    scaling killer, not the shuffle). Duplicate shingles are fine for
    every min-aggregation consumer: a duplicate cannot change a minimum,
    so signatures and band keys are bit-identical to the distinct form.
    """
    toks = with_tokens(docs).select("doc_id", "toks")
    n_grams = f"greatest(size(toks) - {k - 1}, 0)"
    zipped = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                *[F.expr(f"slice(toks, {i + 1}, {n_grams})") for i in range(k)]
            )
        ).alias("g"),
    )
    return zipped.select(
        "doc_id", F.concat_ws(" ", *[f"g.{i}" for i in range(k)]).alias("shingle")
    )


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(text_md5, n_docs, canonical_doc_id) for texts appearing > once.

    The canonical representative is the minimum doc_id — deterministic, so
    a rerun (resume) picks identical survivors.
    """
    return (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def _minhash_wide(sh: DataFrame, num_hashes: int) -> DataFrame:
    """(doc_id, h0..hH-1): one md5 per shingle + H universal-hash
    derivations (a_s * base + b_s mod 2^31-1, exact in int64) — the
    classic one-strong-hash MinHash family. All H mins still come out of
    ONE aggregation pass with map-side partials; md5 runs once per
    shingle instead of H times (the measured hot spot of the dedup
    chain)."""
    base = sh.withColumn(
        "b31", F.expr(f"{phash_sql_expr('shingle', 0)} % {MINHASH_P}")
    )
    aggs = [
        F.min(F.expr(f"({a}L * b31 + {b}L) % {MINHASH_P}")).alias(f"h{s}")
        for s, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return base.groupBy("doc_id").agg(*aggs)


def minhash_signatures(docs: DataFrame, num_hashes: int = NUM_HASHES, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, seed, minhash): H-row signature per document.

    One shuffle (groupBy doc_id) with H min-aggregates computed in a single
    pass; map-side partial aggregation keeps reducer input at H values per
    doc per partition. Documents with < k tokens have no shingles and are
    excluded (nothing to sign).
    """
    wide = _minhash_wide(_shingle_rows(docs, k), num_hashes)
    stack_args = ", ".join(f"{s}, h{s}" for s in range(num_hashes))
    return wide.select(
        "doc_id",
        F.expr(f"stack({num_hashes}, {stack_args}) AS (seed, minhash)"),
    ).select("doc_id", F.col("seed").cast("long").alias("seed"), "minhash")


def band_keys_from_shingles(
    sh: DataFrame, bands: int = LSH_BANDS, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """(doc_id, band, band_key) from ANY (doc_id, shingle) table — md5 of
    each band's minhash sub-signature. ``doc_id`` may be any groupable
    type (the fuzzy entity-linking tier keys by surface string). One
    aggregation pass; the signature never exceeds num_hashes values/key."""
    rows = num_hashes // bands
    wide = _minhash_wide(sh, num_hashes)
    band_cols = [
        F.md5(F.concat_ws("_", *[F.col(f"h{b * rows + r}") for r in range(rows)])).alias(f"b{b}")
        for b in range(bands)
    ]
    wide = wide.select("doc_id", *band_cols)
    stack_args = ", ".join(f"{b}, b{b}" for b in range(bands))
    return wide.select(
        "doc_id",
        F.expr(f"stack({bands}, {stack_args}) AS (band, band_key)"),
    ).select("doc_id", F.col("band").cast("long").alias("band"), "band_key")


def _band_keys(docs: DataFrame, bands: int = LSH_BANDS, num_hashes: int = NUM_HASHES, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, band, band_key) over word-shingled documents (codegen
    zip-shingle fast path; min-aggregation makes distinctness irrelevant)."""
    return band_keys_from_shingles(_shingle_rows(docs, k), bands, num_hashes)


def _bucket_pairs(
    keyed: DataFrame, bucket_cols: list[str], cap: int = MAX_BUCKET
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs of doc_ids sharing a bucket.

    One aggregation per bucket + an array-side pair explosion, instead of
    a self-join that evaluates the (expensive) signature plan twice.
    Bucket member lists are sorted so pairs come out ordered.

    Buckets larger than ``cap`` are EXCLUDED from pair generation: a
    duplicate cluster of 10^6 boilerplate pages would otherwise build a
    10^12-entry pair array inside one row. The member array itself is
    linear (8 bytes/doc — 8 MB at 10^6, fine in an agg buffer); it is the
    quadratic explosion that must not happen. Dropped buckets are not
    silent: ``_bucket_overflow`` (same grouping, count-only) reports
    them, and identical-band giants route through exact-hash grouping
    (``giant_bucket_groups``) — docs agreeing on a whole signature band
    are near-identical, so exact grouping is the *better* plan for them.
    """
    grouped = (
        keyed.groupBy(*bucket_cols)
        .agg(F.expr("array_sort(collect_set(doc_id))").alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= cap))
    )
    return (
        grouped.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(sequence(0, size(ids) - 2), i ->
                      transform(sequence(i + 1, size(ids) - 1), j ->
                        named_struct('doc_a', ids[i], 'doc_b', ids[j]))))
                    """
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def _bucket_overflow(
    keyed: DataFrame, bucket_cols: list[str], cap: int = MAX_BUCKET
) -> DataFrame:
    """(bucket cols..., n_docs) for buckets the pair generator skipped.

    Count-only aggregation — no member array at all — so the report is
    cheap even for a 10^8-doc mega cluster.
    """
    return (
        keyed.groupBy(*bucket_cols)
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") > cap)
    )


def lsh_candidate_pairs(
    docs: DataFrame, cap: int = MAX_BUCKET, keyed: DataFrame | None = None
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one LSH band bucket.

    Bucket sizes follow the corpus duplicate-cluster distribution — AQE
    splits oversized shuffle partitions at runtime; buckets beyond ``cap``
    are excluded here and surfaced by ``lsh_overflow`` / routed through
    ``giant_bucket_groups``. Pass a precomputed ``keyed`` band-key table
    (``_band_keys``) to share one signature pass across the
    pairs/overflow/routing trio — the signature chain is the dominant
    dedup cost.
    """
    keyed = _band_keys(docs) if keyed is None else keyed
    return _bucket_pairs(keyed, ["band", "band_key"], cap)


def lsh_overflow(
    docs: DataFrame, cap: int = MAX_BUCKET, keyed: DataFrame | None = None
) -> DataFrame:
    """(band, band_key, n_docs) for LSH buckets above the pairwise cap."""
    keyed = _band_keys(docs) if keyed is None else keyed
    return _bucket_overflow(keyed, ["band", "band_key"], cap)


def giant_bucket_groups(
    docs: DataFrame, cap: int = MAX_BUCKET, keyed: DataFrame | None = None
) -> DataFrame:
    """Exact-hash routing for mega buckets: documents whose LSH band
    bucket exceeds ``cap`` are grouped by full text hash instead of being
    paired quadratically — (band, band_key, text_md5, n_docs,
    canonical_doc_id). A bucket that large is a boilerplate cluster;
    identical-text grouping recovers its duplicate structure in O(n).
    The band-key join is an equi-join; the giant-bucket side is tiny (one
    row per overflowing bucket) and broadcast."""
    keyed = _band_keys(docs) if keyed is None else keyed
    giants = _bucket_overflow(keyed, ["band", "band_key"], cap).select(
        "band", "band_key"
    )
    members = keyed.join(F.broadcast(giants), ["band", "band_key"])
    return (
        members.join(docs.select("doc_id", F.md5("text").alias("text_md5")), "doc_id")
        .groupBy("band", "band_key", "text_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def near_dup_jaccard(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = SHINGLE_K,
    cap: int = MAX_BUCKET,
    keyed: DataFrame | None = None,
) -> DataFrame:
    """LSH candidates verified with exact shingle Jaccard >= threshold.

    (doc_a, doc_b, jaccard_1e6). The exact intersection join touches only
    candidate pairs; |intersection| comes from one join + count, |union|
    from per-doc shingle counts (|A| + |B| - |A∩B|). Pairs inside over-cap
    mega buckets are NOT generated here — consumers that must not lose
    giant clusters (duplicate-component building) use
    ``near_dup_pairs_all``, which unions the exact-hash hub pairs for
    them.
    """
    pairs = lsh_candidate_pairs(docs, cap, keyed)
    return _verify_jaccard_pairs(pairs, docs, threshold, k)


def _verify_jaccard_pairs(
    pairs: DataFrame, docs: DataFrame, threshold: float, k: int
) -> DataFrame:
    """Exact shingle-Jaccard verification of an arbitrary (doc_a, doc_b)
    candidate table — the quadratic step always bounded to its input."""
    sh = doc_shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    # |A ∩ B| per candidate pair: attach A's shingles, semi-match B's.
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle"))
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            # exact integer round-half-up: (2a*1e6 + b) DIV 2b — avoids
            # DECIMAL-vs-DOUBLE quantization differences across engines
            "jaccard_1e6",
            F.expr("CAST((2 * (n_inter) * 1000000 + (n_a + n_b - n_inter)) DIV (2 * (n_a + n_b - n_inter)) AS BIGINT)"),
        )
        .where(F.col("jaccard_1e6") >= int(threshold * 1_000_000))
        .select("doc_a", "doc_b", "jaccard_1e6")
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over token occurrences.

    Computed entirely array-side: hash each token, accumulate a 60-wide
    +/-1 counter vector with aggregate+zip_with, re-pack sign bits. One
    narrow codegen stage, no shuffle, no Python.
    """
    tok_hash = phash_sql_expr("t", 0)
    expr = f"""
      aggregate(
        zip_with(
          aggregate(
            transform(toks, t -> {tok_hash}),
            array_repeat(0L, {bits}),
            (acc, h) -> zip_with(acc, sequence(0, {bits - 1}),
                                 (c, j) -> c + CASE WHEN (shiftright(h, CAST(j AS INT)) & 1) = 1
                                                    THEN 1 ELSE -1 END)),
          sequence(0, {bits - 1}),
          (c, j) -> CASE WHEN c > 0 THEN shiftleft(1L, CAST(j AS INT)) ELSE 0L END),
        0L, (a, x) -> a + x)
    """
    return with_tokens(docs).select("doc_id", F.expr(expr).alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = HAMMING_MAX, cap: int = MAX_BUCKET
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within Hamming radius via band blocking.

    60 bits split into 4 x 15-bit blocks: any pair with distance <= 3 shares
    at least one identical block (pigeonhole), so blocking loses nothing.
    Blocks beyond ``cap`` members are excluded from the pair explosion
    (same mega-cluster guard as the LSH path) and reported by
    ``simhash_overflow``. Delegates to ``hamming_near_pairs_from_sigs`` —
    the signature-agnostic form shared with image aHash.
    """
    return hamming_near_pairs_from_sigs(
        simhash(docs).select("doc_id", "simhash"), "simhash", max_hamming, cap
    )


def _simhash_blocks(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash, band, bval): the 4 x 15-bit block keys — ONE
    definition shared by the pair generator and the overflow counter, so
    the two can never count different buckets."""
    return (
        simhash(docs)
        .select(
            "doc_id",
            "simhash",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {SIMHASH_BANDS - 1}), "
                    f"b -> named_struct('band', CAST(b AS BIGINT), "
                    f"'bval', shiftright(simhash, CAST(b * 15 AS INT)) & 32767))"
                )
            ).alias("bk"),
        )
        .select(
            "doc_id",
            "simhash",
            F.col("bk.band").alias("band"),
            F.col("bk.bval").alias("bval"),
        )
    )


def simhash_overflow(docs: DataFrame, cap: int = MAX_BUCKET) -> DataFrame:
    """(band, bval, n_docs) for SimHash blocks above the pairwise cap."""
    return _bucket_overflow(_simhash_blocks(docs), ["band", "bval"], cap)


def near_dup_pairs_all(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = SHINGLE_K,
    cap: int = MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b) near-duplicate pairs with giant clusters connected
    in O(n), not lost: Jaccard-verified pairs from capped buckets UNION
    hub-and-spoke edges for over-cap buckets — each member is paired with
    its bucket's minimum doc_id and the pair is Jaccard-verified exactly
    like any other candidate. A 10^6-copy boilerplate cluster contributes
    10^6 - 1 verified hub edges instead of 10^12 pairwise edges, and
    near-identical (not byte-identical) giants connect too, because hub
    verification uses the same shingle Jaccard, not a text-hash equality.
    Known bound: members similar to each other but dissimilar to the hub
    doc fail hub verification and stay separate (the full pairwise answer
    inside a giant bucket is exactly the quadratic blow-up this path
    exists to avoid). This is the input the dedup-components stage
    consumes; the overflow counter still reports every capped bucket.
    """
    keyed = _band_keys(docs, k=k)
    verified = near_dup_jaccard(docs, threshold, k, cap, keyed).select(
        "doc_a", "doc_b"
    )
    # one members pass: rows of over-cap buckets only
    members = keyed.join(
        F.broadcast(
            _bucket_overflow(keyed, ["band", "band_key"], cap).select(
                "band", "band_key"
            )
        ),
        ["band", "band_key"],
    ).select("band", "band_key", "doc_id")
    hubs = members.groupBy("band", "band_key").agg(
        F.min("doc_id").alias("doc_a")
    )
    hub_cands = (
        members.join(hubs, ["band", "band_key"])
        .where(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    hub_verified = _verify_jaccard_pairs(hub_cands, docs, threshold, k).select(
        "doc_a", "doc_b"
    )
    return verified.unionByName(hub_verified).distinct()


def lsh_probe_delta(
    base_docs: DataFrame, delta_docs: DataFrame, cap: int = MAX_BUCKET
) -> DataFrame:
    """(doc_a, doc_b): near-dup candidate pairs involving at least one
    DELTA document — incremental dedup-index maintenance, the only shape
    that survives a 10^12-doc corpus ingesting daily crawls. The base
    corpus's band-key table is the stored index (in production an
    Iceberg table carried across crawls — here recomputed because the
    sandbox has no persisted index, but the base side is touched ONLY
    by that one signature read, never re-banded per pair); the delta
    signs only its own documents, then

    * cross pairs: delta band keys equi-join the base index on
      (band, band_key) — shuffle bounded by delta size plus matching
      index rows;
    * intra pairs: the normal capped array-side pair generation among
      the delta itself.

    Contract (gated): probe(base, delta) == full-corpus
    lsh_candidate_pairs(base UNION delta) restricted to pairs with a
    delta member, whenever no combined bucket exceeds ``cap`` (the gate
    asserts that loudly, as cc_dedup_components does). Base-index
    buckets above ``cap`` are excluded from the cross join the same way
    _bucket_pairs excludes them (mega-buckets route through exact-hash
    grouping upstream).
    """
    base_keys = _band_keys(base_docs)
    delta_keys = _band_keys(delta_docs)
    # exclude over-cap index buckets from the probe fan-out
    ok_buckets = (
        base_keys.groupBy("band", "band_key")
        .agg(F.count_distinct("doc_id").alias("_n"))
        .where(F.col("_n") <= cap)
        .select("band", "band_key")
    )
    cross = (
        delta_keys.select("band", "band_key", F.col("doc_id").alias("_d"))
        .join(ok_buckets, ["band", "band_key"], "left_semi")
        .join(
            base_keys.select("band", "band_key", F.col("doc_id").alias("_b")),
            ["band", "band_key"],
        )
        .where(F.col("_d") != F.col("_b"))
        .select(
            F.least("_d", "_b").alias("doc_a"),
            F.greatest("_d", "_b").alias("doc_b"),
        )
        .distinct()
    )
    intra = _bucket_pairs(delta_keys, ["band", "band_key"], cap)
    return cross.unionByName(intra).distinct()


def hamming_near_pairs_from_sigs(
    sigs: DataFrame,
    sig_col: str = "simhash",
    max_hamming: int = HAMMING_MAX,
    cap: int = MAX_BUCKET,
) -> DataFrame:
    """(doc_a, doc_b, hamming): band-blocked Hamming pairs over ANY
    60-bit signature table (doc_id, ``sig_col``) — the SimHash blocking
    generalized so other 60-bit perceptual signatures (image aHash,
    multimodal.image_ahash; SRP role signatures) reuse the identical
    lossless pigeonhole plan: 4 x 15-bit blocks, any pair within radius
    3 shares a block; over-``cap`` blocks are excluded from the pair
    explosion (the mega-cluster guard), and the signature rides the
    grouped array so Hamming verifies without a re-join.
    """
    blocks = (
        sigs.select("doc_id", F.col(sig_col).alias("_sig"))
        .select(
            "doc_id",
            "_sig",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {SIMHASH_BANDS - 1}), "
                    f"b -> named_struct('band', CAST(b AS BIGINT), "
                    f"'bval', shiftright(_sig, CAST(b * 15 AS INT)) & 32767))"
                )
            ).alias("bk"),
        )
        .select("doc_id", "_sig", F.col("bk.band").alias("band"), F.col("bk.bval").alias("bval"))
    )
    grouped = (
        blocks.groupBy("band", "bval")
        .agg(F.expr("array_sort(collect_set(struct(doc_id, _sig)))").alias("ms"))
        .where((F.size("ms") > 1) & (F.size("ms") <= cap))
    )
    return (
        grouped.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(sequence(0, size(ms) - 2), i ->
                      transform(sequence(i + 1, size(ms) - 1), j ->
                        named_struct(
                          'doc_a', ms[i].doc_id,
                          'doc_b', ms[j].doc_id,
                          'hamming', CAST(bit_count(ms[i]._sig ^ ms[j]._sig) AS BIGINT)))))
                    """
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def lsh_bucket_histogram(docs: DataFrame) -> DataFrame:
    """(bucket, n_buckets, pair_mass) — the LSH band-bucket size
    distribution in log2 buckets (bucket = bitlen(size)), with the
    CANDIDATE-PAIR MASS sum(n*(n-1)/2) each size class would generate.

    The pre-flight observability read for the dedup path: pair
    explosion is quadratic in bucket size, so the pair-mass column —
    not the bucket count — says where the cost lives and whether the
    MAX_BUCKET cap will engage (any bucket with bitlen > 12 overflows
    at the 4096 cap). One (band, key) count + one 64-row-bounded
    aggregate; the histogram is what a scheduler inspects BEFORE
    deciding to run the pair join at all — the same metadata-first
    discipline as maint_manifest_prune.
    """
    sizes = _band_keys(docs).groupBy("band", "band_key").agg(
        F.count("*").alias("n")
    )
    bucket = F.when(F.col("n") <= 0, F.lit(0)).otherwise(
        F.length(F.expr("bin(n)"))
    )
    return (
        sizes.select(
            bucket.cast("long").alias("bucket"),
            F.col("n"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum(F.expr("n * (n - 1) DIV 2")).cast("long").alias("pair_mass"),
        )
    )
