"""Entity linking: tiered alias-dictionary resolution of mention surfaces.

Reference pattern J7 (utils/functions.py:167-195): the embedding-matrix
build joins vocab against pretrained vectors with *tiered* fallbacks —
exact match, then lowercase match, then random init. Our linking stage
follows exactly that shape against a canonical-entity dimension:

  tier 1: surface == canonical_name           (exact)
  tier 2: surface == lower(canonical_name)    (case-normalized)
  tier 3: head-token linking — the mention's first token resolved through
          tiers 1-2
  tier 4: MinHash-LSH fuzzy match (``fuzzy_link_minhash``) — character
          2-gram MinHash band keys of the remaining unresolved surfaces
          equi-joined against the alias dictionary's band keys, then
          exact char-shingle Jaccard verification of candidates only.
          This is the typo/variant-robust tier a web corpus needs
          ("data_base", "tabel"); it reuses the dedup module's portable
          signature machinery, so the DuckDB oracle reproduces every
          band key bit-for-bit.

Two production entry points: ``link_mentions`` runs the exact tiers 1-3
only (deterministic broadcast joins, no signature pass — the default for
the KG chain, where surfaces come out of the tokenizer and exact tiers
resolve them); ``link_mentions_full`` chains tier 4 onto the tier-0
remainder (gated end-to-end as ``link_full_tiered``) — the resolver to
run over raw web text where typos and variant spellings are expected.

Tiers 1-3 are **broadcast** joins (the dimension is tiny vs the mention
table — at 10^12 docs the alias dictionary still fits in tens of MB).
Tier 4 hashes each DISTINCT unresolved surface once (the shuffle is
bounded by surface cardinality, not mention count), keeps the dictionary
side broadcast, and the quadratic Jaccard step touches only LSH
candidates — the same scale discipline as near_dup_jaccard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hebrew_ner_spark.operators import dedup, kg
from hebrew_ner_spark.resources import ENTITY_TERMS

FUZZY_K = 2           # character shingle width
FUZZY_HASHES = 8      # MinHash signature length for short strings
FUZZY_BANDS = 4       # 4 bands x 2 rows
FUZZY_THRESHOLD_1E6 = 250_000  # exact char-Jaccard acceptance floor


def entity_dim(spark: SparkSession) -> DataFrame:
    """Canonical entity dimension: (entity_id, canonical_name).

    ids follow alphabetical order (deterministic, resume-stable); the
    first half keep their lowercase surface as canonical, the second half
    are capitalized — so tier 1 and tier 2 both have real work to do.
    """
    terms = sorted(ENTITY_TERMS)
    half = len(terms) // 2
    rows = [
        (i + 1, t if i < half else t.capitalize())
        for i, t in enumerate(terms)
    ]
    return spark.createDataFrame(rows, "entity_id long, canonical_name string")


def link_mentions(mentions: DataFrame, dim: DataFrame) -> DataFrame:
    """(doc_id, lo, hi, surface, entity_id, tier) — tiered resolution.

    ``mentions`` needs (doc_id, lo, hi, surface). Unresolved mentions keep
    entity_id NULL with tier 0 (the reference's random-init tier becomes
    an explicit unlinked marker — at KG scale you want them countable).
    """
    d1 = F.broadcast(dim.select(F.col("canonical_name").alias("_n1"), F.col("entity_id").alias("_e1")))
    d2 = F.broadcast(
        dim.select(F.lower("canonical_name").alias("_n2"), F.col("entity_id").alias("_e2"))
    )
    head = F.element_at(F.split(F.col("surface"), " "), 1)
    out = (
        mentions.join(d1, F.col("surface") == F.col("_n1"), "left")
        .join(d2, F.col("surface") == F.col("_n2"), "left")
        .join(
            F.broadcast(dim.select(F.lower("canonical_name").alias("_n3"), F.col("entity_id").alias("_e3"))),
            head == F.col("_n3"),
            "left",
        )
    )
    return out.select(
        "doc_id",
        "lo",
        "hi",
        "surface",
        F.coalesce("_e1", "_e2", "_e3").alias("entity_id"),
        F.when(F.col("_e1").isNotNull(), 1)
        .when(F.col("_e2").isNotNull(), 2)
        .when(F.col("_e3").isNotNull(), 3)
        .otherwise(0)
        .cast("long")
        .alias("tier"),
    )


def linked_mentions(docs: DataFrame) -> DataFrame:
    """Full chain: mention spans -> tiered linking."""
    spans = kg.mention_spans(docs).select("doc_id", "lo", "hi", "surface")
    return link_mentions(spans, entity_dim(docs.sparkSession))


def _char_shingles(col: str, k: int = FUZZY_K) -> Column:
    """Distinct character k-grams of a string column; strings shorter
    than k contribute themselves as the single shingle."""
    return F.expr(
        f"""
        CASE WHEN length({col}) < {k} THEN array({col})
             ELSE array_distinct(transform(sequence(1, length({col}) - {k} + 1),
                  i -> substring({col}, i, {k}))) END
        """
    )


def fuzzy_link_minhash(
    mentions: DataFrame,
    dim: DataFrame,
    threshold_1e6: int = FUZZY_THRESHOLD_1E6,
) -> DataFrame:
    """Tier 4: (doc_id, lo, hi, surface, entity_id, jaccard_1e6).

    MinHash-LSH candidate generation between mention surfaces and alias
    dictionary names over lowercased character 2-grams, then EXACT
    char-shingle Jaccard on candidates only; best match per surface
    (jaccard DESC, entity_id ASC), NULL when nothing clears the floor.

    Plan shape for 10^12 mentions: surfaces are hashed DISTINCT (one
    signature per unique string, however often it repeats), the
    dictionary band-key table is broadcast, candidate verification joins
    shingles only for LSH collisions, and the final window partitions by
    surface (bounded fan-in: one row per candidate entity).
    """
    surf = (
        mentions.select("surface")
        .distinct()
        .select("surface", F.lower("surface").alias("lc"))
    )
    ssh = surf.select("surface", F.explode(_char_shingles("lc")).alias("shingle"))
    dsh = dim.select(
        "entity_id", F.lower("canonical_name").alias("lc")
    ).select("entity_id", F.explode(_char_shingles("lc")).alias("shingle"))

    sbands = dedup.band_keys_from_shingles(
        ssh.select(F.col("surface").alias("doc_id"), "shingle"),
        FUZZY_BANDS,
        FUZZY_HASHES,
    ).select(F.col("doc_id").alias("surface"), "band", "band_key")
    dbands = dedup.band_keys_from_shingles(
        dsh.select(F.col("entity_id").alias("doc_id"), "shingle"),
        FUZZY_BANDS,
        FUZZY_HASHES,
    ).select(F.col("doc_id").alias("entity_id"), "band", "band_key")

    cand = (
        sbands.join(F.broadcast(dbands), ["band", "band_key"])
        .select("surface", "entity_id")
        .distinct()
    )
    sn = ssh.groupBy("surface").agg(F.count("*").alias("s_n"))
    dn = dsh.groupBy("entity_id").agg(F.count("*").alias("d_n"))
    inter = (
        cand.join(ssh, "surface")
        .join(dsh, ["entity_id", "shingle"])
        .groupBy("surface", "entity_id")
        .agg(F.count("*").alias("n_i"))
    )
    scored = (
        inter.join(sn, "surface")
        .join(F.broadcast(dn), "entity_id")
        .withColumn(
            # exact integer round-half-up, same form as near_dup_jaccard
            "jaccard_1e6",
            F.expr(
                "CAST((2 * n_i * 1000000 + (s_n + d_n - n_i)) DIV (2 * (s_n + d_n - n_i)) AS BIGINT)"
            ),
        )
        .where(F.col("jaccard_1e6") >= threshold_1e6)
    )
    w = Window.partitionBy("surface").orderBy(
        F.desc("jaccard_1e6"), F.asc("entity_id")
    )
    best = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("surface", F.col("entity_id").cast("long").alias("entity_id"), "jaccard_1e6")
    )
    return mentions.join(best, "surface", "left").select(
        "doc_id", "lo", "hi", "surface", "entity_id", "jaccard_1e6"
    )


def link_mentions_full(
    mentions: DataFrame,
    dim: DataFrame,
    threshold_1e6: int = FUZZY_THRESHOLD_1E6,
) -> DataFrame:
    """All four tiers: (doc_id, lo, hi, surface, entity_id, tier).

    Tiers 1-3 resolve via broadcast exact/lower/head joins; ONLY the
    tier-0 remainder pays the tier-4 signature pass (hashing is per
    DISTINCT unresolved surface, so a corpus where exact tiers resolve
    ~everything pays ~nothing for fuzzy). Rows fuzzy rejects keep
    tier 0 / NULL entity_id — still countable, never silently dropped.
    The two branches re-read the tier 1-3 join output; that subplan is
    three broadcast joins over one mention scan, cheap to evaluate twice
    relative to a persist of the full mention table.
    """
    base = link_mentions(mentions, dim)
    misses = base.where(F.col("tier") == 0).select("doc_id", "lo", "hi", "surface")
    fz = fuzzy_link_minhash(misses, dim, threshold_1e6)
    return (
        base.where(F.col("tier") > 0)
        .select("doc_id", "lo", "hi", "surface", "entity_id", "tier")
        .unionByName(
            fz.select(
                "doc_id",
                "lo",
                "hi",
                "surface",
                F.col("entity_id").cast("long").alias("entity_id"),
                F.when(F.col("entity_id").isNotNull(), 4)
                .otherwise(0)
                .cast("long")
                .alias("tier"),
            )
        )
    )


def kg_nodes(docs: DataFrame) -> DataFrame:
    """Materialized node table: (entity_id, canonical_name, n_mentions,
    n_docs) — SURVEY.md §7 stage 9; two global aggregates, the mention
    count salted-safe (counts are algebraic)."""
    linked = linked_mentions(docs).where(F.col("entity_id").isNotNull())
    dim = entity_dim(docs.sparkSession)
    agg = linked.groupBy("entity_id").agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return agg.join(F.broadcast(dim), "entity_id").select(
        "entity_id", "canonical_name", "n_mentions", "n_docs"
    )


def kg_edges(docs: DataFrame) -> DataFrame:
    """Materialized edge table: (subj_id, pred, obj_id, n_evidence).

    Triples' subject/object surfaces resolve through the same tiered
    dictionary (single-token surfaces -> tiers 1-2 suffice); the final
    count is the two-phase-friendly aggregate.
    """
    spark = docs.sparkSession
    dim = entity_dim(spark)
    lower_dim = F.broadcast(
        dim.select(F.lower("canonical_name").alias("_name"), "entity_id")
    )
    triples = kg.doc_triples(docs)
    s = lower_dim.select(F.col("_name").alias("subj"), F.col("entity_id").alias("subj_id"))
    o = lower_dim.select(F.col("_name").alias("obj"), F.col("entity_id").alias("obj_id"))
    return (
        triples.join(F.broadcast(s), "subj")
        .join(F.broadcast(o), "obj")
        .groupBy("subj_id", "pred", "obj_id")
        .agg(F.count("*").alias("n_evidence"))
    )


def merge_edge_counts(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental KG maintenance: fold a delta corpus's edge counts into
    an existing materialized edge table WITHOUT rescanning the base
    corpus — the crawl-refresh shape at 10^12 docs, where the base graph
    is petabytes and the daily delta is not.

    (subj_id, pred, obj_id, n_evidence, is_new): evidence counts sum;
    ``is_new`` = 1 marks edges absent from the base (the upsert's insert
    half). One full-outer join on the edge key — with both sides bucketed
    by (subj_id, pred, obj_id) (the Iceberg bucket-transform contract the
    sinks already follow) this is a co-located merge with no wide
    shuffle; it is the dataframe form of Iceberg ``MERGE INTO``.
    """
    keys = ["subj_id", "pred", "obj_id"]
    b = base.withColumnRenamed("n_evidence", "_nb")
    d = delta.withColumnRenamed("n_evidence", "_nd")
    return b.join(d, keys, "full_outer").select(
        *keys,
        (F.coalesce("_nb", F.lit(0)) + F.coalesce("_nd", F.lit(0)))
        .cast("long")
        .alias("n_evidence"),
        F.when(F.col("_nb").isNull(), 1).otherwise(0).cast("long").alias("is_new"),
    )


def graph_diff(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """(subj_id, pred, obj_id, n_old, n_new, status): edge-grain diff
    between two graph snapshots — the KG analog of crawl_deltas, feeding
    re-review queues ('removed' facts whose pages vanished) and freshness
    metrics. status in {added, removed, changed}; unchanged edges are
    filtered out so the diff is delta-sized.

    Same plan as merge_edge_counts: ONE full-outer join on the edge key —
    co-located (no wide shuffle) when both snapshots follow the Iceberg
    bucket-transform layout the sinks already use.
    """
    keys = ["subj_id", "pred", "obj_id"]
    o = edges_old.select(*keys, F.col("n_evidence").alias("_no"))
    n = edges_new.select(*keys, F.col("n_evidence").alias("_nn"))
    j = o.join(n, keys, "full_outer").select(
        *keys,
        F.coalesce("_no", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("_nn", F.lit(0)).cast("long").alias("n_new"),
        F.when(F.col("_no").isNull(), F.lit("added"))
        .when(F.col("_nn").isNull(), F.lit("removed"))
        .when(F.col("_no") != F.col("_nn"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("status"),
    )
    return j.where(F.col("status") != "same")


EDIT_MAX_DIST = 1


def fuzzy_link_edit(
    mentions: DataFrame, dim: DataFrame, max_dist: int = EDIT_MAX_DIST
) -> DataFrame:
    """Tier 5: (doc_id, lo, hi, surface, entity_id, dist) — edit-distance
    linking for single-character typos (dropped/substituted letters),
    the classic complement to the MinHash tier: char-2-gram Jaccard is
    weak exactly where edit distance is strong (short strings, where one
    dropped character destroys most shingles).

    Plan: DISTINCT unresolved surfaces (shuffle bounded by surface
    vocabulary, never mention count) broadcast-join the dimension under
    a length-band block (|len(s) - len(name)| <= max_dist), then exact
    ``levenshtein`` (JVM built-in; DuckDB has the identical classic
    definition) filters to <= max_dist and the best match per surface is
    (dist ASC, entity_id ASC). Unmatched surfaces keep NULL/0 — the
    countable-unlinked convention. The dimension is broadcast-sized by
    the module contract, so the candidate step never shuffles the
    corpus."""
    surf = mentions.select("surface").distinct()
    names = F.broadcast(
        dim.select(
            F.col("entity_id").alias("_ee"),
            F.lower("canonical_name").alias("_nm"),
        )
    )
    cand = surf.join(
        names,
        F.abs(F.length("surface") - F.length("_nm")) <= max_dist,
    ).select(
        "surface",
        "_ee",
        F.levenshtein(F.lower("surface"), F.col("_nm")).alias("dist"),
    ).where(F.col("dist") <= max_dist)
    w = Window.partitionBy("surface").orderBy(F.asc("dist"), F.asc("_ee"))
    best = (
        cand.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("surface", F.col("_ee").alias("entity_id"), "dist")
    )
    return mentions.join(best, "surface", "left").select(
        "doc_id",
        "lo",
        "hi",
        "surface",
        "entity_id",
        F.coalesce(F.col("dist"), F.lit(-1)).cast("long").alias("dist"),
    )


SN_WINDOW = 2


def sorted_neighborhood_pairs(
    records: DataFrame, col: str = "name", w: int = SN_WINDOW
) -> DataFrame:
    """(a, b, gap, dist): sorted-neighborhood ER blocking (Hernandez &
    Stolfo's merge/purge) — candidate pairs are records within ``w``
    positions of each other in the GLOBAL sort order of the blocking
    key, the classic complement to hash blocking: LSH/length bands
    catch set-overlap neighbors, the sorted window catches prefix-run
    neighbors (typo clusters, serial ids) with a hard per-record
    candidate bound of w.

    Engine shape: the global rank uses the same **two-level rank** as
    build_vocab (per-prefix-bucket window + broadcast cumulative bucket
    offsets — no single-partition window at any vocabulary size), then
    each record explodes exactly w probe ranks (rk+1..rk+w) and ONE
    integer equi-join on the unique rank key pairs neighbors — skew-
    free by construction (every join key matches at most once). Output
    carries the rank gap and the exact Levenshtein distance (JVM
    built-in; DuckDB's is the identical classic definition) so the
    caller thresholds matches without recomputing.
    """
    recs = records.select(F.col(col).alias("_nm")).distinct().withColumn(
        "_bkt", F.substring("_nm", 1, 2)
    )
    local = recs.withColumn(
        "_lr", F.row_number().over(Window.partitionBy("_bkt").orderBy("_nm"))
    )
    offsets = (
        recs.groupBy("_bkt")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bkt", "_off")
    )
    ranked = local.join(F.broadcast(offsets), "_bkt").select(
        "_nm", (F.col("_off") + F.col("_lr")).cast("long").alias("_rk")
    )
    probes = ranked.select(
        F.col("_nm").alias("a"),
        F.explode(F.sequence(F.lit(1), F.lit(w))).alias("gap"),
        F.col("_rk"),
    ).withColumn("_rk", F.col("_rk") + F.col("gap"))
    return probes.join(ranked, "_rk").select(
        "a",
        F.col("_nm").alias("b"),
        F.col("gap").cast("long").alias("gap"),
        F.levenshtein("a", F.col("_nm")).cast("long").alias("dist"),
    )


DISAMB_CAND_K = 8


def disambiguate_mentions(
    docs: DataFrame, candidates: DataFrame, cand_k: int = DISAMB_CAND_K
) -> DataFrame:
    """(doc_id, alias, canon, n, host_support): anchor-commonness +
    document-coherence entity disambiguation — the wikification step
    between the alias dictionary (which keeps only each alias's DOMINANT
    target) and the graph: ambiguous aliases resolve to the candidate
    whose HOST carries the most candidate evidence within the same
    document (pages cohere around a site), ties -> higher commonness
    ``n`` -> canon ASC. ``candidates`` is the full anchor-evidence table
    (canon, anchor_text, n) — weblinks.anchor_evidence — NOT the
    top-1-filtered dictionary.

    Engine shape at 10^12 docs: candidates are first TRIMMED to the
    top ``cand_k`` per alias by commonness (the classic wikifier
    commonness cut — one window over the dictionary-sized table), so
    the mention fan-out is bounded at k. Then: one broadcast equi-join
    (mentions x trimmed dict), one (doc, host) map-side-combinable
    aggregate, one host-support join back, and one per-(doc, alias)
    argmax window whose partitions are <= k rows. The corpus shuffles
    once, keyed by doc — alias skew ("data" everywhere) stays harmless
    because the dictionary side is broadcast and the windows are
    per-document."""
    from hebrew_ner_spark.operators.weblinks import host_of

    trim_w = Window.partitionBy("alias").orderBy(F.desc("n"), F.asc("canon"))
    cand = (
        candidates.select(
            F.col("anchor_text").alias("alias"),
            "canon",
            F.col("n").cast("long").alias("n"),
        )
        .withColumn("_tr", F.row_number().over(trim_w))
        .where(F.col("_tr") <= cand_k)
        .select("alias", "canon", "n", host_of(F.col("canon")).alias("_host"))
    )
    mentions = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("alias"))
        .distinct()
    )
    cm = mentions.join(F.broadcast(cand), "alias")
    hs = cm.groupBy("doc_id", "_host").agg(F.sum("n").cast("long").alias("hsup"))
    pick_w = Window.partitionBy("doc_id", "alias").orderBy(
        F.desc("hsup"), F.desc("n"), F.asc("canon")
    )
    return (
        cm.join(hs, ["doc_id", "_host"])
        .withColumn("_r", F.row_number().over(pick_w))
        .where(F.col("_r") == 1)
        .select(
            "doc_id",
            "alias",
            "canon",
            "n",
            F.col("hsup").alias("host_support"),
        )
    )
