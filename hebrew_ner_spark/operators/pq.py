"""Product quantization (PQ) for the embedding column.

The vector-compression path for 10^12-row ANN: split each DIM-dim vector
into ``PQ_M`` subspaces, train a tiny per-subspace codebook with seeded
Lloyd iterations, and store each vector as ``PQ_M`` one-byte codes (a
256x memory reduction at production settings). Queries score the corpus
with **asymmetric distance computation** (ADC): one lookup table of
query-to-centroid distances per subspace, then a per-row table-sum — no
full-precision vectors ever touched at search time.

Scale shape:

* **Training** touches the corpus once per Lloyd iteration; the codebook
  is ``PQ_M x PQ_K`` rows — driver-sized by construction (same contract
  as ``simsearch.kmeans_centroids``) and returned as a local relation.
* **Encoding is zero-shuffle.** The codebook is broadcast grouped per
  subspace, and the per-(vector, subspace) argmin runs INSIDE the row as
  ``array_min`` over ``struct(sqdist, code)`` — no expand-then-window, no
  shuffle of corpus x K candidate rows. One map stage over the scan.
* **ADC scoring is one broadcast crossJoin** (Q lookup tables, each
  ``PQ_M x PQ_K`` longs) + a per-query top-k window — the same final
  ranking shape as ``brute_topk``/``ivf_topk``.

All arithmetic is exact integer (micro-unit components, integer squared
L2): order-independent, overflow-safe (|sub-dist| <= SUBDIM * (2e6)^2
~ 6.4e13 << 2^63) and reproduced bit-for-bit by the DuckDB oracle.

Generalizes the reference's single-process embedding handling
(hebrew-ner ``utils/data.py`` load_pretrained / ``model/ncrfpp.py``
embedding tables) to a distributed compressed index; no counterpart
file exists — this is the Spark-native scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hebrew_ner_spark.operators.simsearch import _micro_vecs

DIM = 64
PQ_M = 4  # subspaces
PQ_SUBDIM = DIM // PQ_M
PQ_K = 16  # codes per subspace (production: 256 -> 1 byte/code)
PQ_ITERS = 2
PQ_QUERIES = 8
PQ_TOPK = 10


def _subvecs(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sub array<bigint>): micro-unit subspace slices.

    posexplode of a sequence literal — the subspace axis is generated
    row-side, so the corpus scan stays single-pass and map-only."""
    return (
        _micro_vecs(emb)
        .select(
            "vec_id",
            F.posexplode(F.expr(f"sequence(0, {PQ_M - 1})")).alias("m", "_drop"),
            "mv",
        )
        .select(
            "vec_id",
            "m",
            F.expr(f"slice(mv, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("sub"),
        )
    )


def seed_codebooks(emb: DataFrame) -> DataFrame:
    """(m, code, cent): subspace slices of the first PQ_K vectors — the
    deterministic, resume-stable initialization (mirrors
    ``simsearch.seed_centroids``)."""
    return _subvecs(emb.where(F.col("vec_id") < PQ_K)).select(
        "m", F.col("vec_id").alias("code"), F.col("sub").alias("cent")
    )


_SQDIST = "aggregate(zip_with(sub, c.cent, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"


def _grouped_books(books: DataFrame) -> DataFrame:
    """(m, cands array<struct<code,cent>>): one row per subspace, codes in
    ascending order — the broadcast side of the zero-shuffle encoder."""
    return books.groupBy("m").agg(
        F.expr("array_sort(collect_list(struct(code, cent)))").alias("cands")
    )


def _assign_codes(sv: DataFrame, books: DataFrame) -> DataFrame:
    """(vec_id, m, code): nearest codebook entry by exact integer squared
    L2. The argmin runs inside the row — ``array_min`` over
    ``struct(d, code)`` (lexicographic: min distance, then min code) —
    so assignment is a broadcast join + map, NO corpus-side shuffle."""
    return sv.join(F.broadcast(_grouped_books(books)), "m").select(
        "vec_id",
        "m",
        F.expr(
            "array_min(transform(cands, c -> struct("
            "aggregate(zip_with(sub, c.cent, (x, y) -> (x - y) * (x - y)),"
            " 0L, (a, v) -> a + v) AS d, c.code AS code))).code"
        ).alias("code"),
    )


def _update_books(sv: DataFrame, assigned: DataFrame) -> DataFrame:
    """Lloyd update: per-(m, code, dim) integer sums (map-side combinable)
    then the truncating integer mean, re-packed ordered by dim — the same
    engine-exact arithmetic as ``simsearch._update_centroids``. Empty
    codes vanish (their seed row simply disappears)."""
    return (
        sv.join(assigned, ["vec_id", "m"])
        .select("m", "code", F.posexplode("sub").alias("dim", "val"))
        .groupBy("m", "code", "dim")
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
        .groupBy("m", "code")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, CAST(s DIV n AS BIGINT) AS cv))),"
                " p -> p.cv)"
            ).alias("cent")
        )
    )


def pq_codebooks(emb: DataFrame, iters: int = PQ_ITERS) -> DataFrame:
    """(m, code, cent): ``iters`` seeded Lloyd rounds per subspace, all
    subspaces trained in ONE pass per round (the subspace axis is just a
    grouping key). Returned as a driver-local relation (PQ_M x PQ_K rows
    by construction) so downstream broadcasts never re-execute the
    full-corpus training lineage — the ``kmeans_centroids`` contract."""
    sv = _subvecs(emb)
    books = seed_codebooks(emb)
    for i in range(iters):
        prev = books
        books = _update_books(sv, _assign_codes(sv, books)).persist()
        books.count()
        if i > 0:
            prev.unpersist()
    rows, schema = books.collect(), books.schema
    books.unpersist()
    return books.sparkSession.createDataFrame(rows, schema)


def pq_encode(emb: DataFrame, books: DataFrame | None = None) -> DataFrame:
    """(vec_id, m, code): the compressed index. Zero-shuffle given a
    trained codebook (broadcast + in-row argmin)."""
    if books is None:
        books = pq_codebooks(emb)
    return _assign_codes(_subvecs(emb), books)


def _adc_lut(emb: DataFrame, books: DataFrame, n_queries: int) -> DataFrame:
    """(qid, m, code, d): exact integer squared-L2 from each query's
    micro sub-vector to every codebook centroid — Q x PQ_M x PQ_K rows,
    the broadcast side of ADC scoring."""
    qs = _subvecs(emb.where(F.col("vec_id") < n_queries)).withColumnRenamed(
        "vec_id", "qid"
    )
    return qs.join(books.alias("c"), "m").select(
        "qid", "m", F.col("c.code").alias("code"), F.expr(_SQDIST).alias("d")
    )


def _packed_codes(codes: DataFrame) -> DataFrame:
    """(vec_id, pcodes): codes packed in subspace order."""
    return codes.groupBy("vec_id").agg(
        F.expr("transform(array_sort(collect_list(struct(m, code))), p -> p.code)").alias(
            "pcodes"
        )
    )


def _packed_lut(emb: DataFrame, books: DataFrame, n_queries: int) -> DataFrame:
    """(qid, tbl): the ADC lookup table packed per query as tbl[m][code]
    (codes are dense 0..PQ_K-1 only if no Lloyd cell died; pack by
    position in the code-sorted list and keep the code ids alongside to
    index safely even when sparse)."""
    return (
        _adc_lut(emb, books, n_queries)
        .groupBy("qid", "m")
        .agg(F.expr("array_sort(collect_list(struct(code, d)))").alias("row"))
        .groupBy("qid")
        .agg(F.expr("array_sort(collect_list(struct(m, row)))").alias("tbl"))
    )


# per subspace m: the lut row is code-sorted; filter to the vector's code
# (exactly one hit — codes come from the same codebook) and take its d.
_ADC_EXPR = (
    "aggregate(tbl, 0L, (acc, mr) -> acc + "
    "filter(mr.row, e -> e.code = element_at(pcodes, mr.m + 1))[0].d)"
)


def pq_adc_topk(
    emb: DataFrame,
    k: int = PQ_TOPK,
    n_queries: int = PQ_QUERIES,
    books: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """(qid, nid, rank, adc_d): top-k by ascending ADC distance (tie:
    nid). The corpus side carries only its PQ codes; each row's score is
    ``sum_m lut[qid][m][code_m]`` — one broadcast crossJoin of Q packed
    lookup tables against the code scan, then the per-query ranking
    window (the brute_topk/ivf_topk final shape)."""
    if books is None:
        books = pq_codebooks(emb)
    if codes is None:
        codes = pq_encode(emb, books)
    packed = _packed_codes(codes)
    lut = _packed_lut(emb, books, n_queries)
    scored = packed.crossJoin(F.broadcast(lut)).select(
        "qid",
        F.col("vec_id").alias("nid"),
        F.expr(_ADC_EXPR).alias("adc_d"),
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc_d"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "adc_d")
    )


def ivfpq_topk(
    emb: DataFrame,
    k: int = PQ_TOPK,
    n_queries: int = PQ_QUERIES,
    n_probes: int | None = None,
    cents: DataFrame | None = None,
    books: DataFrame | None = None,
) -> DataFrame:
    """(qid, nid, rank, adc_d): IVF-PQ — the production ANN layout
    (FAISS IndexIVFPQ). Each query probes its nearest IVF cells (trained
    Lloyd centroids, cosine probe — simsearch.ivf_probes) and ADC-scores
    ONLY the PQ codes of vectors assigned to probed cells.

    Scale story: at 10^12 rows the scan touches PQ_M bytes per vector of
    1/(cells/probes) of the corpus — the probe join partitions by cell
    (the index's physical layout: Iceberg-bucketed by cell in
    production) and both the probe list and the Q lookup tables are
    broadcast, so the only corpus-side work is a partition-pruned code
    scan + table-sum. Self-inclusive like pq_adc_topk (rank 1 is the
    query when its own cell is probed), so recall numbers compare
    directly across the pq/sq tiers."""
    from hebrew_ner_spark.operators import simsearch

    if cents is None:
        cents = simsearch.kmeans_centroids(emb)
    if books is None:
        books = pq_codebooks(emb)
    if n_probes is None:
        n_probes = simsearch.IVF_PROBES
    cells = simsearch.ivf_assign(emb, cents=cents)
    probes = simsearch.ivf_probes(emb, cents, n_queries, n_probes)
    cand = (
        _packed_codes(pq_encode(emb, books))
        .join(cells, "vec_id")
        .join(F.broadcast(probes), "cell")
    )
    scored = cand.join(F.broadcast(_packed_lut(emb, books, n_queries)), "qid").select(
        "qid", F.col("vec_id").alias("nid"), F.expr(_ADC_EXPR).alias("adc_d")
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc_d"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "adc_d")
    )


def exact_l2_topk(emb: DataFrame, k: int = PQ_TOPK, n_queries: int = PQ_QUERIES) -> DataFrame:
    """(qid, nid, rank, d): exact integer squared-L2 top-k — the ground
    truth PQ approximates. Same broadcast + window shape."""
    mv = _micro_vecs(emb)
    qs = mv.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("mv").alias("qv")
    )
    scored = mv.crossJoin(F.broadcast(qs)).select(
        "qid",
        F.col("vec_id").alias("nid"),
        F.expr(
            "aggregate(zip_with(qv, mv, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"
        ).alias("d"),
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "d")
    )


def pq_recall(
    emb: DataFrame,
    k: int = PQ_TOPK,
    n_queries: int = PQ_QUERIES,
    books: DataFrame | None = None,
) -> DataFrame:
    """(qid, hits, k): |PQ top-k ∩ exact top-k| per query — the
    compression-quality metric, exact integers only."""
    if books is None:
        books = pq_codebooks(emb)
    approx = pq_adc_topk(emb, k, n_queries, books=books).select("qid", "nid")
    exact = exact_l2_topk(emb, k, n_queries).select("qid", "nid")
    hits = (
        approx.join(exact, ["qid", "nid"]).groupBy("qid").agg(F.count("*").alias("h"))
    )
    # left-join from the query universe so a zero-hit query reports 0
    # rather than vanishing (identical CASE on the oracle side).
    return (
        exact.select("qid")
        .distinct()
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hits"),
            F.lit(k).cast("long").alias("k"),
        )
    )
