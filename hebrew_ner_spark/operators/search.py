"""Full-text relevance search: postings statistics and BM25 top-k.

The reference's retrieval surface is a dictionary lookup (alias ->
entity, utils-level exact match); a web-corpus engine additionally needs
*ranked* retrieval over the document table — the operator behind
"find the passages about X" in a curation / evaluation loop. Two pieces:

* ``term_postings`` — the inverted-index statistics table (term, df, cf):
  document frequency and collection frequency per term. At 10^12 docs
  this is the classic high-cardinality, skew-free aggregate (terms hash
  well; mega-terms are stopwords you cut with a df ceiling).
* ``bm25_topk`` — Okapi BM25 (k1 = 6/5, b = 3/4) in EXACT integer
  arithmetic so the DuckDB oracle reproduces every score bit-for-bit:

      idf_1e6  = (1e6 * (N - df + 1)) DIV (df + 1)
      contrib  = (idf_1e6 * 22 * tf * L) DIV (10*tf*L + 3*L + 9*len*N)
      score    = sum over query terms

  The rational idf (N-df+1)/(df+1) replaces the usual log-idf: it is
  monotone in df with the same ordering intent, and — unlike log — has
  an exact integer form, which is what makes the gate cross-engine.
  The contrib formula is the standard tf*(k1+1)/(tf + k1*(1-b+b*len/avg))
  with avglen = L/N cleared of denominators (multiply through by 10*L).
  int64 bound: idf_1e6 * 22 * tf * L < 2^63 — holds to ~10^9-token
  gate corpora; at full web scale score with doubles (ranking tolerates
  ulp noise; the integer form exists for the correctness gate).

Scale shape: the per-(doc, term) tf for the query's terms is computed
ARRAY-side (size(filter(toks, ...)) per term — no explode, no shuffle);
df for the ≤|query| terms and the (N, L) totals are tiny aggregates that
broadcast back; the only wide operation is the final top-k, which Spark
executes as TakeOrderedAndProject (per-partition heap + driver merge of
k rows — never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_TOPK = 20


def _toks(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("long").alias("len_d"),
    )


def term_postings(docs: DataFrame) -> DataFrame:
    """(term, df, cf): inverted-index statistics. One explode + one
    map-side-combined aggregate; tf is resolved array-side per document
    first so the exchange carries (term, tf) pairs at (doc, term) grain,
    not raw token occurrences."""
    per_doc = _toks(docs).select(
        "doc_id",
        F.explode(
            F.expr(
                """
                transform(array_distinct(toks),
                          t -> named_struct('term', t,
                                            'tf', size(filter(toks, x -> x = t))))
                """
            )
        ).alias("p"),
    )
    return per_doc.groupBy(F.col("p.term").alias("term")).agg(
        F.count("*").cast("long").alias("df"),
        F.sum("p.tf").cast("long").alias("cf"),
    )


def bm25_topk(docs: DataFrame, terms: list[str], k: int = BM25_TOPK) -> DataFrame:
    """(doc_id, score_1e6): top-k documents for a bag-of-terms query
    under exact-integer BM25 (module docstring). Ties break on doc_id,
    so the cut is deterministic on both engines."""
    toks = _toks(docs)
    structs = ", ".join(
        f"named_struct('term', '{t}', 'tf', bigint(size(filter(toks, x -> x = '{t}'))))"
        for t in terms
    )
    tfs = (
        toks.select("doc_id", "len_d", F.explode(F.expr(f"array({structs})")).alias("p"))
        .select("doc_id", "len_d", F.col("p.term").alias("term"), F.col("p.tf").alias("tf"))
        .where(F.col("tf") > 0)
    )
    dfreq = tfs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    totals = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("len_d").cast("long").alias("n_toks"),
    )
    scored = (
        tfs.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf_1e6",
            F.expr("(1000000 * (n_docs - df + 1)) DIV (df + 1)"),
        )
        .withColumn(
            "contrib",
            F.expr(
                "(idf_1e6 * 22 * tf * n_toks) DIV "
                "(10 * tf * n_toks + 3 * n_toks + 9 * len_d * n_docs)"
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("contrib").cast("long").alias("score_1e6")
    )
    return per_doc.orderBy(F.col("score_1e6").desc(), "doc_id").limit(k)


BM25_BATCH_K = 5


def bm25_batch(docs: DataFrame, queries: DataFrame, k: int = BM25_BATCH_K) -> DataFrame:
    """(qid, doc_id, score_1e6, rank): per-query BM25 top-k for a TABLE
    of queries (qid, term) — the batch-evaluation shape (thousands of
    eval queries scored in one pass) where unrolling terms as literals
    (bm25_topk) stops making sense.

    Scale shape: the corpus-grain token explode is pruned IMMEDIATELY by
    a broadcast semi-join against the distinct query-term set, so the
    (doc, term) tf aggregate only ever sees occurrences of queried terms
    (~|matches|, not |corpus tokens|); df and totals broadcast back; the
    per-query cut is a rank <= k window — WindowGroupLimit ships at most
    k rows per qid per map task. Duplicate (qid, term) rows are deduped
    so a repeated term cannot double-score.
    """
    toks = _toks(docs)
    q = queries.select("qid", "term").distinct()
    qterms = q.select("term").distinct()
    occ = toks.select(
        "doc_id", "len_d", F.explode("toks").alias("term")
    ).join(F.broadcast(qterms), "term")
    tfs = occ.groupBy("doc_id", "len_d", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = tfs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    totals = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("len_d").cast("long").alias("n_toks"),
    )
    contrib = (
        tfs.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn("idf_1e6", F.expr("(1000000 * (n_docs - df + 1)) DIV (df + 1)"))
        .withColumn(
            "c",
            F.expr(
                "(idf_1e6 * 22 * tf * n_toks) DIV "
                "(10 * tf * n_toks + 3 * n_toks + 9 * len_d * n_docs)"
            ),
        )
    )
    per_q = (
        contrib.join(F.broadcast(q), "term")
        .groupBy("qid", "doc_id")
        .agg(F.sum("c").cast("long").alias("score_1e6"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("score_1e6").desc(), "doc_id")
    return (
        per_q.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", "score_1e6", "rank")
    )


def merge_postings(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a crawl delta's postings statistics into the persisted index
    WITHOUT rescanning the base corpus: (term, df, cf) is a mergeable
    summary (both counts are sums), so maintenance is one full-outer
    join + coalesced adds on the term key — the dedup_probe_delta
    discipline applied to the retrieval index. At 10^12 docs the base
    postings table is the artifact; only the delta is ever tokenized.
    """
    b = base.select("term", F.col("df").alias("_bdf"), F.col("cf").alias("_bcf"))
    d = delta.select("term", F.col("df").alias("_ddf"), F.col("cf").alias("_dcf"))
    return b.join(d, "term", "full_outer").select(
        "term",
        (F.coalesce("_bdf", F.lit(0)) + F.coalesce("_ddf", F.lit(0)))
        .cast("long")
        .alias("df"),
        (F.coalesce("_bcf", F.lit(0)) + F.coalesce("_dcf", F.lit(0)))
        .cast("long")
        .alias("cf"),
    )


def phrase_match(docs: DataFrame, phrase: list[str]) -> DataFrame:
    """(doc_id, n_matches, first_pos): exact phrase search — documents
    containing the token sequence ``phrase`` verbatim, with occurrence
    count and first match position (0-based). The companion to BM25's
    bag-of-terms ranking: quote queries, eval-contamination spot checks,
    boilerplate hunting.

    Scale shape: entirely array-side — one codegen filter over window
    starts comparing a token slice against the phrase literal; zero
    shuffles, zero Python, and the WHERE n_matches > 0 predicate sits on
    the same narrow stage, so non-matching documents never leave the
    scan task. (A positional-postings index is the right shape once the
    same corpus serves MANY phrase queries; for pipeline-style single
    passes the scan IS the index.)
    """
    lits = ", ".join(f"'{t}'" for t in phrase)
    n = len(phrase)
    matches = F.expr(
        f"""
        filter(
          CASE WHEN size(toks) < {n} THEN array()
               ELSE sequence(0, size(toks) - {n}) END,
          i -> slice(toks, i + 1, {n}) = array({lits}))
        """
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.size(matches).cast("long").alias("n_matches"),
            F.element_at(matches, 1).cast("long").alias("first_pos"),
        )
        .where(F.col("n_matches") > 0)
    )


RRF_K = 60      # Cormack et al. SIGIR'09 smoothing constant
RRF_TOPK = 10


def rrf_fuse(runs: list[DataFrame], k: int = RRF_TOPK, rrf_k: int = RRF_K) -> DataFrame:
    """(qid, doc_id, n_runs, rrf_1e6, rank): Reciprocal Rank Fusion of
    ranked retrieval runs — the standard hybrid-retrieval combiner
    (lexical BM25 + semantic ANN, Cormack et al. SIGIR'09).

    Each run is (qid, doc_id, rank); a doc's fused score is
    sum over runs of 1e6 DIV (rrf_k + rank) — pure integer arithmetic,
    rank-only (score scales never have to be calibrated across runs,
    which is WHY RRF is the standard fusion). n_runs counts how many
    runs retrieved the doc (the agreement signal).

    Scale shape: each run is already top-k per query (k rows per qid),
    so the union + (qid, doc_id) aggregate + per-query window all touch
    O(|queries| * k * |runs|) rows — never the corpus; WindowGroupLimit
    pushes the final cut map-side.
    """
    from functools import reduce

    from pyspark.sql import Window

    contribs = [
        r.select(
            "qid",
            "doc_id",
            F.expr(f"CAST(1000000 DIV ({rrf_k} + rank) AS BIGINT)").alias("c"),
        )
        for r in runs
    ]
    allc = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = allc.groupBy("qid", "doc_id").agg(
        F.count("*").cast("long").alias("n_runs"),
        F.sum("c").cast("long").alias("rrf_1e6"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_1e6"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "doc_id", "n_runs", "rrf_1e6", "rank")
    )
