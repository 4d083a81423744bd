"""Gates: hash-stable splits, contamination audit, KG negative sampling.

Every oracle recomputes the SAME portable 60-bit md5 hash the Spark plan
uses (functions/hashing.py), so split assignment and sampled ranks match
bit-for-bit; the contamination oracle composes the dedup family's
verified-near-dup CTE chain (dedup_q.NEAR_JACCARD_CTES) with the split
hash; the negative-sampling oracle re-derives dense node ranks with a
plain row_number (the Spark side's two-level rank must agree exactly —
that equivalence IS the thing being gated). NEG_K / TRAIN_PCT / VAL_PCT
are imported from the operator so retuning cannot desync plan and
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hebrew_ner_spark.functions.hashing import phash_duck, shingles_duck
from hebrew_ner_spark.operators import linking, training
from hebrew_ner_spark.operators.training import DECON_K, NEG_K, TRAIN_PCT, VAL_PCT
from hebrew_ner_spark.querydefs.dedup_q import _BANDS_CTE, _PAIRS_SQL, NEAR_JACCARD_CTES
from hebrew_ner_spark.querydefs.graph_q import _dim_values, _edges_ctes
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_SPLIT_HASH = phash_duck("'split|' || CAST(doc_id AS VARCHAR)", 0)
_SPLIT_CTE = f"""
sp AS (
  SELECT doc_id, {_SPLIT_HASH} % 100 AS bucket,
         CASE WHEN {_SPLIT_HASH} % 100 < {TRAIN_PCT} THEN 'train'
              WHEN {_SPLIT_HASH} % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@query(
    "trn_decontaminate",
    oracle=f"""
    WITH {_SPLIT_CTE},
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, unnest({shingles_duck("toks", DECON_K)}) AS gram FROM t),
    tg AS (SELECT DISTINCT gram FROM g JOIN sp USING (doc_id) WHERE split = 'test'),
    trg AS (SELECT g.doc_id, g.gram FROM g JOIN sp USING (doc_id) WHERE split = 'train')
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM trg JOIN tg USING (gram) GROUP BY doc_id
    """,
)
def trn_decontaminate(spark, sf_dir):
    """Exact k-gram decontamination vs the test split: train docs that
    quote eval items verbatim (operators/training.py
    decontaminate_ngrams — broadcast eval grams, zero train-side
    shuffle before the final per-doc count)."""
    return training.decontaminate_ngrams(_docs(spark, sf_dir))


@query(
    "trn_doc_splits",
    oracle=f"WITH {_SPLIT_CTE} SELECT doc_id, bucket, split FROM sp",
)
def trn_doc_splits(spark, sf_dir):
    """Hash-stable 80/10/10 split: a pure function of doc identity, so
    membership never moves as the corpus grows."""
    return training.doc_splits(_docs(spark, sf_dir))


@query(
    "trn_contamination",
    oracle=f"""
    WITH {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    {NEAR_JACCARD_CTES},
    {_SPLIT_CTE}
    SELECT nd.doc_a, nd.doc_b, a.split AS split_a, b.split AS split_b,
           nd.jaccard_1e6
    FROM nd
    JOIN sp a ON a.doc_id = nd.doc_a
    JOIN sp b ON b.doc_id = nd.doc_b
    WHERE a.split <> b.split
    """,
)
def trn_contamination(spark, sf_dir):
    """Eval-leak audit: verified near-dup pairs straddling the split
    boundary (testdata's planted duplicate clusters guarantee the gate
    is non-vacuous — hash assignment scatters each cluster)."""
    return training.split_contamination(_docs(spark, sf_dir))


@query(
    "trn_negative_samples",
    oracle=f"""
    WITH {_dim_values()},
    {_edges_ctes()},
    ids AS (SELECT subj_id AS id FROM e UNION SELECT obj_id FROM e),
    rk AS (SELECT id, CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS r
           FROM ids),
    v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM rk),
    ex AS (
      SELECT e.subj_id, e.pred, e.obj_id, ro.r AS r_obj,
             CAST(ks.i AS BIGINT) AS neg_i
      FROM e
      JOIN rk ro ON ro.id = e.obj_id,
           (SELECT unnest([{", ".join(str(i) for i in range(NEG_K))}]) AS i) ks
    ),
    neg AS (
      SELECT subj_id, pred, obj_id, neg_i,
             CASE WHEN {phash_duck(
                 "CAST(subj_id AS VARCHAR) || '|' || pred || '|' ||"
                 " CAST(obj_id AS VARCHAR) || '|' || CAST(neg_i AS VARCHAR)", 0
             )} % v.v = r_obj
                  THEN ({phash_duck(
                      "CAST(subj_id AS VARCHAR) || '|' || pred || '|' ||"
                      " CAST(obj_id AS VARCHAR) || '|' || CAST(neg_i AS VARCHAR)", 0
                  )} % v.v + 1) % v.v
                  ELSE {phash_duck(
                      "CAST(subj_id AS VARCHAR) || '|' || pred || '|' ||"
                      " CAST(obj_id AS VARCHAR) || '|' || CAST(neg_i AS VARCHAR)", 0
                  )} % v.v END AS nr
      FROM ex, v
    )
    SELECT n.subj_id, n.pred, n.obj_id, n.neg_i, rk.id AS neg_obj_id
    FROM neg n JOIN rk ON rk.r = n.nr
    """,
)
def trn_negative_samples(spark, sf_dir):
    """NEG_K corrupted objects per distinct KG edge; the oracle's plain
    row_number rank must coincide with the Spark side's two-level rank
    (that equivalence is the gated claim)."""
    return training.negative_samples(linking.kg_edges(_docs(spark, sf_dir)))


# --- sequence packing --------------------------------------------------------

PACK_LEN = 256  # gate chunk size (tokens)

_PCK_HASH = phash_duck("'PCK|' || CAST(doc_id AS VARCHAR)", training.PACK_SEED)


@query(
    "trn_pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             {_PCK_HASH} AS h
      FROM documents),
    o AS (
      SELECT lang, doc_id, n_toks,
             sum(n_toks) OVER (PARTITION BY lang
                               ORDER BY h % {training.PACK_BUCKETS}, h, doc_id)
               - n_toks AS off
      FROM d),
    p AS (
      SELECT lang, doc_id, off, n_toks, c.chunk_id
      FROM o, LATERAL (SELECT unnest(range(CAST(off // {PACK_LEN} AS BIGINT),
                                           CAST((off + n_toks - 1) // {PACK_LEN} + 1 AS BIGINT)))
                       AS chunk_id) c
      WHERE n_toks > 0)
    SELECT lang,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           doc_id,
           CAST(greatest(off, chunk_id * {PACK_LEN}) - off AS BIGINT) AS piece_start,
           CAST(least(off + n_toks, chunk_id * {PACK_LEN} + {PACK_LEN})
                - greatest(off, chunk_id * {PACK_LEN}) AS BIGINT) AS piece_len,
           CAST(greatest(off, chunk_id * {PACK_LEN})
                - chunk_id * {PACK_LEN} AS BIGINT) AS chunk_pos
    FROM p
    """,
)
def trn_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing of each language's token stream into
    fixed 256-token chunks; the oracle replays the two-level offset as a
    single bucket-major window (the equivalence IS the gated claim)."""
    return training.pack_sequences(_docs(spark, sf_dir), PACK_LEN)


@query(
    "trn_decontaminate_bloom",
    oracle=f"""
    WITH {_SPLIT_CTE},
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, unnest({shingles_duck("toks", DECON_K)}) AS gram FROM t),
    tg AS (SELECT DISTINCT gram FROM g JOIN sp USING (doc_id) WHERE split = 'test'),
    trg AS (SELECT g.doc_id, g.gram FROM g JOIN sp USING (doc_id) WHERE split = 'train')
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM trg JOIN tg USING (gram) GROUP BY doc_id
    """,
)
def trn_decontaminate_bloom(spark, sf_dir):
    """Bloom-pruned exact decontamination — the oracle is the EXACT
    (non-bloom) pass, so 'pruning changes nothing' is the gated claim
    (no false negatives end to end)."""
    return training.decontaminate_ngrams_bloom(_docs(spark, sf_dir))


_ESAMPLE_HASH = phash_duck("'esample|' || CAST(doc_id AS VARCHAR)", 0)


@query(
    "trn_eval_sample",
    oracle=f"""
    WITH {_SPLIT_CTE},
    ranked AS (
      SELECT d.doc_id, d.lang, sp.split,
             row_number() OVER (PARTITION BY sp.split, d.lang
                                ORDER BY {_ESAMPLE_HASH}, d.doc_id)
               AS pick_rank
      FROM documents d JOIN sp USING (doc_id)
    )
    SELECT doc_id, lang, split, CAST(pick_rank AS BIGINT) AS pick_rank
    FROM ranked WHERE pick_rank <= {training.EVAL_QUOTA}
    """,
)
def trn_eval_sample(spark, sf_dir):
    """Exact-quota stratified eval subset per (split, lang): first
    EVAL_QUOTA docs per stratum in portable-hash order
    (operators/training.py eval_sample — WindowGroupLimit partial
    top-k, the exchange never carries the corpus)."""
    return training.eval_sample(_docs(spark, sf_dir))


from hebrew_ner_spark.operators.textstats import quality_pass_sql  # noqa: E402
from hebrew_ner_spark.querydefs.curation_q import (  # noqa: E402
    MIX_TARGET as _MANIFEST_MIX_TARGET,
    _MIX_SHARES_CTES,
    _MIX_HASH,
)
from hebrew_ner_spark.operators import curation as _curation  # noqa: E402


@query(
    "trn_manifest",
    oracle=f"""
    WITH {_SPLIT_CTE},
    {_MIX_SHARES_CTES},
    mix AS (
      SELECT doc_id, CAST(1 AS BIGINT) AS in_mixture
      FROM documents JOIN shares USING (lang)
      WHERE {_MIX_HASH} % {_curation.MIX_M} < keep_threshold),
    ranked AS (
      SELECT d.doc_id,
             row_number() OVER (PARTITION BY sp.split, d.lang
                                ORDER BY {_ESAMPLE_HASH}, d.doc_id) AS pick_rank
      FROM documents d JOIN sp USING (doc_id)),
    ev AS (SELECT doc_id, CAST(pick_rank AS BIGINT) AS eval_rank
           FROM ranked WHERE pick_rank <= {training.EVAL_QUOTA})
    SELECT d.doc_id, d.lang,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
           sp.split,
           CAST({quality_pass_sql("string_split(d.text, ' ')")} AS BIGINT)
             AS quality_pass,
           CAST(coalesce(in_mixture, 0) AS BIGINT) AS in_mixture,
           eval_rank
    FROM documents d
    JOIN sp USING (doc_id)
    LEFT JOIN mix USING (doc_id)
    LEFT JOIN ev USING (doc_id)
    """,
)
def trn_manifest(spark, sf_dir):
    """The per-document training manifest: split, quality verdict,
    mixture keep, eval rank — every disposition side by side
    (operators/training.py training_manifest — broadcast joins onto one
    narrow doc scan; records, never filters)."""
    return training.training_manifest(_docs(spark, sf_dir), _MANIFEST_MIX_TARGET)


@query(
    "trn_feature_hash",
    oracle=f"""
    WITH fhtoks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT doc_id,
           CAST({phash_duck("token", 0)} % {training.FEATURE_BUCKETS} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM fhtoks GROUP BY 1, 2
    """,
)
def trn_feature_hash(spark, sf_dir):
    """Hashing-trick document vectors: vocabulary-free fixed-width
    features via the portable hash, folded map-side."""
    return training.feature_hash(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Deterministic global shuffle
# ---------------------------------------------------------------------------

_SHUF_K = phash_duck(
    f"'shuf|0|' || CAST(doc_id AS VARCHAR)", training.SHUFFLE_SEED
)


@query(
    "trn_global_shuffle",
    oracle=f"""
    WITH gs_k AS (SELECT doc_id, {_SHUF_K} AS k FROM documents),
    gs_r AS (SELECT doc_id,
                    CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT)
                      AS pos
             FROM gs_k)
    SELECT doc_id, pos, CAST(pos % 8 AS BIGINT) AS shard FROM gs_r
    """,
)
def trn_global_shuffle(spark, sf_dir):
    """Epoch-0 deterministic corpus permutation (two-level rank over the
    hash order, no global sort) — vs DuckDB's one-window total order."""
    return training.global_shuffle(
        load_table(spark, sf_dir, "documents").select("doc_id")
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear quality scorer
# ---------------------------------------------------------------------------

_LRB = training.FEATURE_BUCKETS
_LR_H = phash_duck("t.token", 0)
_LR_W = phash_duck(
    f"CAST({_LR_H} % {_LRB} AS VARCHAR)", training.LR_SEED
)


@query(
    "trn_quality_lr",
    oracle=f"""
    WITH lr_t AS (
      SELECT doc_id, {_LR_W} % 1000000 - 500000 AS w
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
      WHERE t.token <> ''
    ),
    lr_s AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(w) AS BIGINT) AS sw
      FROM lr_t GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(FLOOR((2 * sw + n_tokens) / (2.0 * n_tokens)) AS BIGINT)
             AS score_1e6,
           CAST(CASE WHEN FLOOR((2 * sw + n_tokens) / (2.0 * n_tokens))
                          > {training.LR_THRESHOLD_1E6}
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM lr_s
    """,
)
def trn_quality_lr(spark, sf_dir):
    """fastText-style linear quality-filter inference: per-token hashed
    feature weights, doc-mean score in half-up micro-units, keep flag."""
    return training.quality_lr_scores(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Curriculum ordering
# ---------------------------------------------------------------------------

_CURR_K = phash_duck(
    "'curr|0|' || CAST(doc_id AS VARCHAR)", training.SHUFFLE_SEED
)


@query(
    "trn_curriculum_order",
    oracle=f"""
    WITH co_k AS (
      SELECT doc_id,
             CAST(CASE WHEN len(string_split(text, ' ')) <= 0 THEN 0
                  ELSE length(bin(len(string_split(text, ' ')))) END
                  AS BIGINT) AS diff_bucket,
             {_CURR_K} AS k
      FROM documents
    )
    SELECT doc_id, diff_bucket,
           CAST(row_number() OVER (ORDER BY diff_bucket, k, doc_id) - 1
                AS BIGINT) AS pos
    FROM co_k
    """,
)
def trn_curriculum_order(spark, sf_dir):
    """Length-curriculum permutation: log2-token difficulty buckets in
    order, epoch-hash shuffle within each — two-level rank, no global
    sort."""
    return training.curriculum_order(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


# ---------------------------------------------------------------------------
# Rule-filter vs LR-filter agreement (Cohen's kappa)
# ---------------------------------------------------------------------------

from hebrew_ner_spark.operators import clustereval as _clustereval  # noqa: E402
from hebrew_ner_spark.operators.textstats import quality_pass_expr  # noqa: E402


@query(
    "eval_filter_kappa",
    oracle=f"""
    WITH fk_rule AS (
      SELECT doc_id, lang,
             CAST({quality_pass_sql("string_split(text, ' ')")} AS BIGINT)
               AS rk
      FROM documents
    ),
    fk_lr_t AS (
      SELECT doc_id, {_LR_W} % 1000000 - 500000 AS w
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
      WHERE t.token <> ''
    ),
    fk_lr AS (
      SELECT doc_id,
             CAST(CASE WHEN FLOOR((2 * sum(w) + count(*)) / (2.0 * count(*)))
                            > {training.LR_THRESHOLD_1E6}
                  THEN 1 ELSE 0 END AS BIGINT) AS lk
      FROM fk_lr_t GROUP BY doc_id
    ),
    fk_cells AS (
      SELECT r.lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(r.rk * coalesce(l.lk, 0)) AS BIGINT) AS a,
             CAST(sum(r.rk * (1 - coalesce(l.lk, 0))) AS BIGINT) AS b,
             CAST(sum((1 - r.rk) * coalesce(l.lk, 0)) AS BIGINT) AS c,
             CAST(sum((1 - r.rk) * (1 - coalesce(l.lk, 0))) AS BIGINT) AS d
      FROM fk_rule r LEFT JOIN fk_lr l USING (doc_id)
      GROUP BY r.lang
    )
    SELECT lang, n_docs,
           a AS n_both_keep, b AS n_rule_only, c AS n_lr_only,
           d AS n_both_drop,
           CAST((2 * (a + d) * 1000000 + n_docs) // (2 * n_docs) AS BIGINT)
             AS po_1e6,
           CAST((2 * ((a+b)*(a+c) + (c+d)*(b+d)) * 1000000 + n_docs * n_docs)
                // (2 * n_docs * n_docs) AS BIGINT) AS pe_1e6,
           CAST(CASE
             WHEN n_docs * n_docs - ((a+b)*(a+c) + (c+d)*(b+d)) = 0
               THEN 1000000
             WHEN n_docs * (a + d) - ((a+b)*(a+c) + (c+d)*(b+d)) >= 0
               THEN (2 * (n_docs * (a + d) - ((a+b)*(a+c) + (c+d)*(b+d)))
                       * 1000000
                     + (n_docs * n_docs - ((a+b)*(a+c) + (c+d)*(b+d))))
                    // (2 * (n_docs * n_docs - ((a+b)*(a+c) + (c+d)*(b+d))))
             ELSE -((2 * -(n_docs * (a + d) - ((a+b)*(a+c) + (c+d)*(b+d)))
                       * 1000000
                     + (n_docs * n_docs - ((a+b)*(a+c) + (c+d)*(b+d))))
                    // (2 * (n_docs * n_docs - ((a+b)*(a+c) + (c+d)*(b+d)))))
           END AS BIGINT) AS kappa_1e6
    FROM fk_cells
    """,
)
def eval_filter_kappa(spark, sf_dir):
    """Cohen's kappa per language between the rule quality gate
    (textstats.quality_pass_expr — the txt_quality_filter predicate) and
    the hashed-feature LR filter (training.quality_lr_scores.keep) on
    identical documents: the chance-corrected agreement check a
    pipeline runs before swapping a cheap filter in for an expensive
    one. Doc-keyed left join (LR drops empty-token docs -> keep 0) +
    one lang-keyed map-side-combinable contingency rollup
    (operators/clustereval.py filter_agreement_kappa)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    rule = docs.select(
        "doc_id",
        "lang",
        F.when(quality_pass_expr("split(text, ' ')"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rk"),
    )
    lr = training.quality_lr_scores(docs).select(
        "doc_id", F.col("keep").alias("lk")
    )
    flags = rule.join(lr, "doc_id", "left").select(
        "lang", "rk", F.coalesce("lk", F.lit(0)).cast("long").alias("lk")
    )
    return _clustereval.filter_agreement_kappa(flags)


@query(
    "cur_pareto_docs",
    oracle=f"""
    WITH pd_t AS (
      SELECT doc_id, {_LR_W} % 1000000 - 500000 AS w
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
      WHERE t.token <> ''
    ),
    pd_s AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(FLOOR((2 * sum(w) + count(*)) / (2.0 * count(*))) AS BIGINT)
               AS score_1e6
      FROM pd_t GROUP BY doc_id
    )
    SELECT r.doc_id, r.score_1e6, r.n_tokens
    FROM pd_s r
    WHERE NOT EXISTS (
      SELECT 1 FROM pd_s q
      WHERE q.score_1e6 >= r.score_1e6 AND q.n_tokens >= r.n_tokens
        AND (q.score_1e6 > r.score_1e6 OR q.n_tokens > r.n_tokens))
    """,
)
def cur_pareto_docs(spark, sf_dir):
    """Pareto skyline of (LR quality score, length): the documents no
    other document dominates. The oracle is the definition itself (an
    all-pairs NOT EXISTS — fine at sf0.01); the Spark plan is the
    scale shape: score-grain collapse + two-level strict-prefix max +
    broadcast re-attach, no quadratic step anywhere
    (operators/curation.py pareto_frontier)."""
    scored = training.quality_lr_scores(_docs(spark, sf_dir)).select(
        "doc_id", "score_1e6", "n_tokens"
    )
    return _curation.pareto_frontier(scored)


_WS_HASH = phash_duck(
    "'wsmp|' || CAST(doc_id AS VARCHAR)", training.WSAMPLE_SEED
)


@query(
    "cur_weighted_sample",
    oracle=f"""
    WITH ws_d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST({_WS_HASH} // greatest(len(string_split(text, ' ')), 1)
                  AS BIGINT) AS priority
      FROM documents
    ),
    ws_r AS (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY priority, doc_id) AS pick_rank
      FROM ws_d
    )
    SELECT doc_id, lang, n_tokens, priority,
           CAST(pick_rank AS BIGINT) AS pick_rank
    FROM ws_r WHERE pick_rank <= {training.WSAMPLE_QUOTA}
    """,
)
def cur_weighted_sample(spark, sf_dir):
    """Deterministic length-weighted priority sample (u DIV w priority
    order, k smallest per language): inclusion odds scale with document
    length but membership is a pure function of identity — stable under
    corpus growth. WindowGroupLimit partial top-k, the exchange never
    carries the corpus (operators/training.py weighted_sample)."""
    return training.weighted_sample(_docs(spark, sf_dir))


@query(
    "trn_split_balance",
    oracle=f"""
    WITH {_SPLIT_CTE},
    sb_n AS (
      SELECT d.lang, sp.split, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents d JOIN sp USING (doc_id)
      GROUP BY 1, 2
    ),
    sb_l AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_lang
             FROM sb_n GROUP BY 1)
    SELECT n.lang, n.split, n.n_docs, l.n_lang,
           CAST((2 * n.n_docs * 1000000 + l.n_lang) // (2 * l.n_lang)
                AS BIGINT) AS share_1e6,
           CAST(abs((2 * n.n_docs * 1000000 + l.n_lang) // (2 * l.n_lang)
                    - (CASE n.split WHEN 'train' THEN {TRAIN_PCT}
                                    WHEN 'val' THEN {VAL_PCT}
                                    ELSE {100 - TRAIN_PCT - VAL_PCT} END)
                      * 10000) AS BIGINT) AS drift_1e6
    FROM sb_n n JOIN sb_l l USING (lang)
    """,
)
def trn_split_balance(spark, sf_dir):
    """Split-balance audit per language: realized split shares vs the
    hash contract's nominal 80/10/10, exact half-up micro-units — the
    drift check a pipeline alarms on when a stratum is too small for
    the hash to average out. Two map-side-combinable rollups over the
    inline-recomputed split (no join back through doc_splits)."""
    from pyspark.sql import functions as F

    d = training.doc_splits(_docs(spark, sf_dir)).join(
        _docs(spark, sf_dir).select("doc_id", "lang"), "doc_id"
    )
    n = d.groupBy("lang", "split").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    l = n.groupBy("lang").agg(F.sum("n_docs").cast("long").alias("n_lang"))
    pct = (
        f"CASE split WHEN 'train' THEN {training.TRAIN_PCT}"
        f" WHEN 'val' THEN {training.VAL_PCT}"
        f" ELSE {100 - training.TRAIN_PCT - training.VAL_PCT} END"
    )
    return n.join(l, "lang").select(
        "lang",
        "split",
        "n_docs",
        "n_lang",
        F.expr("(2 * n_docs * 1000000 + n_lang) DIV (2 * n_lang)").alias(
            "share_1e6"
        ),
        F.expr(
            f"abs((2 * n_docs * 1000000 + n_lang) DIV (2 * n_lang)"
            f" - ({pct}) * 10000)"
        )
        .cast("long")
        .alias("drift_1e6"),
    )
