"""Curation-operator queries + DuckDB oracles (PII redaction,
repetition signals, token-budget sampling).

The testdata corpus contains no natural PII, so ``cur_pii_redact``
PLANTS it deterministically from doc_id inside the query — the same
planting expression on both engines (the repo's planted-group pattern,
cf. dedup_exact) — making the gate non-vacuous: every third document
gains an email + IP + phone that must be counted and redacted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_duck
from hebrew_ner_spark.operators import curation
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

BUDGET = 3000  # tokens per lang stratum for cur_token_budget


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# Identical planting expression in Spark SQL and DuckDB SQL: every third
# doc gets ' contact user<id>@example.com ip 10.0.<id%256>.7 tel
# +12-345-<id%10000 lpad 4>' appended.
_PLANT_SPARK = (
    "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' contact user', "
    "CAST(doc_id AS STRING), '@example.com ip 10.0.', "
    "CAST(doc_id % 256 AS STRING), '.7 tel +12-345-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE text END"
)
_PLANT_DUCK = (
    "CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || "
    "CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.7 tel +12-345-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE text END"
)


@query(
    "cur_pii_redact",
    oracle=f"""
    WITH planted AS (SELECT doc_id, {_PLANT_DUCK} AS text FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '{curation.EMAIL_RE}', '<EMAIL>', 'g'),
             '{curation.IPV4_RE}', '<IP>', 'g'),
             '{curation.PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{curation.EMAIL_RE}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{curation.IPV4_RE}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text, '{curation.PHONE_RE}')) AS BIGINT) AS n_phone
    FROM planted
    """,
)
def cur_pii_redact(spark, sf_dir):
    """PII counts + ordered redaction over deterministically planted PII
    (operators/curation.py redact_pii — zero-shuffle codegen stage)."""
    planted = _docs(spark, sf_dir).withColumn("text", F.expr(_PLANT_SPARK))
    return curation.redact_pii(planted)


@query(
    "cur_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g2 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
                 i -> array_to_string(toks[i + 1:i + 2], ' '))) AS gram FROM t),
    g5 AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 4),
                 i -> array_to_string(toks[i + 1:i + 5], ' '))) AS gram FROM t),
    p2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
    p5 AS (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY 1, 2),
    a2 AS (SELECT doc_id, sum(cnt) AS tot2, max(cnt) AS max2 FROM p2 GROUP BY 1),
    a5 AS (SELECT doc_id, sum(cnt) AS tot5, count(*) AS nd5 FROM p5 GROUP BY 1)
    SELECT t.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN tot2 IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST((2 * max2 * 1000000 + tot2) // (2 * tot2) AS BIGINT) END
             AS top2_frac_1e6,
           CASE WHEN tot5 IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST((2 * (tot5 - nd5) * 1000000 + tot5) // (2 * tot5) AS BIGINT) END
             AS dup5_frac_1e6
    FROM t LEFT JOIN a2 USING (doc_id) LEFT JOIN a5 USING (doc_id)
    """,
)
def cur_repetition(spark, sf_dir):
    """Gopher repetition signals: top-2-gram fraction + duplicate-5-gram
    fraction, exact integer rounding (operators/curation.py)."""
    return curation.repetition_stats(_docs(spark, sf_dir))


@query(
    "cur_token_budget",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             {phash_duck("'SMP|' || CAST(doc_id AS VARCHAR)", curation.SAMPLE_SEED)} AS h
      FROM documents
    ),
    b AS (SELECT *, h % {curation.N_BUCKETS} AS bucket FROM d),
    c AS (SELECT *, sum(n_toks) OVER (PARTITION BY lang
                    ORDER BY bucket, h, doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum FROM b)
    SELECT lang, doc_id, n_toks FROM c WHERE cum <= {BUDGET}
    """,
)
def cur_token_budget(spark, sf_dir):
    """Deterministic per-lang token-budget sample. The oracle replays
    the selection contract as ONE per-stratum running sum (fine at
    sf0.01); the Spark plan resolves it at bucket grain with a single
    boundary bucket at doc grain — the shape that survives 100 TB
    (operators/curation.py token_budget_sample)."""
    return curation.token_budget_sample(_docs(spark, sf_dir), BUDGET)


@query(
    "cur_dedup_canonical",
    oracle=None,  # set below: composes the CC transitive-closure CTEs
)
def cur_dedup_canonical(spark, sf_dir):
    """Canonical-copy selection over near-dup clusters: longest text
    wins, doc_id breaks ties — the cluster -> keep decision. Shares the
    exact-transitive-closure oracle prefix with cc_dedup_components
    (including its loud-fail guard: hub-edge routing for over-cap
    buckets is not expressible in the exact oracle)."""
    from hebrew_ner_spark.querydefs.graph_q import _assert_no_overflow

    d = load_table(spark, sf_dir, "documents")
    _assert_no_overflow(d, sf_dir)
    return curation.dedup_canonical(d)


# late-bound: graph_q (which defines the shared CTEs) also imports the
# registry, so pull the constant after both modules exist
from hebrew_ner_spark.querydefs.graph_q import _CC_CTES  # noqa: E402
from hebrew_ner_spark.registry import ORACLES  # noqa: E402

ORACLES["cur_dedup_canonical"] = f"""
    WITH RECURSIVE {_CC_CTES},
    jq AS (
      SELECT c.component_id, c.doc_id, length(d.text) AS n_chars
      FROM comp c JOIN documents d USING (doc_id)
    ),
    rk AS (
      SELECT component_id, doc_id, n_chars,
             row_number() OVER (PARTITION BY component_id
                                ORDER BY n_chars DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY component_id) AS n_members
      FROM jq
    )
    SELECT component_id, doc_id AS keep_doc_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(n_members - 1 AS BIGINT) AS n_dropped
    FROM rk WHERE rk = 1
    """


_BOILER_CTES = f"""
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    gset AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(0, greatest(0, len(toks) - {curation.BOILER_K} + 1)),
               i -> array_to_string(toks[i + 1:i + {curation.BOILER_K}], ' '))))
             AS gram
      FROM t),
    nd AS (SELECT count(*) AS n FROM documents),
    boiler AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS df
      FROM gset, nd GROUP BY gram, nd.n
      HAVING count(*) * {curation.BOILER_DF_DENOM} > nd.n)"""


@query(
    "cur_boilerplate",
    oracle=f"""
    WITH {_BOILER_CTES}
    SELECT gram, df FROM boiler
    """,
)
def cur_boilerplate(spark, sf_dir):
    """Cross-document boilerplate k-gram table (scale-free document-
    frequency threshold, presence-deduped per doc)."""
    return curation.boilerplate_ngrams(_docs(spark, sf_dir))


@query(
    "cur_boiler_fraction",
    oracle=f"""
    WITH {_BOILER_CTES},
    gocc AS (
      SELECT doc_id, unnest(list_transform(
               range(0, greatest(0, len(toks) - {curation.BOILER_K} + 1)),
               i -> array_to_string(toks[i + 1:i + {curation.BOILER_K}], ' ')))
             AS gram
      FROM t),
    j AS (SELECT g.doc_id, CASE WHEN b.gram IS NULL THEN 0 ELSE 1 END AS hit
          FROM gocc g LEFT JOIN boiler b USING (gram)),
    pd AS (SELECT doc_id, count(*) AS n_grams, sum(hit) AS n_boiler
           FROM j GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(pd.n_boiler, 0) AS BIGINT) AS n_boiler,
           CAST(CASE WHEN coalesce(pd.n_grams, 0) = 0 THEN 0 ELSE
             (2 * pd.n_boiler * 1000000 + pd.n_grams) // (2 * pd.n_grams) END
             AS BIGINT) AS boiler_ratio_1e6
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def cur_boiler_fraction(spark, sf_dir):
    """Per-document share of k-gram occurrences covered by the corpus
    boilerplate table — the strip/keep signal."""
    return curation.boilerplate_fraction(_docs(spark, sf_dir))


_SURPRISAL_CTES = """
    tt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
           FROM documents),
    f AS (SELECT token, count(*) AS n FROM tt GROUP BY token),
    tot AS (SELECT sum(n) AS t FROM f),
    dtk AS (SELECT doc_id, token, count(*) AS c FROM tt GROUP BY doc_id, token),
    sc AS (
      SELECT d.doc_id, d.lang,
             CAST((2 * sum(dtk.c * (length(bin(tot.t)) - length(bin(f.n))))
                   * 1000000 + sum(dtk.c)) // (2 * sum(dtk.c)) AS BIGINT)
               AS mean_bits_1e6
      FROM dtk JOIN f USING (token), tot
      JOIN documents d ON d.doc_id = dtk.doc_id
      GROUP BY d.doc_id, d.lang, tot.t)"""


@query(
    "cur_ppl_buckets",
    oracle=f"""
    WITH {_SURPRISAL_CTES},
    hist AS (SELECT lang, mean_bits_1e6 AS v, count(*) AS cnt
             FROM sc GROUP BY 1, 2),
    cum AS (SELECT lang, v,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
                   sum(cnt) OVER (PARTITION BY lang) AS total
            FROM hist),
    th AS (SELECT lang,
                  min(CASE WHEN 100 * cum >= {curation.PPL_HEAD_Q} * total
                           THEN v END) AS p_head,
                  min(CASE WHEN 100 * cum >= {curation.PPL_MID_Q} * total
                           THEN v END) AS p_mid
           FROM cum GROUP BY lang)
    SELECT sc.doc_id, sc.lang, sc.mean_bits_1e6,
           CASE WHEN sc.mean_bits_1e6 <= th.p_head THEN 'head'
                WHEN sc.mean_bits_1e6 <= th.p_mid THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sc JOIN th USING (lang)
    """,
)
def cur_ppl_buckets(spark, sf_dir):
    """CCNet perplexity bucketing: per-language head/middle/tail split
    of the corpus by the exact-integer unigram LM score.

    Non-vacuity note: the synthetic corpus's vocabulary is near-uniform,
    so most docs sit on the 5-bits/token mass point and p33 == p67 —
    'middle' is empty HERE (head + tail both populate; percentile ties
    collapse by percentile_disc semantics). The full 3-way split is
    pinned by the pytest independent replay on a spread corpus
    (tests/test_curation.py)."""
    return curation.perplexity_buckets(_docs(spark, sf_dir))


from hebrew_ner_spark.operators.textstats import quality_pass_sql  # noqa: E402


@query(
    "cur_pipeline",
    oracle=f"""
    WITH {_SURPRISAL_CTES},
    hist AS (SELECT lang, mean_bits_1e6 AS v, count(*) AS cnt
             FROM sc GROUP BY 1, 2),
    cum AS (SELECT lang, v,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
                   sum(cnt) OVER (PARTITION BY lang) AS total
            FROM hist),
    th AS (SELECT lang,
                  min(CASE WHEN 100 * cum >= {curation.PPL_HEAD_Q} * total
                           THEN v END) AS p_head,
                  min(CASE WHEN 100 * cum >= {curation.PPL_MID_Q} * total
                           THEN v END) AS p_mid
           FROM cum GROUP BY lang),
    keepq AS (SELECT doc_id FROM
                (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents)
              WHERE {quality_pass_sql('toks')}),
    surv AS (SELECT doc_id FROM
               (SELECT doc_id, row_number() OVER
                  (PARTITION BY md5(text) ORDER BY doc_id) AS rk
                FROM documents)
             WHERE rk = 1),
    lab AS (SELECT sc.doc_id, sc.lang, sc.mean_bits_1e6,
                   CASE WHEN sc.mean_bits_1e6 <= th.p_head THEN 'head'
                        WHEN sc.mean_bits_1e6 <= th.p_mid THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM sc JOIN th USING (lang))
    SELECT l.doc_id, l.lang, l.mean_bits_1e6, l.bucket
    FROM lab l
    JOIN keepq USING (doc_id)
    JOIN surv USING (doc_id)
    WHERE l.bucket <> 'tail'
    """,
)
def cur_pipeline(spark, sf_dir):
    """The composed curation funnel: quality gate -> exact-dedup
    survivor -> CCNet head+middle perplexity keep (full-corpus
    thresholds — pinned)."""
    return curation.curation_pipeline(_docs(spark, sf_dir))


_CUR_KEPT_CTES = f"""{_SURPRISAL_CTES},
    hist AS (SELECT lang, mean_bits_1e6 AS v, count(*) AS cnt
             FROM sc GROUP BY 1, 2),
    cum AS (SELECT lang, v,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY v) AS cum,
                   sum(cnt) OVER (PARTITION BY lang) AS total
            FROM hist),
    th AS (SELECT lang,
                  min(CASE WHEN 100 * cum >= {curation.PPL_HEAD_Q} * total
                           THEN v END) AS p_head,
                  min(CASE WHEN 100 * cum >= {curation.PPL_MID_Q} * total
                           THEN v END) AS p_mid
           FROM cum GROUP BY lang),
    keepq AS (SELECT doc_id FROM
                (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents)
              WHERE {quality_pass_sql('toks')}),
    surv AS (SELECT doc_id FROM
               (SELECT doc_id, row_number() OVER
                  (PARTITION BY md5(text) ORDER BY doc_id) AS rk
                FROM documents)
             WHERE rk = 1),
    lab AS (SELECT sc.doc_id, sc.lang, sc.mean_bits_1e6,
                   CASE WHEN sc.mean_bits_1e6 <= th.p_head THEN 'head'
                        WHEN sc.mean_bits_1e6 <= th.p_mid THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM sc JOIN th USING (lang)),
    kept AS (SELECT l.doc_id, l.lang, l.bucket
             FROM lab l JOIN keepq USING (doc_id) JOIN surv USING (doc_id)
             WHERE l.bucket <> 'tail')"""


@query(
    "cur_data_card",
    oracle=f"""
    WITH {_CUR_KEPT_CTES},
    ttot AS (SELECT count(*) AS t FROM kept)
    SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
           CAST((2 * count(*) * 1000000 + ttot.t) // (2 * ttot.t) AS BIGINT)
             AS share_1e6
    FROM kept, ttot GROUP BY lang, bucket, ttot.t
    """,
)
def cur_data_card(spark, sf_dir):
    """Corpus composition data card over the curation funnel's kept set:
    per (lang, bucket) document counts and micro-unit shares. (At the
    gated scale every kept doc is 'head' — see cur_ppl_buckets' mass-
    point note; shares still vary per language, which is what hashes.)"""
    return curation.data_card(_docs(spark, sf_dir))


MIX_TARGET = 250  # expected docs in the resampled gate corpus

_MIX_HASH = phash_duck("'mix|' || CAST(doc_id AS VARCHAR)", 0)

# Exact isqrt in DuckDB: float sqrt + integer correction (same CASE the
# Spark side codegens in curation._isqrt_col).
_MIX_SHARES_CTES = f"""
per AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang),
sq AS (SELECT lang, n_docs,
              CAST(floor(sqrt(CAST(n_docs * {curation.MIX_WSCALE} AS DOUBLE))) AS BIGINT) AS s
       FROM per),
w AS (SELECT lang, n_docs,
             CASE WHEN (s + 1) * (s + 1) <= n_docs * {curation.MIX_WSCALE} THEN s + 1
                  WHEN s * s > n_docs * {curation.MIX_WSCALE} THEN s - 1
                  ELSE s END AS weight
      FROM sq),
tot AS (SELECT sum(n_docs) AS _n, sum(weight) AS _w FROM w),
shares AS (
  SELECT lang, n_docs, weight,
         CAST((2 * n_docs * 1000000 + _n) // (2 * _n) AS BIGINT) AS natural_share_1e6,
         CAST((2 * weight * 1000000 + _w) // (2 * _w) AS BIGINT) AS target_share_1e6,
         CAST(least(CAST({curation.MIX_M} AS BIGINT),
                    ({MIX_TARGET} * {curation.MIX_M} * weight) // (_w * n_docs))
              AS BIGINT) AS keep_threshold
  FROM w CROSS JOIN tot
)
"""


@query(
    "cur_mixture_shares",
    oracle=f"WITH {_MIX_SHARES_CTES} SELECT * FROM shares",
)
def cur_mixture_shares(spark, sf_dir):
    """Temperature (alpha=1/2) mixture plan per language stratum:
    integer-exact sqrt weights, target shares, per-stratum keep
    thresholds (operators/curation.py mixture_shares — one count agg
    over a closed stratum set plus broadcast-folded totals)."""
    return curation.mixture_shares(_docs(spark, sf_dir), MIX_TARGET)


@query(
    "cur_mixture_sample",
    oracle=f"""
    WITH {_MIX_SHARES_CTES}
    SELECT doc_id, lang FROM documents JOIN shares USING (lang)
    WHERE {_MIX_HASH} % {curation.MIX_M} < keep_threshold
    """,
)
def cur_mixture_sample(spark, sf_dir):
    """The resampled corpus: documents whose portable keep-hash clears
    their stratum's temperature threshold (operators/curation.py
    mixture_sample — broadcast share join + one codegen comparison,
    deterministic, no RNG state)."""
    return curation.mixture_sample(_docs(spark, sf_dir), MIX_TARGET)


_PASSAGE_HASH = phash_duck("passage", 1)


@query(
    "cur_passage_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    occ AS (
      SELECT doc_id, {_PASSAGE_HASH} AS ph FROM (
        SELECT doc_id,
               unnest(list_transform(range(0, len(toks) // {curation.PASSAGE_LEN}),
                 i -> array_to_string(
                        toks[i * {curation.PASSAGE_LEN} + 1:
                             (i + 1) * {curation.PASSAGE_LEN}], ' '))) AS passage
        FROM t)
    ),
    tot AS (SELECT ph, count(*) AS tot FROM occ GROUP BY ph),
    per AS (
      SELECT doc_id, count(*) AS n_passages,
             sum(CASE WHEN tot > 1 THEN 1 ELSE 0 END) AS n_dup_passages
      FROM occ JOIN tot USING (ph) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(n_passages, 0) AS BIGINT) AS n_passages,
           CAST(coalesce(n_dup_passages, 0) AS BIGINT) AS n_dup_passages,
           CASE WHEN coalesce(n_passages, 0) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((2 * n_dup_passages * 1000000 + n_passages)
                          // (2 * n_passages) AS BIGINT) END AS dup_frac_1e6
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def cur_passage_dedup(spark, sf_dir):
    """Exact duplicated-passage fraction per document: non-overlapping
    10-token windows, corpus-wide occurrence counts (operators/
    curation.py passage_dedup — only int64 hashes shuffle, never text)."""
    return curation.passage_dedup(_docs(spark, sf_dir))


_CDC_BHASH = phash_duck("toks[CAST(i AS INT)]", curation.CDC_SEED)
_CDC_CHASH = phash_duck("chunk", curation.CDC_CHUNK_SEED)


@query(
    "cur_cdc_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    b AS (SELECT doc_id, toks,
            [CAST(0 AS BIGINT)] ||
            list_filter(list_transform(range(1, len(toks) + 1),
              i -> CASE WHEN {_CDC_BHASH} % {curation.CDC_DIVISOR} = 0
                        THEN CAST(i AS BIGINT) ELSE CAST(-1 AS BIGINT) END),
              x -> x >= 0) ||
            [CAST(len(toks) AS BIGINT)] AS bnd
          FROM t),
    c AS (SELECT doc_id,
            unnest(list_filter(list_transform(range(2, len(bnd) + 1),
              j -> CASE WHEN bnd[CAST(j AS INT)] > bnd[CAST(j AS INT) - 1]
                        THEN array_to_string(
                               toks[CAST(bnd[CAST(j AS INT) - 1] + 1 AS INT):
                                    CAST(bnd[CAST(j AS INT)] AS INT)], ' ')
                        ELSE NULL END),
              x -> x IS NOT NULL)) AS chunk
          FROM b),
    occ AS (SELECT doc_id, {_CDC_CHASH} AS ph FROM c),
    tot AS (SELECT ph, count(*) AS tot FROM occ GROUP BY ph),
    per AS (
      SELECT doc_id, count(*) AS n_chunks,
             sum(CASE WHEN tot > 1 THEN 1 ELSE 0 END) AS n_dup_chunks
      FROM occ JOIN tot USING (ph) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(coalesce(n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
           CASE WHEN coalesce(n_chunks, 0) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((2 * n_dup_chunks * 1000000 + n_chunks)
                          // (2 * n_chunks) AS BIGINT) END AS dup_frac_1e6
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def cur_cdc_dedup(spark, sf_dir):
    """Shift-resistant duplicated-chunk fraction over content-defined
    chunks (operators/curation.py cdc_dedup — FastCDC-style boundaries,
    array-side chunking, int64-only shuffles)."""
    return curation.cdc_dedup(_docs(spark, sf_dir))


_DSP_L = curation.DUP_SPAN_L

_DSP_CTES = f"""
    dsp_t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    dsp_g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(toks[CAST(i + 1 AS INT):CAST(i + {_DSP_L} AS INT)], ' ') AS gram
      FROM dsp_t, unnest(range(0, greatest(len(toks) - {_DSP_L} + 1, 0))) AS u(i)),
    dsp_c AS (SELECT gram FROM dsp_g GROUP BY gram HAVING count(*) > 1),
    dsp_f AS (SELECT doc_id, pos FROM dsp_g JOIN dsp_c USING (gram)),
    dsp_r AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       > {_DSP_L} - 1
                  THEN 1 ELSE 0 END AS brk
      FROM dsp_f),
    dsp_grp AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dsp_r),
    dsp_spans AS (
      SELECT doc_id,
             CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + {_DSP_L} - 1 AS BIGINT) AS span_end,
             CAST(max(pos) + {_DSP_L} - min(pos) AS BIGINT) AS span_len,
             CAST(count(*) AS BIGINT) AS n_grams
      FROM dsp_grp GROUP BY doc_id, grp)
"""


@query(
    "cur_dup_spans",
    oracle=f"""
    WITH {_DSP_CTES.strip()}
    SELECT doc_id, span_start, span_end, span_len, n_grams FROM dsp_spans
    """,
)
def cur_dup_spans(spark, sf_dir):
    """Exact duplicated-substring spans (Lee et al. 2022, gram-cover
    formulation): maximal token spans whose every L-gram repeats in the
    corpus — the cut list for substring-grain dedup
    (operators/curation.py dup_spans)."""
    return curation.dup_spans(_docs(spark, sf_dir))


@query(
    "cur_dup_fraction",
    oracle=f"""
    WITH {_DSP_CTES.strip()},
    dsp_cov AS (
      SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_tokens
      FROM dsp_spans GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
           CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST((2 * coalesce(c.dup_tokens, 0) * 1000000
                 + len(string_split(d.text, ' ')))
                // (2 * len(string_split(d.text, ' '))) AS BIGINT) AS dup_1e6
    FROM documents d LEFT JOIN dsp_cov c USING (doc_id)
    """,
)
def cur_dup_fraction(spark, sf_dir):
    """Per-document duplicated-substring token fraction — the
    keep/cut curation signal over cur_dup_spans (operators/curation.py
    dup_span_fraction)."""
    return curation.dup_span_fraction(_docs(spark, sf_dir))


_CHW = curation.CHUNK_W
_CHS = curation.CHUNK_S


@query(
    "cur_chunk_windows",
    oracle=f"""
    WITH chtoks AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    chix AS (
      SELECT doc_id, toks,
             unnest(range(0, CASE WHEN len(toks) <= {_CHW} THEN 1
                               ELSE (len(toks) - {_CHW} + {_CHS} - 1) // {_CHS} + 1 END)) AS i
      FROM chtoks
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {_CHS} AS BIGINT) AS start,
           CAST(len(toks[i * {_CHS} + 1 : i * {_CHS} + {_CHW}]) AS BIGINT) AS n_tokens,
           array_to_string(toks[i * {_CHS} + 1 : i * {_CHS} + {_CHW}], ' ') AS chunk
    FROM chix
    """,
)
def cur_chunk_windows(spark, sf_dir):
    """Overlapping retrieval chunks (w tokens every s, tail kept): the
    RAG prep stage — total coverage, closed-form chunk count, zero
    shuffles. DuckDB replays with 1-based end-inclusive list slices."""
    return curation.chunk_windows(_docs(spark, sf_dir))


# Curation x KG bridge: triple occurrences flagged against the dup-span
# cut list. Occurrence triples replay via lag/lead (the kg_edges oracle
# construction); containment resolves through a correlated EXISTS —
# the opposite route from Spark's left-range-join + max-flag. CTE names
# are tds-prefixed.
from hebrew_ner_spark.resources import ENTITY_TERMS, PREDICATE_TERMS  # noqa: E402

_TDS_ENTS = "(" + ", ".join(f"'{t}'" for t in sorted(ENTITY_TERMS)) + ")"
_TDS_PREDS = "(" + ", ".join(f"'{t}'" for t in PREDICATE_TERMS) + ")"

_TDS_CTES = f"""
    tds_toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS wi,
             unnest(string_split(text, ' ')) AS token
      FROM documents),
    tds_w AS (
      SELECT doc_id, wi, token,
             lag(token)  OVER (PARTITION BY doc_id ORDER BY wi) AS subj,
             lead(token) OVER (PARTITION BY doc_id ORDER BY wi) AS obj
      FROM tds_toks),
    tds_tr AS (
      SELECT doc_id, CAST(wi AS BIGINT) AS word_index, subj, token AS pred, obj
      FROM tds_w
      WHERE token IN {_TDS_PREDS} AND subj IN {_TDS_ENTS} AND obj IN {_TDS_ENTS}),
    tds_fl AS (
      SELECT t.doc_id, t.word_index, t.subj, t.pred, t.obj,
             CAST(CASE WHEN EXISTS (
               SELECT 1 FROM dsp_spans s
               WHERE s.doc_id = t.doc_id
                 AND s.span_start <= t.word_index - 1
                 AND t.word_index + 1 <= s.span_end) THEN 1 ELSE 0 END
             AS BIGINT) AS in_dup
      FROM tds_tr t)
"""


@query(
    "kg_triples_dup_flag",
    oracle=f"""
    WITH {_DSP_CTES.strip()},
    {_TDS_CTES.strip()}
    SELECT doc_id, word_index, subj, pred, obj, in_dup FROM tds_fl
    """,
)
def kg_triples_dup_flag(spark, sf_dir):
    """Triple occurrences flagged when their token window sits inside a
    corpus-duplicated substring span — boilerplate facts must not count
    as independent evidence."""
    return curation.triples_in_dup_spans(_docs(spark, sf_dir))


@query(
    "kg_pred_dup_share",
    oracle=f"""
    WITH {_DSP_CTES.strip()},
    {_TDS_CTES.strip()}
    SELECT pred, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(sum(in_dup) AS BIGINT) AS n_dup,
           CAST((2 * 1000000 * sum(in_dup) + count(*))
                // (2 * count(*)) AS BIGINT) AS dup_share_1e6
    FROM tds_fl GROUP BY pred
    """,
)
def kg_pred_dup_share(spark, sf_dir):
    """Per-predicate duplicated-evidence share in micro-units — the
    fact-fusion discount table."""
    return curation.pred_dup_evidence(_docs(spark, sf_dir))


@query(
    "cur_dedup_quality",
    oracle=None,  # set below: CC closure CTEs + the quality-LR replay
)
def cur_dedup_quality(spark, sf_dir):
    """Quality-priority survivor selection: the cluster member with the
    highest quality_lr score survives (argmax fold, no window sort)."""
    from hebrew_ner_spark.querydefs.graph_q import _assert_no_overflow

    d = load_table(spark, sf_dir, "documents")
    _assert_no_overflow(d, sf_dir)
    return curation.dedup_quality_priority(d)


from hebrew_ner_spark.functions.hashing import phash_duck as _dq_phash  # noqa: E402
from hebrew_ner_spark.operators import training as _dq_training  # noqa: E402

_DQ_H = _dq_phash("t.token", 0)
_DQ_W = _dq_phash(
    f"CAST({_DQ_H} % {_dq_training.FEATURE_BUCKETS} AS VARCHAR)",
    _dq_training.LR_SEED,
)

ORACLES["cur_dedup_quality"] = f"""
    WITH RECURSIVE {_CC_CTES},
    dq_t AS (
      SELECT doc_id, {_DQ_W} % 1000000 - 500000 AS w
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS token) t
      WHERE t.token <> ''
    ),
    dq_s AS (
      SELECT doc_id,
             CAST(FLOOR((2 * sum(w) + count(*)) / (2.0 * count(*))) AS BIGINT)
               AS score_1e6
      FROM dq_t GROUP BY doc_id
    ),
    dq_j AS (
      SELECT c.component_id, c.doc_id, s.score_1e6
      FROM comp c JOIN dq_s s USING (doc_id)
    ),
    dq_r AS (
      SELECT component_id, doc_id, score_1e6,
             row_number() OVER (PARTITION BY component_id
                                ORDER BY score_1e6 DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY component_id) AS n_members
      FROM dq_j
    )
    SELECT component_id, doc_id AS keep_doc_id,
           CAST(score_1e6 AS BIGINT) AS keep_score_1e6,
           CAST(n_members AS BIGINT) AS n_members
    FROM dq_r WHERE rk = 1
    """


# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/curation.py dsir_*)
# ---------------------------------------------------------------------------

_DSIR_TGT = ", ".join(f"'{s}'" for s in curation.DSIR_TARGET_SRC)

# hashed unigram+bigram bucket counts per doc — the shared feature CTE
_DSIR_FEATS = f"""
    SELECT doc_id,
           {phash_duck("gram", curation.DSIR_SEED)} % {curation.DSIR_B} AS f,
           CAST(count(*) AS BIGINT) AS c
    FROM (
      SELECT doc_id, unnest(toks) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      UNION ALL
      SELECT doc_id, toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           unnest(range(1, len(toks))) AS u(i)
    )
    GROUP BY 1, 2
"""

_DSIR_LUT = f"""
    SELECT f,
           CAST(1 + coalesce(sum(CASE WHEN source IN ({_DSIR_TGT})
                                      THEN c END), 0) AS BIGINT) AS tp,
           CAST(1 + sum(c) AS BIGINT) AS tq
    FROM feats JOIN documents USING (doc_id)
    GROUP BY f
"""

_DSIR_SCORES = """
    SELECT f, tp, tq,
           CAST((length(bin(tp)) - length(bin(_tp)))
                - (length(bin(tq)) - length(bin(_tq))) AS BIGINT) AS score_bits
    FROM lut CROSS JOIN
         (SELECT CAST(sum(tp) AS BIGINT) AS _tp,
                 CAST(sum(tq) AS BIGINT) AS _tq FROM lut) tot
"""

_DSIR_WEIGHTS = """
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_feats,
           CAST(sum(c * score_bits) AS BIGINT) AS weight_bits
    FROM feats JOIN scores USING (f)
    GROUP BY doc_id
"""


@query(
    "cur_dsir_lut",
    oracle=f"""
    WITH feats AS ({_DSIR_FEATS}),
    lut AS ({_DSIR_LUT})
    {_DSIR_SCORES}
    """,
)
def cur_dsir_lut(spark, sf_dir):
    """The B-row hashed-ngram importance LUT (target vs corpus counts +
    integer log2-ratio score) — the entire model state DSIR broadcasts
    to score 10^12 docs."""
    return curation.dsir_scores(_docs(spark, sf_dir))


@query(
    "cur_dsir_sample",
    oracle=f"""
    WITH feats AS ({_DSIR_FEATS}),
    lut AS ({_DSIR_LUT}),
    scores AS ({_DSIR_SCORES}),
    w AS ({_DSIR_WEIGHTS}),
    mw AS (
      SELECT doc_id,
             (2 * weight_bits * 1000000
              + CASE WHEN weight_bits >= 0 THEN n_feats ELSE -n_feats END)
             // (2 * n_feats) AS mean_wbits_1e6
      FROM w),
    hist AS (SELECT mean_wbits_1e6 AS v, count(*) AS cnt FROM mw GROUP BY 1),
    cum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
                   sum(cnt) OVER () AS total FROM hist),
    th AS (SELECT min(v) AS _th FROM cum
           WHERE 100 * cum >= {curation.DSIR_KEEP_Q} * total)
    SELECT doc_id, CAST(mean_wbits_1e6 AS BIGINT) AS mean_wbits_1e6,
           CAST(mean_wbits_1e6 >= _th AS BIGINT) AS keep
    FROM mw CROSS JOIN th
    """,
)
def cur_dsir_sample(spark, sf_dir):
    """Per-doc DSIR keep decision: mean importance micro-bits vs the
    exact corpus percentile_disc(75) threshold. keep=1 rows are the
    target-domain-like quartile the resampler retains."""
    return curation.dsir_sample(_docs(spark, sf_dir))
