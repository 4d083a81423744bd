"""Label-algebra queries + DuckDB oracles: morph refinement, P10/P11,
tag-scheme converters, alphabet encoding, evaluation metrics.

The crown jewels here are the two P10 round-trips:
  * ``lbl_single_roundtrip`` — refine token labels over morphemes, merge
    with '^', validate back -> must reproduce the token labels exactly;
  * ``lbl_single_relaxed`` — same but with the morpheme sequence reversed,
    driving the reference's relaxed fallback *and* its
    valid-but-unclassifiable '' + '-CAT' quirk, which the oracle encodes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg, labels
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS, EVAL_GOLD_ENTITY_TERMS, MORPH_SPLITS
from hebrew_ner_spark.sources.catalog import load_table


def _ents_sql(terms):
    return "(" + ", ".join(f"'{t}'" for t in terms) + ")"


_TOKS_CTE = """
toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
         unnest(string_split(text, ' ')) AS token
  FROM documents
)
"""


def _lbl_cte(terms, name="lbl"):
    """Window-based BIOSE labelling CTE for an entity list."""
    e = _ents_sql(terms)
    return f"""
{name} AS (
  SELECT doc_id, word_index, token,
         CASE WHEN NOT is_ent THEN 'O'
              WHEN NOT prev_ent AND NOT next_ent THEN 'S-TERM'
              WHEN NOT prev_ent THEN 'B-TERM'
              WHEN NOT next_ent THEN 'E-TERM'
              ELSE 'I-TERM' END AS label
  FROM (
    SELECT doc_id, word_index, token,
           token IN {e} AS is_ent,
           coalesce(lag(token)  OVER w IN {e}, FALSE) AS prev_ent,
           coalesce(lead(token) OVER w IN {e}, FALSE) AS next_ent
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY word_index)
  )
)
"""


_MORPH_CASE = (
    "CASE token "
    + " ".join(
        f"WHEN '{tok}' THEN {[m for m in morphs]}".replace('"', "'")
        for tok, morphs in MORPH_SPLITS.items()
    )
    + " ELSE [token] END"
)

_M_CTE = f"m AS (SELECT doc_id, word_index, token, {_MORPH_CASE} AS morphs FROM toks)"

# Positional BIOSE refinement of (label, k) as a DuckDB list expression —
# identical semantics to operators/labels.morph_labels.
_REFINED = """
CASE WHEN len(morphs) = 1 OR label NOT LIKE '%-%'
       THEN list_transform(range(len(morphs)), i -> label)
     WHEN label LIKE 'S-%' THEN list_transform(range(len(morphs)), i ->
       CASE WHEN i = 0 THEN 'B-' || substr(label, 3)
            WHEN i = len(morphs) - 1 THEN 'E-' || substr(label, 3)
            ELSE 'I-' || substr(label, 3) END)
     WHEN label LIKE 'B-%' THEN list_transform(range(len(morphs)), i ->
       CASE WHEN i = 0 THEN label ELSE 'I-' || substr(label, 3) END)
     WHEN label LIKE 'E-%' THEN list_transform(range(len(morphs)), i ->
       CASE WHEN i = len(morphs) - 1 THEN label ELSE 'I-' || substr(label, 3) END)
     ELSE list_transform(range(len(morphs)), i -> label)
END
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query(
    "lbl_morphemes",
    oracle=f"""
    WITH {_TOKS_CTE}, {_M_CTE}
    SELECT doc_id, word_index,
           CAST(generate_subscripts(morphs, 1) - 1 AS BIGINT) AS morph_index,
           unnest(morphs) AS morpheme
    FROM m
    """,
)
def lbl_morphemes(spark, sf_dir):
    """Deterministic morphological segmentation (MD-lattice analog)."""
    return labels.morphemes(_docs(spark, sf_dir))


@query(
    "lbl_morph_labels",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS)},
    mm AS (SELECT l.doc_id, l.word_index, l.label, {_MORPH_CASE} AS morphs
           FROM lbl l),
    r AS (SELECT doc_id, word_index, morphs, {_REFINED} AS refined FROM mm)
    SELECT doc_id, word_index,
           CAST(generate_subscripts(morphs, 1) - 1 AS BIGINT) AS morph_index,
           unnest(morphs) AS morpheme,
           unnest(refined) AS mlabel
    FROM r
    """,
)
def lbl_morph_labels(spark, sf_dir):
    """Morpheme-level BIOSE refinement of token labels."""
    return labels.morph_labels(_docs(spark, sf_dir))


@query(
    "lbl_multi_merged",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS)},
    mm AS (SELECT l.doc_id, l.word_index, l.label, {_MORPH_CASE} AS morphs
           FROM lbl l)
    SELECT doc_id, word_index,
           array_to_string(morphs, '^') AS merged_word,
           array_to_string({_REFINED}, '^') AS multi_label
    FROM mm
    """,
)
def lbl_multi_merged(spark, sf_dir):
    """J2+A4 origins merge: morpheme rows -> '^'-joined token rows."""
    return labels.merge_morph_to_token(labels.morph_labels(_docs(spark, sf_dir)))


@query(
    "lbl_single_roundtrip",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS)}
    SELECT doc_id, word_index, label FROM lbl
    """,
)
def lbl_single_roundtrip(spark, sf_dir):
    """P10 over valid sequences: refine -> merge -> validate == original."""
    merged = labels.merge_morph_to_token(labels.morph_labels(_docs(spark, sf_dir)))
    return merged.select(
        "doc_id", "word_index", labels.validate_multi_udf("multi_label").alias("label")
    )


@query(
    "lbl_single_relaxed",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS)},
    mm AS (SELECT l.doc_id, l.word_index, l.label, len({_MORPH_CASE}) AS k
           FROM lbl l)
    SELECT doc_id, word_index,
           CASE WHEN k = 1 THEN label
                WHEN label = 'O' THEN 'O'
                WHEN label LIKE 'I-%' THEN label
                ELSE '-' || substr(label, 3) END AS label
    FROM mm
    """,
)
def lbl_single_relaxed(spark, sf_dir):
    """P10 over *reversed* morpheme sequences: exercises the unanchored
    validity quirk — reversed S/B/E refinements collapse to the bare
    '-TERM' label exactly as the reference would emit."""
    merged = labels.merge_morph_to_token(
        labels.morph_labels(_docs(spark, sf_dir)), reverse=True
    )
    return merged.select(
        "doc_id", "word_index", labels.validate_multi_udf("multi_label").alias("label")
    )


@query(
    "lbl_splitting",
    oracle=f"""
    WITH {_TOKS_CTE}, {_M_CTE}
    SELECT doc_id, word_index, CAST(len(morphs) AS BIGINT) AS splitting FROM m
    """,
)
def lbl_splitting(spark, sf_dir):
    """P11: morpheme count from the '^'-joined label."""
    merged = labels.merge_morph_to_token(labels.morph_labels(_docs(spark, sf_dir)))
    return labels.splitting(merged)


@query(
    "lbl_bioes_to_bio",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS)}
    SELECT doc_id, word_index, token,
           CASE WHEN label LIKE 'S-%' THEN 'B-' || substr(label, 3)
                WHEN label LIKE 'E-%' THEN 'I-' || substr(label, 3)
                ELSE label END AS label
    FROM lbl
    """,
)
def lbl_bioes_to_bio(spark, sf_dir):
    return labels.bioes_to_bio_df(kg.doc_token_labels(_docs(spark, sf_dir)))


@query(
    "lbl_bio_roundtrip",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS)}
    SELECT doc_id, word_index, token, label FROM lbl
    """,
)
def lbl_bio_roundtrip(spark, sf_dir):
    """E9 round-trip: BIOES -> BIO -> BIOES must be the identity (gazetteer
    runs are maximal, so every B/I decision is recoverable from lead())."""
    bio = labels.bioes_to_bio_df(kg.doc_token_labels(_docs(spark, sf_dir)))
    return labels.bio_to_bioes_df(bio)


@query(
    "lbl_alphabet_encode",
    oracle=f"""
    WITH {_TOKS_CTE},
    v AS (
      SELECT token, CAST(row_number() OVER (ORDER BY token) AS BIGINT) AS token_id
      FROM (SELECT DISTINCT token FROM toks WHERE doc_id % 2 = 0)
    )
    SELECT t.doc_id, t.word_index, t.token, coalesce(v.token_id, 0) AS token_id
    FROM toks t LEFT JOIN v USING (token)
    """,
)
def lbl_alphabet_encode(spark, sf_dir):
    """J6 dictionary encode: vocab from even doc_ids, unk=0 on miss."""
    return labels.alphabet_encode(_docs(spark, sf_dir))


@query(
    "lbl_spans_window",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS)},
    flagged AS (
      SELECT doc_id, word_index, label,
             sum(CASE WHEN label LIKE 'B-%' OR label LIKE 'S-%' THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id
      FROM lbl
    )
    SELECT doc_id, substr(min(label), 3) AS cat,
           min(word_index) AS lo, max(word_index) AS hi
    FROM flagged WHERE label <> 'O'
    GROUP BY doc_id, span_id
    """,
)
def lbl_spans_window(spark, sf_dir):
    """P12 window variant — must agree with the array-side kg_mention_spans."""
    return labels.spans_from_labels(kg.doc_token_labels(_docs(spark, sf_dir)))


@query(
    "eval_token_accuracy",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS, 'p')}, {_lbl_cte(EVAL_GOLD_ENTITY_TERMS, 'g')}
    SELECT count(*) AS n_tokens,
           CAST(sum(CASE WHEN p.label = g.label THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           CAST((2 * (sum(CASE WHEN p.label = g.label THEN 1 ELSE 0 END)) * 1000000 + (count(*))) // (2 * (count(*))) AS BIGINT)
             AS accuracy_1e6
    FROM p JOIN g USING (doc_id, word_index)
    """,
)
def eval_token_accuracy(spark, sf_dir):
    """A7/E1: token accuracy of the full gazetteer vs the reduced 'gold'."""
    d = _docs(spark, sf_dir)
    return labels.token_accuracy(
        kg.doc_token_labels(d), kg.doc_token_labels(d, EVAL_GOLD_ENTITY_TERMS)
    )


@query(
    "eval_span_prf",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS, 'p')}, {_lbl_cte(EVAL_GOLD_ENTITY_TERMS, 'g')},
    ps AS (
      SELECT doc_id, substr(min(label), 3) AS cat, min(word_index) AS lo, max(word_index) AS hi
      FROM (SELECT *, sum(CASE WHEN label LIKE 'B-%' OR label LIKE 'S-%' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id FROM p)
      WHERE label <> 'O' GROUP BY doc_id, span_id
    ),
    gs AS (
      SELECT doc_id, substr(min(label), 3) AS cat, min(word_index) AS lo, max(word_index) AS hi
      FROM (SELECT *, sum(CASE WHEN label LIKE 'B-%' OR label LIKE 'S-%' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id FROM g)
      WHERE label <> 'O' GROUP BY doc_id, span_id
    ),
    c AS (SELECT count(*) AS n_correct FROM ps JOIN gs USING (doc_id, cat, lo, hi)),
    sizes AS (SELECT (SELECT count(*) FROM ps) AS n_pred,
                     (SELECT count(*) FROM gs) AS n_gold,
                     (SELECT n_correct FROM c) AS n_correct)
    SELECT CAST(n_pred AS BIGINT) AS n_pred, CAST(n_gold AS BIGINT) AS n_gold,
           CAST(n_correct AS BIGINT) AS n_correct,
           CASE WHEN n_pred = 0 THEN CAST(0 AS BIGINT) ELSE
             CAST(floor((CAST(n_correct AS DOUBLE) / n_pred) * 1000000.0 + 0.5) AS BIGINT) END AS p_1e6,
           CASE WHEN n_gold = 0 THEN CAST(0 AS BIGINT) ELSE
             CAST(floor((CAST(n_correct AS DOUBLE) / n_gold) * 1000000.0 + 0.5) AS BIGINT) END AS r_1e6,
           CASE WHEN n_pred = 0 OR n_gold = 0 OR n_correct = 0 THEN CAST(0 AS BIGINT) ELSE
             CAST(floor(2.0 * (CAST(n_correct AS DOUBLE) / n_pred) * (CAST(n_correct AS DOUBLE) / n_gold)
                        / (CAST(n_correct AS DOUBLE) / n_pred + CAST(n_correct AS DOUBLE) / n_gold) * 1000000.0 + 0.5) AS BIGINT) END
             AS f1_1e6
    FROM sizes
    """,
)
def eval_span_prf(spark, sf_dir):
    """A8/J5: micro span P/R/F of full vs reduced gazetteer spans."""
    d = _docs(spark, sf_dir)
    pred = labels.spans_from_labels(kg.doc_token_labels(d))
    gold = labels.spans_from_labels(kg.doc_token_labels(d, EVAL_GOLD_ENTITY_TERMS))
    return labels.span_prf(pred, gold)


@query(
    "eval_span_prf_by_doc",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS, 'p')}, {_lbl_cte(EVAL_GOLD_ENTITY_TERMS, 'g')},
    ps AS (
      SELECT doc_id, substr(min(label), 3) AS cat, min(word_index) AS lo, max(word_index) AS hi
      FROM (SELECT *, sum(CASE WHEN label LIKE 'B-%' OR label LIKE 'S-%' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id FROM p)
      WHERE label <> 'O' GROUP BY doc_id, span_id
    ),
    gs AS (
      SELECT doc_id, substr(min(label), 3) AS cat, min(word_index) AS lo, max(word_index) AS hi
      FROM (SELECT *, sum(CASE WHEN label LIKE 'B-%' OR label LIKE 'S-%' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id FROM g)
      WHERE label <> 'O' GROUP BY doc_id, span_id
    ),
    np AS (SELECT doc_id, count(*) AS n_pred FROM ps GROUP BY doc_id),
    ng AS (SELECT doc_id, count(*) AS n_gold FROM gs GROUP BY doc_id),
    nc AS (SELECT ps.doc_id, count(*) AS n_correct
           FROM ps JOIN gs ON ps.doc_id = gs.doc_id AND ps.cat = gs.cat
                          AND ps.lo = gs.lo AND ps.hi = gs.hi
           GROUP BY ps.doc_id)
    SELECT np.doc_id, np.n_pred,
           coalesce(ng.n_gold, 0) AS n_gold,
           coalesce(nc.n_correct, 0) AS n_correct
    FROM np
    LEFT JOIN ng ON np.doc_id = ng.doc_id
    LEFT JOIN nc ON np.doc_id = nc.doc_id
    """,
)
def eval_span_prf_by_doc(spark, sf_dir):
    """E2 nested evaluation: per-document span-match counts (the
    reference's per-sentence variant, ner.py:497-536, at document grain).
    Global micro P/R/F is one further aggregate over this table."""
    d = _docs(spark, sf_dir)
    pred = labels.spans_from_labels(kg.doc_token_labels(d))
    gold = labels.spans_from_labels(kg.doc_token_labels(d, EVAL_GOLD_ENTITY_TERMS))
    keys = ["doc_id", "cat", "lo", "hi"]
    np_ = pred.groupBy("doc_id").agg(F.count("*").alias("n_pred"))
    ng = gold.groupBy("doc_id").agg(F.count("*").alias("n_gold"))
    nc = (
        pred.join(gold, keys, "inner")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_correct"))
    )
    return (
        np_.join(ng, "doc_id", "left")
        .join(nc, "doc_id", "left")
        .select(
            "doc_id",
            "n_pred",
            F.coalesce("n_gold", F.lit(0)).cast("long").alias("n_gold"),
            F.coalesce("n_correct", F.lit(0)).cast("long").alias("n_correct"),
        )
    )


# ---------------------------------------------------------------------------
# E6 proper: bootstrap CI at span-F1 grain (utils/eval/conf_interval.py:17-31
# resamples sentences and recomputes F1 per replica; here documents are the
# resampling unit, the weight is the deterministic phash(doc:replica) % 3).
# ---------------------------------------------------------------------------

_B = labels.BOOTSTRAP_F1_B

_SPANS_CTES = f"""
ps AS (
  SELECT doc_id, substr(min(label), 3) AS cat, min(word_index) AS lo, max(word_index) AS hi
  FROM (SELECT *, sum(CASE WHEN label LIKE 'B-%' OR label LIKE 'S-%' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id FROM p)
  WHERE label <> 'O' GROUP BY doc_id, span_id
),
gs AS (
  SELECT doc_id, substr(min(label), 3) AS cat, min(word_index) AS lo, max(word_index) AS hi
  FROM (SELECT *, sum(CASE WHEN label LIKE 'B-%' OR label LIKE 'S-%' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id FROM g)
  WHERE label <> 'O' GROUP BY doc_id, span_id
),
np AS (SELECT doc_id, count(*) AS n_pred FROM ps GROUP BY doc_id),
ng AS (SELECT doc_id, count(*) AS n_gold FROM gs GROUP BY doc_id),
nc AS (SELECT ps.doc_id, count(*) AS n_correct
       FROM ps JOIN gs ON ps.doc_id = gs.doc_id AND ps.cat = gs.cat
                      AND ps.lo = gs.lo AND ps.hi = gs.hi
       GROUP BY ps.doc_id),
dc AS (
  SELECT coalesce(np.doc_id, ng.doc_id) AS doc_id,
         coalesce(n_pred, 0) AS n_pred,
         coalesce(n_gold, 0) AS n_gold,
         coalesce(n_correct, 0) AS n_correct
  FROM np FULL JOIN ng ON np.doc_id = ng.doc_id
  LEFT JOIN nc ON coalesce(np.doc_id, ng.doc_id) = nc.doc_id
),
wgt AS (
  SELECT doc_id, n_pred, n_gold, n_correct, replica,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
              CAST(replica AS VARCHAR)), 1, 15)) AS BIGINT) % 3 AS w
  FROM dc CROSS JOIN (SELECT unnest(range(0, {_B})) AS replica)
),
boot AS (
  SELECT CAST(replica AS BIGINT) AS replica,
         CAST(sum(w * n_pred) AS BIGINT) AS n_pred_w,
         CAST(sum(w * n_gold) AS BIGINT) AS n_gold_w,
         CAST(sum(w * n_correct) AS BIGINT) AS n_correct_w,
         CASE WHEN sum(w * n_pred) + sum(w * n_gold) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(floor(2.0 * CAST(sum(w * n_correct) AS DOUBLE)
                   / (sum(w * n_pred) + sum(w * n_gold)) * 1000000.0 + 0.5) AS BIGINT)
         END AS f1_1e6
  FROM wgt GROUP BY replica
)
"""


def _doc_counts(spark, sf_dir):
    d = _docs(spark, sf_dir)
    pred = labels.spans_from_labels(kg.doc_token_labels(d))
    gold = labels.spans_from_labels(kg.doc_token_labels(d, EVAL_GOLD_ENTITY_TERMS))
    return labels.span_counts_by_doc(pred, gold)


@query(
    "eval_f1_bootstrap",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS, 'p')}, {_lbl_cte(EVAL_GOLD_ENTITY_TERMS, 'g')},
    {_SPANS_CTES.strip()}
    SELECT replica, n_pred_w, n_gold_w, n_correct_w, f1_1e6 FROM boot
    """,
)
def eval_f1_bootstrap(spark, sf_dir):
    """E6 at span-F1 grain: 32 deterministic document-resampled replicas,
    each with its weighted counts and exact micro F1."""
    return labels.bootstrap_span_f1(_doc_counts(spark, sf_dir))


@query(
    "eval_f1_bootstrap_ci",
    oracle=f"""
    WITH {_TOKS_CTE}, {_lbl_cte(ENTITY_TERMS, 'p')}, {_lbl_cte(EVAL_GOLD_ENTITY_TERMS, 'g')},
    {_SPANS_CTES.strip()},
    ranked AS (
      SELECT f1_1e6, replica,
             row_number() OVER (ORDER BY f1_1e6 ASC, replica ASC) AS rk
      FROM boot
    ),
    pt AS (
      SELECT CASE WHEN sum(n_pred) + sum(n_gold) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(2.0 * CAST(sum(n_correct) AS DOUBLE)
                       / (sum(n_pred) + sum(n_gold)) * 1000000.0 + 0.5) AS BIGINT)
             END AS f1_point_1e6
      FROM dc
    )
    SELECT CAST(max(CASE WHEN rk = 2 THEN f1_1e6 END) AS BIGINT) AS f1_lo_1e6,
           CAST(max(CASE WHEN rk = {_B} - 1 THEN f1_1e6 END) AS BIGINT) AS f1_hi_1e6,
           CAST(count(*) AS BIGINT) AS n_replicas,
           (SELECT f1_point_1e6 FROM pt) AS f1_point_1e6
    FROM ranked
    """,
)
def eval_f1_bootstrap_ci(spark, sf_dir):
    """Percentile CI by exact order statistics over the replica F1s
    (2nd smallest / 2nd largest of 32) plus the point estimate — the
    artifact conf_interval.py reports for a model comparison."""
    return labels.bootstrap_span_f1_ci(_doc_counts(spark, sf_dir))
