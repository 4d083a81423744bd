"""Model-inference-stage queries: the mapInPandas labeller must reproduce
the JVM-side gazetteer labels bit for bit (same oracle as
kg_token_labels), proving the batchify/sort/pad/decode/recover plumbing
is permutation-safe."""

from __future__ import annotations

from hebrew_ner_spark.operators import mentions
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_ENTS_SQL = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"

_LABELS_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    lbl AS (
      SELECT doc_id, word_index, token,
             token IN {_ENTS_SQL} AS is_ent,
             coalesce(lag(token)  OVER w IN {_ENTS_SQL}, FALSE) AS prev_ent,
             coalesce(lead(token) OVER w IN {_ENTS_SQL}, FALSE) AS next_ent
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY word_index)
    )
    SELECT doc_id, word_index, token,
           CASE WHEN NOT is_ent THEN 'O'
                WHEN NOT prev_ent AND NOT next_ent THEN 'S-TERM'
                WHEN NOT prev_ent THEN 'B-TERM'
                WHEN NOT next_ent THEN 'E-TERM'
                ELSE 'I-TERM' END AS label
    FROM lbl
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@query("mention_model_labels", oracle=_LABELS_ORACLE)
def mention_model_labels(spark, sf_dir):
    """M9 chain as mapInPandas (singleton model, micro-batched decode)."""
    return mentions.detect_mentions(_docs(spark, sf_dir))


@query("mention_model_binned", oracle=_LABELS_ORACLE)
def mention_model_binned(spark, sf_dir):
    """Same with repartitionByRange length binning (O1 physical choice)."""
    return mentions.detect_mentions_length_binned(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Real CRF decoding gates (M7 Viterbi / M8 k-best, model/crf.py:104-437).
#
# The oracle is brute-force: every 5^T label path of each short sentence is
# enumerated and scored with the same hash-seeded integer weights, then
# ranked by (score DESC, front-lexicographic label sequence ASC) — the
# beam DP must reproduce the exhaustive ranking exactly, ties included.
# Sentences are the first N_CRF_TOKENS tokens of the first N_CRF_DOCS docs
# (slice declared identically on both engines) so enumeration stays at
# 5^5 = 3,125 paths/doc.
# ---------------------------------------------------------------------------

from hebrew_ner_spark.operators import crf as crf_op  # noqa: E402

N_CRF_DOCS = 120
N_CRF_TOKENS = 5

_NAMES_SQL = "[" + ",".join(f"'{l}'" for l in crf_op.LABELS) + "]"


def _ph(s: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5({s} || ':0'), 1, 15)) AS BIGINT)"
        f" % {crf_op.SCORE_MOD}"
    )


_CRF_SCORED_CTE = f"""
d AS (
  SELECT doc_id, string_split(text, ' ')[1:{N_CRF_TOKENS}] AS toks
  FROM documents WHERE doc_id < {N_CRF_DOCS}
),
paths AS (
  SELECT doc_id, toks, len(toks) AS tlen, CAST(p AS BIGINT) AS p
  FROM d, LATERAL (SELECT unnest(range(0, CAST(pow(5, len(toks)) AS BIGINT))) AS p)
),
lab AS (
  SELECT doc_id, toks, tlen, p,
         list_transform(range(0, tlen),
           t -> CAST((p // CAST(pow(5, t) AS BIGINT)) % 5 AS BIGINT)) AS li
  FROM paths
),
scored AS (
  SELECT doc_id, toks, tlen, li, p,
         {_ph(f"'S|' || {_NAMES_SQL}[li[1] + 1]")}
         + {_ph(f"'F|' || {_NAMES_SQL}[li[tlen] + 1]")}
         + list_sum(list_transform(range(0, tlen),
             t -> {_ph(f"'E|' || toks[t + 1] || '|' || {_NAMES_SQL}[li[t + 1] + 1]")}))
         + CASE WHEN tlen > 1 THEN list_sum(list_transform(range(1, tlen),
             t -> {_ph(f"'T|' || {_NAMES_SQL}[li[t] + 1] || '|' || {_NAMES_SQL}[li[t + 1] + 1]")}))
           ELSE 0 END AS score,
         list_sum(list_transform(range(0, tlen),
           t -> li[t + 1] * CAST(pow(5, tlen - 1 - t) AS BIGINT))) AS lexkey
  FROM lab
),
ranked AS (
  SELECT doc_id, toks, tlen, li, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lexkey ASC) AS r
  FROM scored
)
"""


def _short_toks(spark, sf_dir):
    from pyspark.sql import functions as F

    return (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < N_CRF_DOCS)
        .select(
            "doc_id",
            F.slice(F.split("text", " "), 1, N_CRF_TOKENS).alias("toks"),
        )
    )


@query(
    "mention_model_viterbi",
    oracle=f"""
    WITH {_CRF_SCORED_CTE}
    SELECT doc_id, CAST(pos AS BIGINT) AS word_index, toks[pos + 1] AS token,
           {_NAMES_SQL}[li[pos + 1] + 1] AS label
    FROM ranked, LATERAL (SELECT unnest(range(0, tlen)) AS pos)
    WHERE r = 1
    """,
)
def mention_model_viterbi(spark, sf_dir):
    """M7 for real: exact 1-best Viterbi under the seeded non-trivial
    transition matrix, verified against exhaustive path enumeration."""
    return crf_op.viterbi_labels(_short_toks(spark, sf_dir))


@query(
    "mention_model_nbest",
    oracle=f"""
    WITH {_CRF_SCORED_CTE}
    SELECT doc_id, r AS rank, CAST(pos AS BIGINT) AS word_index,
           toks[pos + 1] AS token, {_NAMES_SQL}[li[pos + 1] + 1] AS label,
           CAST(score AS BIGINT) AS path_score
    FROM ranked, LATERAL (SELECT unnest(range(0, tlen)) AS pos)
    WHERE r <= {crf_op.NBEST_K}
    """,
)
def mention_model_nbest(spark, sf_dir):
    """M8: k-best Viterbi (k=3) — ranks, paths and exact integer path
    scores must all match the exhaustive enumeration."""
    return crf_op.nbest_labels(_short_toks(spark, sf_dir))


@query(
    "mention_model_viterbi_tensor",
    oracle=f"""
    WITH {_CRF_SCORED_CTE},
    ranked_rev AS (
      SELECT doc_id, toks, tlen, li,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, p ASC) AS r
      FROM scored
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS word_index, toks[pos + 1] AS token,
           {_NAMES_SQL}[li[pos + 1] + 1] AS label
    FROM ranked_rev, LATERAL (SELECT unnest(range(0, tlen)) AS pos)
    WHERE r = 1
    """,
)
def mention_model_viterbi_tensor(spark, sf_dir):
    """M7 through the batched float TENSOR decoder — the exact code path
    the mention-model slot runs — on non-trivial seeded weights, vs
    exhaustive enumeration. Tie order differs from the integer path
    (backward-greedy == minimum reverse-lex path): the oracle ranks by
    the little-endian path integer, pinning that convention exactly."""
    return crf_op.viterbi_labels_tensor(_short_toks(spark, sf_dir))
