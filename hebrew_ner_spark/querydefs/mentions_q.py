"""Model-inference-stage queries.

The production mention model (mentions._Model) emits UNIFORM mass over
B/I/E/S on entity tokens and rides the hash-seeded CRF transition
weights on top of BIOSE legality, so the Viterbi decode — not any
per-position shortcut — chooses how each maximal entity run segments
into mentions. The oracle exploits that feasible paths decompose per
run: every legal segmentation of a run of n entity tokens is one of the
2^(n-1) cut masks (segment of 1 -> S, else B I* E), scored with the
same seeded weights; ties resolve to the minimum little-endian path
integer, the tensor decoder's pinned backward-greedy order (see
mention_model_viterbi_tensor)."""

from __future__ import annotations

from hebrew_ner_spark.operators import mentions
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS
from hebrew_ner_spark.sources.catalog import load_table

_ENTS_SQL = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


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

# Exact BIGINT powers of 5 as a DuckDB list literal: pow() returns a
# double, which is inexact past 5^22 (> 2^53) — with the n<=24 guard the
# revkey weights reach 5^23, where a rounded pow() could collapse two
# distinct tie keys. List indexing is 1-based: _POW5_SQL[t + 1] == 5^t.
_POW5_SQL = "[" + ",".join(str(5**t) for t in range(24)) + "]"


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


# Per-run segmentation-enumeration oracle for the PRODUCTION mention
# model. Feasibility (emission _NEG walls) forces O exactly off entity
# runs; within a run the 2^(n-1) cut masks are the legal labelings;
# between runs every feasible path pays the same O-O transitions, so the
# per-run argmax is the global argmax, and revkey (sum li[t]*5^t) ASC is
# the within-run restriction of the global little-endian tie order.
_LABELS_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    base AS (
      SELECT doc_id, word_index, token, token IN {_ENTS_SQL} AS is_ent,
             max(word_index) OVER (PARTITION BY doc_id) AS last_wi
      FROM toks
    ),
    ent AS (
      SELECT doc_id, word_index, last_wi,
             word_index - row_number() OVER (PARTITION BY doc_id ORDER BY word_index) AS grp
      FROM base WHERE is_ent
    ),
    runs AS (
      SELECT doc_id, grp, min(word_index) AS lo, CAST(count(*) AS BIGINT) AS n,
             any_value(last_wi) AS last_wi
      FROM ent GROUP BY doc_id, grp
    ),
    masks AS (
      -- loud bound: a run beyond 24 entity tokens would need 2^23+ masks;
      -- error() beats a hung or silently-wrong gate (current corpora max
      -- out at 16 consecutive entity tokens at the gated scales)
      SELECT doc_id, lo, n, last_wi, CAST(m AS BIGINT) AS m
      FROM runs, LATERAL (SELECT unnest(range(0,
        CASE WHEN n > 24 THEN CAST(error('entity run too long for the segmentation-enumeration oracle') AS BIGINT)
             ELSE CAST(1 AS BIGINT) << (n - 1) END)) AS m)
    ),
    lab AS (
      SELECT doc_id, lo, n, last_wi, m,
             list_transform(range(0, n), t ->
               CASE WHEN (t = 0 OR ((m >> (t - 1)) & 1) = 1)
                         AND (t = n - 1 OR ((m >> t) & 1) = 1) THEN 4
                    WHEN (t = 0 OR ((m >> (t - 1)) & 1) = 1) THEN 1
                    WHEN (t = n - 1 OR ((m >> t) & 1) = 1) THEN 3
                    ELSE 2 END) AS li
      FROM masks
    ),
    scored AS (
      SELECT doc_id, lo, n, li,
             (CASE WHEN lo = 0 THEN {_ph(f"'S|' || {_NAMES_SQL}[li[1] + 1]")}
                   ELSE {_ph(f"'T|O|' || {_NAMES_SQL}[li[1] + 1]")} END)
           + (CASE WHEN n > 1 THEN list_sum(list_transform(range(1, n),
                 t -> {_ph(f"'T|' || {_NAMES_SQL}[li[t] + 1] || '|' || {_NAMES_SQL}[li[t + 1] + 1]")}))
              ELSE 0 END)
           + (CASE WHEN lo + n - 1 = last_wi THEN {_ph(f"'F|' || {_NAMES_SQL}[li[n] + 1]")}
                   ELSE {_ph(f"'T|' || {_NAMES_SQL}[li[n] + 1] || '|O'")} END) AS score,
             list_sum(list_transform(range(0, n),
               t -> li[t + 1] * {_POW5_SQL}[t + 1])) AS revkey
      FROM lab
    ),
    best AS (
      SELECT doc_id, lo, li FROM (
        SELECT doc_id, lo, li,
               row_number() OVER (PARTITION BY doc_id, lo ORDER BY score DESC, revkey ASC) AS r
        FROM scored) WHERE r = 1
    ),
    run_labels AS (
      SELECT doc_id, lo + t AS word_index, {_NAMES_SQL}[li[t + 1] + 1] AS label
      FROM best, LATERAL (SELECT unnest(range(0, len(li))) AS t)
    )
    SELECT b.doc_id, b.word_index, b.token, coalesce(r.label, 'O') AS label
    FROM base b LEFT JOIN run_labels r USING (doc_id, word_index)
"""


@query("mention_model_labels", oracle=_LABELS_ORACLE)
def mention_model_labels(spark, sf_dir):
    """M9 chain as mapInPandas (singleton model, micro-batched decode):
    the shipped pipeline now runs a non-degenerate Viterbi — uniform
    B/I/E/S emissions on entity tokens, seeded CRF transitions deciding
    the mention segmentation of every run."""
    return mentions.detect_mentions(_docs(spark, sf_dir))


# The pinned invariant golden for the neural decode at sf0.01 — no SQL
# can replay a transformer, so the gate hashes the decode's invariant
# summary instead (VERDICT r3 #2): per-label histogram, BIOSE-legality
# violation count (0 by Viterbi hard constraint), span count, and a
# positional md5 checksum over every (doc_id, word_index, label) — one
# label flip anywhere moves it. These constants are recomputed
# INDEPENDENTLY by tests/test_encoder.py::test_neural_invariants_golden
# (pure-python md5 over per-sentence decodes, no Spark), so the literal
# can never drift silently from the encoder.
NEURAL_GOLDEN_SF001 = {
    "n_O": 1876,
    "n_B": 4563,
    "n_I": 15492,
    "n_E": 4563,
    "n_S": 671,
    "n_illegal": 0,
    "n_spans": 5234,
    "checksum": 630361868,
}

_NEURAL_VALUES = ", ".join(
    f"('{m}', {v})" for m, v in NEURAL_GOLDEN_SF001.items()
)


@query(
    "mention_model_neural",
    oracle=f"""
    SELECT metric, CAST(value AS BIGINT) AS value
    FROM (VALUES {_NEURAL_VALUES}) t(metric, value)
    """,
)
def mention_model_neural(spark, sf_dir):
    """M2-M5 numpy encoder stack (WordRep ⊕ CharCNN -> transformer ->
    hidden2tag) feeding the same batched float Viterbi, gated by its
    VALUE-BEARING invariant summary (operators/mentions.py
    neural_invariants): the full distributed decode runs underneath
    (zero-shuffle mapInPandas), then one doc-grain window + scalar
    aggregate pin histogram, legality, span count and the positional
    checksum against the independently recomputed golden. Per-row
    guarantees remain pytest-pinned (tests/test_encoder.py: vectorized
    == independent slow path, batch/partition invariance, BIOSE
    legality, argmax-illegal counterexample)."""
    return mentions.neural_invariants(_docs(spark, sf_dir))


@query("mention_model_binned", oracle=_LABELS_ORACLE)
def mention_model_binned(spark, sf_dir):
    """Same with repartitionByRange length binning (O1 physical choice)."""
    return mentions.detect_mentions_length_binned(_docs(spark, sf_dir))


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
