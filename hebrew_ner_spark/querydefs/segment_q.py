"""Sentence-segmentation / word-tokenization queries (T1/T2) + oracles.

The corpus text has no sentence punctuation, so these queries first
synthesize a deterministic punctuated variant (a period after every
10th token and at the end), then run the byte-identical reference
tokenizer kernels inside pandas UDFs.

On this restricted input (ASCII words, single spaces, '.' only at chunk
ends) the reference tokenizer's behaviour — including its quirks — is
closed-form, so the oracle can state it in SQL:

  * a sentence closes at each word+'.' chunk; the closing word is kept
    even if single-char (it is consumed, not a tail);
  * a non-closing single-char word is DROPPED (Q2: the unconsumed tail
    survives only when start < len-1);
  * anything after the last '.' never flushes (Q1);
  * pieces join with single spaces; word tokens re-split on them, with
    the trailing '.' a separate token.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators.segment import pages_to_sentences, sentences_to_tokens
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

PERIOD_EVERY = 10

# Punctuate: period after every 10th token and at the end.
_PUNCT_SPARK = f"""
concat_ws(' ',
  transform(split(text, ' '), (t, i) ->
    CASE WHEN (i + 1) % {PERIOD_EVERY} = 0 OR i = size(split(text, ' ')) - 1
         THEN concat(t, '.') ELSE t END))
"""

_PUNCT_DUCK = f"""
array_to_string(
  list_transform(string_split(text, ' '), (t, i) ->
    CASE WHEN i % {PERIOD_EVERY} = 0 OR i = len(string_split(text, ' '))
         THEN t || '.' ELSE t END), ' ')
"""

# Oracle CTE: sentences of the punctuated text under reference semantics.
# Chunks are words; group id = count of preceding closers; within a group
# the closing word keeps everything, non-closing words need len >= 2.
_SENTS_CTE = f"""
w AS (
  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS widx, unnest(ws) AS word
  FROM (SELECT doc_id, string_split({_PUNCT_DUCK}, ' ') AS ws FROM documents)
),
marked AS (
  SELECT doc_id, widx, word,
         CASE WHEN word LIKE '%.' THEN 1 ELSE 0 END AS closes,
         coalesce(sum(CASE WHEN word LIKE '%.' THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY widx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS grp
  FROM w
),
groups_all AS (
  SELECT doc_id, grp,
         string_agg(
           CASE WHEN closes = 1 THEN substr(word, 1, length(word) - 1) || ' .'
                ELSE word END, ' ' ORDER BY widx) AS sentence,
         max(closes) AS has_close
  FROM marked
  WHERE closes = 1 OR length(word) >= 2
  GROUP BY doc_id, grp
),
sents AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY grp) - 1 AS BIGINT) AS sent_num,
         sentence
  FROM groups_all WHERE has_close = 1
)
"""


def _punctuated(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.expr(_PUNCT_SPARK).alias("text"))


@query(
    "seg_sentences",
    oracle=f"WITH {_SENTS_CTE} SELECT doc_id, sent_num, sentence FROM sents",
)
def seg_sentences(spark, sf_dir):
    """T1 sentence segmentation (byte-identical kernel) over punctuated
    documents; quirks Q1/Q2 verified in closed form by the oracle."""
    return pages_to_sentences(_punctuated(spark, sf_dir), key_cols=("doc_id",))


@query(
    "seg_tokens",
    oracle=f"""
    WITH {_SENTS_CTE},
    toks AS (
      SELECT doc_id, sent_num,
             generate_subscripts(string_split(sentence, ' '), 1) - 1 AS word_index,
             unnest(string_split(sentence, ' ')) AS token
      FROM sents
    )
    SELECT doc_id, sent_num, CAST(word_index AS BIGINT) AS word_index, token
    FROM toks
    """,
)
def seg_tokens(spark, sf_dir):
    """T1+T2: sentences re-tokenized by the scanner kernel. On this input
    every piece is an ENG word or '.', so tokens equal the space-split
    sentence — which is exactly what the oracle asserts."""
    sents = pages_to_sentences(_punctuated(spark, sf_dir), key_cols=("doc_id",))
    return sentences_to_tokens(sents, key_cols=("doc_id", "sent_num"))
