"""Sentence segmentation + tokenization as vectorized Spark stages.

pages(url, text) -> sentences(url, sent_num, sentence)
                 -> tokens(url, sent_num, word_index, token)

The kernels (functions/tokenizer.py) are pure Python per *document*; they run
inside Arrow-batched pandas UDFs, so the per-row invariant (byte-identical
output vs the reference tokenizer) holds while the stage scales linearly with
partitions — no shuffle anywhere in this file: sentence and token indexes are
derived with posexplode on the already-materialized arrays.

Reference lifecycle step: ner_app.py:301-311 step 1-2 (text2listOfSentences
-> tokenize_sentences); SURVEY.md §2.3 T1-T3.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hebrew_ner_spark.functions.tokenizer import (
    normalize_input,
    split_sentences,
    tokenize_words,
)


# UDFs are built lazily at call time: pandas_udf needs an active
# SparkSession, and under spark-submit --py-files modules import before the
# session exists.


def split_sentences_udf(col):
    @pandas_udf("array<string>")
    def _f(text: pd.Series) -> pd.Series:
        return text.map(lambda t: split_sentences(t) if isinstance(t, str) else [])

    return _f(col)


def tokenize_words_udf(col):
    @pandas_udf("array<string>")
    def _f(sentence: pd.Series) -> pd.Series:
        return sentence.map(lambda s: tokenize_words(s) if isinstance(s, str) else [])

    return _f(col)


def normalize_input_udf(col):
    @pandas_udf("string")
    def _f(text: pd.Series) -> pd.Series:
        return text.map(lambda t: normalize_input(t) if isinstance(t, str) else t)

    return _f(col)


def pages_to_sentences(pages: DataFrame, text_col: str = "text", key_cols: tuple = ("url",)) -> DataFrame:
    """-> (key..., sent_num, sentence). Narrow stage, order by construction."""
    return (
        pages.withColumn("_sents", split_sentences_udf(F.col(text_col)))
        .select(*key_cols, F.posexplode("_sents").alias("sent_num", "sentence"))
        .withColumn("sent_num", F.col("sent_num").cast("long"))
    )


def sentences_to_tokens(sentences: DataFrame, key_cols: tuple = ("url", "sent_num")) -> DataFrame:
    """-> (key..., word_index, token). A6 cumcount == posexplode position."""
    return (
        sentences.withColumn("_toks", tokenize_words_udf(F.col("sentence")))
        .select(*key_cols, F.posexplode("_toks").alias("word_index", "token"))
        .withColumn("word_index", F.col("word_index").cast("long"))
    )


def pages_to_tokens(pages: DataFrame, text_col: str = "text", key: str = "url") -> DataFrame:
    """Fused pages -> token long table (single narrow stage, one UDF pass)."""
    sents = pages_to_sentences(pages, text_col=text_col, key_cols=(key,))
    return sentences_to_tokens(sents, key_cols=(key, "sent_num"))
