"""Deterministic coreference resolution (sieve-style) for triple recall.

A KG built from web text loses every fact whose subject or object is an
anaphor; the classic fix is a deterministic sieve (Stanford dcoref,
Lee et al. 2011): resolve each pronoun to the nearest preceding entity
mention, then re-run relation extraction over the resolved text. The
reference pipeline (ner_app.py) extracts from surface mentions only —
this module is the Spark-native recall stage layered on top.

Scale shape — everything is per-document array algebra inside ONE
codegen'd map stage, zero shuffles:

* the entity-position array is computed once per document
  (``transform`` + ``filter``);
* each pronoun's antecedent is ``array_max`` of the entity positions
  before it — nearest-preceding-mention, the sieve's backbone rule;
* substitution rewrites the token array in place; extraction then reuses
  the same five-pattern CASE cascade as ``kg.doc_triples_patterns``.

At 10^12 documents this stays embarrassingly parallel: no state crosses
a document boundary, so the stage pipelines with the scan. The DuckDB
oracle replays the sieve with window functions (running max / IGNORE
NULLS last_value) — a deliberately different formulation proving the
array algebra correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hebrew_ner_spark.operators.kg import _sql_terms, doc_triples_patterns, with_tokens
from hebrew_ner_spark.resources import ENTITY_TERMS, PRONOUN_TERMS

_ENTS = _sql_terms(ENTITY_TERMS)
_PRONS = _sql_terms(PRONOUN_TERMS)

# entity positions in ascending order (0-based word_index)
_EPOS = (
    f"filter(transform(toks, (t, i) -> IF(array_contains({_ENTS}, t),"
    " bigint(i), bigint(-1))), p -> p >= 0)"
)


def coref_mentions(docs: DataFrame) -> DataFrame:
    """(doc_id, word_index, ante_index, antecedent): one row per pronoun
    occurrence. Unresolved pronouns (no preceding entity) report
    ``(-1, '')`` — both engines emit the sentinel, never NULL."""
    return (
        with_tokens(docs)
        .withColumn("epos", F.expr(_EPOS))
        .withColumn(
            "prons",
            F.expr(
                f"filter(transform(toks, (t, i) -> IF(array_contains({_PRONS}, t),"
                " bigint(i), bigint(-1))), p -> p >= 0)"
            ),
        )
        .select(
            "doc_id",
            F.explode("prons").alias("word_index"),
            F.col("epos"),
            F.col("toks"),
        )
        .withColumn(
            "ante_index",
            F.expr(
                "coalesce(array_max(filter(epos, e -> e < word_index)), bigint(-1))"
            ),
        )
        .select(
            "doc_id",
            "word_index",
            "ante_index",
            F.expr(
                "IF(ante_index >= 0, element_at(toks, int(ante_index) + 1), '')"
            ).alias("antecedent"),
        )
    )


def resolved_docs(docs: DataFrame) -> DataFrame:
    """documents with ``text`` rewritten through the sieve: every pronoun
    whose nearest preceding entity exists is replaced by that entity
    token. One in-row pass; unresolved pronouns are left verbatim."""
    return (
        with_tokens(docs)
        .withColumn("epos", F.expr(_EPOS))
        .withColumn(
            "rtoks",
            F.expr(
                f"""
                transform(toks, (t, i) -> CASE
                  WHEN array_contains({_PRONS}, t)
                       AND size(filter(epos, e -> e < i)) > 0
                    THEN element_at(toks, int(array_max(filter(epos, e -> e < i))) + 1)
                  ELSE t END)
                """
            ),
        )
        .withColumn("text", F.concat_ws(" ", "rtoks"))
        .drop("toks", "epos", "rtoks")
    )


def coref_triples(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """(key, word_index, pattern, subj, pred, obj): the five-pattern
    extraction over sieve-resolved text — the recall-boosted triple
    stream. Same zero-shuffle stage as the baseline extractor; the
    substitution composes into the same codegen plan."""
    return doc_triples_patterns(resolved_docs(docs), key=key)


def coref_gain(docs: DataFrame) -> DataFrame:
    """(pattern, n_base, n_coref): triples per pattern before vs after
    resolution — the measured recall effect. Substitution can also
    dissolve gap patterns (a filler that becomes an entity turns
    svo_gap_* into svo), so per-pattern deltas go both ways; the gate
    reports both sides exactly."""
    base = (
        doc_triples_patterns(docs)
        .groupBy("pattern")
        .agg(F.count("*").alias("n_base"))
    )
    boosted = (
        coref_triples(docs).groupBy("pattern").agg(F.count("*").alias("n_coref"))
    )
    return (
        base.join(boosted, "pattern", "full_outer")
        .select(
            "pattern",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_coref", F.lit(0)).cast("long").alias("n_coref"),
        )
    )
