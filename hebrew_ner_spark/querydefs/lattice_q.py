"""Lattice queries + DuckDB oracles.

The Spark side runs the *real* DFS prune kernel inside a batched mapInPandas; the
oracles exploit the known shape of the synthetic lattices (morph chain +
whole-token shortcut) to state the expected survivors in closed form — so
the gate verifies the graph kernel's end-to-end behaviour exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import kg, lattice
from hebrew_ner_spark.operators.labels import _morph_case_expr
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import MORPH_SPLITS
from hebrew_ner_spark.sources.catalog import load_table

_TOKS_CTE = """
toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
         unnest(string_split(text, ' ')) AS token
  FROM documents
)
"""

_SPLIT_TOKS = "(" + ", ".join(f"'{t}'" for t in MORPH_SPLITS) + ")"


def _lat_case_duck() -> str:
    whens = []
    for tok, morphs in MORPH_SPLITS.items():
        k = len(morphs)
        items = [
            f"{{'edge_order': {i}, 'from_v': {i}, 'to_v': {i + 1}, 'form': '{m}'}}"
            for i, m in enumerate(morphs)
        ]
        items.append(f"{{'edge_order': {k}, 'from_v': 0, 'to_v': {k}, 'form': '{tok}'}}")
        whens.append(f"WHEN '{tok}' THEN [{', '.join(items)}]")
    return (
        "CASE token "
        + " ".join(whens)
        + " ELSE [{'edge_order': 0, 'from_v': 0, 'to_v': 1, 'form': token}] END"
    )


_LAT_CTE = f"""
{_TOKS_CTE},
m AS (SELECT doc_id, word_index, token, {_lat_case_duck()} AS lat FROM toks),
u0 AS (SELECT doc_id, word_index, token, unnest(lat, recursive := true) FROM m),
lat AS (
  SELECT doc_id, word_index, token,
         CAST(edge_order AS BIGINT) AS edge_order,
         CAST(from_v AS BIGINT) AS from_v,
         CAST(to_v AS BIGINT) AS to_v, form
  FROM u0
)
"""

_EDGE_COLS = "doc_id, word_index, edge_order, from_v, to_v, form"


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _true_splitting(docs):
    """(doc_id, word_index, splitting) from the morph dictionary."""
    return kg.doc_tokens(docs).select(
        "doc_id",
        "word_index",
        F.expr(f"CAST(size({_morph_case_expr()}) AS BIGINT)").alias("splitting"),
    )


@query(
    "lat_edges",
    oracle=f"WITH {_LAT_CTE} SELECT {_EDGE_COLS} FROM lat",
)
def lat_edges(spark, sf_dir):
    """MA lattice edge table (ambiguous: 2 paths for split tokens)."""
    return lattice.build_lattice(_docs(spark, sf_dir))


@query(
    "lat_pruned",
    oracle=f"""
    WITH {_LAT_CTE}
    SELECT {_EDGE_COLS} FROM lat
    WHERE NOT (token IN {_SPLIT_TOKS} AND from_v = 0 AND to_v = 2)
    """,
)
def lat_pruned(spark, sf_dir):
    """G3 with true splitting evidence: the DFS keeps exactly the morph
    chain for split tokens (path length = splitting+1), dropping the
    whole-token shortcut."""
    d = _docs(spark, sf_dir)
    return lattice.prune_lattice(lattice.build_lattice(d), _true_splitting(d))


@query(
    "lat_pruned_flat",
    oracle=f"""
    WITH {_LAT_CTE}
    SELECT {_EDGE_COLS} FROM lat
    WHERE token NOT IN {_SPLIT_TOKS} OR (from_v = 0 AND to_v = 2)
    """,
)
def lat_pruned_flat(spark, sf_dir):
    """G3 with splitting pinned to 1 (single-analysis evidence): the DFS
    keeps only the whole-token shortcut for split tokens."""
    d = _docs(spark, sf_dir)
    flat = kg.doc_tokens(d).select(
        "doc_id", "word_index", F.lit(1).cast("long").alias("splitting")
    )
    return lattice.prune_lattice(lattice.build_lattice(d), flat)


@query(
    "lat_semi_filter",
    oracle=f"""
    WITH {_LAT_CTE}
    SELECT {_EDGE_COLS} FROM lat
    WHERE NOT (token IN {_SPLIT_TOKS} AND from_v = 0 AND to_v = 2)
    """,
)
def lat_semi_filter(spark, sf_dir):
    """P2 parity: pruning via explicit left-semi join against the valid
    edge set must equal the in-place prune output."""
    d = _docs(spark, sf_dir)
    full = lattice.build_lattice(d)
    valid = lattice.prune_lattice(full, _true_splitting(d)).select(
        "doc_id", "word_index", "from_v", "to_v"
    )
    return lattice.filter_lattice_by_edges(full, valid)


@query(
    "lat_md_morphemes",
    oracle=f"""
    WITH {_TOKS_CTE},
    m AS (SELECT doc_id, word_index, token,
                 CASE token {" ".join(f"WHEN '{t}' THEN {list(ms)}" for t, ms in MORPH_SPLITS.items())}
                      ELSE [token] END AS morphs
          FROM toks)
    SELECT doc_id, word_index,
           CAST(generate_subscripts(morphs, 1) - 1 AS BIGINT) AS morph_index,
           unnest(morphs) AS morpheme
    FROM m
    """.replace('"', "'"),
)
def lat_md_morphemes(spark, sf_dir):
    """MD consistency: the disambiguated path re-indexed as morphemes must
    equal the direct morphological segmentation (lbl_morphemes)."""
    d = _docs(spark, sf_dir)
    pruned = lattice.prune_lattice(lattice.build_lattice(d), _true_splitting(d))
    return lattice.md_from_pruned(pruned)


@query(
    "eval_seg_accuracy",
    oracle=f"""
    WITH {_TOKS_CTE},
    m AS (SELECT doc_id, word_index, token,
                 CASE WHEN token IN {_SPLIT_TOKS} THEN 2 ELSE 1 END AS n_true,
                 1 AS n_flat,
                 CASE WHEN token IN {_SPLIT_TOKS} THEN 0 ELSE 1 END AS n_match
          FROM toks)
    SELECT CAST(sum(n_true) AS BIGINT) AS n_true_morphs,
           CAST(sum(n_flat) AS BIGINT) AS n_pred_morphs,
           CAST(sum(n_match) AS BIGINT) AS n_match,
           CAST((2 * sum(n_match) * 1000000 + sum(n_true)) // (2 * sum(n_true)) AS BIGINT) AS seg_recall_1e6
    FROM m
    """,
)
def eval_seg_accuracy(spark, sf_dir):
    """E7 analog (eval_yap_parsing.py:12-77): positional morpheme-match
    rate between the flat-evidence disambiguation (whole-token shortcuts)
    and the true segmentation — the zip made an explicit join on
    (doc, word, morph_index). Split tokens disagree (shortcut form vs
    first morpheme), everything else matches."""
    d = _docs(spark, sf_dir)
    true_morphs = kg.doc_tokens(d).select(
        "doc_id", "word_index",
        F.posexplode(F.expr(_morph_case_expr())).alias("morph_index", "morpheme"),
    ).withColumn("morph_index", F.col("morph_index").cast("long"))

    flat = kg.doc_tokens(d).select(
        "doc_id", "word_index", F.lit(1).cast("long").alias("splitting")
    )
    pred_md = lattice.md_from_pruned(
        lattice.prune_lattice(lattice.build_lattice(d), flat)
    ).withColumn("morph_index", F.lit(0).cast("long"))

    j = true_morphs.alias("t").join(
        pred_md.alias("p"), ["doc_id", "word_index", "morph_index"], "full_outer"
    )
    return j.agg(
        F.count(F.col("t.morpheme")).alias("n_true_morphs"),
        F.count(F.col("p.morpheme")).alias("n_pred_morphs"),
        F.sum(
            F.when(F.col("t.morpheme") == F.col("p.morpheme"), 1).otherwise(0)
        ).cast("long").alias("n_match"),
        F.expr(
            "CAST((2 * sum(CASE WHEN t.morpheme = p.morpheme THEN 1 ELSE 0 END)"
            " * 1000000 + count(t.morpheme)) DIV (2 * count(t.morpheme)) AS BIGINT)"
        ).alias("seg_recall_1e6"),
    )
