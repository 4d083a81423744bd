"""Gates for the exact edit-distance similarity join (operators/editjoin.py).

The headline oracle (`ed_link_typos`, `ed_self_pairs`) is the BRUTE-FORCE
cross join with DuckDB's built-in Levenshtein — deliberately NOT a replay
of the blocking scheme. A green hash therefore proves the FastSS
deletion-neighborhood blocking is lossless at gate scale (every true
pair survived candidate generation), not merely that two engines ran the
same approximation. The capped gates (`ed_pairs_capped`/`ed_overflow`)
DO replay the cap semantics, because the cap is the contract there.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_duck
from hebrew_ner_spark.operators import editjoin
from hebrew_ner_spark.operators.textstats import with_tokens
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS
from hebrew_ner_spark.sources.catalog import load_table

ED_CAP_TEST = 4  # planted: 2-char-prefix buckets of size 5/6/8 overflow

_NAMES_VALUES = ", ".join(f"('{t}')" for t in sorted(ENTITY_TERMS))

# distinct corpus vocabulary
_TOKS = "SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents"

# the deterministic corruption: delete the char at h60(tok) % len
_SURF = f"""
  SELECT intended,
         substr(intended, 1, CAST(pos AS INT))
           || substr(intended, CAST(pos + 2 AS INT)) AS surface
  FROM (SELECT tok AS intended,
               ({phash_duck('tok', editjoin.ED_TYPO_SEED)}) % length(tok) AS pos
        FROM ({_TOKS}) WHERE length(tok) >= {editjoin.ED_MIN_LEN})
"""

# DuckDB <=1-deletion neighborhood of column c (self + 1-deletions)
def _vars_duck(c: str) -> str:
    return (
        f"unnest(list_distinct(list_prepend({c}, "
        f"list_transform(range(1, length({c}) + 1), "
        f"i -> substr({c}, 1, i - 1) || substr({c}, i + 1)))))"
    )


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _names_df(spark):
    return spark.createDataFrame(
        [(t,) for t in sorted(ENTITY_TERMS)], "name string"
    )


def _vocab_union(spark, sf_dir):
    """distinct corpus tokens UNION their typo surfaces — the self-join
    input with planted distance-1 structure."""
    docs = _docs(spark, sf_dir)
    toks = with_tokens(docs).select(F.explode("toks").alias("s")).distinct()
    surf = editjoin.typo_surfaces(docs).select(F.col("surface").alias("s"))
    return toks.unionByName(surf).distinct()


@query(
    "ed_typo_surfaces",
    oracle=f"SELECT intended, surface FROM ({_SURF})",
)
def ed_typo_surfaces(spark, sf_dir):
    """The corruption table itself: any drift here cascades into every
    downstream linking gate, so it gets its own hash row."""
    return editjoin.typo_surfaces(_docs(spark, sf_dir))


@query(
    "ed_dict_variants",
    oracle=f"""
    WITH d(name) AS (VALUES {_NAMES_VALUES})
    SELECT name, {_vars_duck('name')} AS variant FROM d
    """,
)
def ed_dict_variants(spark, sf_dir):
    """The dictionary side's <=1-deletion neighborhood (the broadcast
    build side of the linking join)."""
    dv = editjoin.deletion_variants(_names_df(spark), "name")
    return dv.select(F.col("s").alias("name"), "variant")


@query(
    "ed_link_typos",
    oracle=f"""
    WITH s AS (SELECT DISTINCT surface FROM ({_SURF})),
    d(name) AS (VALUES {_NAMES_VALUES})
    SELECT s.surface, d.name,
           CAST(levenshtein(s.surface, d.name) AS BIGINT) AS dist
    FROM s CROSS JOIN d
    WHERE levenshtein(s.surface, d.name) <= {editjoin.ED_K}
    """,
)
def ed_link_typos(spark, sf_dir):
    """Typo'd surfaces fuzzy-linked to the alias dictionary at edit
    distance <= 1. Oracle is brute force — green == blocking lost no
    pair. Every corrupted entity term must link back to its original
    (pytest asserts that recall invariant separately)."""
    surfaces = editjoin.typo_surfaces(_docs(spark, sf_dir)).select("surface")
    return editjoin.edit_join_dict(
        surfaces, "surface", _names_df(spark), "name"
    )


@query(
    "ed_self_pairs",
    oracle=f"""
    WITH t AS ({_TOKS}),
    u AS (SELECT tok AS s FROM t UNION SELECT surface FROM ({_SURF}))
    SELECT a.s AS str_a, b.s AS str_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM u a JOIN u b ON a.s < b.s
    WHERE levenshtein(a.s, b.s) <= {editjoin.ED_K}
    """,
)
def ed_self_pairs(spark, sf_dir):
    """All distinct-string pairs within edit distance 1 over the
    token-plus-typo vocabulary (the vocabulary-dedup form). Brute-force
    oracle again — losslessness of the capped bucket path at a scale
    where no bucket overflows."""
    return editjoin.edit_self_pairs(_vocab_union(spark, sf_dir), "s")


def _prefixes(spark, sf_dir):
    """distinct 2-char token prefixes — short strings whose 1-deletion
    variants collapse onto single characters, the planted mega-bucket."""
    return (
        with_tokens(_docs(spark, sf_dir))
        .select(F.explode("toks").alias("tok"))
        .where(F.length("tok") >= 2)
        .select(F.substring("tok", 1, 2).alias("s"))
        .distinct()
    )


_PRE = f"SELECT DISTINCT substr(tok, 1, 2) AS s FROM ({_TOKS}) WHERE length(tok) >= 2"

_PRE_VARS = f"SELECT s, {_vars_duck('s')} AS variant FROM ({_PRE})"


@query(
    "ed_pairs_capped",
    oracle=f"""
    WITH v AS ({_PRE_VARS}),
    ok AS (SELECT variant FROM v GROUP BY variant
           HAVING count(DISTINCT s) BETWEEN 2 AND {ED_CAP_TEST}),
    cand AS (SELECT DISTINCT a.s AS str_a, b.s AS str_b
             FROM v a JOIN v b USING (variant) JOIN ok USING (variant)
             WHERE a.s < b.s)
    SELECT str_a, str_b, CAST(levenshtein(str_a, str_b) AS BIGINT) AS dist
    FROM cand
    WHERE abs(length(str_a) - length(str_b)) <= {editjoin.ED_K}
      AND levenshtein(str_a, str_b) <= {editjoin.ED_K}
    """,
)
def ed_pairs_capped(spark, sf_dir):
    """The cap contract under planted overflow: 2-char prefixes bucket
    onto single-char variants with sizes up to 8; cap 4 excludes the
    giants from pair generation. Oracle replays the cap semantics."""
    return editjoin.edit_self_pairs(
        _prefixes(spark, sf_dir), "s", cap=ED_CAP_TEST
    )


@query(
    "ed_overflow",
    oracle=f"""
    WITH v AS ({_PRE_VARS})
    SELECT variant, count(DISTINCT s) AS n_strings FROM v
    GROUP BY variant HAVING count(DISTINCT s) > {ED_CAP_TEST}
    """,
)
def ed_overflow(spark, sf_dir):
    """Non-silent report of the buckets `ed_pairs_capped` skipped —
    non-empty by construction at every scale factor (the closed
    vocabulary's 'a'/'s'/'o' prefix buckets exceed the test cap)."""
    return editjoin.edit_self_overflow(
        _prefixes(spark, sf_dir), "s", cap=ED_CAP_TEST
    )
