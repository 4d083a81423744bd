"""Gates for the Chu-Liu/Edmonds MST dependency decode
(operators/depparse.py).

The decode oracle is EXHAUSTIVE: all 16 spanning arborescences of the
rooted 4-node clause graph (Cayley: (n+1)^(n-1) = 16 for n = 3) scored
long-form and argmax'd — the bitmask perturbation makes the best tree
unique, so head vectors compare directly. The acyclic head-triple list
is enumerated by definition (every h_d != d head function minus the
five cycle patterns) and embedded as VALUES. CTE names dp-prefixed."""

from __future__ import annotations

from itertools import product

from hebrew_ner_spark.functions.hashing import phash_duck
from hebrew_ner_spark.operators import depparse
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

N = depparse.CLAUSE_N
assert N == 3, "the enumeration oracle below is written for 3-token clauses"
_PB = 1 << depparse._pert_bits(N)


def _acyclic_triples() -> list[tuple[int, int, int]]:
    out = []
    for h1, h2, h3 in product([0, 2, 3], [0, 1, 3], [0, 1, 2]):
        hm = {1: h1, 2: h2, 3: h3}
        ok = True
        for s in (1, 2, 3):
            seen, v = set(), s
            while v != 0:
                if v in seen:
                    ok = False
                    break
                seen.add(v)
                v = hm[v]
            if not ok:
                break
        if ok:
            out.append((h1, h2, h3))
    return out


_TREES = ", ".join(f"({h1}, {h2}, {h3})" for h1, h2, h3 in _acyclic_triples())

_ARC_PAIRS = ", ".join(
    f"({h}, {d})" for d in (1, 2, 3) for h in (0, 1, 2, 3) if h != d
)

_DCL = f"""
dpt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dpc AS (SELECT doc_id, toks, unnest(range(len(toks) // {N})) AS c FROM dpt),
dcl AS (SELECT doc_id, CAST(c AS BIGINT) AS clause_id,
               toks[{N} * c + 1] AS t1, toks[{N} * c + 2] AS t2,
               toks[{N} * c + 3] AS t3
        FROM dpc)
"""

_DAR = f"""
dhd AS (SELECT * FROM (VALUES {_ARC_PAIRS}) v(h, d)),
dar AS (
  SELECT doc_id, clause_id, CAST(h AS BIGINT) AS h, CAST(d AS BIGINT) AS d,
         (({phash_duck("ht || '|' || dt || '|' || h || '|' || d", depparse.ARC_SEED)})
           % {depparse.SCORE_MOD}) * {_PB} + (1 << (h * {N + 1} + d)) AS score
  FROM (
    SELECT doc_id, clause_id, dhd.h, dhd.d,
           CASE dhd.h WHEN 0 THEN '{depparse.ROOT_TOK}'
                      WHEN 1 THEN t1 WHEN 2 THEN t2 ELSE t3 END AS ht,
           CASE dhd.d WHEN 1 THEN t1 WHEN 2 THEN t2 ELSE t3 END AS dt
    FROM dcl, dhd
  )
)
"""

_DBEST = f"""
dtr AS (SELECT * FROM (VALUES {_TREES}) v(h1, h2, h3)),
dts AS (
  SELECT dcl.doc_id, dcl.clause_id, dtr.h1, dtr.h2, dtr.h3,
         a1.score + a2.score + a3.score AS total
  FROM dcl CROSS JOIN dtr
  JOIN dar a1 ON a1.doc_id = dcl.doc_id AND a1.clause_id = dcl.clause_id
             AND a1.h = dtr.h1 AND a1.d = 1
  JOIN dar a2 ON a2.doc_id = dcl.doc_id AND a2.clause_id = dcl.clause_id
             AND a2.h = dtr.h2 AND a2.d = 2
  JOIN dar a3 ON a3.doc_id = dcl.doc_id AND a3.clause_id = dcl.clause_id
             AND a3.h = dtr.h3 AND a3.d = 3
),
dbest AS (SELECT * FROM dts
          QUALIFY row_number() OVER (PARTITION BY doc_id, clause_id
                                     ORDER BY total DESC) = 1)
"""


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _clauses(spark, sf_dir):
    return depparse.clause_tokens(_docs(spark, sf_dir))


@query(
    "dep_clauses",
    oracle=f"WITH {_DCL} SELECT doc_id, clause_id, t1, t2, t3 FROM dcl",
)
def dep_clauses(spark, sf_dir):
    """The clause windows (parse units) themselves."""
    from pyspark.sql import functions as F

    c = _clauses(spark, sf_dir)
    return c.select(
        "doc_id",
        "clause_id",
        F.col("toks")[0].alias("t1"),
        F.col("toks")[1].alias("t2"),
        F.col("toks")[2].alias("t3"),
    )


@query(
    "dep_arcs",
    oracle=f"WITH {_DCL}, {_DAR} SELECT doc_id, clause_id, h, d, score FROM dar",
)
def dep_arcs(spark, sf_dir):
    """The perturbed arc-score table (JVM-side codegen explode) — pins
    the exact integers the decode kernel recomputes in Python."""
    return depparse.arc_scores(_clauses(spark, sf_dir))


@query(
    "dep_mst",
    oracle=f"""
    WITH {_DCL}, {_DAR}, {_DBEST}
    SELECT doc_id, clause_id, CAST(d AS BIGINT) AS d,
           CAST(CASE d WHEN 1 THEN h1 WHEN 2 THEN h2 ELSE h3 END AS BIGINT)
             AS head,
           total
    FROM dbest, (SELECT unnest([1, 2, 3]) AS d) ds
    """,
)
def dep_mst(spark, sf_dir):
    """Chu-Liu/Edmonds decode vs exhaustive arborescence enumeration:
    head vectors AND unique totals, bit-exact, every clause."""
    return depparse.mst_parse(_clauses(spark, sf_dir))
