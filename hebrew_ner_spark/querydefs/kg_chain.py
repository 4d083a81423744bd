"""Query registry: every implemented operator exposed as (spark, sf_dir) -> DF,
plus a DuckDB-oracle SQL string for driver-side correctness checking.

Column names are aligned 1:1 between the Spark plan and the oracle SQL —
the correctness gate hashes values after sorting columns by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hebrew_ner_spark.operators import kg
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.resources import ENTITY_TERMS, PREDICATE_TERMS
from hebrew_ner_spark.sources import catalog
from hebrew_ner_spark.sources.catalog import load_table

_ENTS_SQL = "(" + ", ".join(f"'{t}'" for t in ENTITY_TERMS) + ")"
_PREDS_SQL = "(" + ", ".join(f"'{t}'" for t in PREDICATE_TERMS) + ")"

# DuckDB fragment producing the long token table from `documents`.
_TOKS_CTE = """
toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
         unnest(string_split(text, ' ')) AS token
  FROM documents
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# KG construction chain (SURVEY.md §7 / §2.11)
# ---------------------------------------------------------------------------

@query(
    "kg_tokens",
    oracle=f"WITH {_TOKS_CTE} SELECT doc_id, word_index, token FROM toks",
)
def kg_tokens(spark, sf_dir):
    """Tokenize -> long table; A6 cumcount analog via posexplode (no shuffle)."""
    return kg.doc_tokens(_docs(spark, sf_dir))


@query(
    "kg_token_labels",
    oracle=f"""
    WITH {_TOKS_CTE},
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
    """,
)
def kg_token_labels(spark, sf_dir):
    """BIOSE mention labelling (gazetteer model), array-side, shuffle-free."""
    return kg.doc_token_labels(_docs(spark, sf_dir))


@query(
    "kg_mention_spans",
    oracle=f"""
    WITH {_TOKS_CTE},
    lbl AS (
      SELECT doc_id, word_index, token,
             token IN {_ENTS_SQL} AS is_ent,
             coalesce(lag(token) OVER (PARTITION BY doc_id ORDER BY word_index)
                      IN {_ENTS_SQL}, FALSE) AS prev_ent
      FROM toks
    ),
    flagged AS (
      SELECT *, CASE WHEN is_ent AND NOT prev_ent THEN 1 ELSE 0 END AS span_start,
             sum(CASE WHEN is_ent AND NOT prev_ent THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY word_index) AS span_id
      FROM lbl
    )
    SELECT doc_id, 'TERM' AS cat,
           min(word_index) AS lo, max(word_index) AS hi,
           string_agg(token, ' ' ORDER BY word_index) AS surface
    FROM flagged WHERE is_ent
    GROUP BY doc_id, span_id
    """,
)
def kg_mention_spans(spark, sf_dir):
    """Entity spans (make_spans semantics, utils/ner.py:398-419)."""
    return kg.mention_spans(_docs(spark, sf_dir))


_TRIPLES_ORACLE = f"""
    WITH {_TOKS_CTE},
    w AS (
      SELECT doc_id, word_index, token,
             lag(token)  OVER (PARTITION BY doc_id ORDER BY word_index) AS subj,
             lead(token) OVER (PARTITION BY doc_id ORDER BY word_index) AS obj
      FROM toks
    )
    SELECT doc_id, word_index, subj, token AS pred, obj
    FROM w
    WHERE token IN {_PREDS_SQL} AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
"""


@query("kg_triples", oracle=_TRIPLES_ORACLE)
def kg_triples(spark, sf_dir):
    """SVO relation extraction — one narrow codegen stage, zero shuffles."""
    return kg.doc_triples(_docs(spark, sf_dir))


_TRIPLE_COUNTS_ORACLE = f"""
    WITH t AS ({_TRIPLES_ORACLE})
    SELECT subj, pred, obj, count(*) AS n_evidence FROM t GROUP BY 1, 2, 3
"""


@query("kg_triple_counts", oracle=_TRIPLE_COUNTS_ORACLE)
def kg_triple_counts(spark, sf_dir):
    return kg.triple_counts(_docs(spark, sf_dir))


@query("kg_triple_counts_salted", oracle=_TRIPLE_COUNTS_ORACLE)
def kg_triple_counts_salted(spark, sf_dir):
    """Same aggregate through the two-phase salted plan — proves equivalence."""
    return kg.triple_counts(_docs(spark, sf_dir), salt_buckets=8)


@query(
    "kg_bgp_match",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    tc AS (SELECT subj, pred, obj, count(*) AS n FROM t GROUP BY 1, 2, 3),
    l0 AS (SELECT subj AS x, obj AS y, CAST(sum(n) AS BIGINT) AS w0
           FROM tc WHERE pred = 'join' GROUP BY 1, 2),
    l1 AS (SELECT subj AS y, obj AS z, CAST(sum(n) AS BIGINT) AS w1
           FROM tc WHERE pred = 'merge' GROUP BY 1, 2),
    l2 AS (SELECT subj AS x, obj AS z, CAST(sum(n) AS BIGINT) AS w2
           FROM tc WHERE pred = 'scan' GROUP BY 1, 2)
    SELECT x, y, z, CAST(w0 * w1 * w2 AS BIGINT) AS n_witness
    FROM l0 JOIN l1 USING (y) JOIN l2 USING (x, z)
    """,
)
def kg_bgp_match(spark, sf_dir):
    """SPARQL-style triangle BGP (?x join ?y)(?y merge ?z)(?x scan ?z)
    with witness-combination support counts."""
    return kg.bgp_match(_docs(spark, sf_dir))


@query(
    "kg_rule_confidence",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    l0 AS (SELECT DISTINCT subj AS x, obj AS y FROM t WHERE pred = 'join'),
    l1 AS (SELECT DISTINCT subj AS y, obj AS z FROM t WHERE pred = 'merge'),
    hp AS (SELECT DISTINCT subj AS x, obj AS z FROM t WHERE pred = 'scan'),
    hsub AS (SELECT DISTINCT x FROM hp),
    b AS (SELECT l0.x, l0.y, l1.z FROM l0 JOIN l1 USING (y)),
    f AS (SELECT b.x, b.z,
                 CASE WHEN hp.x IS NULL THEN 0 ELSE 1 END AS hit,
                 CASE WHEN hs.x IS NULL THEN 0 ELSE 1 END AS anyh
          FROM b LEFT JOIN hp ON hp.x = b.x AND hp.z = b.z
                 LEFT JOIN hsub hs ON hs.x = b.x)
    SELECT count(*) AS n_body,
           CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_support,
           CAST(coalesce(sum(anyh), 0) AS BIGINT) AS n_pca_body,
           CAST(CASE WHEN count(*) = 0 THEN 0 ELSE
             (2000000 * coalesce(sum(hit), 0) + count(*))
             // (2 * count(*)) END AS BIGINT) AS conf_1e6,
           CAST(CASE WHEN coalesce(sum(anyh), 0) = 0 THEN 0 ELSE
             (2000000 * coalesce(sum(hit), 0) + sum(anyh))
             // (2 * sum(anyh)) END AS BIGINT) AS pca_conf_1e6
    FROM f
    """,
)
def kg_rule_confidence(spark, sf_dir):
    """AMIE support / confidence / PCA-confidence for the default horn
    rule (?x join ?y) ∧ (?y merge ?z) ⇒ (?x scan ?z)."""
    return kg.rule_confidence(_docs(spark, sf_dir))


@query(
    "kg_rule_infer",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    ri_l0 AS (SELECT DISTINCT subj AS x, obj AS y FROM t WHERE pred = 'join'),
    ri_l1 AS (SELECT DISTINCT subj AS y, obj AS z FROM t WHERE pred = 'merge'),
    ri_hp AS (SELECT DISTINCT subj AS x, obj AS z FROM t WHERE pred = 'scan'),
    ri_b AS (SELECT ri_l0.x, ri_l1.z, CAST(count(*) AS BIGINT) AS n_paths
             FROM ri_l0 JOIN ri_l1 USING (y) GROUP BY 1, 2)
    SELECT b.x AS subj, 'scan' AS pred, b.z AS obj, b.n_paths
    FROM ri_b b LEFT JOIN ri_hp hp ON hp.x = b.x AND hp.z = b.z
    WHERE hp.x IS NULL
    """,
)
def kg_rule_infer(spark, sf_dir):
    """Rule application / KG completion: head triples the default horn
    rule implies that are NOT yet in the KG, with body-binding support."""
    return kg.rule_inference(_docs(spark, sf_dir))


@query(
    "kg_pred_paraphrase",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    pp_tp AS (SELECT DISTINCT pred, subj, obj FROM t),
    pp_c AS (SELECT pred, CAST(count(*) AS BIGINT) AS c FROM pp_tp GROUP BY 1),
    pp_b AS (SELECT a.pred AS pred_a, b.pred AS pred_b,
                    CAST(count(*) AS BIGINT) AS c_both
             FROM pp_tp a JOIN pp_tp b
               ON a.subj = b.subj AND a.obj = b.obj AND a.pred < b.pred
             GROUP BY 1, 2)
    SELECT pred_a, pred_b, ca.c AS c_a, cb.c AS c_b, c_both,
           CAST((2000000 * c_both + (ca.c + cb.c - c_both))
                // (2 * (ca.c + cb.c - c_both)) AS BIGINT) AS jac_1e6
    FROM pp_b
    JOIN pp_c ca ON ca.pred = pp_b.pred_a
    JOIN pp_c cb ON cb.pred = pp_b.pred_b
    """,
)
def kg_pred_paraphrase(spark, sf_dir):
    """DIRT-style predicate paraphrase: argument-pair-set Jaccard over
    co-occurring predicate pairs."""
    return kg.pred_paraphrase(_docs(spark, sf_dir))


@query(
    "kg_predicate_stats",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    pairs AS (SELECT pred, subj, obj, count(*) AS n_evidence
              FROM t GROUP BY 1, 2, 3)
    SELECT pred,
           count(*) AS n_pairs,
           CAST(sum(n_evidence) AS BIGINT) AS n_evidence,
           count(DISTINCT subj) AS n_subj,
           count(DISTINCT obj) AS n_obj,
           CAST((2000000 * count(DISTINCT subj) + count(*))
                // (2 * count(*)) AS BIGINT) AS fun_1e6,
           CAST((2000000 * count(DISTINCT obj) + count(*))
                // (2 * count(*)) AS BIGINT) AS inv_fun_1e6
    FROM pairs GROUP BY pred
    """,
)
def kg_predicate_stats(spark, sf_dir):
    """PARIS functionality / inverse functionality per predicate — the
    schema-induction signal entity canonicalization keys on."""
    return kg.predicate_stats(_docs(spark, sf_dir))


@query(
    "kg_entity_summary",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    tc AS (SELECT subj, pred, obj, count(*) AS n_evidence FROM t GROUP BY 1, 2, 3),
    rk AS (SELECT subj, pred, obj, n_evidence,
                  row_number() OVER (PARTITION BY subj
                                     ORDER BY n_evidence DESC, pred ASC, obj ASC)
                    AS rk
           FROM tc)
    SELECT subj, rk, pred, obj, n_evidence FROM rk WHERE rk <= 3
    """,
)
def kg_entity_summary(spark, sf_dir):
    """Top-3 facts per entity by evidence (the materialized entity card)."""
    return kg.entity_summary(_docs(spark, sf_dir))


@query(
    "kg_subsumption",
    oracle=f"""
    WITH {_TOKS_CTE},
    de AS (SELECT DISTINCT doc_id, token FROM toks WHERE token IN {_ENTS_SQL}),
    freq AS (SELECT token, count(*) AS c FROM de GROUP BY 1),
    p AS (SELECT x.token AS hyper, y.token AS hypo, count(*) AS c_both
          FROM de x JOIN de y ON x.doc_id = y.doc_id AND x.token <> y.token
          GROUP BY 1, 2)
    SELECT p.hyper, p.hypo, fa.c AS c_hyper, fb.c AS c_hypo, p.c_both,
           CAST((2000000 * p.c_both + fb.c) // (2 * fb.c) AS BIGINT) AS conf_1e6
    FROM p
    JOIN freq fa ON p.hyper = fa.token
    JOIN freq fb ON p.hypo = fb.token
    WHERE fb.c >= 3
      AND (2000000 * p.c_both + fb.c) // (2 * fb.c) >= 800000
    """,
)
def kg_subsumption(spark, sf_dir):
    """Doc-set-containment subsumption candidates (taxonomy induction)."""
    return kg.subsumption_candidates(_docs(spark, sf_dir))


@query(
    "kg_entity_nodes",
    oracle=f"""
    WITH {_TOKS_CTE}
    SELECT token AS entity, count(*) AS n_mentions,
           count(DISTINCT doc_id) AS n_docs
    FROM toks WHERE token IN {_ENTS_SQL}
    GROUP BY token
    """,
)
def kg_entity_nodes(spark, sf_dir):
    return kg.entity_nodes(_docs(spark, sf_dir))


@query(
    "kg_web_triples",
    oracle=f"""
    WITH pages AS (
      SELECT 'https://example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
             'doc ' || CAST(doc_id AS VARCHAR) || ' Document ' ||
             CAST(doc_id AS VARCHAR) || ' ' || text AS text
      FROM documents
    ),
    toks AS (
      SELECT url,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM pages
    ),
    w AS (
      SELECT url, word_index, token,
             lag(token)  OVER (PARTITION BY url ORDER BY word_index) AS subj,
             lead(token) OVER (PARTITION BY url ORDER BY word_index) AS obj
      FROM toks
    )
    SELECT url, word_index, subj, token AS pred, obj
    FROM w
    WHERE token IN {_PREDS_SQL} AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
    """,
)
def kg_web_triples(spark, sf_dir):
    """The north-rule chain at the input_hint grain, end to end as one
    gate: CC-style pages (url, warc_ts, html, text, lang) -> Arrow html
    extraction -> SVO triples keyed by url. The oracle recomputes the
    extracted text closed-form per url, so the whole html -> triples path
    is value-hash-verified, not just row-counted."""
    from pyspark.sql import functions as F

    from hebrew_ner_spark.operators import extract

    pages = extract.synth_webpages(_docs(spark, sf_dir))
    ext = extract.extract_webpages(pages).select(
        "url", F.col("extracted").alias("text")
    )
    return kg.doc_triples(ext, key="url")


# ---------------------------------------------------------------------------
# Snapshot-versioned graph materialization (plans/snapshots.py)
# ---------------------------------------------------------------------------

@query(
    "kg_snapshot_timetravel",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id % 2 = 0
    ),
    w AS (
      SELECT doc_id, word_index, token,
             lag(token)  OVER (PARTITION BY doc_id ORDER BY word_index) AS subj,
             lead(token) OVER (PARTITION BY doc_id ORDER BY word_index) AS obj
      FROM toks
    ),
    t AS (
      SELECT subj, token AS pred, obj FROM w
      WHERE token IN {_PREDS_SQL} AND subj IN {_ENTS_SQL} AND obj IN {_ENTS_SQL}
    )
    SELECT subj, pred, obj, count(*) AS n_evidence FROM t GROUP BY 1, 2, 3
    """,
)
def kg_snapshot_timetravel(spark, sf_dir):
    """Commit edges(v1, even docs) -> commit edges(v2, all docs) -> read v1.

    Proves snapshot isolation on the materialized graph: the v1 read after
    the v2 commit still returns exactly the even-document edge counts (the
    oracle recomputes them), i.e. commits never rewrite published versions
    and time travel resolves through the manifest, not the hint.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hebrew_ner_spark.plans import snapshots as snap

    root = tempfile.mkdtemp(prefix="kg_snap_")
    docs = _docs(spark, sf_dir)
    even = docs.where(F.col("doc_id") % 2 == 0)
    snap.commit_snapshot(
        root, {"edges": kg.triple_counts(even), "nodes": kg.entity_nodes(even)}
    )
    snap.commit_snapshot(root, {"edges": kg.triple_counts(docs)})
    # localCheckpoint severs lineage from the temp root's parquet files, so
    # the root can be removed immediately — the returned (tiny) DataFrame
    # stays valid however late the caller forces it, and repeated bench
    # reps leak nothing.
    out = snap.read_snapshot(spark, root, "edges", version=1).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "kg_fact_outliers",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    pairs AS (SELECT pred, subj, obj, count(*) AS n_ev
              FROM t GROUP BY 1, 2, 3),
    per_subj AS (SELECT pred, subj,
                        CAST(count(*) AS BIGINT) AS n_objects,
                        CAST(sum(n_ev) AS BIGINT) AS n_evidence
                 FROM pairs GROUP BY 1, 2),
    prof AS (SELECT pred, count(*) AS n_pairs, count(DISTINCT subj) AS n_subj
             FROM pairs GROUP BY 1)
    SELECT ps.pred, ps.subj, ps.n_objects, ps.n_evidence
    FROM per_subj ps JOIN prof USING (pred)
    WHERE ps.n_objects * prof.n_subj > prof.n_pairs
    """,
)
def kg_fact_outliers(spark, sf_dir):
    """Over-asserting subjects per predicate (strictly above the
    predicate's mean objects-per-subject) — the constraint-violation
    review queue for fusion."""
    return kg.fact_outliers(_docs(spark, sf_dir))


@query(
    "kg_pred_symmetry",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    p AS (SELECT DISTINCT pred, subj, obj FROM t WHERE subj <> obj),
    u AS (SELECT pred, least(subj, obj) AS lo, greatest(subj, obj) AS hi,
                 count(*) AS n_dir
          FROM p GROUP BY 1, 2, 3)
    SELECT pred,
           CAST(sum(n_dir) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN n_dir = 2 THEN 2 ELSE 0 END) AS BIGINT) AS n_sym,
           CAST((2 * sum(CASE WHEN n_dir = 2 THEN 2 ELSE 0 END) * 1000000
                 + sum(n_dir)) // (2 * sum(n_dir)) AS BIGINT) AS sym_1e6
    FROM u GROUP BY pred
    """,
)
def kg_pred_symmetry(spark, sf_dir):
    """Predicate symmetry share (reverse-pair presence) — the
    directionality axis of schema induction, join-free."""
    return kg.predicate_symmetry(_docs(spark, sf_dir))


def _etype_duck(col: str) -> str:
    from hebrew_ner_spark.resources import ENTITY_TYPES

    whens = " ".join(
        f"WHEN {col} = '{t}' THEN '{ty}'" for t, ty in sorted(ENTITY_TYPES.items())
    )
    return f"CASE {whens} END"


@query(
    "kg_pred_domains",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    typed AS (SELECT pred, {_etype_duck("subj")} AS stype,
                     {_etype_duck("obj")} AS otype FROM t),
    ds AS (SELECT pred, stype, count(*) AS cnt FROM typed GROUP BY 1, 2),
    dr AS (SELECT pred, otype, count(*) AS cnt FROM typed GROUP BY 1, 2),
    tot AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_triples FROM typed GROUP BY 1),
    topd AS (SELECT pred, stype, cnt,
                    row_number() OVER (PARTITION BY pred ORDER BY cnt DESC, stype) AS r
             FROM ds),
    topr AS (SELECT pred, otype, cnt,
                    row_number() OVER (PARTITION BY pred ORDER BY cnt DESC, otype) AS r
             FROM dr)
    SELECT tot.pred, n_triples,
           topd.stype AS domain_type,
           CAST((2 * topd.cnt * 1000000 + n_triples) // (2 * n_triples) AS BIGINT)
             AS domain_share_1e6,
           topr.otype AS range_type,
           CAST((2 * topr.cnt * 1000000 + n_triples) // (2 * n_triples) AS BIGINT)
             AS range_share_1e6
    FROM tot JOIN topd ON tot.pred = topd.pred AND topd.r = 1
             JOIN topr ON tot.pred = topr.pred AND topr.r = 1
    """,
)
def kg_pred_domains(spark, sf_dir):
    """Ontology induction: dominant subject/object class per predicate
    with exact integer support shares (operators/kg.py pred_domains —
    codegen CASE typing, (pred, type)-grain aggregates, tiny windows)."""
    return kg.pred_domains(_docs(spark, sf_dir))


@query(
    "kg_ntriples_lines",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    d AS (SELECT DISTINCT subj, pred, obj FROM t)
    SELECT subj, pred, obj,
           '<{catalog.NT_NS}/e/' || subj || '> <{catalog.NT_NS}/p/' || pred
             || '> <{catalog.NT_NS}/e/' || obj || '> .' AS line
    FROM d
    """,
)
def kg_ntriples_lines(spark, sf_dir):
    """Canonical N-Triples serialization of the distinct extracted
    triples (sources/catalog.py ntriples_lines — one codegen
    format_string stage; the escape chain is identity on the closed
    alnum vocabulary, and its non-trivial cases are pytest round-trip
    gated)."""
    from pyspark.sql import functions as F

    triples = kg.doc_triples(_docs(spark, sf_dir)).select("subj", "pred", "obj").distinct()
    return catalog.ntriples_lines(triples)


@query(
    "kg_domain_violations",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    tc AS (SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS n_evidence
           FROM t GROUP BY 1, 2, 3),
    typed AS (SELECT pred, {_etype_duck("subj")} AS stype,
                     {_etype_duck("obj")} AS otype FROM t),
    ds AS (SELECT pred, stype, count(*) AS cnt FROM typed GROUP BY 1, 2),
    dr AS (SELECT pred, otype, count(*) AS cnt FROM typed GROUP BY 1, 2),
    topd AS (SELECT pred, stype AS domain_type,
                    row_number() OVER (PARTITION BY pred ORDER BY cnt DESC, stype) AS r
             FROM ds),
    topr AS (SELECT pred, otype AS range_type,
                    row_number() OVER (PARTITION BY pred ORDER BY cnt DESC, otype) AS r
             FROM dr),
    ind AS (SELECT topd.pred, domain_type, range_type
            FROM topd JOIN topr ON topd.pred = topr.pred AND topd.r = 1 AND topr.r = 1)
    SELECT tc.pred, subj, obj,
           {_etype_duck("subj")} AS stype, {_etype_duck("obj")} AS otype,
           domain_type, range_type, n_evidence,
           CAST({_etype_duck("subj")} <> domain_type AS BIGINT) AS violates_domain,
           CAST({_etype_duck("obj")} <> range_type AS BIGINT) AS violates_range
    FROM tc JOIN ind ON tc.pred = ind.pred
    WHERE {_etype_duck("subj")} <> domain_type OR {_etype_duck("obj")} <> range_type
    """,
)
def kg_domain_violations(spark, sf_dir):
    """Induced-schema validation: distinct triples violating their
    predicate's induced domain/range class (operators/kg.py
    domain_violations — broadcast schema join, codegen typing)."""
    return kg.domain_violations(_docs(spark, sf_dir))


@query(
    "kg_rdf_patch",
    oracle=f"""
    WITH t AS ({_TRIPLES_ORACLE}),
    o AS (SELECT DISTINCT subj, pred, obj FROM t WHERE doc_id % 2 = 0),
    n AS (SELECT DISTINCT subj, pred, obj FROM t WHERE doc_id % 2 = 1),
    u AS (
      SELECT 'A' AS op, subj, pred, obj FROM n
      WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.subj = n.subj
                        AND o.pred = n.pred AND o.obj = n.obj)
      UNION ALL
      SELECT 'D' AS op, subj, pred, obj FROM o
      WHERE NOT EXISTS (SELECT 1 FROM n WHERE n.subj = o.subj
                        AND n.pred = o.pred AND n.obj = o.obj)
    )
    SELECT op, subj, pred, obj,
           op || ' <{catalog.NT_NS}/e/' || subj || '> <{catalog.NT_NS}/p/' || pred
              || '> <{catalog.NT_NS}/e/' || obj || '> .' AS line
    FROM u
    """,
)
def kg_rdf_patch(spark, sf_dir):
    """RDF-Patch delta between the even-doc and odd-doc triple
    snapshots: presence-grain adds/deletes with canonical N-Triples
    serialization (sources/catalog.py rdf_patch_lines — two co-located
    anti-joins + one codegen format stage)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    old = kg.doc_triples(docs.where(F.col("doc_id") % 2 == 0))
    new = kg.doc_triples(docs.where(F.col("doc_id") % 2 != 0))
    return catalog.rdf_patch_lines(old, new)


@query(
    "kg_entity_salience",
    oracle=f"""
    WITH saltoks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    salper AS (
      SELECT doc_id, token AS entity,
             CAST(count(*) AS BIGINT) AS n_mentions,
             CAST(min(word_index) AS BIGINT) AS first_pos
      FROM saltoks
      WHERE token IN ({", ".join(f"'{t}'" for t in ENTITY_TERMS)})
      GROUP BY doc_id, token
    )
    SELECT doc_id, entity, n_mentions, first_pos, rank FROM (
      SELECT doc_id, entity, n_mentions, first_pos,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY n_mentions DESC, first_pos, entity) AS BIGINT) AS rank
      FROM salper) WHERE rank <= {kg.SALIENCE_K}
    """,
)
def kg_entity_salience(spark, sf_dir):
    """Per-document top-k salient entities (frequency, then lead
    position): the doc->entity aboutness index."""
    return kg.entity_salience(_docs(spark, sf_dir))


@query(
    "kg_triple_provenance",
    oracle=f"""
    WITH prvtoks AS (
      SELECT doc_id, text,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS word_index,
             unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    prvstart AS (
      SELECT doc_id, word_index, token,
             CAST(coalesce(sum(length(token) + 1) OVER
               (PARTITION BY doc_id ORDER BY word_index
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS char_start
      FROM prvtoks
    ),
    prvpos AS (
      SELECT doc_id, word_index, token, char_start,
             lag(token)       OVER prvw AS pm1,
             lead(token)      OVER prvw AS pp1,
             lag(char_start)  OVER prvw AS pm1_start,
             lead(char_start) OVER prvw AS pp1_start
      FROM prvstart
      WINDOW prvw AS (PARTITION BY doc_id ORDER BY word_index)
    )
    SELECT doc_id, word_index, pm1 AS subj, token AS pred, pp1 AS obj,
           pm1_start AS subj_start, char_start AS pred_start,
           pp1_start AS obj_start
    FROM prvpos
    WHERE token IN {_PREDS_SQL} AND pm1 IN {_ENTS_SQL} AND pp1 IN {_ENTS_SQL}
    """,
)
def kg_triple_provenance(spark, sf_dir):
    """SVO triples with exact char-offset provenance spans — the oracle
    derives offsets with running-sum windows (different formulation from
    the Spark in-row prefix sums); the substring round-trip invariant is
    pytest-pinned."""
    return kg.triple_provenance(_docs(spark, sf_dir))


@query(
    "kg_bgp_optional",
    oracle=f"""
    WITH bgo_t AS ({_TRIPLES_ORACLE}),
    bgo_c AS (
      SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS n FROM bgo_t
      GROUP BY 1, 2, 3
    ),
    bgo_req AS (
      SELECT subj AS x, obj AS y, CAST(sum(n) AS BIGINT) AS n_witness
      FROM bgo_c WHERE pred = 'join' GROUP BY 1, 2
    ),
    bgo_opt AS (
      SELECT subj AS y, obj AS z, CAST(sum(n) AS BIGINT) AS ow
      FROM bgo_c WHERE pred = 'merge' GROUP BY 1, 2
    )
    SELECT r.x, r.y, coalesce(o.z, '') AS z, r.n_witness,
           CAST(coalesce(o.ow, 0) AS BIGINT) AS n_opt
    FROM bgo_req r LEFT JOIN bgo_opt o ON o.y = r.y
    """,
)
def kg_bgp_optional(spark, sf_dir):
    """Graph pattern with SPARQL OPTIONAL: (?x join ?y) OPTIONAL
    (?y merge ?z) — left-join binding semantics with the '' sentinel for
    unmatched optionals and exact evidence weights on both legs."""
    return kg.bgp_match_optional(_docs(spark, sf_dir))


_etype_case_sql = kg._etype_case


def _hier_values() -> str:
    from hebrew_ner_spark.resources import TYPE_HIERARCHY

    rows = ", ".join(f"('{a}', '{b}')" for a, b in sorted(TYPE_HIERARCHY.items()))
    return f"rdfhier(sub, super) AS (SELECT * FROM (VALUES {rows}))"


@query(
    "kg_rdfs_types",
    oracle=f"""
    WITH RECURSIVE {_hier_values()},
    rdfclos(sub, super, dist) AS (
      SELECT sub, super, 1 FROM rdfhier
      UNION
      SELECT c.sub, h.super, c.dist + 1
      FROM rdfclos c JOIN rdfhier h ON h.sub = c.super
    ),
    rdftoks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    rdfcnt AS (
      SELECT token AS entity, CAST(count(*) AS BIGINT) AS n_mentions,
             {_etype_case_sql("token")} AS dtype
      FROM rdftoks WHERE token IN {_ENTS_SQL} GROUP BY token
    ),
    rdfmin AS (
      SELECT sub, super, CAST(min(dist) AS BIGINT) AS dist
      FROM rdfclos GROUP BY sub, super
    )
    SELECT entity, dtype AS typ, CAST(0 AS BIGINT) AS depth, n_mentions FROM rdfcnt
    UNION ALL
    SELECT c.entity, m.super AS typ, m.dist AS depth, c.n_mentions
    FROM rdfcnt c JOIN rdfmin m ON m.sub = c.dtype
    """,
)
def kg_rdfs_types(spark, sf_dir):
    """RDFS entailment (rdfs9 + rdfs11): direct classes plus every
    inherited superclass per entity, weighted by mention count. Spark
    closes the hierarchy by iterative doubling; the oracle by recursive
    CTE — two independent closure algorithms must agree."""
    return kg.rdfs_entity_types(_docs(spark, sf_dir))


# Functional-conflict review queue: planted facts ('born_in' with %13
# conflict witnesses, non-functional 'visited' control) union the
# organic triples; the functionality threshold is computed over the SAME
# table, so organic predicates (fun ~ 0.09) and the control drop out
# arithmetically. Oracle resolves the keeper with a ranked window vs
# Spark's min(struct) fold. CTE names are fc-prefixed.
_FC_SPAN = kg.FUN_SUBJ_SPAN
_FC_MOD = kg.FUN_CONFLICT_MOD
_FC_CITY = kg.FUN_CITY_MOD

_FC_FACTS = f"""
fcraw AS (
  SELECT 'born_in' AS pred,
         'p' || CAST(doc_id // {_FC_SPAN} AS VARCHAR) AS subj,
         CASE WHEN doc_id % {_FC_MOD} = 0
              THEN 'city_alt' || CAST((doc_id // {_FC_SPAN}) % {_FC_CITY} AS VARCHAR)
              ELSE 'city' || CAST((doc_id // {_FC_SPAN}) % {_FC_CITY} AS VARCHAR)
         END AS obj
  FROM documents
  UNION ALL
  SELECT 'visited', 'p' || CAST(doc_id // {_FC_SPAN} AS VARCHAR),
         'city' || CAST(doc_id % 5 AS VARCHAR)
  FROM documents
  UNION ALL
  SELECT pred, subj, obj FROM ({_TRIPLES_ORACLE})
),
fcfacts AS (
  SELECT pred, subj, obj, CAST(count(*) AS BIGINT) AS n_evidence
  FROM fcraw GROUP BY pred, subj, obj),
fckeep AS (
  SELECT pred FROM (
    SELECT pred, count(*) AS np, count(DISTINCT subj) AS ns
    FROM fcfacts GROUP BY pred)
  WHERE (2000000 * ns + np) // (2 * np) >= {kg.FUN_CONFLICT_MIN_1E6}),
fcr AS (
  SELECT f.pred, f.subj, f.obj, f.n_evidence,
         row_number() OVER (PARTITION BY f.pred, f.subj
                            ORDER BY f.n_evidence DESC, f.obj ASC) AS rk,
         count(*) OVER (PARTITION BY f.pred, f.subj) AS n_obj,
         sum(f.n_evidence) OVER (PARTITION BY f.pred, f.subj) AS n_total
  FROM fcfacts f JOIN fckeep USING (pred))
"""


@query(
    "kg_functional_conflicts",
    oracle=f"""
    WITH {_FC_FACTS}
    SELECT pred, subj, CAST(n_obj AS BIGINT) AS n_obj, obj AS keep_obj,
           CAST(n_evidence AS BIGINT) AS n_keep,
           CAST(n_total AS BIGINT) AS n_total
    FROM fcr WHERE rk = 1 AND n_obj > 1
    """,
)
def kg_functional_conflicts(spark, sf_dir):
    """Conflicting facts under corpus-induced key-like predicates: the
    review queue a KB-quality pass feeds to fusion — keeper by
    (evidence DESC, obj ASC), review mass alongside."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    organic = kg.doc_triples(docs).groupBy("pred", "subj", "obj").agg(
        F.count("*").cast("long").alias("n_evidence")
    )
    facts = kg.synth_functional_facts(docs).unionByName(organic).groupBy(
        "pred", "subj", "obj"
    ).agg(F.sum("n_evidence").cast("long").alias("n_evidence"))
    return kg.functional_conflicts(facts)


# ---------------------------------------------------------------------------
# Temporal fact validity intervals (kg.fact_intervals)
# ---------------------------------------------------------------------------

_FACT_SNAPS = f"""
    fi_t AS ({_TRIPLES_ORACLE}),
    fi_d AS (SELECT DISTINCT doc_id, subj, pred, obj FROM fi_t),
    fi_s AS (
      SELECT DISTINCT vv.v, subj, pred, obj
      FROM fi_d, (SELECT unnest(range(4)) AS v) vv
      WHERE (doc_id + vv.v) % 3 <> 0
    )
"""


@query(
    "kg_fact_intervals",
    oracle=f"""
    WITH {_FACT_SNAPS},
    fi_i AS (
      SELECT *, v - row_number()
                 OVER (PARTITION BY subj, pred, obj ORDER BY v) AS island
      FROM fi_s
    )
    SELECT subj, pred, obj,
           min(v) AS v_from, max(v) AS v_to,
           CAST(count(*) AS BIGINT) AS n_snaps,
           CAST(CASE WHEN max(v) = 3 THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM fi_i GROUP BY subj, pred, obj, island
    """,
)
def kg_fact_intervals(spark, sf_dir):
    """SCD-2 temporal validity intervals per fact across 4 deterministic
    crawl snapshots: maximal runs of consecutive crawls asserting the
    fact (gaps-and-islands), with the open-at-latest flag. Facts with a
    presence gap yield multiple interval rows."""
    return kg.fact_intervals(kg.synth_fact_snapshots(_docs(spark, sf_dir)))


@query(
    "kg_facts_asof",
    oracle=f"""
    WITH {_FACT_SNAPS},
    fa_i AS (
      SELECT *, v - row_number()
                 OVER (PARTITION BY subj, pred, obj ORDER BY v) AS island
      FROM fi_s
    ),
    fa_iv AS (
      SELECT subj, pred, obj, min(v) AS v_from, max(v) AS v_to
      FROM fa_i GROUP BY subj, pred, obj, island
    )
    SELECT subj, pred, obj, v_from, v_to
    FROM fa_iv WHERE v_from <= 2 AND v_to >= 2
    """,
)
def kg_facts_asof(spark, sf_dir):
    """Point-in-time KG read at crawl 2: the validity interval covering
    the version — at most one row per fact (intervals are disjoint)."""
    return kg.facts_asof(kg.synth_fact_snapshots(_docs(spark, sf_dir)), 2)


@query(
    "kg_retract_on_delete",
    oracle=f"""
    WITH rd_t AS ({_TRIPLES_ORACLE}),
    rd_d AS (SELECT DISTINCT doc_id, subj, pred, obj FROM rd_t)
    SELECT subj, pred, obj,
           CAST(count(*) AS BIGINT) AS n_before,
           CAST(sum(CASE WHEN doc_id % 23 = 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_after,
           CAST(CASE WHEN sum(CASE WHEN doc_id % 23 = 0 THEN 0 ELSE 1 END) = 0
                THEN 1 ELSE 0 END AS BIGINT) AS retracted
    FROM rd_d GROUP BY subj, pred, obj
    """,
)
def kg_retract_on_delete(spark, sf_dir):
    """Deletion-request propagation: per-fact evidence before/after the
    planted tombstone set; facts with zero surviving evidence retract."""
    return kg.retract_on_delete(_docs(spark, sf_dir))


@query(
    "kg_interval_delta",
    # the FULL recompute over all 4 crawls — the incremental fold must
    # reproduce it exactly (opposite constructions)
    oracle=f"""
    WITH {_FACT_SNAPS},
    fd_i AS (
      SELECT *, v - row_number()
                 OVER (PARTITION BY subj, pred, obj ORDER BY v) AS island
      FROM fi_s
    )
    SELECT subj, pred, obj,
           min(v) AS v_from, max(v) AS v_to,
           CAST(count(*) AS BIGINT) AS n_snaps,
           CAST(CASE WHEN max(v) = 3 THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM fd_i GROUP BY subj, pred, obj, island
    """,
)
def kg_interval_delta(spark, sf_dir):
    """Incremental SCD-2 maintenance: intervals over crawls 0..2 plus a
    delta fold of crawl 3 — gated equal to the from-scratch recompute."""
    from pyspark.sql import functions as F

    snaps = kg.synth_fact_snapshots(_docs(spark, sf_dir))
    prev = kg.fact_intervals(snaps.where(F.col("v") < 3), n_versions=4)
    return kg.fact_intervals_delta(prev, snaps.where(F.col("v") == 3), 3)


@query(
    "kg_subclass_cycles",
    oracle=f"""
    WITH RECURSIVE {_TOKS_CTE},
    cyc_de AS (SELECT DISTINCT doc_id, token FROM toks
               WHERE token IN {_ENTS_SQL}),
    cyc_f AS (SELECT token, count(*) AS c FROM cyc_de GROUP BY 1),
    cyc_p AS (SELECT x.token AS hyper, y.token AS hypo, count(*) AS c_both
              FROM cyc_de x JOIN cyc_de y
                ON x.doc_id = y.doc_id AND x.token <> y.token
              GROUP BY 1, 2),
    cyc_e AS (
      SELECT p.hypo AS src, p.hyper AS dst
      FROM cyc_p p JOIN cyc_f fb ON p.hypo = fb.token
      WHERE fb.c >= 3
        AND (2000000 * p.c_both + fb.c) // (2 * fb.c) >= 800000
    ),
    cyc_n AS (SELECT DISTINCT v FROM
              (SELECT src AS v FROM cyc_e UNION ALL SELECT dst FROM cyc_e)),
    cyc_r(a, b) AS (
      SELECT src, dst FROM cyc_e
      UNION
      SELECT r.a, e.dst FROM cyc_r r JOIN cyc_e e ON r.b = e.src
    ),
    cyc_m AS (
      SELECT r1.a AS u, r1.b AS w FROM cyc_r r1
      JOIN cyc_r r2 ON r1.a = r2.b AND r1.b = r2.a
      UNION SELECT v, v FROM cyc_n
    ),
    cyc_l AS (SELECT u AS entity, min(w) AS cycle_id FROM cyc_m GROUP BY u)
    SELECT entity, cycle_id,
           CAST(count(*) OVER (PARTITION BY cycle_id) AS BIGINT) AS cycle_size
    FROM cyc_l
    QUALIFY count(*) OVER (PARTITION BY cycle_id) > 1
    """,
)
def kg_subclass_cycles(spark, sf_dir):
    """Ontology-consistency audit: subsumption-candidate SCCs of size >
    1 (taxonomy cycles) via the distributed peeling SCC, vs the exact
    mutual-reachability closure."""
    return kg.subclass_cycles(_docs(spark, sf_dir))


# Query windows for the interval-overlap join: two unit windows, one
# point window, one full-range window (the full-range row exercises the
# first-overlap-bin dedup — it shares BOTH bins with long intervals).
_OVERLAP_WINDOWS = [(0, 0, 1), (1, 1, 2), (2, 3, 3), (3, 0, 3)]
_OVERLAP_WIN_SQL = ", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _OVERLAP_WINDOWS)


@query(
    "kg_interval_overlap",
    oracle=f"""
    WITH {_FACT_SNAPS},
    io_i AS (
      SELECT *, v - row_number()
                 OVER (PARTITION BY subj, pred, obj ORDER BY v) AS island
      FROM fi_s
    ),
    io_iv AS (
      SELECT subj, pred, obj,
             CAST(min(v) AS BIGINT) AS v_from, CAST(max(v) AS BIGINT) AS v_to
      FROM io_i GROUP BY subj, pred, obj, island
    ),
    io_w(w_id, w_from, w_to) AS (VALUES {_OVERLAP_WIN_SQL})
    SELECT CAST(w_id AS BIGINT) AS w_id, subj, pred, obj, v_from, v_to,
           CAST(greatest(v_from, w_from) AS BIGINT) AS ov_from,
           CAST(least(v_to, w_to) AS BIGINT) AS ov_to,
           CAST(least(v_to, w_to) - greatest(v_from, w_from) + 1 AS BIGINT)
             AS ov_len
    FROM io_iv JOIN io_w ON v_from <= w_to AND w_from <= v_to
    """,
)
def kg_interval_overlap(spark, sf_dir):
    """Interval-overlap join (validity intervals x query windows) via
    time-axis binning + first-overlap-bin emission: overlapping pairs
    meet in a plain bin-keyed EQUI-join and each pair is emitted from
    exactly one bin — no theta-join, no distinct pass. The oracle is
    the definitional inequality join (operators/kg.py
    interval_overlap_join)."""
    from pyspark.sql import functions as F

    iv = kg.fact_intervals(kg.synth_fact_snapshots(_docs(spark, sf_dir))).select(
        "subj", "pred", "obj", F.col("v_from").cast("long"), F.col("v_to").cast("long")
    )
    win = spark.createDataFrame(
        _OVERLAP_WINDOWS, "w_id long, w_from long, w_to long"
    )
    return kg.interval_overlap_join(iv, win)


_SKEW_T = 64  # gate-scale target rows/key (production default is 4096)


@query(
    "kg_skew_audit",
    oracle=f"""
    WITH sk_t AS ({_TRIPLES_ORACLE}),
    sk_per AS (SELECT subj, CAST(count(*) AS BIGINT) AS c FROM sk_t GROUP BY 1),
    sk_agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(c) AS BIGINT) AS max_key_rows
      FROM sk_per
    )
    SELECT n_rows, n_keys, max_key_rows,
           (SELECT subj FROM sk_per ORDER BY c DESC, subj DESC LIMIT 1)
             AS max_key,
           CAST((2 * n_rows * 1000000 + n_keys) // (2 * n_keys) AS BIGINT)
             AS mean_key_rows_1e6,
           CAST((2 * max_key_rows * n_keys * 1000000 + n_rows) // (2 * n_rows)
                AS BIGINT) AS skew_ratio_1e6,
           CAST((max_key_rows + {_SKEW_T} - 1) // {_SKEW_T} AS BIGINT)
             AS salt_factor
    FROM sk_agg
    """,
)
def kg_skew_audit(spark, sf_dir):
    """Pre-flight skew audit of the triple stream's subject key: max/mean
    key mass, exact skew ratio, and the salt fan-out that bounds every
    phase-1 partial at the target (plans/skew.py skew_audit — the same
    module whose salted_count the kg_*_salted gates exercise). The audit
    itself is one count-per-key plus a single argmax fold."""
    from hebrew_ner_spark.plans.skew import skew_audit

    return skew_audit(kg.doc_triples(_docs(spark, sf_dir)), "subj", _SKEW_T)


@query(
    "kg_completeness_capture",
    oracle=f"""
    WITH t0 AS ({_TRIPLES_ORACLE}),
    a AS (SELECT DISTINCT subj, pred, obj FROM t0 WHERE doc_id % 2 = 0),
    b AS (SELECT DISTINCT subj, pred, obj FROM t0 WHERE doc_id % 2 = 1),
    n1 AS (SELECT pred, count(*) AS n1 FROM a GROUP BY pred),
    n2 AS (SELECT pred, count(*) AS n2 FROM b GROUP BY pred),
    m AS (SELECT pred, count(*) AS n_both
          FROM a JOIN b USING (subj, pred, obj) GROUP BY pred),
    obs AS (SELECT pred, count(*) AS n_observed
            FROM (SELECT DISTINCT subj, pred, obj FROM t0) GROUP BY pred),
    per AS (
      SELECT obs.pred,
             CAST(coalesce(n1.n1, 0) AS BIGINT) AS n1,
             CAST(coalesce(n2.n2, 0) AS BIGINT) AS n2,
             CAST(coalesce(m.n_both, 0) AS BIGINT) AS n_both,
             CAST(obs.n_observed AS BIGINT) AS n_observed
      FROM obs
      LEFT JOIN n1 USING (pred) LEFT JOIN n2 USING (pred)
      LEFT JOIN m USING (pred)
    ),
    tot AS (
      SELECT * FROM per
      UNION ALL
      SELECT '{kg.CAPTURE_ALL}', CAST(sum(n1) AS BIGINT),
             CAST(sum(n2) AS BIGINT), CAST(sum(n_both) AS BIGINT),
             CAST(sum(n_observed) AS BIGINT)
      FROM per
    )
    SELECT pred, n1, n2, n_both, n_observed,
           CASE WHEN n_both = 0 THEN CAST(0 AS BIGINT)
                ELSE (2 * n1 * n2 + n_both) // (2 * n_both) END AS est_lp,
           (2 * (n1 + 1) * (n2 + 1) + (n_both + 1)) // (2 * (n_both + 1)) - 1
             AS est_chapman
    FROM tot
    """,
)
def kg_completeness_capture(spark, sf_dir):
    """KB-completeness via capture-recapture over disjoint corpus
    slices: Lincoln-Petersen and Chapman estimates of the extractable
    fact population next to the observed distinct count, per predicate
    + '<all>'. Estimates above n_observed quantify unseen mass."""
    return kg.completeness_capture(_docs(spark, sf_dir))
