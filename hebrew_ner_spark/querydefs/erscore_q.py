"""Gates for Fellegi-Sunter record-linkage scoring (operators/erscore.py).

The gated corpus plants labeled matches the dedup way (byte-identical
copies of docs 0-2), with one twist: each group's last copy flips its
``lang`` to 'xx', so the language field is genuinely probabilistic
under the match hypothesis (m_lang < 1) instead of degenerate — the
case Fellegi-Sunter exists for. The oracle replays the whole chain:
value-histogram u, gold-group m, smoothed bitlen weights, LSH-candidate
scoring. CTE names er-prefixed where new; the signature/band CTEs are
the dedup_q builders over the planted table."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.functions.hashing import phash_duck, shingles_duck
from hebrew_ner_spark.operators import dedup, erscore, textstats
from hebrew_ner_spark.querydefs.dedup_q import _bands_cte
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table

_COPIES = 4
FK = textstats.FINGERPRINT_K

_ER_DOCS = f"""
docs2 AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT 2000000 + doc_id * 100 + r AS doc_id, text,
         CASE WHEN r = {_COPIES - 1} THEN 'xx' ELSE lang END AS lang
  FROM documents CROSS JOIN (SELECT unnest(range(0, {_COPIES})) AS r)
  WHERE doc_id < 3
)
"""

# per-doc comparison vector over the planted table
_ER_FIELDS = f"""
erf AS (
  SELECT d.doc_id, d.lang,
         CAST(length(bin(len(string_split(d.text, ' ')))) AS BIGINT) AS lb,
         CASE WHEN len(s.sh) = 0 THEN {phash_duck('d.text', 0)}
              ELSE list_min(list_transform(s.sh, x -> {phash_duck('x', 0)}))
         END AS fp
  FROM docs2 d
  JOIN (SELECT doc_id,
               {shingles_duck("string_split(text, ' ')", FK)} AS sh
        FROM docs2) s ON d.doc_id = s.doc_id
)
"""


def _stats_sql(field: str) -> str:
    """One field's smoothed weight row (ordered-pair counts)."""
    return f"""
    SELECT '{field}' AS field,
           m.m_num, m.m_den, u.u_num, u.u_den,
           CAST(length(bin((m.m_num + 1) * (u.u_den + 2)))
                - length(bin((m.m_den + 2) * (u.u_num + 1))) AS BIGINT)
             AS w_agree,
           CAST(length(bin((m.m_den - m.m_num + 1) * (u.u_den + 2)))
                - length(bin((m.m_den + 2) * (u.u_den - u.u_num + 1))) AS BIGINT)
             AS w_disagree
    FROM (
      SELECT CAST(coalesce(sum(c * (c - 1)), 0) AS BIGINT) AS u_num,
             CAST((SELECT count(*) FROM erf) * ((SELECT count(*) FROM erf) - 1)
                  AS BIGINT) AS u_den
      FROM (SELECT {field}, count(*) AS c FROM erf GROUP BY {field})
    ) u,
    (
      SELECT CAST(coalesce((
               SELECT sum(c * (c - 1)) FROM (
                 SELECT g, {field}, count(*) AS c
                 FROM (SELECT md5(d.text) AS g, e.{field}
                       FROM docs2 d JOIN erf e ON d.doc_id = e.doc_id) t
                 GROUP BY g, {field})), 0) AS BIGINT) AS m_num,
             CAST(coalesce((
               SELECT sum(c * (c - 1)) FROM (
                 SELECT md5(text) AS g, count(*) AS c
                 FROM docs2 GROUP BY md5(text))), 0) AS BIGINT) AS m_den
    ) m
    """


def _er_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    copies = (
        docs.where(F.col("doc_id") < 3)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(_COPIES - 1))).alias("r"),
            "text",
            "lang",
        )
        .select(
            (F.lit(2000000) + F.col("doc_id") * 100 + F.col("r")).alias("doc_id"),
            "text",
            F.when(F.col("r") == _COPIES - 1, F.lit("xx"))
            .otherwise(F.col("lang"))
            .alias("lang"),
        )
    )
    return docs.unionByName(copies)


@query(
    "er_field_stats",
    oracle=f"""
    WITH {_ER_DOCS}, {_ER_FIELDS}
    SELECT * FROM ({_stats_sql('fp')})
    UNION ALL SELECT * FROM ({_stats_sql('lang')})
    UNION ALL SELECT * FROM ({_stats_sql('lb')})
    """,
)
def er_field_stats(spark, sf_dir):
    """The three-field weight table: m from the planted gold groups
    (lang genuinely < 1 via the flipped copy), u from value histograms,
    weights as smoothed bitlen log-odds."""
    return erscore.field_stats(_er_docs(spark, sf_dir))


@query(
    "er_pair_scores",
    oracle=f"""
    WITH {_ER_DOCS}, {_ER_FIELDS}, {_bands_cte('docs2')},
    erst AS (
      SELECT * FROM ({_stats_sql('fp')})
      UNION ALL SELECT * FROM ({_stats_sql('lang')})
      UNION ALL SELECT * FROM ({_stats_sql('lb')})
    ),
    erw AS (
      SELECT max(CASE WHEN field = 'fp' THEN w_agree END) AS fp_wa,
             max(CASE WHEN field = 'fp' THEN w_disagree END) AS fp_wd,
             max(CASE WHEN field = 'lang' THEN w_agree END) AS lang_wa,
             max(CASE WHEN field = 'lang' THEN w_disagree END) AS lang_wd,
             max(CASE WHEN field = 'lb' THEN w_agree END) AS lb_wa,
             max(CASE WHEN field = 'lb' THEN w_disagree END) AS lb_wd
      FROM erst
    ),
    erc AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands l
      JOIN (SELECT band, band_key FROM bands
            GROUP BY band, band_key
            HAVING count(DISTINCT doc_id) <= {dedup.MAX_BUCKET}) ok
        ON ok.band = l.band AND ok.band_key = l.band_key
      JOIN bands r
        ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
    ),
    ersc AS (
      SELECT c.doc_a, c.doc_b,
             CAST((CASE WHEN a.fp = b.fp THEN w.fp_wa ELSE w.fp_wd END)
                  + (CASE WHEN a.lang = b.lang THEN w.lang_wa ELSE w.lang_wd END)
                  + (CASE WHEN a.lb = b.lb THEN w.lb_wa ELSE w.lb_wd END)
                  AS BIGINT) AS score
      FROM erc c
      JOIN erf a ON a.doc_id = c.doc_a
      JOIN erf b ON b.doc_id = c.doc_b
      CROSS JOIN erw w
    )
    SELECT doc_a, doc_b, score,
           CAST(CASE WHEN score >= {erscore.ER_THRESH} THEN 1 ELSE 0 END
                AS BIGINT) AS is_match
    FROM ersc
    """,
)
def er_pair_scores(spark, sf_dir):
    """Fellegi-Sunter classification of the LSH blocking candidates over
    the planted corpus — gold clusters must classify as matches, and the
    flipped-lang copies survive on the strength of the other fields."""
    return erscore.pair_scores(_er_docs(spark, sf_dir))


@query(
    "er_resolution",
    oracle=f"""
    WITH RECURSIVE {_ER_DOCS}, {_ER_FIELDS}, {_bands_cte('docs2')},
    erst AS (
      SELECT * FROM ({_stats_sql('fp')})
      UNION ALL SELECT * FROM ({_stats_sql('lang')})
      UNION ALL SELECT * FROM ({_stats_sql('lb')})
    ),
    erw AS (
      SELECT max(CASE WHEN field = 'fp' THEN w_agree END) AS fp_wa,
             max(CASE WHEN field = 'fp' THEN w_disagree END) AS fp_wd,
             max(CASE WHEN field = 'lang' THEN w_agree END) AS lang_wa,
             max(CASE WHEN field = 'lang' THEN w_disagree END) AS lang_wd,
             max(CASE WHEN field = 'lb' THEN w_agree END) AS lb_wa,
             max(CASE WHEN field = 'lb' THEN w_disagree END) AS lb_wd
      FROM erst
    ),
    erc AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands l
      JOIN (SELECT band, band_key FROM bands
            GROUP BY band, band_key
            HAVING count(DISTINCT doc_id) <= {dedup.MAX_BUCKET}) ok
        ON ok.band = l.band AND ok.band_key = l.band_key
      JOIN bands r
        ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
    ),
    erm AS (
      SELECT c.doc_a, c.doc_b
      FROM erc c
      JOIN erf a ON a.doc_id = c.doc_a
      JOIN erf b ON b.doc_id = c.doc_b
      CROSS JOIN erw w
      WHERE (CASE WHEN a.fp = b.fp THEN w.fp_wa ELSE w.fp_wd END)
            + (CASE WHEN a.lang = b.lang THEN w.lang_wa ELSE w.lang_wd END)
            + (CASE WHEN a.lb = b.lb THEN w.lb_wa ELSE w.lb_wd END)
            >= {erscore.ER_THRESH}
    ),
    eru AS (SELECT doc_a AS a, doc_b AS b FROM erm
            UNION SELECT doc_b, doc_a FROM erm),
    errch AS (
      SELECT doc_id AS v, doc_id AS r FROM docs2
      UNION
      SELECT rc.v, e.b FROM errch rc JOIN eru e ON e.a = rc.r
    )
    SELECT v AS doc_id, CAST(min(r) AS BIGINT) AS component,
           CAST(CASE WHEN v = min(r) THEN 1 ELSE 0 END AS BIGINT)
             AS is_canonical
    FROM errch GROUP BY v
    """,
)
def er_resolution(spark, sf_dir):
    """The composed ER lifecycle (block -> score -> threshold -> CC ->
    canonical pick) vs an exact recursive transitive closure of the
    oracle-replayed match edges — the gate a production linker's output
    contract corresponds to."""
    return erscore.resolution_pipeline(_er_docs(spark, sf_dir))
