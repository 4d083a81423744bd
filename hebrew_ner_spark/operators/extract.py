"""HTML -> text extraction stage (SURVEY.md §7 stage 2).

``synth_html`` wraps document text in a deterministic page skeleton
(title, script, comments, headers) — the sandbox stand-in for the
``html`` column of the input_hint table. ``extracted`` recovers the text
through the pandas-UDF extractor; the byte-identical invariant is gated
by the `ext_text` oracle (recovered text must hash-equal the original
column over the whole corpus) and pinned goldens.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hebrew_ner_spark.functions.extract import extract_text


def synth_html(docs: DataFrame) -> DataFrame:
    """(doc_id, html binary) — deterministic CC-style page per document."""
    page = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title><script type="text/javascript">var n = 1; if (n < 2) { n = 2; }</script>'),
        F.lit("<style>p { margin: 0; }</style></head><body><!-- header -->"),
        F.lit("<h1>Document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><div><p>"),
        F.col("text"),
        F.lit("</p></div><!-- footer --></body></html>"),
    )
    return docs.select("doc_id", F.encode(page, "UTF-8").alias("html"))


def extract_udf(col):
    @pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(
            lambda b: extract_text(bytes(b).decode("utf-8")) if b is not None else None
        )

    return _extract(col)


def extracted(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, text) through synth html + the extractor.

    The page skeleton contributes 'doc <id> Document <id>' ahead of the
    body text (title + h1 survive extraction, as they should for a real
    page); the body is recovered byte-identically after that prefix.
    """
    html = synth_html(docs)
    return html.select(
        "doc_id",
        extract_udf(F.col("html")).alias("extracted"),
    )


def synth_webpages(docs: DataFrame) -> DataFrame:
    """The north-rule input table, exactly the input_hint shape:
    (url string, warc_ts timestamp, html binary, text string,
    lang string) — a Common-Crawl-style page per document, synthesized
    deterministically (url/timestamp are pure functions of doc_id, html
    is the deterministic page skeleton). In production this is the
    Iceberg scan; every downstream stage keys on ``url``."""
    page = synth_html(docs)
    return docs.join(page, "doc_id").select(
        F.concat(
            F.lit("https://example.org/"),
            F.col("lang"),
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id)"
        ).alias("warc_ts"),
        "html",
        "text",
        "lang",
    )


def extract_webpages(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, ...) -> (url, extracted): the per-row
    byte-identical extraction invariant at the input_hint grain. The
    heavy ``html`` column feeds the Arrow UDF and is pruned immediately
    after; nothing else shuffles."""
    return pages.select("url", extract_udf(F.col("html")).alias("extracted"))


def main_content(pages: DataFrame) -> DataFrame:
    """(url, main_text, main_toks, n_blocks): readability-style
    main-content pick — extract every inter-tag text run and keep the
    token-densest block (ties -> earliest). The text-density heuristic
    behind trafilatura/boilerpipe-class extractors, reduced to its
    engine shape: at 10^12 pages this is ONE narrow codegen stage
    (regexp_extract_all + an array max over per-page blocks) with zero
    shuffles and zero Python — the html column is pruned in the same
    projection. Complements the byte-identical full extraction
    (extract_webpages pins fidelity; this picks the block a curation
    pipeline keeps when nav/header boilerplate must go).
    """
    scored = F.expr(
        """
        array_max(transform(
          regexp_extract_all(decode(html, 'UTF-8'), '>([^<>]+)<', 1),
          (t, i) -> struct(bigint(size(split(t, ' '))) AS n,
                           bigint(-i) AS ni,
                           t AS txt)))
        """
    )
    return pages.select(
        "url",
        F.expr(
            "size(regexp_extract_all(decode(html, 'UTF-8'), '>([^<>]+)<', 1))"
        )
        .cast("long")
        .alias("n_blocks"),
        scored.getField("txt").alias("main_text"),
        scored.getField("n").alias("main_toks"),
    )


def synth_html_infobox(docs: DataFrame) -> DataFrame:
    """(doc_id, html binary): the page skeleton with an infobox TABLE
    planted on every third document — the structured-data synthesis for
    table-mining gates. Fields are pure functions of document columns
    (language, token count, a derived category), so an oracle can state
    the expected triples closed-form while the operator must actually
    recover them from the markup."""
    rows = F.concat(
        F.lit('<table class="infobox">'),
        F.lit("<tr><th>language</th><td>"),
        F.col("lang"),
        F.lit("</td></tr><tr><th>tokens</th><td>"),
        F.size(F.split("text", " ")).cast("string"),
        F.lit("</td></tr><tr><th>category</th><td>c"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("</td></tr></table>"),
    )
    infobox = F.when(F.col("doc_id") % 3 == 0, rows).otherwise(F.lit(""))
    page = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><h1>Document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>"),
        infobox,
        F.lit("<div><p>"),
        F.col("text"),
        F.lit("</p></div></body></html>"),
    )
    return docs.select("doc_id", F.encode(page, "UTF-8").alias("html"))


def infobox_triples(pages: DataFrame) -> DataFrame:
    """(doc_id, pred, obj): table mining — every <tr><th>k</th><td>v</td>
    row of every infobox table becomes an attribute triple keyed by the
    page (the DBpedia-style structured-data source of a KG pipeline,
    complementing the text-pattern extractors in operators/kg.py).

    Engine shape at 10^12 pages: ONE narrow codegen stage — extract the
    <tr> fragments with regexp_extract_all, split each into (pred, obj)
    array-side, explode — zero shuffles, zero Python; the html column is
    pruned inside the same projection. Pages without tables contribute
    nothing (plain explode, not explode_outer, is the semantics)."""
    rows = F.expr(
        r"""
        transform(
          regexp_extract_all(decode(html, 'UTF-8'),
                             '<tr><th>([^<]*)</th><td>([^<]*)</td></tr>', 0),
          r -> named_struct(
                 'pred', regexp_extract(r, '<th>([^<]*)</th>', 1),
                 'obj',  regexp_extract(r, '<td>([^<]*)</td>', 1)))
        """
    )
    return pages.select("doc_id", F.explode(rows).alias("kv")).select(
        "doc_id", F.col("kv.pred").alias("pred"), F.col("kv.obj").alias("obj")
    )


LD_TYPES = ["Article", "Product", "Organization"]


def synth_html_ld(docs: DataFrame) -> DataFrame:
    """(doc_id, html binary) — the page skeleton with an embedded
    schema.org JSON-LD block (CC-style structured data), deterministic
    per document: @type cycles through LD_TYPES by doc_id, ``about`` is
    the document's first token, ``position`` is doc_id mod 7. The block
    sits between head and body so the text extractor must strip it (the
    parity pytest pins extracted(ld page) == extracted(plain page))."""
    t = (
        "CASE CAST(doc_id % 3 AS INT) "
        + " ".join(f"WHEN {i} THEN '{n}'" for i, n in enumerate(LD_TYPES))
        + " END"
    )
    ld = F.concat(
        F.lit('<script type="application/ld+json">{"@id":"https://example.org/'),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit('","@type":"'),
        F.expr(t),
        F.lit('","name":"doc '),
        F.col("doc_id").cast("string"),
        F.lit('","about":"'),
        F.expr("element_at(split(text, ' '), 1)"),
        F.lit('","position":'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("}</script>"),
    )
    page = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title>"),
        ld,
        F.lit("<style>p { margin: 0; }</style></head><body><!-- header -->"),
        F.lit("<h1>Document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><div><p>"),
        F.col("text"),
        F.lit("</p></div><!-- footer --></body></html>"),
    )
    return docs.select("doc_id", F.encode(page, "UTF-8").alias("html"))


_LD_SCHEMA = (
    "struct<`@id`: string, `@type`: string, name: string, about: string,"
    " position: bigint>"
)


def jsonld_triples(pages: DataFrame, key: str = "doc_id") -> DataFrame:
    """(key, subj, pred, obj): schema.org triples mined from embedded
    JSON-LD — the structured-data extraction path every CC KG pipeline
    runs alongside text extraction.

    Stage shape: decode -> regexp_extract the ld+json payload ->
    ``from_json`` (Catalyst's JSON parser, JVM-side — no Python) ->
    one in-row stack to triple grain. Zero shuffles; malformed or
    absent payloads parse to NULL and drop out (never crash). Subject
    is the block's @id, so the triples join the URL-keyed graph
    directly."""
    payload = F.regexp_extract(
        F.decode(F.col("html"), "utf-8"),
        '<script type="application/ld\\+json">(.*?)</script>',
        1,
    )
    j = F.from_json(payload, _LD_SCHEMA)
    return (
        pages.select(key, j.alias("j"))
        .where(F.col("j").isNotNull() & F.col("j.`@id`").isNotNull())
        .select(
            key,
            F.col("j.`@id`").alias("subj"),
            F.expr(
                "explode(filter(array("
                "  struct('rdf:type' AS pred, j.`@type` AS obj),"
                "  struct('schema:name' AS pred, j.name AS obj),"
                "  struct('schema:about' AS pred, j.about AS obj),"
                "  struct('schema:position' AS pred, CAST(j.position AS STRING) AS obj)"
                "), p -> p.obj IS NOT NULL))"
            ).alias("p"),
        )
        .select(key, "subj", F.col("p.pred").alias("pred"), F.col("p.obj").alias("obj"))
    )


def synth_html_webtable(docs: DataFrame) -> DataFrame:
    """(doc_id, html binary): the page skeleton with a RELATIONAL data
    table planted on every fourth document — the WebTables-class
    synthesis (Cafarella et al.: horizontal entity-attribute tables,
    header row + one entity per data row), complementing the vertical
    key-value infobox. Cells are pure functions of document columns so
    the oracle can state the expected triples closed-form while the
    operator must genuinely recover header/row structure from markup.
    Every twentieth document additionally carries a MALFORMED data row
    (cell count != header arity) that extraction must drop — the
    size-guard is non-vacuous at every scale factor."""
    row = lambda r: F.concat(  # noqa: E731
        F.lit("<tr><td>e"),
        F.col("doc_id").cast("string"),
        F.lit(f"_{r}</td><td>"),
        F.col("lang"),
        F.lit("</td><td>b"),
        ((F.col("doc_id") + F.lit(r)) % 5).cast("string"),
        F.lit("</td></tr>"),
    )
    bad = F.when(
        F.col("doc_id") % 20 == 0, F.lit("<tr><td>bad</td></tr>")
    ).otherwise(F.lit(""))
    table = F.concat(
        F.lit('<table class="data"><tr><th>entity</th><th>lang</th>'),
        F.lit("<th>bucket</th></tr>"),
        row(0),
        bad,
        row(1),
        F.lit("</table>"),
    )
    page = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body><h1>Document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>"),
        F.when(F.col("doc_id") % 4 == 0, table).otherwise(F.lit("")),
        F.lit("<div><p>"),
        F.col("text"),
        F.lit("</p></div></body></html>"),
    )
    return docs.select("doc_id", F.encode(page, "UTF-8").alias("html"))


def webtable_triples(pages: DataFrame) -> DataFrame:
    """(doc_id, subj, pred, obj): relational-table mining — each data
    row of a horizontal entity-attribute table yields one triple per
    non-key column, subject = the row's first cell, predicate = the
    header cell above the column (the WebTables binary-relation
    recovery every web-scale KG pipeline runs over CC markup, distinct
    from the vertical infobox path).

    Engine shape at 10^12 pages: ONE narrow codegen stage — extract the
    table payload, the <th> header array and the <td>-bearing rows with
    regexp machinery, then a nested transform + flatten zips each row's
    cells against the header, all array-side — zero shuffles, zero
    Python; the html column is pruned inside the same projection. Rows
    whose cell count differs from the header arity (malformed markup)
    are filtered array-side, and pages without a data table contribute
    nothing (plain explode semantics)."""
    payload = F.regexp_extract(
        F.decode(F.col("html"), "utf-8"), '<table class="data">(.*?)</table>', 1
    )
    staged = pages.select("doc_id", payload.alias("_tbl")).select(
        "doc_id",
        F.expr("regexp_extract_all(_tbl, '<th>([^<]*)</th>', 1)").alias("_hdr"),
        F.expr(
            "transform(regexp_extract_all(_tbl, '<tr>(?:<td>[^<]*</td>)+</tr>', 0),"
            " r -> regexp_extract_all(r, '<td>([^<]*)</td>', 1))"
        ).alias("_rows"),
    )
    triples = F.expr(
        """
        flatten(transform(
          filter(_rows, c -> size(c) = size(_hdr)),
          c -> transform(
                 slice(_hdr, 2, size(_hdr) - 1),
                 (p, i) -> named_struct('subj', element_at(c, 1),
                                        'pred', p,
                                        'obj', element_at(c, i + 2)))))
        """
    )
    return staged.select("doc_id", F.explode(triples).alias("t")).select(
        "doc_id",
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
    )


# ---------------------------------------------------------------------------
# <head> metadata extraction (description, og:title, robots noindex)
# ---------------------------------------------------------------------------


def synth_html_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, html binary) — the page skeleton with a meta block:
    description = first three body tokens, og:title = 'doc {id}', and a
    robots meta on every 7th page alternating noindex / index-follow on
    parity of doc_id DIV 7 — both honoured and ignored robots values
    exist at every scale factor. Attribute order varies between the two
    robots forms (name-first vs content-first) so the extractor cannot
    assume a fixed layout."""
    desc = F.expr("array_join(slice(split(text, ' '), 1, 3), ' ')")
    robots = F.when(
        F.col("doc_id") % 7 == 0,
        F.when(
            (F.col("doc_id") / 7).cast("long") % 2 == 0,
            F.lit('<meta name="robots" content="noindex,nofollow">'),
        ).otherwise(F.lit('<meta content="index,follow" name="robots">')),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title><meta name="description" content="'),
        desc,
        F.lit('"><meta property="og:title" content="doc '),
        F.col("doc_id").cast("string"),
        F.lit('">'),
        robots,
        F.lit("</head><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select("doc_id", F.encode(page, "UTF-8").alias("html"))


def meta_tags(pages: DataFrame) -> DataFrame:
    """(doc_id, meta_desc, og_title, noindex) — head metadata pulled
    with anchored regexps over the decoded page, zero UDFs.

    The description/og:title feed snippet generation and entity naming
    evidence; ``noindex`` (BIGINT 0/1) is the page-level exclusion flag
    an index build MUST honour (serving a noindex page is a compliance
    bug, the robots.txt analogue at page grain). The robots match is
    attribute-order-insensitive: it keys on the content attribute of
    the tag that carries name="robots" anywhere within the same tag.
    Scale shape: three regexp_extracts in one codegen projection over
    the ingestion scan — no shuffle, no second pass.
    """
    h = F.decode(F.col("html"), "UTF-8")
    robots_tag = F.regexp_extract(h, r'<meta\s+[^>]*name="robots"[^>]*>', 0)
    return pages.select(
        "doc_id",
        F.regexp_extract(
            h, r'<meta name="description" content="([^"]*)"', 1
        ).alias("meta_desc"),
        F.regexp_extract(
            h, r'<meta property="og:title" content="([^"]*)"', 1
        ).alias("og_title"),
        F.when(
            F.regexp_extract(robots_tag, r'content="([^"]*)"', 1).contains(
                "noindex"
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("noindex"),
    )
