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
