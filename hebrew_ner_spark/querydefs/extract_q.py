"""HTML-extraction query: the byte-identical per-row invariant, gated.

The synthesized page contributes a known 'doc N Document N ' prefix
(title + h1 survive extraction); the body must come back byte-identical,
so the oracle states the full expected string per document.
"""

from __future__ import annotations

from hebrew_ner_spark.operators import extract
from hebrew_ner_spark.registry import query
from hebrew_ner_spark.sources.catalog import load_table


@query(
    "ext_text",
    oracle="""
    SELECT doc_id,
           'doc ' || CAST(doc_id AS VARCHAR) || ' Document ' ||
           CAST(doc_id AS VARCHAR) || ' ' || text AS extracted
    FROM documents
    """,
)
def ext_text(spark, sf_dir):
    return extract.extracted(load_table(spark, sf_dir, "documents"))


@query(
    "ext_webpages",
    oracle="""
    SELECT 'https://example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
           epoch_ms(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND) AS warc_ms,
           'doc ' || CAST(doc_id AS VARCHAR) || ' Document ' ||
           CAST(doc_id AS VARCHAR) || ' ' || text AS extracted
    FROM documents
    """,
)
def ext_webpages(spark, sf_dir):
    """The input_hint invariant end-to-end: synthesize the CC-style page
    table (url, warc_ts, html, text, lang), run the Arrow extractor over
    the html binary, and demand byte-identical text per url (plus the
    deterministic warc_ts)."""
    from pyspark.sql import functions as F

    pages = extract.synth_webpages(load_table(spark, sf_dir, "documents"))
    return (
        extract.extract_webpages(pages)
        .join(pages.select("url", "warc_ts"), "url")
        .select(
            "url", F.unix_millis("warc_ts").alias("warc_ms"), "extracted"
        )
    )


from hebrew_ner_spark.sources.warc import (  # noqa: E402
    PAGES_PER_SEGMENT as _PAGES_PER_SEGMENT,
)


@query(
    "ext_warc_roundtrip",
    oracle=f"""
    SELECT doc_id // {_PAGES_PER_SEGMENT} AS segment_id,
           'https://example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
           '2024-01-01T00:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || 'Z'
             AS warc_date,
           text
    FROM documents
    """,
)
def ext_warc_roundtrip(spark, sf_dir):
    """WARC segment ingestion end to end: synthesize length-framed
    segment files (one binary blob per ~50 pages), walk them back out
    with the mapInPandas record parser, and demand every (url, date,
    payload) byte-identically — octet (not char) Content-Length framing
    over multi-byte Hebrew text is exactly what this gate would catch."""
    from hebrew_ner_spark.sources import warc

    docs = load_table(spark, sf_dir, "documents")
    return warc.parse_warc_segments(warc.synth_warc_segments(docs))


from hebrew_ner_spark.querydefs.kg_chain import (  # noqa: E402
    _TRIPLES_ORACLE as _WARC_TRIPLES_ORACLE,
)


@query("ext_warc_to_triples", oracle=_WARC_TRIPLES_ORACLE)
def ext_warc_to_triples(spark, sf_dir):
    """Ingestion-to-extraction lifecycle: WARC segment files -> record
    parser -> doc_id recovered from the record URI -> the production
    triple extractor — the first half of the 10^12-page job, end to end
    from raw bytes. Oracle is kg_triples' own (the parse layer must be
    invisible to extraction)."""
    from pyspark.sql import functions as F

    from hebrew_ner_spark.operators import kg
    from hebrew_ner_spark.sources import warc

    docs = load_table(spark, sf_dir, "documents")
    parsed = warc.parse_warc_segments(warc.synth_warc_segments(docs))
    recovered = parsed.select(
        F.element_at(F.split("url", "/"), -1).cast("long").alias("doc_id"), "text"
    )
    return kg.doc_triples(recovered)


@query(
    "ext_main_content",
    oracle=f"""
    SELECT 'https://ex' || CAST(doc_id % 4 AS VARCHAR) || '.example.net/p/'
             || CAST(doc_id AS VARCHAR) AS url,
           CAST(2 + (doc_id % 3 + 1) AS BIGINT) AS n_blocks,
           text AS main_text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS main_toks
    FROM documents
    """,
)
def ext_main_content(spark, sf_dir):
    """Token-densest-block main-content extraction over the hyperlinked
    synthetic pages: the body <p> must beat the title and every nav
    anchor, recovering the original text column byte-identically; the
    oracle reconstructs block counts closed-form (title + body +
    doc_id%3+1 anchors) without parsing HTML (operators/extract.py
    main_content — one codegen stage, zero shuffles)."""
    from hebrew_ner_spark.operators import weblinks

    docs = load_table(spark, sf_dir, "documents")
    return extract.main_content(weblinks.synth_linked_pages(docs))


@query(
    "kg_infobox_triples",
    oracle="""
    WITH ib_d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS VARCHAR) AS n_toks,
             'c' || CAST(doc_id % 7 AS VARCHAR) AS cat
      FROM documents WHERE doc_id % 3 = 0)
    SELECT doc_id, 'language' AS pred, lang AS obj FROM ib_d
    UNION ALL
    SELECT doc_id, 'tokens' AS pred, n_toks AS obj FROM ib_d
    UNION ALL
    SELECT doc_id, 'category' AS pred, cat AS obj FROM ib_d
    """,
)
def kg_infobox_triples(spark, sf_dir):
    """Structured-data table mining: attribute triples recovered from
    planted infobox markup must equal the closed-form expectation the
    synthesis derives them from — a true synthesis->extraction round
    trip (operators/extract.py infobox_triples; one codegen stage,
    zero shuffles, zero Python)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract.infobox_triples(extract.synth_html_infobox(docs))


@query(
    "kg_jsonld_triples",
    oracle="""
    WITH ld_d AS (
      SELECT doc_id,
             'https://example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS subj,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'Article'
                  WHEN 1 THEN 'Product' ELSE 'Organization' END AS typ,
             'doc ' || CAST(doc_id AS VARCHAR) AS nm,
             (string_split(text, ' '))[1] AS abt,
             CAST(doc_id % 7 AS VARCHAR) AS posn
      FROM documents)
    SELECT doc_id, subj, 'rdf:type' AS pred, typ AS obj FROM ld_d
    UNION ALL
    SELECT doc_id, subj, 'schema:name' AS pred, nm AS obj FROM ld_d
    UNION ALL
    SELECT doc_id, subj, 'schema:about' AS pred, abt AS obj FROM ld_d
    UNION ALL
    SELECT doc_id, subj, 'schema:position' AS pred, posn AS obj FROM ld_d
    """,
)
def kg_jsonld_triples(spark, sf_dir):
    """Embedded JSON-LD mining (the structured-data path of web KG
    construction): triples parsed out of the ld+json script payload via
    regexp_extract + Catalyst from_json must equal the closed-form
    expectation the synthesis derives them from — a full
    synthesis->parse round trip (operators/extract.py jsonld_triples;
    one codegen stage, zero shuffles, zero Python)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract.jsonld_triples(extract.synth_html_ld(docs))


@query(
    "kg_webtable_triples",
    oracle="""
    WITH wt_d AS (
      SELECT doc_id, lang FROM documents WHERE doc_id % 4 = 0),
    wt_r AS (
      SELECT doc_id, lang, r,
             'e' || CAST(doc_id AS VARCHAR) || '_' || CAST(r AS VARCHAR) AS subj
      FROM wt_d, (SELECT unnest([0, 1]) AS r))
    SELECT doc_id, subj, 'lang' AS pred, lang AS obj FROM wt_r
    UNION ALL
    SELECT doc_id, subj, 'bucket' AS pred,
           'b' || CAST((doc_id + r) % 5 AS VARCHAR) AS obj
    FROM wt_r
    """,
)
def kg_webtable_triples(spark, sf_dir):
    """Relational-table (WebTables) mining: binary-relation triples
    recovered from planted horizontal entity-attribute tables must
    equal the closed-form expectation the synthesis derives them from —
    a true synthesis->extraction round trip INCLUDING the malformed-row
    drop (every 20th page plants a row with the wrong cell count, which
    the oracle never emits; operators/extract.py webtable_triples —
    one codegen stage, zero shuffles, zero Python)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract.webtable_triples(extract.synth_html_webtable(docs))


@query(
    "ext_meta_tags",
    oracle="""
    SELECT doc_id,
           array_to_string(string_split(text, ' ')[1:3], ' ') AS meta_desc,
           'doc ' || CAST(doc_id AS VARCHAR) AS og_title,
           CAST(CASE WHEN doc_id % 7 = 0 AND (doc_id // 7) % 2 = 0
                THEN 1 ELSE 0 END AS BIGINT) AS noindex
    FROM documents
    """,
)
def ext_meta_tags(spark, sf_dir):
    """Head-metadata extraction round trip: description, og:title and
    the attribute-order-insensitive robots noindex flag, vs the closed
    form the synthetic pages encode."""
    from hebrew_ner_spark.sources.catalog import load_table as _lt

    return extract.meta_tags(
        extract.synth_html_meta(_lt(spark, sf_dir, "documents"))
    )


@query(
    "ext_wet_roundtrip",
    oracle="""
    SELECT 'https://example.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)
             AS url,
           epoch_ms(TIMESTAMP '2024-01-01 00:00:00'
                    + doc_id * INTERVAL 1 SECOND) AS warc_ms,
           lang,
           CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
           text,
           CAST(1 AS BIGINT) AS length_ok
    FROM documents
    """,
)
def ext_wet_roundtrip(spark, sf_dir):
    """WET archive round trip: serialize the CC-style page table into
    WARC/1.0 conversion records and parse them back — url, timestamp,
    language, framed Content-Length and payload must all survive, and
    every record must pass the byte-length integrity check."""
    from pyspark.sql import functions as F

    from hebrew_ner_spark.sources.catalog import parse_wet_records, wet_records

    pages = extract.synth_webpages(load_table(spark, sf_dir, "documents"))
    return parse_wet_records(wet_records(pages).select("record")).select(
        "url",
        F.unix_millis("warc_ts").alias("warc_ms"),
        "lang",
        "content_length",
        "text",
        "length_ok",
    )
