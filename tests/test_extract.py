"""Pinned goldens for the HTML -> text extraction kernel + the per-row
byte-identical invariant over the corpus."""

import pytest
from pyspark.sql import functions as F

from hebrew_ner_spark.functions.extract import extract_text
from hebrew_ner_spark.operators import extract

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "html,expected",
    [
        ("<p>hello world</p>", "hello world"),
        ("<script>var x = '<p>not text</p>';</script>real", "real"),
        ("<style>p{color:red}</style>styled", "styled"),
        ("<!-- secret -->visible<!-- more -->", "visible"),
        ("a<br>b</p>c", "a b c"),
        ("&lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39;", "<tag> &amp; \"q\" 's'"),
        ("  lots\n\n of \t space  ", "lots of space"),
        ("line1\r\nline2''quoted''", 'line1 line2"quoted"'),
        ("<div class='x' data-y=\"z\">nested <b>bold</b></div>", "nested bold"),
        ("<SCRIPT>UPPER()</SCRIPT>case", "case"),
    ],
)
def test_extract_goldens(html, expected):
    assert extract_text(html) == expected


def test_amp_decoded_last():
    # '&amp;lt;' must become '&lt;' (literal), NOT '<'
    assert extract_text("&amp;lt;") == "&lt;"


def test_per_row_byte_identical_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = extract.extracted(docs)
    joined = out.join(docs.select("doc_id", "text"), "doc_id")
    bad = joined.where(
        F.col("extracted")
        != F.concat(
            F.lit("doc "), F.col("doc_id").cast("string"),
            F.lit(" Document "), F.col("doc_id").cast("string"),
            F.lit(" "), F.col("text"),
        )
    ).count()
    assert bad == 0
    # the body alone is byte-identical after the known prefix
    one = joined.limit(1).collect()[0]
    prefix = f"doc {one.doc_id} Document {one.doc_id} "
    assert one.extracted[len(prefix):] == one.text


def test_webpages_shape_and_kg_chain_over_urls(spark):
    """The input_hint table (url, warc_ts, html, text, lang) feeds the
    whole chain: html -> extracted text -> triples, keyed by url, must
    equal the triples of the equivalent doc-keyed corpus."""
    from hebrew_ner_spark.operators import kg

    docs = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id < 60")
    pages = extract.synth_webpages(docs).cache()

    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert dict(pages.dtypes)["html"] == "binary"
    assert dict(pages.dtypes)["warc_ts"] == "timestamp"
    assert pages.select("url").distinct().count() == pages.count()

    ext = extract.extract_webpages(pages)
    rekeyed = ext.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        F.col("extracted").alias("text"),
    )
    got = {
        (r.doc_id, r.word_index, r.subj, r.pred, r.obj)
        for r in kg.doc_triples(rekeyed).collect()
    }
    expected_docs = docs.select(
        "doc_id",
        F.concat(
            F.lit("doc "), F.col("doc_id").cast("string"),
            F.lit(" Document "), F.col("doc_id").cast("string"),
            F.lit(" "), F.col("text"),
        ).alias("text"),
    )
    exp = {
        (r.doc_id, r.word_index, r.subj, r.pred, r.obj)
        for r in kg.doc_triples(expected_docs).collect()
    }
    assert got == exp and len(got) > 0


class TestWarcSource:
    def test_payload_containing_warc_magic_parses(self, spark):
        # length framing, not delimiter splitting: a payload that embeds
        # the record header verbatim must round-trip intact
        evil = "body with WARC/1.0\r\n\r\n embedded plus multi-byte שלום"
        docs = spark.createDataFrame(
            [(0, evil, "he"), (1, "plain", "he")],
            "doc_id long, text string, lang string",
        )
        from hebrew_ner_spark.sources import warc

        rows = {
            r.url: r.text
            for r in warc.parse_warc_segments(warc.synth_warc_segments(docs)).collect()
        }
        assert rows["https://example.org/he/doc/0"] == evil
        assert rows["https://example.org/he/doc/1"] == "plain"

    def test_malformed_segment_raises(self, spark):
        from hebrew_ner_spark.sources import warc
        import pytest

        bad = spark.createDataFrame(
            [(0, bytearray(b"WARC/1.0\r\nNo-Length: x\r\n\r\npayload"))],
            "segment_id long, data binary",
        )
        with pytest.raises(Exception):
            warc.parse_warc_segments(bad).collect()

    def test_truncated_payload_raises(self, spark):
        # declared Content-Length past the buffer end must surface, not
        # silently truncate the record
        from hebrew_ner_spark.sources import warc
        import pytest

        blob = (
            b"WARC/1.0\r\nWARC-Target-URI: u\r\nWARC-Date: d\r\n"
            b"Content-Length: 999\r\n\r\nshort"
        )
        bad = spark.createDataFrame(
            [(0, bytearray(blob))], "segment_id long, data binary"
        )
        with pytest.raises(Exception, match="truncated WARC segment"):
            warc.parse_warc_segments(bad).collect()


class TestMainContent:
    def test_densest_block_wins_and_ties_go_first(self, spark):
        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators.extract import main_content

        pages = spark.createDataFrame(
            [
                ("u1", "<html><title>two words</title><p>one two three four</p>"
                       "<a>nav</a></html>"),
                # tie: two 2-token blocks -> the EARLIER one wins
                ("u2", "<html><p>first block</p><p>later block</p></html>"),
            ],
            ["url", "h"],
        ).select("url", F.encode("h", "UTF-8").alias("html"))
        got = {r.url: r for r in main_content(pages).collect()}
        assert got["u1"].main_text == "one two three four"
        assert (got["u1"].main_toks, got["u1"].n_blocks) == (4, 3)
        assert got["u2"].main_text == "first block"

    def test_zero_shuffle_plan(self, spark):
        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators.extract import main_content

        pages = spark.createDataFrame(
            [("u", "<p>a b</p>")], ["url", "h"]
        ).select("url", F.encode("h", "UTF-8").alias("html"))
        plan = main_content(pages)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestInfoboxTriples:
    def test_closed_form_round_trip(self, spark):
        from hebrew_ner_spark.operators.extract import (
            infobox_triples,
            synth_html_infobox,
        )

        docs = spark.createDataFrame(
            [(0, "a b c", "en"), (1, "x y", "de"), (3, "q", "fr")],
            ["doc_id", "text", "lang"],
        )
        got = {
            (r.doc_id, r.pred): r.obj
            for r in infobox_triples(synth_html_infobox(docs)).collect()
        }
        # only doc_id % 3 == 0 carries an infobox
        assert got == {
            (0, "language"): "en",
            (0, "tokens"): "3",
            (0, "category"): "c0",
            (3, "language"): "fr",
            (3, "tokens"): "1",
            (3, "category"): "c3",
        }

    def test_zero_shuffle_plan(self, spark):
        from hebrew_ner_spark.operators.extract import (
            infobox_triples,
            synth_html_infobox,
        )

        docs = spark.createDataFrame([(0, "a", "en")], ["doc_id", "text", "lang"])
        plan = (
            infobox_triples(synth_html_infobox(docs))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_handles_arbitrary_table_rows(self, spark):
        # the miner reads the MARKUP, not the synthesis: a handwritten
        # page with extra rows and no planted fields still parses
        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators.extract import infobox_triples

        html = (
            "<html><body><table><tr><th>born</th><td>1912</td></tr>"
            "<tr><th>field</th><td>logic</td></tr></table></body></html>"
        )
        pages = spark.createDataFrame([(9, html)], ["doc_id", "h"]).select(
            "doc_id", F.encode("h", "UTF-8").alias("html")
        )
        got = {(r.pred, r.obj) for r in infobox_triples(pages).collect()}
        assert got == {("born", "1912"), ("field", "logic")}


class TestJsonLd:
    def test_extractor_strips_ld_block(self, spark):
        """Text extraction must be identical with and without the
        embedded JSON-LD block — structured data never leaks into the
        extracted text (the byte-identity invariant is preserved)."""
        from hebrew_ner_spark.operators import extract

        docs = spark.createDataFrame(
            [(7, "table scan row", "he")], "doc_id long, text string, lang string"
        )
        a = extract.synth_html(docs).select(
            extract.extract_udf(F.col("html")).alias("t")
        ).collect()[0].t
        b = extract.synth_html_ld(docs).select(
            extract.extract_udf(F.col("html")).alias("t")
        ).collect()[0].t
        assert a == b

    def test_malformed_payload_drops_not_crashes(self, spark):
        from hebrew_ner_spark.operators import extract

        pages = spark.createDataFrame(
            [
                (0, b'<html><script type="application/ld+json">{broken</script></html>'),
                (1, b"<html><body>no ld at all</body></html>"),
            ],
            "doc_id long, html binary",
        )
        assert extract.jsonld_triples(pages).count() == 0

    def test_triples_closed_form(self, spark):
        from hebrew_ner_spark.operators import extract

        docs = spark.createDataFrame(
            [(4, "key join value", "de")], "doc_id long, text string, lang string"
        )
        got = {
            (r.pred, r.obj)
            for r in extract.jsonld_triples(extract.synth_html_ld(docs)).collect()
        }
        assert got == {
            ("rdf:type", "Product"),      # 4 % 3 == 1
            ("schema:name", "doc 4"),
            ("schema:about", "key"),
            ("schema:position", "4"),     # 4 % 7
        }


class TestWebtableTriples:
    def _pages(self, spark, html):
        return spark.createDataFrame(
            [(0, bytearray(html.encode()))], "doc_id long, html binary"
        )

    def _triples(self, spark, html):
        df = extract.webtable_triples(self._pages(spark, html))
        return sorted((r.subj, r.pred, r.obj) for r in df.collect())

    def test_handwritten_markup(self, spark):
        html = (
            '<html><body><table class="data">'
            "<tr><th>entity</th><th>pop</th><th>area</th></tr>"
            "<tr><td>berlin</td><td>3.6m</td><td>891</td></tr>"
            "<tr><td>paris</td><td>2.1m</td><td>105</td></tr>"
            "</table></body></html>"
        )
        assert self._triples(spark, html) == [
            ("berlin", "area", "891"),
            ("berlin", "pop", "3.6m"),
            ("paris", "area", "105"),
            ("paris", "pop", "2.1m"),
        ]

    def test_malformed_row_dropped_not_crashed(self, spark):
        html = (
            '<table class="data"><tr><th>entity</th><th>x</th></tr>'
            "<tr><td>ok</td><td>1</td></tr>"
            "<tr><td>short</td></tr>"
            "<tr><td>long</td><td>2</td><td>extra</td></tr></table>"
        )
        assert self._triples(spark, html) == [("ok", "x", "1")]

    def test_pages_without_table_or_key_only_header(self, spark):
        assert self._triples(spark, "<html><body>no table</body></html>") == []
        assert (
            self._triples(
                spark,
                '<table class="data"><tr><th>entity</th></tr>'
                "<tr><td>lonely</td></tr></table>",
            )
            == []
        )

    def test_synthesis_round_trip_with_planted_malformed(self, spark):
        docs = spark.createDataFrame(
            [(20, "t", "he"), (3, "t", "en")], "doc_id long, text string, lang string"
        )
        got = self._rows(spark, docs)
        assert got == [
            (20, "e20_0", "bucket", "b0"),
            (20, "e20_0", "lang", "he"),
            (20, "e20_1", "bucket", "b1"),
            (20, "e20_1", "lang", "he"),
        ]

    def _rows(self, spark, docs):
        df = extract.webtable_triples(extract.synth_html_webtable(docs))
        return sorted((r.doc_id, r.subj, r.pred, r.obj) for r in df.collect())


def test_meta_tags_cases(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"),   # 0%7==0, 0//7 even -> noindex
         (7, "one two"),                   # 7%7==0, 7//7 odd -> index,follow
         (5, "x y z")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["meta_desc"], r["og_title"], r["noindex"])
        for r in extract.meta_tags(extract.synth_html_meta(docs)).collect()
    }
    assert got[0] == ("alpha beta gamma", "doc 0", 1)
    assert got[7] == ("one two", "doc 7", 0)   # attribute-order-swapped tag
    assert got[5] == ("x y z", "doc 5", 0)     # no robots tag at all


def test_wet_roundtrip_multibyte_and_crlf(spark):
    import datetime as dt

    from hebrew_ner_spark.sources.catalog import parse_wet_records, wet_records

    pages = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1), "שלום עולם", "he"),      # multibyte
         ("u2", dt.datetime(2024, 1, 2), "line1\r\n\r\nline2", "en")],  # CRLF in payload
        "url string, warc_ts timestamp, text string, lang string",
    )
    got = {
        r["url"]: r
        for r in parse_wet_records(wet_records(pages).select("record")).collect()
    }
    # multibyte: Content-Length counts BYTES (9 chars -> 17 bytes)
    assert got["u1"]["content_length"] == len("שלום עולם".encode()) 
    assert got["u1"]["text"] == "שלום עולם" and got["u1"]["length_ok"] == 1
    # payload CRLFCRLF must NOT re-split the record (limit-2 split)
    assert got["u2"]["text"] == "line1\r\n\r\nline2"
    assert got["u2"]["length_ok"] == 1
    assert got["u2"]["lang"] == "en"


def test_wet_integrity_flags_truncation(spark):
    from pyspark.sql import functions as F

    from hebrew_ner_spark.sources.catalog import parse_wet_records, wet_records
    import datetime as dt

    pages = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1), "full payload text", "en")],
        "url string, warc_ts timestamp, text string, lang string",
    )
    recs = wet_records(pages).select(
        F.expr("substring(record, 1, length(record) - 4)").alias("record")
    )
    got = parse_wet_records(recs).collect()[0]
    assert got["length_ok"] == 0           # truncated fetch detected
