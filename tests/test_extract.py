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
