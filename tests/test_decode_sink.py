"""S10/S1 decode sink round-trip: write 'word label' lines with blank-line
document boundaries, read them back, recover the exact label table."""

from hebrew_ner_spark.operators import kg
from hebrew_ner_spark.sources.catalog import read_decoded_text, write_decoded_text

SF = "/root/testdata/sf0.001"


def test_decode_sink_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    labels = kg.doc_token_labels(docs)
    out = str(tmp_path / "decoded")
    write_decoded_text(labels, out, n_partitions=1)

    back = read_decoded_text(spark, out).toPandas()
    orig = labels.toPandas().sort_values(["doc_id", "word_index"])

    # doc_seq is positional (0..n-1 in doc_id order with single partition)
    doc_ids = sorted(orig.doc_id.unique())
    seq_to_doc = {i: d for i, d in enumerate(doc_ids)}
    back["doc_id"] = back.doc_seq.map(seq_to_doc)

    a = back[["doc_id", "word_index", "token", "label"]].sort_values(
        ["doc_id", "word_index"]).reset_index(drop=True)
    b = orig[["doc_id", "word_index", "token", "label"]].reset_index(drop=True)
    assert a.equals(b)
