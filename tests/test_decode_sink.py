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


def test_nbest_decode_sink_roundtrip(spark, tmp_path):
    """S11 sink (utils/data.py:399-442 format): '# s1 s2 s3' header +
    'token l1 l2 l3' lines round-trip to the exact n-best label table,
    and headers carry one '%.4f' share per rank."""
    import re

    from pyspark.sql import functions as F

    from hebrew_ner_spark.operators import crf
    from hebrew_ner_spark.sources.catalog import (
        read_nbest_decoded_text,
        write_nbest_decoded_text,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id < 20")
    toks = docs.select(
        "doc_id", F.slice(F.split("text", " "), 1, 4).alias("toks")
    )
    nbest = crf.nbest_labels(toks, k=3).cache()
    out = str(tmp_path / "nbest")
    write_nbest_decoded_text(nbest, out, n_partitions=1)

    back_toks, back_hdrs = read_nbest_decoded_text(spark, out)
    bt = back_toks.toPandas()
    bh = back_hdrs.toPandas()
    orig = nbest.toPandas()

    doc_ids = sorted(orig.doc_id.unique())
    seq_to_doc = {i + 1: d for i, d in enumerate(doc_ids)}  # headers start seq at 1
    bt["doc_id"] = bt.doc_seq.map(seq_to_doc)

    key = ["doc_id", "rank", "word_index"]
    a = bt[key + ["token", "label"]].sort_values(key).reset_index(drop=True)
    b = orig[key + ["token", "label"]].sort_values(key).reset_index(drop=True)
    assert a.equals(b)

    # every doc header: 3 share strings at 4 decimals, summing to ~1
    assert set(bh.doc_seq.unique()) == set(seq_to_doc)
    for _, g in bh.groupby("doc_seq"):
        assert g["rank"].tolist() == [1, 2, 3] or sorted(g["rank"]) == [1, 2, 3]
        assert all(re.fullmatch(r"0\.\d{4}", s) for s in g.score_str)
        assert abs(sum(float(s) for s in g.score_str) - 1.0) < 5e-4


class TestNTriplesSink:
    def test_roundtrip_with_hostile_strings(self, spark, tmp_path):
        from hebrew_ner_spark.sources.catalog import (
            ntriples_lines,
            read_ntriples,
            write_ntriples,
        )

        rows = [
            ("plain", "join", "table"),
            ("has space", "a<b", 'quote"mark'),
            ("back\\slash", "per%cent", "curly{brace}"),
            ("pipe|caret^tick`", "p", "o"),
        ]
        triples = spark.createDataFrame(rows, ["subj", "pred", "obj"])
        path = str(tmp_path / "kg.nt")
        write_ntriples(triples, path, n_partitions=1)
        back = {(r.subj, r.pred, r.obj) for r in read_ntriples(spark, path).collect()}
        assert back == set(rows)

    def test_lines_are_valid_ntriples(self, spark):
        import re

        from hebrew_ner_spark.sources.catalog import ntriples_lines

        triples = spark.createDataFrame(
            [("has space", "a<b", 'quote"mark')], ["subj", "pred", "obj"]
        )
        [r] = ntriples_lines(triples).collect()
        # no raw space/angle/quote inside any IRI
        m = re.match(r"^<([^<>\" ]+)> <([^<>\" ]+)> <([^<>\" ]+)> \.$", r.line)
        assert m, r.line


class TestRdfPatch:
    def test_adds_deletes_and_shared_triples(self, spark):
        from hebrew_ner_spark.sources.catalog import rdf_patch_lines

        old = spark.createDataFrame(
            [("a", "p", "b"), ("c", "p", "d")], ["subj", "pred", "obj"]
        )
        new = spark.createDataFrame(
            [("a", "p", "b"), ("e", "p", "f")], ["subj", "pred", "obj"]
        )
        got = {(r.op, r.subj, r.pred, r.obj): r.line
               for r in rdf_patch_lines(old, new).collect()}
        assert set(got) == {("A", "e", "p", "f"), ("D", "c", "p", "d")}
        assert got[("A", "e", "p", "f")].startswith("A <")
        assert got[("A", "e", "p", "f")].endswith("> .")

    def test_evidence_count_changes_are_not_patch_ops(self, spark):
        from hebrew_ner_spark.sources.catalog import rdf_patch_lines

        # same triple asserted twice in new: presence unchanged -> no op
        old = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
        new = spark.createDataFrame(
            [("a", "p", "b"), ("a", "p", "b")], ["subj", "pred", "obj"]
        )
        assert rdf_patch_lines(old, new).count() == 0
