"""Optimistic-concurrency commit validation: hand-computed verdicts
including the failure cascade, fresh-base success, table independence."""

from hebrew_ner_spark.operators import commitlog as cl


def _validate(spark, rows):
    df = spark.createDataFrame(
        rows, "table_id long, seq long, base long, file_id string, action string"
    )
    return {
        (r.table_id, r.seq): r.ok for r in cl.validate_commits(df).collect()
    }


class TestCommitValidation:
    def test_stale_base_conflict_and_cascade(self, spark):
        # t0: c0 deletes f1 (ok — nothing earlier).
        # c1 (base -1, did not see c0) also deletes f1 -> CONFLICT.
        # c2 (base 0, saw c0 but not c1) deletes f1: the only unseen
        # deleter is c1, which FAILED -> c2 is ok (the cascade).
        rows = [
            (0, 0, -1, "f1", "del"),
            (0, 1, -1, "f1", "del"),
            (0, 2, 0, "f1", "del"),
        ]
        assert _validate(spark, rows) == {(0, 0): 1, (0, 1): 0, (0, 2): 1}

    def test_fresh_base_never_conflicts(self, spark):
        # c1 staged against base 0 (saw c0's delete) may re-delete f1
        rows = [
            (0, 0, -1, "f1", "del"),
            (0, 1, 0, "f1", "del"),
        ]
        assert _validate(spark, rows) == {(0, 0): 1, (0, 1): 1}

    def test_disjoint_files_never_conflict(self, spark):
        rows = [
            (0, 0, -1, "f1", "del"),
            (0, 1, -1, "f2", "del"),
            (0, 2, -1, "f3", "add"),
        ]
        got = _validate(spark, rows)
        assert got == {(0, 0): 1, (0, 1): 1, (0, 2): 1}

    def test_tables_are_independent(self, spark):
        rows = [
            (0, 0, -1, "f1", "del"),
            (1, 1, -1, "f1", "del"),  # same file name, other table
        ]
        assert _validate(spark, rows) == {(0, 0): 1, (1, 1): 1}

    def test_adds_never_block(self, spark):
        rows = [
            (0, 0, -1, "f1", "add"),
            (0, 1, -1, "f1", "del"),  # only c0's ADD touched f1 earlier
        ]
        assert _validate(spark, rows) == {(0, 0): 1, (0, 1): 1}

    def test_corpus_log_has_real_contention(self, spark, sf_dir):
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        v = cl.validate_commits(cl.synth_commit_log(docs)).collect()
        oks = sum(1 for r in v if r.ok == 1)
        assert 0 < oks < len(v)  # both verdicts present
