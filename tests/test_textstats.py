

class TestTrigramScore:
    def test_common_vs_rare(self, spark):
        # 'abcd' in 9/10 docs -> its trigrams are common; 'zzzz' only in
        # one -> rare. DF threshold: df * 10 > 10  <=>  df >= 2.
        rows = [(i, "abcd", "he") for i in range(9)] + [(9, "zzzz", "he")]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        from hebrew_ner_spark.operators.textstats import trigram_score

        got = {r.doc_id: (r.n_trigrams, r.n_common) for r in trigram_score(docs).collect()}
        assert got[0] == (2, 2)  # 'abc','bcd' both df=9 -> common
        assert got[9] == (1, 0)  # distinct trigrams of 'zzzz' = {'zzz'}, df=1 -> rare
