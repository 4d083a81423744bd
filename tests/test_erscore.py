"""Fellegi-Sunter scoring: closed-form weights on a constructed corpus,
smoothing edge cases, classification separation on the gated corpus."""

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import erscore


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


class TestFieldStats:
    def test_closed_form_weights(self, spark):
        # 4 docs: two byte-identical (gold group), two distinct.
        rows = [
            (1, "a b c d e f", "he"),
            (2, "a b c d e f", "he"),
            (3, "x y z w v u", "he"),
            (4, "p q r s t u", "en"),
        ]
        stats = {
            r.field: r for r in erscore.field_stats(_docs(spark, rows)).collect()
        }
        lang = stats["lang"]
        # gold ordered pairs: 2*1 = 2, both agree on lang
        assert (lang.m_num, lang.m_den) == (2, 2)
        # lang histogram: he=3, en=1 -> u_num = 3*2 = 6, u_den = 4*3
        assert (lang.u_num, lang.u_den) == (6, 12)
        # w_agree = bitlen(3*14) - bitlen(4*7) = bitlen(42)-bitlen(28) = 6-5
        assert lang.w_agree == 1
        # w_disagree = bitlen(1*14) - bitlen(4*7) = 4 - 5
        assert lang.w_disagree == -1
        fp = stats["fp"]
        assert (fp.m_num, fp.m_den) == (2, 2)
        assert fp.u_num == 2  # only the identical pair collides

    def test_no_gold_pairs_smooths(self, spark):
        rows = [(1, "a b c d", "he"), (2, "x y z w", "en")]
        stats = {
            r.field: r for r in erscore.field_stats(_docs(spark, rows)).collect()
        }
        # m_den = 0 everywhere; smoothing keeps weights finite
        assert all(r.m_den == 0 for r in stats.values())
        assert all(
            isinstance(r.w_agree, int) and isinstance(r.w_disagree, int)
            for r in stats.values()
        )


class TestClassification:
    def test_gold_pairs_all_match_and_collisions_dont(self, spark, sf_dir):
        from hebrew_ner_spark.querydefs.erscore_q import _er_docs

        docs = _er_docs(spark, sf_dir.replace("sf0.001", "sf0.001"))
        sc = erscore.pair_scores(docs).collect()
        assert sc
        gold = [r for r in sc if r.doc_a >= 2_000_000 and r.doc_b >= 2_000_000]
        assert gold and all(r.is_match == 1 for r in gold)
        # every pair classified by the threshold, both ways represented
        # at sf0.01 (organic fingerprint collisions score below)
        assert all(r.is_match in (0, 1) for r in sc)

    def test_flipped_lang_copy_outscores_near_miss(self, spark):
        # on a 4-doc corpus the absolute weights are weak (u is huge),
        # but the ORDER must hold: identical text with flipped lang
        # scores above near-identical different text
        rows = [
            (1, "a b c d e f g h", "he"),
            (2, "a b c d e f g h", "xx"),  # same text, different lang
            (3, "q r s t u v w x", "he"),
            (4, "q r s t u v w y", "he"),
        ]
        sc = {
            (r.doc_a, r.doc_b): r.score
            for r in erscore.pair_scores(_docs(spark, rows), thresh=0).collect()
        }
        assert (1, 2) in sc and (3, 4) in sc
        assert sc[(1, 2)] > sc[(3, 4)]


class TestResolutionPipeline:
    def test_clusters_and_canonicals(self, spark, sf_dir):
        from hebrew_ner_spark.querydefs.erscore_q import _er_docs

        res = {
            r.doc_id: (r.component, r.is_canonical)
            for r in erscore.resolution_pipeline(_er_docs(spark, sf_dir)).collect()
        }
        # every planted copy clusters with its source doc
        for k in (0, 1, 2):
            src_comp = res[k][0]
            for r in range(4):
                assert res[2_000_000 + k * 100 + r][0] == src_comp
        # exactly one canonical per component, and it IS the component id
        comps = {}
        for doc, (comp, can) in res.items():
            comps.setdefault(comp, []).append((doc, can))
        for comp, members in comps.items():
            cans = [d for d, c in members if c == 1]
            assert cans == [comp]
        # singletons are their own canonical
        singles = [m for m in comps.values() if len(m) == 1]
        assert singles and all(m[0][1] == 1 for m in singles)
