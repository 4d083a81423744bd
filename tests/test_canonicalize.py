

class TestIncrementalComponents:
    def _cc(self, spark, edges):
        from hebrew_ner_spark.operators.canonicalize import connected_components

        df = spark.createDataFrame(edges, ["src", "dst"])
        return connected_components(df)

    def test_delta_merges_components(self, spark):
        from hebrew_ner_spark.operators.canonicalize import (
            connected_components,
            incremental_components,
        )

        base = spark.createDataFrame([(0, 1), (2, 3), (10, 11)], ["src", "dst"])
        labels = connected_components(base)
        # delta bridges {0,1} and {2,3}; leaves {10,11} untouched
        delta = spark.createDataFrame([(1, 2)], ["src", "dst"])
        got = {r.vertex: r.component for r in incremental_components(labels, delta).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}

    def test_equals_full_recompute(self, spark):
        from hebrew_ner_spark.operators.canonicalize import (
            connected_components,
            incremental_components,
        )

        # chain 0-1-2-3-4-5-6-7 split between base (even src) and delta
        all_edges = [(i, i + 1) for i in range(7)]
        base = spark.createDataFrame([e for e in all_edges if e[0] % 2 == 0], ["src", "dst"])
        delta = spark.createDataFrame([e for e in all_edges if e[0] % 2 == 1], ["src", "dst"])
        full = {r.vertex: r.component
                for r in self._cc(spark, all_edges).collect()}
        inc = {r.vertex: r.component
               for r in incremental_components(connected_components(base), delta).collect()}
        assert inc == full

    def test_new_vertices_and_untouched_labels(self, spark):
        from pyspark.sql import functions as F

        from hebrew_ner_spark.operators.canonicalize import (
            connected_components,
            incremental_components,
        )

        base = spark.createDataFrame([(5, 6)], ["src", "dst"])
        labels = connected_components(base)
        # delta introduces a brand-new component {100, 101} and attaches
        # new vertex 7 to the existing {5, 6}
        delta = spark.createDataFrame([(100, 101), (7, 6)], ["src", "dst"])
        got = {r.vertex: r.component for r in incremental_components(labels, delta).collect()}
        assert got == {5: 5, 6: 5, 7: 5, 100: 100, 101: 100}


class TestDecrementalComponents:
    """Forget-vertices repair: splits, relabels, pass-through identity."""

    def _labels(self, spark, edges):
        from hebrew_ner_spark.operators.canonicalize import connected_components

        return connected_components(
            spark.createDataFrame(edges, ["src", "dst"])
        )

    def test_split_relabel_singleton_and_untouched(self, spark):
        from hebrew_ner_spark.operators.canonicalize import (
            connected_components,
            decremental_components,
        )

        # component A: path 1-2-3-4 (min 1); component B: 10-11
        edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
        e = spark.createDataFrame(edges, ["src", "dst"])
        labels = connected_components(e)
        # forget 2: A splits into {1} (singleton) and {3,4}; B untouched
        forgotten = spark.createDataFrame([(2,)], ["doc_id"])
        got = {r.vertex: r.component
               for r in decremental_components(labels, e, forgotten).collect()}
        assert got == {1: 1, 3: 3, 4: 3, 10: 10, 11: 10}

    def test_forgetting_the_min_relabels_survivors(self, spark):
        from hebrew_ner_spark.operators.canonicalize import (
            connected_components,
            decremental_components,
        )

        e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        labels = connected_components(e)
        forgotten = spark.createDataFrame([(1,)], ["doc_id"])
        got = {r.vertex: r.component
               for r in decremental_components(labels, e, forgotten).collect()}
        assert got == {2: 2, 3: 2}  # new min is 2, connectivity kept

    def test_empty_forget_set_is_identity(self, spark):
        from hebrew_ner_spark.operators.canonicalize import (
            connected_components,
            decremental_components,
        )

        e = spark.createDataFrame([(1, 2), (4, 5)], ["src", "dst"])
        labels = connected_components(e)
        forgotten = spark.createDataFrame([], "doc_id long")
        got = {r.vertex: r.component
               for r in decremental_components(labels, e, forgotten).collect()}
        assert got == {r.vertex: r.component for r in labels.collect()}

    def test_forgetting_whole_component_removes_it(self, spark):
        from hebrew_ner_spark.operators.canonicalize import (
            connected_components,
            decremental_components,
        )

        e = spark.createDataFrame([(1, 2), (4, 5)], ["src", "dst"])
        labels = connected_components(e)
        forgotten = spark.createDataFrame([(1,), (2,)], ["doc_id"])
        got = {r.vertex: r.component
               for r in decremental_components(labels, e, forgotten).collect()}
        assert got == {4: 4, 5: 4}
