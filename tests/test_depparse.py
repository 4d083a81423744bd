"""Chu-Liu/Edmonds MST decode: brute-force fuzz to n=5, forced-cycle
contraction cases, kernel/gate score consistency, no-shuffle plan."""

from itertools import product

from hebrew_ner_spark.functions.hashing import phash_py
from hebrew_ner_spark.operators import depparse as dp


def _brute(sc, n):
    best = None
    for heads in product(
        *[[h for h in range(n + 1) if h != d] for d in range(1, n + 1)]
    ):
        hm = {d: heads[d - 1] for d in range(1, n + 1)}
        ok = True
        for s in range(1, n + 1):
            seen, v = set(), s
            while v != 0:
                if v in seen:
                    ok = False
                    break
                seen.add(v)
                v = hm[v]
            if not ok:
                break
        if not ok:
            continue
        tot = sum(sc[(hm[d], d)] for d in range(1, n + 1))
        if best is None or tot > best[0]:
            best = (tot, heads)
    return best


def _pert(raw, h, d, n):
    return (raw << dp._pert_bits(n)) | (1 << (h * (n + 1) + d))


class TestCLE:
    def test_brute_force_fuzz(self):
        for trial in range(200):
            n = 2 + trial % 4
            sc = {
                (h, d): _pert(phash_py(f"{trial}|{h}|{d}") % 1000, h, d, n)
                for d in range(1, n + 1)
                for h in range(0, n + 1)
                if h != d
            }
            got = dp.cle_heads(sc, n)
            tot = sum(sc[(got[d - 1], d)] for d in range(1, n + 1))
            assert (tot, tuple(got)) == _brute(sc, n), (trial, n)

    def test_forced_two_cycle_contraction(self):
        # greedy picks 1<->2 (mutual best); CLE must break the cycle
        n = 2
        sc = {
            (0, 1): _pert(10, 0, 1, n),
            (2, 1): _pert(100, 2, 1, n),
            (0, 2): _pert(10, 0, 2, n),
            (1, 2): _pert(100, 1, 2, n),
        }
        got = dp.cle_heads(sc, n)
        assert (
            sum(sc[(got[d - 1], d)] for d in (1, 2))
            == _brute(sc, n)[0]
        )

    def test_nested_cycles(self):
        # 1<->2 cycle and 3<->4 cycle, both must contract
        n = 4
        sc = {}
        for d in range(1, n + 1):
            for h in range(0, n + 1):
                if h == d:
                    continue
                raw = 1
                if (h, d) in [(1, 2), (2, 1), (3, 4), (4, 3)]:
                    raw = 500
                sc[(h, d)] = _pert(raw, h, d, n)
        got = dp.cle_heads(sc, n)
        tot = sum(sc[(got[d - 1], d)] for d in range(1, n + 1))
        assert (tot, tuple(got)) == _brute(sc, n)

    def test_root_multiple_children_allowed(self):
        n = 2
        sc = {
            (0, 1): _pert(900, 0, 1, n),
            (2, 1): _pert(1, 2, 1, n),
            (0, 2): _pert(900, 0, 2, n),
            (1, 2): _pert(1, 1, 2, n),
        }
        assert dp.cle_heads(sc, n) == [0, 0]


class TestSparkParse:
    def test_kernel_matches_arc_gate_scores(self, spark, sf_dir):
        """The JVM-side arc table and the in-kernel Python scores are the
        same hash: the decoded total must equal the sum of the gated arc
        scores along the decoded heads."""
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(20)
        clauses = dp.clause_tokens(docs)
        arcs = {
            (r.doc_id, r.clause_id, r.h, r.d): r.score
            for r in dp.arc_scores(clauses).collect()
        }
        parsed = dp.mst_parse(clauses).collect()
        by_clause = {}
        for r in parsed:
            by_clause.setdefault((r.doc_id, r.clause_id), []).append(r)
        assert by_clause
        for (doc, cl), rows in by_clause.items():
            tot = sum(arcs[(doc, cl, r.head, r.d)] for r in rows)
            assert all(r.total == tot for r in rows)

    def test_parse_is_single_stage(self, spark, sf_dir):
        from hebrew_ner_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents")
        plan = (
            dp.mst_parse(dp.clause_tokens(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # decode shuffles nothing

    def test_short_docs_yield_no_clauses(self, spark):
        docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        assert dp.clause_tokens(docs).count() == 0
