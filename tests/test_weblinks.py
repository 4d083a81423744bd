"""Link extraction, URL canonicalization, host graph invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import weblinks


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "he") for i, t in enumerate(texts)], "doc_id long, text string, lang string"
    )


def _pages_for(spark, hrefs, page_url="https://ex0.example.net/p/0"):
    html = "<body>" + "".join(f'<a href="{h}">x</a>' for h in hrefs) + "</body>"
    return spark.createDataFrame(
        [(page_url, bytearray(html.encode()))], "url string, html binary"
    )


class TestCanonicalHref:
    def _canon(self, spark, href, page_url="https://ex0.example.net/p/0"):
        rows = weblinks.out_links(_pages_for(spark, [href], page_url)).collect()
        assert len(rows) == 1
        return rows[0].canon, rows[0].dst_host

    def test_fragment_and_query_stripped(self, spark):
        canon, host = self._canon(spark, "https://a.example.net/p/7?q=1&r=2#frag")
        assert canon == "https://a.example.net/p/7" and host == "a.example.net"

    def test_protocol_relative_gains_https(self, spark):
        canon, _ = self._canon(spark, "//b.example.net/p/9/")
        assert canon == "https://b.example.net/p/9"  # + trailing slash stripped

    def test_root_relative_resolves_to_page_host(self, spark):
        canon, host = self._canon(
            spark, "/p/3?utm_source=x#s1", page_url="https://ex2.example.net/p/5"
        )
        assert canon == "https://ex2.example.net/p/3" and host == "ex2.example.net"

    def test_host_lowercased_path_preserved(self, spark):
        canon, host = self._canon(spark, "HTTPS://EX1.Example.NET/p/CaseSensitive")
        assert canon == "https://ex1.example.net/p/CaseSensitive"
        assert host == "ex1.example.net"

    def test_non_absolute_non_rooted_left_alone(self, spark):
        # mailto:/javascript: etc. canonicalize to themselves, host ''
        canon, host = self._canon(spark, "mailto:a@b.example")
        assert canon == "mailto:a@b.example" and host == ""

    def test_port_excluded_from_host(self, spark):
        _, host = self._canon(spark, "https://c.example.net:8443/p/1")
        assert host == "c.example.net"


class TestLinkGraph:
    def test_edges_and_positions(self, spark):
        pages = _pages_for(
            spark,
            ["https://a.example.net/x", "https://b.example.net/y", "/z"],
            page_url="https://self.example.net/p/1",
        )
        out = weblinks.out_links(pages).orderBy("k").collect()
        assert [r.k for r in out] == [0, 1, 2]
        assert [r.dst_host for r in out] == [
            "a.example.net",
            "b.example.net",
            "self.example.net",
        ]
        edges = {
            (r.src_host, r.dst_host): r.n_links
            for r in weblinks.link_edges(pages).collect()
        }
        assert edges[("self.example.net", "a.example.net")] == 1
        assert edges[("self.example.net", "self.example.net")] == 1

    def test_salted_twin_matches(self, spark):
        docs = _docs(spark, ["t"] * 40)
        pages = weblinks.synth_linked_pages(docs)
        a = {tuple(r) for r in weblinks.link_edges(pages).collect()}
        b = {tuple(r) for r in weblinks.link_edges_salted(pages).collect()}
        assert a == b and len(a) > 1

    def test_degree_conservation(self, spark):
        # sum(out_links) == sum(in_links) == total anchors
        docs = _docs(spark, ["t"] * 30)
        pages = weblinks.synth_linked_pages(docs)
        n_anchors = weblinks.out_links(pages).count()
        deg = weblinks.host_degrees(weblinks.link_edges(pages)).collect()
        assert sum(r.out_links for r in deg) == n_anchors
        assert sum(r.in_links for r in deg) == n_anchors

    def test_no_python_udf_in_extraction_plan(self, spark):
        docs = _docs(spark, ["t"] * 4)
        plan = weblinks.out_links(
            weblinks.synth_linked_pages(docs)
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestResolution:
    def test_dangling_and_cross_host_relative(self, spark):
        # 9 docs -> M = 9 + 1 + 9 DIV 8 = 11; targets 9,10 dangle
        docs = _docs(spark, ["t"] * 9)
        pages = weblinks.synth_linked_pages(docs)
        links = weblinks.out_links(pages).collect()
        m = 11
        expect_total = sum(1 + i % 3 for i in range(9))
        assert len(links) == expect_total
        res = weblinks.link_resolution(pages).collect()
        assert sum(r.n_total for r in res) == expect_total
        # closed-form expected hits
        hits = 0
        for i in range(9):
            for k in range(1 + i % 3):
                t = (i * 7 + 13 * (k + 1)) % m
                if t >= 9:
                    continue  # dangling
                if k % 3 == 1 and i % 4 != t % 4:
                    continue  # relative link resolved on the wrong host
                hits += 1
        assert sum(r.n_resolved for r in res) == hits
        assert sum(r.n_dangling for r in res) == expect_total - hits
        assert any(r.n_dangling > 0 for r in res)


class TestAnchorTexts:
    def test_fragments_align_with_out_links(self, spark):
        docs = _docs(spark, ["t"] * 12)
        pages = weblinks.synth_linked_pages(docs)
        links = {(r.url, r.k): r.href for r in weblinks.out_links(pages).collect()}
        texts = weblinks.anchor_texts(pages).collect()
        assert len(texts) == len(links)
        for r in texts:
            assert links[(r.url, r.k)] == r.href
            assert r.anchor_text in weblinks.ANCHOR_TERMS

    def test_evidence_counts_sum_to_anchor_total(self, spark):
        docs = _docs(spark, ["t"] * 20)
        pages = weblinks.synth_linked_pages(docs)
        ev = weblinks.anchor_evidence(pages).collect()
        assert sum(r.n for r in ev) == weblinks.out_links(pages).count()


class TestHostQuality:
    def test_counts_and_above_mean_selection(self, spark):
        # quality pass needs 20..200 tokens with lexical diversity: give
        # hosts 0/1 passing pages and hosts 2/3 failing (too short)
        good = " ".join(f"w{i}" for i in range(30))
        rows = []
        for i in range(16):
            rows.append((i, good if i % 4 in (0, 1) else "too short", "he"))
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        pages = weblinks.synth_linked_pages(docs)
        hq = {r.host: (r.n_pages, r.n_pass) for r in weblinks.host_quality(pages).collect()}
        assert hq["ex0.example.net"] == (4, 4) and hq["ex2.example.net"] == (4, 0)
        keep = {r.host for r in weblinks.quality_hosts(pages).collect()}
        assert keep == {"ex0.example.net", "ex1.example.net"}


class TestReviewRegressions:
    def test_http_page_relative_links_keep_scheme(self, spark):
        # an http page's relative links must resolve back into the http
        # url space, or link_resolution reports false danglings
        canon_root = TestCanonicalHref()._canon(
            spark, "/p/3", page_url="http://old.example.net/p/5"
        )
        assert canon_root[0] == "http://old.example.net/p/3"
        canon_proto = TestCanonicalHref()._canon(
            spark, "//cdn.example.net/p/9", page_url="http://old.example.net/p/5"
        )
        assert canon_proto[0] == "http://cdn.example.net/p/9"

    def test_userinfo_stripped_from_host(self, spark):
        _, host = TestCanonicalHref()._canon(spark, "https://alice@h.example.net/x")
        assert host == "h.example.net"
        _, host2 = TestCanonicalHref()._canon(
            spark, "https://alice:pw@h.example.net:8443/x"
        )
        assert host2 == "h.example.net"

    def test_quality_hosts_empty_corpus(self, spark):
        empty = spark.createDataFrame(
            [], "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        assert weblinks.quality_hosts(empty).count() == 0

    def test_at_sign_in_query_not_userinfo(self, spark):
        # '@' in a pathless query/fragment must not be read as userinfo
        _, host = TestCanonicalHref()._canon(spark, "https://h.example.net?e=a@b.org")
        assert host == "h.example.net"
        _, host2 = TestCanonicalHref()._canon(spark, "https://h.example.net#a@b")
        assert host2 == "h.example.net"


class TestAliasDictionary:
    def _pages(self, spark, rows):
        # rows: list of (src_id, href, anchor)
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            [
                (
                    f"https://src.example.net/{i}",
                    f'<html><body><a href="{href}">{a}</a></body></html>'.encode(),
                )
                for i, (href, a) in enumerate(rows)
            ],
            "url string, html binary",
        ).select("url", F.col("html"), F.lit("").alias("text"))

    def test_dominant_alias_mined_ambiguous_and_weak_dropped(self, spark):
        from hebrew_ner_spark.operators.weblinks import alias_dictionary

        rows = (
            [("https://t.example.net/a", "acme")] * 3       # dominant: 3/4
            + [("https://t.example.net/b", "acme")]          # minority use
            + [("https://t.example.net/a", "amb"),           # 1/2 -> dropped
               ("https://t.example.net/b", "amb")]
            + [("https://t.example.net/c", "weak")]          # n=1 -> dropped
        )
        got = {r.anchor_text: r for r in alias_dictionary(self._pages(spark, rows)).collect()}
        assert set(got) == {"acme"}
        assert got["acme"].canon == "https://t.example.net/a"
        assert (got["acme"].n, got["acme"].n_total, got["acme"].share_1e6) == (3, 4, 750000)


class TestUrlCanonicalize:
    def test_pinned_examples_and_idempotence(self, spark):
        from hebrew_ner_spark.operators.weblinks import url_canonicalize

        cases = [
            (0, "HTTPS://ExAmple.ORG:443/he/Doc/0/?utm_source=feed&ref=0#top",
             "https://example.org/he/Doc/0?ref=0"),
            (1, "https://example.org/en/Doc/1?ref=1",
             "https://example.org/en/Doc/1?ref=1"),
            (2, "HTTPS://example.org/de/Doc/2/", "https://example.org/de/Doc/2"),
            (3, "https://example.org:443/fr?utm_source=x", "https://example.org/fr"),
            (4, "https://example.org/CaseKept/Path", "https://example.org/CaseKept/Path"),
            (5, "not a url #frag", "not a url "),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u, _ in cases], "doc_id long, url string"
        )
        got = {r.doc_id: r.canon for r in url_canonicalize(df).collect()}
        for i, _, want in cases:
            assert got[i] == want, (i, got[i])
        # idempotence: canonicalizing the canon column is a fixpoint
        df2 = spark.createDataFrame(
            [(i, c) for i, c in got.items()], "doc_id long, url string"
        )
        got2 = {r.doc_id: r.canon for r in url_canonicalize(df2).collect()}
        assert got2 == got


class TestCrawlBudget:
    def _pages(self, spark, rows):
        # (url, text) pages; quality predicate sees text only
        return spark.createDataFrame(rows, "url string, text string")

    def test_sums_exactly_and_remainder_tie_order(self, spark):
        from hebrew_ner_spark.operators import weblinks

        # hand-computed: weights from n_pass per host; force known
        # weights by bypassing host_quality via monkey-free direct call —
        # use pages whose quality outcomes we control is brittle, so
        # instead check the algebraic invariants on the sf corpus shape
        # with a tiny synthetic: 3 hosts x distinct page counts.
        good = ("the quick brown fox jumps over the lazy dog and then "
                "keeps going with enough distinct words to pass quality "
                "checks for this corpus easily right here today now")
        rows = [(f"https://h{i}.ex/p/{j}", good) for i, n in ((0, 1), (1, 2), (2, 4)) for j in range(n)]
        out = weblinks.crawl_budget(self._pages(spark, rows), budget=10)
        got = {r.host: (r.w, r.base, r.rem, r.budget) for r in out.collect()}
        assert sum(v[3] for v in got.values()) == 10
        # W=7: base = floor(10w/7) -> h0:1 rem 3, h1:2 rem 6, h2:5 rem 5
        # extra = 10-8 = 2 -> seats to h1 (rem 6) and h2 (rem 5)
        assert got["h0.ex"] == (1, 1, 3, 1)
        assert got["h1.ex"] == (2, 2, 6, 3)
        assert got["h2.ex"] == (4, 5, 5, 6)

    def test_zero_weight_host_gets_zero(self, spark):
        from hebrew_ner_spark.operators import weblinks

        good = ("the quick brown fox jumps over the lazy dog and then "
                "keeps going with enough distinct words to pass quality "
                "checks for this corpus easily right here today now")
        rows = [("https://ok.ex/p/1", good), ("https://junk.ex/p/1", "x x x")]
        out = weblinks.crawl_budget(self._pages(spark, rows), budget=7)
        got = {r.host: r.budget for r in out.collect()}
        assert got["junk.ex"] == 0 and got["ok.ex"] == 7

    def test_all_zero_weights_all_zero(self, spark):
        from hebrew_ner_spark.operators import weblinks

        rows = [("https://a.ex/p/1", "x"), ("https://b.ex/p/1", "y")]
        out = weblinks.crawl_budget(self._pages(spark, rows), budget=5)
        assert all(r.budget == 0 for r in out.collect())


def test_canonical_resolve_chains(spark):
    decls = spark.createDataFrame(
        [("p1", "base"), ("p2", "base"), ("base", "root"),
         ("root", "root"), ("lone", "lone"), ("ext", "offsite")],
        "url string, canon string",
    )
    got = {
        r["url"]: (r["canonical_url"], r["depth"])
        for r in weblinks.canonical_resolve(decls).collect()
    }
    assert got["p1"] == ("root", 2)       # chain p1 -> base -> root
    assert got["base"] == ("root", 1)
    assert got["root"] == ("root", 0)
    assert got["lone"] == ("lone", 0)
    assert got["ext"] == ("offsite", 1)   # target outside the crawl kept


def test_canonical_resolve_raises_on_cap(spark):
    decls = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "d")],
        "url string, canon string",
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="converge"):
        weblinks.canonical_resolve(decls, max_rounds=1)


def test_synth_canonical_depths(spark):
    docs = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    got = {
        r["url"].rsplit("/", 1)[-1]: (r["canonical_url"].rsplit("/", 1)[-1], r["depth"])
        for r in weblinks.canonical_resolve(
            weblinks.synth_canonical_decls(docs)
        ).collect()
    }
    assert got["31"] == ("30", 1)     # page -> block base (root, %30==0)
    assert got["34"] == ("30", 2)     # page -> base 33 -> 30
    assert got["33"] == ("30", 1)
    assert got["30"] == ("30", 0)
    assert got["0"] == ("0", 0)
