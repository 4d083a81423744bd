"""Differential fuzz: canonical_href / host_of vs an independent Python
model of the documented rules.

The URL code is where this round's reviews found real bugs (scheme
inheritance, userinfo, @-in-query), so it gets the same treatment as
the tokenizer: a generated case matrix executed ONCE through a single
Spark job and compared against a from-the-docstring reimplementation.
The matrix is deterministic (itertools product, no RNG) so failures
reproduce by index.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from hebrew_ner_spark.operators import weblinks


def _model_host(url: str) -> str:
    """host_of per its docstring: lower-cased host of an absolute
    http(s) url, userinfo dropped (stopping at ?/#), cut at :/?#."""
    low = url.lower()
    if low.startswith("https://"):
        rest = url[8:]
    elif low.startswith("http://"):
        rest = url[7:]
    else:
        return ""
    # userinfo: an @ before any of / ? # delimits it
    head = rest
    for d in "/?#":
        i = head.find(d)
        if i != -1:
            head = head[:i]
    if "@" in head:
        rest = rest[head.rfind("@") + 1 :]
    host = rest
    for d in "/:?#":
        i = host.find(d)
        if i != -1:
            host = host[:i]
    return host.lower()


def _model_canon(href: str, page_url: str) -> str:
    scheme = ""
    low = page_url.lower()
    if "://" in page_url:
        cand = page_url.split("://", 1)[0]
        if cand.isalpha():
            scheme = cand.lower()
    if not scheme:
        scheme = "https"
    s = href.split("#", 1)[0].split("?", 1)[0]
    if s.startswith("//"):
        s = f"{scheme}:{s}"
    elif s.startswith("/"):
        s = f"{scheme}://{_model_host(page_url)}{s}"
    slow = s.lower()
    if slow.startswith("http://") or slow.startswith("https://"):
        head_end = len(s.split("://", 1)[0]) + 3
        rest = s[head_end:]
        slash = rest.find("/")
        host_part = rest if slash == -1 else rest[:slash]
        tail = "" if slash == -1 else rest[slash:]
        s = s[:head_end].lower() + host_part.lower() + tail
    if s.endswith("/"):
        s = s[:-1]
    return s


HOSTS = ["H.Example.NET", "ex1.example.net:8443", "alice@h.example.net", "h"]
PATHS = ["", "/", "/P/7", "/p/7/"]
SUFFIXES = ["", "?q=1", "#f", "?e=a@b.org", "?q=1#f"]
SCHEMES = ["https://", "http://", "HTTPS://", "//", "/", ""]
PAGES = ["https://ex0.example.net/p/0", "http://old.example.net/p/5", "not a url"]


def _cases():
    out = []
    for sch, host, path, suf in itertools.product(SCHEMES, HOSTS, PATHS, SUFFIXES):
        if sch == "/":
            href = "/" + host.replace("/", "") + path + suf  # rooted path, host is junk text
        elif sch == "":
            href = host + path + suf  # schemeless word — left alone
        else:
            href = sch + host + path + suf
        out.append(href)
    return sorted(set(out))


def test_canonical_href_matches_model(spark):
    cases = [
        (i, href, page)
        for i, (href, page) in enumerate(
            (h, p) for h in _cases() for p in PAGES
        )
    ]
    df = spark.createDataFrame(cases, "i long, href string, page string")
    got = {
        r.i: (r.canon, r.host)
        for r in df.select(
            "i",
            weblinks.canonical_href(F.col("href"), F.col("page")).alias("canon"),
            weblinks.host_of(
                weblinks.canonical_href(F.col("href"), F.col("page"))
            ).alias("host"),
        ).collect()
    }
    mismatches = []
    for i, href, page in cases:
        want_canon = _model_canon(href, page)
        want_host = _model_host(want_canon)
        if got[i] != (want_canon, want_host):
            mismatches.append((href, page, got[i], (want_canon, want_host)))
    assert not mismatches, f"{len(mismatches)} diverge; first 5: {mismatches[:5]}"
