"""URL normalization (functions/urls.py). The driver query hash-checks
the rules against the SQL mirror; these pin behavior on inputs the
fixture construction can't produce — idempotence, garbage
passthrough, scheme-specific ports, and the host helper."""

from __future__ import annotations

from pyspark.sql import functions as F

from d2d_spark.functions.urls import normalize_url, url_host


def _norm(spark, urls, **kw):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["i", "u"])
    rows = df.select("i", normalize_url(F.col("u"), **kw).alias("n")).orderBy("i").collect()
    return [r.n for r in rows]


def test_normalization_rules(spark):
    got = _norm(
        spark,
        [
            "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
            "https://example.com:443/x",
            "https://example.com:8443/x",          # non-default port survives
            "http://example.com/path///",
            "http://example.com/?fbclid=123&gclid=9",
            "ftp://Example.com:21/file",           # unknown scheme: port kept
        ],
    )
    assert got[0] == "http://example.com/a/b?a=1&b=2"
    assert got[1] == "https://example.com/x"
    assert got[2] == "https://example.com:8443/x"
    assert got[3] == "http://example.com/path"
    assert got[4] == "http://example.com"
    assert got[5] == "ftp://example.com:21/file"


def test_idempotent(spark):
    urls = [
        "HTTP://WWW.Example.COM:80/a/?z=1&a=2#f",
        "https://x.io/p?utm_a=1",
        "http://h.com",
    ]
    once = _norm(spark, urls)
    twice = _norm(spark, once)
    assert once == twice


def test_unparseable_passes_through_trimmed(spark):
    got = _norm(spark, ["  not a url  ", "", "example.com/no-scheme"])
    assert got == ["not a url", "", "example.com/no-scheme"]


def test_keep_www_option(spark):
    got = _norm(spark, ["http://www.example.com/a"], strip_www=False)
    assert got == ["http://www.example.com/a"]


def test_url_host(spark):
    df = spark.createDataFrame(
        [
            (0, "HTTPS://WWW.News.Example.ORG:8080/x?a=1"),
            (1, "garbage"),
        ],
        ["i", "u"],
    )
    rows = df.select("i", url_host(F.col("u")).alias("h")).orderBy("i").collect()
    assert rows[0].h == "news.example.org"
    assert rows[1].h == ""


def test_fuzz_idempotence_and_totality(spark):
    """Random URL-ish strings assembled from hostile components: the
    normalizer must be total (never NULL on non-NULL input) and
    idempotent, and url_host must agree with the host embedded in the
    normalized form."""
    import random

    rng = random.Random(20260814)
    schemes = ["http", "HTTP", "https", "ftp", "", "ht!tp"]
    hosts = ["Example.com", "WWW.site.ORG", "a.b.c", "x", "127.0.0.1", ""]
    ports = ["", ":80", ":443", ":8080", ":0", ":"]
    paths = ["", "/", "/a/b", "/a//b///", "/%20x", "/a/b/"]
    queries = ["", "?", "?a=1", "?utm_source=x", "?b=2&a=1&a=0", "?fbclid=1&z",
               "?==&&a", "?a=1&utm_x=2&REF=3"]
    frags = ["", "#", "#frag", "#a?b=1"]
    urls = []
    for _ in range(300):
        u = (rng.choice(schemes) + "://" if rng.random() < 0.8 else "") + rng.choice(
            hosts
        ) + rng.choice(ports) + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        urls.append(u)
    once = _norm(spark, urls)
    assert all(v is not None for v in once)
    twice = _norm(spark, once)
    assert once == twice
