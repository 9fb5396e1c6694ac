"""URL canonicalization + canonical-URL dedup (llm/urls.py)."""

import duckdb
from pyspark.sql import functions as F

from orion_spark.llm import urls as U

CASES = [
    # (raw, canonical): rules 1-7 from the module docstring
    (
        "HTTP://WWW.Example.COM:80/path/One/?utm_source=x&b=2&a=1&fbclid=9#f",
        "http://example.com/path/One?a=1&b=2",
    ),
    ("https://Sub.Example.com:443/a/b?z=1&utm_campaign=c&ref=h",
     "https://sub.example.com/a/b?z=1"),
    # non-default port survives; trailing slash stripped
    ("https://example.com:8080/a/", "https://example.com:8080/a"),
    # http's default is 80, NOT 443 — a cross-scheme :443 must survive
    ("http://example.com:443/x", "http://example.com:443/x"),
    # empty path -> '/'; all-params-stripped -> no '?'
    ("http://example.com", "http://example.com/"),
    ("http://example.com/?utm_a=1", "http://example.com/"),
    # duplicate keys both kept, bytewise sorted
    ("https://www.example.com/x?a=1&a=0", "https://example.com/x?a=0&a=1"),
    # unknown scheme: no default-port rule applies
    ("ftp://Files.Example.com:80/data/", "ftp://files.example.com:80/data"),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [
        r.c for r in df.select(U.canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [c for _, c in CASES]


def test_canonical_url_sql_parity(spark):
    """The DuckDB mirror must agree byte-for-byte on every case — this is
    the contract the registered oracle rides on."""
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    spark_side = [
        r.c for r in df.select(U.canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    for (raw, _), sp in zip(CASES, spark_side):
        duck = duckdb.sql(
            "SELECT " + U.canonical_url_sql(f"'{raw}'")
        ).fetchone()[0]
        assert duck == sp, (raw, sp, duck)


def test_url_host_and_sql_parity(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    hosts = [r.h for r in df.select(U.url_host(F.col("url")).alias("h")).collect()]
    assert hosts[0] == "example.com" and hosts[1] == "sub.example.com"
    for (raw, _), h in zip(CASES, hosts):
        duck = duckdb.sql("SELECT " + U.url_host_sql(f"'{raw}'")).fetchone()[0]
        assert duck == h, (raw, h, duck)


def test_url_dedup_first_seen_wins(spark):
    rows = [
        (1, "http://www.A.com/x?utm_s=1"),
        (2, "HTTP://a.COM:80/x#frag"),   # same canonical as 1
        (3, "http://a.com/y"),           # singleton
        (0, "http://A.com/x/"),          # same canonical as 1, smaller id
    ]
    out = U.url_dedup(spark.createDataFrame(rows, "doc_id long, url string"))
    got = {r.doc_id: r for r in out.collect()}
    assert got[0].group_size == 3 and got[0].kept == 1     # min id keeps
    assert got[1].kept == 0 and got[2].kept == 0
    assert got[3].group_size == 1 and got[3].kept == 1
    assert got[0].canon_url == got[1].canon_url == got[2].canon_url
    assert got[0].host == "a.com"


def _messy_urls(n=60):
    """Deterministic messy-URL generator covering every rule interaction:
    case, www., default/non-default ports, tracking/plain params in
    shuffled orders, fragments, trailing slashes, empty paths/queries."""
    urls = []
    for i in range(n):
        scheme = ["http", "HTTP", "https", "HTTPS", "ftp"][i % 5]
        host = ["Example.COM", "www.Example.com", "sub.EX.org"][i % 3]
        port = ["", ":80", ":443", ":8080"][i % 4]
        path = ["", "/", "/A/b", "/A/b/", "/x"][i % 5]
        params = []
        if i % 2:
            params.append(f"b={i % 7}")
        if i % 3:
            params.append("utm_source=x")
        if i % 4 == 0:
            params.append(f"a={i % 5}")
        if i % 5 == 0:
            params.append(f"fbclid=f{i}")
        q = "?" + "&".join(reversed(params)) if params else ""
        frag = f"#s{i}" if i % 2 else ""
        urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
    return urls


def test_canonicalize_url_idempotent(spark):
    """canon(canon(u)) == canon(u): the canonical form is a fixed point,
    so re-canonicalizing an already-clean frontier is a no-op."""
    urls = _messy_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(U.canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(U.canonicalize_url(F.col("c")).alias("c2"))
    assert [r.c for r in once.collect()] == [r.c2 for r in twice.collect()]


def test_canonicalize_url_randomized_duckdb_parity(spark):
    """Byte parity with the oracle expression across the generated
    rule-interaction matrix, not just the hand-picked table."""
    urls = _messy_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.c for r in df.select(U.canonicalize_url(F.col("url")).alias("c")).collect()]
    for raw, sp in zip(urls, got):
        duck = duckdb.sql("SELECT " + U.canonical_url_sql(f"'{raw}'")).fetchone()[0]
        assert duck == sp, (raw, sp, duck)
