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
    # 'ref' is functional on many sites (e.g. GitHub ?ref=<branch>) and is
    # NOT in the default tracking set — it survives; utm_* still drops
    ("https://Sub.Example.com:443/a/b?z=1&utm_campaign=c&ref=h",
     "https://sub.example.com/a/b?ref=h&z=1"),
    # non-default port survives; trailing slash stripped
    ("https://example.com:8080/a/", "https://example.com:8080/a"),
    # ALL trailing slashes strip (fixed point even for '//')
    ("https://example.com/a//", "https://example.com/a"),
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
        path = ["", "/", "/A/b", "/A/b/", "/x", "/A/b//"][i % 6]
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


def test_tracking_params_opt_in_ref(spark):
    """'ref' stripping is opt-in: the default keeps it (functional on many
    sites), an extended tracking set removes it — in Spark and the SQL
    mirror alike."""
    raw = "https://example.com/repo?ref=main&b=1"
    df = spark.createDataFrame([(raw,)], "url string")
    default = df.select(U.canonicalize_url(F.col("url")).alias("c")).first().c
    assert default == "https://example.com/repo?b=1&ref=main"
    extended = U.TRACKING_PARAMS + ("ref",)
    stripped = df.select(
        U.canonicalize_url(F.col("url"), tracking_params=extended).alias("c")
    ).first().c
    assert stripped == "https://example.com/repo?b=1"
    duck = duckdb.sql(
        "SELECT " + U.canonical_url_sql(f"'{raw}'", tracking_params=extended)
    ).fetchone()[0]
    assert duck == stripped


def test_url_dedup_null_urls_pass_through(spark):
    """Null urls are not a page identity: each null-url doc is its own
    singleton group (kept=1), never collapsed with other null-url docs."""
    rows = [(1, "http://a.com/x"), (2, None), (3, None), (4, "http://A.com/x/")]
    out = U.url_dedup(spark.createDataFrame(rows, "doc_id long, url string"))
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 4
    assert got[2].kept == 1 and got[3].kept == 1
    assert got[2].group_size == 1 and got[3].group_size == 1
    assert got[2].canon_url is None
    assert got[1].group_size == 2 and got[1].kept == 1 and got[4].kept == 0


def test_url_dedup_plan_has_no_window(spark):
    """The dedup must be the aggregate + join-back shape: a window over
    the canonical string would put every occurrence of a viral URL in one
    un-splittable task (VERDICT r9)."""
    rows = [(1, "http://a.com/x"), (2, "http://a.com/x")]
    out = U.url_dedup(spark.createDataFrame(rows, "doc_id long, url string"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_domain_blocklist_filter_suffix_chain(spark):
    """Subdomain-inclusive matching walks the dot-suffix chain; exact
    mode matches only the full host; null urls pass through."""
    rows = [
        (1, "http://deep.sub.tracker.bad.org/x"),   # parent bad.org-family
        (2, "http://news.example.com/y"),            # clean
        (3, "http://tracker.bad.org/z"),             # exact blocked host
        (4, None),                                    # null url passes
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("tracker.bad.org",)], "domain string")
    kept = {r.doc_id for r in U.domain_blocklist_filter(df, bl).collect()}
    assert kept == {2, 4}
    exact = {
        r.doc_id
        for r in U.domain_blocklist_filter(
            df, bl, include_subdomains=False
        ).collect()
    }
    assert exact == {1, 2, 4}  # deep subdomain survives exact-host mode


def test_domain_blocklist_entry_normalization(spark):
    """Hand-maintained blocklists arrive messy: mixed case, a leading
    www., stray whitespace. The entry column gets the same normalization
    as the probe host, so all three forms below still block (ADVICE r10)."""
    rows = [
        (1, "http://tracker.bad.org/x"),
        (2, "http://spam.evil.net/y"),
        (3, "http://ads.junk.io/z"),
        (4, "http://news.example.com/ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame(
        [("Tracker.BAD.org",), ("www.evil.net",), ("  junk.io \t",)],
        "domain string",
    )
    kept = {r.doc_id for r in U.domain_blocklist_filter(df, bl).collect()}
    assert kept == {4}

    import duckdb as _dd

    probe_sql = (
        "SELECT 1 AS doc_id, 'http://tracker.bad.org/x' AS url UNION ALL "
        "SELECT 2, 'http://spam.evil.net/y' UNION ALL "
        "SELECT 3, 'http://ads.junk.io/z' UNION ALL "
        "SELECT 4, 'http://news.example.com/ok'"
    )
    bl_sql = (
        "SELECT 'Tracker.BAD.org' AS domain UNION ALL "
        "SELECT 'www.evil.net' UNION ALL SELECT '  junk.io '"
    )
    got = _dd.sql(U.domain_blocklist_sql(probe_sql, bl_sql)).fetchall()
    assert {r[0] for r in got} == {4}


def test_domain_blocklist_sql_parity(spark):
    import duckdb as _dd

    probe_sql = (
        "SELECT 1 AS doc_id, 'http://deep.sub.t.bad.org/x' AS url UNION ALL "
        "SELECT 2, 'http://news.example.com/y' UNION ALL "
        "SELECT 3, 'http://t.bad.org/z'"
    )
    bl_sql = "SELECT 't.bad.org' AS domain"
    got = _dd.sql(U.domain_blocklist_sql(probe_sql, bl_sql)).fetchall()
    assert {r[0] for r in got} == {2}
