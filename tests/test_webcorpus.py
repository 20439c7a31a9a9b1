"""URL/domain web-corpus operators: canonicalization cases, the
registered-domain rule (incl. multi-label public suffixes), bucket
determinism, dedup semantics — and the no-Python-UDF plan gate."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geo_spark.operators import webcorpus as WC


@pytest.fixture(scope="module")
def urls_df(spark):
    rows = [
        # (doc_id, url)
        (1, "https://WWW.Example.COM:443/Path/One#frag"),
        (2, "https://www.example.com/Path/One"),
        (3, "http://Sub.Site.ORG:80/a?q=1#x"),
        (4, "http://sub.site.org/a?q=1"),
        (5, "https://shop.acme.co.uk/p"),
        (6, "https://a.b.c.gov.uk/x"),
        (7, "https://single-label/x"),
        (8, "https://example.io:8443/keep-port"),
        (9, "ftp://files.example.net/pub"),
        (10, "https://example.com/Case/Sensitive/PATH"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "url"]))


def _col_vals(df, col):
    return {r["doc_id"]: r[col] for r in df.collect()}


def test_url_normalize_cases(urls_df):
    out = urls_df.select(
        "doc_id", WC.url_normalize_col(F.col("url")).alias("canon")
    )
    got = _col_vals(out, "canon")
    assert got[1] == "https://www.example.com/Path/One"  # case+port+frag
    assert got[2] == "https://www.example.com/Path/One"
    assert got[3] == "http://sub.site.org/a?q=1"  # :80 stripped, frag gone
    assert got[4] == "http://sub.site.org/a?q=1"
    assert got[8] == "https://example.io:8443/keep-port"  # non-default port kept
    assert got[10] == "https://example.com/Case/Sensitive/PATH"  # path case kept


def test_host_and_registered_domain(urls_df):
    host = WC.host_col(F.col("url"))
    out = urls_df.select(
        "doc_id",
        host.alias("host"),
        WC.registered_domain_col(host).alias("domain"),
    )
    hosts = _col_vals(out, "host")
    doms = _col_vals(out, "domain")
    assert hosts[1] == "www.example.com" and doms[1] == "example.com"
    assert hosts[3] == "sub.site.org" and doms[3] == "site.org"
    assert doms[5] == "acme.co.uk"  # multi-label public suffix
    assert doms[6] == "c.gov.uk"  # deep subdomain under multi-label suffix
    assert doms[7] == "single-label"  # <2 labels passes through
    assert doms[9] == "example.net"  # scheme-agnostic


def test_domain_bucket_deterministic(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"domain": [f"d{i}.com" for i in range(500)]})
    )
    b1 = df.select(WC.domain_bucket_col(F.col("domain"), 32).alias("b")).toPandas()
    b2 = df.select(WC.domain_bucket_col(F.col("domain"), 32).alias("b")).toPandas()
    assert (b1["b"] == b2["b"]).all()
    assert b1["b"].between(0, 31).all()
    # spreads: no bucket takes more than an extreme share
    assert b1["b"].value_counts().max() < 60


def test_url_dedup_semantics(urls_df):
    out = WC.url_dedup(urls_df).toPandas().set_index("canon_url")
    assert out.loc["https://www.example.com/Path/One", "dup_cnt"] == 2
    assert out.loc["https://www.example.com/Path/One", "keep_id"] == 1
    assert out.loc["http://sub.site.org/a?q=1", "dup_cnt"] == 2
    assert int(out["dup_cnt"].sum()) == 10  # partition of the input


def test_synthetic_urls_portable(spark):
    """The shared URL synthesis evaluates identically in Spark and
    DuckDB (same SQL text, both engines)."""
    import duckdb

    sql = WC.synthetic_url_sql("doc_id")
    ids = pd.DataFrame({"doc_id": range(1, 41)})
    sp = (
        spark.createDataFrame(ids)
        .select("doc_id", F.expr(sql).alias("url"))
        .toPandas()
        .sort_values("doc_id")["url"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", ids)
    du = con.execute(
        f"SELECT {sql} AS url FROM t ORDER BY doc_id"
    ).fetchdf()["url"].tolist()
    assert sp == du


def test_plan_is_udf_free(urls_df):
    out = WC.url_dedup(urls_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    stats = WC.domain_stats(
        urls_df.withColumn("text", F.lit("hello world"))
    )
    plan2 = stats._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2


def test_parse_robots_and_filter_longest_match(spark):
    from geo_spark.operators.webcorpus import parse_robots, robots_filter

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
                "# comment\nDisallow: /tmp\n",
            ),
            ("b.com", "User-agent: *\nAllow: /\nDisallow: /x\n"),
            ("c.com", "User-agent: *\n"),  # no rules
        ],
        "domain string, robots_txt string",
    )
    rules = parse_robots(robots)
    got_rules = {
        (r["domain"], r["prefix"]): (r["allow"], r["rule_len"])
        for r in rules.collect()
    }
    assert got_rules == {
        ("a.com", "/private"): (0, 8),
        ("a.com", "/private/ok"): (1, 11),
        ("a.com", "/tmp"): (0, 4),
        ("b.com", "/"): (1, 1),
        ("b.com", "/x"): (0, 2),
    }

    urls = spark.createDataFrame(
        [
            ("a.com", "/private/ok/page"),  # longest match = Allow
            ("a.com", "/private/no"),       # Disallow /private
            ("a.com", "/public"),           # no rule -> allowed
            ("b.com", "/x/y"),              # /x (len 2) beats / (len 1)
            ("b.com", "/y"),                # only / matches -> allow
            ("c.com", "/anything"),         # no rules at all
        ],
        "domain string, path string",
    )
    got = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {
        ("a.com", "/private/ok/page"): 1,
        ("a.com", "/private/no"): 0,
        ("a.com", "/public"): 1,
        ("b.com", "/x/y"): 0,
        ("b.com", "/y"): 1,
        ("c.com", "/anything"): 1,
    }


def test_robots_equal_length_allow_wins(spark):
    from geo_spark.operators.webcorpus import parse_robots, robots_filter

    robots = spark.createDataFrame(
        [("d.com", "Allow: /dup\nDisallow: /dup\n")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("d.com", "/dup/page")], "domain string, path string"
    )
    got = robots_filter(urls, parse_robots(robots)).collect()[0]
    assert got["allowed"] == 1  # tie -> Allow (struct-max on (len, allow))


def test_parse_robots_crlf_line_endings(spark):
    """Real robots.txt files arrive with CRLF: the \\s*$ tail must
    absorb the carriage return and keep it out of the prefix."""
    from geo_spark.operators.webcorpus import parse_robots

    robots = spark.createDataFrame(
        [("e.com", "User-agent: *\r\nDisallow: /a\r\nAllow: /a/b\r\n")],
        "domain string, robots_txt string",
    )
    got = {
        (r["prefix"], r["allow"]): r["rule_len"]
        for r in parse_robots(robots).collect()
    }
    assert got == {("/a", 0): 2, ("/a/b", 1): 4}


def test_robots_pattern_compile(spark):
    """Wildcard compile: * -> .*, trailing $ -> anchor, every other
    regex metachar escaped, always ^-anchored."""
    from geo_spark.operators.webcorpus import robots_pattern_col

    df = spark.createDataFrame(
        [("/a/b",), ("/*.tmp$",), ("/p*q",), ("/x$y",), ("/d(1)+.z$",)],
        "prefix string",
    )
    got = dict(
        (r["prefix"], r["pat"])
        for r in df.select(
            "prefix", robots_pattern_col(F.col("prefix")).alias("pat")
        ).collect()
    )
    assert got == {
        "/a/b": "^/a/b",
        "/*.tmp$": "^/.*\\.tmp$",
        "/p*q": "^/p.*q",
        # $ mid-string is a literal and must be escaped
        "/x$y": "^/x\\$y",
        "/d(1)+.z$": "^/d\\(1\\)\\+\\.z$",
    }


def test_robots_filter_wildcards(spark):
    """REP RFC 9309 wildcard semantics: * spans any char run, trailing
    $ pins the match to the path end, specificity = raw rule length."""
    from geo_spark.operators.webcorpus import parse_robots, robots_filter

    robots = spark.createDataFrame(
        [
            (
                "w.com",
                "User-agent: *\n"
                "Disallow: /*.tmp$\n"      # block only true .tmp suffixes
                "Disallow: /p*/q\n"        # block /p<anything>/q...
                "Allow: /private/ok*\n"    # longer than Disallow below
                "Disallow: /private\n",
            ),
        ],
        "domain string, robots_txt string",
    )
    rules = parse_robots(robots, wildcards=True)
    urls = spark.createDataFrame(
        [
            ("w.com", "/a/b.tmp"),        # matches /*.tmp$ -> blocked
            ("w.com", "/a/b.tmpx"),       # $ anchor fails -> allowed
            ("w.com", "/p123/q/page"),    # /p*/q -> blocked
            ("w.com", "/pq"),             # needs '/q' after the run -> allowed
            ("w.com", "/private/ok/x"),   # Allow (len 12) beats Disallow (8)
            ("w.com", "/private/no"),     # only Disallow /private -> blocked
            ("w.com", "/other"),          # no rule -> allowed
        ],
        "domain string, path string",
    )
    got = {
        r["path"]: r["allowed"]
        for r in robots_filter(urls, rules, wildcards=True).collect()
    }
    assert got == {
        "/a/b.tmp": 0,
        "/a/b.tmpx": 1,
        "/p123/q/page": 0,
        "/pq": 1,
        "/private/ok/x": 1,
        "/private/no": 0,
        "/other": 1,
    }


def test_robots_wildcard_plain_rules_unchanged(spark):
    """A rule set with no wildcard chars must classify identically
    through the plain-prefix tier and the compiled-regex tier."""
    from geo_spark.operators.webcorpus import parse_robots, robots_filter

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
            ("b.com", "User-agent: *\nAllow: /\nDisallow: /x\n"),
        ],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("a.com", "/private/ok/page"),
            ("a.com", "/private/no"),
            ("b.com", "/x/y"),
            ("b.com", "/y"),
        ],
        "domain string, path string",
    )
    plain = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_filter(urls, parse_robots(robots)).collect()
    }
    wild = {
        (r["domain"], r["path"]): r["allowed"]
        for r in robots_filter(
            urls, parse_robots(robots, wildcards=True), wildcards=True
        ).collect()
    }
    assert plain == wild


def test_parse_sitemap(spark):
    from geo_spark.operators.webcorpus import parse_sitemap

    xml = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "  <url>\n    <loc>https://a.com/1</loc>\n"
        "    <lastmod>2026-01-05</lastmod>\n  </url>\n"
        "  <url><loc>https://a.com/2</loc></url>\n"
        "  <url><lastmod>2026-01-06</lastmod></url>\n"  # no loc: dropped
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("a.com", xml), ("b.com", "<urlset></urlset>")],
        "domain string, sitemap_xml string",
    )
    got = {
        (r["domain"], r["loc"]): r["lastmod"]
        for r in parse_sitemap(df).collect()
    }
    assert got == {
        ("a.com", "https://a.com/1"): "2026-01-05",
        ("a.com", "https://a.com/2"): "",
    }


def test_html_text_extraction(spark):
    from geo_spark.operators.webcorpus import html_text_col

    cases = [
        (
            "<html><head><title>T</title><script>if(1<2){x();}</script>"
            "<style>.a{color:red}</style></head>\n<body><p>hello"
            "<br>world</p>\n<div>a &amp; b &lt;tag&gt;</div></body></html>",
            "T hello world a & b <tag>",
        ),
        ("no markup at all", "no markup at all"),
        ("<p>&amp;lt; stays literal</p>", "&lt; stays literal"),
        ("<SCRIPT>upper case</SCRIPT>ok", "ok"),
        ("a\n\n  b\tc", "a b c"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "html string")
    got = [
        r["txt"]
        for r in df.select(html_text_col(F.col("html")).alias("txt")).collect()
    ]
    assert got == [w for _, w in cases]


def test_html_text_inversion_property(spark):
    """escape -> wrap in a full page -> extract == original text."""
    from geo_spark.operators.webcorpus import html_text_col

    texts = [
        "plain words only",
        "has & ampersand and <angle> brackets",
        'quotes " and \' apostrophes',
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    esc = F.col("t")
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    html = F.concat(
        F.lit("<html><head><script>var x = '<p>';</script></head><body><p>"),
        esc,
        F.lit("</p></body></html>"),
    )
    got = [
        r["txt"]
        for r in df.select(html_text_col(html).alias("txt")).collect()
    ]
    assert got == texts


def test_parse_robots_directives(spark):
    from geo_spark.operators.webcorpus import parse_robots_directives

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /x\nCrawl-delay: 2.5\n"
                "Sitemap: https://a.com/s1.xml\n"
                "Sitemap: https://a.com/s2.xml\n"
                "Sitemap: https://a.com/s1.xml\n",  # dup collapsed
            ),
            ("b.com", "crawl-delay: 10\n"),          # case-insensitive, int
            ("c.com", "Crawl-delay: 0.12345\n"),     # truncation to ms
            ("d.com", "User-agent: *\nDisallow: /\n"),  # nothing
        ],
        "domain string, robots_txt string",
    )
    got = {
        r["domain"]: (r["crawl_delay_ms"], list(r["sitemaps"]))
        for r in parse_robots_directives(robots).collect()
    }
    assert got == {
        "a.com": (2500, ["https://a.com/s1.xml", "https://a.com/s2.xml"]),
        "b.com": (10000, []),
        "c.com": (123, []),
        "d.com": (None, []),
    }


def test_scrub_pii_kinds_and_order(spark):
    from geo_spark.operators.webcorpus import scrub_pii

    rows = [
        (0, "mail bob.smith+x@ex-ample.co.uk now"),
        (1, "server at 10.0.255.7 port"),
        (2, "call +1 (555) 123-4567 today"),
        (3, "a@b.io and 1.2.3.4 and 555 123 4567 ok"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_email"], r["n_ip"], r["n_phone"])
        for r in scrub_pii(df).collect()
    }
    assert got[0] == ("mail <EMAIL> now", 1, 0, 0)
    assert got[1] == ("server at <IP> port", 0, 1, 0)
    assert got[2] == ("call <PHONE> today", 0, 0, 1)
    assert got[3] == ("<EMAIL> and <IP> and <PHONE> ok", 1, 1, 1)
    assert got[4] == ("nothing sensitive here", 0, 0, 0)


def test_split_assign_domain_keyed(spark):
    """Every page of a domain lands in ONE split (the leakage-safety
    property), and ratios are roughly honored over many domains."""
    from geo_spark.operators.webcorpus import split_assign

    rows = [
        (i, f"https://www.site{i % 200}.com/p/{i}") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = split_assign(df).select("doc_id", "url", "split").collect()
    by_domain = {}
    counts = {"train": 0, "val": 0, "test": 0}
    for r in out:
        d = r["url"].split("/")[2]
        by_domain.setdefault(d, set()).add(r["split"])
        counts[r["split"]] += 1
    assert all(len(s) == 1 for s in by_domain.values())
    assert counts["train"] > 1400 and counts["test"] < 400
    # determinism
    again = {r["doc_id"]: r["split"] for r in split_assign(df).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in out)


def test_snapshot_diff_statuses(spark):
    from geo_spark.operators.webcorpus import snapshot_diff

    old = spark.createDataFrame(
        [("a", "h1"), ("b", "h2"), ("c", "h3")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("b", "h2"), ("c", "hX"), ("d", "h4")], "url string, fp string"
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "removed",
        "b": "unchanged",
        "c": "changed",
        "d": "added",
    }


def test_snapshot_diff_null_fingerprints(spark):
    # Presence is decided by per-side flags, not fp nullness: a key in
    # BOTH snapshots with a null fp on either side is changed (or
    # unchanged for null-vs-null), never added/removed.
    from geo_spark.operators.webcorpus import snapshot_diff

    old = spark.createDataFrame(
        [("a", None), ("b", "h2"), ("c", None), ("d", "h4")],
        "url string, fp string",
    )
    new = spark.createDataFrame(
        [("a", "h1"), ("b", None), ("c", None), ("e", None)],
        "url string, fp string",
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "changed",  # null -> h1
        "b": "changed",  # h2 -> null
        "c": "unchanged",  # null -> null
        "d": "removed",  # present old only (null fp irrelevant)
        "e": "added",  # present new only (null fp irrelevant)
    }


def test_snapshot_diff_no_payload_in_plan(spark, tmp_path):
    from geo_spark.operators.webcorpus import snapshot_diff

    # the wide payload column must be pruned at the parquet scan
    old = spark.createDataFrame(
        [("a", "h1", "BIGOLD")], "url string, fp string, html string"
    )
    new = spark.createDataFrame(
        [("a", "h1", "BIGNEW")], "url string, fp string, html string"
    )
    po, pn = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(po)
    new.write.parquet(pn)
    out = snapshot_diff(spark.read.parquet(po), spark.read.parquet(pn))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "html" not in plan  # ReadSchema carries only url, fp
    assert out.collect()[0]["status"] == "unchanged"


def test_url_templates(spark):
    from geo_spark.operators.webcorpus import url_templates

    rows = (
        [(f"https://www.acme.com/2024/{m}/1/post-{m * 31}",) for m in range(1, 7)]
        + [("https://www.acme.com/about",)]
        + [(f"https://shop.acme.com/p/{i}?page={i % 3}",) for i in range(4)]
        + [("https://blog.globex.co.uk/tag/x",)] * 2
    )
    df = spark.createDataFrame(rows, "url string")
    got = {
        (r["domain"], r["template"]): r["n_urls"]
        for r in url_templates(df, min_count=2).collect()
    }
    # calendar trap collapses to one template with the big count
    assert got == {
        ("acme.com", "/{N}/{N}/{N}/post-{N}"): 6,
        ("acme.com", "/p/{N}?page={N}"): 4,
        ("globex.co.uk", "/tag/x"): 2,
    }
    # min_count=1 keeps the singleton '/about'
    all_t = {
        (r["domain"], r["template"])
        for r in url_templates(df, min_count=1).collect()
    }
    assert ("acme.com", "/about") in all_t


def test_url_templates_fragment_excluded(spark):
    from geo_spark.operators.webcorpus import url_templates

    df = spark.createDataFrame(
        [("https://a.com/x/1#sec-2",), ("https://a.com/x/9#sec-5",)],
        "url string",
    )
    got = {
        r["template"]: r["n_urls"] for r in url_templates(df).collect()
    }
    assert got == {"/x/{N}": 2}


def test_host_graph_reciprocity(spark):
    from geo_spark.operators.webcorpus import host_graph

    rows = [
        ("https://www.a.com/1", "https://cdn.b.org/x"),  # a->b (twice,
        ("https://blog.a.com/2", "https://www.b.org/y"),  # two hosts)
        ("https://www.b.org/z", "https://www.a.com/h"),  # b->a (recip)
        ("https://www.a.com/3", "https://shop.c.co.uk/p"),  # a->c 1-way
        ("https://www.a.com/4", "https://cdn.a.com/img"),  # intra: drop
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    got = {
        (r["src_domain"], r["dst_domain"]): (r["n_links"], r["reciprocal"])
        for r in host_graph(df).collect()
    }
    assert got == {
        ("a.com", "b.org"): (2, 1),
        ("b.org", "a.com"): (1, 1),
        ("a.com", "c.co.uk"): (1, 0),
    }
