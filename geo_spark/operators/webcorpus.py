"""Web-corpus URL/domain operators: host extraction, URL canonicalization,
registered-domain rollups, and crawl-style domain bucketing — all native
Spark SQL expressions (zero Python in the row path).

A Common-Crawl-scale corpus (the north rule's 10^12-page table) is
dominated by per-URL and per-domain bookkeeping: canonicalizing URLs
before dedup, rolling quality statistics up to the registered domain
(the unit at which crawl policies, spam scoring, and robots decisions
apply), and partitioning work by domain so one hot site cannot skew a
stage.  Everything here is a codegen'd projection or a single hash
aggregation:

* `host_col` — regex host extraction (one `regexp_extract`, JVM-side).
* `url_normalize_col` — scheme+host lowercase, default-port strip,
  fragment strip (RFC 3986 §6 normalizations that preserve semantics).
* `registered_domain_col` — last-two-labels rule with an embedded table
  of common multi-label public suffixes (``co.uk``-style).  The full
  public-suffix list is a data file a production deployment drops in;
  the *operator shape* (suffix match → label slice) is identical.
* `domain_bucket_col` — deterministic md5-based bucket id: the
  crawl-frontier partitioner (politeness / skew control), and the join
  key for co-locating per-domain state without a shuffle-by-domain.

Reference analog: none (akhenakh/geo is geometry-only); this is the
webtext half of the north star.  Oracle: every op re-derives in DuckDB
with plain string/regex SQL (`q_domain_stats`, `q_url_dedup`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Regex shared verbatim with the DuckDB oracles (RE2/ICU-compatible, no
# backrefs): scheme, then host = run of chars excluding delimiters.
HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)"

# Common multi-label public suffixes (subset of the published
# publicsuffix.org list; swap in the full file in production).
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx",
    "co.in", "net.in", "org.in", "firm.in",
    "co.kr", "or.kr", "go.kr",
    "com.tr", "org.tr",
    "com.ar", "org.ar",
    "co.za", "org.za", "web.za",
    "com.sg", "org.sg",
    "com.hk", "org.hk",
    "co.nz", "org.nz", "net.nz",
    "com.tw", "org.tw",
    "co.id", "or.id",
    "com.my", "org.my",
)


def synthetic_url_sql(id_col: str) -> str:
    """Engine-portable SQL deriving a deterministic Common-Crawl-style
    URL from an integer id (used by both the Spark queries and their
    DuckDB oracles — identical text, identical semantics).

    Consecutive id pairs share a base URL but differ in presentation
    (uppercase host, explicit default port, fragment), so URL dedup has
    real work; hosts spread over sub×name×suffix combinations incl.
    multi-label public suffixes."""
    base = f"CAST(FLOOR({id_col} / 2.0) AS BIGINT)"

    def pick(expr: str, options: tuple[str, ...]) -> str:
        whens = " ".join(f"WHEN {i} THEN '{o}'" for i, o in enumerate(options))
        return f"(CASE ({expr}) % {len(options)} {whens} END)"

    sub = pick(base, ("www", "cdn", "blog", "shop"))
    name = pick(f"{base} + 1", ("acme", "globex", "initech", "umbrella", "stark", "wayne", "hooli"))
    suf = pick(f"{base} + 2", (".com", ".org", ".co.uk", ".com.au", ".io"))
    host = f"({sub} || '.' || {name} || {suf})"
    path = f"('/Page/' || CAST({base} AS BIGINT))"
    plain = f"('https://' || {host} || {path})"
    messy = f"('https://' || upper({host}) || ':443' || {path} || '#sec-' || CAST({id_col} % 7 AS BIGINT))"
    return f"(CASE WHEN {id_col} % 2 = 0 THEN {plain} ELSE {messy} END)"


def host_col(url: Column) -> Column:
    """Lowercased host of a URL ('' when no ``scheme://host`` prefix)."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def url_normalize_col(url: Column) -> Column:
    """Semantics-preserving URL canonicalization (RFC 3986 §6):
    lowercase the scheme and host, drop ``:80``/``:443`` when they are
    the scheme default, drop the fragment.  Path/query are untouched
    (case-significant).  One regexp_replace chain, fully codegen."""
    # strip fragment
    u = F.regexp_replace(url, "#.*$", "")
    # split at the end of 'scheme://host[:port]' with one anchored
    # regex (group 2 = the rest) — no length arithmetic, so the whole
    # builder renders back to parseable SQL for register_sql's
    # CREATE FUNCTION export
    split_re = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)([\\s\\S]*)$"
    pref0 = F.regexp_extract(u, split_re, 1)
    rest = F.regexp_extract(u, split_re, 2)
    pref = F.lower(pref0)
    # default ports off the (now lowercased) prefix
    pref = F.regexp_replace(pref, "^(http://.*):80$", "$1")
    pref = F.regexp_replace(pref, "^(https://.*):443$", "$1")
    # no scheme://host prefix -> pass through untouched
    return F.when(pref0 == "", u).otherwise(F.concat(pref, rest))


def registered_domain_col(host: Column) -> Column:
    """Registered (pay-level) domain: one label above the public suffix.

    Last-2-labels by default; last-3 when the final two labels form a
    known multi-label suffix.  Hosts with <2 labels pass through."""
    labels = F.split(host, "\\.")
    n = F.array_size(labels)
    last2 = F.array_join(F.slice(labels, n - F.lit(1), 2), ".")
    last3 = F.array_join(F.slice(labels, n - F.lit(2), 3), ".")
    is_multi = last2.isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_bucket_col(domain: Column, n_buckets: int) -> Column:
    """Deterministic bucket id in [0, n_buckets): md5-prefix hash, the
    same engine-portable construction the sampling/dedup operators use
    (replayable in any SQL engine; independent of Spark's hash seed)."""
    return (
        F.conv(F.substring(F.md5(domain), 1, 15), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")


def domain_stats(pages: DataFrame, url: str = "url", text: str = "text") -> DataFrame:
    """Per-registered-domain corpus statistics: pages, distinct hosts,
    total/avg text chars.  One codegen projection + one hash aggregate
    (partial map-side combine; no skew risk — domains are the coarse
    key, and a hot domain still reduces to one row per partition before
    the exchange)."""
    host = host_col(F.col(url))
    base = pages.select(
        host.alias("host"),
        registered_domain_col(host).alias("domain"),
        F.length(F.col(text)).alias("n_chars"),
    )
    return base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("pages"),
        F.count_distinct(F.col("host")).alias("hosts"),
        F.sum("n_chars").alias("total_chars"),
    )


def url_dedup(pages: DataFrame, url: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Exact URL dedup after canonicalization: group by the normalized
    URL, keep the smallest id (deterministic winner).  The groupBy key
    is the canonical URL string — one shuffle, map-side combined."""
    return (
        pages.select(
            url_normalize_col(F.col(url)).alias("canon_url"), F.col(id_col)
        )
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


def robots_pattern_col(prefix: Column) -> Column:
    """Compile a REP rule path that may carry Google-extension
    wildcards (``*`` = any char run) and a trailing ``$`` end anchor
    into an anchored regex, entirely in native SQL:

    1. a trailing ``$`` (only there is it an anchor) is split off,
    2. every regex metachar EXCEPT ``*`` is backslash-escaped,
    3. ``*`` becomes ``.*``,
    4. the result is ``^``-anchored (REP rules match from the start of
       the path) and the end anchor re-appended if present.

    The emitted constructs (escaped literals, ``.*``, ``^``/``$``)
    behave identically under Java regex (Spark ``rlike``) and RE2
    (DuckDB ``regexp_matches``), which is what lets the contract
    oracle replay matching on the other engine."""
    has_end = prefix.endswith("$")
    # strip only a TRAILING $ (regexp, no length arithmetic — keeps
    # the builder renderable as SQL text for register_sql)
    body = F.regexp_replace(prefix, "\\$$", "")
    esc = F.regexp_replace(body, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1")
    return F.concat(
        F.lit("^"),
        F.regexp_replace(esc, "\\*", ".*"),
        F.when(has_end, F.lit("$")).otherwise(F.lit("")),
    )


def parse_robots(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    wildcards: bool = False,
) -> DataFrame:
    """(domain, prefix, allow, rule_len[, pattern]): parse robots.txt
    bodies into path rules — the crawl-policy half every fetch
    pipeline needs.  Scope (documented): the global `User-agent: *`
    group form, Allow/Disallow directives.  With ``wildcards=False``
    rules are plain prefixes (the original 1994 REP); with
    ``wildcards=True`` each rule also gets a ``pattern`` column —
    ``robots_pattern_col``'s compiled regex honoring ``*`` and a
    trailing ``$`` (the Google extension, REP RFC 9309 §2.2.3).
    ``rule_len`` is always the raw rule text length (wildcard chars
    included), the specificity key RFC 9309 longest-match uses.

    Pure native SQL: split lines -> regexp_extract the directive ->
    keep non-empty paths.  One explode of the (small) robots table."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), "\n", -1)).alias("_ln"),
    )
    d = F.regexp_extract(F.col("_ln"), r"^(Allow|Disallow):\s*(\S+)\s*$", 1)
    p = F.regexp_extract(F.col("_ln"), r"^(Allow|Disallow):\s*(\S+)\s*$", 2)
    out = (
        lines.select(
            "domain",
            d.alias("_d"),
            p.alias("prefix"),
        )
        .where((F.col("_d") != "") & (F.col("prefix") != ""))
        .select(
            "domain",
            "prefix",
            F.when(F.col("_d") == "Allow", F.lit(1))
            .otherwise(F.lit(0))
            .alias("allow"),
            F.length("prefix").cast("long").alias("rule_len"),
        )
    )
    if wildcards:
        out = out.withColumn("pattern", robots_pattern_col(F.col("prefix")))
    return out


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    domain_col: str = "domain",
    path_col: str = "path",
    wildcards: bool = False,
) -> DataFrame:
    """(urls..., allowed): apply parsed robots rules by the REP
    longest-match rule — the most specific (longest) matching rule
    decides; on equal length Allow wins (Google's documented
    tiebreak); no matching rule means allowed.  With
    ``wildcards=True`` the rules table must carry the compiled
    ``pattern`` column (``parse_robots(..., wildcards=True)``) and
    matching is the anchored-regex test instead of the prefix test.

    Plan: ONE broadcast LEFT join (rules tables are domain-sized; the
    match test rides inside the join condition — with the domain
    equality present it stays a broadcast HASH join, the regex is just
    the residual predicate) + one per-url struct-max aggregate
    (partial-aggregatable, no rank window, no second join — unmatched
    urls ride through as whole-null structs that max() skips)."""
    rcols = ["prefix", "allow", "rule_len"] + (["pattern"] if wildcards else [])
    r = rules.select(F.col("domain").alias("_rd"), *rcols)
    if wildcards:
        match = F.expr(f"{path_col} rlike pattern")
    else:
        match = F.expr(f"substring({path_col}, 1, length(prefix)) = prefix")
    cond = (F.col(domain_col) == F.col("_rd")) & match
    best = F.max(
        F.when(
            F.col("rule_len").isNotNull(),
            F.struct("rule_len", "allow"),
        )
    ).alias("_best")
    return (
        urls.join(F.broadcast(r), cond, "left")
        .groupBy(*urls.columns)
        .agg(best)
        .select(
            *urls.columns,
            F.coalesce(F.col("_best.allow"), F.lit(1))
            .cast("long")
            .alias("allowed"),
        )
    )


def parse_sitemap(
    sitemaps: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(domain, loc, lastmod): parse sitemap XML bodies (the
    sitemaps.org urlset form) into one row per <url> entry — the
    crawl-discovery companion to parse_robots.  <lastmod> is optional
    per entry ('' when absent; it drives recrawl scheduling).

    Native SQL only: one regexp_extract_all over the body splits the
    <url> blocks ([\\s\\S]*? so entries may span lines), then per-block
    regexp_extract pulls loc/lastmod — codegen end to end, one explode
    of the (small, per-domain) sitemap table, the parse_robots scale
    shape.  Scope: no <sitemapindex> recursion (an index file is just
    another explode of the same shape), no namespace handling."""
    entries = sitemaps.select(
        F.col(domain_col).alias("domain"),
        F.explode(
            F.expr(
                f"regexp_extract_all({xml_col}, "
                "'<url>([\\\\s\\\\S]*?)</url>', 1)"
            )
        ).alias("_e"),
    )
    return entries.select(
        "domain",
        F.regexp_extract(F.col("_e"), "<loc>([^<]*)</loc>", 1).alias("loc"),
        F.regexp_extract(
            F.col("_e"), "<lastmod>([^<]*)</lastmod>", 1
        ).alias("lastmod"),
    ).where(F.col("loc") != "")


def html_text_col(html: Column) -> Column:
    """Visible text of an HTML document as ONE codegen regexp chain —
    the extraction step of the north rule's "byte-identical extracted
    text per url" invariant:

    1. <script>/<style> blocks removed wholesale (their text is not
       content; (?is) = case-insensitive dotall, with a backreference
       so <script> never closes a <style>),
    2. every remaining tag -> a space (tags are word boundaries:
       ``a<br>b`` must not fuse),
    3. the five core entities decoded, ``&amp;`` LAST (so
       ``&amp;lt;`` correctly yields the literal text ``&lt;``),
    4. whitespace runs collapsed to single spaces, ends trimmed.

    Deliberately not a DOM parser: at 10^12 pages the extractor must
    be a streaming byte transform (this chain is whole-stage codegen,
    zero Python, no allocation proportional to tree depth), and the
    contract query certifies it by INVERSION — synthesized pages wrap
    known text, extraction must return it byte-identically."""
    x = F.regexp_replace(
        html, "(?is)<(script|style)[^>]*>.*?</\\1\\s*>", " "
    )
    x = F.regexp_replace(x, "<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, "\\s+", " "))


def parse_robots_directives(
    robots: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """(domain, crawl_delay_ms, sitemaps): the non-rule robots.txt
    directives the crawl SCHEDULER consumes — Crawl-delay (seconds,
    fractional allowed; emitted as exact milliseconds via integer
    parsing of the decimal text, NO float round-trip) and Sitemap URLs
    (absolute, may repeat; kept sorted-distinct).  Missing directives
    -> NULL delay / empty array.  Rule parsing stays in parse_robots;
    this is one more pass over the same (small) exploded line table.

    The ms conversion: seconds '12.34' splits at '.', integer part
    *1000 plus the fraction left-padded... rather: fraction text
    truncated/padded to 3 digits — '0.5' -> 500, '2' -> 2000,
    '1.2345' -> 1234 — all string+integer SQL, engine-portable."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), "\n", -1)).alias("_ln"),
    )
    delay_txt = F.regexp_extract(
        F.col("_ln"), r"^[Cc]rawl-[Dd]elay:\s*([0-9]+(?:\.[0-9]+)?)\s*$", 1
    )
    sitemap = F.regexp_extract(
        F.col("_ln"), r"^[Ss]itemap:\s*(\S+)\s*$", 1
    )
    parts = F.split(delay_txt, "\\.")
    # F.get (0-based) returns NULL out of bounds even under ANSI mode
    intpart = F.get(parts, 0).cast("long") * 1000
    frac = F.rpad(
        F.substring(F.coalesce(F.get(parts, 1), F.lit("")), 1, 3),
        3,
        "0",
    ).cast("long")
    delay_ms = F.when(delay_txt != "", intpart + frac)
    return (
        lines.select("domain", delay_ms.alias("_d"), sitemap.alias("_s"))
        .groupBy("domain")
        .agg(
            F.min("_d").alias("crawl_delay_ms"),
            F.array_sort(
                F.array_distinct(
                    F.filter(F.collect_list("_s"), lambda s: s != "")
                )
            ).alias("sitemaps"),
        )
    )


# PII patterns, shared verbatim with oracles (RE2/Java-compatible).
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4_RE = (
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
)
# leading + sits between two non-word chars, so \b can't anchor it —
# alternate on an explicit '+' instead
PII_PHONE_RE = "(?:\\+|\\b)[0-9][0-9()\\- ]{7,}[0-9]\\b"


def scrub_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact emails / IPv4 addresses / phone-number-shaped runs to
    typed placeholder tokens — the PII-scrubbing stage every public
    corpus release runs.  Three codegen regexp_replace passes in a
    fixed order (emails first: an address contains digit runs a naive
    phone pattern would eat).  Also emits per-kind redaction counts
    (the audit metric) via the same patterns, so counting and
    replacement can't drift apart."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
    t1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(t1, F.lit(PII_IPV4_RE), 0))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_phone = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_RE), 0))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return docs.withColumns(
        {
            out_col: t3,
            "n_email": n_email.cast("long"),
            "n_ip": n_ip.cast("long"),
            "n_phone": n_phone.cast("long"),
        }
    )


def split_assign(
    docs: DataFrame,
    url_col: str = "url",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """(docs..., split): deterministic train/val/test assignment keyed
    by REGISTERED DOMAIN — the leakage-safe rule: near-duplicate and
    templated pages live on the same domain, so splitting by document
    would leak them across sets; hashing the domain puts every page
    of a site in ONE split.  md5-prefix bucket in [0,100) (the
    engine's portable-hash discipline, replayable in any SQL engine);
    [0,train) -> train, [train,train+val) -> val, rest -> test."""
    dom = registered_domain_col(host_col(F.col(url_col)))
    bucket = (
        F.conv(F.substring(F.md5(dom), 1, 13), 16, 10).cast("long") % 100
    )
    return docs.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    fp: str = "fp",
) -> DataFrame:
    """(key, status): classify every url across two crawl snapshots —
    'added' (new only), 'removed' (old only), 'changed' (present in
    both, content fingerprint differs), 'unchanged' — the incremental
    recrawl planner's core table (fetch budget goes to added+changed;
    removed rows tombstone downstream corpora).  Keys are assumed
    unique per snapshot (run url_dedup upstream).

    One full-outer hash join on the key over skinny (key, fp) rows is
    the whole plan.  At 10^12-row scale both snapshots live in the
    same Iceberg layout bucketed by url hash, so the join co-locates
    without a shuffle; unbucketed inputs pay one exchange of two
    narrow columns each — never of the page payloads (project the
    fingerprint BEFORE the join, which this operator enforces by
    selecting only (key, fp))."""
    o = old.select(
        F.col(key).alias("_k"), F.col(fp).alias("_of"), F.lit(1).alias("_op")
    )
    n = new.select(
        F.col(key).alias("_k"), F.col(fp).alias("_nf"), F.lit(1).alias("_np")
    )
    # Presence is decided by explicit per-side flags, NOT fingerprint
    # nullness, so a NULL fingerprint on a present row classifies
    # correctly; fingerprints compare null-safely (null vs null is
    # 'unchanged', null vs non-null is 'changed').
    return (
        o.join(n, "_k", "full_outer")
        .select(
            F.col("_k").alias(key),
            F.when(F.col("_op").isNull(), F.lit("added"))
            .when(F.col("_np").isNull(), F.lit("removed"))
            .when(~F.col("_of").eqNullSafe(F.col("_nf")), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


# path+query of a URL (fragment excluded) — group 1
PATH_QUERY_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"


def url_templates(
    pages: DataFrame,
    url: str = "url",
    min_count: int = 1,
) -> DataFrame:
    """(domain, template, n_urls): URL path templates per registered
    domain — every digit run in the path+query generalizes to '{N}'
    ('/2024/7/14/post-9' -> '/{N}/{N}/{N}/post-{N}') and identical
    templates aggregate.  The crawler-trap detector (calendar and
    pagination explosions surface as ONE template with a huge
    n_urls), site-structure miner, and dedup-key generator of a
    Common-Crawl-scale frontier.

    Pure codegen: two regexps (path extract, digit generalize) + one
    map-combined (domain, template) count — templates are LOW
    cardinality by construction (that is the point), so the shuffle
    carries the aggregated template table, not urls.  Fragments are
    excluded (never sent to servers); query strings are kept (?page=
    IS the trap signature)."""
    dom = registered_domain_col(host_col(F.col(url)))
    path = F.regexp_extract(F.col(url), PATH_QUERY_RE, 1)
    tmpl = F.regexp_replace(path, "[0-9]+", "{N}")
    return (
        pages.select(dom.alias("domain"), tmpl.alias("template"))
        .groupBy("domain", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .where(F.col("n_urls") >= F.lit(min_count))
    )


def host_graph(
    links: DataFrame,
    src_url: str = "src_url",
    dst_url: str = "dst_url",
) -> DataFrame:
    """(src_domain, dst_domain, n_links, reciprocal): the registered-
    domain link graph — url->url outlink edges collapse to weighted
    domain->domain edges; intra-domain edges drop (navigation noise,
    and the majority of raw outlinks); ``reciprocal`` = 1 when the
    reverse domain edge also exists (mutual linking — the strongest
    spam/endorsement discriminator at host level, and what TrustRank
    seed audits read first).

    Scale shape: ONE map-combined (src_domain, dst_domain) count over
    the url edges — the only full-data shuffle, carrying two short
    strings per row; the reciprocity test is a self hash join of the
    aggregated DOMAIN graph (orders of magnitude smaller than the url
    graph) on the reversed key.  Domain derivation is the pure-codegen
    regexp/array chain (host -> registered domain), zero Python."""
    s = registered_domain_col(host_col(F.col(src_url)))
    d = registered_domain_col(host_col(F.col(dst_url)))
    g = (
        links.select(s.alias("src_domain"), d.alias("dst_domain"))
        .where(F.col("src_domain") != F.col("dst_domain"))
        .groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    rev = g.select(
        F.col("dst_domain").alias("src_domain"),
        F.col("src_domain").alias("dst_domain"),
        F.lit(1).alias("_r"),
    )
    return g.join(rev, ["src_domain", "dst_domain"], "left").select(
        "src_domain",
        "dst_domain",
        "n_links",
        F.coalesce(F.col("_r"), F.lit(0)).cast("int").alias("reciprocal"),
    )
