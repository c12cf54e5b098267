"""URL hygiene operators for crawled-web corpora.

The reference keys every document by its source url
(src/meilisearch_integration/document_processor.py uses the page url as the
primary key); at crawl scale the SAME page arrives under many surface forms
(case-variant hosts, default ports, tracking parameters, fragments), so a
100 TB pipeline canonicalizes urls BEFORE url-keyed dedup/upserts — else
re-crawls of `HTTPS://Site/?utm_source=x` and `https://site/` index twice.
The rules here are the standard public canonicalization set (RFC 3986 §6
syntax-based normalization + the common tracking-parameter strip):

- lowercase scheme and host (path/query stay case-sensitive per RFC 3986)
- drop the fragment (never sent to the server)
- drop the scheme's default port (:80 http, :443 https)
- drop tracking parameters (utm_*, gclid, fbclid), then the bare '?'
- registered domain = last two host labels (documented approximation; a
  public-suffix list lookup is the production upgrade and slots in here)

Everything is a pure per-row Column expression (regexps restricted to the
Java-regex / RE2 common subset so the DuckDB oracle is exact) — zero
shuffle, whole-stage codegen, same contract as textstats/gopher.  The
host rollup is one groupBy with map-side combine; mega-hosts are bounded
by the combine (one partial row per partition per host).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tracking-parameter names dropped during normalization (public lists:
# Google/Facebook click ids + the urchin tracking module family)
# '=' optional so a bare '?utm_source' (valueless param) strips too
TRACKING_PARAM_RE = "^(utm_[^=&]*|gclid|fbclid)(=|$)"


def normalize_urls(docs: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Canonicalize urls → (doc_key, url, norm_url, host, domain).

    ``host`` is the lowercased, default-port-stripped authority;
    ``domain`` the last two host labels ('' when the host has fewer).
    """
    u = F.regexp_replace(F.col(url_col), "#.*$", "")  # fragment off first
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z]+)://", 1))
    raw_host = F.lower(F.regexp_extract(u, "^[A-Za-z]+://([^/?]+)", 1))
    path = F.regexp_extract(u, "^[A-Za-z]+://[^/?]*([^?]*)", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    host = F.when(
        ((scheme == "https") & raw_host.endswith(":443"))
        | ((scheme == "http") & raw_host.endswith(":80")),
        F.regexp_replace(raw_host, ":[0-9]+$", ""),
    ).otherwise(raw_host)
    base = docs.select(
        F.col(id_col).alias("doc_key"),
        F.col(url_col).alias("url"),
        scheme.alias("scheme"),
        host.alias("host"),
        path.alias("path"),
        query.alias("query"),
    )
    q = F.expr(
        "array_join(filter(split(query, '&'),"
        f" p -> p != '' AND NOT p rlike '{TRACKING_PARAM_RE}'), '&')"
    )
    return base.select(
        "doc_key",
        "url",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            F.col("path"),
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ).alias("norm_url"),
        "host",
        # domain comes from the PORTLESS host — a non-default port stays in
        # host ('a.example.com:8080') but must not leak into the registered
        # domain ('example.com', not 'example.com:8080')
        F.regexp_extract(
            F.regexp_replace("host", ":[0-9]+$", ""), r"([^.]+\.[^.]+)$", 1
        ).alias("domain"),
    )


def normalize_urls_sql(table: str, id_col: str, url_col: str) -> str:
    """DuckDB twin of :func:`normalize_urls`."""
    return f"""
WITH s1 AS (
  SELECT {id_col} AS doc_key, {url_col} AS url,
         regexp_replace({url_col}, '#.*$', '') AS u
  FROM {table}
),
parts AS (
  SELECT doc_key, url,
         lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
         lower(regexp_extract(u, '^[A-Za-z]+://([^/?]+)', 1)) AS raw_host,
         regexp_extract(u, '^[A-Za-z]+://[^/?]*([^?]*)', 1) AS path,
         regexp_extract(u, '\\?(.*)$', 1) AS query
  FROM s1
),
np AS (
  SELECT doc_key, url, scheme,
         CASE WHEN (scheme = 'https' AND raw_host LIKE '%:443')
                OR (scheme = 'http' AND raw_host LIKE '%:80')
              THEN regexp_replace(raw_host, ':[0-9]+$', '') ELSE raw_host END AS host,
         path,
         array_to_string(list_filter(string_split(query, '&'),
           p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')), '&') AS q
  FROM parts
)
SELECT doc_key, url,
       scheme || '://' || host || path
         || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS norm_url,
       host,
       regexp_extract(regexp_replace(host, ':[0-9]+$', ''),
                      '([^.]+\\.[^.]+)$', 1) AS domain
FROM np
"""


def host_stats(urls: DataFrame) -> DataFrame:
    """Per-host rollup over :func:`normalize_urls` output →
    (host, domain, n_docs, n_urls): document count and DISTINCT canonical
    urls — ``n_docs > n_urls`` means the crawl fetched the same canonical
    page more than once (re-crawls / tracking-param variants), the signal
    behind url-level dedup and per-host crawl budgets.

    One groupBy with partial aggregation; count(DISTINCT) rewrites to a
    two-phase expand internally, still map-side combined per host."""
    return urls.groupBy("host", "domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("norm_url").cast("long").alias("n_urls"),
    )


def host_stats_sql(urls_sql: str) -> str:
    """DuckDB twin of :func:`host_stats` over the normalize_urls_sql text."""
    return f"""
WITH u AS ({urls_sql})
SELECT host, domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT norm_url) AS BIGINT) AS n_urls
FROM u GROUP BY 1, 2
"""


def filter_blocklist(
    urls: DataFrame, blocked: list[str], col: str = "host"
) -> DataFrame:
    """Drop crawl rows whose ``col`` (host or registrable domain, as
    produced by :func:`normalize_urls`) is on ``blocked`` — the standard
    URL-level safety/quality gate (adult/malware/spam domain lists) run
    before any tokenization spend.

    The blocklist is a literal IN-set (real lists are ~1e5-1e6 entries:
    still a broadcast; swap to a broadcast anti-join above ~1e7).  Pure
    Column predicate on the scan — zero shuffle, pushdown-friendly.
    """
    if col not in ("host", "domain"):
        raise ValueError(f"col must be 'host' or 'domain', got {col!r}")
    if not blocked:
        # an empty list is almost always a failed blocklist load — refusing
        # beats silently switching the gate off (and the SQL twin's IN ()
        # would not even parse)
        raise ValueError("blocked must be non-empty; pass the gate through explicitly if no blocklist applies")
    return urls.filter(~F.col(col).isin(blocked))


def filter_blocklist_sql(urls_sql: str, blocked: list[str], col: str = "host") -> str:
    """DuckDB twin of :func:`filter_blocklist`."""
    if not blocked:
        raise ValueError("blocked must be non-empty; pass the gate through explicitly if no blocklist applies")
    in_list = ", ".join("'" + b.replace("'", "''") + "'" for b in blocked)
    return f"""
WITH u AS ({urls_sql})
SELECT * FROM u WHERE {col} NOT IN ({in_list})
"""


def recrawl_latest(
    pages: DataFrame, url_col: str, ts_col: str, tie_col: str
) -> DataFrame:
    """Re-crawl resolution: keep the NEWEST capture of every url.

    A Common-Crawl-style table (reference key: page url,
    ``src/meilisearch_integration/document_processor.py``) carries the same
    url once per crawl — (url, warc_ts) rows.  Indexing wants exactly one
    row per url: the latest capture (MeiliSearch add-or-replace semantics,
    reference ``client.py:177`` — the last write wins; this operator makes
    "last" explicit as max ``ts_col``).

    ONE aggregate with ``max_by`` over the total ordering key
    ``struct(ts, tie)`` — map-side combinable (``partial_max_by`` runs
    before the exchange, each partition keeping one candidate row per
    url), so at 100 TB the shuffle carries ~|distinct urls| rows, not the
    corpus.  A window ``row_number() OVER (PARTITION BY url ORDER BY ts
    DESC)`` computes the same answer but ships EVERY row through the
    exchange before cutting.  (Struct-valued agg buffers aren't
    hash-aggregable, so Spark picks SortAggregate — a per-partition sort
    by the group key over the already-reduced rows, not the corpus-wide
    sort the window shape pays.)  ``tie_col`` makes the key total so
    equal-timestamp re-crawls resolve deterministically on any cluster
    size (max_by alone is free to return either).
    """
    cols = [c for c in pages.columns if c != url_col]
    key = F.struct(F.col(ts_col), F.col(tie_col))
    winner = F.max_by(F.struct(*[F.col(c) for c in cols]), key).alias("w")
    return pages.groupBy(F.col(url_col).alias("url")).agg(winner).select(
        "url", *[F.col(f"w.{c}").alias(c) for c in cols]
    )


def recrawl_latest_sql(
    pages_sql: str, url_col: str, ts_col: str, tie_col: str, cols: list[str]
) -> str:
    """DuckDB twin of :func:`recrawl_latest` (window form — same answer
    because the ordering key is total; the Spark side deliberately avoids
    the sort)."""
    sel = ", ".join(cols)
    return f"""
WITH p AS ({pages_sql}),
r AS (
  SELECT {url_col} AS url, {sel},
         row_number() OVER (
           PARTITION BY {url_col} ORDER BY {ts_col} DESC, {tie_col} DESC
         ) AS rn
  FROM p
)
SELECT url, {sel} FROM r WHERE rn = 1
"""


# ----------------------------------------------------------- robots.txt
# RFC 9309 SUBSET, documented restrictions: only the `User-agent: *` group
# is resolved (a per-agent variant is the same plan with a different group
# predicate), and rule values are treated as PLAIN PATH PREFIXES — the
# optional '*' / '$' pattern wildcards are out of scope (the overwhelmingly
# common case in the wild is a bare prefix; a wildcard engine would need a
# regex translation layer on both sides of the oracle).  Matching follows
# the RFC: the longest matching rule wins, Allow beats Disallow on equal
# length, no matching rule means allowed.

def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies → ``(host, rule, path)``: the ``User-agent: *``
    group's Allow/Disallow prefix rules.

    Group resolution per RFC 9309 §2.1: a group is one or more consecutive
    ``User-agent`` lines followed by rules; a later ``User-agent`` line
    (after rules) starts a NEW group.  Implemented as per-host windows:
    a block starts at a UA line whose predecessor is not a UA line; every
    line inherits the last block start; a block applies iff any of its UA
    lines is ``*``.  Comments (``#…``) and blank/empty-value lines drop.
    The host key is lowercased (DNS names are case-insensitive — a fetcher
    that keyed the file by the URL's casing must still match the
    lowercased hosts :func:`apply_robots` joins on).
    All windows are partitioned by host and robots files are KB-sized, so
    the parse is hosts-bounded — never corpus-bounded — at 100 TB.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    lines = (
        robots.select(
            F.lower(F.col(host_col)).alias("host"),
            F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
        )
        .withColumn("line", F.trim(F.regexp_replace("raw", "#.*$", "")))
        .withColumn(
            "key", F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
        )
        .withColumn("value", F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)))
        .filter(F.col("key").isin("user-agent", "allow", "disallow"))
    )
    lines = (
        lines.withColumn("is_ua", F.col("key") == "user-agent")
        .withColumn(
            "block_start",
            F.last(
                F.when(
                    F.col("is_ua")
                    & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
                    F.col("pos"),
                ),
                ignorenulls=True,
            ).over(cum),
        )
        .filter(F.col("block_start").isNotNull())
    )
    star_blocks = (
        lines.filter(F.col("is_ua") & (F.col("value") == "*"))
        .select("host", "block_start")
        .distinct()
    )
    return (
        lines.filter(~F.col("is_ua") & (F.col("value") != ""))
        .join(star_blocks, ["host", "block_start"])
        .select("host", F.col("key").alias("rule"), F.col("value").alias("path"))
        .distinct()
    )


def parse_robots_sql(
    robots_sql: str, host_col: str = "host", body_col: str = "robots_txt"
) -> str:
    """DuckDB twin of :func:`parse_robots` (same window construction)."""
    return f"""
WITH r0 AS ({robots_sql}),
lines0 AS (
  SELECT lower({host_col}) AS host,
         generate_subscripts(string_split({body_col}, chr(10)), 1) AS pos,
         unnest(string_split({body_col}, chr(10))) AS raw
  FROM r0
),
lines1 AS (
  SELECT host, pos, trim(regexp_replace(raw, '#.*$', '')) AS line FROM lines0
),
lines2 AS (
  SELECT host, pos,
         lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS key,
         trim(regexp_extract(line, '^[A-Za-z-]+\\s*:(.*)$', 1)) AS value
  FROM lines1
  WHERE lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1))
        IN ('user-agent', 'allow', 'disallow')
),
marked AS (
  SELECT *, (key = 'user-agent') AS is_ua,
         (key = 'user-agent' AND NOT COALESCE(
            lag(key = 'user-agent') OVER (PARTITION BY host ORDER BY pos),
            FALSE)) AS is_block_start
  FROM lines2
),
blocked AS (
  SELECT *, last_value(CASE WHEN is_block_start THEN pos END IGNORE NULLS)
              OVER (PARTITION BY host ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block_start
  FROM marked
),
star AS (
  SELECT DISTINCT host, block_start FROM blocked
  WHERE is_ua AND value = '*' AND block_start IS NOT NULL
)
SELECT DISTINCT b.host, b.key AS rule, b.value AS path
FROM blocked b JOIN star USING (host, block_start)
WHERE NOT b.is_ua AND b.value <> ''
"""


def parse_crawl_delay(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt bodies → ``(host, crawl_delay_sec)``: the ``User-agent:
    *`` group's ``Crawl-delay`` directive (the de-facto politeness
    extension Bing/Yandex honor; not part of RFC 9309, which is why it is
    a sibling of :func:`parse_robots` rather than a new rule kind — the
    Allow/Disallow gate's plan and its driver-gated oracle stay
    byte-identical).

    Same per-host block-window construction as :func:`parse_robots`
    (hosts-bounded, never corpus-bounded).  Non-numeric values drop; a
    host declaring several applicable delays keeps the MOST CONSERVATIVE
    (maximum).  Hosts without the directive are absent — the crawler's
    default applies.  Feeds :func:`~..webgraph.frontier`'s
    ``crawl_delays`` politeness refinement.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    lines = (
        robots.select(
            F.lower(F.col(host_col)).alias("host"),
            F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
        )
        .withColumn("line", F.trim(F.regexp_replace("raw", "#.*$", "")))
        .withColumn(
            "key", F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
        )
        .withColumn("value", F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)))
        .filter(F.col("key").isin("user-agent", "crawl-delay"))
    )
    lines = (
        lines.withColumn("is_ua", F.col("key") == "user-agent")
        .withColumn(
            "block_start",
            F.last(
                F.when(
                    F.col("is_ua")
                    & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
                    F.col("pos"),
                ),
                ignorenulls=True,
            ).over(cum),
        )
        .filter(F.col("block_start").isNotNull())
    )
    star_blocks = (
        lines.filter(F.col("is_ua") & (F.col("value") == "*"))
        .select("host", "block_start")
        .distinct()
    )
    return (
        lines.filter(~F.col("is_ua"))
        .join(star_blocks, ["host", "block_start"])
        .withColumn("delay", F.col("value").try_cast("double"))  # ANSI: junk → NULL, not throw
        .filter(F.col("delay").isNotNull() & (F.col("delay") >= 0))
        .groupBy("host")
        .agg(F.max("delay").alias("crawl_delay_sec"))
    )


def parse_crawl_delay_sql(
    robots_sql: str, host_col: str = "host", body_col: str = "robots_txt"
) -> str:
    """DuckDB twin of :func:`parse_crawl_delay`."""
    return f"""
WITH r0 AS ({robots_sql}),
lines0 AS (
  SELECT lower({host_col}) AS host,
         generate_subscripts(string_split({body_col}, chr(10)), 1) AS pos,
         unnest(string_split({body_col}, chr(10))) AS raw
  FROM r0
),
lines2 AS (
  SELECT host, pos,
         lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS key,
         trim(regexp_extract(line, '^[A-Za-z-]+\\s*:(.*)$', 1)) AS value
  FROM (SELECT host, pos, trim(regexp_replace(raw, '#.*$', '')) AS line
        FROM lines0)
  WHERE lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1))
        IN ('user-agent', 'crawl-delay')
),
marked AS (
  SELECT *, (key = 'user-agent') AS is_ua,
         (key = 'user-agent' AND NOT COALESCE(
            lag(key = 'user-agent') OVER (PARTITION BY host ORDER BY pos),
            FALSE)) AS is_block_start
  FROM lines2
),
blocked AS (
  SELECT *, last_value(CASE WHEN is_block_start THEN pos END IGNORE NULLS)
              OVER (PARTITION BY host ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block_start
  FROM marked
),
star AS (
  SELECT DISTINCT host, block_start FROM blocked
  WHERE is_ua AND value = '*' AND block_start IS NOT NULL
)
SELECT host, MAX(delay) AS crawl_delay_sec FROM (
  SELECT b.host, TRY_CAST(b.value AS DOUBLE) AS delay
  FROM blocked b JOIN star USING (host, block_start)
  WHERE NOT b.is_ua
)
WHERE delay IS NOT NULL AND delay >= 0
GROUP BY host
"""


def apply_robots(
    urls: DataFrame, id_col: str, url_col: str, robots: DataFrame
) -> DataFrame:
    """Crawl-politeness gate: keep/flag urls per their host's robots.txt →
    ``(doc_key, host, path, allowed, matched_rule, matched_path)``.

    The rules relation (from :func:`parse_robots`) is hosts-sized: it is
    pre-aggregated to ONE array row per host and broadcast, so the corpus
    side is a broadcast join plus a per-row
    ``array_max(filter(rules, prefix-match))`` winner pick — the struct
    ordering ``(len, is_allow, …)`` encodes the RFC precedence (longest
    match, Allow beats Disallow on ties) and the corpus NEVER shuffles
    (the only exchanges are hosts-bounded, on the rules side).  Hosts
    without a robots file (left join) and urls no rule matches are
    allowed.

    Matching follows RFC 9309 §2.2.2: the matched string is the PATH PLUS
    QUERY of the url (so ``Disallow: /search?q=`` is a live rule), and a
    bare-host url matches as ``/`` (so ``Disallow: /`` blocks the root).
    """
    u = F.regexp_replace(F.col(url_col), "#.*$", "")
    raw_path = F.regexp_extract(u, "^[A-Za-z]+://[^/?]*(.*)$", 1)
    base = urls.select(
        F.col(id_col).alias("doc_key"),
        F.lower(
            F.regexp_replace(
                F.regexp_extract(u, "^[A-Za-z]+://([^/?]+)", 1), ":[0-9]+$", ""
            )
        ).alias("host"),
        # bare host → '/', query-only ('?q=…') → '/?q=…'
        F.when(raw_path == "", F.lit("/"))
        .when(raw_path.startswith("?"), F.concat(F.lit("/"), raw_path))
        .otherwise(raw_path)
        .alias("path"),
    )
    rules_arr = robots.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.length("path").cast("long").alias("rlen"),
                (F.col("rule") == "allow").alias("is_allow"),
                F.col("path").alias("rpath"),
                F.col("rule").alias("rule"),
            )
        ).alias("rules")
    )
    best = base.join(F.broadcast(rules_arr), "host", "left").select(
        "doc_key",
        "host",
        "path",
        F.array_max(
            F.filter("rules", lambda r: F.col("path").startswith(r["rpath"]))
        ).alias("w"),
    )
    return best.select(
        "doc_key",
        "host",
        "path",
        F.coalesce(F.col("w.is_allow"), F.lit(True)).alias("allowed"),
        F.col("w.rule").alias("matched_rule"),
        F.col("w.rpath").alias("matched_path"),
    )


def apply_robots_sql(urls_sql: str, rules_sql: str) -> str:
    """DuckDB twin of :func:`apply_robots` — ``urls_sql`` must yield
    (doc_key, url); ``rules_sql`` the (host, rule, path) relation."""
    return f"""
WITH u0 AS ({urls_sql}),
u1 AS (
  SELECT doc_key,
         lower(regexp_replace(
             regexp_extract(regexp_replace(url, '#.*$', ''),
                            '^[A-Za-z]+://([^/?]+)', 1), ':[0-9]+$', '')) AS host,
         regexp_extract(regexp_replace(url, '#.*$', ''),
                        '^[A-Za-z]+://[^/?]*(.*)$', 1) AS raw_path
  FROM u0
),
u AS (
  SELECT doc_key, host,
         CASE WHEN raw_path = '' THEN '/'
              WHEN starts_with(raw_path, '?') THEN '/' || raw_path
              ELSE raw_path END AS path
  FROM u1
),
rules AS (
  SELECT host, rule, path AS rpath, length(path)::BIGINT AS rlen,
         (rule = 'allow') AS is_allow
  FROM ({rules_sql})
),
j AS (
  SELECT u.doc_key, u.host, u.path, r.rule, r.rpath, r.rlen, r.is_allow,
         (r.rpath IS NOT NULL AND starts_with(u.path, r.rpath)) AS hit
  FROM u LEFT JOIN rules r USING (host)
),
best AS (
  SELECT doc_key, host, path,
         max(CASE WHEN hit THEN {{'rlen': rlen, 'is_allow': is_allow,
                                  'rpath': rpath, 'rule': rule}} END) AS w
  FROM j GROUP BY 1, 2, 3
)
SELECT doc_key, host, path,
       COALESCE(w.is_allow, TRUE) AS allowed,
       w.rule AS matched_rule,
       w.rpath AS matched_path
FROM best
"""


# sitemap <url> blocks, matched whole then field-extracted (same two-step
# pattern as webgraph's anchor tags — RE2/Java common subset, no DOM)
_SITEMAP_URL_BLOCK_RE = r"(?is)<url>.*?</url>"
_SITEMAP_LOC_RE = r"(?is)<loc>\s*([^<]*?)\s*</loc>"
_SITEMAP_LASTMOD_RE = r"(?is)<lastmod>\s*([^<]*?)\s*</lastmod>"
_SITEMAP_INDEX_BLOCK_RE = r"(?is)<sitemap>.*?</sitemap>"


def parse_sitemaps(sitemaps: DataFrame, host_col: str, xml_col: str) -> DataFrame:
    """Sitemap XML → one row per declared url: (host, url, lastmod) — the
    crawl-discovery channel next to link extraction (sitemaps.org protocol;
    sites declare urls + last-modified so crawlers can schedule
    re-fetches).  Feeds the same consumers as webgraph.frontier
    (discovery) and recrawl_latest (freshness).

    Whole-``<url>``-block extraction then per-block loc/lastmod — attribute
    order and interleaved tags never matter; entries without a ``<loc>``
    are dropped (protocol-invalid); ``<loc>`` XML entities decode (the
    protocol REQUIRES urls entity-escaped, so every query-string url
    carries ``&amp;`` — undecoded it would never join a raw fetch-url
    key); ``lastmod`` parses RFC 3339 date/date-time to a timestamp (NULL
    when absent or unparseable — schedulers treat unknown freshness as
    stale).  Timestamps are instants: offset-bearing lastmod values
    resolve through Spark's session timezone at render time, while the
    DuckDB twin renders naive UTC — run cross-engine compares under
    ``spark.sql.session.timeZone=UTC``.  Pure codegen explode; the
    sitemap table is hosts-bounded, never corpus-bounded."""
    from .webtext import _decode_entities

    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.coalesce(F.col(xml_col), F.lit("")), F.lit(_SITEMAP_URL_BLOCK_RE), 0)
        ).alias("block"),
    )
    return (
        blocks.select(
            "host",
            _decode_entities(
                F.regexp_extract("block", _SITEMAP_LOC_RE, 1)
            ).alias("url"),
            # try_to_timestamp, not to_timestamp: ANSI mode (Spark 4
            # default) makes the latter THROW on junk lastmod values, and
            # web sitemaps are full of junk — null-on-unparseable is the
            # contract (mirrored by TRY_CAST in the DuckDB twin)
            F.try_to_timestamp(
                F.regexp_extract("block", _SITEMAP_LASTMOD_RE, 1)
            ).alias("lastmod"),
        )
        .filter(F.col("url") != "")
    )


def robots_sitemap_urls(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt ``Sitemap:`` lines → (host, sitemap_url) — the FIRST link
    of the discovery chain (robots → :func:`parse_sitemap_index` children →
    :func:`parse_sitemaps` leaves).  Per RFC 9309 §2.3 / sitemaps.org the
    directive is GROUP-INDEPENDENT (valid anywhere in the file, applies
    regardless of user-agent), so no block windows — a pure per-line
    filter, zero shuffle beyond the explode."""
    return (
        robots.select(
            F.lower(F.col(host_col)).alias("host"),
            F.explode(F.split(F.col(body_col), "\n")).alias("raw"),
        )
        .withColumn("line", F.trim(F.regexp_replace("raw", "#.*$", "")))
        .withColumn(
            "sitemap_url",
            F.trim(F.regexp_extract("line", r"(?i)^sitemap\s*:(.*)$", 1)),
        )
        .filter(F.col("sitemap_url") != "")
        .select("host", "sitemap_url")
        .distinct()
    )


def robots_sitemap_urls_sql(
    robots_sql: str, host_col: str = "host", body_col: str = "robots_txt"
) -> str:
    """DuckDB twin of :func:`robots_sitemap_urls`."""
    return f"""
SELECT DISTINCT host,
       trim(regexp_extract(line, '(?i)^sitemap\\s*:(.*)$', 1)) AS sitemap_url
FROM (
  SELECT lower({host_col}) AS host,
         trim(regexp_replace(unnest(string_split({body_col}, chr(10))), '#.*$', '')) AS line
  FROM ({robots_sql})
)
WHERE trim(regexp_extract(line, '(?i)^sitemap\\s*:(.*)$', 1)) <> ''
"""


def parse_sitemap_index(
    sitemaps: DataFrame, host_col: str, xml_col: str
) -> DataFrame:
    """Sitemap INDEX files (`<sitemapindex>` — sitemaps.org nesting: a site
    over 50k urls must shard into child sitemaps and declare them in an
    index) → one row per child sitemap: (host, sitemap_url, lastmod).

    The recursion driver for sitemap discovery: fetch robots.txt's Sitemap
    line → if the body is an index, this yields the child sitemap urls to
    fetch → :func:`parse_sitemaps` parses the leaves.  A document can be
    both (malformed reality): ``<sitemap>`` blocks parse here, ``<url>``
    blocks parse there — run both and union.  Same per-block extraction
    and entity/lastmod semantics as :func:`parse_sitemaps`; hosts-bounded,
    pure codegen.
    """
    from .webtext import _decode_entities

    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.coalesce(F.col(xml_col), F.lit("")),
                F.lit(_SITEMAP_INDEX_BLOCK_RE),
                0,
            )
        ).alias("block"),
    )
    return (
        blocks.select(
            "host",
            _decode_entities(
                F.regexp_extract("block", _SITEMAP_LOC_RE, 1)
            ).alias("sitemap_url"),
            F.try_to_timestamp(
                F.regexp_extract("block", _SITEMAP_LASTMOD_RE, 1)
            ).alias("lastmod"),
        )
        .filter(F.col("sitemap_url") != "")
    )


def parse_sitemap_index_sql(sitemaps_sql: str, host_col: str, xml_col: str) -> str:
    """DuckDB twin of :func:`parse_sitemap_index`."""
    from .webtext import _decode_entities_sql

    loc = f"regexp_extract(block, '{_SITEMAP_LOC_RE}', 1)"
    return f"""
SELECT host,
       {_decode_entities_sql(loc)} AS sitemap_url,
       TRY_CAST(regexp_extract(block, '{_SITEMAP_LASTMOD_RE}', 1) AS TIMESTAMP) AS lastmod
FROM (
  SELECT {host_col} AS host,
         unnest(regexp_extract_all(COALESCE({xml_col}, ''), '{_SITEMAP_INDEX_BLOCK_RE}', 0)) AS block
  FROM ({sitemaps_sql})
)
WHERE {loc} <> ''
"""


def parse_sitemaps_sql(sitemaps_sql: str, host_col: str, xml_col: str) -> str:
    """DuckDB twin of :func:`parse_sitemaps` (TRY_CAST mirrors Spark's
    null-on-unparseable try_to_timestamp; compare offset-bearing lastmod
    under session timeZone=UTC — see the Spark docstring)."""
    from .webtext import _decode_entities_sql

    loc = f"regexp_extract(block, '{_SITEMAP_LOC_RE}', 1)"
    return f"""
SELECT host,
       {_decode_entities_sql(loc)} AS url,
       TRY_CAST(regexp_extract(block, '{_SITEMAP_LASTMOD_RE}', 1) AS TIMESTAMP) AS lastmod
FROM (
  SELECT {host_col} AS host,
         unnest(regexp_extract_all(COALESCE({xml_col}, ''), '{_SITEMAP_URL_BLOCK_RE}', 0)) AS block
  FROM ({sitemaps_sql})
)
WHERE {loc} <> ''
"""
