"""Web link-graph operators: link extraction, host graph, PageRank, anchors.

The reference indexes crawled Thai web pages keyed by url
(src/meilisearch_integration/document_processor.py); a crawl-scale corpus
carries the web's LINK STRUCTURE in the raw html, and every production web
pipeline mines it for (a) crawl prioritization / quality priors (PageRank —
Page et al. 1999, the public algorithm), and (b) anchor-text ranking signals
(anchor terms describe the TARGET page better than its own body — classic
IR result, used by every web engine).  None of this exists in the reference
(it outsources ranking to MeiliSearch, which has no link signals); it is
first-class here because a 100 TB webtext corpus without link analysis
cannot prioritize what to keep.

Engine-parity rules (same contract as weburl/webtext):

- **Extraction** stays in the Java-regex / RE2 common subset: pull whole
  ``<a ...>...</a>`` tags with ``regexp_extract_all(..., 0)``, then take
  href / anchor text from each tag with plain ``regexp_extract`` — no
  array-zip, whose null/length semantics differ across engines.
- **PageRank is integer fixed-point**: ranks live in BIGINT units of
  1/scale (default 1e-9), every step uses integer multiply + integer
  division (Spark ``div`` == DuckDB ``//`` on non-negatives), and BIGINT
  sums are exact and ORDER-INDEPENDENT — so Spark and the unrolled-CTE
  DuckDB oracle agree bit-for-bit, which float power iteration never would
  (float sum order varies with partitioning).

Scale shape: extraction is pure per-row Column codegen (zero shuffle).
PageRank is one groupBy(src) for out-weights, then per iteration one
shuffle-hash join ranks⋈edges on ``src`` plus one groupBy(``dst``) — the
textbook MapReduce PageRank step.  The rank frame is one row per host
(~1e8 rows at 100 TB — modest), edges dominate; pre-partitioning edges by
``src`` once (and letting AQE pick the join) amortizes across iterations.
Dangling-host mass (hosts with inlinks but no outlinks) is dropped, not
redistributed — documented standard simplification; ranks then sum to
< 1.0 by exactly the dangling mass.  Every iteration ``localCheckpoint``s
the rank frame so the plan stays constant-size (same lesson as
dedup.connected_components: unbounded iterative lineage OOMs the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# whole <a ...>...</a> tags; no backreferences / lookaround (RE2-safe)
ANCHOR_TAG_RE = '<a [^>]*href="[^"]*"[^>]*>[^<]*</a>'
HREF_RE = 'href="([^"]*)"'
ANCHOR_TEXT_RE = ">([^<]*)</a>"
# authority up to the first :/?#  — ports are irrelevant at host-graph grain
HOST_RE = "^[A-Za-z]+://([^/?#:]+)"


def extract_links(docs: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Per-page outlinks → (doc_key, link, anchor), one row per ``<a>`` tag.

    ``link`` is the raw href (absolute http(s) urls only — crawl frontiers
    resolve relative hrefs against the base url upstream, out of scope
    here), ``anchor`` the tag's visible text.  Pure codegen: extract_all of
    whole tags, explode, two per-tag regexp_extracts.
    """
    tags = docs.select(
        F.col(id_col).alias("doc_key"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_TAG_RE), 0)
        ).alias("tag"),
    )
    return (
        tags.select(
            "doc_key",
            F.regexp_extract("tag", HREF_RE, 1).alias("link"),
            F.regexp_extract("tag", ANCHOR_TEXT_RE, 1).alias("anchor"),
        )
        .filter(F.col("link").rlike("^[Hh][Tt][Tt][Pp][Ss]?://"))
    )


def extract_links_sql(table: str, id_col: str, html_col: str) -> str:
    """DuckDB twin of :func:`extract_links` (unnest of whole-tag matches)."""
    return f"""
        SELECT doc_key,
               regexp_extract(tag, '{HREF_RE}', 1) AS link,
               regexp_extract(tag, '{ANCHOR_TEXT_RE}', 1) AS anchor
        FROM (
            SELECT {id_col} AS doc_key,
                   unnest(regexp_extract_all({html_col}, '{ANCHOR_TAG_RE}', 0)) AS tag
            FROM {table}
        )
        WHERE regexp_matches(regexp_extract(tag, '{HREF_RE}', 1),
                             '^[Hh][Tt][Tt][Pp][Ss]?://')
    """


def host_edges(
    links: DataFrame, src_url_col: str = "url", dst_url_col: str = "link"
) -> DataFrame:
    """Collapse page-level links to the host graph:
    (src_host, dst_host, n_links), self-loops and unparseable hosts dropped.

    One groupBy with map-side combine; the host graph is orders of
    magnitude smaller than the page-level edge list, so this is THE
    aggregation to run before any iterative link analysis at 100 TB.
    """
    e = links.select(
        F.lower(F.regexp_extract(F.col(src_url_col), HOST_RE, 1)).alias("src_host"),
        F.lower(F.regexp_extract(F.col(dst_url_col), HOST_RE, 1)).alias("dst_host"),
    )
    return (
        e.filter(
            (F.col("src_host") != "")
            & (F.col("dst_host") != "")
            & (F.col("src_host") != F.col("dst_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def host_edges_sql(
    links_sql: str, src_url_col: str = "url", dst_url_col: str = "link"
) -> str:
    """DuckDB twin of :func:`host_edges`."""
    return f"""
        SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
        FROM (
            SELECT lower(regexp_extract({src_url_col}, '{HOST_RE}', 1)) AS src_host,
                   lower(regexp_extract({dst_url_col}, '{HOST_RE}', 1)) AS dst_host
            FROM ({links_sql})
        )
        WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
        GROUP BY src_host, dst_host
    """


def pagerank(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "n_links",
    iterations: int = 5,
    damping_bp: int = 8500,
    scale: int = 10**9,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Weighted PageRank over the host graph, integer fixed-point.

    ``rank_units`` is the rank in units of 1/``scale``; with r = rank of
    the source and W = its total outgoing weight, each edge contributes
    ``r * w div W`` units, and the update is

        new = base + damping_bp * inflow div 10000
        base = (10000 - damping_bp) * (scale div N) div 10000

    — all BIGINT, so the result is independent of partitioning, join order,
    and engine (the DuckDB twin in :func:`pagerank_sql` matches exactly).
    Fixed ``iterations`` (power method; 5 rounds separate hubs from leaves,
    production crawls run ~20).  Dangling mass is dropped by default (see
    module doc); ``redistribute_dangling=True`` adds the classic uniform
    redistribution — the dangling nodes' total rank is ONE BIGINT scalar
    per iteration (a 1-row aggregate, broadcast back as a literal), so the
    integer fixed-point bit-parity contract is preserved:

        share = sum(dangling rank_units) div N
        new   = base + damping_bp * (inflow + share) div 10000

    With the flag on, ranks sum to ``scale`` minus only the integer-division
    losses (bounded by n_edges + 2*n_nodes units — each edge contribution
    and each div-10000 loses < 1 unit), instead of leaking the whole
    dangling outflow each round.

    Returns (host, rank_units); ``rank_units / scale`` is the float rank.
    """
    if iterations < 1:
        raise ValueError("pagerank needs at least one iteration")
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = e.join(out_w, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank_units", F.lit(0).cast("long"))
    init = scale // n_nodes
    base = (10000 - damping_bp) * init // 10000
    dangling = None
    if redistribute_dangling:
        dangling = nodes.join(
            out_w.withColumnRenamed("src", "host"), "host", "left_anti"
        ).localCheckpoint()
    ranks = nodes.withColumn("rank_units", F.lit(init).cast("long")).localCheckpoint()
    for _ in range(iterations):
        share = 0
        if redistribute_dangling:
            # one scalar crosses to the driver per iteration (bounded, like
            # the BPE argmax): the dangling nodes' total rank — then rides
            # back into the plan as a literal, keeping the arithmetic
            # partition- and engine-independent
            d_row = dangling.join(ranks, "host").agg(
                F.sum("rank_units").alias("d")
            ).collect()[0]
            share = int(d_row["d"] or 0) // n_nodes
        inflow = (
            ew.join(ranks.withColumnRenamed("host", "src"), "src")
            .select(
                F.col("dst").alias("host"),
                F.expr("rank_units * w div out_w").alias("c"),
            )
            .groupBy("host")
            .agg(F.sum("c").alias("in_units"))
        )
        new = nodes.join(inflow, "host", "left").select(
            "host",
            (
                F.lit(base)
                + F.expr(
                    f"{damping_bp} * (coalesce(in_units, 0L) + {share}L) div 10000"
                )
            ).alias("rank_units"),
        ).localCheckpoint()
        ranks.unpersist()
        ranks = new
    ew.unpersist()
    nodes.unpersist()
    if dangling is not None:
        dangling.unpersist()
    return ranks


def pagerank_sql(
    edges_sql: str,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "n_links",
    iterations: int = 5,
    damping_bp: int = 8500,
    scale: int = 10**9,
    redistribute_dangling: bool = False,
) -> str:
    """DuckDB twin of :func:`pagerank`: the fixed iteration count unrolls to
    chained CTEs r1..rK (aggregation in a recursive CTE term is not portable
    SQL; unrolling is, and the iteration count is a compile-time constant).
    All arithmetic BIGINT (DuckDB overflows INT32 multiplies otherwise and
    SUM returns HUGEINT — cast back)."""
    if iterations < 1:
        raise ValueError("pagerank needs at least one iteration")
    head = f"""
        WITH e AS (
            SELECT {src} AS src, {dst} AS dst, CAST({weight} AS BIGINT) AS w
            FROM ({edges_sql})
        ),
        ew AS (
            SELECT e.src, e.dst, e.w, o.out_w
            FROM e JOIN (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w
                         FROM e GROUP BY src) o USING (src)
        ),
        nodes AS (
            SELECT DISTINCT host
            FROM (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)
        ),
        consts AS (
            SELECT CAST({scale} AS BIGINT) // COUNT(*) AS init FROM nodes
        ),
        r0 AS (
            SELECT host, (SELECT init FROM consts) AS rank_units FROM nodes
        )"""
    if redistribute_dangling:
        head += """,
        dang AS (
            SELECT host FROM nodes
            WHERE host NOT IN (SELECT src FROM e)
        )"""
    steps = []
    for i in range(1, iterations + 1):
        if redistribute_dangling:
            # same scalar as the Spark side's per-iteration collect: the
            # previous round's dangling mass div N, added INSIDE the
            # damping multiply so the integer arithmetic matches bit-for-bit
            steps.append(f"""
        d{i} AS (
            SELECT COALESCE(CAST(SUM(r.rank_units) AS BIGINT), 0)
                   // (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS share
            FROM r{i - 1} r JOIN dang USING (host)
        ),
        r{i} AS (
            SELECT nodes.host,
                   CAST((10000 - {damping_bp}) * (SELECT init FROM consts) // 10000
                        + CAST({damping_bp} AS BIGINT)
                          * (COALESCE(s.in_units, 0) + (SELECT share FROM d{i}))
                          // 10000
                        AS BIGINT) AS rank_units
            FROM nodes LEFT JOIN (
                SELECT ew.dst AS host,
                       CAST(SUM(r.rank_units * ew.w // ew.out_w) AS BIGINT) AS in_units
                FROM ew JOIN r{i - 1} r ON ew.src = r.host
                GROUP BY ew.dst
            ) s USING (host)
        )""")
        else:
            steps.append(f"""
        r{i} AS (
            SELECT nodes.host,
                   CAST((10000 - {damping_bp}) * (SELECT init FROM consts) // 10000
                        + CAST({damping_bp} AS BIGINT) * COALESCE(s.in_units, 0) // 10000
                        AS BIGINT) AS rank_units
            FROM nodes LEFT JOIN (
                SELECT ew.dst AS host,
                       CAST(SUM(r.rank_units * ew.w // ew.out_w) AS BIGINT) AS in_units
                FROM ew JOIN r{i - 1} r ON ew.src = r.host
                GROUP BY ew.dst
            ) s USING (host)
        )""")
    return (
        head
        + ","
        + ",".join(steps)
        + f"\n        SELECT host, rank_units FROM r{iterations}"
    )


def anchor_terms(
    links: DataFrame, dst_url_col: str = "link", anchor_col: str = "anchor", k: int = 3
) -> DataFrame:
    """Top-k anchor terms per TARGET host — the classic anchor-text ranking
    signal (terms other pages use to describe a host).

    Terms = lowercase runs split on non-alphanumerics, length >= 2.  One
    groupBy + one per-host window on the aggregated (host, term) counts
    (already tiny after the count agg).  Deterministic total order:
    (n desc, term asc).  Returns (dst_host, term, n, pos).
    """
    terms = (
        links.select(
            F.lower(F.regexp_extract(F.col(dst_url_col), HOST_RE, 1)).alias("dst_host"),
            F.explode(F.split(F.lower(F.col(anchor_col)), "[^a-z0-9]+")).alias("term"),
        )
        .filter((F.col("dst_host") != "") & (F.length("term") >= 2))
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("dst_host").orderBy(F.desc("n"), F.asc("term"))
    return (
        terms.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
    )


def anchor_terms_sql(
    links_sql: str, dst_url_col: str = "link", anchor_col: str = "anchor", k: int = 3
) -> str:
    """DuckDB twin of :func:`anchor_terms`."""
    return f"""
        SELECT dst_host, term, n, pos FROM (
            SELECT dst_host, term, n,
                   ROW_NUMBER() OVER (PARTITION BY dst_host
                                      ORDER BY n DESC, term ASC) AS pos
            FROM (
                SELECT dst_host, term, CAST(COUNT(*) AS BIGINT) AS n
                FROM (
                    SELECT lower(regexp_extract({dst_url_col}, '{HOST_RE}', 1)) AS dst_host,
                           unnest(regexp_split_to_array(lower({anchor_col}), '[^a-z0-9]+')) AS term
                    FROM ({links_sql})
                )
                WHERE dst_host <> '' AND length(term) >= 2
                GROUP BY dst_host, term
            )
        ) WHERE pos <= {k}
    """


def frontier(
    crawled: DataFrame,
    links: DataFrame,
    ranks: DataFrame,
    per_host_cap: int = 3,
    url_col: str = "url",
    crawl_delays: DataFrame | None = None,
    cycle_sec: float = 60.0,
) -> DataFrame:
    """Crawl-frontier generation: which discovered-but-unfetched urls to
    crawl next, honoring per-host politeness.

    The production shape behind every crawler's scheduler (Common Crawl,
    Heritrix): candidate = a link target not yet in the corpus; priority =
    link evidence (``n_refs`` = distinct referring pages) within a host,
    host authority (:func:`pagerank` units) across hosts; at most
    ``per_host_cap`` urls per host per cycle (politeness — a host's fetch
    budget is bounded no matter how many inlinks it attracts).

    Shape: one groupBy(link) collapses the page-level edge list to
    candidates (map-side combine — the edge list never rides further), a
    LEFT ANTI join against the crawled url set (16-byte-key shuffle; at
    100 TB bucket both sides by url or Bloom-prefilter, exactly the
    ``against_snapshot`` playbook), a broadcast-sized join to the host-rank
    table, and one per-host window capped at ``per_host_cap`` (the cap
    bounds output to hosts × cap rows; per-host candidate skew stays inside
    the window's single partition-local sort — pre-truncating per partition
    with a bucket-local top-k is the documented upgrade if one host's
    candidate set alone overflows a partition).

    Returns (host, url, rank_units, n_refs, slot), slot = 1..cap in
    (n_refs DESC, url ASC) order within the host.

    ``crawl_delays`` (optional, from
    :func:`~.weburl.parse_crawl_delay`: (host, crawl_delay_sec)) refines
    the politeness cap per host: a host declaring Crawl-delay gets at most
    ``floor(cycle_sec / delay)`` slots this cycle (0 is legitimate — a
    delay longer than the cycle skips the host), still bounded above by
    ``per_host_cap``.  The delay table is hosts-bounded and joins
    broadcast-style; hosts without a declared delay keep the flat cap, so
    the default plan (``crawl_delays=None``) is byte-identical to before.
    """
    cand = links.groupBy(F.col("link").alias("url")).agg(
        F.countDistinct("doc_key").alias("n_refs")
    )
    fresh = cand.join(crawled.select(F.col(url_col).alias("url")), "url", "left_anti")
    scored = (
        fresh.withColumn("host", F.lower(F.regexp_extract("url", HOST_RE, 1)))
        .filter(F.col("host") != "")
        .join(ranks, "host", "left")
        .select(
            "host",
            "url",
            F.coalesce(F.col("rank_units"), F.lit(0)).cast("long").alias("rank_units"),
            "n_refs",
        )
    )
    w = Window.partitionBy("host").orderBy(F.desc("n_refs"), F.asc("url"))
    slotted = scored.withColumn("slot", F.row_number().over(w))
    if crawl_delays is None:
        return slotted.filter(F.col("slot") <= per_host_cap)
    cap = F.least(
        F.lit(per_host_cap),
        F.coalesce(
            F.floor(F.lit(float(cycle_sec)) / F.col("crawl_delay_sec")).cast("int"),
            F.lit(per_host_cap),
        ),
    )
    return (
        slotted.join(
            F.broadcast(crawl_delays.select("host", "crawl_delay_sec")),
            "host",
            "left",
        )
        .filter(F.col("slot") <= cap)
        .drop("crawl_delay_sec")
    )


def frontier_sql(
    crawled_sql: str,
    links_sql: str,
    ranks_sql: str,
    per_host_cap: int = 3,
    url_col: str = "url",
    crawl_delays_sql: str | None = None,
    cycle_sec: float = 60.0,
) -> str:
    """DuckDB twin of :func:`frontier` (same candidate collapse, anti-join,
    rank join, and per-host window)."""
    return f"""
SELECT host, url, rank_units, n_refs, slot FROM (
  SELECT host, url, rank_units, n_refs,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY n_refs DESC, url ASC) AS slot
  FROM (
    SELECT lower(regexp_extract(c.url, '{HOST_RE}', 1)) AS host,
           c.url,
           CAST(COALESCE(r.rank_units, 0) AS BIGINT) AS rank_units,
           c.n_refs
    FROM (
      SELECT link AS url, CAST(COUNT(DISTINCT doc_key) AS BIGINT) AS n_refs
      FROM ({links_sql}) GROUP BY link
    ) c
    LEFT JOIN ({ranks_sql}) r
      ON lower(regexp_extract(c.url, '{HOST_RE}', 1)) = r.host
    WHERE NOT EXISTS (
      SELECT 1 FROM ({crawled_sql}) w WHERE w.{url_col} = c.url
    )
  ) WHERE host <> ''
) f
{f'''LEFT JOIN ({crawl_delays_sql}) cd USING (host)
WHERE slot <= LEAST({per_host_cap},
                    COALESCE(CAST(FLOOR({cycle_sec!r} / cd.crawl_delay_sec) AS INT),
                             {per_host_cap}))''' if crawl_delays_sql else f'WHERE slot <= {per_host_cap}'}
"""
