"""Text analysis operators for training-data pipelines.

Language-ID heuristic, quality scoring, token counting, and document
fingerprinting — the doc-level ProcessingMetadata analogues of the reference
(src/meilisearch_integration/document_processor.py:34-58: language,
token_count, thai_content_detected, mixed_content), generalized to
corpus-scale ops.  All built-in Column expressions (JVM, codegen)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Small pinned English stopword list for quality scoring (deterministic).
EN_STOPWORDS = ["a", "the", "and", "of", "to", "in", "is", "on", "for", "with"]


def ws_tokens(col):
    """Split-on-space, drop-empty token array — THE repo-wide token
    convention (SQL twins use ``list_filter(string_split(x, ' '), ...)``).
    Every operator that counts or slices "tokens" must call this so the
    definition can only change in one place."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def token_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token counting + lexical-diversity stats (round 4)."""
    toks = ws_tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_key"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 4).alias("unique_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


def token_stats_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_key,
         list_filter(string_split({text_col}, ' '), x -> x <> '') AS toks
  FROM {table}
)
SELECT doc_key,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique,
       ROUND(len(list_distinct(toks)) / len(toks), 4) AS unique_ratio,
       ROUND(list_sum(list_transform(toks, x -> length(x)::DOUBLE)) / len(toks), 4) AS avg_token_len
FROM t
"""


def quality_score(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic doc-quality score in [0,1]: length band + stopword presence
    + lexical diversity (rounded; identical formula in the SQL oracle)."""
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop_cnt = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast("long")
    uniq = F.size(F.array_distinct(toks)).cast("long")
    m = F.least(n, F.lit(50).cast("long"))
    s3 = F.least(stop_cnt, F.lit(3).cast("long"))
    # q = 0.4*m/50 + 0.3*s3/3 + 0.3*uniq/n == (2*n*m + 25*n*s3 + 75*uniq)/(250*n)
    # emitted as integer basis points floor(10000*q) — pure integer arithmetic,
    # so the value is bit-identical in any engine (no float-summation or
    # ROUND-at-half divergence; seen flipping at sf0.1 with the float form)
    bp = F.expr(
        "( (2*_n*_m + 25*_n*_s + 75*_u) * 40 ) div _n"
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_key"),
            n.alias("_n"), m.alias("_m"), s3.alias("_s"), uniq.alias("_u"),
        )
        .select(
            "doc_key",
            F.when(F.col("_n") > 0, bp).otherwise(F.lit(0)).cast("long").alias("quality_bp"),
        )
    )


def quality_score_sql(table: str, id_col: str, text_col: str) -> str:
    stop_sql = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_key,
         list_filter(string_split({text_col}, ' '), x -> x <> '') AS toks
  FROM {table}
),
c AS (
  SELECT doc_key,
         len(toks)::BIGINT AS n,
         least(len(toks), 50)::BIGINT AS m,
         least(len(list_intersect(list_distinct(toks), [{stop_sql}])), 3)::BIGINT AS s,
         len(list_distinct(toks))::BIGINT AS u
  FROM t
)
SELECT doc_key,
       CASE WHEN n > 0 THEN ((2*n*m + 25*n*s + 75*u) * 40) // n ELSE 0 END AS quality_bp
FROM c
"""


def language_id(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Char-class language heuristic: thai / latin / digit ratios → label.

    The Thai branch mirrors the reference's detector thresholds
    (document_processor.py:72-112: Thai if ratio > 0.5 of alpha chars;
    mixed if both scripts present)."""
    total = F.greatest(F.length(text_col), F.lit(1))
    thai = total - F.length(F.regexp_replace(F.col(text_col), "[฀-๿]", ""))
    latin = total - F.length(F.regexp_replace(F.col(text_col), "[A-Za-z]", ""))
    thai_r = thai / total
    latin_r = latin / total
    label = (
        F.when((thai_r > 0.5), F.lit("th"))
        .when((thai_r > 0.1) & (latin_r > 0.1), F.lit("th-en"))
        .when(latin_r > 0.5, F.lit("latin"))
        .otherwise(F.lit("other"))
    )
    return docs.select(
        F.col(id_col).alias("doc_key"),
        F.round(thai_r, 4).alias("thai_ratio"),
        F.round(latin_r, 4).alias("latin_ratio"),
        label.alias("lang_guess"),
    )


def language_id_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_key,
         greatest(length({text_col}), 1)::DOUBLE AS total,
         (greatest(length({text_col}), 1) - length(regexp_replace({text_col}, '[฀-๿]', '', 'g')))::DOUBLE AS thai,
         (greatest(length({text_col}), 1) - length(regexp_replace({text_col}, '[A-Za-z]', '', 'g')))::DOUBLE AS latin
  FROM {table}
)
SELECT doc_key,
       ROUND(thai / total, 4) AS thai_ratio,
       ROUND(latin / total, 4) AS latin_ratio,
       CASE WHEN thai / total > 0.5 THEN 'th'
            WHEN thai / total > 0.1 AND latin / total > 0.1 THEN 'th-en'
            WHEN latin / total > 0.5 THEN 'latin'
            ELSE 'other' END AS lang_guess
FROM t
"""


def doc_fingerprint(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — detects bag-of-words-identical documents."""
    toks = F.array_sort(F.array_distinct(ws_tokens(F.col(text_col))))
    return docs.select(
        F.col(id_col).alias("doc_key"),
        F.md5(F.concat_ws(chr(1), toks)).alias("fingerprint"),
    )


def doc_fingerprint_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT {id_col} AS doc_key,
       md5(array_to_string(list_sort(list_distinct(list_filter(string_split({text_col}, ' '), x -> x <> ''))), chr(1))) AS fingerprint
FROM {table}
"""


# Winnowing index-encoding width: positions are packed as zero-padded
# (9999999 - pos) so a plain string MIN implements "smallest hash, rightmost
# tie" — documents are capped at 10^7 normalized chars (far past any sane
# web-page size; chunk longer inputs upstream).
_WINNOW_POS_SENTINEL = 9999999


def winnow_fingerprints(
    docs: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003 — the MOSS algorithm): hash every ``k``-char gram of
    the normalized text, slide a ``w``-hash window, and keep the minimum hash
    of each window (rightmost occurrence on ties — the classic tie-break that
    makes selections position-stable).  Guarantee: any substring match of at
    least ``w + k - 1`` characters between two documents yields at least one
    SHARED fingerprint, so the selected set is a provably sufficient sketch
    for substring-overlap detection at ~``2/(w+1)`` the k-gram density.

    Normalization: lowercase + collapse ``[ \\t\\n\\r]+`` runs to one space +
    trim (explicit class, not ``\\s`` — Java and RE2 disagree on ``\\s``).
    Documents shorter than ``k`` normalized chars emit no fingerprints.

    Engine shape: pure Column codegen over per-row arrays — sequence →
    k-gram md5 → windowed ``array_min`` — ZERO shuffle, scan-speed at
    100 TB.  The winnowing selection rides ONE string ``array_min`` by
    encoding each candidate as ``hash8 || lpad(9999999 - pos, 7)``:
    lexicographic min picks the smallest hash and, among equal hashes, the
    rightmost position.  The DuckDB twin is the same expression tree over
    list comprehensions, so parity is bit-exact.

    Returns (doc_key, pos, fp): 0-based k-gram start offset in the
    normalized text and the 32-bit (8 hex chars of md5) fingerprint.

    Cost note: winnowing hashes EVERY k-gram — one md5 per corpus
    character.  md5 is chosen because Spark and DuckDB compute it
    identically (bit-exact oracle parity); a deployment that does not need
    the cross-engine oracle can swap ``F.md5`` for ``F.xxhash64``
    (~10x cheaper JVM-side) without touching the selection logic.
    """
    if k < 2 or w < 1:
        raise ValueError("winnow_fingerprints requires k >= 2 and w >= 1")
    t = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[ \\t\\n\\r]+", " "))
    sent = F.lit(_WINNOW_POS_SENTINEL)
    hs = F.transform(
        F.sequence(F.lit(0), F.length(t) - k),
        lambda i: F.concat(
            F.substring(F.md5(F.substring(t, i + 1, F.lit(k))), 1, 8),
            F.lpad((sent - i).cast("string"), 7, "0"),
        ),
    )
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(F.col("h")) - w, F.lit(0))),
        lambda j: F.array_min(F.slice(F.col("h"), j + 1, w)),
    )
    return (
        docs.where(F.length(t) >= k)
        .select(F.col(id_col).alias("doc_key"), hs.alias("h"))
        .select("doc_key", F.explode(F.array_distinct(wins)).alias("u"))
        .select(
            "doc_key",
            (F.lit(_WINNOW_POS_SENTINEL) - F.substring("u", 9, 7).cast("int")).alias("pos"),
            F.substring("u", 1, 8).alias("fp"),
        )
        .orderBy("doc_key", "pos")
    )


def winnow_fingerprints_sql(
    table: str, id_col: str, text_col: str, k: int = 8, w: int = 4
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (same encoded-min trick)."""
    s = _WINNOW_POS_SENTINEL
    return f"""
WITH norm AS (
  SELECT {id_col} AS doc_key,
         trim(regexp_replace(lower({text_col}), '[ \\t\\n\\r]+', ' ', 'g')) AS t
  FROM {table}
), hs AS (
  SELECT doc_key,
         [substr(md5(substr(t, i+1, {k})), 1, 8) || lpad(CAST({s} - i AS VARCHAR), 7, '0')
          for i in range(0, length(t)-{k}+1)] AS h
  FROM norm WHERE length(t) >= {k}
), sel AS (
  SELECT doc_key,
         list_distinct([list_min(h[j+1: j+{w}]) for j in range(0, greatest(len(h)-{w}+1, 1))]) AS s
  FROM hs
)
SELECT doc_key,
       {s} - CAST(substr(u, 9, 7) AS INTEGER) AS pos,
       substr(u, 1, 8) AS fp
FROM sel, unnest(s) AS t(u)
ORDER BY doc_key, pos
"""


def source_mixture(
    docs: DataFrame, group_cols: list[str], text_col: str
) -> DataFrame:
    """Training-mixture accounting: per group (e.g. [source, lang]) —
    document count, token count, byte count, and each group's share of the
    corpus token budget in integer basis points (Chinchilla-style data
    budgeting: the table a mixture designer reweights against, and the
    denominator for stratified-sampling fractions in
    ``pipeline.sampling``).

    One map-side-combined groupBy plus a tiny broadcast of the scalar
    totals — the grouped rollup is bounded by (source × lang) cardinality,
    never corpus size.  Token = whitespace token (the ``token_stats``
    convention); swap in a BPE-ish regex upstream for model-specific
    budgets."""
    toks = ws_tokens(F.col(text_col))
    per = docs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
        F.sum(F.octet_length(text_col)).cast("long").alias("n_bytes"),
    )
    total = per.agg(F.sum("n_tokens").alias("_t")).select(
        F.col("_t").cast("double").alias("_t")
    )
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            *group_cols,
            "n_docs",
            "n_tokens",
            "n_bytes",
            F.floor(F.col("n_tokens") * 10000 / F.col("_t"))
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy(*group_cols)
    )


def source_mixture_sql(table: str, group_cols: list[str], text_col: str) -> str:
    """DuckDB twin of :func:`source_mixture`."""
    gc = ", ".join(group_cols)
    return f"""
WITH per AS (
  SELECT {gc},
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split({text_col}, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens,
         CAST(SUM(strlen({text_col})) AS BIGINT) AS n_bytes
  FROM {table} GROUP BY {gc}
),
tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM per)
SELECT {gc}, n_docs, n_tokens, n_bytes,
       CAST(FLOOR(n_tokens * 10000 / tot.t) AS BIGINT) AS share_bp
FROM per, tot
ORDER BY {gc}
"""


def keywords_tfidf(
    docs: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Per-document top-``k`` keywords by smoothed TF-IDF:
    (doc_key, term, rank, tfidf).

    tf = in-doc term count over lowercased split-on-space tokens; idf =
    round(ln((N+1)/(df+1)), 9) + 1 with N = #docs having >=1 token.  The
    idf ln() is rounded to 9 decimals BEFORE the tf multiply so ranking is
    bit-identical across engines (libm vs JVM log differ at ulp scale);
    ranking and the k-cut then use the full product, ties broken by term.
    One explode pass feeds the (doc,term) tf agg; df and N are derived from
    the ALREADY-DEDUPED tf relation (df = tf's per-term row count, N = tf's
    distinct doc count) instead of re-scanning raw tokens.  The tf↔df join
    strategy is left to Catalyst/AQE — a 100 TB web vocabulary (hashes,
    urls, junk tokens) is far past broadcast size, so no broadcast hint.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_key"),
        F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_key", "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    ndocs = tf.select(F.countDistinct("doc_key").cast("long").alias("n_docs"))
    from pyspark.sql.window import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "idf",
            F.round(F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 9) + F.lit(1.0),
        )
        .withColumn("score", F.col("tf") * F.col("idf"))
    )
    w = Window.partitionBy("doc_key").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_key",
            "term",
            F.col("rank").cast("long").alias("rank"),
            F.round("score", 4).alias("tfidf"),
        )
    )


def keywords_tfidf_sql(table: str, id_col: str, text_col: str, k: int = 5) -> str:
    """DuckDB twin of :func:`keywords_tfidf` (same pre-multiply idf
    rounding, same tie-break)."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_key,
         unnest(list_filter(string_split(lower({text_col}), ' '), x -> x <> '')) AS term
  FROM {table}
),
tf AS (SELECT doc_key, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(DISTINCT doc_key)::BIGINT AS n_docs FROM tf),
scored AS (
  SELECT tf.doc_key, tf.term, tf.tf,
         tf.tf * (ROUND(LN((nd.n_docs + 1) / (dfreq.df + 1)), 9) + 1.0) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
),
ranked AS (
  SELECT doc_key, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_key ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_key, term, rank::BIGINT AS rank, ROUND(score, 4) AS tfidf
FROM ranked WHERE rank <= {k}
"""


def length_quantiles(
    docs: DataFrame, group_col: str, len_col: str, qs: tuple = (0.1, 0.5, 0.9)
) -> DataFrame:
    """Per-group EXACT length quantiles + count — the corpus diagnostic
    behind truncation budgets and length-based mixture cuts.

    Uses ``F.percentile`` (exact, linear interpolation — bit-identical to
    DuckDB's ``quantile_cont``), not ``percentile_approx``: a diagnostic
    whose numbers feed data decisions should not drift run-to-run.  Exact
    percentile sorts within groups; at 100 TB run it per partition-pruned
    slice or switch to approx_percentile CONSCIOUSLY (and the oracle gate
    is then off).  One hash agg, map-side combined.
    """
    aggs = [F.count("*").cast("long").alias("n_docs")] + [
        F.round(F.percentile(F.col(len_col), q), 4).alias(f"p{int(round(q * 100))}")
        for q in qs
    ]
    return docs.groupBy(F.col(group_col).alias("grp")).agg(*aggs).orderBy("grp")


def length_quantiles_sql(
    table: str, group_col: str, len_col: str, qs: tuple = (0.1, 0.5, 0.9)
) -> str:
    """DuckDB twin of :func:`length_quantiles`."""
    cols = ", ".join(
        f"ROUND(quantile_cont({len_col}, {q}), 4) AS p{int(round(q * 100))}"
        for q in qs
    )
    return f"""
SELECT {group_col} AS grp, COUNT(*)::BIGINT AS n_docs, {cols}
FROM {table} GROUP BY 1 ORDER BY 1
"""


def top_ngrams(
    docs: DataFrame, text_col: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-level top-``k`` word n-grams by count — the vocabulary /
    boilerplate-discovery diagnostic (the same statistic C4 used to find
    "lorem ipsum" and policy-text contamination, and Gopher's
    top-ngram-fraction rule applies per-doc).

    Two-level aggregation, the canonical 100 TB shape: n-grams are built
    document-locally with array Columns (sequence → slice → concat_ws; no
    Python), the explode is narrow, and the groupBy count partial-aggregates
    map-side — the exchange carries one row per DISTINCT gram per
    partition, never the corpus.  The final top-k is ``orderBy(...).
    limit(k)`` which Spark executes as TakeOrderedAndProject: each
    partition keeps k candidates and the driver merges P·k rows — the full
    vocabulary is never globally sorted.  Ties break on the gram string so
    the cut is deterministic.  Tokens are lowercased whitespace tokens (the
    ``keywords_tfidf`` convention).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = ws_tokens(F.lower(F.col(text_col)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("ngram"))
        .limit(k)
    )


def top_ngrams_sql(table: str, text_col: str, n: int = 2, k: int = 20) -> str:
    """DuckDB twin of :func:`top_ngrams` (generate_series is empty when the
    doc is shorter than ``n``, matching the Spark guard)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return f"""
WITH toks AS (
  SELECT list_filter(string_split(lower({text_col}), ' '), x -> x <> '') AS t
  FROM {table}
),
pos AS (
  SELECT t, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS i
  FROM toks
),
grams AS (
  SELECT array_to_string(list_slice(t, i, i + {n - 1}), ' ') AS ngram FROM pos
)
SELECT ngram, COUNT(*)::BIGINT AS n
FROM grams GROUP BY 1
ORDER BY n DESC, ngram ASC
LIMIT {k}
"""


def bpe_pair_counts(docs: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Tokenizer-training primitive: corpus counts of adjacent CHARACTER
    pairs inside words — the statistic a BPE trainer's merge step maximizes
    (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
    Subword Units"; the top pair here IS the first merge).

    Computed the way BPE trainers actually do it: over the frequency-
    weighted VOCABULARY (distinct words × their corpus counts), never the
    raw token stream — so the pair explode runs on vocab-scale input
    (log-scale smaller than the corpus) and the whole op is two hash
    aggregations with map-side combine: word→count, then pair→Σcount.
    The final cut is TakeOrderedAndProject (per-partition k + driver merge,
    no global sort), ties broken on the pair string.  Single-char words
    contribute nothing (the guard also keeps Spark's ``sequence`` from
    generating a DESCENDING range when length-1 < 1).
    """
    words = (
        docs.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wc"))
    )
    pair_arr = F.when(
        F.length("word") >= 2,
        F.expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pair_arr).alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def bpe_pair_counts_sql(table: str, text_col: str, k: int = 20) -> str:
    """DuckDB twin of :func:`bpe_pair_counts` (generate_series is empty for
    single-char words, matching the Spark guard)."""
    return f"""
WITH words AS (
  SELECT word, COUNT(*)::BIGINT AS wc FROM (
    SELECT unnest(list_filter(string_split(lower({text_col}), ' '), x -> x <> '')) AS word
    FROM {table}
  ) GROUP BY 1
),
pos AS (
  SELECT word, wc, unnest(generate_series(1, len(word) - 1)) AS i
  FROM words WHERE len(word) >= 2
)
SELECT substr(word, i, 2) AS pair, CAST(SUM(wc) AS BIGINT) AS n
FROM pos GROUP BY 1
ORDER BY n DESC, pair ASC
LIMIT {k}
"""


def train_bpe(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Corpus-scale BPE training (Sennrich et al. 2016): learn ``n_merges``
    merge rules by repeatedly merging the most frequent adjacent symbol
    pair — the iterative extension of :func:`bpe_pair_counts` (whose top
    pair IS merge #1).

    Like real trainers, everything runs over the frequency-weighted
    VOCABULARY, never the token stream: one corpus-scale groupBy builds
    (word → count) once, then each merge round touches only vocab-scale
    data — one pair-explode + hash agg for the argmax (count DESC, pair
    ASC total order; TakeOrderedAndProject, one row to the driver) and one
    pure-codegen ``aggregate()`` fold that rewrites each word's symbol
    array left-to-right non-overlapping (after a merge the new symbol
    ``l||r`` can never equal ``l`` again, so the fold needs no lookahead).
    The vocab frame ``localCheckpoint``s every round — same constant-plan
    lesson as connected_components/pagerank; at 100 TB vocab is ~1e8 rows
    (log-scale smaller than the corpus), so rounds are small jobs.

    Stops early when the best remaining pair's count drops below
    ``min_count``.  Returns (merges in order, final vocab DataFrame of
    (word, symbols, wc))."""
    if n_merges < 1:
        raise ValueError("train_bpe needs at least one merge")
    vocab = (
        docs.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wc"))
        .withColumn("symbols", F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_idx = F.expr("sequence(1, size(symbols) - 1)")
        pairs = (
            vocab.filter(F.size("symbols") >= 2)
            .select(
                F.explode(pair_idx).alias("i"),
                F.col("symbols"),
                F.col("wc"),
            )
            .select(
                F.element_at("symbols", F.col("i")).alias("l"),
                F.element_at("symbols", F.col("i") + 1).alias("r"),
                "wc",
            )
            .groupBy("l", "r")
            .agg(F.sum("wc").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top or top[0]["n"] < min_count:
            break
        l, r = top[0]["l"], top[0]["r"]
        merges.append((l, r))
        lc, rc, mc = F.lit(l), F.lit(r), F.lit(l + r)
        folded = F.aggregate(
            "symbols",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == lc)
                & (x == rc),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(mc)),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        new = vocab.select("word", "wc", folded.alias("symbols")).localCheckpoint()
        vocab.unpersist()
        vocab = new
    return merges, vocab.select("word", "symbols", "wc")
