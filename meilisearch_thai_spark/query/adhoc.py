"""Ad-hoc (index-free) BM25 scoring as a single declarative Spark plan.

For corpora queried once (or for correctness oracles), building the
compressed posting index is wasted work — this module expresses the whole
BM25 computation as one Catalyst plan: tokenize → tf → df/avgdl aggregates →
score → top-k.  Catalyst handles partial aggregation and
TakeOrderedAndProject; the only Python is the tokenizer pandas UDF.

Scores are ranked on ROUND(score, 4): both our engine and external oracles
(DuckDB) compute the same float64 formula, and ranking on the rounded value
with a deterministic id tie-break removes last-ULP ordering sensitivity
between math libraries (SURVEY §7 risk 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 4


def tokenize_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) exploded pairs via the pinned tokenizer UDF.

    Deliberately NOT wrapped in ``pipeline.util.spread``: the Arrow-batched
    UDF amortizes best over large input batches, and an interleaved A/B at
    sf0.1 measured the pre-UDF repartition as a net LOSS (2.2 s vs 1.6 s
    warm) — the exchange costs more than the extra cores return here,
    unlike the pure-JVM shingle expressions in ``pipeline.dedup``."""
    from ..tokenizer.udfs import index_terms_udf

    return docs.select(
        F.col(id_col).alias("doc_key"), F.explode(index_terms_udf(text_col)).alias("term")
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    matching: str = "best",
    exclude_terms: list[str] | None = None,
) -> DataFrame:
    """Per-matching-doc BM25 scores WITHOUT the top-k order/cut —
    ``(doc_key, score, terms_matched)`` unordered.  The building block for
    consumers that re-rank or blend (hybrid search, federation pools): a
    huge-limit ``orderBy`` here would funnel the whole matching set through
    one global sort whose ordering the caller immediately discards."""
    terms = list(dict.fromkeys(query_terms))
    toks = tokenize_terms(docs, id_col, text_col)
    tf = toks.groupBy("doc_key", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_key").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtf = tf.filter(F.col("term").isin(terms))
    df_t = qtf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        qtf.join(df_t, "term")
        .join(dl, "doc_key")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * F.lit(K1 + 1.0))
            / (F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_key")
        .agg(
            F.round(F.sum("term_score"), SCORE_DECIMALS).alias("score"),
            F.countDistinct("term").alias("terms_matched"),
        )
    )
    if matching == "all":
        scored = scored.filter(F.col("terms_matched") == len(terms))
    if exclude_terms:
        # negative keywords: docs containing ANY excluded term leave the
        # result set; stats (df/avgdl/n_docs) stay corpus-wide
        neg = list(dict.fromkeys(exclude_terms))
        blocked = (
            tf.filter(F.col("term").isin(neg)).select("doc_key").distinct()
        )
        scored = scored.join(blocked, "doc_key", "left_anti")
    return scored


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    matching: str = "best",
    exclude_terms: list[str] | None = None,
) -> DataFrame:
    """BM25 top-k over an arbitrary (id, text) DataFrame, one lazy plan.

    Returns columns: ``doc_key, score, terms_matched`` with
    ``score = round(bm25, 4)`` and ordering (score desc, doc_key asc)."""
    return (
        bm25_scores(docs, id_col, text_col, query_terms, matching, exclude_terms)
        .orderBy(F.desc("score"), F.asc("doc_key"))
        .limit(k)
    )


def bm25f_topk_sql_oracle(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    title_tokens: int = 4,
    weights: tuple[float, float] = (2.0, 1.0),
    token_regex: str = "[a-z]+",
    search_fields: list[int] | None = None,
) -> str:
    """DuckDB SQL for FIELDED BM25 (BM25F) over a deterministic two-field
    split of ``{text_col}``: field 0 (title) = the first ``title_tokens``
    tokens, field 1 (content) = the rest — the same split the driver entry
    feeds ``build_index(fields=[title, content])``.

    Mirrors the engine's multi-attribute semantics exactly (builder.py
    field-prefixed term spaces): per-(field, term) document frequency,
    per-field doc length and ZERO-INCLUSIVE per-field avgdl
    (SUM(dl)/n_docs — docs with an empty field count as length 0), weighted
    per-field scores summed per doc, matched-word count DISTINCT over base
    terms (a word hitting both fields is one match).

    ``search_fields`` restricts MATCHING to the listed field ids
    (attributesToSearchOn): only tf rows of those fields score, while
    df/avgdl stay the per-field corpus statistics — exactly what the
    engine's restricted term lookup leaves in the candidate set.
    """
    terms = list(dict.fromkeys(query_terms))
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    w0, w1 = float(weights[0]), float(weights[1])
    field_where = (
        f"WHERE tf.fid IN ({', '.join(str(int(f)) for f in search_fields)})"
        if search_fields is not None
        else ""
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_key, regexp_extract_all({text_col}, '{token_regex}') AS ts
  FROM {table}
),
ft AS (
  SELECT doc_key, 0 AS fid, unnest(ts[1:{title_tokens}]) AS term FROM toks
  UNION ALL
  SELECT doc_key, 1 AS fid, unnest(ts[{title_tokens + 1}:]) AS term FROM toks
),
tf AS (
  SELECT doc_key, fid, term, COUNT(*)::DOUBLE AS tf FROM ft GROUP BY 1, 2, 3
),
dl AS (
  SELECT doc_key, fid, SUM(tf) AS dl FROM tf GROUP BY 1, 2
),
n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM toks),
avgdl AS (
  SELECT fid, SUM(dl) / (SELECT n_docs FROM n) AS avgdl FROM dl GROUP BY 1
),
df_t AS (
  SELECT fid, term, COUNT(*)::DOUBLE AS df FROM tf WHERE term IN ({terms_sql}) GROUP BY 1, 2
),
w(fid, wt) AS (VALUES (0, {w0}), (1, {w1}))
SELECT tf.doc_key AS doc_key,
       ROUND(SUM( w.wt * ln(1.0 + ((SELECT n_docs FROM n) - df_t.df + 0.5) / (df_t.df + 0.5))
                 * (tf.tf * {K1 + 1.0})
                 / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / avgdl.avgdl)) ), {SCORE_DECIMALS}) AS score,
       COUNT(DISTINCT tf.term) AS terms_matched
FROM tf
JOIN df_t ON tf.fid = df_t.fid AND tf.term = df_t.term
JOIN dl ON tf.doc_key = dl.doc_key AND tf.fid = dl.fid
JOIN avgdl ON tf.fid = avgdl.fid
JOIN w ON tf.fid = w.fid
{field_where}
GROUP BY tf.doc_key
ORDER BY score DESC, doc_key ASC
LIMIT {k}
"""


def bm25_topk_sql_oracle(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    matching: str = "best",
    token_regex: str = "[a-z]+",
    candidate_where: str | None = None,
    order_by: str | None = None,
    round_score: bool = True,
    exclude_terms: list[str] | None = None,
    terms_subquery: str | None = None,
) -> str:
    """DuckDB SQL computing the identical BM25 top-k (driver correctness gate).

    ``terms_subquery`` replaces the literal query-term list with a SQL
    subquery producing one ``term`` column (e.g. the typo-expansion set
    derived from the corpus vocabulary itself) — required when the term set
    is data-dependent, so the oracle stays self-contained.  ``matching`` must
    stay ``"best"`` in that case (the "all" HAVING count needs a literal
    arity).

    ``round_score=False`` emits the raw double instead of the
    ``SCORE_DECIMALS`` presentation rounding — required when the caller
    wraps this in a window/ordering of its own (e.g. distinctAttribute's
    best-per-value pick), which must rank by the FULL-precision score
    exactly like the engine does, not by the rounded display value.

    Valid when the pinned tokenizer's output on the corpus equals
    ``regexp_extract_all(text, token_regex)`` — true for plain lowercase Latin
    corpora like the testdata ``documents`` table (Thai corpora are verified
    in pytest against the in-process oracle instead).

    ``candidate_where`` restricts the FINAL candidate set by a metadata
    predicate on ``{table}`` (P4 filter semantics: corpus-wide BM25 stats are
    computed over ALL docs, the filter only prunes candidates — exactly what
    the engine's filtered search does).  ``order_by`` overrides the relevance
    ordering of the top-k cut (P6 sort semantics; ``dl.dl`` is the token-count
    doc length the engine exposes as ``doc_len``).
    """
    terms = list(dict.fromkeys(query_terms))
    if terms_subquery is not None:
        if matching == "all":
            raise ValueError("terms_subquery requires matching='best'")
        terms_sql = terms_subquery
    else:
        terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    having = f"HAVING COUNT(DISTINCT tf.term) = {len(terms)}" if matching == "all" else ""
    conds = []
    if candidate_where:
        conds.append(
            f"tf.doc_key IN (SELECT {id_col} FROM {table} WHERE {candidate_where})"
        )
    if exclude_terms:
        neg_sql = ", ".join(
            "'" + t.replace("'", "''") + "'" for t in dict.fromkeys(exclude_terms)
        )
        conds.append(
            f"tf.doc_key NOT IN (SELECT doc_key FROM tf WHERE term IN ({neg_sql}))"
        )
    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    order = order_by or "score DESC, doc_key ASC"
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_key, unnest(regexp_extract_all({text_col}, '{token_regex}')) AS term
  FROM {table}
),
tf AS (
  SELECT doc_key, term, COUNT(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
dl AS (
  SELECT doc_key, SUM(tf) AS dl FROM tf GROUP BY 1
),
stats AS (
  SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM dl
),
df_t AS (
  SELECT term, COUNT(*)::DOUBLE AS df FROM tf WHERE term IN ({terms_sql}) GROUP BY 1
)
SELECT tf.doc_key AS doc_key,
       {'ROUND(' if round_score else ''}SUM( ln(1.0 + (stats.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
                 * (tf.tf * {K1 + 1.0}) / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) ){f', {SCORE_DECIMALS})' if round_score else ''} AS score,
       COUNT(DISTINCT tf.term) AS terms_matched
FROM tf
JOIN df_t ON tf.term = df_t.term
JOIN dl ON tf.doc_key = dl.doc_key
CROSS JOIN stats
{where}
GROUP BY tf.doc_key
{having}
ORDER BY {order}
LIMIT {k}
"""


def bm25_prefix_topk_sql_oracle(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    max_expansions: int = 5,
    prefix_weight: float = 0.95,
    token_regex: str = "[a-z]+",
) -> str:
    """DuckDB twin of ``SearchEngine.search_prefix`` (search-as-you-type).

    Variant 0 = the literal ``query_terms``; variant i = the same terms with
    the LAST one replaced by the i-th index-vocabulary completion of it
    (terms the last word strictly prefixes, lexicographic order, capped at
    ``max_expansions`` — the same bounded head-vocab scan the engine runs).
    Every variant's BM25 sum is weighted (1.0 literal, ``prefix_weight``
    completions), each doc keeps its best variant (ties to the lowest
    variant id, i.e. the literal), and the top-k cut ranks by the
    FULL-precision weighted score — rounding is display-only, exactly like
    the engine.  Same Latin-tokenization validity caveat as
    :func:`bm25_topk_sql_oracle`.
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("prefix oracle needs at least one query term")
    last = terms[-1].replace("'", "''")
    base_vals = ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
    head = terms[:-1]
    head_union = (
        "UNION ALL SELECT v.vid, b.term FROM vcomp v CROSS JOIN (VALUES "
        + ", ".join("('" + t.replace("'", "''") + "')" for t in head)
        + ") b(term)"
        if head
        else ""
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_key, unnest(regexp_extract_all({text_col}, '{token_regex}')) AS term
  FROM {table}
),
tf AS (
  SELECT doc_key, term, COUNT(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2
),
dl AS (
  SELECT doc_key, SUM(tf) AS dl FROM tf GROUP BY 1
),
stats AS (
  SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM dl
),
comp AS (
  SELECT DISTINCT term FROM tf
  WHERE term LIKE '{last}%' AND term <> '{last}'
  ORDER BY term LIMIT {max_expansions}
),
vcomp AS (
  SELECT ROW_NUMBER() OVER (ORDER BY term) AS vid, term FROM comp
),
vterms AS (
  SELECT DISTINCT vid, term FROM (
    SELECT 0 AS vid, b.term FROM (VALUES {base_vals}) b(term)
    UNION ALL SELECT vid, term FROM vcomp
    {head_union}
  )
),
df_t AS (
  SELECT term, COUNT(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT DISTINCT term FROM vterms) GROUP BY 1
),
scored AS (
  SELECT v.vid, tf.doc_key,
         SUM( ln(1.0 + (stats.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
              * (tf.tf * {K1 + 1.0}) / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) )
         * CASE WHEN v.vid = 0 THEN 1.0 ELSE {prefix_weight} END AS score,
         COUNT(DISTINCT tf.term) AS terms_matched
  FROM vterms v
  JOIN tf ON tf.term = v.term
  JOIN df_t ON tf.term = df_t.term
  JOIN dl ON tf.doc_key = dl.doc_key
  CROSS JOIN stats
  GROUP BY v.vid, tf.doc_key
),
best AS (
  SELECT doc_key, score, terms_matched FROM (
    SELECT scored.*, ROW_NUMBER() OVER (
      PARTITION BY doc_key ORDER BY score DESC, vid ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT doc_key, ROUND(score, {SCORE_DECIMALS}) AS score, terms_matched
FROM best
ORDER BY score DESC, doc_key ASC
LIMIT {k}
"""
