"""BM25 top-k execution over the block-compressed posting index.

The reference fans out per-variant HTTP searches to MeiliSearch under an
asyncio semaphore (src/search_proxy/services/search_executor.py:55-176); here
ALL variants score in ONE Spark job:

    postings  ⋈ broadcast(query terms)     [term filter pushed to parquet scan]
      → mapInPandas block decode + BM25    [numpy, Arrow-batched]
      → groupBy(variant_id, doc_id) sum    [JVM hash agg]
      → matching-strategy filter, boosts, dedup, top-k

Term lookup is the broadcast hash join the reference outsources to
MeiliSearch's internal index (SURVEY X1/X2/R11).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..index.builder import IndexMeta, load_meta
from ..index.codec import varbyte_decode

_SCORED_SCHEMA = T.StructType(
    [
        T.StructField("variant_id", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


@dataclass
class QueryTerm:
    """One (variant, term) scoring row; weight applied at variant merge."""

    variant_id: int
    term: str


def _make_decoder(k1: float, b: float, avgdl: float, n_docs: int):
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_vid, out_doc, out_term, out_score = [], [], [], []
            for row in pdf.itertuples(index=False):
                deltas = varbyte_decode(row.doc_bytes)
                ids = np.cumsum(deltas, dtype=np.uint64).astype(np.int64)
                tfs = varbyte_decode(row.tf_bytes).astype(np.float64)
                dls = varbyte_decode(row.dl_bytes).astype(np.float64)
                term_idf = np.log(1.0 + (n_docs - row.df + 0.5) / (row.df + 0.5))
                scores = term_idf * (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
                n = len(ids)
                out_vid.append(np.full(n, row.variant_id, dtype=np.int32))
                out_doc.append(ids)
                out_term.append(np.full(n, row.term, dtype=object))
                out_score.append(scores)
            if not out_doc:
                continue
            yield pd.DataFrame(
                {
                    "variant_id": np.concatenate(out_vid),
                    "doc_id": np.concatenate(out_doc),
                    "term": np.concatenate(out_term),
                    "score": np.concatenate(out_score),
                }
            )

    return decode


class SearchEngine:
    """Query-side handle on a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str, cache_postings: bool = True):
        self.spark = spark
        self.index_dir = index_dir
        self.meta: IndexMeta = load_meta(index_dir)
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.doc_stats = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
        if cache_postings:
            self.postings = self.postings.persist()
            self.doc_stats = self.doc_stats.persist()

    # ------------------------------------------------------------------
    def candidate_blocks(self, qterms: list[QueryTerm]) -> DataFrame:
        """postings ⋈ broadcast(query terms): the term-lookup join (X2)."""
        qdf = self.spark.createDataFrame(
            [(q.variant_id, q.term) for q in qterms],
            T.StructType(
                [
                    T.StructField("variant_id", T.IntegerType(), False),
                    T.StructField("term", T.StringType(), False),
                ]
            ),
        )
        # isin-style pushdown: also pre-filter the scan so parquet row-group
        # min/max stats on the term-sorted files prune untouched groups.
        terms = sorted({q.term for q in qterms})
        scan = self.postings.filter(F.col("term").isin(terms))
        return scan.join(F.broadcast(qdf), "term")

    def score_variants(self, qterms: list[QueryTerm], prune_threshold: float | None = None) -> DataFrame:
        """Per-(variant, doc) BM25 sums + matched-term counts."""
        blocks = self.candidate_blocks(qterms)
        if prune_threshold is not None:
            blocks = blocks.filter(F.col("block_max_score") >= F.lit(prune_threshold))
        decode = _make_decoder(self.meta.k1, self.meta.b, self.meta.avgdl, self.meta.n_docs)
        scored = blocks.select(
            "variant_id", "term", "df", "doc_bytes", "tf_bytes", "dl_bytes"
        ).mapInPandas(decode, _SCORED_SCHEMA)
        return scored.groupBy("variant_id", "doc_id").agg(
            F.sum("score").alias("score"),
            F.countDistinct("term").alias("terms_matched"),
        )

    def search_terms(
        self,
        terms: list[str],
        k: int = 10,
        matching: str = "best",
    ) -> DataFrame:
        """Single-variant BM25 top-k (the walking-skeleton API).

        ``matching='all'`` requires every query term present (reference
        matching strategy 'all'; search_executor.py:845-910), 'best' is
        disjunctive.
        """
        qterms = [QueryTerm(0, t) for t in dict.fromkeys(terms)]
        scored = self.score_variants(qterms)
        if matching == "all":
            scored = scored.filter(F.col("terms_matched") == len(qterms))
        topk = (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score", "terms_matched")
        )
        return (
            self.doc_stats.join(F.broadcast(topk), "doc_id")
            .select("url", "doc_id", "score", "terms_matched")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def search(self, query: str, k: int = 10, matching: str = "best") -> DataFrame:
        """Tokenize ``query`` with the SAME pinned tokenizer and score."""
        from ..tokenizer import extract_index_terms, tokenize_for_index

        terms = extract_index_terms(tokenize_for_index(query))
        return self.search_terms(terms, k=k, matching=matching)

    def multi_variant_search(
        self,
        query: str,
        k: int = 10,
        min_score_threshold: float = 0.0,
        normalize: bool = False,
    ) -> DataFrame:
        """Full search-proxy semantics in ONE Spark job (SURVEY §3.3 / X1).

        Driver side: Q1-Q8 variant pipeline.  Cluster side: all variants
        score together (variant_id column replaces the reference's per-variant
        asyncio fan-out, search_executor.py:55-176), then R1/R2 weight+boost,
        X4 per-doc dedup keeping the best variant hit, optional R6
        normalization, P7 threshold, R10 top-k.

        Returns (url, doc_id, score, variant_type, terms_matched).
        """
        from .pipeline import process_query
        from .ranker import MIN_SCORE_THRESHOLD, variant_boost_expr  # noqa: F401

        pq = process_query(query)
        if not pq.variants:
            empty = T.StructType(
                [
                    T.StructField("url", T.StringType()),
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("score", T.DoubleType()),
                    T.StructField("variant_type", T.StringType()),
                    T.StructField("terms_matched", T.LongType()),
                ]
            )
            return self.spark.createDataFrame([], empty)

        qterms = []
        vmeta_rows = []
        for vid, v in enumerate(pq.variants):
            uniq = list(dict.fromkeys(v.terms))
            for t in uniq:
                qterms.append(QueryTerm(vid, t))
            vmeta_rows.append((vid, v.variant_type, float(v.weight), len(uniq), v.matching))
        vmeta = self.spark.createDataFrame(
            vmeta_rows, "variant_id int, variant_type string, weight double, n_terms int, matching string"
        )

        scored = self.score_variants(qterms)
        hit = (
            scored.join(F.broadcast(vmeta), "variant_id")
            # Q7 matching strategy: conjunctive variants require every term
            .filter((F.col("matching") != "all") | (F.col("terms_matched") == F.col("n_terms")))
            # R1/R2: final = bm25 * variant_weight * variant_boost
            .withColumn("score", F.col("score") * F.col("weight") * variant_boost_expr("variant_type"))
        )
        # X4: per-doc best variant hit; tie-break weight desc then variant_id
        best = F.max_by(
            F.struct("score", "variant_type", "terms_matched"),
            F.struct(F.col("score"), F.col("weight"), -F.col("variant_id")),
        ).alias("best")
        dedup = hit.groupBy("doc_id").agg(best).select(
            "doc_id",
            F.col("best.score").alias("score"),
            F.col("best.variant_type").alias("variant_type"),
            F.col("best.terms_matched").alias("terms_matched"),
        )
        if normalize:
            from .ranker import normalize_scores

            dedup = normalize_scores(dedup, "score")
        if min_score_threshold > 0:
            dedup = dedup.filter(F.col("score") >= F.lit(min_score_threshold))
        topk = dedup.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return (
            self.doc_stats.join(F.broadcast(topk), "doc_id")
            .select("url", "doc_id", "score", "variant_type", "terms_matched")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
