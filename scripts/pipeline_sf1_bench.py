"""10× pipeline-scale evidence run (VERDICT r4 item 6): the five heaviest
LLM-pipeline operators once at sf1.0 (50k docs — 10× the per-round bench's
sf0.1), recording wall time AND the empirical shuffle bounds the docstrings
claim:

  dedup_lines_global    exchange ~ |distinct lines|, NOT |lines|
  minhash_lsh           band keys (16-byte hashes) ride the shuffle, not text
  pagerank              iteration works on the HOST graph (hosts-bounded),
                        not the page corpus
  repetition_signals    ZERO shuffle (pure per-row folds)
  token_budget_sample   256-way decomposition table rows = ranges, not docs

Input: a deterministic sf1.0-equivalent documents table synthesized with
the SAME generator family as the testdata (seeded md5 arithmetic — no
external data), written under /tmp and reused across runs.

Usage: python scripts/pipeline_sf1_bench.py  → one JSON line, recorded in
BASELINE.md §"Pipeline at sf1.0".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisearch_thai_spark.session import build_spark

N_DOCS = 50_000
N_GROUPS = 5_000  # multi-line docs for the dedup grain
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window order data column join small big customer query "
    "stream group vector filter index the a"
).split()


def synth_documents(spark):
    """sf1.0-shape documents: same column family as the testdata table,
    deterministic from doc_id arithmetic only."""
    from pyspark.sql import functions as F

    n_vocab = len(VOCAB)
    varr = F.array(*[F.lit(w) for w in VOCAB])
    df = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    # ~40 words per doc, word choice = md5-derived index (engine-stable)
    words = F.transform(
        F.sequence(F.lit(0), (F.xxhash64("doc_id") % 21 + F.lit(30)).cast("int")),
        lambda i: F.element_at(
            varr,
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), i)), 1, 8),
                    16, 10,
                ).cast("long")
                % n_vocab
            ).cast("int")
            + 1,
        ),
    )
    return df.select(
        "doc_id",
        F.concat_ws(" ", words).alias("text"),
        F.element_at(
            F.array(F.lit("th"), F.lit("en"), F.lit("zh"), F.lit("ja")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 97).cast("string")).alias("source"),
    )


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(app_name="pipeline-sf1", cores=cores, shuffle_partitions=cores)
    from pyspark.sql import functions as F

    from meilisearch_thai_spark.pipeline import dedup as dd
    from meilisearch_thai_spark.pipeline import sampling as smp
    from meilisearch_thai_spark.pipeline import webgraph as wg
    from meilisearch_thai_spark.pipeline import webtext as wtx

    out_dir = "/tmp/pipeline_sf1"
    docs_path = os.path.join(out_dir, "documents")
    if not os.path.isdir(docs_path):
        synth_documents(spark).repartition(cores).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    docs.count()

    res: dict = {"n_docs": N_DOCS, "cores": cores, "ops": {}, "bounds": {}}

    def force(df):
        """Full evaluation incl. every computed column — a bare count()
        would let Catalyst PRUNE the expensive exprs (observed: repetition
        'ran' in 0.08 s because count needed none of its signal columns)."""
        return df.select(
            (F.xxhash64(F.struct(*df.columns)) % F.lit(1_000_000_007)).alias("h")
        ).agg(F.sum("h")).collect()  # mod keeps the ANSI-mode sum in range

    def timed(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        res["ops"][name] = round(best, 2)

    # ---- 1. corpus-wide line dedup: multi-line docs (10 lines each) with a
    # shared header per parity class — heavy cross-doc duplication
    ml = (
        docs.withColumn("gid", (F.col("doc_id") % N_GROUPS).cast("long"))
        .groupBy("gid")
        .agg(
            F.concat_ws(
                "\n",
                F.lit("accept cookies to continue"),
                F.concat_ws("\n", F.sort_array(F.collect_list(F.struct("doc_id", "text")))
                            .getField("text")),
            ).alias("text")
        )
    ).localCheckpoint()
    n_lines = ml.select(F.explode(F.split("text", "\n"))).count()
    n_distinct = ml.select(F.explode(F.split("text", "\n")).alias("l")).select(
        F.md5("l")
    ).distinct().count()
    res["bounds"]["line_dedup"] = {
        "lines": n_lines,
        "distinct_lines_on_exchange": n_distinct,
        "ratio": round(n_distinct / n_lines, 4),
    }
    timed("dedup_lines_global", lambda: force(wtx.dedup_lines_global(ml, "gid", "text")))

    # ---- 2. MinHash+LSH near-dup over the full 50k docs
    def run_minhash():
        return force(dd.minhash_lsh_candidates(docs, "doc_id", "text"))

    # bound: the banded bucket table carries (band, hash, id) — never text
    bands = dd._banded_buckets(docs, "doc_id", "text", dd.N_MINHASH, dd.LSH_BANDS)
    res["bounds"]["minhash_lsh"] = {
        "band_rows_on_exchange": bands.count(),
        "band_row_cols": bands.columns,
        "corpus_text_bytes": int(
            docs.agg(F.sum(F.length("text"))).collect()[0][0]
        ),
    }
    timed("minhash_lsh_pairs", run_minhash)

    # ---- 3. PageRank over a synthesized link graph: 2k hosts, pages link
    # by doc_id arithmetic (hosts-bounded iteration is the claim)
    links = docs.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 2000).cast("string"),
                 F.lit(".example.com/p/"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("https://h"), ((F.col("doc_id") * 7 + 1) % 2000).cast("string"),
                 F.lit(".example.com/x")).alias("link"),
    )
    edges = wg.host_edges(links, "url", "link").localCheckpoint()
    res["bounds"]["pagerank"] = {
        "pages": N_DOCS,
        "host_edges_iterated": edges.count(),
    }
    timed("pagerank_10it", lambda: force(wg.pagerank(edges, iterations=10)))

    # ---- 4. Gopher repetition signals: zero-shuffle claim checked from the
    # physical plan string
    rep_df = wtx.repetition_signals(ml, "gid", "text")
    plan = rep_df._jdf.queryExecution().executedPlan().toString()
    res["bounds"]["repetition"] = {"exchanges_in_plan": plan.count("Exchange")}
    timed("repetition_signals", lambda: force(rep_df))

    # ---- 5. token-budget mixture over (source, tokens)
    budgets = {f"src{i}": 3_000 for i in range(97)}
    res["bounds"]["token_budget"] = {"sources": 97, "decomposition_ranges": 256}
    timed(
        "token_budget_sample",
        lambda: force(smp.token_budget_sample(docs, "doc_id", "text", "source", budgets)),
    )

    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
