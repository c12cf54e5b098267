"""Stage-attributed timing of build_index at bench shape (100k docs, local[32]).

Splits the build into its constituent actions so the bench headline's
`thai_index_build` seconds can be attributed: tokenize+persist, doc_stats
write, postings encode+write, meta readback.  Scratch tool — numbers land in
BASELINE.md, not in any artifact contract.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("BENCH_DOCS", "100000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-build")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from meilisearch_thai_spark.index import builder as B
    from meilisearch_thai_spark.sources.pages import generate_pages

    corpus_dir = tempfile.mkdtemp(prefix="prof_corpus_")
    generate_pages(spark, N_DOCS).write.mode("overwrite").parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)

    for rep in range(2):
        out_dir = tempfile.mkdtemp(prefix=f"prof_idx_{rep}_")
        from meilisearch_thai_spark.index.sinks import ParquetSink

        sink = ParquetSink(out_dir)
        marks: list[tuple[str, float]] = []
        t_all = time.time()

        t0 = time.time()
        caches: list = []
        docs = B.tokenized_docs(pages, _caches=caches).persist()
        docs.count()  # materialize the tokenize pass explicitly
        marks.append(("tokenize+persist", time.time() - t0))

        t0 = time.time()
        from pyspark.sql import Observation

        obs = Observation("corpus_stats")
        sink.write(
            docs.select("doc_id", "url", "lang", "doc_len", "norm_hash").observe(
                obs, F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
            ),
            "doc_stats",
        )
        for c in caches:
            c.unpersist()
        n_docs, avgdl = int(obs.get["n"]), float(obs.get["avgdl"] or 1.0)
        marks.append(("doc_stats write", time.time() - t0))

        t0 = time.time()
        tf = docs.select(
            "doc_id", "doc_len", F.explode("tcounts").alias("term", "tf")
        )
        df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
        posting_rows = tf.join(df_tbl, "term").withColumn(
            "bucket", (F.col("doc_id") / F.lit(B.DEFAULT_BUCKET_SPAN)).cast("long")
        )
        postings = B.encode_postings(
            posting_rows, n_docs, avgdl, B.BM25Params(), B.DEFAULT_BLOCK_SIZE, CPUS, None
        )
        sink.write(
            postings.repartition(CPUS, "term").sortWithinPartitions(
                "term", "bucket", "block_id"
            ),
            "postings",
        )
        marks.append(("postings encode+write", time.time() - t0))

        t0 = time.time()
        pst = sink.read(spark, "postings")
        agg = pst.agg(
            F.countDistinct("term").alias("nt"), F.sum("n_docs").alias("np")
        ).collect()[0]
        marks.append(("meta readback agg", time.time() - t0))
        docs.unpersist()

        total = time.time() - t_all
        print(f"--- rep {rep}: total {total:.2f}s  (n_docs={n_docs} postings={int(agg['np'])})")
        for name, dt in marks:
            print(f"    {name:24s} {dt:6.2f}s  {100 * dt / total:5.1f}%")


if __name__ == "__main__":
    main()
