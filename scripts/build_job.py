"""spark-submit entry point for the index build (north-rule submission mode).

Cluster usage (the package ships as a zip via --py-files; no install step on
executors):

    python -m zipfile -c /tmp/mst.zip meilisearch_thai_spark
    spark-submit --master <cluster> --py-files /tmp/mst.zip \
        scripts/build_job.py --input /data/pages_parquet --output /data/idx

Local smoke (what the sandbox runs):

    spark-submit --master 'local[8]' --py-files /tmp/mst.zip \
        scripts/build_job.py --generate 5000 --output /tmp/idx

The script creates its SparkSession WITHOUT a master so spark-submit's
--master/--deploy-mode decide placement; all engine configs that matter at
scale (AQE, Arrow, shuffle partitions) are applied as session conf here.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Build the Thai full-text index")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet pages table (url, warc_ts, html, text, lang)")
    src.add_argument("--generate", type=int, help="generate N synthetic pages instead")
    p.add_argument("--output", required=True, help="index output directory")
    p.add_argument("--resumable", action="store_true", help="sharded resumable build (lineage)")
    p.add_argument("--n-shards", type=int, default=8)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--bucket-span", type=int, default=8192)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName("mst-index-build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    )
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.index.lineage import build_index_resumable

    if args.generate:
        from meilisearch_thai_spark.sources.pages import generate_pages

        pages = generate_pages(spark, args.generate)
    else:
        pages = spark.read.parquet(args.input)

    if args.resumable:
        meta = build_index_resumable(
            spark, pages, args.output, n_shards=args.n_shards,
            block_size=args.block_size, bucket_span=args.bucket_span,
        )
    else:
        meta = build_index(
            spark, pages, args.output, block_size=args.block_size, bucket_span=args.bucket_span
        )
    print(json.dumps(asdict(meta)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
