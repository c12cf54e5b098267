"""Decompose the warm point-query and federated serving latency (VERDICT r4
item 3): where does the ~0.15 s/query constant go?

Components measured per query (min over interleaved reps, the BASELINE.md
throttle protocol):

  tokenize     driver-side tokenization + matching expansion
  plan         DataFrame/Column construction (py4j round-trips, lazy)
  first_collect   analysis + codegen + schedule + execute (fresh Dataset)
  re_collect      schedule + execute only (SAME Dataset object — Spark
                  caches the QueryExecution, so the delta vs first_collect
                  is pure Catalyst analysis/codegen)
  resolve      pyarrow doc_stats point read for the k winners

Federated: per-branch plan construction, union+collect, and the Spark job
COUNT for one federated call (statusTracker job-group delta) — is the
constant per-job or per-branch?

Usage: python scripts/profile_serving.py [n_docs]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisearch_thai_spark.session import build_spark

QUERIES = [
    "ปัญญาประดิษฐ์",
    "สาหร่ายวากาเมะ",
    "อาหารริมทาง",
    "เทคโนโลยีการเงิน",
    "Startup ไทย",
    "การเดินทางเชียงใหม่",
    "ร้านกาแฟ",
    "ข่าวเศรษฐกิจวันนี้",
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = build_spark(app_name="profile-serving", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    sc = spark.sparkContext

    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.index.sharded import build_sharded_index, shard_dir
    from meilisearch_thai_spark.query.executor import SearchEngine
    from meilisearch_thai_spark.query.federation import federated_search
    from meilisearch_thai_spark.sources.pages import generate_pages
    from meilisearch_thai_spark.tokenizer import extract_index_terms, tokenize_for_index
    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="prof_idx_")
    pages_dir = os.path.join(root, "pages")
    generate_pages(spark, n_docs).write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    idx = os.path.join(root, "idx")
    build_index(spark, pages, idx)
    eng = SearchEngine(spark, idx)
    eng.postings.count()
    eng.doc_stats.count()
    eng.search_page(QUERIES[0], k=10)  # warm tier + codegen

    comp = {k: {q: float("inf") for q in QUERIES} for k in
            ("tokenize", "plan", "first_collect", "re_collect", "resolve", "end_to_end")}
    for _rep in range(4):
        for q in QUERIES:
            t0 = time.time()
            terms = extract_index_terms(tokenize_for_index(q))
            _uniq, prefixes, qterms, required = eng._expand_matching(terms, "best")
            t1 = time.time()
            scored = eng._warm_score_variants(qterms, required)
            if len(prefixes) > 1:
                scored = eng._dedup_best_per_doc(scored)
            else:
                scored = scored.drop("variant_id")
            plan = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
            t2 = time.time()
            rows = plan.collect()
            t3 = time.time()
            rows = plan.collect()  # same Dataset: QueryExecution reused
            t4 = time.time()
            eng._resolve_meta(rows, None)
            t5 = time.time()
            comp["tokenize"][q] = min(comp["tokenize"][q], t1 - t0)
            comp["plan"][q] = min(comp["plan"][q], t2 - t1)
            comp["first_collect"][q] = min(comp["first_collect"][q], t3 - t2)
            comp["re_collect"][q] = min(comp["re_collect"][q], t4 - t3)
            comp["resolve"][q] = min(comp["resolve"][q], t5 - t4)
            t0 = time.time()
            eng.search_page(q, k=10)
            comp["end_to_end"][q] = min(comp["end_to_end"][q], time.time() - t0)

    print(f"== warm point query, {n_docs} docs (per-query MIN of 4, median across {len(QUERIES)} queries) ==")
    for k, d in comp.items():
        vals = sorted(d.values())
        print(f"  {k:13s} p50={statistics.median(vals)*1000:7.1f} ms   min={vals[0]*1000:7.1f} ms   max={vals[-1]*1000:7.1f} ms")

    # ---------------------------------------------------------- federated
    shroot = os.path.join(root, "shards")
    build_sharded_index(spark, pages, shroot, 2)
    sheng = {f"s{s}": SearchEngine(spark, shard_dir(shroot, s)) for s in range(2)}
    for e in sheng.values():
        e.postings.count()
        e.doc_stats.count()
    term_sets = [extract_index_terms(tokenize_for_index(q)) for q in QUERIES]
    federated_search(sheng, term_sets[0], k=10, normalize=False).collect()  # warm

    fed = {k: [float("inf")] * len(term_sets) for k in ("plan", "collect", "mono")}
    jobs_per_call = None
    for _rep in range(4):
        for i, ts_ in enumerate(term_sets):
            t0 = time.time()
            df = federated_search(sheng, ts_, k=10, normalize=False)
            t1 = time.time()
            sc.setJobGroup(f"fed-{i}", "federated")
            df.collect()
            sc.setJobGroup(None, None)
            t2 = time.time()
            if jobs_per_call is None:
                jobs_per_call = len(sc.statusTracker().getJobIdsForGroup(f"fed-{i}"))
            fed["plan"][i] = min(fed["plan"][i], t1 - t0)
            fed["collect"][i] = min(fed["collect"][i], t2 - t1)
            t0 = time.time()
            eng.search_terms(ts_, k=10).collect()
            fed["mono"][i] = min(fed["mono"][i], time.time() - t0)

    print(f"== federated 2-shard (jobs per call: {jobs_per_call}) ==")
    for k, vals in fed.items():
        sv = sorted(vals)
        print(f"  {k:13s} p50={statistics.median(sv)*1000:7.1f} ms   min={sv[0]*1000:7.1f} ms   max={sv[-1]*1000:7.1f} ms")
    print(f"  federated_vs_mono (p50): {statistics.median(sorted(fed['plan'][i]+fed['collect'][i] for i in range(len(term_sets))))/statistics.median(sorted(fed['mono'])):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
