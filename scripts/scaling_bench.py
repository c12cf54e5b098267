"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's two-cluster-size criterion (N vs 4N executors, efficiency >= 0.8)
cannot use a real cluster in this sandbox; per the driver instructions we
evidence it by running the SAME index-build job on the SAME input at two
local parallelism levels and reporting throughput at both plus
scaling efficiency = throughput(4N) / (4 * throughput(N)).

Methodology (each point matters for a fair measurement):

- The corpus is generated ONCE and written to parquet before any timing; both
  levels read the identical files — identical input bytes, and generation cost
  (synthetic-data, not engine work) stays out of the measurement, matching the
  reference metric "indexing docs/sec" over existing documents.
- Each level runs in a fresh subprocess (own JVM, no shared JIT/caches) and is
  PINNED to exactly N cores with ``taskset``.  Without pinning, a local[N]
  JVM borrows idle cores for GC/shuffle/Python workers and the low level is
  overstated — a real N-core cluster has no such spare capacity.
- A small warm-up build runs inside each child before the timed build so
  one-time JVM/Arrow/Python-worker startup (identical at both levels,
  irrelevant at 10^12 scale) does not pollute the ratio.
- Default levels are N=4 → 4N=16.  This host advertises 32 CPUs but per-core
  throughput collapses beyond ~16-20 simultaneously busy cores (hypervisor
  overcommit; measured with plain CPU burners, no JVM: 0.42 s/task at 4 procs
  → 0.50 s at 16 → 0.86 s at 32), so 8→32 measures host saturation, not job
  scalability.  4→16 is the largest 4x span the host can serve linearly.
- Output equality across levels is asserted with an order-insensitive content
  digest over postings and doc_stats (doc ids are global url ranks, so the
  index is bit-deterministic at any parallelism).

Usage:

    python scripts/scaling_bench.py [n_docs] [low_cores] [high_cores]

Prints one JSON line and rewrites BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from meilisearch_thai_spark.session import build_spark
from meilisearch_thai_spark.sources.pages import generate_pages

n_docs, out = int(sys.argv[1]), sys.argv[2]
spark = build_spark(cores=32)
# 64 files => ~64 read splits at every level: full utilization at 4 cores
# (16 waves) and at 16 cores (4 waves), same splits both times.
generate_pages(spark, n_docs, partitions=64).write.mode("overwrite").parquet(out)
"""

_CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from meilisearch_thai_spark.session import build_spark
from meilisearch_thai_spark.sources.pages import generate_pages
from meilisearch_thai_spark.index.builder import build_index

cores, n_docs, corpus = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

# Size file splits for the miniature corpus: at 100 TB the default 128 MB
# split yields ~800k tasks, but a few-hundred-MB test corpus would collapse
# to a handful of read partitions (openCost packing) and starve the high
# level.  Target >= 4 tasks per core at BOTH levels (identical split size at
# both levels so per-task work is the same).
import os as _os
corpus_bytes = sum(
    _os.path.getsize(_os.path.join(corpus, f))
    for f in _os.listdir(corpus) if f.endswith(".parquet")
)
split = max(1 << 20, corpus_bytes // 128)
spark = build_spark(
    cores=cores,
    shuffle_partitions=max(cores * 2, 8),
    extra_conf={{
        "spark.sql.files.maxPartitionBytes": str(split),
        "spark.sql.files.openCostInBytes": str(256 * 1024),
    }},
)
# warm JVM + python workers so fixed startup cost (identical at both levels,
# irrelevant at 10^12 scale) doesn't pollute the ratio
build_index(spark, generate_pages(spark, 500, seed=7), tempfile.mkdtemp() + "_warm")

pages = spark.read.parquet(corpus)
out = tempfile.mkdtemp(prefix=f"scale_idx_{{cores}}_")
t0 = time.time()
meta = build_index(spark, pages, out)
dt = time.time() - t0

# order-insensitive content digest: proves both levels built the same index
pst = spark.read.parquet(out + "/postings")
dig_p = pst.select(
    F.bit_xor(F.xxhash64("term", "bucket", "block_id", "first_doc", "n_docs",
                         "doc_bytes", "tf_bytes", "df")).alias("h")
).collect()[0]["h"]
ds = spark.read.parquet(out + "/doc_stats")
dig_d = ds.select(F.bit_xor(F.xxhash64("doc_id", "url", "doc_len", "norm_hash")).alias("h")).collect()[0]["h"]

print(json.dumps({{"cores": cores, "sec": dt, "docs_per_sec": n_docs / dt,
                   "n_postings": meta.n_postings, "n_terms": meta.n_terms,
                   "digest": f"{{dig_p}}:{{dig_d}}"}}))
"""


def _run_checked(cmd: list[str]) -> subprocess.CompletedProcess:
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-4000:])
        raise SystemExit(f"child failed (exit {res.returncode})")
    return res


def run_level(cores: int, n_docs: int, corpus: str) -> dict:
    code = _CHILD.format(repo=REPO)
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code,
           str(cores), str(n_docs), corpus]
    return json.loads(_run_checked(cmd).stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    reps = int(os.environ.get("SCALE_REPS", "2"))
    corpus = tempfile.mkdtemp(prefix="scale_corpus_")
    try:
        _run_checked([sys.executable, "-c", _GEN.format(repo=REPO), str(n_docs), corpus])
        # interleave level reps in fresh children (L,H,L,H): the host throttles
        # CPU in multi-minute windows, so back-to-back reps of ONE level share
        # a window; alternating spreads both levels across windows and the
        # per-level min reads through the throttled ones
        lo_runs, hi_runs = [], []
        for _ in range(reps):
            lo_runs.append(run_level(low, n_docs, corpus))
            hi_runs.append(run_level(high, n_docs, corpus))
    finally:
        shutil.rmtree(corpus, ignore_errors=True)

    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    eff = hi["docs_per_sec"] / ((high / low) * lo["docs_per_sec"])
    out = {
        "n_docs": n_docs,
        "method": "same parquet input, fresh pinned JVM per level (taskset), "
                  "warmed workers, generation untimed, interleaved reps, "
                  "per-level best-of-%d" % reps,
        "low": lo,
        "high": hi,
        "low_all_sec": [round(r["sec"], 1) for r in lo_runs],
        "high_all_sec": [round(r["sec"], 1) for r in hi_runs],
        "scaling_efficiency": round(eff, 3),
        "identical_output": len({r["digest"] for r in lo_runs + hi_runs}) == 1
        and lo["n_postings"] == hi["n_postings"]
        and lo["n_terms"] == hi["n_terms"],
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
