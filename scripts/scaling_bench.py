"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's two-cluster-size criterion (N vs 4N executors, efficiency >= 0.8)
cannot use a real cluster in this sandbox; per the driver instructions we
evidence it by running the SAME index-build job on the SAME deterministic
input at two local parallelism levels and reporting throughput at both plus
scaling efficiency = throughput(4N) / (4 * throughput(N)).

Each level runs in a fresh subprocess (own JVM) so level runs don't share
JIT/caches.  Usage:

    python scripts/scaling_bench.py [n_docs] [low_cores] [high_cores]

Prints one JSON line and (with --update-baseline) rewrites the scaling
section of BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from meilisearch_thai_spark.session import build_spark
from meilisearch_thai_spark.sources.pages import generate_pages
from meilisearch_thai_spark.index.builder import build_index

cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
spark = build_spark(cores=cores, shuffle_partitions=max(cores * 2, 8))
out = tempfile.mkdtemp(prefix=f"scale_idx_{{cores}}_")
# warm JVM + python workers on a tiny run so fixed startup cost (identical at
# both levels, irrelevant at 10^12 scale) doesn't pollute the ratio
build_index(spark, generate_pages(spark, 500, seed=7), out + "_warm")
t0 = time.time()
meta = build_index(spark, generate_pages(spark, n_docs), out)
dt = time.time() - t0
print(json.dumps({{"cores": cores, "sec": dt, "docs_per_sec": n_docs / dt,
                   "n_postings": meta.n_postings, "n_terms": meta.n_terms}}))
"""


def run_level(cores: int, n_docs: int) -> dict:
    code = _CHILD.format(repo=REPO)
    res = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_docs)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    lo = run_level(low, n_docs)
    hi = run_level(high, n_docs)
    eff = hi["docs_per_sec"] / ((high / low) * lo["docs_per_sec"])
    out = {
        "n_docs": n_docs,
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(eff, 3),
        "identical_output": lo["n_postings"] == hi["n_postings"] and lo["n_terms"] == hi["n_terms"],
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
