"""Train-and-freeze the quality classifier whose weights are embedded in
``__spark_entry__.py`` (`quality_classifier_trained` registry entry).

Provenance for the frozen literals: a deterministic labeled seed set
(DCLM/FineWeb-Edu shape — "curated" docs labeled 1, "spammy" docs labeled
0) built from the SAME vocabulary family as the driver's synthetic
``documents`` table, so the frozen model actually separates that corpus
rather than scoring everything identically.  Training runs
``pipeline.webtext.train_quality_classifier`` (distributed logistic
regression over hashed mean-normalized unigram counts); the learned float
vector is quantized to integer milli-units with
``freeze_classifier_weights`` — from there inference is pure-integer and
bit-identical across Spark and DuckDB.

Run: ``python scripts/train_qc_weights.py`` → prints the two literals to
paste into ``__spark_entry__.py``.  Deterministic up to float-sum fold
order in the trainer; the committed literals are the canonical artifact
(re-running may flip a milli-unit on ties, which is why the output is
frozen in source rather than retrained per round).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisearch_thai_spark.session import build_spark
from meilisearch_thai_spark.pipeline.webtext import (
    freeze_classifier_weights,
    quality_classifier_frozen,
    train_quality_classifier,
)

N_BUCKETS = 64
EPOCHS = 20
LR = 4.0
SEED = "qc"

# the driver documents table's vocabulary family: "curated" docs lean on
# query-engine/analytics terms, "spam" docs on promo/filler terms with a
# sprinkle of shared common words (so the problem is not trivially disjoint)
GOOD_VOCAB = (
    "merge join table scan key value hash agg window sort column query "
    "group order batch stream spark data vector filter row index"
).split()
BAD_VOCAB = (
    "buy cheap click free win offer deal sale promo casino bonus prize "
    "subscribe now limited urgent exclusive"
).split()
COMMON = "a the line fast slow small big part customer".split()


def labeled_rows():
    rng = random.Random(20260819)
    rows = []
    for i in range(120):
        n = rng.randint(12, 30)
        words = [
            rng.choice(GOOD_VOCAB if rng.random() < 0.75 else COMMON)
            for _ in range(n)
        ]
        rows.append((i, " ".join(words), 1))
    for i in range(120):
        n = rng.randint(12, 30)
        words = [
            rng.choice(BAD_VOCAB if rng.random() < 0.75 else COMMON)
            for _ in range(n)
        ]
        rows.append((1000 + i, " ".join(words), 0))
    return rows


def main() -> None:
    spark = build_spark(app_name="train-qc", cores=8, shuffle_partitions=8)
    train = spark.createDataFrame(labeled_rows(), "doc_id long, text string, label int")
    w, b = train_quality_classifier(
        train, "doc_id", "text", "label",
        n_buckets=N_BUCKETS, epochs=EPOCHS, lr=LR, seed=SEED,
    )
    mw, mb = freeze_classifier_weights(w, b)
    frozen = quality_classifier_frozen(train, "doc_id", "text", mw, mb, seed=SEED)
    scored = {r["doc_key"]: r["keep"] for r in frozen.collect()}
    acc = sum(
        1 for r in train.collect() if scored[r["doc_id"]] == bool(r["label"])
    ) / train.count()
    print(f"# train accuracy with FROZEN milli weights: {acc:.3f}")
    print(f"_QC_TRAINED_MILLI = {mw}")
    print(f"_QC_TRAINED_BIAS_MILLI = {mb}")
    spark.stop()


if __name__ == "__main__":
    main()
