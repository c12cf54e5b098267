"""Duplicate-cluster resolution: candidate pairs → connected components
(min-label propagation), the keep-one-per-cluster step of corpus dedup."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.pipeline.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "left_key long, right_key long")
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_transitive_chain_collapses_to_one_cluster(spark):
    # A~B, B~C (no direct A~C pair) must land in ONE cluster labeled min id
    got = _cc(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_disjoint_clusters_stay_apart(spark):
    got = _cc(spark, [(10, 11), (20, 21), (21, 22), (30, 31)])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_long_path_needs_multiple_rounds(spark):
    # a 9-node path has diameter 8 — exercises the iteration loop well past
    # one round and the convergence check
    path = [(i, i + 1) for i in range(100, 108)]
    got = _cc(spark, path)
    assert got == {i: 100 for i in range(100, 109)}


def test_pair_order_and_duplicates_irrelevant(spark):
    # reversed and repeated pairs produce the same clustering
    got = _cc(spark, [(5, 4), (4, 5), (5, 4), (6, 5)])
    assert got == {4: 4, 5: 4, 6: 4}


def test_deterministic_sample_nested_and_reproducible(spark):
    """Hash-based sampling: same (seed, id) decision on every run, nested
    fractions give nested samples, disjoint seeds differ."""
    from meilisearch_thai_spark.pipeline.sampling import deterministic_sample

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.10, "a").collect()}
    s10b = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.10, "a").collect()}
    s30 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.30, "a").collect()}
    other = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.10, "b").collect()}
    assert s10 == s10b
    assert s10 <= s30
    assert other != s10
    assert 0.05 < len(s10) / 2000 < 0.15 and 0.25 < len(s30) / 2000 < 0.35


def test_stratified_sample_fractions_and_default(spark):
    from meilisearch_thai_spark.pipeline.sampling import stratified_sample

    docs = spark.range(0, 3000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 3 = 0 THEN 'keep' WHEN id % 3 = 1 THEN 'half' ELSE 'drop' END AS s"
    )
    got = stratified_sample(docs, "doc_id", "s", {"keep": 1.0, "half": 0.5}).collect()
    by = {}
    for r in got:
        by.setdefault(r["s"], set()).add(r["doc_id"])
    assert len(by.get("keep", set())) == 1000       # fraction 1.0 keeps all
    assert "drop" not in by                          # default 0.0 drops all
    assert 400 < len(by["half"]) < 600


def test_sample_fraction_validation(spark):
    import pytest

    from meilisearch_thai_spark.pipeline.sampling import deterministic_sample

    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(docs, "doc_id", 1.5)


def test_cc_raises_on_nonconvergence_instead_of_wrong_labels(spark):
    import pytest

    from meilisearch_thai_spark.pipeline.dedup import connected_components

    path = spark.createDataFrame([(i, i + 1) for i in range(10, 16)],
                                 "left_key long, right_key long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iter=2)


def test_hash_split_exhaustive_and_repropotion_stable(spark):
    """Every row lands in exactly one split; re-proportioning train/val
    around an untouched test fraction never moves a test row."""
    from meilisearch_thai_spark.pipeline.sampling import hash_split

    docs = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in
         hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert len(a) == 3000
    counts = {s: sum(1 for v in a.values() if v == s) for s in ("train", "val", "test")}
    assert 0.75 < counts["train"] / 3000 < 0.85
    assert 0.06 < counts["val"] / 3000 < 0.14
    assert 0.06 < counts["test"] / 3000 < 0.14
    b = {r["doc_id"]: r["split"] for r in
         hash_split(docs, "doc_id", {"train": 0.85, "val": 0.05, "test": 0.1}).collect()}
    assert {k for k, v in a.items() if v == "test"} == {k for k, v in b.items() if v == "test"}
    # train only grew — no train row demoted to val
    assert {k for k, v in a.items() if v == "train"} <= {k for k, v in b.items() if v == "train"}


def test_hash_split_validation(spark):
    import pytest

    from meilisearch_thai_spark.pipeline.sampling import hash_split, hash_split_sql

    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="two splits"):
        hash_split(docs, "doc_id", {"a": 1.0})
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split_sql("t", "doc_id", {"a": 0.5, "b": 0.6})


def test_hash_split_duckdb_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.sampling import hash_split, hash_split_sql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    a = hash_split(docs, "doc_id", splits).toPandas().sort_values("doc_id")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = con.execute(
        hash_split_sql("(SELECT doc_id FROM documents) d", "doc_id", splits)
    ).df().sort_values("doc_id")
    assert (a["split"].values == b["split"].values).all()


def test_against_snapshot_drops_seen_texts_only(spark):
    from meilisearch_thai_spark.pipeline.dedup import against_snapshot

    snap = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "beta"), (11, "gamma"), (12, "gamma")], "doc_id long, text string"
    )
    got = sorted(r["doc_id"] for r in against_snapshot(new, snap, "doc_id", "text").collect())
    # beta seen in snapshot → dropped; gamma rows BOTH survive (within-batch
    # dedup is exact_duplicates' job, not this operator's)
    assert got == [11, 12]


def test_against_snapshot_duckdb_parity(spark, sf_dir):
    import duckdb

    from pyspark.sql import functions as F

    from meilisearch_thai_spark.pipeline.dedup import (
        against_snapshot,
        against_snapshot_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    snap = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    a = (
        against_snapshot(new, snap, "doc_id", "text")
        .select("doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = con.execute(
        against_snapshot_sql(
            "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1",
            "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0",
            "text",
        )
    ).df()[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"].values == b["doc_id"].values).all() and len(a) > 0


# ---------------------------------------------------------------- token-budget mixture


def _greedy_expected(rows, budgets, seed="mix"):
    """Pure-Python twin of token_budget_sample: greedy md5-ordered prefix."""
    import hashlib

    by_src = {}
    for doc_id, src, n_tokens in rows:
        rk = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()
        by_src.setdefault(src, []).append((rk, doc_id, n_tokens))
    out = {}
    for src, docs in by_src.items():
        if src not in budgets:
            continue
        before = 0
        for rk, doc_id, n_tokens in sorted(docs):
            if before < budgets[src]:
                out[doc_id] = (src, n_tokens, before)
            before += n_tokens
    return out


def test_token_budget_greedy_prefix_exact_and_partition_invariant(spark):
    from meilisearch_thai_spark.pipeline.sampling import token_budget_sample

    rows = [(i, f"s{i % 3}", f"w{i} " * ((i * 7) % 13 + 1)) for i in range(60)]
    rows += [(100, "s0", ""), (101, "s9", "a b c")]  # empty doc; unbudgeted source
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    budgets = {"s0": 50, "s1": 10_000, "s2": 0}
    expected = _greedy_expected(
        [(i, s, len([t for t in x.split(" ") if t])) for i, s, x in rows], budgets
    )

    for df in (docs, docs.repartition(7, "doc_id")):
        got = {
            r["doc_key"]: (r["source"], r["n_tokens"], r["tokens_before"])
            for r in token_budget_sample(df, "doc_id", "text", "source", budgets).collect()
        }
        assert got == expected
    # regime sanity: s2 contributes nothing, s1 keeps all 20 of its docs,
    # s0 overshoots by at most one document
    assert not any(src == "s2" for src, _, _ in expected.values())
    assert sum(1 for src, _, _ in expected.values() if src == "s1") == 20
    s0_kept = [(n, b) for src, n, b in expected.values() if src == "s0"]
    assert all(b < budgets["s0"] for _, b in s0_kept)
    assert sum(n for n, _ in s0_kept) - budgets["s0"] < max(n for n, _ in s0_kept)


def test_token_budget_validation(spark):
    import pytest as _pytest

    from meilisearch_thai_spark.pipeline.sampling import token_budget_sample

    docs = spark.createDataFrame([(1, "a", "x")], ["doc_id", "source", "text"])
    with _pytest.raises(ValueError):
        token_budget_sample(docs, "doc_id", "text", "source", {})
    with _pytest.raises(ValueError):
        token_budget_sample(docs, "doc_id", "text", "source", {"a": -1})
    # all budgets zero -> empty result with the full schema
    out = token_budget_sample(docs, "doc_id", "text", "source", {"a": 0})
    assert out.columns == ["doc_key", "source", "n_tokens", "tokens_before"]
    assert out.count() == 0


def test_token_budget_duckdb_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.sampling import (
        token_budget_sample,
        token_budget_sample_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budgets = {"src0": 300, "src1": 999_999, "src2": 0, "src3": 120}
    a = (
        token_budget_sample(docs, "doc_id", "text", "source", budgets)
        .toPandas()
        .sort_values("doc_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = (
        con.execute(token_budget_sample_sql("documents", "doc_id", "text", "source", budgets))
        .df()
        .sort_values("doc_key")
        .reset_index(drop=True)
    )
    assert len(a) > 0 and len(a) == len(b)
    for c in ["doc_key", "n_tokens", "tokens_before"]:
        assert (a[c].astype("int64").values == b[c].astype("int64").values).all()
    assert (a["source"].values == b["source"].values).all()


# ------------------------------------------------------- temperature mixture
def test_temperature_weights_flattens_shares(spark):
    from meilisearch_thai_spark.pipeline.sampling import temperature_weights

    rows = (
        [(i, "head", "w " * 99 + "w") for i in range(9)]      # 900 tokens
        + [(100, "tail", "w " * 99 + "w")]                    # 100 tokens
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in temperature_weights(docs, "source", "text").collect()}
    assert out["head"].n_tokens == 900 and out["tail"].n_tokens == 100
    assert out["head"].natural_bp == 9000 and out["tail"].natural_bp == 1000
    # sqrt flattening: 30/(30+10) = 75% vs 90% natural; tail 25% vs 10%
    assert out["head"].temp_bp == 7500 and out["tail"].temp_bp == 2500


def test_temperature_weights_rejects_other_alpha(spark):
    import pytest
    from meilisearch_thai_spark.pipeline.sampling import (
        temperature_weights,
        temperature_weights_sql,
    )

    docs = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        temperature_weights(docs, "source", "text", alpha=0.3)
    with pytest.raises(ValueError):
        temperature_weights_sql("t", "source", "text", alpha=0.3)


def test_temperature_weights_duckdb_parity(spark, sf_dir):
    import duckdb
    from meilisearch_thai_spark.pipeline.sampling import (
        temperature_weights,
        temperature_weights_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = temperature_weights(docs, "source", "text").toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = con.execute(temperature_weights_sql("documents", "source", "text")).df()
    for c in a.columns:
        assert list(a[c]) == list(b[c]), c


def test_keep_best_per_cluster_canonical_pick(spark):
    from meilisearch_thai_spark.pipeline.dedup import keep_best_per_cluster

    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "the longest text here"),
            (3, "mid length"),
            (4, "zz"),
            (5, "zz"),
            (9, "lonely singleton"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "left_key long, right_key long"
    )
    got = {
        r["component"]: (r["kept_key"], r["kept_len"], r["n_members"])
        for r in keep_best_per_cluster(docs, pairs, "doc_id", "text").collect()
    }
    # cluster {1,2,3}: longest text wins; cluster {4,5}: tie on length -> min id
    assert got == {1: (2, 21, 3), 4: (4, 2, 2)}
    # singleton 9 never appears
    assert 9 not in {k for k, *_ in got.values()}


def test_keep_best_per_cluster_duckdb_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.dedup import (
        keep_best_per_cluster,
        keep_best_per_cluster_sql,
        minhash_lsh_candidates,
        minhash_lsh_candidates_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text")
    a = (
        keep_best_per_cluster(docs, pairs, "doc_id", "text")
        .toPandas()
        .sort_values("component")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = (
        con.execute(
            keep_best_per_cluster_sql(
                minhash_lsh_candidates_sql("documents", "doc_id", "text"),
                "documents",
                "doc_id",
                "text",
            )
        )
        .df()
        .sort_values("component")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) and len(a) > 0
    for col in ["component", "kept_key", "kept_len", "n_members"]:
        assert (a[col].values == b[col].values).all(), col


def test_minhash_against_snapshot_semantics(spark):
    from meilisearch_thai_spark.pipeline.dedup import minhash_against_snapshot

    base = "the quick brown fox jumps over the lazy dog again and again today"
    snap = spark.createDataFrame(
        [(1, base), (2, "completely different words about thai food recipes here now")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base.replace("today", "tomorrow")),  # near-dup of 1
            (11, "unrelated text on spark partitioning and shuffles at scale ok"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["new_key"], r["snap_key"])
        for r in minhash_against_snapshot(new, snap, "doc_id", "text").collect()
    }
    assert (10, 1) in got
    assert all(nk != 11 for nk, _ in got)


def test_minhash_against_snapshot_duckdb_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.dedup import (
        minhash_against_snapshot,
        minhash_against_snapshot_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    snap = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    a = (
        minhash_against_snapshot(new, snap, "doc_id", "text")
        .toPandas().sort_values(["new_key", "snap_key"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = con.execute(
        minhash_against_snapshot_sql(
            "SELECT * FROM documents WHERE doc_id % 2 = 1",
            "SELECT * FROM documents WHERE doc_id % 2 = 0",
            "doc_id", "text",
        )
    ).df().sort_values(["new_key", "snap_key"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in ["new_key", "snap_key"]:
        assert list(a[c]) == list(b[c]), c


def test_shuffle_assign_deterministic_balanced_duckdb_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.sampling import (
        shuffle_assign,
        shuffle_assign_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = shuffle_assign(docs, "doc_id", "ep0", 8)
    pa = a.toPandas().sort_values("doc_id").reset_index(drop=True)
    # deterministic across runs
    pb = shuffle_assign(docs, "doc_id", "ep0", 8).toPandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert (pa["shard"].values == pb["shard"].values).all()
    # a different seed produces a different permutation
    pc = shuffle_assign(docs, "doc_id", "ep1", 8).toPandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert (pa["shard"].values != pc["shard"].values).any()
    # roughly balanced shards (md5 uniformity)
    counts = pa["shard"].value_counts()
    assert len(counts) == 8 and counts.min() > 0.6 * counts.max()
    # DuckDB twin bit-for-bit
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    d = con.execute(
        shuffle_assign_sql("(SELECT doc_id FROM documents) t", "doc_id", "ep0", 8)
    ).df().sort_values("doc_id").reset_index(drop=True)
    assert (pa["shard"].values == d["shard"].values).all()
    assert list(pa["shuffle_key"]) == list(d["shuffle_key"])
    # intra-shard order is the md5 order, not the id order (it shuffles)
    s0 = pa[pa["shard"] == 0].sort_values("shuffle_key")["doc_id"].tolist()
    assert s0 != sorted(s0)


def test_verify_candidate_pairs_precision_filter(spark):
    """The LSH→exact verification stage (FineWeb/Gopher precision filter):
    every input pair gets an exact Jaccard verdict, near-dups confirmed,
    LSH false positives rejected; DuckDB twin bit-matches."""
    import duckdb

    from meilisearch_thai_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        verify_candidate_pairs,
        verify_candidate_pairs_sql,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " tonight"),            # near-dup of 1
        (3, "completely different words about spark sql engines and joins"),
        (4, base.replace("quick", "rapid")),  # near-dup of 1/2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_candidates(docs, "doc_id", "text")
    # add a known FALSE candidate pair to prove rejection is reported
    fake = spark.createDataFrame([(1, 3)], "left_key long, right_key long")
    allp = pairs.select("left_key", "right_key").unionByName(fake).distinct()

    out = verify_candidate_pairs(docs, allp, "doc_id", "text", threshold=0.5)
    got = {(r["left_key"], r["right_key"]): (r["jaccard"], r["is_dup"])
           for r in out.collect()}
    assert got[(1, 3)][1] is False          # false positive rejected
    assert got[(1, 2)][1] is True           # near-dup confirmed
    assert all(0.0 <= j <= 1.0 for j, _ in got.values())
    # every input pair verdicted — nothing silently dropped
    assert len(got) == allp.count()

    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", rows)
    con.execute("CREATE TABLE p(left_key BIGINT, right_key BIGINT)")
    con.executemany(
        "INSERT INTO p VALUES (?,?)",
        [(a, b) for a, b in (r[:2] for r in allp.collect())],
    )
    oracle = {
        (lk, rk): (float(j), bool(d))
        for lk, rk, j, d in con.execute(
            verify_candidate_pairs_sql("d", "SELECT * FROM p", "doc_id", "text",
                                       threshold=0.5)
        ).fetchall()
    }
    assert {k: (float(v[0]), bool(v[1])) for k, v in got.items()} == oracle


@pytest.mark.parametrize("seed", [11, 29])
def test_lsh_verify_chain_randomized_batch_parity(spark, seed):
    """Seeded randomized corpora through the FULL recall→precision chain
    (minhash LSH candidates → exact-Jaccard verification) vs DuckDB —
    one Spark job per seed (the r4 batch-parity pattern), catching
    interactions single-case tests cannot."""
    import random

    import duckdb

    from meilisearch_thai_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_lsh_candidates_sql,
        verify_candidate_pairs,
        verify_candidate_pairs_sql,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        n = rng.randint(6, 25)
        words = [rng.choice(vocab) for _ in range(n)]
        rows.append((i, " ".join(words)))
        if rng.random() < 0.3:  # inject a near-dup with small edits
            j = 1000 + i
            mutated = list(words)
            for _ in range(rng.randint(0, 2)):
                mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            rows.append((j, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_lsh_candidates(docs, "doc_id", "text")
    verdicts = verify_candidate_pairs(docs, pairs, "doc_id", "text", threshold=0.6)
    got = sorted(
        (r["left_key"], r["right_key"], float(r["jaccard"]), bool(r["is_dup"]))
        for r in verdicts.collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?,?)", rows)
    pairs_sql = minhash_lsh_candidates_sql("d", "doc_id", "text")
    oracle = sorted(
        (lk, rk, float(j), bool(x))
        for lk, rk, j, x in con.execute(
            verify_candidate_pairs_sql("d", pairs_sql, "doc_id", "text", threshold=0.6)
        ).fetchall()
    )
    assert got == oracle
    assert len(got) > 0  # the injected near-dups guarantee candidates
