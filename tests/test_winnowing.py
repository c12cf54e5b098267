"""Winnowing rolling-hash fingerprints (Schleimer et al. 2003) + the MOSS
overlap report stage: pure-Python twin parity, the w+k-1 shared-substring
guarantee, and DuckDB twins over the driver corpus."""
from __future__ import annotations

import hashlib
import random
import re

import duckdb
import pytest

from meilisearch_thai_spark.pipeline.dedup import winnow_overlap, winnow_overlap_sql
from meilisearch_thai_spark.pipeline.textstats import (
    winnow_fingerprints,
    winnow_fingerprints_sql,
)


def py_winnow(text: str, k: int = 8, w: int = 4) -> list[tuple[int, str]]:
    """Direct transcription of classic winnowing (rightmost-min tie-break)."""
    t = re.sub(r"[ \t\n\r]+", " ", text.lower()).strip()
    if len(t) < k:
        return []
    hs = [
        hashlib.md5(t[i : i + k].encode("utf-8")).hexdigest()[:8]
        for i in range(len(t) - k + 1)
    ]
    sels = set()
    for j in range(max(len(hs) - w + 1, 1)):
        window = hs[j : j + w]
        mv = min(window)
        idx = max(i for i, h in enumerate(window) if h == mv) + j
        sels.add((idx, hs[idx]))
    return sorted(sels)


CASES = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown fox jumps over a sleepy cat"),
    (3, "short"),  # < k after normalization: no fingerprints
    (4, "  Multiple   spaces\tand\nnewlines here  "),
    (5, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # every k-gram identical: tie-break path
    (6, "สวัสดีครับ นี่คือข้อความภาษาไทยสำหรับทดสอบ"),
]


def test_matches_pure_python_twin(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in winnow_fingerprints(df, "doc_id", "text").collect():
        got.setdefault(r["doc_key"], []).append((r["pos"], r["fp"]))
    for did, text in CASES:
        assert sorted(got.get(did, [])) == py_winnow(text), f"doc {did}"
    assert 3 not in got  # sub-k doc emits nothing


def test_shared_substring_guarantee(spark):
    # Winnowing guarantee: a shared run of >= w+k-1 chars yields a shared
    # selected hash. Plant one 11-char run (k=8, w=4) inside random noise.
    rng = random.Random(20260819)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    shared = "zqxjkvwpbgm"  # 11 = w + k - 1
    rows = []
    for i in range(20):
        noise = lambda n: "".join(rng.choice(alpha) for _ in range(n))
        rows.append((i, noise(rng.randint(10, 40)) + shared + noise(rng.randint(10, 40))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text").collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_key"], set()).add(r["fp"])
    base = by_doc[0]
    for did in range(1, 20):
        assert base & by_doc[did], f"doc {did} shares no fingerprint with doc 0"


def test_validation():
    with pytest.raises(ValueError):
        winnow_fingerprints(None, "doc_id", "text", k=1)
    with pytest.raises(ValueError):
        winnow_fingerprints(None, "doc_id", "text", w=0)


@pytest.mark.parametrize("k,w", [(8, 4), (5, 9)])
def test_duckdb_parity_corpus(spark, sf_dir, k, w):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = (
        winnow_fingerprints(docs, "doc_id", "text", k=k, w=w)
        .toPandas()
        .sort_values(["doc_key", "pos"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    b = (
        con.execute(winnow_fingerprints_sql("documents", "doc_id", "text", k=k, w=w))
        .df()
        .sort_values(["doc_key", "pos"])
        .reset_index(drop=True)
    )
    a, b = a[sorted(a.columns)], b[sorted(b.columns)]
    assert a.shape == b.shape and a.shape[0] > 0
    assert (a.astype(str).values == b.astype(str).values).all()


def test_overlap_detects_shared_paragraph(spark):
    boiler = "all rights reserved contact us at example dot com for details"
    para = "winnowing selects the minimum hash of each sliding window of kgram hashes"
    rows = [
        (1, f"first document unique opening words {para} unique closing one"),
        (2, f"second document different preface text {para} and a different tail"),
        (3, "third document with entirely unrelated content about cooking rice"),
    ]
    # boilerplate shared by ALL docs: must be dropped by max_df=2
    rows = [(i, t + " " + boiler) for i, t in rows]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text")
    pairs = {
        (r["left_key"], r["right_key"]): r["n_shared"]
        for r in winnow_overlap(fps, min_shared=3, max_df=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert not any(3 in p for p in pairs)  # boilerplate alone must not pair doc 3

    # with the df cap lifted, the boilerplate hashes pair everyone
    loose = {
        (r["left_key"], r["right_key"])
        for r in winnow_overlap(fps, min_shared=3, max_df=10).collect()
    }
    assert (1, 3) in loose and (2, 3) in loose


def test_overlap_duckdb_parity(spark, sf_dir):
    # near-dup construction over the corpus: each doc + a tail-appended copy
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    aug = docs.unionAll(
        docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" appended tail for the near duplicate copy")).alias("text"),
        )
    )
    fps = winnow_fingerprints(aug, "doc_id", "text")
    a = (
        winnow_overlap(fps, min_shared=5, max_df=10)
        .toPandas()
        .sort_values(["left_key", "right_key"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    aug_sql = (
        "SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 100000, text || ' appended tail for the near duplicate copy' FROM documents"
    )
    b = (
        con.execute(
            winnow_overlap_sql(
                winnow_fingerprints_sql(f"({aug_sql})", "doc_id", "text"),
                min_shared=5,
                max_df=10,
            )
        )
        .df()
        .sort_values(["left_key", "right_key"])
        .reset_index(drop=True)
    )
    a, b = a[sorted(a.columns)], b[sorted(b.columns)]
    assert a.shape == b.shape and a.shape[0] > 0
    assert (a.astype(str).values == b.astype(str).values).all()
    # the vast majority of originals pair with their tail-appended copy;
    # 100% is unreachable by design — this corpus is drawn from a ~30-word
    # vocabulary, so some docs contain ONLY corpus-common grams and the
    # max_df boilerplate cut (correctly) leaves them nothing rare to share
    got = set(zip(a["left_key"], a["right_key"]))
    n_docs = docs.count()
    matched = sum(1 for l, r in got if r == l + 100000)
    assert matched >= 0.8 * n_docs


def _lcs_bruteforce(a: str, b: str) -> str:
    """O(|a|·|b|) DP twin: longest common substring, lexicographically
    smallest on length ties — the independent oracle for winnow_align."""
    best, cands = 0, set()
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best, cands = cur[j], {b[j - cur[j]: j]}
                elif cur[j] == best and best > 0:
                    cands.add(b[j - cur[j]: j])
        prev = cur
    return min(cands) if cands else ""


def test_lcs_automaton_matches_bruteforce():
    from meilisearch_thai_spark.pipeline.dedup import _lcs_via_suffix_automaton

    import random

    cases = [
        ("abcdefg", "xxcdefyy"),
        ("the quick brown fox", "a quick brown cat"),
        ("aaaa", "aa"),
        ("abab", "baba"),          # tie: 'aba' vs 'bab' -> lexicographic min
        ("", "abc"),
        ("abc", ""),
        ("ไทยแลนด์เชียงใหม่", "เมืองเชียงใหม่ไทย"),  # Thai, multi-codepoint
        ("xyz", "abc"),            # no overlap -> ""
    ]
    rng = random.Random(1234)
    for _ in range(60):  # randomized small alphabet maximizes tie pressure
        a = "".join(rng.choice("abc ") for _ in range(rng.randrange(0, 40)))
        b = "".join(rng.choice("abc ") for _ in range(rng.randrange(0, 40)))
        cases.append((a, b))
    for a, b in cases:
        assert _lcs_via_suffix_automaton(a, b) == _lcs_bruteforce(a, b), (a, b)


def test_winnow_align_extracts_shared_run(spark):
    from meilisearch_thai_spark.pipeline import dedup as dd
    from meilisearch_thai_spark.pipeline import textstats as ts

    shared = "the identical plagiarized paragraph that both documents carry"
    rows = [
        (1, f"Unique preamble alpha. {shared} And a distinct tail one."),
        (2, f"Other text beta beta. {shared} Completely different end."),
        (3, "No overlap with anything else at all in this one, truly."),
        (4, f"ALSO {shared.upper()} via case-folding normalization."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = ts.winnow_fingerprints(docs, "doc_id", "text")
    pairs = dd.winnow_overlap(fps, min_shared=3, max_df=10)
    got = {
        (r["left_key"], r["right_key"]): (r["match_len"], r["match_text"])
        for r in dd.winnow_align(pairs, docs, "doc_id", "text", min_len=20).collect()
    }
    # every surviving pair's match contains the planted paragraph (the
    # normalized texts share exactly that run plus its flanking spaces)
    assert got and all(shared in m for (_l, m) in got.values())
    assert (1, 2) in got and (1, 4) in got and (2, 4) in got
    assert all(3 not in k for k in got)
    # the reported length equals the true normalized-text LCS (brute twin)
    norm = lambda s: " ".join(s.lower().split())  # noqa: E731
    texts = {i: norm(t) for i, t in rows}
    for (l, r), (ml, mt) in got.items():
        want = _lcs_bruteforce(texts[l], texts[r])
        assert (ml, mt) == (len(want), want)
    # min_len gates: a huge threshold drops every pair
    assert dd.winnow_align(pairs, docs, "doc_id", "text", min_len=10_000).count() == 0
