"""Web-text hygiene operators (pipeline/webtext.py): C4 boilerplate-line
removal, Gopher quality signals, PII masking — semantics on handcrafted
corpora (the driver entries check Spark-vs-DuckDB parity; these check the
heuristics themselves)."""

from __future__ import annotations

import pytest

from meilisearch_thai_spark.pipeline import webtext as wt


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


@pytest.fixture(scope="module")
def boiler_corpus(spark):
    header = "accept cookies to continue"
    rows = [
        (1, f"{header}\nunique first line\nsecond line one"),
        (2, f"{header}\nanother unique line"),
        (3, f"{header}\nthird body text\nmore third body"),
        (4, header),  # boilerplate-only document
        (5, "no header here\njust content"),
    ]
    return _docs(spark, rows)


def test_boilerplate_lines_flags_high_df(spark, boiler_corpus):
    flagged = wt.boilerplate_lines(boiler_corpus, "id", "text", min_df=3)
    got = {r.line: r.line_df for r in flagged.collect()}
    assert got == {"accept cookies to continue": 4}


def test_remove_boilerplate_preserves_order(spark, boiler_corpus):
    out = {r.doc_key: r for r in wt.remove_boilerplate(boiler_corpus, "id", "text", min_df=3).collect()}
    assert out[1].clean_text == "unique first line\nsecond line one"
    assert out[1].n_kept == 2 and out[1].n_removed == 1
    # boilerplate-only doc survives with empty text, not a dropped row
    assert out[4].clean_text == "" and out[4].n_kept == 0 and out[4].n_removed == 1
    # untouched doc round-trips byte-identically
    assert out[5].clean_text == "no header here\njust content"
    assert out[5].n_removed == 0


def test_gopher_pass_and_signals(spark):
    # real language carries common stop words (the published Gopher rule)
    good = "the report and " + " ".join(f"token{i}" for i in range(57))
    nostop = " ".join(f"token{i}" for i in range(60))  # keyword-stuffing shape
    short = "too short"
    repeats = " ".join(["spam ham"] * 40)  # one bigram dominates
    bullets = "\n".join(f"- item {i} in a long enough bullet list of words" for i in range(20))
    rows = [(1, good), (2, short), (3, repeats), (4, bullets), (5, nostop)]
    out = {r.doc_key: r for r in wt.gopher_quality(_docs(spark, rows), "id", "text").collect()}

    assert out[1].stop_word_distinct == 2 and out[1].gopher_pass
    assert out[2].n_words == 2 and not out[2].gopher_pass
    # "ham spam" repeated ~39 times out of 79 bigrams -> ~49%
    assert out[3].top_bigram_bp > wt.GOPHER_THRESHOLDS["max_top_bigram_bp"]
    assert not out[3].gopher_pass
    assert out[4].bullet_line_bp == 10000  # every line is a bullet
    assert not out[4].gopher_pass  # > 90% bullet lines
    # the stop-word language test alone rejects the stuffing doc...
    assert out[5].stop_word_distinct == 0 and not out[5].gopher_pass
    # ...and disabling it (Thai-tokenized text) restores the old behavior
    off = {
        r.doc_key: r
        for r in wt.gopher_quality(
            _docs(spark, rows), "id", "text", stop_words=None
        ).collect()
    }
    assert off[5].gopher_pass and "stop_word_distinct" not in off[5].asDict()


def test_gopher_empty_doc_zero_signals(spark):
    out = wt.gopher_quality(_docs(spark, [(1, "")]), "id", "text").collect()[0]
    assert out.n_words == 0 and out.mean_word_len_bp == 0 and out.top_bigram_bp == 0
    assert not out.gopher_pass


def test_mask_pii(spark):
    rows = [
        (1, "reach me at alice.smith+tag@sub.example.co.uk or bob@ex.io today"),
        (2, "server 192.168.1.254 and backup 10.0.0.1 are up"),
        (3, "call +66 2 123 4567 now"),
        (4, "nothing sensitive here"),
        (5, "ping admin@host9org now"),  # '@' but no dotted domain: not an email
    ]
    out = {r.doc_key: r for r in wt.mask_pii(_docs(spark, rows), "id", "text").collect()}
    assert out[1].masked_text == "reach me at <EMAIL> or <EMAIL> today"
    assert out[1].n_email == 2
    assert out[2].masked_text == "server <IP> and backup <IP> are up"
    assert out[2].n_ipv4 == 2
    assert out[3].masked_text == "call <PHONE> now"
    assert out[3].n_phone == 1
    # clean text is a byte-identical no-op
    assert out[4].masked_text == rows[3][1]
    assert out[4].n_email == out[4].n_ipv4 == out[4].n_phone == 0
    # '\.' must stay a literal dot in the count regex (escaping regression)
    assert out[5].masked_text == rows[4][1] and out[5].n_email == 0


def test_clean_corpus_end_to_end_index(spark, tmp_path):
    """clean_corpus output drops straight into build_index: boilerplate and
    PII never reach the posting vocabulary."""
    from meilisearch_thai_spark.index.builder import build_index
    from meilisearch_thai_spark.pipeline.webtext import clean_corpus
    from pyspark.sql import functions as F

    boiler = "accept cookies now"
    rows = [
        (i, f"{boiler}\nเนื้อหาสำคัญ เรื่องที่ {i}\nwrite to user{i}@example.com")
        for i in range(1, 7)
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    clean = clean_corpus(docs, "id", "text", min_df=3)
    pages = clean.select(
        F.concat(F.lit("https://t/"), F.col("id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.lit("th").alias("lang"),
    )
    out = str(tmp_path / "idx")
    meta = build_index(spark, pages, out)
    assert meta.n_docs == 6
    vocab = {r.term for r in spark.read.parquet(f"{out}/postings").select("term").distinct().collect()}
    assert "cookies" not in vocab and "accept" not in vocab
    assert not any("@" in t for t in vocab)
    assert "<email>" in {t.lower() for t in vocab} or any("email" in t.lower() for t in vocab)


def test_clean_corpus_preserves_other_columns(spark):
    """The drop-in contract: every non-text input column (url/lang/...)
    rides through the pass unchanged, with text rewritten in place."""
    from meilisearch_thai_spark.pipeline.webtext import clean_corpus

    boiler = "accept cookies now"
    rows = [
        (i, f"{boiler}\ncontent line number {i}", f"https://t/{i}", "th")
        for i in range(1, 7)
    ]
    docs = spark.createDataFrame(rows, "id long, text string, url string, lang string")
    out = clean_corpus(docs, "id", "text", min_df=3, mask=False)
    assert out.columns == docs.columns  # same schema, same order
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 6
    for i, r in got.items():
        assert r["url"] == f"https://t/{i}" and r["lang"] == "th"
        assert "cookies" not in r["text"] and f"number {i}" in r["text"]


def test_benchmark_contamination_semantics(spark):
    """GPT-3-style decontamination: only docs sharing an n-gram run with the
    benchmark are flagged, counts are exact, clean docs report zero."""
    from meilisearch_thai_spark.pipeline.webtext import benchmark_contamination

    leak = "alpha beta gamma delta"  # 4-gram present in the benchmark
    docs = spark.createDataFrame(
        [
            (1, f"intro words {leak} trailing tail"),     # partial overlap
            (2, "totally unrelated clean document text"),  # clean
            (3, leak),                                     # fully leaked
            (4, "abc"),                                    # shorter than n
        ],
        "id long, text string",
    )
    bench = spark.createDataFrame([(f"prefix {leak} suffix",)], "text string")
    got = {
        r["doc_key"]: (r["n_grams"], r["n_contaminated"], r["contaminated_bp"])
        for r in benchmark_contamination(docs, "id", "text", bench, "text", n=4).collect()
    }
    # doc 1: 8 tokens -> 5 grams; exactly one ("alpha beta gamma delta") hits
    assert got[1] == (5, 1, 2000)
    assert got[2] == (2, 0, 0)
    assert got[3] == (1, 1, 10000)
    assert got[4] == (0, 0, 0)


def test_duplicate_spans_semantics(spark):
    """Lee-et-al-style span dedup: shared 5-token runs across docs are
    flagged; unique docs stay clean; short docs survive with zero spans."""
    from meilisearch_thai_spark.pipeline.dedup import duplicate_spans

    shared = "one two three four five"
    rows = [
        (1, f"{shared} alpha beta"),
        (2, f"intro words {shared} tail"),
        (3, "completely different tokens here with no overlap at all"),
        (4, "tiny doc"),  # < n tokens
    ]
    out = {r.doc_key: r for r in duplicate_spans(
        spark.createDataFrame(rows, "id long, text string"), "id", "text", n=5
    ).collect()}
    assert out[1].n_dup_spans >= 1 and out[2].n_dup_spans >= 1
    assert out[3].n_dup_spans == 0 and out[3].n_spans > 0
    assert out[4].n_spans == 0 and out[4].dup_span_bp == 0


def test_extract_html_text_semantics(spark):
    """HTML extraction: script/style/head/comments dropped, block closers
    become newlines, entities decoded (&amp; last), title captured."""
    from meilisearch_thai_spark.pipeline.webtext import extract_html_text

    html = (
        "<html><head><title> My &amp; Page </title><script>x&lt;1</script></head>"
        "<body><p>first</p><p>second &amp;lt; stays</p>"
        "<ul><li>a</li><li>b</li></ul><!-- hidden -->"
        "<div>x &lt;tag&gt; &quot;q&quot; &#39;s&#39; y</div></body></html>"
    )
    docs = spark.createDataFrame([(1, html), (2, "no tags at all"), (3, None)],
                                 "id long, html string")
    got = {r["doc_key"]: (r["title"], r["text"])
           for r in extract_html_text(docs, "id", "html").collect()}
    title, text = got[1]
    assert title == "My & Page"
    assert "x<1" not in text and "script" not in text  # head+script gone
    assert "hidden" not in text
    lines = text.split("\n")
    assert lines[0] == "first"
    # author-escaped &amp;lt; must decode to literal '&lt;', NOT re-form '<'
    assert "second &lt; stays" in lines[1]
    assert "a\nb" in text
    assert 'x <tag> "q" \'s\' y' in text
    assert got[2] == ("", "no tags at all")
    assert got[3] == ("", "")  # NULL html -> empty, not a crash


def test_unigram_logprob_semantics(spark):
    """LM quality: reference-like docs outscore OOV-heavy docs; empty docs
    report zero; exact smoothed values on a hand-computable reference."""
    import math

    from meilisearch_thai_spark.pipeline.webtext import unigram_logprob

    ref = spark.createDataFrame([("the cat sat",), ("the dog sat",)], "text string")
    # ref: the×2, sat×2, cat×1, dog×1 -> N=6, V=4
    docs = spark.createDataFrame(
        [(1, "the sat"), (2, "zzz qqq"), (3, "")], "id long, text string"
    )
    got = {
        r["doc_key"]: (r["n_tokens"], r["mean_logprob"])
        for r in unigram_logprob(docs, "id", "text", ref, "text").collect()
    }
    lp_the = math.log(3 / 11)   # (2+1)/(6+4+1)
    lp_oov = math.log(1 / 11)
    assert got[1] == (2, round((lp_the + lp_the) / 2, 4))
    assert got[2] == (2, round(lp_oov, 4))
    assert got[3] == (0, 0.0)
    assert got[1][1] > got[2][1]  # in-reference text scores higher


def test_unicode_fix_semantics(spark):
    """ftfy-lite: newline canonicalization, C0/C1 strip (tab/newline kept),
    BOM/soft-hyphen removal, NFC composition; ZWSP survives (Thai signal)."""
    from meilisearch_thai_spark.pipeline.webtext import unicode_fix

    rows = [
        (1, "a\r\nb\rc\nd"),                       # newlines canonicalize
        (2, "x\x00y\x07z\tk\x9fq"),                # controls out, tab stays
        (3, "﻿café ­soft"),        # BOM/soft-hyphen out, NFC
        (4, "ไทย​คำ"),                        # ZWSP kept
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_key"]: r["fixed_text"] for r in unicode_fix(df, "doc_id", "text").collect()}
    assert got[1] == "a\nb\nc\nd"
    assert got[2] == "xyz\tkq"
    assert got[3] == "café soft"
    assert got[4] == "ไทย​คำ"
    assert got[5] is None


def test_unicode_fix_duckdb_parity(spark):
    import duckdb

    from meilisearch_thai_spark.pipeline.webtext import unicode_fix, unicode_fix_sql

    rows = [
        (1, "a\r\nb\rc"),
        (2, "ctrl\x01\x02\x7f\x80end"),
        (3, "é + ﻿­ + ไทย​"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_key"]: r["fixed_text"] for r in unicode_fix(df, "doc_id", "text").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        k: v for k, v in con.execute(unicode_fix_sql("t", "doc_id", "text")).fetchall()
    }
    assert got == want


def test_unicode_fix_parity_property(spark):
    """Property: for 120 random strings over the interesting alphabet
    (latin, combining marks, Thai incl. ZWSP, C0/C1 controls,
    BOM/soft-hyphen, CR/LF), the Spark unicode_fix and its DuckDB twin
    agree byte-for-byte."""
    import duckdb

    from meilisearch_thai_spark.pipeline.webtext import unicode_fix, unicode_fix_sql

    # fixed-seed sampling rather than @given: each example would need its
    # own Spark job, so the property runs as ONE batched cross-engine check
    import random

    rng = random.Random(1234)
    chars = (
        list("abcXYZ ")
        + ["́", "ก", "ิ", "​", "é", "e"]
        + ["\r", "\n", "\t", "\x00", "\x07", "\x1f", "\x7f", "\x80", "\x9f"]
        + ["﻿", "­"]
    )
    rows = [
        (i, "".join(rng.choice(chars) for _ in range(rng.randrange(0, 60))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_key"]: r["fixed_text"]
        for r in unicode_fix(df, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.execute(unicode_fix_sql("t", "doc_id", "text")).fetchall())
    assert got == want


def test_source_mixture_accounting(spark):
    """Mixture table: per-(source,lang) doc/token/byte counts and integer-bp
    token share; shares floor-sum to <= 10000."""
    from meilisearch_thai_spark.pipeline.textstats import source_mixture

    rows = [
        (1, "a b c", "web", "en"),      # 3 tokens
        (2, "d e", "web", "en"),        # 2
        (3, "f g h i", "web", "th"),    # 4
        (4, "j", "books", "en"),        # 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    got = {
        (r["source"], r["lang"]): (r["n_docs"], r["n_tokens"], r["n_bytes"], r["share_bp"])
        for r in source_mixture(df, ["source", "lang"], "text").collect()
    }
    assert got[("web", "en")] == (2, 5, 8, 5000)
    assert got[("web", "th")] == (1, 4, 7, 4000)
    assert got[("books", "en")] == (1, 1, 1, 1000)
    assert sum(v[3] for v in got.values()) <= 10000


def test_dedup_lines_keeps_first_occurrence_in_order(spark):
    from meilisearch_thai_spark.pipeline.webtext import dedup_lines

    df = spark.createDataFrame(
        [(1, "a\nb\na\n\nc\n\nb"), (2, "x"), (3, "")], ["doc_id", "text"]
    )
    got = {r["doc_key"]: r["text"] for r in dedup_lines(df, "doc_id", "text").collect()}
    assert got == {1: "a\nb\n\nc", 2: "x", 3: ""}


def test_dedup_lines_duckdb_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.webtext import dedup_lines, dedup_lines_sql
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    messy = docs.select(
        "doc_id",
        F.concat(F.lit("top\n"), F.col("text"), F.lit("\ntop\nbot\nbot")).alias("text"),
    )
    a = (
        dedup_lines(messy, "doc_id", "text")
        .toPandas()
        .sort_values("doc_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = (
        con.execute(
            dedup_lines_sql(
                "(SELECT doc_id, 'top' || chr(10) || text || chr(10) || 'top' || "
                "chr(10) || 'bot' || chr(10) || 'bot' AS text FROM documents) m",
                "doc_id",
                "text",
            )
        )
        .df()
        .sort_values("doc_key")
        .reset_index(drop=True)
    )
    assert (a["text"].values == b["text"].values).all()


def test_length_quantiles_exact_and_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.textstats import (
        length_quantiles,
        length_quantiles_sql,
    )

    # hand-checked exact interpolation: values 1..5, p50=3, p90=4.6
    df = spark.createDataFrame([("g", i) for i in range(1, 6)], ["src", "n"])
    row = length_quantiles(df, "src", "n").collect()[0]
    assert row["n_docs"] == 5 and row["p50"] == 3.0 and row["p90"] == 4.6
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = length_quantiles(docs, "source", "n_chars").toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = con.execute(length_quantiles_sql("documents", "source", "n_chars")).df()
    assert (a[sorted(a.columns)].astype(str).values == b[sorted(b.columns)].astype(str).values).all()


def test_top_ngrams_handchecked_and_short_doc_guard(spark):
    from meilisearch_thai_spark.pipeline.textstats import top_ngrams

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "one"), (4, ""), (5, "The cat")],
        ["doc_id", "text"],
    )
    got = [(r["ngram"], r["n"]) for r in top_ngrams(df, "text", n=2, k=3).collect()]
    # "the cat" ×3 (lowercased); then count-1 bigrams tie-broken by string
    assert got == [("the cat", 3), ("cat ran", 1), ("cat sat", 1)]
    assert top_ngrams(df, "text", n=5, k=3).count() == 0  # all docs too short


def test_top_ngrams_plan_is_takeordered_not_global_sort(spark, sf_dir):
    from meilisearch_thai_spark.pipeline.textstats import top_ngrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = top_ngrams(docs, "text", n=2, k=10)
    df.collect()  # finalize AQE
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in txt
    assert "MapInPandas" not in txt and "BatchEvalPython" not in txt


def test_top_ngrams_duckdb_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.textstats import top_ngrams, top_ngrams_sql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for n in (1, 2, 3):
        a = top_ngrams(docs, "text", n=n, k=25).toPandas()
        b = con.execute(top_ngrams_sql("documents", "text", n=n, k=25)).df()
        assert a["ngram"].tolist() == b["ngram"].tolist()
        assert a["n"].tolist() == b["n"].tolist()


def test_quality_classifier_deterministic_and_parity(spark, sf_dir):
    import duckdb

    from meilisearch_thai_spark.pipeline.webtext import (
        quality_classifier,
        quality_classifier_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = (
        quality_classifier(docs, "doc_id", "text")
        .toPandas()
        .sort_values("doc_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = (
        con.execute(quality_classifier_sql("documents", "doc_id", "text"))
        .df()
        .sort_values("doc_key")
        .reset_index(drop=True)
    )
    assert (a["logit"].values == b["logit"].values).all()
    assert (a["keep"].values == b["keep"].values).all()
    # both classes occur on a real corpus slice (the placeholder weights are
    # zero-mean, so a single-sided output would mean broken hashing)
    assert 0 < a["keep"].sum() < len(a)


def test_quality_classifier_empty_and_order_invariance(spark):
    from meilisearch_thai_spark.pipeline.webtext import quality_classifier

    df = spark.createDataFrame(
        [(1, ""), (2, "good text here"), (3, "here text good")], ["doc_id", "text"]
    )
    got = {r["doc_key"]: (r["logit"], r["keep"]) for r in
           quality_classifier(df, "doc_id", "text").collect()}
    assert got[1] == (0.0, True)  # empty doc: neutral, gate by length upstream
    # bag-of-words model: token order cannot change the score
    assert got[2] == got[3]


def test_length_quantiles_labels_not_float_truncated(spark):
    from meilisearch_thai_spark.pipeline.textstats import (
        length_quantiles,
        length_quantiles_sql,
    )

    df = spark.createDataFrame([("g", i) for i in range(1, 6)], ["src", "n"])
    cols = length_quantiles(df, "src", "n", qs=(0.29, 0.57)).columns
    assert "p29" in cols and "p57" in cols  # int(0.29*100) would give p28
    sql = length_quantiles_sql("t", "src", "n", qs=(0.29, 0.57))
    assert "p29" in sql and "p57" in sql


def test_dedup_lines_global_first_occurrence_wins_across_docs(spark):
    from meilisearch_thai_spark.pipeline.webtext import dedup_lines_global

    df = spark.createDataFrame(
        [
            (1, "nav\nalpha\nnav"),    # first 'nav' wins; within-doc repeat dies
            (2, "nav\nbeta"),          # cross-doc repeat dies
            (3, "gamma\nbeta"),        # 'beta' already owned by doc 2
            (4, "nav"),                # loses everything → empty, still present
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_key"]: r["text"] for r in
           dedup_lines_global(df, "doc_id", "text").collect()}
    assert got == {1: "nav\nalpha", 2: "beta", 3: "gamma", 4: ""}


def test_dedup_lines_global_duckdb_parity(spark, sf_dir):
    import duckdb

    from pyspark.sql import functions as F

    from meilisearch_thai_spark.pipeline.webtext import (
        dedup_lines_global,
        dedup_lines_global_sql,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    messy = docs.select(
        "doc_id",
        F.concat(F.lit("shared header\n"), F.col("text"), F.lit("\nshared footer")).alias("text"),
    )
    a = (
        dedup_lines_global(messy, "doc_id", "text")
        .toPandas().sort_values("doc_key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    b = con.execute(
        dedup_lines_global_sql(
            "(SELECT doc_id, 'shared header' || chr(10) || text || chr(10) || "
            "'shared footer' AS text FROM documents) m",
            "doc_id",
            "text",
        )
    ).df().sort_values("doc_key").reset_index(drop=True)
    assert (a["text"].values == b["text"].values).all()
    # the injected header/footer survive exactly once, in the lowest doc_id
    first = a.iloc[0]["text"]
    assert "shared header" in first and "shared header" not in a.iloc[1]["text"]


def test_quality_buckets_ntile_deterministic(spark):
    from meilisearch_thai_spark.pipeline.webtext import quality_buckets

    rows = [("d1", -2.0), ("d2", -1.0), ("d3", -3.0), ("d4", -1.0), ("d5", -4.0)]
    scored = spark.createDataFrame(rows, ["doc_key", "mean_logprob"])
    out = {r.doc_key: r.bucket for r in quality_buckets(scored, n_buckets=2).collect()}
    # order: d2(-1) d4(-1, doc_key tie-break) d1(-2) d3(-3) d5(-4);
    # NTILE(2) over 5 rows → leading bucket gets 3
    assert out == {"d2": 1, "d4": 1, "d1": 1, "d3": 2, "d5": 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quality_buckets(scored, n_buckets=0)


# ---------------------------------------------------------------- repetition
def _rep(spark, rows):
    out = wt.repetition_signals(_docs(spark, rows), "id", "text")
    return {r.doc_key: r for r in out.collect()}


def test_repetition_top_and_dup_ngrams(spark):
    # "a b" * 4 — 8 tokens of len 1, joined length 15
    out = _rep(spark, [(1, "a b a b a b a b")])[1]
    assert out.top_2gram_char_bp == 8000   # "a b" x4, cover 4*3=12 / 15
    assert out.top_3gram_char_bp == 10000  # "a b a"/"b a b" x3, 15/15
    assert out.top_4gram_char_bp == 10000  # capped (3*7=21 > 15)
    assert out.dup_5gram_char_bp == 10000  # capped (2 dup grams, 18 > 15)
    assert out.dup_10gram_char_bp == 0     # only 8 tokens, no 10-grams
    assert out.dup_line_char_bp == 0 and out.dup_para_bp == 0
    assert not out.repetition_pass


def test_repetition_duplicate_paragraphs_and_lines(spark):
    out = _rep(spark, [(2, "para one text\n\npara one text\n\nunique bit")])[2]
    assert out.dup_para_bp == 3333        # 1 dup of 3 paras
    assert out.dup_para_char_bp == 3611   # 13 dup chars / 36
    # lines: the dup "para one text" pair + two '' separators (0 chars)
    assert out.dup_line_char_bp == 3611
    assert not out.repetition_pass


def test_repetition_clean_and_empty_docs(spark):
    rows = [(3, " ".join(f"w{i}" for i in range(60))), (4, "")]
    out = _rep(spark, rows)
    clean = out[3]
    assert clean.repetition_pass
    assert clean.dup_line_char_bp == 0 and clean.dup_5gram_char_bp == 0
    assert 0 < clean.top_2gram_char_bp < 500  # count-1 top gram, tiny cover
    empty = out[4]
    # all-zero signals: repetition has nothing to say about an empty doc
    # (gopher_quality's min_words rule is what rejects it)
    assert empty.repetition_pass and empty.top_2gram_char_bp == 0


def test_repetition_tiebreak_and_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    rows = [
        (1, "a b a b a b a b"),
        (2, "para one text\n\npara one text\n\nunique bit"),
        (3, " ".join(f"w{i}" for i in range(60))),
        (4, ""),
        # count/length tie between "b c" and "a c" — value-desc tie-break
        (5, "b c x b c y a c z a c w"),
        # Thai (multi-byte) + blank-line runs + duplicate Thai lines
        (6, "สวัสดี ครับ\n\n\nสวัสดี ครับ\nสวัสดี ครับ"),
    ]
    a = (
        wt.repetition_signals(_docs(spark, rows), "id", "text")
        .toPandas().sort_values("doc_key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["id", "text"]))
    b = (
        con.execute(wt.repetition_signals_sql("docs", "id", "text"))
        .df().sort_values("doc_key").reset_index(drop=True)
    )
    cols = sorted(c for c in a.columns)
    assert cols == sorted(b.columns)
    for c in cols:
        assert list(a[c]) == list(b[c]), c


def test_para_dedup_global_first_occurrence_wins(spark):
    rows = [
        (1, "license block\n\nunique one"),
        (2, "license block\n\nunique two\n\nlicense block"),
        (3, "unique three"),
    ]
    out = {
        r.doc_key: r.text
        for r in wt.dedup_lines_global(_docs(spark, rows), "id", "text", unit="paragraph").collect()
    }
    assert out[1] == "license block\n\nunique one"
    # both later copies of the license paragraph vanish (cross-doc AND
    # within-doc); lines inside surviving paragraphs are untouched
    assert out[2] == "unique two"
    assert out[3] == "unique three"


def test_para_dedup_global_duckdb_parity(spark):
    import duckdb
    import pandas as pd

    rows = [
        (1, "license block\n\nunique one"),
        (2, "license block\n\nunique two\n\nlicense block"),
        (3, "unique three"),
        (4, ""),
        (5, "a\nb\n\na\nb"),  # dup paragraph that line grain would shred
    ]
    a = (
        wt.dedup_lines_global(_docs(spark, rows), "id", "text", unit="paragraph")
        .toPandas().sort_values("doc_key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["id", "text"]))
    b = (
        con.execute(wt.dedup_lines_global_sql("docs", "id", "text", unit="paragraph"))
        .df().sort_values("doc_key").reset_index(drop=True)
    )
    assert list(a["text"]) == list(b["text"])
    assert a.loc[4, "text"] == "a\nb"  # whole-paragraph dedup, lines intact


@pytest.mark.parametrize("seed", [0, 1])
def test_repetition_randomized_batch_parity(spark, seed):
    """Randomized multi-line texts (repeats injected at line/para/gram
    grain, Thai + Latin, blank-line runs), Spark folds vs DuckDB
    unnest+GROUP BY in one batch job."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(seed)
    words = ["a", "bb", "ccc", "กขค", "dd", "e", "ฟหก", "gg"]
    rows = []
    for i in range(30):
        toks = [rng.choice(words) for _ in range(rng.randint(0, 40))]
        if toks and rng.random() < 0.7:  # inject gram-level repetition
            seg = toks[: rng.randint(1, min(6, len(toks)))]
            toks = toks + seg * rng.randint(1, 3)
        text = " ".join(toks)
        if rng.random() < 0.6:  # break into lines / paragraphs
            parts = [text[k::3] for k in range(3)]
            sep = rng.choice(["\n", "\n\n", "\n\n\n"])
            text = sep.join(parts + ([parts[0]] if rng.random() < 0.5 else []))
        rows.append((i, text))
    a = (
        wt.repetition_signals(_docs(spark, rows), "id", "text")
        .toPandas().sort_values("doc_key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("rdocs", pd.DataFrame(rows, columns=["id", "text"]))
    b = (
        con.execute(wt.repetition_signals_sql("rdocs", "id", "text"))
        .df().sort_values("doc_key").reset_index(drop=True)
    )
    for c in a.columns:
        assert list(a[c]) == list(b[c]), f"seed={seed} col={c}"


def test_train_quality_classifier_separates_and_generalizes(spark):
    """The trainer must learn to separate two disjoint vocabularies and
    the trained-inference path must agree with the learned weights on
    held-out docs (DCLM shape: seed-set training, corpus filtering)."""
    import random

    from meilisearch_thai_spark.pipeline.webtext import (
        quality_classifier_trained,
        train_quality_classifier,
    )

    rng = random.Random(3)
    good_vocab = [f"good{i}" for i in range(30)]
    bad_vocab = [f"bad{i}" for i in range(30)]

    def doc(vocab):
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 15)))

    rows = [(i, doc(good_vocab), 1) for i in range(40)] + [
        (100 + i, doc(bad_vocab), 0) for i in range(40)
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = train_quality_classifier(
        train, "doc_id", "text", "label", n_buckets=256, epochs=15, lr=4.0
    )
    assert len(w) == 256 and any(v != 0.0 for v in w)
    # train accuracy
    scored = {
        r["doc_key"]: r["keep"]
        for r in quality_classifier_trained(
            train, "doc_id", "text", w, b, seed="qc"
        ).collect()
    }
    acc = sum(
        1 for i, _t, y in rows if scored[i] == bool(y)
    ) / len(rows)
    assert acc >= 0.95, acc
    # held-out docs from the same vocabularies generalize
    held = spark.createDataFrame(
        [(1000 + i, doc(good_vocab), 1) for i in range(10)]
        + [(2000 + i, doc(bad_vocab), 0) for i in range(10)],
        "doc_id long, text string, label int",
    )
    hs = {
        r["doc_key"]: r["keep"]
        for r in quality_classifier_trained(
            held, "doc_id", "text", w, b, seed="qc"
        ).collect()
    }
    hacc = sum(1 for r in held.collect() if hs[r["doc_id"]] == bool(r["label"])) / 20
    assert hacc >= 0.9, hacc


def test_quality_classifier_frozen_parity_and_separation(spark):
    """The deployable frozen form: integer milli-quantized trained weights
    must (a) keep the trainer's separation, (b) agree with the float
    inference path on decisions, and (c) match the DuckDB twin
    bit-for-bit (the property the float path cannot guarantee)."""
    import random

    import duckdb

    from meilisearch_thai_spark.pipeline.webtext import (
        freeze_classifier_weights,
        quality_classifier_frozen,
        quality_classifier_frozen_sql,
        quality_classifier_trained,
        train_quality_classifier,
    )

    rng = random.Random(7)
    good_vocab = [f"nice{i}" for i in range(25)]
    bad_vocab = [f"junk{i}" for i in range(25)]

    def doc(vocab):
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 20)))

    rows = [(i, doc(good_vocab), 1) for i in range(30)] + [
        (100 + i, doc(bad_vocab), 0) for i in range(30)
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = train_quality_classifier(
        train, "doc_id", "text", "label", n_buckets=64, epochs=15, lr=4.0
    )
    mw, mb = freeze_classifier_weights(w, b)
    assert len(mw) == 64 and any(v != 0 for v in mw)

    frozen = quality_classifier_frozen(train, "doc_id", "text", mw, mb).collect()
    keeps = {r["doc_key"]: r["keep"] for r in frozen}
    acc = sum(1 for i, _t, y in rows if keeps[i] == bool(y)) / len(rows)
    assert acc >= 0.95, acc

    # quantized decisions track the float path (1e-3 quantization noise
    # cannot flip a confidently-separated seed set)
    float_keeps = {
        r["doc_key"]: r["keep"]
        for r in quality_classifier_trained(train, "doc_id", "text", w, b).collect()
    }
    agree = sum(1 for k in keeps if keeps[k] == float_keeps[k]) / len(keeps)
    assert agree >= 0.95, agree

    # bit-identical DuckDB twin (logit AND keep)
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR, label INT)")
    con.executemany("INSERT INTO d VALUES (?,?,?)", rows)
    oracle = {
        k: (float(lg), bool(kp))
        for k, lg, kp in con.execute(
            quality_classifier_frozen_sql("d", "doc_id", "text", mw, mb)
        ).fetchall()
    }
    got = {r["doc_key"]: (float(r["logit"]), bool(r["keep"])) for r in frozen}
    assert got == oracle

    # the committed driver literals reproduce their recorded separation on
    # the generator's own seed set (guards against stale frozen weights)
    import __spark_entry__ as entry
    from scripts.train_qc_weights import labeled_rows

    seed_df = spark.createDataFrame(
        labeled_rows(), "doc_id long, text string, label int"
    )
    sk = {
        r["doc_key"]: r["keep"]
        for r in quality_classifier_frozen(
            seed_df, "doc_id", "text",
            entry._QC_TRAINED_MILLI, entry._QC_TRAINED_BIAS_MILLI,
        ).collect()
    }
    sacc = sum(
        1 for r in seed_df.collect() if sk[r["doc_id"]] == bool(r["label"])
    ) / seed_df.count()
    assert sacc >= 0.98, sacc


def test_train_quality_classifier_validation(spark):
    import pytest as _pytest

    from meilisearch_thai_spark.pipeline.webtext import train_quality_classifier

    df = spark.createDataFrame([(1, "a", 1)], "doc_id long, text string, label int")
    with _pytest.raises(ValueError, match="at least one epoch"):
        train_quality_classifier(df, "doc_id", "text", "label", epochs=0)


def test_extract_html_metadata_order_case_and_parity(spark):
    import duckdb
    import pandas as pd

    from meilisearch_thai_spark.pipeline.webtext import (
        extract_html_metadata,
        extract_html_metadata_sql,
        extract_html_text,
    )

    rows = [
        (1, '<html lang="TH-th"><head><title> Page &amp; One </title>'
            '<meta content="Desc &quot;here&quot;" name="description">'  # attr order flipped
            '<LINK REL="canonical" HREF=" https://ex.com/one?a=1&amp;b=2 ">'  # case + pad + entity
            "<meta property='og:title' content='OG One'>"                 # single quotes
            '<meta name="robots" content="NOINDEX, nofollow">'
            '</head><body>x</body></html>'),
        (2, '<html><body>no head metadata at all</body></html>'),
        (3, None),
        (4, "<html lang=th><head><meta name='robots' content='none'>"     # unquoted lang,
            '</head><body>y</body></html>'),                              # 'none' directive
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_key"]: r.asDict() for r in extract_html_metadata(df, "doc_id", "html").collect()}
    assert got[1]["title"] == "Page & One"
    assert got[1]["description"] == 'Desc "here"'
    assert got[1]["canonical"] == "https://ex.com/one?a=1&b=2"  # decoded + trimmed
    assert got[1]["og_title"] == "OG One"
    assert got[1]["html_lang"] == "th-th"
    assert got[1]["noindex"] is True
    assert got[2]["description"] == "" and got[2]["noindex"] is False
    assert got[3]["title"] == "" and got[3]["html_lang"] == ""
    assert got[4]["html_lang"] == "th" and got[4]["noindex"] is True
    # title agrees byte-for-byte with the body-text extractor's title
    t = {r["doc_key"]: r["title"] for r in extract_html_text(df, "doc_id", "html").collect()}
    assert t[1] == got[1]["title"]
    # DuckDB twin
    con = duckdb.connect()
    con.register("pages_md", pd.DataFrame(rows, columns=["doc_id", "html"]))
    b = con.execute(
        extract_html_metadata_sql("pages_md", "doc_id", "html")
    ).df().sort_values("doc_key")
    for _, row in b.iterrows():
        g = got[row["doc_key"]]
        for c in ["title", "description", "canonical", "og_title", "html_lang", "noindex"]:
            assert g[c] == row[c], (row["doc_key"], c)


def test_extract_html_metadata_randomized_batch_parity(spark):
    """Randomized head soup (attribute order, quote style, case, entities,
    missing tags), Spark vs DuckDB in one batch."""
    import random

    import duckdb
    import pandas as pd

    from meilisearch_thai_spark.pipeline.webtext import (
        extract_html_metadata,
        extract_html_metadata_sql,
    )

    rng = random.Random(7)

    def tag(name_attr, name_val, val_attr, val):
        q = rng.choice(['"', "'"])
        parts = [f'{name_attr}={q}{name_val}{q}', f'{val_attr}={q}{val}{q}']
        rng.shuffle(parts)
        t = "meta" if name_attr in ("name", "property") else "link"
        return f"<{t} {' '.join(parts)}>"

    rows = []
    for i in range(30):
        bits = []
        if rng.random() < 0.7:
            bits.append(f"<title>T{i} &amp; co</title>")
        if rng.random() < 0.6:
            bits.append(tag("name", "description", "content", f"D{i} &quot;x&quot;"))
        if rng.random() < 0.5:
            bits.append(tag("rel", "canonical", "href", f" https://e{i}.com/?a=1&amp;b={i} "))
        if rng.random() < 0.5:
            bits.append(tag("property", "og:title", "content", f"OG{i}"))
        if rng.random() < 0.5:
            bits.append(
                tag("name", "robots", "content", rng.choice(["noindex", "none", "all", "nofollow"]))
            )
        rng.shuffle(bits)
        lang = rng.choice(['lang="en"', "lang='TH'", "lang=de", ""])
        rows.append((i, f"<html {lang}><head>{''.join(bits)}</head><body>b</body></html>"))
    df = spark.createDataFrame(rows, "doc_id long, html string")
    a = (
        extract_html_metadata(df, "doc_id", "html")
        .toPandas().sort_values("doc_key").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("soup", pd.DataFrame(rows, columns=["doc_id", "html"]))
    b = con.execute(
        extract_html_metadata_sql("soup", "doc_id", "html")
    ).df().sort_values("doc_key").reset_index(drop=True)
    assert len(a) == 30
    for c in ["title", "description", "canonical", "og_title", "html_lang", "noindex"]:
        assert list(a[c]) == list(b[c]), c
