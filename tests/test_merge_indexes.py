"""Index merging (the Lucene segment-merge analogue): merge(build(A),
build(B)) must equal build(A ∪ B) table-for-table — ids re-ranked, stats
recomputed, blocks re-encoded with exact block-max bounds — all WITHOUT
retokenizing.  Reference has no merge (MeiliSearch rebuilds); semantics
anchor to build_index equality instead."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meilisearch_thai_spark.index.builder import build_index, load_meta
from meilisearch_thai_spark.index.maintenance import delete_docs, merge_indexes
from meilisearch_thai_spark.query.executor import SearchEngine
from meilisearch_thai_spark.sources.pages import generate_pages


def _split(pages):
    h = F.crc32(F.col("url")) % 2
    return pages.filter(h == 0), pages.filter(h == 1)


def _table(spark, d, name, sort_cols):
    df = spark.read.parquet(os.path.join(d, name))
    # binary posting-block columns can't round-trip through pandas str —
    # hash them Spark-side (equality of hashes == equality of bytes)
    sel = [
        F.sha2(F.col(f.name), 256).alias(f.name) if f.dataType.typeName() == "binary" else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*sel).orderBy(*sort_cols).toPandas().reset_index(drop=True)


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("merge")
    pages = generate_pages(spark, 400, seed=31)
    a, b = _split(pages)
    build_index(spark, a, str(root / "a"))
    build_index(spark, b, str(root / "b"))
    build_index(spark, pages, str(root / "ref"))
    merge_indexes(spark, [str(root / "a"), str(root / "b")], str(root / "m"))
    return root


def test_merged_tables_equal_fresh_build(spark, dirs):
    for name, sort_cols in (
        ("doc_stats", ["doc_id"]),
        ("postings", ["term", "bucket", "block_id"]),
    ):
        got = _table(spark, str(dirs / "m"), name, sort_cols)
        want = _table(spark, str(dirs / "ref"), name, sort_cols)
        got, want = got[sorted(got.columns)], want[sorted(want.columns)]
        assert got.shape == want.shape
        assert (got.astype(str).values == want.astype(str).values).all(), name


def test_merged_meta_equals_fresh_build(dirs):
    m, ref = load_meta(str(dirs / "m")), load_meta(str(dirs / "ref"))
    assert (m.n_docs, m.n_terms, m.n_postings) == (ref.n_docs, ref.n_terms, ref.n_postings)
    assert m.avgdl == pytest.approx(ref.avgdl)


def test_merged_search_identical(spark, dirs):
    em = SearchEngine(spark, str(dirs / "m"))
    er = SearchEngine(spark, str(dirs / "ref"))
    for q in ["เทคโนโลยี", "อาหารไทย", "ปัญญาประดิษฐ์"]:
        got = [(r["url"], round(r["score"], 6)) for r in em.search(q, k=10).collect()]
        want = [(r["url"], round(r["score"], 6)) for r in er.search(q, k=10).collect()]
        assert got == want and got


def test_merge_applies_source_tombstones(spark, tmp_path):
    pages = generate_pages(spark, 120, seed=7)
    a, b = _split(pages)
    da, db, dm = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    build_index(spark, a, da)
    build_index(spark, b, db)
    victim = a.select("url").orderBy("url").limit(1).collect()[0]["url"]
    delete_docs(spark, da, [victim])
    merge_indexes(spark, [da, db], dm)
    ds = spark.read.parquet(os.path.join(dm, "doc_stats"))
    assert ds.filter(F.col("url") == victim).count() == 0
    assert load_meta(dm).n_docs == pages.count() - 1


def test_merge_validations(spark, tmp_path):
    pages = generate_pages(spark, 80, seed=3)
    a, b = _split(pages)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, da)
    build_index(spark, b, db)
    with pytest.raises(ValueError, match=">=2 sources"):
        merge_indexes(spark, [da], str(tmp_path / "x"))
    # out_dir exists
    os.makedirs(str(tmp_path / "y"))
    with pytest.raises(ValueError, match="already exists"):
        merge_indexes(spark, [da, db], str(tmp_path / "y"))
    # incompatible settings (different k1)
    from meilisearch_thai_spark.index.builder import BM25Params

    dc = str(tmp_path / "c")
    build_index(spark, b, dc, params=BM25Params(k1=0.9))
    with pytest.raises(ValueError, match="k1"):
        merge_indexes(spark, [da, dc], str(tmp_path / "z"))
    # overlapping urls
    dd = str(tmp_path / "d")
    build_index(spark, a, dd)
    with pytest.raises(ValueError, match="share urls"):
        merge_indexes(spark, [da, dd], str(tmp_path / "w"))


def test_merge_refuses_all_tombstoned(spark, tmp_path):
    pages = generate_pages(spark, 40, seed=5)
    a, b = _split(pages)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, da)
    build_index(spark, b, db)
    delete_docs(spark, da, [r["url"] for r in a.select("url").collect()])
    delete_docs(spark, db, [r["url"] for r in b.select("url").collect()])
    with pytest.raises(ValueError, match="nothing to merge"):
        merge_indexes(spark, [da, db], str(tmp_path / "m"))
    assert not os.path.exists(str(tmp_path / "m"))  # no half-index left


def test_merge_refuses_doc_stats_schema_drift(spark, tmp_path):
    pages = generate_pages(spark, 40, seed=9)
    a, b = _split(pages)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, da, store_text_crop=100)
    build_index(spark, b, db)  # no crop -> doc_stats schema differs
    with pytest.raises(ValueError, match="doc_stats schemas"):
        merge_indexes(spark, [da, db], str(tmp_path / "m"))


def test_merge_refuses_unfinalized_staged_docs(spark, tmp_path):
    from meilisearch_thai_spark.streaming.ingest import add_documents

    pages = generate_pages(spark, 60, seed=13)
    a, b = _split(pages)
    extra = generate_pages(spark, 80, seed=13).subtract(pages)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    add_documents(spark, a, da, finalize=True)
    build_index(spark, b, db)
    # stage new docs WITHOUT finalizing: merging now would silently drop them
    add_documents(spark, extra.limit(5), da, finalize=False)
    with pytest.raises(ValueError, match="staged documents not yet finalized"):
        merge_indexes(spark, [da, db], str(tmp_path / "m"))
    # a FINALIZED staged-layout source merges fine
    from meilisearch_thai_spark.streaming.ingest import finalize_streamed_index

    finalize_streamed_index(spark, da)
    merge_indexes(spark, [da, db], str(tmp_path / "m"))
    assert os.path.exists(os.path.join(str(tmp_path / "m"), "meta.json"))


def test_merge_refuses_query_settings_drift(spark, tmp_path):
    from meilisearch_thai_spark.index.settings import update_typo_tolerance

    pages = generate_pages(spark, 40, seed=17)
    a, b = _split(pages)
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, da)
    build_index(spark, b, db)
    update_typo_tolerance(db, {"enabled": False})
    with pytest.raises(ValueError, match="typo_tolerance"):
        merge_indexes(spark, [da, db], str(tmp_path / "m"))
