"""Index-settings updates without a rebuild — the reference's settings
manager surface (src/meilisearch_integration/settings_manager.py:
``add_synonyms`` :226-249, ``update_stop_words`` :274-283,
``export_config`` :334-350) re-expressed over the on-disk ``meta.json``.

Synonyms and stop-words are QUERY-TIME settings here (MeiliSearch applies
both at search time for queries; our build additionally drops build-time
stop-words from the posting stream).  That split decides what is updatable
in place:

- **synonyms**: pure query config — merge/replace freely; live engines pick
  the change up on :meth:`SearchEngine.refresh_index`.
- **stop-words**: ADDING words is a query-side drop (their postings remain
  until the next compaction, Lucene-style stats-until-rebuild);
  REMOVING a *build-time* stop-word is impossible without re-tokenizing
  (those postings were never written) and raises.
- **fields / field_weights**: index settings baked into ``block_max_score``
  at build (the pruning bound must stay exact) — not updatable here by
  design; rebuild instead.

All meta rewrites are atomic (tmp + ``os.replace``) and single-writer, the
same contract as ``maintenance.py``.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict

from .builder import IndexMeta, load_meta


def normalize_synonyms(raw: dict | None) -> dict[str, list[str]]:
    """Canonical keys normalized through the SAME pinned tokenizer the query
    side uses, so "Laptop" or a Thai compound matches the query's base
    terms; multi-word canonicals become space-joined term keys which
    ``generate_variants`` matches as contiguous term windows."""
    from ..tokenizer import extract_index_terms, tokenize_for_index

    syn: dict[str, list[str]] = {}
    for k, vs in (raw or {}).items():
        key = " ".join(extract_index_terms(tokenize_for_index(str(k))))
        alts = sorted({str(v).strip() for v in vs if str(v).strip()})
        if key and alts:
            syn.setdefault(key, [])
            syn[key] = sorted(set(syn[key]) | set(alts))
    return syn


def synonyms_fingerprint(syn: dict[str, list[str]]) -> str:
    if not syn:
        return ""
    return hashlib.sha256(
        "\n".join(f"{k}\t{'|'.join(vs)}" for k, vs in sorted(syn.items())).encode("utf-8")
    ).hexdigest()


def stopwords_fingerprint(words) -> str:
    if not words:
        return ""
    return hashlib.sha256("\n".join(sorted(words)).encode("utf-8")).hexdigest()


def _effective_dictionary_fingerprint(custom: list[str]) -> str:
    """SHA-256 of packaged ∪ overlay — what queries tokenize with after
    refresh; equals meta.dictionary_fingerprint when the overlay is empty
    and the postings are current."""
    from ..dictionary import load_base_words, load_compound_words

    words = load_base_words() | load_compound_words() | {
        w for w in (str(x).strip() for x in custom) if w
    }
    return hashlib.sha256("\n".join(sorted(words)).encode("utf-8")).hexdigest()


def _write_meta(index_dir: str, meta: IndexMeta) -> None:
    path = os.path.join(index_dir, "meta.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(asdict(meta), fh, indent=1)
    os.replace(tmp, path)


def update_synonyms(
    index_dir: str, synonym_map: dict[str, list[str]], merge: bool = True
) -> IndexMeta:
    """Merge (reference add_synonyms semantics: alternates union per
    canonical) or replace (``merge=False``; ``{}`` resets) the index's
    synonym setting.  Pure metadata — no posting data changes; call
    :meth:`SearchEngine.refresh_index` on live engines."""
    meta = load_meta(index_dir)
    incoming = normalize_synonyms(synonym_map)
    if merge:
        merged = dict(meta.synonyms or {})
        for k, vs in incoming.items():
            merged[k] = sorted(set(merged.get(k, [])) | set(vs))
        meta.synonyms = merged
    else:
        meta.synonyms = incoming
    meta.synonyms_fingerprint = synonyms_fingerprint(meta.synonyms)
    _write_meta(index_dir, meta)
    return meta


def update_stop_words(index_dir: str, stop_words: list[str]) -> IndexMeta:
    """Replace the query-effective stop-word list.

    Words present at BUILD time have no postings (the build dropped them
    from the posting stream); removing one of those from the list would
    make its queries silently return nothing, so that raises with rebuild
    guidance.  Newly added words are dropped query-side immediately; their
    postings linger until the next compaction/rebuild (documented
    stats-until-rebuild semantics, same as deletes)."""
    meta = load_meta(index_dir)
    new = sorted({str(w).strip() for w in stop_words if str(w).strip()})
    build = meta.stopwords_build if meta.stopwords_build is not None else list(meta.stopwords)
    unstoppable = sorted(set(build) - set(new))
    if unstoppable:
        raise ValueError(
            f"cannot un-stop build-time stop-words {unstoppable}: their "
            "postings were dropped at build — rebuild the index without them"
        )
    meta.stopwords_build = list(build)
    meta.stopwords = new
    meta.stopwords_fingerprint = stopwords_fingerprint(new)
    _write_meta(index_dir, meta)
    return meta


def update_dictionary(
    index_dir: str,
    add: list[str] | None = None,
    remove: list[str] | None = None,
    apply_runtime: bool = True,
) -> IndexMeta:
    """Runtime custom-dictionary management — the reference's most-used
    config endpoint family (src/api/endpoints/config.py:389-535
    ``add_dictionary_words`` / ``remove_dictionary_words`` /
    ``get_custom_dictionary``), re-expressed over the index's meta.json.

    Semantics (the wakame story: operators add a Thai compound word at
    runtime and searches start segmenting it as one token):

    - the overlay persists per-index in ``meta.custom_dictionary`` and is
      fingerprint-chained via ``export_settings()['effective_dictionary_
      fingerprint']``;
    - with ``apply_runtime`` (default) the overlay is applied to THIS
      process's tokenizer immediately (``dictionary.set_custom_words``), so
      query-side tokenization — and any live engine after
      :meth:`SearchEngine.refresh_index` — picks the words up at once;
    - DOCUMENTS keep their build-time tokenization until re-routed through
      the ``add_documents`` retokenize path: call
      :func:`reprocess_documents` with the affected pages (staged layouts),
      or rebuild (classic ``build_index`` layouts — ``reprocess_documents``
      raises with that guidance).  ``meta.dictionary_fingerprint`` keeps
      recording what the current POSTINGS were tokenized with;
    - removing a PACKAGED (base/compound) word raises — the packaged
      dictionary is the pinned byte-identity contract; only overlay words
      round-trip.  Removing a word not in the overlay is an idempotent
      no-op, like deleting an absent document.
    """
    from ..dictionary import (
        load_base_words,
        load_compound_words,
        set_custom_words,
    )

    meta = load_meta(index_dir)
    current = set(meta.custom_dictionary or [])
    add_set = {w for w in (str(x).strip() for x in (add or [])) if w}
    rm_set = {w for w in (str(x).strip() for x in (remove or [])) if w}
    both = sorted(add_set & rm_set)
    if both:
        raise ValueError(f"words {both} appear in both add= and remove=")
    pinned = sorted(rm_set & (load_base_words() | load_compound_words()))
    if pinned:
        raise ValueError(
            f"cannot remove packaged dictionary words {pinned}: the base "
            "vocabulary and compound dictionary are the pinned tokenization "
            "contract — only runtime overlay words are removable"
        )
    meta.custom_dictionary = sorted((current | add_set) - rm_set)
    _write_meta(index_dir, meta)
    if apply_runtime:
        set_custom_words(meta.custom_dictionary)
    return meta


def get_custom_dictionary(index_dir: str) -> list[str]:
    """The index's persisted overlay words (reference
    ``get_custom_dictionary``)."""
    return list(load_meta(index_dir).custom_dictionary or [])


def reprocess_documents(spark, pages, index_dir: str, **add_kwargs) -> IndexMeta:
    """Route documents through the existing ``add_documents`` retokenize
    path AFTER a dictionary update, so their postings reflect the new
    effective dictionary (re-adding a url overwrites its document —
    MeiliSearch update-by-primary-key semantics).

    Applies the index's persisted overlay to this process first, so the
    delta tokenizes with exactly the dictionary ``update_dictionary`` wrote.
    On a classic ``build_index`` layout (no tf/ staging area)
    ``add_documents`` raises with rebuild guidance — that error IS the
    documented answer for non-incremental indexes.
    """
    from ..dictionary import set_custom_words
    from ..streaming.ingest import add_documents

    meta = load_meta(index_dir)
    set_custom_words(meta.custom_dictionary or [])
    out = add_documents(spark, pages, index_dir, **add_kwargs)
    return out if out is not None else meta


def export_settings(index_dir: str) -> dict:
    """The reference's ``export_config`` (:334-350): the full settings view
    of an index, for diffing/migration tooling."""
    meta = load_meta(index_dir)
    return {
        "k1": meta.k1,
        "b": meta.b,
        "stop_words": list(meta.stopwords),
        "stop_words_build": list(
            meta.stopwords_build if meta.stopwords_build is not None else meta.stopwords
        ),
        "synonyms": {k: list(v) for k, v in (meta.synonyms or {}).items()},
        "fields": list(meta.fields),
        "field_weights": list(meta.field_weights),
        "stored_fields": list(meta.stored_fields),
        "positional": meta.positional,
        "dictionary_fingerprint": meta.dictionary_fingerprint,
        "custom_dictionary": list(meta.custom_dictionary or []),
        "effective_dictionary_fingerprint": _effective_dictionary_fingerprint(
            meta.custom_dictionary or []
        ),
        "stopwords_fingerprint": meta.stopwords_fingerprint,
        "synonyms_fingerprint": meta.synonyms_fingerprint,
        "typo_tolerance": {**TYPO_DEFAULTS, **(meta.typo_tolerance or {})},
        # None = permissive undeclared mode (see IndexMeta)
        "filterable_attributes": getattr(meta, "filterable_attributes", None),
        "sortable_attributes": getattr(meta, "sortable_attributes", None),
        # None = permissive uncapped mode (MeiliSearch defaults: 1000 / 100)
        "pagination": getattr(meta, "pagination", None),
        "faceting": getattr(meta, "faceting", None),
        "facet_search": getattr(meta, "facet_search", True),
        "prefix_search": getattr(meta, "prefix_search", True),
    }


def index_stats(spark, index_dir: str) -> dict:
    """MeiliSearch ``GET /indexes/:uid/stats`` parity: document count,
    whether a (compaction) write is in flight, and ``fieldDistribution`` —
    per public document field, how many documents carry a non-null value.

    The distribution is ONE exchange-free pass over doc_stats (count +
    per-field conditional sums, partial-aggregated); the collected result is
    a single row.  ``isIndexing`` maps to the ``_COMPACTING`` marker — the
    only in-flight mutation this layout exposes (builds/finalizes are
    whole-directory swaps, visible only on completion).
    """
    import os as _os

    from pyspark.sql import functions as F

    compacting = _os.path.exists(_os.path.join(index_dir, "_COMPACTING"))
    if compacting:
        # load_meta refuses mid-compaction (crash-loud read contract);
        # stats answer the cheap liveness question without touching tables
        return {"numberOfDocuments": None, "isIndexing": True, "fieldDistribution": {}}
    meta = load_meta(index_dir)
    ds = spark.read.parquet(_os.path.join(index_dir, "doc_stats"))
    public = meta.public_fields(ds.columns)
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.when(F.col(f).isNotNull(), 1).otherwise(0)).cast("long").alias(f)
        for f in public
    ]
    row = ds.agg(*aggs).collect()[0]
    return {
        "numberOfDocuments": int(row["_n"]),
        "isIndexing": False,
        "fieldDistribution": {f: int(row[f]) for f in public},
    }


TYPO_DEFAULTS = {"enabled": True, "one_typo": 5, "two_typos": 9, "disable_on_words": []}


def update_typo_tolerance(
    index_dir: str,
    enabled: bool | None = None,
    one_typo: int | None = None,
    two_typos: int | None = None,
    disable_on_words: list[str] | None = None,
) -> IndexMeta:
    """MeiliSearch ``typoTolerance`` setting (enabled, minWordSizeForTypos
    oneTypo/twoTypos, disableOnWords) — a query-side knob like synonyms and
    stop-words: stored in meta.json, applied by ``expand_terms_fuzzy``, no
    index rewrite.  Unset arguments keep their current (or default) value;
    live engines pick the change up on reconstruction/refresh_index."""
    meta = load_meta(index_dir)
    cfg = {**TYPO_DEFAULTS, **(meta.typo_tolerance or {})}
    if enabled is not None:
        cfg["enabled"] = bool(enabled)
    if one_typo is not None:
        cfg["one_typo"] = int(one_typo)
    if two_typos is not None:
        cfg["two_typos"] = int(two_typos)
    if disable_on_words is not None:
        cfg["disable_on_words"] = sorted({w.lower() for w in disable_on_words})
    if cfg["one_typo"] < 1 or cfg["two_typos"] < cfg["one_typo"]:
        raise ValueError(
            f"minWordSizeForTypos must satisfy 1 <= oneTypo <= twoTypos, got "
            f"{cfg['one_typo']}/{cfg['two_typos']}"
        )
    meta.typo_tolerance = cfg
    _write_meta(index_dir, meta)
    return meta


def update_pagination(index_dir: str, max_total_hits: int | None) -> IndexMeta:
    """MeiliSearch ``pagination.maxTotalHits`` (their default: 1000): the
    deepest row the offset/limit window may reach — the guardrail that keeps
    deep offset pagination from growing every executor's top-(offset+limit)
    heap (the exhaustive-export path is ``search_after``, which this cap
    deliberately does NOT govern).  ``None`` resets to the permissive
    uncapped mode (drop-in compat, like the attribute declarations)."""
    meta = load_meta(index_dir)
    if max_total_hits is not None:
        if int(max_total_hits) < 1:
            raise ValueError(f"maxTotalHits must be >= 1, got {max_total_hits}")
        meta.pagination = {"max_total_hits": int(max_total_hits)}
    else:
        meta.pagination = None
    _write_meta(index_dir, meta)
    return meta


def update_faceting(index_dir: str, max_values_per_facet: int | None) -> IndexMeta:
    """MeiliSearch ``faceting.maxValuesPerFacet`` (their default: 100): cap
    on distinct values returned per facet by ``facet_distribution`` when the
    call does not pass an explicit ``max_values_per_facet``.  ``None`` =
    uncapped permissive mode."""
    meta = load_meta(index_dir)
    if max_values_per_facet is not None:
        if int(max_values_per_facet) < 1:
            raise ValueError(
                f"maxValuesPerFacet must be >= 1, got {max_values_per_facet}"
            )
        meta.faceting = {"max_values_per_facet": int(max_values_per_facet)}
    else:
        meta.faceting = None
    _write_meta(index_dir, meta)
    return meta


def update_facet_search(index_dir: str, enabled: bool) -> IndexMeta:
    """MeiliSearch v1.12 ``facetSearch`` toggle: disabling it turns
    ``SearchEngine.facet_search`` into a request error (their 400)."""
    meta = load_meta(index_dir)
    meta.facet_search = bool(enabled)
    _write_meta(index_dir, meta)
    return meta


def update_prefix_search(index_dir: str, enabled: bool) -> IndexMeta:
    """MeiliSearch v1.12 ``prefixSearch`` toggle (their values:
    indexingTime|disabled; this engine expands prefixes query-side, so the
    toggle gates ``SearchEngine.search_prefix``)."""
    meta = load_meta(index_dir)
    meta.prefix_search = bool(enabled)
    _write_meta(index_dir, meta)
    return meta


def update_filterable_attributes(index_dir: str, attrs: list[str] | None) -> IndexMeta:
    """MeiliSearch ``filterableAttributes``: declare which document fields
    may appear in search filters.  ``None`` resets to undeclared mode (all
    stored fields filterable — see IndexMeta).  Declared names are validated
    against the stored public fields up front, so a typo'd declaration fails
    here, not on the first query."""
    meta = load_meta(index_dir)
    if attrs is not None:
        public = set(meta.public_fields(_doc_stats_columns(index_dir))) | {"doc_len"}
        public |= _geo_declarable(index_dir)
        bad = sorted(set(attrs) - public)
        if bad:
            raise ValueError(
                f"filterableAttributes {bad} are not stored document fields"
            )
        attrs = sorted(set(attrs))
    meta.filterable_attributes = attrs
    _write_meta(index_dir, meta)
    return meta


def _geo_declarable(index_dir: str) -> set[str]:
    """The reserved ``_geo`` name is declarable exactly when the index
    stores geo metadata (MeiliSearch: ``_geo`` in filterable/sortable
    attributes enables `_geoRadius`/`_geoBoundingBox`/`_geoPoint`)."""
    return {"_geo"} if {"lat", "lng"} <= set(_doc_stats_columns(index_dir)) else set()


def _doc_stats_columns(index_dir: str) -> list[str]:
    """doc_stats column names without a Spark session (pyarrow schema read) —
    lets the settings declarations gate url/lang/text_crop on what the index
    ACTUALLY stores, so a declaration of an absent column fails at the
    update, not on the first query."""
    import pyarrow.dataset as pads

    return pads.dataset(os.path.join(index_dir, "doc_stats")).schema.names


def update_sortable_attributes(index_dir: str, attrs: list[str] | None) -> IndexMeta:
    """MeiliSearch ``sortableAttributes`` — same contract as
    :func:`update_filterable_attributes`, governing ``sort=`` fields."""
    meta = load_meta(index_dir)
    if attrs is not None:
        public = set(meta.public_fields(_doc_stats_columns(index_dir))) | {
            "doc_len",
            "doc_id",
        }
        public |= _geo_declarable(index_dir)
        bad = sorted(set(attrs) - public)
        if bad:
            raise ValueError(
                f"sortableAttributes {bad} are not stored document fields"
            )
        attrs = sorted(set(attrs))
    meta.sortable_attributes = attrs
    _write_meta(index_dir, meta)
    return meta
