"""Result enhancement + ranking algorithms (SURVEY §2.6-2.7: E1-E6, X7, R7-R9, S6).

These reproduce the reference's post-processing layer.  All E-ops run on the
collected top-k (tiny — k ≤ 100 rows), exactly as the reference runs them
per-response (src/search_proxy/services/result_enhancer.py); driver-side
Python here is the *right* altitude, not a compromise: shipping k rows to a
cluster job would cost more than the work.  The Spark-side twins used in the
driver contract (highlight extraction over a whole corpus) are Column
expressions.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from difflib import SequenceMatcher

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# E1 — highlight extraction (result_enhancer.py:93-99,375-390)
# ---------------------------------------------------------------------------

_HIGHLIGHT_PATTERNS = [
    re.compile(r"<em>(.*?)</em>", re.S),
    re.compile(r"<strong>(.*?)</strong>", re.S),
    re.compile(r"<mark>(.*?)</mark>", re.S),
    re.compile(r"\[HIGHLIGHT\](.*?)\[/HIGHLIGHT\]", re.S),
]


def extract_highlights(text: str) -> list[str]:
    """E1: pull highlighted fragments out of marked-up text."""
    out: list[str] = []
    for pat in _HIGHLIGHT_PATTERNS:
        out.extend(pat.findall(text or ""))
    return out


def highlights_column(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Spark twin of E1 for corpus-scale extraction: one regexp per marker,
    concatenated — stays in whole-stage codegen."""
    ems = F.regexp_extract_all(F.col(text_col), F.lit(r"<em>(.*?)</em>"), 1)
    strongs = F.regexp_extract_all(F.col(text_col), F.lit(r"<strong>(.*?)</strong>"), 1)
    marks = F.regexp_extract_all(F.col(text_col), F.lit(r"<mark>(.*?)</mark>"), 1)
    return df.select(
        F.col(id_col),
        F.concat(ems, strongs, marks).alias("highlights"),
        F.size(F.concat(ems, strongs, marks)).alias("n_highlights"),
    )


# ---------------------------------------------------------------------------
# E1b — highlight GENERATION + crop (search_executor.py:705-723 highlight
# config, :874-878 Thai crop-doubling; MeiliSearch _formatted semantics)
# ---------------------------------------------------------------------------

HIGHLIGHT_PRE = "<em>"
HIGHLIGHT_POST = "</em>"
CROP_MARKER = "…"
THAI_CROP_CAP = 400  # min(cropLength * 2, 400) — search_executor.py:877


def _term_pattern(term: str) -> str:
    """Regex for one term; Thai terms tolerate interleaved ZWSP (the
    tokenizer's joining artifact, SURVEY T9) so stored text highlights even
    when it carries U+200B boundaries."""
    from ..tokenizer import is_thai_char

    if any(is_thai_char(c) for c in term):
        return "\u200b?".join(re.escape(c) for c in term)
    return re.escape(term)


def _terms_regex(terms: list[str]) -> re.Pattern | None:
    terms = [t for t in dict.fromkeys(terms) if t and len(t) >= 2]
    if not terms:
        return None
    # longest-first alternation: a compound never gets shadowed (and then
    # re-marked inside) by one of its parts
    pat = "|".join(_term_pattern(t) for t in sorted(terms, key=len, reverse=True))
    return re.compile(f"({pat})", re.IGNORECASE)


def crop_and_highlight(
    text: str,
    terms: list[str],
    crop_length: int = 200,
    pre: str = HIGHLIGHT_PRE,
    post: str = HIGHLIGHT_POST,
    marker: str = CROP_MARKER,
    thai_crop_double: bool = True,
) -> tuple[str, list[str]]:
    """Generate the reference's ``_formatted`` view: ``(cropped text with
    <em> markers, matched fragments)``.

    The crop window is chosen on the UNMARKED text centered on the first
    match (head-crop when none), then markers are inserted inside the window
    only — tags can never be split by the crop.  Thai-dominant text doubles
    the crop window capped at 400 chars, reproducing the reference's
    adjustment for tokenized Thai variants."""
    from ..tokenizer import thai_ratio

    text = text or ""
    if thai_crop_double and thai_ratio(text) > 0.5:
        crop_length = min(crop_length * 2, THAI_CROP_CAP)
    rx = _terms_regex(terms)
    m = rx.search(text) if rx else None
    if m is None:
        window = text[:crop_length]
        cropped = window + (marker if len(text) > crop_length else "")
        return cropped, []
    start = max(0, min(m.start() - crop_length // 2, len(text) - crop_length))
    window = text[start : start + crop_length]
    marked = rx.sub(lambda g: pre + g.group(0) + post, window)
    prefix = marker if start > 0 else ""
    suffix = marker if start + crop_length < len(text) else ""
    return prefix + marked + suffix, [g.group(0) for g in rx.finditer(window)]


def match_positions(text: str, terms: list[str]) -> list[dict]:
    """MeiliSearch ``_matchesPosition`` payload for one attribute value:
    ``[{"start": ..., "length": ...}]`` for every term occurrence, in text
    order.  Uses the same ZWSP-tolerant longest-first alternation as
    :func:`crop_and_highlight`, so positions always agree with what the
    ``_formatted`` view marks; offsets are CHARACTER offsets into the
    unmodified attribute value (MeiliSearch documents bytes — chars are the
    Python-side equivalent; regex matches are non-overlapping, so no merge
    pass is needed)."""
    rx = _terms_regex(terms)
    if rx is None or not text:
        return []
    return [
        {"start": m.start(), "length": len(m.group(0))} for m in rx.finditer(text)
    ]


def highlight_expr(text_col, terms: list[str], pre: str = HIGHLIGHT_PRE, post: str = HIGHLIGHT_POST):
    """Corpus-scale Spark twin of highlight generation (Column expression,
    whole-stage codegen — the shape used when exporting a `_formatted` column
    for a whole result table rather than one response page)."""
    terms = [t for t in dict.fromkeys(terms) if t]
    if not terms:
        # "()" would match the empty string at every position and stud the
        # whole column with empty marker pairs — no terms means no marking
        return F.col(text_col) if isinstance(text_col, str) else text_col
    pat = "(" + "|".join(re.escape(t) for t in sorted(terms, key=len, reverse=True)) + ")"
    return F.regexp_replace(text_col, pat, pre + "$1" + post)


# ---------------------------------------------------------------------------
# E2-E4 — spans (result_enhancer.py:392-432,460-487,507-543)
# ---------------------------------------------------------------------------


@dataclass
class Span:
    start: int
    end: int
    text: str
    confidence: float


def compound_spans(text: str, compound: str, parts: list[str]) -> list[Span]:
    """E2: exact compound matches (confidence 1.0) + part matches (0.7)."""
    spans: list[Span] = []
    for m in re.finditer(re.escape(compound), text or ""):
        spans.append(Span(m.start(), m.end(), m.group(0), 1.0))
    for part in parts:
        if not part or part == compound:
            continue
        for m in re.finditer(re.escape(part), text or ""):
            spans.append(Span(m.start(), m.end(), m.group(0), 0.7))
    return spans


def fuzzy_partial_confidence(query: str, candidate: str) -> float:
    """E3: substring containment confidence = length ratio, gated at 0.6
    (result_enhancer.py:460-487)."""
    if not query or not candidate:
        return 0.0
    q, c = query.lower(), candidate.lower()
    if q in c:
        conf = len(q) / len(c)
    elif c in q:
        conf = len(c) / len(q)
    else:
        return 0.0
    return conf if conf >= 0.6 else 0.0


def merge_spans(spans: list[Span]) -> list[Span]:
    """E4: sort by start, merge overlaps keeping the higher confidence."""
    out: list[Span] = []
    for s in sorted(spans, key=lambda x: (x.start, x.end)):
        if out and s.start < out[-1].end:
            last = out[-1]
            if s.confidence > last.confidence:
                out[-1] = Span(last.start, max(last.end, s.end), last.text, s.confidence)
            else:
                out[-1] = Span(last.start, max(last.end, s.end), last.text, last.confidence)
        else:
            out.append(Span(s.start, s.end, s.text, s.confidence))
    return out


# ---------------------------------------------------------------------------
# E5-E6 — enhanced score + relevance factors (result_enhancer.py:250-336,559-589)
# ---------------------------------------------------------------------------


def enhanced_score(
    base: float,
    compound_matches: int,
    thai_ratio: float,
    title_match: bool,
    compound_boost_per_match: float = 0.15,
    thai_boost_scale: float = 0.8,
    title_boost: float = 1.4,
) -> float:
    """E5: base × compound boost (cap 2.0) × thai boost (cap 1.8) × title 1.4."""
    cb = min(1.0 + compound_boost_per_match * compound_matches, 2.0)
    tb = min(1.0 + thai_boost_scale * thai_ratio, 1.8)
    return base * cb * tb * (title_boost if title_match else 1.0)


def relevance_factors(
    text: str, highlights: list[str], thai_matches: int, total_matches: int, confidences: list[float]
) -> dict:
    """E6: highlight density, thai match ratio, avg confidence flags."""
    n = max(1, len(text or ""))
    return {
        "highlight_density": sum(len(h) for h in highlights) / n,
        "thai_match_ratio": (thai_matches / total_matches) if total_matches else 0.0,
        "avg_confidence": (sum(confidences) / len(confidences)) if confidences else 0.0,
        "has_highlights": bool(highlights),
    }


# ---------------------------------------------------------------------------
# X7 — content-similarity dedup on the collected top-k
# (result_ranker.py:425-446,635-712; comparison cap result_ranker.py:71)
# ---------------------------------------------------------------------------


def content_similarity_dedup(
    hits: list[dict],
    text_key: str = "text",
    score_key: str = "score",
    threshold: float = 0.85,
    max_comparisons: int = 100,
) -> list[dict]:
    """O(n²) SequenceMatcher grouping over top hits, capped like the
    reference.  Keeps the max-score representative of each similarity group.
    At corpus scale the MinHash-LSH path in pipeline/dedup.py is the same
    operator; this one exists for rank-parity on final pages of results."""
    kept: list[dict] = []
    comparisons = 0
    for h in sorted(hits, key=lambda x: (-x.get(score_key, 0.0), str(x.get(text_key, "")))):
        dup = False
        for r in kept:
            if comparisons >= max_comparisons:
                break
            comparisons += 1
            if SequenceMatcher(None, str(h.get(text_key, "")), str(r.get(text_key, ""))).ratio() >= threshold:
                dup = True
                break
        if not dup:
            kept.append(h)
    return kept


# ---------------------------------------------------------------------------
# R7 — the four ranking algorithms as one parameterized pipeline
# (result_ranker.py:1025-1256)
# ---------------------------------------------------------------------------


@dataclass
class RankingConfig:
    """Flags reproducing the reference's named algorithms."""

    name: str = "optimized_score"
    content_dedup: bool = False  # weighted_score: X7 on top of id-dedup
    thai_ratio_boost: float = 0.0  # experimental: ×(1 + boost×ratio), boost 0.2
    normalize: bool = False
    min_score_threshold: float = 0.0
    extra: dict = field(default_factory=dict)


ALGORITHMS = {
    "weighted_score": RankingConfig("weighted_score", content_dedup=True, normalize=True),
    "optimized_score": RankingConfig("optimized_score"),
    "simple_score": RankingConfig("simple_score"),
    "experimental_score": RankingConfig("experimental_score", thai_ratio_boost=0.2),
}


def rank_hits(df: DataFrame, config: RankingConfig, thai_ratio_col: str | None = None) -> DataFrame:
    """Apply an R7 algorithm to a scored DataFrame (doc_id, score, ...).

    The id-dedup (X4) is assumed done upstream (groupBy doc_id max_by); this
    layer adds the algorithm-specific boosts/normalization.  ``content_dedup``
    runs on the *collected* top page via ``content_similarity_dedup``.
    """
    out = df
    if config.thai_ratio_boost and thai_ratio_col:
        out = out.withColumn(
            "score", F.col("score") * (1.0 + F.lit(config.thai_ratio_boost) * F.col(thai_ratio_col))
        )
    if config.normalize:
        from .ranker import normalize_scores

        out = normalize_scores(out, "score")
    if config.min_score_threshold > 0:
        out = out.filter(F.col("score") >= F.lit(config.min_score_threshold))
    return out


# ---------------------------------------------------------------------------
# R8 — A/B algorithm selection (result_ranker.py:714-766)
# ---------------------------------------------------------------------------


def select_algorithm(
    session_id: str, query: str, test_algorithm: str, traffic_pct: int = 10, control: str = "optimized_score"
) -> str:
    """md5(session+query) mod 100 < traffic% → test algorithm."""
    h = int(hashlib.md5(f"{session_id}:{query}".encode("utf-8")).hexdigest(), 16)
    return test_algorithm if (h % 100) < traffic_pct else control


# ---------------------------------------------------------------------------
# R9 — content-type boost presets (result_ranker.py:50-67,768-826)
# ---------------------------------------------------------------------------

_CONTENT_PRESETS = {
    "formal": {"exact_boost": 2.0, "compound_boost": 1.4, "position_decay": 0.05},
    "informal": {"exact_boost": 1.6, "compound_boost": 1.2, "position_decay": 0.15},
    "mixed": {"exact_boost": 1.8, "compound_boost": 1.3, "position_decay": 0.1},
}


def resolve_content_boosts(thai_ratio: float, query_len: int) -> dict:
    """Preset keyed on thai ratio & query length, like the reference."""
    if thai_ratio > 0.8 and query_len > 10:
        return dict(_CONTENT_PRESETS["formal"], preset="formal")
    if thai_ratio < 0.3:
        return dict(_CONTENT_PRESETS["informal"], preset="informal")
    return dict(_CONTENT_PRESETS["mixed"], preset="mixed")


# ---------------------------------------------------------------------------
# S6 — analytics / metrics export (analytics.py:388-429; metrics.py:90-129)
# ---------------------------------------------------------------------------


def query_metrics_frame(spark, records: list[dict]) -> DataFrame:
    """Small metrics DataFrame (one row per query) for export per run.

    records: {query, variant_count, n_hits, p50_ms, algorithm}.  Written by
    callers with ``df.write.json``/parquet — the reference's JSON export
    (analytics.py:388-429) maps onto a one-file-per-run metrics sink.
    """
    schema = "query string, variant_count int, n_hits long, p50_ms double, algorithm string"
    return spark.createDataFrame([tuple(r.get(k) for k in
                                        ("query", "variant_count", "n_hits", "p50_ms", "algorithm"))
                                  for r in records], schema)
