"""Driver-side query processing: analysis, variants, weights (SURVEY §2.4).

Re-expresses the reference's QueryProcessor semantics
(src/search_proxy/services/query_processor.py) as deterministic pure
functions.  Queries are tiny, so this stage is driver-side Python by design
(SURVEY §3.3); its output — a list of (variant_id, term) rows — broadcasts
into the ONE Spark scoring job in ``executor.multi_variant_search``.

Determinism note: the reference's nondeterministic engine-fallback chain
(attacut/deepcut, query_processor.py:211-281) is pinned to the newmm-style
segmenter, matching the index side (SURVEY §7 M0)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..tokenizer import (
    ContentType,
    classify_content_type,
    default_segmenter,
    extract_index_terms,
    is_thai_char,
    thai_ratio,
    tokenize_compound,
    tokenize_for_index,
)

MAX_QUERY_VARIANTS = 5  # settings.py: max_query_variants
MIN_VARIANT_WEIGHT = 0.2  # query_processor.py:753-755 (Q6 / P8)

# Base weight by variant type (query_processor.py:786-952, Q5).
BASE_WEIGHTS = {
    "original": 0.8,
    "tokenized": 1.0,
    "compound_split": 0.9,
    "fallback": 0.6,
    "mixed_language": 0.85,
    "phrase": 1.0,  # quoted PHRASE variant (query_processor.py:436-702)
    # S5 synonyms (settings_manager.py:226-249): MeiliSearch treats synonym
    # matches as equal words; the substituted variant sits at the
    # compound_split tier so the literal tokenization still wins ties and
    # R3's exactness boost keeps original-text hits on top
    "synonym": 0.9,
}

# Per-variant matching strategy (query_processor.py:954-981 +
# search_executor.py:735-742, Q7): original -> 'all' (conjunctive),
# tokenized/compound/mixed -> 'last' (drop trailing terms until hits),
# fallback -> 'frequency' (relax highest-df terms first).  The executor
# expands 'last'/'frequency' into conjunctive prefix sub-variants scored in
# the same single job (executor.matching_prefixes).
MATCHING_STRATEGY = {
    "original": "all",
    "tokenized": "last",
    "compound_split": "last",
    "fallback": "frequency",
    "mixed_language": "last",
    "phrase": "phrase",  # exact adjacency on a positional index
    "synonym": "last",  # substituted query behaves like its tokenized twin
}

_ENGLISH_WORD_RE = re.compile(r"[A-Za-z]+")


@dataclass(frozen=True)
class QueryAnalysis:
    """Q1 (query_processor.py:161-209)."""

    query: str
    thai_char_count: int
    english_word_count: int
    thai_ratio: float
    primary_language: str  # thai | english | mixed
    query_length: int


@dataclass
class QueryVariant:
    """Mirror of reference QueryVariant (search_proxy/models/query.py:10-17)."""

    variant_type: str
    query_text: str
    terms: list[str]
    weight: float
    matching: str = "best"
    metadata: dict = field(default_factory=dict)


@dataclass
class ProcessedQuery:
    """Mirror of reference ProcessedQuery (models/query.py:148-210), plus
    the MeiliSearch-1.8+ negative keywords the raw query carried."""

    original_query: str
    analysis: QueryAnalysis
    variants: list[QueryVariant]
    fallback_used: bool = False
    exclude_terms: list[str] = field(default_factory=list)


def split_negative_keywords(query: str) -> tuple[str, list[str]]:
    """MeiliSearch negative keywords (1.8+, so in the reference's 1.15.2): a
    ``-`` immediately before a word and preceded by whitespace/start negates
    it — docs containing that word leave the result set.  Returns
    ``(positive_query, negative_chunks)``.

    Mid-word hyphens (``state-of-the-art``) are untouched (the ``-`` is not
    preceded by whitespace), a bare ``-`` is kept as text, and negative
    PHRASES (``-"exact phrase"``) are rejected explicitly rather than
    silently misread as a word."""
    if re.search(r'(?:^|\s)-"', query):
        raise ValueError(
            'negative phrases (-"...") are not supported; negate the words individually'
        )
    negs = re.findall(r"(?:^|(?<=\s))-(\S+)", query)
    positive = re.sub(r"(?:^|(?<=\s))-\S+", " ", query)
    return positive.strip(), negs


def split_query_negatives(query: str) -> tuple[str, list[str]]:
    """One-stop negative-keyword parse: ``(positive_query, exclude_terms)``.

    Every negative chunk tokenizes with the SAME pinned index tokenizer and
    every resulting term excludes its docs (disjunctive over all negative
    tokens).  This is THE definition of which docs a ``-word`` blocks —
    both the variant pipeline (:func:`process_query`) and the direct
    ``SearchEngine.search`` path call it, so negative tokenization can
    never diverge between the two surfaces."""
    positive, negs = split_negative_keywords(query)
    exclude = [
        t for chunk in negs for t in extract_index_terms(tokenize_for_index(chunk))
    ]
    return positive, exclude


def add_prefix_variants(
    pq: "ProcessedQuery",
    expand_fn,
    raw_query: str,
    max_expansions: int = 5,
) -> "ProcessedQuery":
    """Search-as-you-type in the FULL variant pipeline: append one variant
    per index completion of the last word (MeiliSearch prefix-matches the
    final query word by default; opt-in here so existing callers keep their
    exact-token semantics).

    Skipped when ``raw_query`` ends in whitespace (the word is finished).
    The base is the first non-phrase variant; each completion variant keeps
    its matching strategy and takes ``weight × PREFIX_COMPLETION_WEIGHT``
    so the literal word outranks its completions at equal raw score.
    ``expand_fn`` is the engine's bounded head-vocab scan
    (``SearchEngine.expand_terms``) — the pipeline stays engine-agnostic.
    Mutates and returns ``pq``.
    """
    from .ranker import PREFIX_COMPLETION_WEIGHT

    if not raw_query or raw_query[-1].isspace():
        return pq
    base = next((v for v in pq.variants if v.matching != "phrase"), None)
    if base is None or not base.terms:
        return pq
    last = base.terms[-1]
    for c in expand_fn(last, max_expansions):
        terms = list(dict.fromkeys(base.terms[:-1] + [c]))
        pq.variants.append(
            QueryVariant(
                variant_type="prefix",
                query_text=" ".join(terms),
                terms=terms,
                weight=_clamp_weight(base.weight * PREFIX_COMPLETION_WEIGHT),
                matching=base.matching,
                metadata={"source": "prefix", "prefix": last},
            )
        )
    return pq


def normalize_query(q: str) -> str:
    """Q8: collapse whitespace (tokenizer/query_processor.py:233-244)."""
    return re.sub(r"\s+", " ", q).strip()


def analyze_query(q: str) -> QueryAnalysis:
    """Q1: language composition (query_processor.py:161-209)."""
    thai_chars = sum(1 for c in q if is_thai_char(c))
    eng_words = len(_ENGLISH_WORD_RE.findall(q))
    tr = thai_ratio(q)
    if thai_chars and eng_words:
        lang = "mixed"
    elif thai_chars:
        lang = "thai"
    else:
        lang = "english"
    return QueryAnalysis(
        query=q,
        thai_char_count=thai_chars,
        english_word_count=eng_words,
        thai_ratio=tr,
        primary_language=lang,
        query_length=len(q),
    )


def _char_fallback_tokens(q: str) -> list[str]:
    """T5 twin: group runs of Thai chars, non-Thai word-split
    (query_processor.py:396-434)."""
    toks: list[str] = []
    run = ""
    for c in q:
        if is_thai_char(c):
            run += c
        else:
            if run:
                toks.append(run)
                run = ""
            if not c.isspace():
                toks.append(c)
    if run:
        toks.append(run)
    return toks


def _length_multiplier(analysis: QueryAnalysis) -> float:
    """Q5 length factor: very short or very long queries are less reliable
    (query_processor.py:874-899 analogue, deterministic form)."""
    n = analysis.query_length
    if n <= 2:
        return 0.7
    if n > 100:
        return 0.85
    return 1.0


def _language_multiplier(analysis: QueryAnalysis, variant_type: str) -> float:
    """Q5/Q6: Thai-tokenized variants boosted for Thai queries; fallbacks
    damped when the query is clearly tokenizable (query_processor.py:728-769)."""
    if analysis.primary_language == "thai" and variant_type == "tokenized":
        return 1.0
    if analysis.primary_language == "mixed" and variant_type == "mixed_language":
        return 1.0
    if variant_type == "fallback" and analysis.primary_language != "english":
        return 0.9
    return 0.95 if variant_type == "fallback" else 1.0


def _clamp_weight(w: float) -> float:
    return max(0.1, min(1.0, w))


CHAR_FALLBACK_CONFIDENCE = 0.3  # query_processor.py:431 (character-level)


def tokenization_confidence(query: str, tokens: list[str]) -> float:
    """Q3: tokenization-quality confidence blend (query_processor.py:339-394).

    Mean of: (1) tokens-per-char reasonableness — optimal 0.1-0.5 tokens per
    non-space char; (2) processing-time factor, PINNED to 1.0 here (the
    reference computes max(0.1, 1 - ms/1000) and our pinned in-process
    segmenter runs sub-millisecond, so the reference value is ~1.0 too —
    pinning keeps the blend deterministic, SURVEY §7 M0); (3) average Thai
    token length — 2-6 chars preferred.  Empty tokenization → 0.0."""
    if not tokens:
        return 0.0
    factors: list[float] = []
    qlen = len(query.replace(" ", ""))
    if qlen > 0:
        tpc = len(tokens) / qlen
        if 0.1 <= tpc <= 0.5:
            factors.append(1.0)
        elif tpc < 0.1:
            factors.append(tpc / 0.1)
        else:
            factors.append(max(0.1, 1.0 - (tpc - 0.5) / 0.5))
    factors.append(1.0)  # time factor (deterministic pin, see docstring)
    thai_tokens = [t for t in tokens if any(is_thai_char(c) for c in t)]
    if thai_tokens:
        avg_len = sum(len(t) for t in thai_tokens) / len(thai_tokens)
        if 2 <= avg_len <= 6:
            factors.append(1.0)
        elif avg_len < 2:
            factors.append(avg_len / 2)
        else:
            factors.append(max(0.3, 1.0 - (avg_len - 6) / 10))
    return sum(factors) / len(factors) if factors else 0.5


def _tokenization_quality_multiplier(confidence: float, variant_type: str) -> float:
    """Q3→Q5 feed (query_processor.py:929-952): confidence bands scale the
    variant weight; ORIGINAL doesn't depend on tokenization quality."""
    if variant_type == "original":
        return 1.0
    if confidence >= 0.9:
        return 1.1
    if confidence >= 0.7:
        return 1.0
    if confidence >= 0.5:
        return 0.9
    return 0.8


def generate_variants(
    q: str,
    analysis: QueryAnalysis,
    preserve_original: bool = True,
    synonyms: dict[str, list[str]] | None = None,
    max_variants: int = MAX_QUERY_VARIANTS,
) -> list[QueryVariant]:
    """Q4: emit ORIGINAL / TOKENIZED / COMPOUND_SPLIT / MIXED / FALLBACK
    (+ SYNONYM substitutions when the index settings carry a synonym map),
    dedup by lowercased text, cap at ``max_variants`` keeping highest
    weight (query_processor.py:436-702; the cap is the reference's
    ``max_query_variants`` option, models/requests.py:32, default 5)."""
    length_m = _length_multiplier(analysis)
    candidates: list[QueryVariant] = []
    primary = tokenize_for_index(q)
    # Q3: one confidence for the primary segmentation; the char-level
    # fallback carries its own pinned low confidence (query_processor.py:431)
    primary_conf = tokenization_confidence(q, extract_index_terms(primary))

    def add(vt: str, tokens: list[str], meta: dict | None = None) -> None:
        terms = extract_index_terms(tokens)
        if not terms:
            return
        text = " ".join(terms)
        conf = CHAR_FALLBACK_CONFIDENCE if vt == "fallback" else primary_conf
        w = _clamp_weight(
            BASE_WEIGHTS[vt]
            * length_m
            * _language_multiplier(analysis, vt)
            * _tokenization_quality_multiplier(conf, vt)
        )
        candidates.append(
            QueryVariant(
                variant_type=vt,
                query_text=text,
                terms=terms,
                weight=w,
                matching=MATCHING_STRATEGY[vt],
                metadata={**(meta or {}), "tokenization_confidence": round(conf, 4)},
            )
        )
    if preserve_original:
        add("original", primary, {"source": "original"})
    add("tokenized", primary, {"engine": "newmm"})

    # quoted query → PHRASE variant: exact term adjacency, MeiliSearch's
    # phrase search (reference Q4 emits a quoted-phrase variant)
    m = re.search(r'"([^"]{2,})"|“([^”]{2,})”', q)
    if m:
        inner = m.group(1) or m.group(2)
        add("phrase", tokenize_for_index(inner), {"source": "quoted"})

    compound = tokenize_compound(q)
    if compound != primary:
        add("compound_split", compound, {"engine": "newmm_compound"})

    if analysis.primary_language == "mixed":
        add("mixed_language", primary, {"mixed": True})

    # S5 synonyms: one-way canonical -> alternates (settings_manager.py:
    # 226-249; MeiliSearch applies them at search time).  Canonical keys are
    # tokenizer-normalized space-joined term sequences (builder normalizes
    # at build time), so a multi-word canonical matches as a contiguous
    # window of the query's base terms; each match emits one substituted
    # variant per alternate (alternates may themselves be multi-word).
    if synonyms:
        base_terms = extract_index_terms(primary)
        key_lens = sorted({len(k.split()) for k in synonyms})
        for i in range(len(base_terms)):
            for L in key_lens:
                if i + L > len(base_terms):
                    continue
                window = base_terms[i : i + L]
                key = " ".join(window)
                for alt in synonyms.get(key, []):
                    alt_terms = extract_index_terms(tokenize_for_index(alt))
                    if not alt_terms or alt_terms == window:
                        continue
                    sub = base_terms[:i] + alt_terms + base_terms[i + L :]
                    add("synonym", sub, {"synonym_of": key, "alternate": alt})

    fallback = _char_fallback_tokens(q)
    if fallback and extract_index_terms(fallback) != extract_index_terms(primary):
        add("fallback", fallback, {"engine": "char_fallback"})

    # dedup by (lowercased text, matching): keep the highest-weight variant
    # per distinct executable search (query_processor.py:454-486)
    best: dict[tuple[str, str], QueryVariant] = {}
    for v in candidates:
        key = (v.query_text.lower(), v.matching)
        if key not in best or v.weight > best[key].weight:
            best[key] = v
    out = sorted(best.values(), key=lambda v: (-v.weight, v.variant_type))

    # Q6: drop weak variants unless nothing remains; cap at max variants
    strong = [v for v in out if v.weight >= MIN_VARIANT_WEIGHT]
    if not strong and out:
        strong = out[:1]  # emergency variant (query_processor.py:764-769)
    return strong[:max_variants]


def process_query(
    q: str,
    preserve_original: bool = True,
    synonyms: dict[str, list[str]] | None = None,
    max_variants: int = MAX_QUERY_VARIANTS,
    matching_strategy: str = "best",
) -> ProcessedQuery:
    """Full driver-side pipeline: normalize → analyze → variants (Q1-Q8).

    ``matching_strategy`` other than ``"best"`` forces that strategy onto
    every variant (the request-level MeiliSearch matchingStrategy override,
    reference models/requests.py:22) — except explicit phrase variants,
    whose adjacency semantics the strategy never relaxes."""
    positive, exclude = split_query_negatives(q)
    nq = normalize_query(positive)
    analysis = analyze_query(nq)
    if not nq:
        return ProcessedQuery(
            original_query=q, analysis=analysis, variants=[], exclude_terms=exclude
        )
    variants = generate_variants(
        nq, analysis, preserve_original, synonyms=synonyms, max_variants=max_variants
    )
    if matching_strategy != "best":
        from dataclasses import replace as _replace

        variants = [
            v if v.matching == "phrase" else _replace(v, matching=matching_strategy)
            for v in variants
        ]
        # the override can collapse distinct (text, matching) pairs into
        # duplicates (e.g. original/all + tokenized/last with equal text);
        # re-dedup keeping the first (= highest-weight) occurrence so the
        # executor never scores the same posting set twice
        seen: set[tuple[str, str]] = set()
        uniq = []
        for v in variants:
            key = (v.query_text.lower(), v.matching)
            if key not in seen:
                seen.add(key)
                uniq.append(v)
        variants = uniq
    fallback_used = any(v.variant_type == "fallback" for v in variants)
    return ProcessedQuery(
        original_query=q, analysis=analysis, variants=variants,
        fallback_used=fallback_used, exclude_terms=exclude,
    )


# ---------------------------------------------------------------- Q9/Q10
_PARTIAL_MAX_LEN = 2


def classify_query_type(q: str) -> str:
    """Q9 (tokenizer/query_processor.py:282-326): SIMPLE/COMPOUND/PARTIAL/
    MIXED/PHRASE."""
    nq = normalize_query(q)
    if len(nq) <= _PARTIAL_MAX_LEN:
        return "partial"
    a = analyze_query(nq)
    if a.primary_language == "mixed":
        return "mixed"
    toks = extract_index_terms(tokenize_for_index(nq))
    if len(toks) > 2:
        return "phrase"
    if len(toks) == 1 and len(nq) > 6:
        return "compound"
    return "simple"


def expand_query_terms(q: str, max_expansions: int = 10) -> list[str]:
    """Q10: compound-part expansions (tokenizer/query_processor.py:328-471) —
    the segmenter's parts of each long token become extra search terms."""
    seg = default_segmenter()
    base = extract_index_terms(tokenize_for_index(normalize_query(q)))
    seen = dict.fromkeys(base)
    for t in base:
        if len(t) > 6 and classify_content_type(t) == ContentType.THAI:
            for part in seg.tokenize(t):
                p = part.strip()
                if p and p not in seen:
                    seen[p] = None
    return list(seen)[: max_expansions + len(base)]
