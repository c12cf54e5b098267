"""Tokenizer package — the single source of truth for tokenization.

``default_segmenter()``/``default_processor()`` build the pinned pipeline used
BOTH driver-side (query processing) and inside pandas UDFs (document
indexing), which is what makes per-text output byte-identical across the two
paths (north-rule per-row invariant; SURVEY §7 M0).
"""

from __future__ import annotations

from functools import lru_cache

from .newmm import NewmmSegmenter, TokenizationResult, is_thai_char, is_thai_text, thai_ratio
from .processor import (
    ZWSP,
    ZWSP2,
    ContentType,
    TokenProcessingResult,
    TokenProcessor,
    classify_content_type,
)

__all__ = [
    "NewmmSegmenter",
    "TokenizationResult",
    "TokenProcessor",
    "TokenProcessingResult",
    "ContentType",
    "ZWSP",
    "ZWSP2",
    "classify_content_type",
    "is_thai_char",
    "is_thai_text",
    "thai_ratio",
    "default_segmenter",
    "default_processor",
    "extract_index_terms",
    "tokenize_for_index",
    "tokenize_compound",
]


@lru_cache(maxsize=1)
def default_segmenter() -> NewmmSegmenter:
    from ..dictionary import merged_trie

    return NewmmSegmenter(merged_trie())


@lru_cache(maxsize=1)
def default_processor() -> TokenProcessor:
    from ..dictionary import COMMON_LONG_WORDS

    return TokenProcessor(common_long_words=COMMON_LONG_WORDS)


def tokenize_for_index(text: str) -> list[str]:
    """Primary segmentation (T1/T2) — the reference's INDEXING path calls
    ``segment_text`` directly (src/meilisearch_integration/document_processor.py:
    207-214); the compound second pass (T3) is a separate endpoint operator."""
    return default_segmenter().tokenize(text)


def tokenize_compound(text: str) -> list[str]:
    """Compound-preserving two-pass segmentation (T3) — parity with the
    reference's /tokenize/compound endpoint."""
    from ..dictionary import load_compound_words

    seg = default_segmenter()
    return seg.segment_compound_words(text, load_compound_words()).tokens


def extract_index_terms(tokens: list[str]) -> list[str]:
    """Tokens -> index terms: drop whitespace/punctuation, lowercase Latin.

    The analogue of which character sequences MeiliSearch would index between
    the separators the reference configures
    (src/meilisearch_integration/settings_manager.py:26-111).
    """
    out = []
    for t in tokens:
        if not t.strip():
            continue
        ct = classify_content_type(t)
        if ct == ContentType.PUNCTUATION:
            continue
        out.append(t.lower() if ct in (ContentType.ENGLISH, ContentType.MIXED) else t)
    return out
