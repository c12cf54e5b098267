"""Token post-processing: content-type classification and ZWSP normalization.

Re-expresses the reference's TokenProcessor semantics
(src/tokenizer/token_processor.py) — the output ``processed_text`` is the
byte-identity artifact the north rule pins per url:

* Thai token            -> token + U+200B                      (:243-244)
* Thai potential compound (>6 chars, pattern match) -> parts joined by
  double-U+200B + trailing U+200B, midpoint split    (:247-262, :354-378)
* English/numeric token -> " token "                           (:223-225)
* everything else       -> unchanged                           (:226-227)
* processed_text = concatenation of per-token outputs          (:120-128)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from functools import lru_cache

from .newmm import is_thai_char, is_thai_text

ZWSP = "​"  # Thai word-boundary separator (token_processor.py:62)
ZWSP2 = ZWSP * 2  # compound-part separator (token_processor.py:63)

# MeiliSearch separator tokens pushed as index settings (token_processor.py:66-73).
DEFAULT_SEPARATORS = [
    " ", "\t", "\n", "\r",
    ".", ",", ";", ":", "!", "?",
    "(", ")", "[", "]", "{", "}",
    "-", "_", "/", "\\", "|",
    ZWSP, ZWSP2,
]

# Heuristic compound patterns (token_processor.py:363-368).
_COMPOUND_PATTERNS = [
    re.compile(r"(การ.+)"),
    re.compile(r"(.+ความ.+)"),
    re.compile(r"(.+โรง.+)"),
    re.compile(r"(.+ศาสตร์)"),
]


class ContentType(str, Enum):
    THAI = "thai"
    ENGLISH = "english"
    NUMERIC = "numeric"
    PUNCTUATION = "punctuation"
    WHITESPACE = "whitespace"
    MIXED = "mixed"


@dataclass
class ProcessedToken:
    """Mirror of reference ProcessedToken (token_processor.py:30-39)."""

    original: str
    processed: str
    content_type: ContentType
    is_compound: bool = False
    sub_tokens: list[str] | None = None


@dataclass
class TokenProcessingResult:
    """Mirror of reference TokenProcessingResult (token_processor.py:42-50)."""

    original_text: str
    processed_text: str
    tokens: list[ProcessedToken]
    metadata: dict = field(default_factory=dict)


@lru_cache(maxsize=131072)
def classify_content_type(token: str) -> ContentType:
    """Per-token type by char-class counts with >50% dominance rule
    (reference: token_processor.py:267-309, T7).

    Memoized: tokens are Zipf-repeated draws from a dictionary-bounded
    vocabulary, so the cache hit rate in corpus runs is ~95% (unlike
    document-level caching, which never hits on a web corpus)."""
    if not token.strip():
        return ContentType.WHITESPACE
    thai = eng = num = punct = 0
    for c in token:
        if is_thai_char(c):
            thai += 1
        elif c.isalpha():
            eng += 1
        elif c.isdigit():
            num += 1
        elif not c.isspace():
            punct += 1
    total = len(token.strip())
    present = [
        (cnt, ct)
        for cnt, ct in (
            (thai, ContentType.THAI),
            (eng, ContentType.ENGLISH),
            (num, ContentType.NUMERIC),
            (punct, ContentType.PUNCTUATION),
        )
        if cnt > 0
    ]
    if len(present) > 1:
        max_cnt, max_type = max(present, key=lambda x: x[0])
        return max_type if max_cnt / total > 0.5 else ContentType.MIXED
    if len(present) == 1:
        return present[0][1]
    return ContentType.MIXED


def is_potential_compound(token: str, common_long_words: frozenset[str]) -> bool:
    """>6 chars, primarily Thai, not a known long word (token_processor.py:345-352)."""
    return len(token) > 6 and is_thai_text(token) and token not in common_long_words


def split_compound_heuristic(token: str) -> list[str]:
    """Pattern-gated midpoint split (reference T10, token_processor.py:354-378).

    Deliberately reproduces the reference's simplistic midpoint behavior —
    it is part of the byte-identity contract, not something to 'improve'.
    """
    for pat in _COMPOUND_PATTERNS:
        if pat.match(token):
            mid = len(token) // 2
            return [token[:mid], token[mid:]]
    return [token]


class TokenProcessor:
    """ZWSP normalizer — produces the byte-identity ``processed_text``."""

    def __init__(self, common_long_words: frozenset[str] = frozenset(), handle_compounds: bool = True):
        self.common_long_words = common_long_words
        self.handle_compounds = handle_compounds
        # per-token memo (vocabulary-bounded; ProcessedToken is treated as
        # immutable by all consumers, so sharing instances is safe)
        self.process_token = lru_cache(maxsize=65536)(self._process_token_uncached)

    def _process_token_uncached(self, token: str) -> ProcessedToken:
        """Single-token normalization (reference: token_processor.py:196-233)."""
        if not token or not token.strip():
            return ProcessedToken(token, token, ContentType.WHITESPACE)
        ctype = classify_content_type(token)
        if ctype == ContentType.THAI:
            processed, is_comp, subs = self._process_thai(token)
            return ProcessedToken(token, processed, ctype, is_comp, subs)
        if ctype in (ContentType.ENGLISH, ContentType.NUMERIC):
            return ProcessedToken(token, f" {token} ", ctype)
        return ProcessedToken(token, token, ctype)

    def _process_thai(self, token: str) -> tuple[str, bool, list[str] | None]:
        """Thai token ZWSP suffixing + compound handling (token_processor.py:235-265)."""
        if not self.handle_compounds or len(token) <= 4:
            return token + ZWSP, False, None
        if is_potential_compound(token, self.common_long_words):
            subs = split_compound_heuristic(token)
            if len(subs) > 1:
                return ZWSP2.join(subs) + ZWSP, True, subs
        return token + ZWSP, False, None

    def process_tokens(self, original_text: str, tokens: list[str]) -> TokenProcessingResult:
        """Document-level normalization (reference: token_processor.py:98-145)."""
        if not tokens:
            return TokenProcessingResult(original_text, original_text, [], {"empty_input": True})
        processed = [self.process_token(t) for t in tokens]
        text = "".join(p.processed for p in processed)
        meta = {
            "original_token_count": len(tokens),
            "thai_tokens": sum(1 for p in processed if p.content_type == ContentType.THAI),
            "compound_tokens": sum(1 for p in processed if p.is_compound),
        }
        return TokenProcessingResult(original_text, text, processed, meta)
