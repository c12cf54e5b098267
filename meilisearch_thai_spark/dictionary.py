"""Dictionary loading — the pinned tokenization contract.

Reference behavior re-expressed (NOT ported): the reference builds its newmm
tokenizer from ``set(pythainlp.thai_words()) | custom_compound_dict`` where the
compound dict is data/dictionaries/thai_compounds.json with 10 categories
(reference: src/tokenizer/factory.py:22-65, src/tokenizer/thai_segmenter.py:67-76).

Here the base corpus is our authored wordlist (pythainlp is not available in
this environment) and the compound categories are a data contract mirroring the
reference's. ``dictionary_fingerprint()`` hashes the merged dictionary so index
lineage can pin byte-identity of tokenization (SURVEY §7 risk 1).
"""

from __future__ import annotations

import hashlib
import json
from functools import lru_cache

from .tokenizer.trie import Trie


def _read_data(name: str) -> str:
    """Packaged-data reader that works from a plain checkout AND from inside
    a ``--py-files`` zip on executors (importlib.resources is zip-safe;
    ``open(Path(__file__)/...)`` is not)."""
    from importlib import resources

    return resources.files("meilisearch_thai_spark.data").joinpath(name).read_text(
        encoding="utf-8"
    )

# Known long Thai words that must NOT be heuristically split as compounds
# (reference: src/tokenizer/token_processor.py:380-387 `_is_common_long_word`).
COMMON_LONG_WORDS = frozenset(
    {
        "สวัสดีครับ",
        "สวัสดีค่ะ",
        "ขอบคุณครับ",
        "ขอบคุณค่ะ",
        "ประเทศไทย",
        "กรุงเทพมหานคร",
        "มหาวิทยาลัย",
    }
)

# Thai stop words configured into the reference index
# (reference: src/meilisearch_integration/settings_manager.py:65-69). Kept
# configurable and OFF by default to preserve rank-identity (SURVEY T12).
THAI_STOP_WORDS = frozenset(
    {
        "การ", "ของ", "ใน", "ที่", "และ", "เป็น", "มี", "ได้", "ให้", "ไม่",
        "จะ", "ว่า", "กับ", "แล้ว", "ก็", "นี้", "นั้น", "อยู่", "ด้วย", "ไป",
        "มา", "ถึง", "จาก", "หรือ", "แต่",
    }
)


@lru_cache(maxsize=1)
def load_base_words() -> frozenset[str]:
    """Authored base vocabulary (stand-in for pythainlp ``thai_words()``)."""
    words = set()
    for line in _read_data("thai_words.txt").splitlines():
        w = line.strip()
        if w and not w.startswith("#"):
            words.add(w)
    return frozenset(words)


@lru_cache(maxsize=1)
def load_compound_words() -> frozenset[str]:
    """Compound dictionary (10 categories, data contract with the reference)."""
    payload = json.loads(_read_data("compounds.json"))
    return frozenset(w for cat in payload["categories"].values() for w in cat)


@lru_cache(maxsize=1)
def merged_words() -> frozenset[str]:
    return load_base_words() | load_compound_words()


@lru_cache(maxsize=1)
def merged_trie() -> Trie:
    """The pinned segmentation trie: base vocabulary ∪ compound dictionary."""
    return Trie(merged_words())


@lru_cache(maxsize=1)
def dictionary_fingerprint() -> str:
    """SHA-256 over the sorted merged wordlist — pinned into index lineage."""
    blob = "\n".join(sorted(merged_words())).encode("utf-8")
    return hashlib.sha256(blob).hexdigest()
