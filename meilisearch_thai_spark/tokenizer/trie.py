"""Prefix trie for dictionary maximal matching.

Plays the role of pythainlp's ``Trie`` used by the reference's newmm engine
(reference: src/tokenizer/thai_segmenter.py:67-76 builds
``Tokenizer(set(thai_words()) | custom_dict)``).  Pure dict-of-dicts — built
once per process (driver, or per executor inside the pandas UDF) and shared.
"""

from __future__ import annotations

from collections.abc import Iterable

_END = "\0"
END_MARK = _END


class Trie:
    """Immutable-after-build prefix trie over unicode strings."""

    __slots__ = ("_root", "_words", "max_len")

    def __init__(self, words: Iterable[str]):
        root: dict = {}
        wordset = set()
        max_len = 0
        for w in words:
            if not w:
                continue
            wordset.add(w)
            max_len = max(max_len, len(w))
            node = root
            for ch in w:
                node = node.setdefault(ch, {})
            node[_END] = True
        self._root = root
        self._words = frozenset(wordset)
        self.max_len = max_len

    def __contains__(self, word: str) -> bool:
        return word in self._words

    @property
    def root(self) -> dict:
        """Raw node dict for inlined walks (``END_MARK`` keys terminate words).

        The DP segmenter walks this directly in its inner loop — the
        per-position ``prefixes_at`` call + list build was the single
        hottest line of the whole index build."""
        return self._root

    def __len__(self) -> int:
        return len(self._words)

    @property
    def words(self) -> frozenset[str]:
        return self._words

    def prefixes_at(self, text: str, start: int) -> list[int]:
        """Lengths of all dictionary words beginning at ``text[start:]``.

        Returned ascending; empty when no dictionary word starts here.
        """
        node = self._root
        out: list[int] = []
        i = start
        n = len(text)
        while i < n:
            node = node.get(text[i])
            if node is None:
                break
            i += 1
            if _END in node:
                out.append(i - start)
        return out
