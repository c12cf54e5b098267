"""Brute-force single-node BM25 oracle for rank-identity verification.

Plays the role of the reference's golden-expectation integration tests
(tests/integration/*, data/samples/test_queries.json): the Spark engine's
top-k must be rank-identical to this straightforward implementation over the
same tokenized corpus (SURVEY §5 test plan item 3).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from ..tokenizer import extract_index_terms, tokenize_for_index


class BM25Oracle:
    def __init__(self, docs: dict[str, str], k1: float = 1.2, b: float = 0.75):
        """``docs``: url -> text."""
        self.k1, self.b = k1, b
        self.tf: dict[str, Counter] = {}
        self.df: Counter = Counter()
        self.doc_len: dict[str, int] = {}
        for url, text in docs.items():
            terms = extract_index_terms(tokenize_for_index(text))
            c = Counter(terms)
            self.tf[url] = c
            self.doc_len[url] = len(terms)
            for t in c:
                self.df[t] += 1
        self.n = len(docs)
        self.avgdl = (sum(self.doc_len.values()) / self.n) if self.n else 1.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score(self, url: str, terms: list[str]) -> float:
        s = 0.0
        dl = self.doc_len[url]
        for t in terms:
            tf = self.tf[url].get(t, 0)
            if tf == 0:
                continue
            s += self.idf(t) * (tf * (self.k1 + 1.0)) / (
                tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
            )
        return s

    def top_k(
        self,
        query: str,
        k: int = 10,
        matching: str = "best",
        exclude_terms: list[str] | None = None,
    ) -> list[tuple[str, float]]:
        terms = list(dict.fromkeys(extract_index_terms(tokenize_for_index(query))))
        hits: list[tuple[str, float]] = []
        inv: defaultdict[str, set] = defaultdict(set)
        cands: set[str] = set()
        for t in terms:
            for url, c in self.tf.items():
                if c.get(t, 0) > 0:
                    inv[t].add(url)
                    cands.add(url)
        if matching == "all" and terms:
            for t in terms:
                cands &= inv[t]
        for t in exclude_terms or []:
            # negative keyword: docs containing the term leave the result
            # set entirely (corpus-wide stats untouched)
            cands -= {url for url, c in self.tf.items() if c.get(t, 0) > 0}
        for url in cands:
            s = self.score(url, terms)
            if s > 0:
                hits.append((url, s))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]
