"""Vectorized pandas/Arrow UDFs wrapping the tokenizer (no per-row Python UDFs).

The reference tokenizes document-at-a-time in asyncio threads
(src/meilisearch_integration/document_processor.py:207-214, :296-304); here the
same pure-Python tokenizer module runs over Arrow batches inside executors —
reference T1-T9 mapped per SURVEY §2.3/§2.8.

Executor-side state: the segmenter/trie is built lazily ONCE per Python worker
(module-global via lru_cache in ..tokenizer), the analogue of the reference's
singleton ThaiSegmenter dependency (src/api/endpoints/tokenize.py:32-50).
A small per-worker memo cache reproduces the reference's profiled tokenizer
text-caching optimization (docs/deployment/PERFORMANCE_OPTIMIZATIONS.md:36).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@lru_cache(maxsize=65536)
def _tokens_cached(text: str) -> tuple[str, ...]:
    from . import tokenize_for_index

    return tuple(tokenize_for_index(text))


@lru_cache(maxsize=65536)
def _terms_cached(text: str) -> tuple[str, ...]:
    from . import extract_index_terms

    return tuple(extract_index_terms(list(_tokens_cached(text))))


@lru_cache(maxsize=65536)
def _norm_cached(text: str) -> str:
    from . import default_processor

    toks = list(_tokens_cached(text))
    return default_processor().process_tokens(text, toks).processed_text


@F.pandas_udf(T.ArrayType(T.StringType()))
def segment_tokens_udf(texts: pd.Series) -> pd.Series:
    """T1/T2: newmm-style segmentation -> array<string> of raw tokens."""
    return texts.map(lambda t: list(_tokens_cached(t)) if isinstance(t, str) and t else [])


@F.pandas_udf(T.ArrayType(T.StringType()))
def index_terms_udf(texts: pd.Series) -> pd.Series:
    """T1 + term extraction: tokens minus whitespace/punct, Latin lowercased."""
    return texts.map(lambda t: list(_terms_cached(t)) if isinstance(t, str) and t else [])


@F.pandas_udf(T.StringType())
def zwsp_norm_udf(texts: pd.Series) -> pd.Series:
    """T9: ZWSP-joined processed_text — the per-url byte-identity artifact."""
    return texts.map(lambda t: _norm_cached(t) if isinstance(t, str) and t else (t or ""))


_FEATURES_TYPE = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("norm_hash", T.StringType(), False),
    ]
)


def _index_features_batch(texts: pd.Series) -> pd.DataFrame:
    """Shared body of the fused features UDF (module-level so both the
    pinned UDF and the overlay factory's closures pickle it by reference)."""
    import hashlib

    terms, hashes = [], []
    for t in texts:
        if isinstance(t, str) and t:
            terms.append(list(_terms_cached(t)))
            hashes.append(hashlib.sha256(_norm_cached(t).encode("utf-8")).hexdigest())
        else:
            terms.append([])
            hashes.append(hashlib.sha256((t or "").encode("utf-8")).hexdigest())
    return pd.DataFrame({"terms": terms, "norm_hash": hashes})


@F.pandas_udf(_FEATURES_TYPE)
def index_features_udf(texts: pd.Series) -> pd.DataFrame:
    """T1+T9 fused: one Arrow pass producing (index terms, sha256(norm_text)).

    ``norm_hash`` equals ``F.sha2(zwsp_norm_udf(text), 256)`` — hashed here in
    Python so the (large) ZWSP string never crosses back to the JVM; only the
    64-hex digest does.  Tokenization runs once for both outputs via the
    shared memo cache.

    Tokenizes with the PACKAGED dictionary only — call sites that must honor
    the runtime custom-dictionary overlay (reference config.py:389-535) use
    :func:`index_features_udf_with_dictionary` instead, which closure-ships
    the overlay to executor workers.
    """
    return _index_features_batch(texts)


def index_features_udf_with_dictionary():
    """Factory: the fused features UDF with the driver's CURRENT runtime
    custom-dictionary overlay captured into the closure, so executor Python
    workers (which re-import modules fresh and are reused across jobs)
    tokenize with the same effective dictionary as the driver's query side.
    With no overlay active this returns the plain pinned UDF — zero change
    to existing plans or their byte-identity."""
    from ..dictionary import get_custom_dictionary

    custom = tuple(get_custom_dictionary())
    if not custom:
        return index_features_udf

    @F.pandas_udf(_FEATURES_TYPE)
    def _overlay_features_udf(texts: pd.Series) -> pd.DataFrame:
        from ..dictionary import set_custom_words

        set_custom_words(custom)  # idempotent per worker; clears memo caches on change
        return _index_features_batch(texts)

    return _overlay_features_udf


@F.pandas_udf(T.ArrayType(T.StringType()))
def compound_tokens_udf(texts: pd.Series) -> pd.Series:
    """T3: compound-preserving two-pass segmentation (parity op)."""
    from . import tokenize_compound

    return texts.map(lambda t: tokenize_compound(t) if isinstance(t, str) and t else [])
