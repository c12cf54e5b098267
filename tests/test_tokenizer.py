"""Tokenizer contract tests.

Ports the reference's segmenter invariants and golden compound expectations
(tests/unit/test_thai_segmenter.py:39-150,
 tests/integration/test_wakame_compound_words.py:29-50,
 tests/unit/test_token_processor.py) onto our from-scratch newmm-style engine.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from meilisearch_thai_spark.dictionary import (
    dictionary_fingerprint,
    load_compound_words,
    merged_words,
)
from meilisearch_thai_spark.tokenizer import (
    ZWSP,
    ZWSP2,
    ContentType,
    classify_content_type,
    default_processor,
    default_segmenter,
    extract_index_terms,
    thai_ratio,
    tokenize_compound,
    tokenize_for_index,
)

SEG = default_segmenter()
PROC = default_processor()


class TestSegmenterInvariants:
    def test_empty_and_whitespace(self):
        assert SEG.segment_text("").tokens == []
        assert SEG.segment_text("   ").tokens == []

    def test_reconstruction(self):
        texts = [
            "สวัสดีครับ ยินดีต้อนรับ",
            "ปัญญาประดิษฐ์และการเรียนรู้ของเครื่องจักร",
            "Startup ไทยกำลังเติบโต 123 แห่ง!",
            "อาหารไทย เช่น ต้มยำกุ้ง ผัดไทย ส้มตำ",
        ]
        for t in texts:
            toks = SEG.tokenize(t)
            assert "".join(toks) == t

    def test_boundaries_arithmetic(self):
        r = SEG.segment_text("อาหารไทยอร่อยมาก")
        assert len(r.word_boundaries) == len(r.tokens) + 1
        assert r.word_boundaries[0] == 0
        assert r.word_boundaries[-1] == len(r.original_text)
        assert r.word_boundaries == sorted(r.word_boundaries)

    def test_dictionary_words_kept_whole(self):
        for w in ["ปัญญาประดิษฐ์", "การเรียนรู้", "เทคโนโลยี", "ต้มยำกุ้ง", "ตลาดหุ้น"]:
            assert SEG.tokenize(w) == [w]

    def test_unknown_thai_run_single_token(self):
        # Not in dictionary -> one merged unknown token, never split mid-cluster
        toks = SEG.tokenize("ฦๅฦๅ")
        assert toks == ["ฦๅฦๅ"]

    def test_mixed_content(self):
        toks = SEG.tokenize("Machine Learning คือการเรียนรู้")
        assert "Machine" in toks and "Learning" in toks
        assert "การเรียนรู้" in toks or ("การ" in toks and "เรียนรู้" in toks)

    def test_deterministic(self):
        t = "ร้านอาหารไทยในกรุงเทพฯ เสิร์ฟต้มยำกุ้ง"
        assert SEG.tokenize(t) == SEG.tokenize(t)


class TestWakameGolden:
    """Golden compound suite — the wakame family must stay whole
    (reference: tests/integration/test_wakame_compound_words.py:29-50)."""

    @pytest.mark.parametrize(
        "text,expected_whole",
        [
            ("สาหร่ายวากาเมะ", "สาหร่ายวากาเมะ"),
            ("วากาเมะ", "วากาเมะ"),
            ("สาหร่ายวากาเมะมีประโยชน์", "สาหร่ายวากาเมะ"),
            ("ซูชิและซาชิมิ", "ซาชิมิ"),
            ("คอมพิวเตอร์", "คอมพิวเตอร์"),
        ],
    )
    def test_compound_stays_whole(self, text, expected_whole):
        assert expected_whole in SEG.tokenize(text)
        assert expected_whole in tokenize_compound(text)

    def test_compound_pass_preserves_dict_splits_unknown(self):
        comp = load_compound_words()
        toks = tokenize_compound("สาหร่ายวากาเมะ")
        assert toks == ["สาหร่ายวากาเมะ"]
        assert "สาหร่ายวากาเมะ" in comp


class TestContentType:
    """Reference: src/tokenizer/token_processor.py:267-309."""

    @pytest.mark.parametrize(
        "tok,expected",
        [
            ("สวัสดี", ContentType.THAI),
            ("hello", ContentType.ENGLISH),
            ("12345", ContentType.NUMERIC),
            ("!!!", ContentType.PUNCTUATION),
            ("   ", ContentType.WHITESPACE),
            ("ก1b!", ContentType.MIXED),
            ("helloไทย", ContentType.ENGLISH),  # 5/8 english > 50%
        ],
    )
    def test_classify(self, tok, expected):
        assert classify_content_type(tok) == expected


class TestZwspNormalization:
    """Reference: src/tokenizer/token_processor.py:62-73, 98-145, 196-265."""

    def test_thai_token_gets_zwsp(self):
        r = PROC.process_tokens("ไทย", ["ไทย"])
        assert r.processed_text == "ไทย" + ZWSP

    def test_english_wrapped_in_spaces(self):
        r = PROC.process_tokens("hello", ["hello"])
        assert r.processed_text == " hello "

    def test_numeric_wrapped_in_spaces(self):
        r = PROC.process_tokens("123", ["123"])
        assert r.processed_text == " 123 "

    def test_punct_unchanged(self):
        r = PROC.process_tokens("!", ["!"])
        assert r.processed_text == "!"

    def test_compound_midpoint_double_zwsp(self):
        # การ-prefixed token >6 chars, primarily Thai, pattern `การ.+` matches
        tok = "การเรียนรู้"
        r = PROC.process_tokens(tok, [tok])
        mid = len(tok) // 2
        assert r.processed_text == tok[:mid] + ZWSP2 + tok[mid:] + ZWSP
        assert r.tokens[0].is_compound

    def test_common_long_word_not_split(self):
        r = PROC.process_tokens("มหาวิทยาลัย", ["มหาวิทยาลัย"])
        assert r.processed_text == "มหาวิทยาลัย" + ZWSP
        assert not r.tokens[0].is_compound

    def test_short_thai_never_compound(self):
        r = PROC.process_tokens("ไทย", ["ไทย"])
        assert not r.tokens[0].is_compound

    def test_empty_input(self):
        r = PROC.process_tokens("", [])
        assert r.processed_text == ""
        assert r.metadata.get("empty_input")


class TestIndexTerms:
    def test_drops_whitespace_and_punct(self):
        terms = extract_index_terms(["ไทย", " ", "!", "Hello", "123"])
        assert terms == ["ไทย", "hello", "123"]

    def test_pipeline(self):
        toks = tokenize_for_index("ร้านอาหารไทย ในกรุงเทพฯ!")
        terms = extract_index_terms(toks)
        assert " " not in terms and "!" not in terms
        # maximal matching keeps the longest dictionary word at each position
        assert terms == ["ร้านอาหาร", "ไทย", "ใน", "กรุงเทพฯ"]


class TestDictionary:
    def test_fingerprint_stable(self):
        assert dictionary_fingerprint() == dictionary_fingerprint()
        assert len(dictionary_fingerprint()) == 64

    def test_merged_contains_both(self):
        w = merged_words()
        assert "วากาเมะ" in w  # compound
        assert "อาหาร" in w  # base


@given(st.text(alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=80))
@settings(max_examples=200, deadline=None)
def test_property_reconstruction_and_boundaries(text):
    """Hypothesis: tokens always partition the input exactly; boundary
    arithmetic holds (reference invariant, test_thai_segmenter.py:120-150)."""
    r = SEG.segment_text(text)
    if r.tokens:
        assert "".join(r.tokens) == text
        assert len(r.word_boundaries) == len(r.tokens) + 1
    else:
        assert not text.strip()
