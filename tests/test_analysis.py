"""Golden token-array tests for the StandardAnalyzer chain (the
BaseTokenStreamTestCase.AssertAnalyzesTo pattern — SURVEY §5.2)."""

import pytest

from lucenenet_ray.analysis import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    analyze,
    analyze_batch,
)

# (input, expected terms, expected positions)  — FIXTURES.md §2 coverage
GOLDEN = [
    # ALPHANUM/NUM/mixed: UAX#29 splits on &, -, @, keeps dotted domains
    ("XY&Z Corporation - xyz@example.com",
     ["xy", "z", "corporation", "xyz", "example.com"], [0, 1, 2, 3, 4]),
    # stopword runs: positions keep holes (FilteringTokenFilter.cs:84-101)
    ("the quick and the dead", ["quick", "dead"], [1, 4]),
    # all stopwords → empty
    ("the of to a an", [], []),
    # mid-word punctuation per UAX#29 (MidLetter/MidNum/MidNumLet)
    ("can't 3.14 1,000 f_o", ["can't", "3.14", "1,000", "f_o"], [0, 1, 2, 3]),
    # unicode lowercase incl. dotted capital I (Java 1:1 mapping)
    ("Hello WORLD İstanbul", ["hello", "world", "istanbul"], [0, 1, 2]),
    # CJK: one token per Han ideograph / Hiragana char, Katakana runs
    ("日本語のテキスト", ["日", "本", "語", "の", "テキスト"], [0, 1, 2, 3, 4]),
    # reference TestStandardAnalyzer.cs CJK goldens (TestJapanese/TestKorean/
    # TestSupplementary/TestKoreanSA): Hangul runs are their own token type
    # and split from adjacent Latin (StandardTokenizer.cs:85-104)
    ("仮名遣い カタカナ", ["仮", "名", "遣", "い", "カタカナ"], [0, 1, 2, 3, 4]),
    ("훈민정음", ["훈민정음"], [0]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"], [0, 1]),
    ("한글abc", ["한글", "abc"], [0, 1]),
    ("𩬅艱鍟䇹愯瀛", ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"], [0, 1, 2, 3, 4, 5]),
    # combining marks stay attached (TestCombiningMarks)
    ("아゙", ["아゙"], [0]),
    # numbers and codes
    ("IPv6 2001:db8 x86_64", ["ipv6", "2001", "db8", "x86_64"], [0, 1, 2, 3]),
    # empty / whitespace-only
    ("", [], []),
    ("   \t\n ", [], []),
    # apostrophes/hyphens/URLs
    # "of"/"the" inside the hyphenated phrase are stopwords → position holes
    ("state-of-the-art http://foo.bar/baz",
     ["state", "art", "http", "foo.bar", "baz"], [0, 3, 4, 5, 6]),
]


@pytest.mark.parametrize("text,terms,positions", GOLDEN)
def test_golden_tokens(text, terms, positions):
    got_terms, got_pos = analyze(text)
    assert got_terms == terms
    assert got_pos == positions


def test_overlong_token_discarded_with_hole():
    # StandardTokenizer.cs:206-214 + StandardAnalyzer.cs:51 (255-char cap)
    long_tok = "a" * (MAX_TOKEN_LENGTH + 1)
    terms, pos = analyze(f"first {long_tok} last")
    assert terms == ["first", "last"]
    assert pos == [0, 2]  # hole where the long token was
    # exactly 255 chars is kept
    ok_tok = "b" * MAX_TOKEN_LENGTH
    terms, pos = analyze(f"x {ok_tok}")
    assert terms == ["x", ok_tok]


def test_stop_set_is_lucenes():
    # StopAnalyzer.cs:44-56 — exactly 33 words
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "i" not in ENGLISH_STOP_WORDS  # not in Lucene's English set


def test_field_length_counts_kept_tokens_only():
    # norm length = tokens reaching the inverter (DocInverterPerField.cs:195)
    terms, _ = analyze("the quick and the dead")
    assert len(terms) == 2


def test_fast_ascii_path_equals_slow_path():
    # the split() fast path must agree with the full UAX#29 path
    from lucenenet_ray.analysis.standard import StandardAnalyzer

    a = StandardAnalyzer()
    text = "the fast key order sort table a scan merge"
    assert a(text) == a._analyze_slow(text)


def test_analyze_batch_arrow():
    toks, pos = analyze_batch(["the quick fox", None, "spark"])
    assert toks.to_pylist() == [["quick", "fox"], [], ["spark"]]
    assert pos.to_pylist() == [[1, 2], [], [0]]


def test_multilang_dispatch():
    """Per-language stop sets route on the lang column; unknown → default."""
    from lucenenet_ray.analysis.lang import MultiLangAnalyzer

    m = MultiLangAnalyzer()
    de_text = "der hund und die katze laufen"
    # German stopwords dropped under de, kept under en/und
    terms_de, _ = m(de_text, "de")
    assert "der" not in terms_de and "hund" in terms_de
    terms_en, _ = m(de_text, "en")
    assert "der" in terms_en
    terms_und, _ = m(de_text, "und")
    assert "der" in terms_und
    # English stopwords still dropped in the default chain
    assert "the" not in m("the quick fox", "zh")[0]
