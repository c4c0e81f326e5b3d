"""Core tokenizers + Classic grammar + misc filter wave 3 vs the
reference's own test vectors (TestClassicAnalyzer.cs,
TestCapitalizationFilter.cs, TestKeywordRepeatFilter.cs,
TestPatternTokenizer.cs shapes)."""

from lucenenet_ray.analysis.core_tokenizers import (
    classic_analyze,
    classic_filter,
    classic_tokenize,
    edge_ngram_tokenize,
    keyword_tokenize,
    letter_tokenize,
    lowercase_tokenize,
    ngram_tokenize,
    pattern_tokenize,
    whitespace_tokenize,
)
from lucenenet_ray.analysis.misc_filters import (
    capitalization,
    keyword_repeat,
    limit_token_position,
    stemmer_override,
    type_token_filter,
)

_CLASSIC = [
    ("B2B", ["b2b"]), ("2B", ["2b"]),
    ("word_having_underscore", ["word", "having", "underscore"]),
    ("word_with_underscore_and_stopwords",
     ["word", "underscore", "stopwords"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]), ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["o'reilly"]), ("you're", ["you're"]), ("she's", ["she"]),
    ("Jim's", ["jim"]), ("don't", ["don't"]), ("O'Reilly's", ["o'reilly"]),
    ("s-class", ["s", "class"]), ("t-com", ["t", "com"]),
    ("a-class", ["class"]),
    ("AT&T", ["at&t"]), ("Excite@Home", ["excite@home"]),
    ("www.nutch.org.", ["www.nutch.org"]),
    ("test@example.com", ["test@example.com"]),
    ("first.lastname@example.com", ["first.lastname@example.com"]),
    ("first_lastname@example.com", ["first_lastname@example.com"]),
    ("21.35", ["21.35"]), ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]), ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
    ("David has 5000 bones", ["david", "has", "5000", "bones"]),
    ("C embedded developers wanted",
     ["c", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
    ('"QUOTED" word', ["quoted", "word"]),
    ("U.S.A.", ["usa"]), ("C++", ["c"]), ("C#", ["c"]),
]


def test_classic_analyzer_vectors():
    for inp, exp in _CLASSIC:
        assert classic_analyze(inp) == exp, inp


def test_classic_types():
    assert classic_tokenize("www.nutch.org.") == [
        ("www.nutch.org", "<HOST>")]
    assert classic_tokenize("U.S.A.")[0][1] == "<ACRONYM>"
    assert classic_tokenize("AT&T")[0][1] == "<COMPANY>"
    assert classic_tokenize("test@example.com")[0][1] == "<EMAIL>"
    assert classic_filter("O'Reilly's", "<APOSTROPHE>") == "O'Reilly"


def test_char_tokenizers():
    assert whitespace_tokenize("foo  bar\tbaz") == ["foo", "bar", "baz"]
    assert letter_tokenize("ab3cd ef") == ["ab", "cd", "ef"]
    assert lowercase_tokenize("AB cD4e") == ["ab", "cd", "e"]
    assert keyword_tokenize("keep as one") == ["keep as one"]
    # CharTokenizer splits runs longer than 255 chars
    assert whitespace_tokenize("x" * 300) == ["x" * 255, "x" * 45]


def test_pattern_tokenizer():
    # TestPatternTokenizer.cs shapes: split mode and group mode
    assert pattern_tokenize("aaa bbb ccc", r"\s+") == ["aaa", "bbb", "ccc"]
    assert pattern_tokenize("aaa,bbb,,ccc", r",") == ["aaa", "bbb", "ccc"]
    assert pattern_tokenize("Günther Günther is here", r"Günther",
                            group=0) == ["Günther", "Günther"]
    assert pattern_tokenize('aaa "bbb" "ccc"', r'"(.*?)"',
                            group=1) == ["bbb", "ccc"]


def test_ngram_tokenizers():
    assert ngram_tokenize("abcde", 1, 2) == [
        "a", "ab", "b", "bc", "c", "cd", "d", "de", "e"]
    assert edge_ngram_tokenize("abcde", 1, 3) == ["a", "ab", "abc"]


def test_capitalization_vectors():
    keep = frozenset(["and", "the", "it", "BIG"])
    assert capitalization("kiTTEN", True, keep, True) == "Kitten"
    assert capitalization("and", True, keep, True) == "And"
    assert capitalization("AnD", True, keep, True) == "And"
    # forceFirstLetter=false still capitalizes non-keep words
    assert capitalization("AnD", True, keep, False) == "And"
    assert capitalization("big", True, keep, True) == "Big"
    assert capitalization("BIG", True, keep, True) == "BIG"
    assert capitalization("Hello thEre my Name is Ryan", True, keep,
                          True) == "Hello there my name is ryan"
    assert capitalization("McKinley", True, keep, True) == "Mckinley"
    assert capitalization("McKinley", True, keep, True,
                          ok_prefix=("McK",)) == "McKinley"
    assert capitalization("1st 2nd third", False, keep, False,
                          min_word_length=3) == "1st 2nd Third"
    assert capitalization("the The the", False, keep,
                          True) == "The The the"


def test_keyword_repeat_and_friends():
    t, p, kw = keyword_repeat(["birds", "are"], [1, 2])
    assert t == ["birds", "birds", "are", "are"]
    assert p == [1, 1, 2, 2]
    assert kw == [True, False, True, False]

    from lucenenet_ray.analysis.filters import porter_stem
    assert stemmer_override(["booked", "books"], {"booked": "books"},
                            porter_stem) == ["books", "book"]

    terms = ["one", "1", "two"]
    types = ["<ALPHANUM>", "<NUM>", "<ALPHANUM>"]
    assert type_token_filter(terms, types,
                             frozenset(["<NUM>"])) == ["one", "two"]
    assert type_token_filter(terms, types, frozenset(["<NUM>"]),
                             use_white_list=True) == ["1"]

    assert limit_token_position(["a", "b", "c"], [1, 2, 3], 2) == ["a", "b"]


def test_tee_sink_and_payload_filters():
    from lucenenet_ray.analysis.misc_filters import (
        date_recognizer_sink,
        delimited_payload,
        numeric_payload,
        tee_sink,
        token_range_sink,
        token_type_sink,
        type_as_payload,
    )

    toks = [("2024-01-05", 1, "<ALPHANUM>"), ("hello", 2, "<ALPHANUM>"),
            ("42", 3, "<NUM>"), ("03/15/2020", 4, "<NUM>")]
    sinks = tee_sink(toks, {
        "dates": lambda t, p, ty: date_recognizer_sink(t),
        "nums": token_type_sink("<NUM>"),
        "first2": token_range_sink(0, 2),
    })
    assert [t for t, _, _ in sinks["dates"]] == ["2024-01-05",
                                                 "03/15/2020"]
    assert [t for t, _, _ in sinks["nums"]] == ["42", "03/15/2020"]
    assert [t for t, _, _ in sinks["first2"]] == ["2024-01-05", "hello"]

    import struct
    t, p = delimited_payload(["the|0.1", "quick|2.0", "plain"])
    assert t == ["the", "quick", "plain"]
    assert p[0] == struct.pack(">f", 0.1) and p[2] is None
    t, p = delimited_payload(["a|1", "b|2"], encoder="int")
    assert p == [struct.pack(">i", 1), struct.pack(">i", 2)]
    assert numeric_payload(["x", "y"], ["<A>", "<B>"], 3.0,
                           "<B>")[1] == struct.pack(">f", 3.0)
    assert type_as_payload(["<A>"]) == [b"<A>"]
