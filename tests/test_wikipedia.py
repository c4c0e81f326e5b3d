"""WikipediaTokenizer analog (analysis/wikipedia.py) vs the reference's
own WikipediaTokenizerTest.cs vectors."""

from lucenenet_ray.analysis.wikipedia import (BOTH, CATEGORY,
                                              EXTERNAL_LINK,
                                              EXTERNAL_LINK_URL,
                                              INTERNAL_LINK, ITALICS,
                                              TOKENS_ONLY,
                                              UNTOKENIZED_ONLY,
                                              UNTOKENIZED_TOKEN_FLAG,
                                              wikipedia_tokenize)

LINK_PHRASES = ("click [[link here again]] click "
                "[http://lucene.apache.org here again] "
                "[[Category:a b c d]]")


def terms(toks):
    return [t[0] for t in toks]


def types(toks):
    return [t[1] for t in toks]


def test_simple_offsets_and_types():
    text = "This is a [[Category:foo]]"
    toks = wikipedia_tokenize(text)
    assert terms(toks) == ["This", "is", "a", "foo"]
    assert [t[2] for t in toks] == [0, 5, 8, 21]
    assert [t[3] for t in toks] == [4, 7, 9, 24]
    assert types(toks) == ["<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
                           CATEGORY]
    assert [t[4] for t in toks] == [1, 1, 1, 1]


def test_handwritten():
    test = ("[[link]] This is a [[Category:foo]] Category  This is a "
            "linked [[:Category:bar none withstanding]] "
            "Category This is (parens) This is a [[link]]  This is an "
            "external URL [http://lucene.apache.org] "
            "Here is ''italics'' and ''more italics'', '''bold''' and "
            "'''''five quotes''''' "
            " This is a [[link|display info]]  This is a period.  Here is "
            "$3.25 and here is 3.50.  Here's Johnny.  "
            "==heading== ===sub head=== followed by some text  "
            "[[Category:blah| ]] "
            "''[[Category:ital_cat]]''  here is some that is ''italics "
            "[[Category:foo]] but is never closed."
            "'''same [[Category:foo]] goes for this '''''and2 "
            "[[Category:foo]] and this"
            " [http://foo.boo.com/test/test/ Test Test] "
            "[http://foo.boo.com/test/test/test.html Test Test]"
            " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
            "<ref>Citation</ref> <sup>martian</sup> "
            "<span class=\"glue\">code</span>")
    want_terms = [
        "link", "This", "is", "a", "foo", "Category", "This", "is", "a",
        "linked", "bar", "none", "withstanding", "Category", "This",
        "is", "parens", "This", "is", "a", "link", "This", "is", "an",
        "external", "URL", "http://lucene.apache.org", "Here", "is",
        "italics", "and", "more", "italics", "bold", "and", "five",
        "quotes", "This", "is", "a", "link", "display", "info", "This",
        "is", "a", "period", "Here", "is", "3.25", "and", "here", "is",
        "3.50", "Here's", "Johnny", "heading", "sub", "head",
        "followed", "by", "some", "text", "blah", "ital", "cat", "here",
        "is", "some", "that", "is", "italics", "foo", "but", "is",
        "never", "closed", "same", "foo", "goes", "for", "this", "and2",
        "foo", "and", "this", "http://foo.boo.com/test/test/", "Test",
        "Test", "http://foo.boo.com/test/test/test.html", "Test",
        "Test", "http://foo.boo.com/test/test/test.html?g=b&c=d",
        "Test", "Test", "Citation", "martian", "code"]
    A, C, I, B, BI = "<ALPHANUM>", CATEGORY, ITALICS, "b", "bi"
    IL, EL, ELU = INTERNAL_LINK, EXTERNAL_LINK, EXTERNAL_LINK_URL
    want_types = [
        IL, A, A, A, C, A, A, A, A, A, C, C, C, A, A, A, A, A, A, A,
        IL, A, A, A, A, A, ELU, A, A, I, A, I, I, B, A, BI, BI, A, A,
        A, IL, IL, IL, A, A, A, A, A, A, "<NUM>", A, A, A, "<NUM>",
        "<APOSTROPHE>", A, "h", "sh", "sh", A, A, A, A, C, C, C, A, A,
        A, A, A, I, C, A, A, A, A, B, C, A, A, A, BI, C, A, A, ELU,
        EL, EL, ELU, EL, EL, ELU, EL, EL, "ci", A, A]
    toks = wikipedia_tokenize(test)
    assert terms(toks) == want_terms
    assert types(toks) == want_types


def _check_link_phrases(toks):
    assert terms(toks) == ["click", "link", "here", "again", "click",
                           "http://lucene.apache.org", "here", "again",
                           "a", "b", "c", "d"]
    assert [t[4] for t in toks] == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_link_phrases():
    _check_link_phrases(wikipedia_tokenize(LINK_PHRASES))


def test_links():
    test = ("[http://lucene.apache.org/java/docs/index.html#news here]"
            " [http://lucene.apache.org/java/docs/index.html?b=c here]"
            " [https://lucene.apache.org/java/docs/index.html?b=c here]")
    toks = wikipedia_tokenize(test)
    assert terms(toks) == [
        "http://lucene.apache.org/java/docs/index.html#news", "here",
        "http://lucene.apache.org/java/docs/index.html?b=c", "here",
        "https://lucene.apache.org/java/docs/index.html?b=c", "here"]
    assert types(toks) == [EXTERNAL_LINK_URL, EXTERNAL_LINK] * 3


def test_lucene1133_untokenized_only():
    untoks = frozenset({CATEGORY, ITALICS})
    # TOKENS_ONLY ignores untoks entirely
    _check_link_phrases(wikipedia_tokenize(LINK_PHRASES, TOKENS_ONLY,
                                           untoks))
    test = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
            "[[link there]] ''italics here'' something ''more italics'' "
            "[[Category:h   i   j]]")
    toks = wikipedia_tokenize(test, UNTOKENIZED_ONLY, untoks)
    assert terms(toks) == ["a b c d", "e f g", "link", "here", "link",
                           "there", "italics here", "something",
                           "more italics", "h   i   j"]
    assert [t[2] for t in toks] == [11, 32, 42, 47, 56, 61, 71, 86, 98,
                                    124]
    assert [t[3] for t in toks] == [18, 37, 46, 51, 60, 66, 83, 95, 110,
                                    133]
    assert [t[4] for t in toks] == [1] * 10


def test_both_mode_with_flags():
    untoks = frozenset({CATEGORY, ITALICS})
    test = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
            "[[link there]] ''italics here'' something ''more italics'' "
            "[[Category:h   i   j]]")
    toks = wikipedia_tokenize(test, BOTH, untoks)
    assert terms(toks) == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g", "link",
        "here", "link", "there", "italics here", "italics", "here",
        "something", "more italics", "more", "italics", "h   i   j",
        "h", "i", "j"]
    assert [t[2] for t in toks] == [
        11, 11, 13, 15, 17, 32, 32, 34, 36, 42, 47, 56, 61, 71, 71, 79,
        86, 98, 98, 103, 124, 124, 128, 132]
    assert [t[3] for t in toks] == [
        18, 12, 14, 16, 18, 37, 33, 35, 37, 46, 51, 60, 66, 83, 78, 83,
        95, 110, 102, 110, 133, 125, 129, 133]
    assert [t[4] for t in toks] == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1,
        0, 1, 1]
    want_flags = [UNTOKENIZED_TOKEN_FLAG, 0, 0, 0, 0,
                  UNTOKENIZED_TOKEN_FLAG, 0, 0, 0, 0, 0, 0, 0,
                  UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
                  UNTOKENIZED_TOKEN_FLAG, 0, 0,
                  UNTOKENIZED_TOKEN_FLAG, 0, 0, 0]
    assert [t[5] for t in toks] == want_flags


def test_double_brace_templates_typed_citation():
    """{{...}} shares the citation state (WikipediaTokenizerImpl
    YYINITIAL DoubleBrace → CITATION, DOUBLE_BRACE_STATE)."""
    toks = wikipedia_tokenize("before {{cite web first last}} after")
    assert terms(toks) == ["before", "cite", "web", "first", "last",
                           "after"]
    assert types(toks) == ["<ALPHANUM>", "ci", "ci", "ci", "ci",
                           "<ALPHANUM>"]
    # unclosed template runs to end of text
    toks = wikipedia_tokenize("x {{open forever")
    assert types(toks) == ["<ALPHANUM>", "ci", "ci"]


def test_untoks_cover_external_links_and_headings():
    """r5 review finding: untokenizedTypes must work for EVERY wiki
    type, not just category/italics/citation — the reference's
    collapse logic keys on currentTokType membership alone."""
    from lucenenet_ray.analysis.wikipedia import (HEADING, SUB_HEADING,
                                                  UNTOKENIZED_ONLY, BOTH)

    toks = wikipedia_tokenize("[http://a.org x y] tail",
                              UNTOKENIZED_ONLY,
                              frozenset({EXTERNAL_LINK}))
    assert [(t[0], t[1]) for t in toks] == [
        ("http://a.org", EXTERNAL_LINK_URL), ("x y", EXTERNAL_LINK),
        ("tail", "<ALPHANUM>")]
    assert toks[1][5] == UNTOKENIZED_TOKEN_FLAG

    toks = wikipedia_tokenize("==head words== after", UNTOKENIZED_ONLY,
                              frozenset({HEADING}))
    assert [(t[0], t[1]) for t in toks] == [
        ("head words", HEADING), ("after", "<ALPHANUM>")]

    toks = wikipedia_tokenize("===deep sub=== x", BOTH,
                              frozenset({SUB_HEADING}))
    assert [(t[0], t[1], t[4]) for t in toks] == [
        ("deep sub", SUB_HEADING, 1), ("deep", SUB_HEADING, 0),
        ("sub", SUB_HEADING, 1), ("x", "<ALPHANUM>", 1)]


def test_random_strings_never_crash_and_offsets_sane():
    """CheckRandomData analog (WikipediaTokenizerTest.TestRandomStrings):
    arbitrary markup-soup input must tokenize without raising, with
    in-bounds offsets, term==text-slice for plain tokens, and
    non-negative position increments, in every mode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucenenet_ray.analysis.wikipedia import (BOTH, UNTOKENIZED_ONLY,
                                                  wikipedia_tokenize)

    alphabet = "ab1 .'[]={}<>|:/#&?\"-_\n"
    untoks = frozenset({"c", "i", "el", "h"})

    @settings(max_examples=250, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=80))
    def run(text):
        for mode in (TOKENS_ONLY, UNTOKENIZED_ONLY, BOTH):
            toks = wikipedia_tokenize(text, mode, untoks)
            for term, typ, s, e, inc, flags in toks:
                assert 0 <= s <= e <= len(text)
                assert inc in (0, 1)
                assert flags in (0, 1)
                assert isinstance(term, str) and isinstance(typ, str)
                if flags == 0 and typ.startswith("<"):
                    assert text[s:e] == term

    run()
