"""Spell module: string distances + WordBreakSpellChecker vs the
reference's own test expectations (TestJaroWinklerDistance /
TestLevenshteinDistance / TestNGramDistance / TestLuceneLevenshteinDistance
/ TestWordBreakSpellChecker.cs, incl. its English-number corpus)."""

import pyarrow as pa
import pyarrow.dataset as pads

from lucenenet_ray.ops.spell import (
    jaro_winkler_distance,
    levenstein_distance,
    lucene_levenshtein_distance,
    ngram_distance,
    suggest_word_breaks,
    suggest_word_combinations,
)


def test_levenstein_vectors():
    # TestLevenshteinDistance.cs
    assert abs(levenstein_distance("al", "al") - 1.0) < 1e-3
    assert abs(levenstein_distance("martha", "marhta") - 0.6666) < 1e-3
    assert abs(levenstein_distance("jones", "johnson") - 0.4285) < 1e-3
    assert abs(levenstein_distance("abcvwxyz", "cabvwxyz") - 0.75) < 1e-3
    assert abs(levenstein_distance("dwayne", "duane") - 0.666) < 1e-3
    assert abs(levenstein_distance("dixon", "dicksonx") - 0.5) < 1e-3
    assert levenstein_distance("six", "ten") == 0
    assert levenstein_distance("", "al") == 0.0
    assert levenstein_distance("", "") == 1.0


def test_jaro_winkler_vectors():
    # TestJaroWinklerDistance.cs (band assertions)
    assert jaro_winkler_distance("al", "al") == 1.0
    assert 0.961 < jaro_winkler_distance("martha", "marhta") < 0.962
    assert 0.832 < jaro_winkler_distance("jones", "johnson") < 0.833
    assert 0.958 < jaro_winkler_distance("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < jaro_winkler_distance("dwayne", "duane") < 0.841
    assert 0.813 < jaro_winkler_distance("dixon", "dicksonx") < 0.814
    assert jaro_winkler_distance("fvie", "ten") == 0.0
    assert (jaro_winkler_distance("zac ephron", "zac efron")
            > jaro_winkler_distance("zac ephron", "kai ephron"))
    assert (jaro_winkler_distance("brittney spears", "britney spears")
            > jaro_winkler_distance("brittney spears",
                                    "brittney startzman"))


def test_ngram_vectors():
    # TestNGramDistance.cs TestGetDistance{1,2,3}
    for n, vectors in [
        (1, [("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
             ("natural", "contrary", 0.25),
             ("abcvwxyz", "cabvwxyz", 0.75), ("dwayne", "duane", 0.666),
             ("dixon", "dicksonx", 0.5), ("six", "ten", 0.0)]),
        (2, [("a", "aa", 0.5), ("martha", "marhta", 0.6666),
             ("jones", "johnson", 0.4285),
             ("natural", "contrary", 0.25),
             ("abcvwxyz", "cabvwxyz", 0.625),
             ("dwayne", "duane", 0.5833), ("dixon", "dicksonx", 0.5),
             ("six", "ten", 0.0)]),
        (3, [("martha", "marhta", 0.7222), ("jones", "johnson", 0.4762),
             ("natural", "contrary", 0.2083),
             ("abcvwxyz", "cabvwxyz", 0.5625),
             ("dwayne", "duane", 0.5277)]),
    ]:
        for a, b, e in vectors:
            assert abs(ngram_distance(a, b, n) - e) < 1e-3, (n, a, b)
        assert abs(ngram_distance("al", "al", n) - 1.0) < 1e-3
        assert abs(ngram_distance("a", "a", n) - 1.0) < 1e-3
        assert abs(ngram_distance("b", "a", n) - 0.0) < 1e-3
    assert ngram_distance("", "al") == 0.0


def test_lucene_levenshtein():
    # transposition counts as one edit; normalized by min length
    assert abs(lucene_levenshtein_distance("marhta", "martha")
               - (1.0 - 1 / 6)) < 1e-6
    assert lucene_levenshtein_distance("abc", "abc") == 1.0
    assert abs(lucene_levenshtein_distance("ab", "abcd") - 0.0) < 1e-6


# --- WordBreakSpellChecker over the reference test's own corpus ----------

_ONES = ["", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen",
         "fourteen", "fifteen", "sixteen", "seventeen", "eighteen",
         "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty",
         "seventy", "eighty", "ninety"]


def _english(n):
    """English.Int32ToEnglish for 900..1111 with '-'->' ' (the test's
    Regex.Replace)."""
    parts = []
    if n >= 1000:
        parts += ["one", "thousand"]
        n -= 1000
    if n >= 100:
        parts += [_ONES[n // 100], "hundred"]
        n %= 100
    if n >= 20:
        t = _TENS[n // 10]
        if n % 10:
            parts.append(t + " " + _ONES[n % 10])
        else:
            parts.append(t)
    elif n > 0:
        parts.append(_ONES[n])
    return " ".join(parts)


class _StubReader:
    def __init__(self, docs):
        df = {}
        for d in docs:
            for t in set(d.split()):
                df[t] = df.get(t, 0) + 1
        self._t = pa.table({"term": sorted(df),
                            "df": [df[t] for t in sorted(df)]})

    def _termstats(self):
        return pads.dataset(self._t)


def _corpus_reader():
    docs = [_english(i) for i in range(900, 1112)]
    docs += ["thou hast sand betwixt thy toes",
             "hundredeight eightyeight yeight",
             "tres y cinco"]
    return _StubReader(docs)


def test_breaking_words():
    r = _corpus_reader()
    sw = suggest_word_breaks(r, "ninetynine", 5, max_changes=1,
                             suggest_always=False)
    assert len(sw) == 1
    assert [w for w, _ in sw[0]] == ["ninety", "nine"]

    sw = suggest_word_breaks(r, "onethousand", 2, max_changes=1,
                             suggest_always=False)
    assert len(sw) == 1
    assert [w for w, _ in sw[0]] == ["one", "thousand"]

    sw = suggest_word_breaks(r, "onethousand", 2, max_changes=2,
                             suggest_always=False)
    assert len(sw) == 2
    assert [w for w, _ in sw[0]] == ["one", "thousand"]
    assert [w for w, _ in sw[1]] == ["one", "thou", "sand"]
    assert sw[0][1][1] > 1 and sw[0][0][1] > sw[0][1][1]
    assert sw[1][1][1] == 1 and sw[1][2][1] == 1

    sw = suggest_word_breaks(r, "onethousandonehundredeleven", 5,
                             max_changes=3, suggest_always=False)
    assert len(sw) == 0
    sw = suggest_word_breaks(r, "onethousandonehundredeleven", 5,
                             max_changes=4, suggest_always=False)
    assert len(sw) == 1 and len(sw[0]) == 5
    sw = suggest_word_breaks(r, "onethousandonehundredeleven", 5,
                             max_changes=5, suggest_always=False)
    assert len(sw) == 2
    assert len(sw[0]) == 5 and sw[0][1][0] == "thousand"
    assert len(sw[1]) == 6 and sw[1][1][0] == "thou" \
        and sw[1][2][0] == "sand"


def test_combining_words():
    r = _corpus_reader()
    terms = ["one", "hun", "dred", "eight", "y", "eight"]
    cs = suggest_word_combinations(r, terms, 10, max_changes=3,
                                   suggest_always=True)
    assert len(cs) == 5
    assert cs[0][0] == (1, 2) and cs[0][1] == "hundred"
    assert cs[1][0] == (3, 4) and cs[1][1] == "eighty"
    assert cs[2][0] == (4, 5) and cs[2][1] == "yeight"
    three = {c[1] for c in cs[3:]}
    assert three == {"hundredeight", "eightyeight"}

    cs = suggest_word_combinations(r, terms, 5, max_changes=3,
                                   suggest_always=False)
    assert len(cs) == 2
    assert cs[0][0] == (1, 2) and cs[0][1] == "hundred"
    assert len(cs[1][0]) == 3


def test_spellchecker_ngram():
    from lucenenet_ray.ops.spell import spellchecker_ngram

    r = _StubReader(["query spark", "query window", "key merge"])
    out = spellchecker_ngram(r, "qery", num_sug=5)
    assert out[0][0] == "query"
    assert abs(out[0][1] - 0.8) < 1e-9
    assert ("key", 0.5, 1) in out
    # accuracy filter
    out = spellchecker_ngram(r, "qery", num_sug=5, accuracy=0.75)
    assert [x[0] for x in out] == ["query"]
