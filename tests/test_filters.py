"""Token-filter library + MultiPhraseQuery (SURVEY §2.2 / §2.10).

Porter vectors are from the published algorithm description (M.F. Porter,
"An algorithm for suffix stripping", 1980) — the same algorithm
En/PorterStemmer.cs ports. Shingle cases mirror TestShingleFilter.cs.
"""

import numpy as np
import pytest

from lucenenet_ray.analysis.filters import (
    EnglishAnalyzer,
    MappingCharFilter,
    PorterStemmer,
    ShingleAnalyzer,
    SynonymMap,
    ascii_fold,
    edge_ngram_filter,
    english_possessive,
    ngram_filter,
    porter_stem,
    shingles,
    synonym_filter,
)

# (input, expected) pairs from the algorithm paper's worked examples
PORTER_VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    # the paper lists per-step outputs (electriciti → electric after step 3);
    # the full algorithm then strips -ic in step 4, as Lucene's stemmer does
    ("electriciti", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


def test_porter_vectors():
    bad = [(w, porter_stem(w), e) for w, e in PORTER_VECTORS
           if porter_stem(w) != e]
    assert not bad, bad


def test_porter_cache_and_guards():
    st = PorterStemmer()
    assert st("running") == "run" and st("running") == "run"
    assert st("ab") == "ab"  # <=2 unchanged
    assert st("x123") == "x123"  # non-alpha unchanged


def test_english_possessive():
    assert english_possessive("john's") == "john"
    assert english_possessive("john’s") == "john"
    assert english_possessive("his") == "his"
    assert english_possessive("s") == "s"


def test_ascii_fold():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("über") == "uber"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("œuvre") == "oeuvre"
    assert ascii_fold("łódź") == "lodz"
    assert ascii_fold("plain") == "plain"
    assert ascii_fold("ναι") == "ναι"  # non-Latin left alone


def test_shingles_no_holes():
    # TestShingleFilter bi-gram case: "please divide this sentence into shingles"
    terms = "please divide this sentence into shingles".split()
    pos = list(range(6))
    out_t, out_p = shingles(terms, pos, 2, 2, output_unigrams=True)
    assert out_t == [
        "please", "please divide", "divide", "divide this", "this",
        "this sentence", "sentence", "sentence into", "into",
        "into shingles", "shingles",
    ]
    assert out_p == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5]


def test_shingles_with_filler_holes():
    # stopword hole at position 2 → "_" filler inside shingles, no filler
    # unigram, no all-filler shingle (ShingleFilter filler semantics)
    terms = ["please", "divide", "sentence"]
    pos = [0, 1, 3]
    out_t, out_p = shingles(terms, pos, 2, 2, output_unigrams=False)
    assert out_t == ["please divide", "divide _", "_ sentence"]
    assert out_p == [0, 1, 2]


def test_shingles_trigram():
    terms = ["a", "b", "c", "d"]
    out_t, _ = shingles(terms, [0, 1, 2, 3], 2, 3, output_unigrams=False)
    assert out_t == ["a b", "a b c", "b c", "b c d", "c d"]


def test_ngram_filters():
    assert ngram_filter("abc", 1, 2) == ["a", "b", "c", "ab", "bc"]
    assert edge_ngram_filter("abcd", 1, 3) == ["a", "ab", "abc"]
    assert edge_ngram_filter("ab", 1, 5) == ["a", "ab"]


def test_synonym_filter_expand():
    m = SynonymMap({"fast": ["quick", "rapid"]})
    t, p = synonym_filter(["a", "fast", "car"], [0, 1, 2], m)
    assert t == ["a", "fast", "quick", "rapid", "car"]
    assert p == [0, 1, 1, 1, 2]
    # expand=true: class members map back
    t2, p2 = synonym_filter(["quick"], [0], m)
    assert set(t2) == {"quick", "fast", "rapid"} and p2 == [0, 0, 0]


def test_mapping_char_filter():
    f = MappingCharFilter({"c++": "cplusplus", "&": " and "})
    assert f("c++ & more") == "cplusplus  and  more"
    # longest match wins
    f2 = MappingCharFilter({"ab": "x", "abc": "y"})
    assert f2("abc") == "y"


def test_english_analyzer_chain():
    a = EnglishAnalyzer()
    terms, pos = a("John's dogs are running quickly")
    # john's → john (possessive), stopword 'are' dropped w/ hole,
    # running → run, quickly → quickli (y→i; step2 'li' isn't a rule alone)
    assert terms == ["john", "dog", "run", "quickli"]
    assert pos == [0, 1, 3, 4]


def test_shingle_analyzer():
    a = ShingleAnalyzer(2, 2, output_unigrams=False)
    t, p = a("big data engine")
    assert t == ["big data", "data engine"]
    assert p == [0, 1]


# ---------------------------------------------------------------------------
# MultiPhraseQuery


def test_multiphrase_exact(documents_index, corpus):
    from lucenenet_ray.search.query import MultiPhraseQuery, PhraseQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    path, _m = documents_index
    r = IndexReader(path)
    # degenerate single-term-per-slot MultiPhrase == PhraseQuery docs
    mq = MultiPhraseQuery(slots=((("batch",), 0), (("merge",), 1)))
    pq = PhraseQuery(terms=(("batch", 0), ("merge", 1)))
    tm, tp = search(r, mq, k=50), search(r, pq, k=50)
    assert tm.docs.tolist() == tp.docs.tolist()
    # same docs, but MultiPhraseWeight idf equals the phrase idf here, so
    # scores are identical too
    assert [float(x) for x in tm.scores] == [float(x) for x in tp.scores]

    # union slot: "batch (merge|line)" ⊇ both single phrases' doc sets
    mq2 = MultiPhraseQuery(slots=((("batch",), 0), (("merge", "line"), 1)))
    td2 = search(r, mq2, k=500)
    docs_a = set(search(r, PhraseQuery(terms=(("batch", 0), ("merge", 1))), k=500).docs.tolist())
    docs_b = set(search(r, PhraseQuery(terms=(("batch", 0), ("line", 1))), k=500).docs.tolist())
    assert set(td2.docs.tolist()) == docs_a | docs_b

    # brute-force oracle over the analyzed corpus (position-aware: stopword
    # holes break adjacency)
    from lucenenet_ray.analysis import analyze

    docs, texts, _toks = corpus
    expect = set()
    for d, x in zip(docs, texts):
        terms, pos = analyze(x)
        at = dict(zip(pos, terms))
        for p, t in at.items():
            if t == "batch" and at.get(p + 1) in ("merge", "line"):
                expect.add(d)
                break
    assert set(td2.docs.tolist()) == expect


def test_multiphrase_sloppy(documents_index, corpus):
    from lucenenet_ray.search.query import MultiPhraseQuery, PhraseQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    path, _m = documents_index
    r = IndexReader(path)
    # single-term slots with slop == sloppy PhraseQuery (same greedy scorer)
    mq = MultiPhraseQuery(slots=((("merge",), 0), (("batch",), 1)), slop=3)
    pq = PhraseQuery(terms=(("merge", 0), ("batch", 1)), slop=3)
    tm, tp = search(r, mq, k=100), search(r, pq, k=100)
    assert tm.docs.tolist() == tp.docs.tolist()
    assert [float(x) for x in tm.scores] == [float(x) for x in tp.scores]


def test_small_filters():
    from lucenenet_ray.analysis.filters import (
        KeywordMarkerStemmer,
        length_filter,
        limit_token_count,
        trim_filter,
    )

    t, p = length_filter(["a", "abc", "abcdef"], [0, 1, 2], 2, 5)
    assert t == ["abc"] and p == [1]
    assert trim_filter([" x ", "y"]) == ["x", "y"]
    t, p = limit_token_count(["a", "b", "c"], [0, 1, 2], 2)
    assert t == ["a", "b"] and p == [0, 1]
    st = KeywordMarkerStemmer(frozenset({"running"}))
    assert st("running") == "running"  # protected
    assert st("jumping") == "jump"


def test_parse_query_with_synonyms(documents_index):
    """Query-time SynonymFilter through the parser: quoted phrase with a
    stacked slot -> MultiPhraseQuery; free term -> OR group
    (QueryParserBase.GetFieldQuery stacked-token handling)."""
    from lucenenet_ray.analysis.filters import SynonymMap
    from lucenenet_ray.search.query import (
        BooleanQuery,
        MultiPhraseQuery,
        parse_query,
    )
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    m = SynonymMap({"merge": ["line"]}, expand=False)
    q = parse_query('"batch merge"', synonyms=m)
    assert isinstance(q, MultiPhraseQuery)
    assert q.slots == ((("batch",), 0), (("merge", "line"), 1))

    qf = parse_query("merge", synonyms=m)
    assert isinstance(qf, BooleanQuery) and len(qf.clauses) == 2

    # equals the hand-built MultiPhraseQuery results
    path, _m = documents_index
    r = IndexReader(path)
    td = search(r, q, k=50)
    td2 = search(r, MultiPhraseQuery(
        slots=((("batch",), 0), (("merge", "line"), 1))), k=50)
    assert td.docs.tolist() == td2.docs.tolist()

    # no synonyms -> unchanged behavior
    from lucenenet_ray.search.query import PhraseQuery

    q0 = parse_query('"batch merge"')
    assert isinstance(q0, PhraseQuery)


def test_word_delimiter():
    from lucenenet_ray.analysis.filters import word_delimiter

    assert word_delimiter("PowerShot") == ["Power", "Shot"]
    assert word_delimiter("PowerShot500") == ["Power", "Shot", "500"]
    assert word_delimiter("wi-fi") == ["wi", "fi"]
    assert word_delimiter("O'Neil's") == ["O", "Neil", "s"]
    assert word_delimiter("j2se") == ["j", "2", "se"]
    assert word_delimiter("XMLHttpRequest") == ["XMLHttp", "Request"]
    assert word_delimiter("wi-fi", catenate_all=True) == ["wi", "fi", "wifi"]
    assert word_delimiter("wi-fi", preserve_original=True) == [
        "wi-fi", "wi", "fi"]
    assert word_delimiter("plain") == ["plain"]
    assert word_delimiter("ABC500", split_on_numerics=False) == ["ABC500"]


def test_light_stemmers():
    """Rule-level goldens for the per-language light stemmers
    (GermanLightStemmer.cs / SpanishLightStemmer.cs / FrenchMinimalStemmer.cs
    semantics, worked by hand from the rule tables)."""
    from lucenenet_ray.analysis.lang_stem import (
        french_minimal_stem,
        german_light_stem,
        spanish_light_stem,
    )

    # German: -ern, -e[mnrs], -e, cons+s; then -est, -e[rn], cons+st
    assert german_light_stem("kindern") == "kind"      # step1 -ern
    assert german_light_stem("hauses") == "haus"       # step1 -es
    assert german_light_stem("katze") == "katz"        # step1 -e
    assert german_light_stem("bilds") == "bild"        # step1 cons+s
    assert german_light_stem("kleinsten") == "klein"   # -en then cons+st
    assert german_light_stem("haus") == "haus"
    assert german_light_stem("häuser") == "haus"       # fold + -er
    assert german_light_stem("rot") == "rot"

    # Spanish: <5 chars unchanged; -o/-a/-e; ces→z; [oae]s→-2
    assert spanish_light_stem("gato") == "gato"        # len 4: guard
    assert spanish_light_stem("gatos") == "gat"
    assert spanish_light_stem("luces") == "luz"
    assert spanish_light_stem("meses") == "mes"
    assert spanish_light_stem("casas") == "cas"
    assert spanish_light_stem("blanco") == "blanc"
    assert spanish_light_stem("papel") == "papel"      # no rule fires

    # French minimal: <6 chars unchanged; -aux→-al; strip s,r,e,é in
    # SEQUENCE; collapse a final double letter
    assert french_minimal_stem("chevaux") == "cheval"
    assert french_minimal_stem("cheval") == "cheval"   # len 6, ends 'l'
    assert french_minimal_stem("chanteuses") == "chanteus"
    assert french_minimal_stem("porter") == "port"     # -r then -e
    assert french_minimal_stem("belles") == "bel"      # -s, -e, dedup l
    assert french_minimal_stem("rouge") == "rouge"     # len 5: guard
    assert french_minimal_stem("grands") == "grand"


def test_light_stemmers_it_pt_ru():
    """Rule-level goldens for the round-3 languages
    (ItalianLightStemmer.cs / PortugueseLightStemmer.cs /
    RussianLightStemmer.cs semantics, worked by hand from the rule
    tables)."""
    from lucenenet_ray.analysis.lang_stem import (
        italian_light_stem,
        portuguese_light_stem,
        russian_light_stem,
    )

    # Italian: <6 unchanged; fold; final e/i/a/o with i (or h) lookback
    assert italian_light_stem("libro") == "libro"        # len 5: guard
    assert italian_light_stem("abitazione") == "abitazion"
    assert italian_light_stem("abitazioni") == "abitazion"
    assert italian_light_stem("vecchie") == "vecch"      # -ie: takes the i
    assert italian_light_stem("vecchi") == "vecc"        # h before final i
    assert italian_light_stem("ragazza") == "ragazz"
    assert italian_light_stem("ragazzo") == "ragazz"
    assert italian_light_stem("perché") == "perc"        # fold é→e; he→-2

    # Portuguese: suffix table → feminine norm → vowel strip → fold last
    assert portuguese_light_stem("casas") == "casa"      # plain -s
    assert portuguese_light_stem("corações") == "coraca" # ões→ão, -o, fold
    assert portuguese_light_stem("bons") == "bom"        # ns→m
    assert portuguese_light_stem("papéis") == "papel"    # éis→el
    assert portuguese_light_stem("normais") == "normal"  # ais→al
    assert portuguese_light_stem("barris") == "barril"   # is→il
    assert portuguese_light_stem("rapidamente") == "rapid"
    assert portuguese_light_stem("chinesa") == "chines"  # esa→ês, fold
    assert portuguese_light_stem("menina") == "menin"    # len guard on -na

    # Russian: longest-first case endings, then residual normalize
    assert russian_light_stem("красивая") == "красив"    # -ая
    assert russian_light_stem("красивыми") == "красив"   # -ыми
    assert russian_light_stem("журналами") == "журнал"   # -ами
    assert russian_light_stem("станциями") == "станц"    # -иями (4-char)
    assert russian_light_stem("книги") == "книг"         # final vowel
    assert russian_light_stem("жизнь") == "жизн"         # soft sign
    assert russian_light_stem("дом") == "дом"            # len guard


def test_cjk_bigrams():
    """CJKBigramFilter goldens (Analysis/Cjk/CJKBigramFilter.cs): bigrams
    within offset-aligned runs only; lone chars as unigrams; unflagged
    scripts and latin pass through; combined unigram+bigram interleave."""
    from lucenenet_ray.analysis.filters import CJKBigramAnalyzer, cjk_bigrams

    an = CJKBigramAnalyzer()
    # whitespace breaks offset alignment: no cross-segment bigram
    assert an("数据处 理")[0] == ["数据", "据处", "理"]
    # positions: bigram takes the first char's position
    assert an("数据处")[1] == [0, 1]
    # unflagged (katakana run, latin) pass through and break runs
    assert an("テスト 数据 engine")[0] == ["テスト", "数据", "engine"]
    # combined approach interleaves: A AB B BC C
    an2 = CJKBigramAnalyzer(output_unigrams=True)
    assert an2("数据处")[0] == ["数", "数据", "据", "据处", "处"]
    # katakana flagged: run codepoints get bigrammed
    t, _p = cjk_bigrams(["テスト"], [0], [0], scripts=("katakana",))
    assert t == ["テス", "スト"]
    # adjacent flagged tokens with aligned offsets join runs (kanji+kana)
    t, _p = cjk_bigrams(["数", "ひ"], [0, 1], [0, 1],
                        scripts=("han", "hiragana"))
    assert t == ["数ひ"]
