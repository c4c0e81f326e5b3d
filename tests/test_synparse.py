"""Synonym file parsers (analysis/synparse.py) vs the reference tests
(TestSolrSynonymParser.cs / TestWordnetSynonymParser.cs goldens)."""

import pytest

from lucenenet_ray.analysis.synparse import (
    WORD_SEPARATOR as SEP,
    parse_solr_synonyms,
    parse_wordnet_synonyms,
)


def ws_analyze(text: str) -> str:
    """MockAnalyzer(WHITESPACE, lowercase) analog used by the ref tests."""
    toks = text.lower().split()
    if not toks:
        raise ValueError(f"term: {text} analyzes to nothing")
    return SEP.join(toks)


SOLR_FILE = ("i-pod, ipod, ipoooood\n"
             "foo => foo bar\n"
             "foo => baz\n"
             "this test, that testing")


def test_solr_simple_expand():
    p = parse_solr_synonyms(SOLR_FILE, expand=True, analyze=ws_analyze)
    d = {}
    for i, o in p.pairs:
        d.setdefault(i, []).append(o)
    # equivalence class all-pairs incl. self (TestSolrSynonymParser
    # TestSimple: i-pod → i-pod, ipod, ipoooood)
    assert d["i-pod"] == ["i-pod", "ipod", "ipoooood"]
    assert d["ipoooood"] == ["i-pod", "ipod", "ipoooood"]
    # merged explicit mappings: foo => foo bar, baz (expand ignored)
    assert d["foo"] == [f"foo{SEP}bar", "baz"]
    # multiword equivalence line
    assert d[f"this{SEP}test"] == [f"this{SEP}test", f"that{SEP}testing"]
    assert p.n_multiword > 0


def test_solr_noexpand_maps_to_first():
    p = parse_solr_synonyms("a, b, c", expand=False, analyze=ws_analyze)
    assert p.pairs == (("a", "a"), ("b", "a"), ("c", "a"))


def test_solr_comments_escapes_dedup():
    p = parse_solr_synonyms("# comment\n\na\\,b, c\na\\,b, c\n",
                            analyze=ws_analyze)
    d = dict()
    for i, o in p.pairs:
        d.setdefault(i, []).append(o)
    assert d["a,b"] == ["a,b", "c"]          # escape removed, dedup'd
    assert len(p.pairs) == 4                 # 2x2 all-pairs, no repeats


def test_solr_invalid_double_map():
    with pytest.raises(ValueError, match="line 1"):
        parse_solr_synonyms("a => b => c", analyze=ws_analyze)


def test_solr_analyzes_to_nothing():
    with pytest.raises(ValueError, match="line 1"):
        parse_solr_synonyms("a => .")  # '.' → zero tokens (default chain)


WORDNET_FILE = ("s(100000001,1,'woods',n,1,0).\n"
                "s(100000001,2,'wood',n,1,0).\n"
                "s(100000001,3,'forest',n,1,0).\n"
                "s(100000002,1,'wolfish',n,1,0).\n"
                "s(100000002,2,'ravenous',n,1,0).\n"
                "s(100000003,1,'king',n,1,1).\n"
                "s(100000003,2,'baron',n,1,1).\n"
                "s(100000004,1,'king''s evil',n,1,1).\n"
                "s(100000004,2,'king''s meany',n,1,1).\n")


def test_wordnet_expand():
    p = parse_wordnet_synonyms(WORDNET_FILE, expand=True, analyze=ws_analyze)
    d = {}
    for i, o in p.pairs:
        d.setdefault(i, []).append(o)
    assert d["woods"] == ["woods", "wood", "forest"]
    assert d["king"] == ["king", "baron"]
    # '' un-doubles to ': king's evil ↔ king's meany (multiword)
    assert d[f"king's{SEP}evil"] == [f"king's{SEP}evil", f"king's{SEP}meany"]


def test_wordnet_noexpand():
    p = parse_wordnet_synonyms(WORDNET_FILE, expand=False,
                               analyze=ws_analyze)
    d = {}
    for i, o in p.pairs:
        d.setdefault(i, []).append(o)
    assert d["wood"] == ["woods"]
    assert d["baron"] == ["king"]
    # singleton synsets would be dropped (size <= 1 → AddInternal no-op)
    p1 = parse_wordnet_synonyms("s(100000009,1,'lonely',n,1,0).\n",
                                analyze=ws_analyze)
    assert p1.pairs == ()


def test_build_map_feeds_synonym_filter():
    from lucenenet_ray.analysis.filters import synonym_filter

    p = parse_solr_synonyms("fast, quick\nbig => large", analyze=ws_analyze)
    sm = p.build_map()
    terms, pos = synonym_filter(["a", "fast", "big"], [0, 1, 2], sm)
    assert terms == ["a", "fast", "quick", "big", "large"]
    assert pos == [0, 1, 1, 2, 2]
