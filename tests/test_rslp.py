"""RSLP rule-file stemmer engine (analysis/rslp.py) — interpreter
semantics vs RSLPStemmerBase.cs, data pinned to the published rule
files, and FULL reference vocabularies (TestGalicianStemFilter.cs /
TestPortugueseStemFilter.cs protocol)."""

import zipfile

import pytest

from lucenenet_ray.analysis.rslp import (Rule, apply_step, galician_stem,
                                         make_step, parse_rslp,
                                         portuguese_rslp_stem)

_GL_ZIP = ("/root/reference/src/Lucene.Net.Tests.Analysis.Common/"
           "Analysis/Gl/gltestdata.zip")
_PT_ZIP = ("/root/reference/src/Lucene.Net.Tests.Analysis.Common/"
           "Analysis/Pt/ptrslptestdata.zip")


@pytest.mark.parametrize("zpath,member,fn", [
    (_GL_ZIP, "gl.txt", galician_stem),
    (_PT_ZIP, "ptrslp.txt", portuguese_rslp_stem),
])
def test_full_reference_vocabulary(zpath, member, fn):
    z = zipfile.ZipFile(zpath)
    pairs = [ln.split("\t") for ln in
             z.read(member).decode("utf-8").splitlines() if ln]
    assert len(pairs) > 9000
    bad = [(w, want, fn(w)) for w, want in pairs if fn(w) != want]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_step_min_word_autocompute():
    # min_word=0 → min over rules of (min_stem + len(suffix))
    st = make_step("x", 0, True, (), (Rule("inho", 3, "", ()),
                                      Rule("s", 2, "", ())))
    assert st.min_word == 3


def test_first_matching_rule_wins():
    st = make_step("x", 1, True, (), (Rule("es", 1, "X", ()),
                                      Rule("s", 1, "Y", ())))
    assert apply_step("cases", st) == "casX"


def test_whole_word_vs_suffix_exceptions():
    whole = make_step("w", 1, True, (), (Rule("s", 1, "", ("mais",)),))
    assert apply_step("mais", whole) == "mais"      # whole-word blocked
    assert apply_step("demais", whole) == "demai"   # not the whole word
    sufx = make_step("s", 1, False, (), (Rule("s", 1, "", ("mais",)),))
    assert apply_step("mais", sufx) == "mais"
    assert apply_step("demais", sufx) == "demais"   # ends-with blocked


def test_entry_suffix_gate_and_min_word():
    st = make_step("x", 4, True, ("a",), (Rule("a", 1, "o", ()),))
    assert apply_step("ba", st) == "ba"     # below min_word
    assert apply_step("boba", st) == "bobo"
    assert apply_step("bobo", st) == "bobo"  # entry gate: must end 'a'


def test_min_stem_measured_before_replacement():
    st = make_step("x", 1, True, (), (Rule("ns", 1, "m", ()),))
    assert apply_step("bons", st) == "bom"
    assert apply_step("ns", st) == "ns"  # stem '' < min 1


def test_parse_rslp_pins_generated_data():
    """The committed rslp_gl/rslp_pt data must equal a fresh parse of the
    published rule files (catches hand-edits drifting from the spec)."""
    from lucenenet_ray.analysis.rslp_gl import STEPS as GL
    from lucenenet_ray.analysis.rslp_pt import STEPS as PT

    gl_src = ("/root/reference/src/Lucene.Net.Analysis.Common/Analysis/"
              "Gl/galician.rslp")
    pt_src = ("/root/reference/src/Lucene.Net.Analysis.Common/Analysis/"
              "Pt/portuguese.rslp")
    assert parse_rslp(open(gl_src, encoding="utf-8").read()) == GL
    assert parse_rslp(open(pt_src, encoding="utf-8").read()) == PT


def test_spot_vectors():
    # from the rule files' own comments / the RSLP paper examples
    assert portuguese_rslp_stem("felizmente") == "feliz"
    assert portuguese_rslp_stem("barris") == "barril"
    assert galician_stem("") == ""
    assert portuguese_rslp_stem("") == ""


def test_lang_dispatch_has_gl_and_pt_rslp():
    from lucenenet_ray.analysis.lang_stem import _STEM_FN

    assert _STEM_FN["gl"] is galician_stem
    assert _STEM_FN["pt_rslp"] is portuguese_rslp_stem


def test_minimal_stemmers_full_vocabulary_and_vectors():
    """RSLP-S plural-only variants (GalicianMinimalStemmer.cs /
    PortugueseMinimalStemmer.cs): pt pinned by the reference's full
    ptminimal.txt vocabulary; gl by TestGalicianMinimalStemFilter.cs
    vectors (plural + whole-word exceptions)."""
    from lucenenet_ray.analysis.rslp import (galician_minimal_stem,
                                             portuguese_minimal_stem)

    z = zipfile.ZipFile(
        "/root/reference/src/Lucene.Net.Tests.Analysis.Common/Analysis/"
        "Pt/ptminimaltestdata.zip")
    pairs = [ln.split("\t") for ln in
             z.read("ptminimal.txt").decode("utf-8").splitlines() if ln]
    bad = [(w, want, portuguese_minimal_stem(w))
           for w, want in pairs if portuguese_minimal_stem(w) != want]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"
    for w, want in [("elefantes", "elefante"), ("elefante", "elefante"),
                    ("kalóres", "kalór"), ("kalór", "kalór"),
                    ("mas", "mas"), ("barcelonês", "barcelonês")]:
        assert galician_minimal_stem(w) == want, w


def test_galician_analyzer_chain():
    """GalicianAnalyzer.cs chain: lowercase → galician stop →
    GalicianStemFilter (TestGalicianAnalyzer.cs shapes)."""
    from lucenenet_ray.analysis.lang import MultiLangAnalyzer

    ml = MultiLangAnalyzer()
    terms, _pos = ml("correspondente correspondemos", "gl")
    assert terms == ["correspond", "correspond"]
    # stopword dropped
    terms, _pos = ml("aínda zaldi", "gl")
    assert terms == [galician_stem("zaldi")]
