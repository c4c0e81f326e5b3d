"""Original GermanStemmer (Caumanns) vs the reference vocabulary file
(Tests.Analysis.Common/Analysis/De/data.txt)."""

from lucenenet_ray.analysis.german_stemmer import german_stem

DATA = ("/root/reference/src/Lucene.Net.Tests.Analysis.Common/"
        "Analysis/De/data.txt")


def test_vocabulary_file():
    n = 0
    for line in open(DATA):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) != 2:
            continue
        w, want = parts
        assert german_stem(w) == want, w
        n += 1
    assert n >= 25


def test_digraph_round_trip():
    # sch/ch/ei/ie/ig/st markers must resubstitute exactly
    assert german_stem("abschließen") == "abschliess"
    assert german_stem("häufig") == "haufig"


def test_non_letter_passthrough():
    assert german_stem("abc123") == "abc123"
