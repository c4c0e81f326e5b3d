"""ICU-style fold/normalize (analysis/icu_like.py) behavior pins."""

import pytest

from lucenenet_ray.analysis.icu_like import icu_fold, nfkc_casefold


@pytest.mark.parametrize("w,want", [
    ("Ruß", "russ"),          # sharp s casefolds to ss
    ("ＦＵＬＬＷＩＤＴＨ", "fullwidth"),  # compatibility width fold
    ("ﬁle", "file"),          # ligature decomposition
    ("Ⅷ", "viii"),            # roman numeral compat
    ("№", "no"),              # numero sign
    ("Ｘ①", "x1"),            # circled digit
    ("a­b", "ab"),       # soft hyphen ignorable
    ("école", "école"), # combining acute recomposes (not stripped)
])
def test_nfkc_casefold(w, want):
    assert nfkc_casefold(w) == want


@pytest.mark.parametrize("w,want", [
    ("Résumé", "resume"),
    ("ÀÉÎÕÜ", "aeiou"),
    ("Ruß", "russ"),
    ("ﬁLE", "file"),
    ("Ĺúŕ", "lur"),
    ("Ελλάδα", "ελλαδα"),     # Greek accent strip + lowercase
    ("Ёлка", "елка"),         # Cyrillic io → е after mark strip
    ("naïve", "naive"),
    ("plain", "plain"),
])
def test_icu_fold(w, want):
    assert icu_fold(w) == want


def test_fold_equals_strip_accents_lower_on_latin1_palette():
    # the gate-query contract: on precomposed Latin accents, icu_fold ==
    # lower(strip_accents(x)) (DuckDB's pair), char for char
    import duckdb

    palette = "ÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÇÑàáâãäåèéêëìíîïòóôõöùúûüçñ"
    con = duckdb.connect()
    for ch in palette:
        want = con.execute(
            "SELECT lower(strip_accents(?))", [ch]).fetchone()[0]
        assert icu_fold(ch) == want, ch
