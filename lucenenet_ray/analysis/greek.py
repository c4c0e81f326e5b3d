"""Greek analysis chain (``Lucene.Net.Analysis.El``):

- :func:`greek_lowercase` — GreekLowerCaseFilter.cs: lowercase + final
  sigma ς→σ + tonos/dialytika diacritic folds.
- :func:`greek_stem` — GreekStemmer.cs (Ntais' modification of the Kalamboukis
  & Nikolaidis stemmer): 23 ordered rules with exception word-lists; the
  exception sets match the WHOLE remaining stem (CharArraySet.Contains),
  the inline conditions are endswith checks. Rule 21 fires only if rules
  0–20 left the length unchanged. The reference's operator-precedence
  quirks in Rule8's length guards are reproduced bit-for-bit.

Works on lowercased, diacritic-folded input (chain: tokenize →
greek_lowercase → stop → greek_stem).
"""

from __future__ import annotations

_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")

_GREEK_LOWER = {
    "ς": "σ",
    "Ά": "α", "ά": "α",
    "Έ": "ε", "έ": "ε",
    "Ή": "η", "ή": "η",
    "Ί": "ι", "Ϊ": "ι", "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
    "Ό": "ο", "ό": "ο",
    "Ώ": "ω", "ώ": "ω",
}


def greek_lowercase(term: str) -> str:
    """GreekLowerCaseFilter.LowerCase per code point."""
    return "".join(_GREEK_LOWER.get(ch, ch.lower()) for ch in term)


def _ev(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


def _ev_no_y(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS_NO_Y


_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"])
_EXC7 = frozenset(["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                   "πεθ", "πικρ", "ποτ", "σιχ", "χ"])
_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])
_EXC9 = frozenset(["αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                   "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                   "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ",
                   "εμ", "θαρρ", "θ"])
_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset(["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"])
_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
_EXC14 = frozenset(["φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ",
                    "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ",
                    "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
                    "τσα"])
_EXC15A = frozenset([
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι",
    "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
    "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
    "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ",
    "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ",
    "π", "τρ", "μ"])
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])
_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"])
_EXC17 = frozenset(["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                    "ευχρ", "κοινοχρ", "παλιμψ"])
_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])
_EXC19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"])


def _rule0(w: str) -> str:
    n = len(w)
    if n > 9 and w.endswith(("καθεστωτοσ", "καθεστωτων")):
        return w[:-4]
    if n > 8 and w.endswith(("γεγονοτοσ", "γεγονοτων")):
        return w[:-4]
    if n > 8 and w.endswith("καθεστωτα"):
        return w[:-3]
    if n > 7 and w.endswith(("τατογιου", "τατογιων")):
        return w[:-4]
    if n > 7 and w.endswith("γεγονοτα"):
        return w[:-3]
    if n > 7 and w.endswith("καθεστωσ"):
        return w[:-2]
    # reference quirk: the first alternative carries the len guard, the
    # rest are unguarded (operator precedence in the original source)
    if (n > 6 and w.endswith("σκαγιου")) or w.endswith(
            ("σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
             "περατοσ", "περατων", "τερατοσ", "τερατων")):
        return w[:-4]
    if n > 6 and w.endswith("τατογια"):
        return w[:-3]
    if n > 6 and w.endswith("γεγονοσ"):
        return w[:-2]
    if n > 5 and w.endswith(("φαγιου", "φαγιων", "σογιου", "σογιων")):
        return w[:-4]
    if n > 5 and w.endswith(("σκαγια", "ολογια", "κρεατα", "περατα",
                             "τερατα")):
        return w[:-3]
    if n > 4 and w.endswith(("φαγια", "σογια", "φωτοσ", "φωτων")):
        return w[:-3]
    if n > 4 and w.endswith(("κρεασ", "περασ", "τερασ")):
        return w[:-2]
    if n > 3 and w.endswith("φωτα"):
        return w[:-2]
    if n > 2 and w.endswith("φωσ"):
        return w[:-1]
    return w


def _rule1(w: str) -> str:
    if len(w) > 4 and w.endswith(("αδεσ", "αδων")):
        w = w[:-4]
        if not w.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                           "νταντ", "κυρ", "θει", "πεθερ")):
            w += "αδ"
    return w


def _rule2(w: str) -> str:
    if len(w) > 4 and w.endswith(("εδεσ", "εδων")):
        w = w[:-4]
        if w.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                       "μιλ")):
            w += "εδ"
    return w


def _rule3(w: str) -> str:
    if len(w) > 5 and w.endswith(("ουδεσ", "ουδων")):
        w = w[:-5]
        if w.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ",
                       "σ", "φλ", "φρ", "βελ", "λουλ", "χν", "σπ",
                       "τραγ", "φε")):
            w += "ουδ"
    return w


def _rule4(w: str) -> str:
    if len(w) > 3 and w.endswith(("εωσ", "εων")):
        w = w[:-3]
        if w in _EXC4:
            w += "ε"
    return w


def _rule5(w: str) -> str:
    if len(w) > 2 and w.endswith("ια"):
        w = w[:-2]
        if _ev(w):
            w += "ι"
    elif len(w) > 3 and w.endswith(("ιου", "ιων")):
        w = w[:-3]
        if _ev(w):
            w += "ι"
    return w


def _rule6(w: str) -> str:
    removed = False
    if len(w) > 3 and w.endswith(("ικα", "ικο")):
        w = w[:-3]
        removed = True
    elif len(w) > 4 and w.endswith(("ικου", "ικων")):
        w = w[:-4]
        removed = True
    if removed and (_ev(w) or w in _EXC6):
        w += "ικ"
    return w


def _rule7(w: str) -> str:
    if len(w) == 5 and w.endswith("αγαμε"):
        return w[:-1]
    if len(w) > 7 and w.endswith("ηθηκαμε"):
        w = w[:-7]
    elif len(w) > 6 and w.endswith("ουσαμε"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("αγαμε", "ησαμε", "ηκαμε")):
        w = w[:-5]
    if len(w) > 3 and w.endswith("αμε"):
        w = w[:-3]
        if w in _EXC7:
            w += "αμ"
    return w


def _rule8(w: str) -> str:
    removed = False
    # reference precedence quirks preserved: only the FIRST alternative in
    # each elif carries the length guard
    if len(w) > 8 and w.endswith("ιουντανε"):
        w = w[:-8]
        removed = True
    elif (len(w) > 7 and w.endswith("ιοντανε")) or w.endswith(
            ("ουντανε", "ηθηκανε")):
        w = w[:-7]
        removed = True
    elif (len(w) > 6 and w.endswith("ιοτανε")) or w.endswith(
            ("οντανε", "ουσανε")):
        w = w[:-6]
        removed = True
    elif (len(w) > 5 and w.endswith("αγανε")) or w.endswith(
            ("ησανε", "οτανε", "ηκανε")):
        w = w[:-5]
        removed = True
    if removed and w in _EXC8A:
        w += "αγαν"
    if len(w) > 3 and w.endswith("ανε"):
        w = w[:-3]
        if _ev_no_y(w) or w in _EXC8B:
            w += "αν"
    return w


def _rule9(w: str) -> str:
    if len(w) > 5 and w.endswith("ησετε"):
        w = w[:-5]
    if len(w) > 3 and w.endswith("ετε"):
        w = w[:-3]
        if (w in _EXC9 or _ev_no_y(w) or w.endswith(
                ("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
                 "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
                 "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
                 "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ"))):
            w += "ετ"
    return w


def _rule10(w: str) -> str:
    if len(w) > 5 and w.endswith(("οντασ", "ωντασ")):
        w = w[:-5]
        if len(w) == 3 and w == "αρχ":
            w += "οντ"
        if w.endswith("κρε"):
            w += "ωντ"
    return w


def _rule11(w: str) -> str:
    if len(w) > 6 and w.endswith("ομαστε"):
        w = w[:-6]
        if len(w) == 2 and w == "ον":
            w += "ομαστ"
    elif len(w) > 7 and w.endswith("ιομαστε"):
        w = w[:-7]
        if len(w) == 2 and w == "ον":
            w += "ομαστ"
    return w


def _rule12(w: str) -> str:
    if len(w) > 5 and w.endswith("ιεστε"):
        w = w[:-5]
        if w in _EXC12A:
            w += "ιεστ"
    if len(w) > 4 and w.endswith("εστε"):
        w = w[:-4]
        if w in _EXC12B:
            w += "εστ"
    return w


def _rule13(w: str) -> str:
    if len(w) > 6 and w.endswith("ηθηκεσ"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("ηθηκα", "ηθηκε")):
        w = w[:-5]
    removed = False
    if len(w) > 4 and w.endswith("ηκεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ηκα", "ηκε")):
        w = w[:-3]
        removed = True
    if removed and (w in _EXC13 or w.endswith(
            ("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ"))):
        w += "ηκ"
    return w


def _rule14(w: str) -> str:
    removed = False
    if len(w) > 5 and w.endswith("ουσεσ"):
        w = w[:-5]
        removed = True
    elif len(w) > 4 and w.endswith(("ουσα", "ουσε")):
        w = w[:-4]
        removed = True
    if removed and (w in _EXC14 or _ev(w) or w.endswith(
            ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
             "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ"))):
        w += "ουσ"
    return w


def _rule15(w: str) -> str:
    removed = False
    if len(w) > 4 and w.endswith("αγεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("αγα", "αγε")):
        w = w[:-3]
        removed = True
    if removed:
        cond1 = w in _EXC15A or w.endswith(
            ("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ", "λοχ",
             "σμην"))
        cond2 = w in _EXC15B or w.endswith("κολλ")
        if cond1 and not cond2:
            w += "αγ"
    return w


def _rule16(w: str) -> str:
    removed = False
    if len(w) > 4 and w.endswith("ησου"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ησε", "ησα")):
        w = w[:-3]
        removed = True
    if removed and w in _EXC16:
        w += "ησ"
    return w


def _rule17(w: str) -> str:
    if len(w) > 4 and w.endswith("ηστε"):
        w = w[:-4]
        if w in _EXC17:
            w += "ηστ"
    return w


def _rule18(w: str) -> str:
    removed = False
    if len(w) > 6 and w.endswith(("ησουνε", "ηθουνε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουνε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC18:
        w += "ουν"
    return w


def _rule19(w: str) -> str:
    removed = False
    if len(w) > 6 and w.endswith(("ησουμε", "ηθουμε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουμε"):
        w = w[:-4]
        removed = True
    if removed and w in _EXC19:
        w += "ουμ"
    return w


def _rule20(w: str) -> str:
    if len(w) > 5 and w.endswith(("ματων", "ματοσ")):
        return w[:-3]
    if len(w) > 4 and w.endswith("ματα"):
        return w[:-2]
    return w


_R21_TIERS = (
    (9, ("ιοντουσαν",), 9),
    (8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν"), 8),
    (7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
         "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
         "ουμαστε"), 7),
    (6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
         "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε"), 6),
    (5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
         "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
         "οσουν", "ουμαι", "ουσαν"), 5),
    (4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
         "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
         "οταν"), 4),
    (3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ"), 3),
    (2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
         "ων"), 2),
)


def _rule21(w: str) -> str:
    for guard, sufs, cut in _R21_TIERS:
        if len(w) > guard and w.endswith(sufs):
            return w[:-cut]
    if len(w) > 1 and _ev(w):
        return w[:-1]
    return w


def _rule22(w: str) -> str:
    if w.endswith(("εστερ", "εστατ")):
        return w[:-5]
    if w.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return w[:-4]
    return w


_RULES_0_20 = (_rule0, _rule1, _rule2, _rule3, _rule4, _rule5, _rule6,
               _rule7, _rule8, _rule9, _rule10, _rule11, _rule12,
               _rule13, _rule14, _rule15, _rule16, _rule17, _rule18,
               _rule19, _rule20)


def greek_stem(w: str) -> str:
    """GreekStemmer.Stem over one lowercased token."""
    if len(w) < 4:
        return w
    orig = len(w)
    for rule in _RULES_0_20:
        w = rule(w)
    if len(w) == orig:
        w = _rule21(w)
    return _rule22(w)


GREEK_STOP = frozenset(
    "ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε "
    "ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα "
    "μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο "
    "ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ "
    "αυτα εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ "
    "οπωσ ομωσ ισωσ οσο οτι".split())


class GreekAnalyzer:
    """GreekAnalyzer.cs chain: tokenize → GreekLowerCaseFilter → stop →
    GreekStemFilter. The stop set is the reference's unaccented Greek list
    (stopwords.txt), checked AFTER the Greek fold like the reference."""

    def __init__(self, stop_words: frozenset[str] = GREEK_STOP):
        self.stop_words = stop_words
        self._cache: dict[str, str] = {}

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        terms: list[str] = []
        positions: list[int] = []
        pos = -1
        cache = self._cache
        for tok in text.split():
            pos += 1
            low = greek_lowercase(tok)
            if low in self.stop_words:
                continue
            s = cache.get(low)
            if s is None:
                s = greek_stem(low)
                cache[low] = s
            terms.append(s)
            positions.append(pos)
        return terms, positions
