"""Per-language light stemmers (Savoy's light-stemming family, the
reference's 4.8-default stem filters).

Semantics re-expressed rule-for-rule from:
- ``Analysis/De/GermanLightStemmer.cs`` (accent fold + 2 suffix steps)
- ``Analysis/Es/SpanishLightStemmer.cs`` (accent fold + plural/gender rules)
- ``Analysis/Fr/FrenchMinimalStemmer.cs`` (aux→al, s/r/e/é strip, dedup)
- ``Analysis/It/ItalianLightStemmer.cs`` (Savoy CLEF-2001: fold + final
  vowel with i/h lookback)
- ``Analysis/Pt/PortugueseLightStemmer.cs`` (Savoy UniNE: plural table,
  feminine normalization, vowel strip, fold)
- ``Analysis/Ru/RussianLightStemmer.cs`` (Dolamic & Savoy: longest-first
  case endings + residual normalize)
- ``Analysis/Fi/FinnishLightStemmer.cs`` (Savoy CLEF-2003: recursive
  particle strip, case step, hde→ksi + k/p/t gemination normalize)
- ``Analysis/Hu/HungarianLightStemmer.cs`` (case, possessive, plural -k,
  final-vowel normalize)
- ``Analysis/Cz/CzechStemmer.cs`` (case + possessive + palatalization undo)
- ``Analysis/Id/IndonesianStemmer.cs`` (particle/possessive suffixes,
  flag-gated derivational prefix+suffix interplay)
- ``Analysis/Lv/LatvianStemmer.cs`` (vowel-count-gated affix table +
  unpalatalization repairs)
- ``Analysis/En/EnglishMinimalStemmer.cs`` (Harman S-stemmer)

They chain after lowercase + stop filtering, like GermanAnalyzer.cs /
SpanishAnalyzer.cs / FrenchAnalyzer.cs build their TokenStreamComponents.
All three are pure per-token functions — memo-cached per analyzer instance
(the stateful-stage pattern; web text repeats tokens heavily).
"""

from __future__ import annotations

from lucenenet_ray.analysis.lang import LangAnalyzer

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")

_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(w: str) -> str:
    """GermanLightStemmer.Stem: fold accents; step1 strips -ern / -e[mnrs]
    / -e / consonant+-s; step2 strips -est / -e[rn] / consonant+-st."""
    w = w.translate(_DE_FOLD)
    n = len(w)
    # step 1
    if n > 5 and w.endswith("ern"):
        w = w[:-3]
    elif n > 4 and n >= 2 and w[-2] == "e" and w[-1] in "mnrs":
        w = w[:-2]
    elif n > 3 and w.endswith("e"):
        w = w[:-1]
    elif n > 3 and w.endswith("s") and w[-2] in _ST_ENDING:
        w = w[:-1]
    # step 2
    n = len(w)
    if n > 5 and w.endswith("est"):
        w = w[:-3]
    elif n > 4 and w[-2] == "e" and w[-1] in "rn":
        w = w[:-2]
    elif n > 4 and w.endswith("st") and w[-3] in _ST_ENDING:
        w = w[:-2]
    return w


def spanish_light_stem(w: str) -> str:
    """SpanishLightStemmer.Stem: words <5 chars unchanged; fold accents;
    strip final -o/-a/-e; plural rules for -s (eses→es, ces→z, os/as/es→-2)."""
    if len(w) < 5:
        return w
    w = w.translate(_ES_FOLD)
    if w[-1] in "oae":
        return w[:-1]
    if w[-1] == "s" and len(w) >= 4:
        if w.endswith("eses"):
            return w[:-2]
        if w.endswith("ces"):
            return w[:-3] + "z"
        if w[-2] in "oae":
            return w[:-2]
    return w


def french_minimal_stem(w: str) -> str:
    """FrenchMinimalStemmer.Stem: words <6 chars unchanged; -aux→-al;
    then strip one each of trailing s, r, e, é; collapse a final double
    letter."""
    if len(w) < 6:
        return w
    if w.endswith("x"):
        if w.endswith("aux"):
            w = w[:-3] + "al"
        else:
            w = w[:-1]
        return w
    if w.endswith("s"):
        w = w[:-1]
    if w.endswith("r"):
        w = w[:-1]
    if w.endswith("e"):
        w = w[:-1]
    if w.endswith("é"):
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2]:
        w = w[:-1]
    return w


_IT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def italian_light_stem(w: str) -> str:
    """ItalianLightStemmer.Stem (Savoy CLEF-2001 algorithm,
    ``Analysis/It/ItalianLightStemmer.cs``): words <6 chars unchanged;
    fold accents; strip a final -e/-i/-a/-o, taking the preceding i (or h
    before e/i) with it."""
    if len(w) < 6:
        return w
    w = w.translate(_IT_FOLD)
    last, prev = w[-1], w[-2]
    if last == "e":
        return w[:-2] if prev in "ih" else w[:-1]
    if last == "i":
        return w[:-2] if prev in "hi" else w[:-1]
    if last in "ao":
        return w[:-2] if prev == "i" else w[:-1]
    return w


_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(w: str) -> str:
    n = len(w)
    if n > 4 and w.endswith("es") and w[-3] in "rslz":
        return w[:-2]
    if n > 3 and w.endswith("ns"):
        return w[:-2] + "m"
    if n > 4 and (w.endswith("eis") or w.endswith("éis")):
        return w[:-3] + "el"
    if n > 4 and w.endswith("ais"):
        return w[:-3] + "al"
    if n > 4 and w.endswith("óis"):
        return w[:-3] + "ol"
    if n > 4 and w.endswith("is"):
        return w[:-1] + "l"
    if n > 3 and (w.endswith("ões") or w.endswith("ães")):
        return w[:-3] + "ão"
    if n > 6 and w.endswith("mente"):
        return w[:-5]
    if n > 3 and w.endswith("s"):
        return w[:-1]
    return w


def _pt_norm_feminine(w: str) -> str:
    n = len(w)
    if n > 7 and (w.endswith("inha") or w.endswith("iaca")
                  or w.endswith("eira")):
        return w[:-1] + "o"
    if n > 6:
        if w[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return w[:-1] + "o"
        if w.endswith("ona"):
            return w[:-3] + "ão"
        if w.endswith("ora"):
            return w[:-1]
        if w.endswith("esa"):
            return w[:-3] + "ês"
        if w.endswith("na"):
            return w[:-2] + "no"
    return w


def portuguese_light_stem(w: str) -> str:
    """PortugueseLightStemmer.Stem (Savoy's UniNE algorithm,
    ``Analysis/Pt/PortugueseLightStemmer.cs``): plural/suffix removal →
    feminine normalization → final-vowel strip → accent/cedilla fold
    (fold LAST, matching the reference's pass order — the suffix rules
    see the accented forms)."""
    if len(w) < 4:
        return w
    w = _pt_remove_suffix(w)
    if len(w) > 3 and w.endswith("a"):
        w = _pt_norm_feminine(w)
    if len(w) > 4 and w[-1] in "eao":
        w = w[:-1]
    return w.translate(_PT_FOLD)


_RU_3SUF = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
            "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2SUF = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
            "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
            "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def russian_light_stem(w: str) -> str:
    """RussianLightStemmer.Stem (Dolamic & Savoy, 'Indexing and Searching
    Strategies for the Russian Language',
    ``Analysis/Ru/RussianLightStemmer.cs``): longest-first case-ending
    removal, then normalize a residual soft sign / -и / doubled -нн."""
    n = len(w)
    if n > 6 and (w.endswith("иями") or w.endswith("оями")):
        w = w[:-4]
    elif n > 5 and w.endswith(_RU_3SUF):
        w = w[:-3]
    elif n > 4 and w.endswith(_RU_2SUF):
        w = w[:-2]
    elif n > 3 and w[-1] in "аеиоуйыяь":
        w = w[:-1]
    # normalize
    if len(w) > 3:
        if w[-1] in "ьи":
            w = w[:-1]
        elif w.endswith("нн"):
            w = w[:-1]
    return w


_SV_4SUF = ("arne", "erna", "ande", "else", "aste", "orna", "aren")
_SV_2SUF = ("ar", "er", "or", "en", "at", "te", "et")


def swedish_light_stem(w: str) -> str:
    """SwedishLightStemmer.Stem (Savoy's light stemmer for Swedish,
    ``Analysis/Sv/SwedishLightStemmer.cs``): possessive -s then ONE
    longest-first suffix strip; length guards are on the pre-strip
    length at each step like the reference's running ``len``."""
    n = len(w)
    if n > 4 and w[-1] == "s":
        w = w[:-1]
        n -= 1
    if n > 7 and (w.endswith("elser") or w.endswith("heten")):
        return w[:-5]
    if n > 6 and w.endswith(_SV_4SUF):
        return w[:-4]
    if n > 5 and (w.endswith("are") or w.endswith("ast")
                  or w.endswith("het")):
        return w[:-3]
    if n > 4 and w.endswith(_SV_2SUF):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


_NO_4SUF = ("ende", "else", "este", "eren")  # Bokmål set
_NO_3SUF = ("ere", "est", "ene")
_NO_2SUF = ("er", "en", "et", "st", "te")


def norwegian_light_stem(w: str) -> str:
    """NorwegianLightStemmer.Stem with the default BOKMAAL flag
    (``Analysis/No/NorwegianLightStemmer.cs``): possessive -s, then one
    longest-first strip from the Bokmål ending sets."""
    n = len(w)
    if n > 4 and w[-1] == "s":
        w = w[:-1]
        n -= 1
    if n > 7 and (w.endswith("heter") or w.endswith("heten")):
        return w[:-5]
    if n > 5 and (w.endswith("dom") or w.endswith("het")):
        return w[:-3]
    if n > 7 and (w.endswith("elser") or w.endswith("elsen")):
        return w[:-5]
    if n > 6 and w.endswith(_NO_4SUF):
        return w[:-4]
    if n > 5 and w.endswith(_NO_3SUF):
        return w[:-3]
    if n > 4 and w.endswith(_NO_2SUF):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(w: str) -> str:
    """FinnishLightStemmer.Step1: recursive -kin / -ko strip, then the
    -dellinen / -dellisuus adjective endings."""
    if len(w) > 8:
        if w.endswith("kin"):
            return _fi_step1(w[:-3])
        if w.endswith("ko"):
            return _fi_step1(w[:-2])
    if len(w) > 11:
        if w.endswith("dellinen"):
            return w[:-8]
        if w.endswith("dellisuus"):
            return w[:-9]
    return w


def _fi_step3(w: str) -> str:
    n = len(w)
    if n > 8:
        if w.endswith("nnen"):
            return w[:-4] + "s"
        if w.endswith("ntena"):
            return w[:-5] + "s"
        if w.endswith("tten"):
            return w[:-4]
        if w.endswith("eiden"):
            return w[:-5]
    if n > 6:
        if w.endswith(("neen", "niin", "seen", "teen", "inen")):
            return w[:-4]
        if w[-3] == "h" and w[-2] in _FI_VOWELS and w[-1] == "n":
            return w[:-3]
        if w.endswith("den"):
            return w[:-3] + "s"
        if w.endswith("ksen"):
            return w[:-4] + "s"
        if w.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return w[:-3]
    if n > 5:
        if w.endswith(("na", "ne")):
            return w[:-2]
        if w.endswith("nei"):
            return w[:-3]
    if n > 4:
        if w.endswith(("ja", "ta")):
            return w[:-2]
        if w[-1] == "a":
            return w[:-1]
        if w[-1] == "n" and w[-2] in _FI_VOWELS:
            return w[:-2]
        if w[-1] == "n":
            return w[:-1]
    return w


def finnish_light_stem(w: str) -> str:
    """FinnishLightStemmer.Stem (Savoy CLEF-2003,
    ``Analysis/Fi/FinnishLightStemmer.cs``): fold ä/å/ö, then the
    particle / case / possessive steps, then the two normalizations
    (hde→ksi, residual vowel strips, k/p/t gemination collapse)."""
    if len(w) < 4:
        return w
    w = w.translate(_FI_FOLD)
    w = _fi_step1(w)
    # step 2
    if len(w) > 5:
        if w.endswith(("lla", "tse", "sti")):
            w = w[:-3]
        elif w.endswith("ni"):
            w = w[:-2]
        elif w.endswith("aa"):
            w = w[:-1]
    w = _fi_step3(w)
    # norm 1
    if len(w) > 5 and w.endswith("hde"):
        w = w[:-3] + "ksi"
    if len(w) > 4 and w.endswith(("ei", "at")):
        w = w[:-2]
    elif len(w) > 3 and w[-1] in "tsjeai":
        w = w[:-1]
    # norm 2
    if len(w) > 8 and w[-1] in "eou":
        w = w[:-1]
    if len(w) > 4:
        if w[-1] == "i":
            w = w[:-1]
        if len(w) > 4:
            out = [w[0]]
            for c in w[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            w = "".join(out)
    return w


_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeiooooouuuu")
_HU_VOWELS = frozenset("aeiouy")
_HU_3SUF = ("nak", "nek", "val", "vel", "ert", "rol", "ban", "ben", "bol",
            "nal", "nel", "hoz", "hez", "tol")
_HU_2SUF = ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig")


def _hu_remove_case(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("kent"):
        return w[:-4]
    if n > 5:
        if w.endswith(_HU_3SUF):
            return w[:-3]
        if w.endswith(("al", "el")) and w[-3] not in _HU_VOWELS \
                and w[-3] == w[-4]:
            return w[:-3]
    if n > 4:
        if w.endswith(_HU_2SUF):
            return w[:-2]
        if w.endswith(("on", "en")) and w[-3] not in _HU_VOWELS:
            return w[:-2]
        if w[-1] in "tn":
            return w[:-1]
        if w[-1] in "ae" and w[-2] == w[-3] and w[-2] not in _HU_VOWELS:
            return w[:-2]
    return w


def _hu_remove_possessive(w: str) -> str:
    n = len(w)
    if n > 6:
        if w[-5] not in _HU_VOWELS and w.endswith(("atok", "otok", "etek")):
            return w[:-4]
        if w.endswith(("itek", "itok")):
            return w[:-4]
    if n > 5:
        if w[-4] not in _HU_VOWELS and w.endswith(("unk", "tok", "tek")):
            return w[:-3]
        if w[-4] in _HU_VOWELS and w.endswith("juk"):
            return w[:-3]
        if w.endswith("ink"):
            return w[:-3]
    if n > 4:
        if w[-3] not in _HU_VOWELS and w.endswith(
                ("am", "em", "om", "ad", "ed", "od", "uk")):
            return w[:-2]
        if w[-3] in _HU_VOWELS and w.endswith(("nk", "ja", "je")):
            return w[:-2]
        if w.endswith(("im", "id", "ik")):
            return w[:-2]
    if n > 3:
        if w[-1] in "ae" and w[-2] not in _HU_VOWELS:
            return w[:-1]
        if w[-1] in "md" and w[-2] in _HU_VOWELS:
            return w[:-1]
        if w[-1] == "i":
            return w[:-1]
    return w


def hungarian_light_stem(w: str) -> str:
    """HungarianLightStemmer.Stem (Savoy,
    ``Analysis/Hu/HungarianLightStemmer.cs``): accent fold, case strip,
    possessive strip, plural -k, final-vowel normalize."""
    w = w.translate(_HU_FOLD)
    w = _hu_remove_case(w)
    w = _hu_remove_possessive(w)
    # plural
    if len(w) > 3 and w[-1] == "k":
        if w[-2] in "aoe":
            w = w[:-2] if len(w) > 4 else w[:-1]
        else:
            w = w[:-1]
    # normalize
    if len(w) > 3 and w[-1] in "aeio":
        w = w[:-1]
    return w


_CZ_3SUF = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
            "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
            "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_2SUF = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
            "mi", "ou")


def czech_stem(w: str) -> str:
    """CzechStemmer.Stem (Dolamic & Savoy light stemmer for Czech,
    ``Analysis/Cz/CzechStemmer.cs``): case endings, possessive -ov/-in/-ův,
    then palatalization-undoing normalization."""
    n = len(w)
    # remove case
    if n > 7 and w.endswith("atech"):
        w = w[:-5]
    elif n > 6 and w.endswith(("ětem", "etem", "atům")):
        w = w[:-4]
    elif n > 5 and w.endswith(_CZ_3SUF):
        w = w[:-3]
    elif n > 4 and w.endswith(_CZ_2SUF):
        w = w[:-2]
    elif n > 3 and w[-1] in "aeiouůyáéíýě":
        w = w[:-1]
    # remove possessives
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]
    # normalize
    if not w:
        return w
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


# (suffix, vowel-count threshold, fires palatalization) — order is the
# reference's first-match-wins table
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False), ("am", 1, False),
    ("ēm", 1, False), ("īm", 1, False), ("im", 1, False), ("um", 1, False),
    ("us", 1, True), ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False), ("ēs", 1, False),
    ("is", 1, False), ("ie", 1, False), ("u", 1, True), ("a", 1, True),
    ("i", 1, True), ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False), ("s", 0, False),
    ("š", 0, False),
)
_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(w: str, removed_first: str) -> str:
    """LatvianStemmer.Unpalatalize: the char AFTER the cut (first char of
    the removed suffix) selects the kš→kst / ņņ→nn repairs."""
    if removed_first == "u":
        if w.endswith("kš"):
            return w[:-2] + "kst"
        if w.endswith("ņņ"):
            return w[:-2] + "nn"
    if w.endswith(("pj", "bj", "mj", "vj")):
        return w[:-1]
    for pal, rep in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if w.endswith(pal):
            return w[:-2] + rep
    if w and w[-1] == "č":
        return w[:-1] + "c"
    if w and w[-1] == "ļ":
        return w[:-1] + "l"
    if w and w[-1] == "ņ":
        return w[:-1] + "n"
    return w


def latvian_stem(w: str) -> str:
    """LatvianStemmer.Stem (``Analysis/Lv/LatvianStemmer.cs``): one
    longest-table affix strip gated on the ORIGINAL word's vowel count,
    with unpalatalization repairs after the palatalizing affixes."""
    n_vowels = sum(1 for c in w if c in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if n_vowels > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            cut = w[: -len(affix)]
            return _lv_unpalatalize(cut, affix[0]) if palatalizes else cut
    return w


_ID_VOWELS = frozenset("aeiou")
# flag bits mirroring IndonesianStemmer.cs REMOVED_*
_ID_KE, _ID_PENG, _ID_DI, _ID_MENG, _ID_TER, _ID_BER, _ID_PE = (
    1, 2, 4, 8, 16, 32, 64)


def indonesian_stem(w: str, stem_derivational: bool = True) -> str:
    """IndonesianStemmer.Stem (Asian & Williams,
    ``Analysis/Id/IndonesianStemmer.cs``): particle + possessive suffixes,
    then derivational prefix/suffix interplay gated by REMOVED_* flags and
    a running syllable (vowel) count."""
    flags = 0
    syl = sum(1 for c in w if c in _ID_VOWELS)

    def particle(x: str) -> str:
        nonlocal syl
        if x.endswith(("kah", "lah", "pun")):
            syl -= 1
            return x[:-3]
        return x

    def possessive(x: str) -> str:
        nonlocal syl
        if x.endswith(("ku", "mu")):
            syl -= 1
            return x[:-2]
        if x.endswith("nya"):
            syl -= 1
            return x[:-3]
        return x

    def first_prefix(x: str) -> str:
        nonlocal syl, flags
        if x.startswith("meng"):
            flags |= _ID_MENG; syl -= 1
            return x[4:]
        if x.startswith("meny") and len(x) > 4 and x[4] in _ID_VOWELS:
            flags |= _ID_MENG; syl -= 1
            return "s" + x[4:]
        if x.startswith(("men", "mem")):
            flags |= _ID_MENG; syl -= 1
            return x[3:]
        if x.startswith("me"):
            flags |= _ID_MENG; syl -= 1
            return x[2:]
        if x.startswith("peng"):
            flags |= _ID_PENG; syl -= 1
            return x[4:]
        if x.startswith("peny") and len(x) > 4 and x[4] in _ID_VOWELS:
            flags |= _ID_PENG; syl -= 1
            return "s" + x[4:]
        if x.startswith("peny"):
            flags |= _ID_PENG; syl -= 1
            return x[4:]
        if x.startswith("pen") and len(x) > 3 and x[3] in _ID_VOWELS:
            flags |= _ID_PENG; syl -= 1
            return "t" + x[3:]
        if x.startswith(("pen", "pem")):
            flags |= _ID_PENG; syl -= 1
            return x[3:]
        if x.startswith("di"):
            flags |= _ID_DI; syl -= 1
            return x[2:]
        if x.startswith("ter"):
            flags |= _ID_TER; syl -= 1
            return x[3:]
        if x.startswith("ke"):
            flags |= _ID_KE; syl -= 1
            return x[2:]
        return x

    def second_prefix(x: str) -> str:
        nonlocal syl, flags
        if x.startswith("ber"):
            flags |= _ID_BER; syl -= 1
            return x[3:]
        if x == "belajar":
            flags |= _ID_BER; syl -= 1
            return x[3:]
        if x.startswith("be") and len(x) > 4 and x[2] not in _ID_VOWELS \
                and x[3] == "e" and x[4] == "r":
            flags |= _ID_BER; syl -= 1
            return x[2:]
        if x.startswith("per"):
            syl -= 1
            return x[3:]
        if x == "pelajar":
            syl -= 1
            return x[3:]
        if x.startswith("pe"):
            flags |= _ID_PE; syl -= 1
            return x[2:]
        return x

    def suffix(x: str) -> str:
        nonlocal syl
        if x.endswith("kan") and not flags & (_ID_KE | _ID_PENG | _ID_PE):
            syl -= 1
            return x[:-3]
        if x.endswith("an") and not flags & (_ID_DI | _ID_MENG | _ID_TER):
            syl -= 1
            return x[:-2]
        if x.endswith("i") and not x.endswith("si") \
                and not flags & (_ID_BER | _ID_KE | _ID_PENG):
            syl -= 1
            return x[:-1]
        return x

    if syl > 2:
        w = particle(w)
    if syl > 2:
        w = possessive(w)
    if stem_derivational:
        before = w
        if syl > 2:
            w = first_prefix(w)
        if w != before:
            before = w
            if syl > 2:
                w = suffix(w)
            if w != before and syl > 2:
                w = second_prefix(w)
        else:
            if syl > 2:
                w = second_prefix(w)
            if syl > 2:
                w = suffix(w)
    return w


# Arabic (Light10): ArabicStemmer.cs + ArabicNormalizer.cs
_AR_PREFIXES = ("ال", "وال",
                "بال", "كال",
                "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")
_AR_ALEF_VARIANTS = frozenset("آأإ")
_AR_DELETE = frozenset("ـًٌٍَُِ"
                       "ّْ")


def arabic_normalize(w: str) -> str:
    """ArabicNormalizer.Normalize (``Analysis/Ar/ArabicNormalizer.cs``):
    fold hamza'd alefs → alef, dotless yeh → yeh, teh marbuta → heh; delete
    tatweel and the harakat diacritics."""
    out = []
    for ch in w:
        if ch in _AR_ALEF_VARIANTS:
            out.append("ا")
        elif ch == "ى":
            out.append("ي")
        elif ch == "ة":
            out.append("ه")
        elif ch in _AR_DELETE:
            continue
        else:
            out.append(ch)
    return "".join(out)


def arabic_stem(w: str) -> str:
    """ArabicStemmer.Stem (Larkey's Light10,
    ``Analysis/Ar/ArabicStemmer.cs``): at most ONE prefix (wa- needs a
    4-char word, others length+2), then EVERY matching suffix in table
    order, each needing 2 chars left after the strip."""
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if len(w) >= 4 and w.startswith(p):
                w = w[1:]
                break
        elif len(w) >= len(p) + 2 and w.startswith(p):
            w = w[len(p):]
            break
    for suf in _AR_SUFFIXES:
        if len(w) >= len(suf) + 2 and w.endswith(suf):
            w = w[:-len(suf)]
    return w


def bulgarian_stem(w: str) -> str:
    """BulgarianStemmer.Stem (Nakov's BulStem light rules,
    ``Analysis/Bg/BulgarianStemmer.cs``): -ища fast path, definite-article
    strip, plural strip (with ци→к / зи→г / еXи→яX / си→х repairs), final
    я/а/о/е, -ен→н, ъN→N."""
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    # remove article
    n = len(w)
    if n > 6 and w.endswith("ият"):
        w = w[:-3]
    elif n > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        w = w[:-2]
    elif n > 4 and w.endswith("ят"):
        w = w[:-2]
    # remove plural
    n = len(w)
    if n > 6 and w.endswith("овци"):
        w = w[:-3]
    elif n > 6 and w.endswith("ове"):
        w = w[:-3]
    elif n > 6 and w.endswith("еве"):
        w = w[:-3] + "й"
    elif n > 5 and w.endswith("ища"):
        w = w[:-3]
    elif n > 5 and w.endswith("та"):
        w = w[:-2]
    elif n > 5 and w.endswith("ци"):
        w = w[:-2] + "к"
    elif n > 5 and w.endswith("зи"):
        w = w[:-2] + "г"
    elif n > 5 and w[-3] == "е" and w[-1] == "и":
        w = w[:-3] + "я" + w[-2]
    elif n > 4 and w.endswith("си"):
        w = w[:-2] + "х"
    elif n > 4 and w.endswith("и"):
        w = w[:-1]
    if len(w) > 3:
        # single guard for BOTH strips (BulgarianStemmer.cs:46-56): a
        # 4-char -я word still loses a following а/о/е at length 3
        if w.endswith("я"):
            w = w[:-1]
        if w and w[-1] in "аое":
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


_HI_5SUF = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_4SUF = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे",
            "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं",
            "ताएं", "ियाँ", "ियों", "ियां")
_HI_3SUF = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे",
            "ाने", "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं",
            "ुओं", "ुएं", "ुआं")
_HI_2SUF = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
            "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_1SUF = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(w: str) -> str:
    """HindiStemmer.Stem (lightweight Hindi stemmer, Ramanathan & Rao,
    ``Analysis/Hi/HindiStemmer.cs``): one longest-first suffix strip with
    per-tier length guards."""
    n = len(w)
    if n > 6 and w.endswith(_HI_5SUF):
        return w[:-5]
    if n > 5 and w.endswith(_HI_4SUF):
        return w[:-4]
    if n > 4 and w.endswith(_HI_3SUF):
        return w[:-3]
    if n > 3 and w.endswith(_HI_2SUF):
        return w[:-2]
    if n > 2 and w.endswith(_HI_1SUF):
        return w[:-1]
    return w


_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(w: str) -> str:
    """FrenchLightStemmer.Norm: accent fold + adjacent-duplicate-letter
    collapse (len>4 gate), -ie strip, then final r / e / duplicate strips
    under ONE len>4 check."""
    if len(w) > 4:
        w = w.translate(_FR_FOLD)
        out = [w[0]]
        for c in w[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        w = "".join(out)
    if len(w) > 4 and w.endswith("ie"):
        w = w[:-2]
    if len(w) > 4:
        if w[-1] == "r":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if w[-1] == w[-2] and w[-1].isalpha():
            w = w[:-1]
    return w


def french_light_stem(w: str) -> str:
    """FrenchLightStemmer.Stem (Savoy UniNE light stemmer,
    ``Analysis/Fr/FrenchLightStemmer.cs``): aux→al, x/s plural strip, the
    ordered derivational-suffix table with in-place repairs (q/u/e/r/f
    substitutions), then Norm."""
    if len(w) > 5 and w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u" and w[-4] != "e":
            w = w[:-2] + "l" + w[-1]
        w = w[:-1]
    if len(w) > 3 and w[-1] == "x":
        w = w[:-1]
    if len(w) > 3 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 9 and w.endswith("issement"):
        return _fr_norm(w[:-7] + "r")
    if n > 8 and w.endswith("issant"):
        return _fr_norm(w[:-5] + "r")
    if n > 6 and w.endswith("ement"):
        w = w[:-4]
        if len(w) > 3 and w.endswith("ive"):
            w = w[:-2] + "f"
        return _fr_norm(w)
    if n > 11 and w.endswith("ficatrice"):
        return _fr_norm(w[:-7] + "er")
    if n > 10 and w.endswith("ficateur"):
        return _fr_norm(w[:-6] + "er")
    if n > 9 and w.endswith("catrice"):
        return _fr_norm(w[:-7] + "que" + w[-4])
    if n > 8 and w.endswith("cateur"):
        return _fr_norm(w[:-6] + "quer")
    if n > 8 and w.endswith("atrice"):
        return _fr_norm(w[:-6] + "er")
    if n > 7 and w.endswith("ateur"):
        return _fr_norm(w[:-5] + "er")
    if n > 6 and w.endswith("trice"):
        w = w[:-4] + "eur"
    n = len(w)
    if n > 5 and w.endswith("ième"):
        return _fr_norm(w[:-4])
    if n > 7 and w.endswith("teuse"):
        return _fr_norm(w[:-3] + "r")
    if n > 6 and w.endswith("teur"):
        return _fr_norm(w[:-2] + "r")
    if n > 5 and w.endswith("euse"):
        return _fr_norm(w[:-2])
    if n > 8 and w.endswith("ère"):
        return _fr_norm(w[:-3] + "er")
    if n > 7 and w.endswith("ive"):
        return _fr_norm(w[:-2] + "f")
    if n > 4 and w.endswith(("folle", "molle")):
        return _fr_norm(w[:-3] + "u")
    if n > 9 and w.endswith("nnelle"):
        return _fr_norm(w[:-5])
    if n > 9 and w.endswith("nnel"):
        return _fr_norm(w[:-3])
    if n > 4 and w.endswith("ète"):
        w = w[:-3] + "et"
    if len(w) > 8 and w.endswith("ique"):
        w = w[:-4]
    n = len(w)
    if n > 8 and w.endswith("esse"):
        return _fr_norm(w[:-3])
    if n > 7 and w.endswith("inage"):
        return _fr_norm(w[:-3])
    if n > 9 and w.endswith("isation"):
        w = w[:-7]
        if len(w) > 5 and w.endswith("ual"):
            w = w[:-2] + "e" + w[-1]
        return _fr_norm(w)
    if n > 9 and w.endswith("isateur"):
        return _fr_norm(w[:-7])
    if n > 8 and w.endswith("ation"):
        return _fr_norm(w[:-5])
    if n > 8 and w.endswith("ition"):
        return _fr_norm(w[:-5])
    return _fr_norm(w)


def english_minimal_stem(w: str) -> str:
    """EnglishMinimalStemmer.Stem (S-stemmer, Donna Harman,
    ``Analysis/En/EnglishMinimalStemmer.cs``): plural-only strip — keeps
    -us/-ss, maps -ies→y (with a/e lookback), keeps -[iaoe]es."""
    if len(w) < 3 or w[-1] != "s":
        return w
    p = w[-2]
    if p in "us":
        return w
    if p == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in "ae":
            return w[:-3] + "y"
        if w[-3] in "iaoe":
            return w
    return w[:-1]


def arabic_light_stem(w: str) -> str:
    """ArabicAnalyzer chain tail (normalize → stem)."""
    return arabic_stem(arabic_normalize(w))


_CKB_FARSI_YEH = "ی"
_CKB_AE = "ە"
_CKB_HEH = "ه"
_CKB_DELETE = frozenset("ـًٌٍَُِ"
                        "ّْ")


def sorani_normalize(w: str) -> str:
    """SoraniNormalizer.Normalize (``Analysis/Ckb/SoraniNormalizer.cs``):
    yeh variants → Farsi yeh, kaf → keheh, heh+ZWNJ → ae, final heh → ae,
    teh marbuta → ae, heh doachashmee → heh, initial/above reh → rreh,
    delete tatweel + harakat + Unicode Cf format chars."""
    import unicodedata

    out: list[str] = []
    for ch in w:
        if ch in ("ي", "ى"):
            out.append(_CKB_FARSI_YEH)
        elif ch == "ك":
            out.append("ک")
        elif ch == "‌":
            if out and out[-1] == _CKB_HEH:
                out[-1] = _CKB_AE
        elif ch == "ة":
            out.append(_CKB_AE)
        elif ch == "ھ":
            out.append(_CKB_HEH)
        elif ch == "ر" and not out:
            out.append("ڕ")
        elif ch == "ڒ":
            out.append("ڕ")
        elif ch in _CKB_DELETE or unicodedata.category(ch) == "Cf":
            continue
        else:
            out.append(ch)
    # final heh → ae: applies only when heh is the very last scanned char
    if w and w[-1] == _CKB_HEH and out and out[-1] == _CKB_HEH:
        out[-1] = _CKB_AE
    return "".join(out)


def sorani_stem(w: str) -> str:
    """SoraniStemmer.Stem (``Analysis/Ckb/SoraniStemmer.cs``): postposition
    strip (دا/نا/ەوە), possessive strip (مان/یان/تان), then one
    indefinite/definite/plural/demonstrative suffix strip."""
    # postposition
    if len(w) > 5 and w.endswith("دا"):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("نا"):
        w = w[:-1]
    elif len(w) > 6 and w.endswith("ەوە"):
        w = w[:-3]
    # possessive pronoun
    if len(w) > 6 and w.endswith(("مان", "یان", "تان")):
        w = w[:-3]
    # indefinite (with izafe)
    n = len(w)
    if n > 6 and w.endswith("ێکی"):
        return w[:-3]
    if n > 7 and w.endswith("یەکی"):
        return w[:-4]
    # the remaining single-strip chain
    if n > 5 and w.endswith("ێک"):
        return w[:-2]
    if n > 6 and w.endswith("یەک"):
        return w[:-3]
    if n > 6 and w.endswith("ەکە"):
        return w[:-3]
    if n > 5 and w.endswith("کە"):
        return w[:-2]
    if n > 7 and w.endswith("ەکان"):
        return w[:-4]
    if n > 6 and w.endswith("کان"):
        return w[:-3]
    if n > 7 and w.endswith("یانی"):
        return w[:-4]
    if n > 6 and w.endswith("انی"):
        return w[:-3]
    if n > 6 and w.endswith("یان"):
        return w[:-3]
    if n > 5 and w.endswith("ان"):
        return w[:-2]
    if n > 7 and w.endswith("یانە"):
        return w[:-4]
    if n > 6 and w.endswith("انە"):
        return w[:-3]
    if n > 5 and w.endswith(("ایە", "ەیە")):
        return w[:-2]
    if n > 4 and w.endswith("ە"):
        return w[:-1]
    if n > 4 and w.endswith("ی"):
        return w[:-1]
    return w


def sorani_light_stem(w: str) -> str:
    """SoraniAnalyzer chain tail (normalize → stem)."""
    return sorani_stem(sorani_normalize(w))


def german_minimal_stem(w: str) -> str:
    """GermanMinimalStemmer.Stem (``Analysis/De/GermanMinimalStemmer.cs``):
    words <5 unchanged; fold umlauts; strip -nen, then -en/-se/-es/-er
    (len>5), then single n/e/s/r."""
    if len(w) < 5:
        return w
    w = w.translate(str.maketrans("äöü", "aou"))
    if len(w) > 6 and w.endswith("nen"):
        return w[:-3]
    if len(w) > 5 and (w.endswith(("en", "se", "es", "er"))):
        return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


def norwegian_minimal_stem(w: str, nynorsk: bool = False) -> str:
    """NorwegianMinimalStemmer.Stem with the default BOKMAAL flag
    (``Analysis/No/NorwegianMinimalStemmer.cs``): possessive -s, definite
    plural -ene (-ane in Nynorsk), -er/-en/-et (-ar Nynorsk), final a/e."""
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    if len(w) > 5 and (w.endswith("ene") or (nynorsk and w.endswith("ane"))):
        return w[:-3]
    if len(w) > 4 and (w.endswith(("er", "en", "et"))
                       or (nynorsk and w.endswith("ar"))):
        return w[:-2]
    if len(w) > 3 and w[-1] in "ae":
        return w[:-1]
    return w


def _brazilian_or_original(w: str) -> str:
    """BrazilianStemFilter semantics: keep the original term when the
    stemmer returns None (non-indexable input)."""
    from lucenenet_ray.analysis.brazilian import brazilian_stem

    r = brazilian_stem(w)
    return w if r is None else r


def persian_normalize(w: str) -> str:
    """PersianNormalizer.Normalize (``Analysis/Fa/PersianNormalizer.cs``):
    Farsi yeh / yeh barree → Arabic yeh, keheh → kaf, heh-yeh / heh-goal →
    heh, delete hamza-above. (PersianAnalyzer has no stemmer — the chain is
    Arabic normalize → Persian normalize → stop.)"""
    out: list[str] = []
    for ch in w:
        if ch in ("ی", "ے"):
            out.append("ي")
        elif ch == "ک":
            out.append("ك")
        elif ch in ("ۀ", "ہ"):
            out.append("ه")
        elif ch == "ٔ":
            continue
        else:
            out.append(ch)
    return "".join(out)


from lucenenet_ray.analysis.snowball import (danish_stem, norwegian_stem,
                                             porter2_stem, swedish_stem)
from lucenenet_ray.analysis.snowball_romance import (
    french_stem as _sb_french, italian_stem as _sb_italian,
    portuguese_stem as _sb_portuguese, spanish_stem as _sb_spanish)
from lucenenet_ray.analysis.snowball_germanic import (
    dutch_stem as _sb_dutch, german2_stem as _sb_german2,
    german_snowball_stem as _sb_german)
from lucenenet_ray.analysis.snowball_more import (
    finnish_stem as _sb_finnish, hungarian_stem as _sb_hungarian,
    romanian_stem as _sb_romanian, russian_stem as _sb_russian)
from lucenenet_ray.analysis.snowball_turkish import (
    turkish_stem as _sb_turkish)

_STEM_FN = {"de": german_light_stem, "es": spanish_light_stem,
            "fr": french_minimal_stem, "it": italian_light_stem,
            "pt": portuguese_light_stem, "ru": russian_light_stem,
            "sv": swedish_light_stem, "no": norwegian_light_stem,
            "fi": finnish_light_stem, "hu": hungarian_light_stem,
            "cz": czech_stem, "id": indonesian_stem, "lv": latvian_stem,
            "ar": arabic_light_stem, "bg": bulgarian_stem,
            "hi": hindi_stem, "ckb": sorani_light_stem,
            "br": _brazilian_or_original,
            # Snowball family (analysis/snowball.py): "da" is the reference
            # DanishAnalyzer default; the *_snowball keys are the
            # SnowballFilter alternatives to the light stemmers above
            "da": danish_stem, "en_snowball": porter2_stem,
            "no_snowball": norwegian_stem, "sv_snowball": swedish_stem,
            "es_snowball": _sb_spanish, "fr_snowball": _sb_french,
            "it_snowball": _sb_italian, "pt_snowball": _sb_portuguese,
            "de_snowball": _sb_german, "de2_snowball": _sb_german2,
            "nl_snowball": _sb_dutch, "ru_snowball": _sb_russian,
            "fi_snowball": _sb_finnish, "hu_snowball": _sb_hungarian,
            "ro_snowball": _sb_romanian, "tr_snowball": _sb_turkish}

from lucenenet_ray.analysis.snowball_ext import (  # noqa: E402
    basque_stem as _sb_basque, catalan_stem as _sb_catalan,
    irish_lowercase as _ga_lower, irish_stem as _sb_irish)

_STEM_FN.update({"eu_snowball": _sb_basque, "ca_snowball": _sb_catalan,
                 "ga_snowball": _sb_irish})

from lucenenet_ray.analysis.rslp import (  # noqa: E402
    galician_stem as _rslp_galician,
    portuguese_rslp_stem as _rslp_portuguese)

# "gl" = GalicianAnalyzer's default stemmer (GalicianStemFilter over the
# RSLP engine); "pt_rslp" = the full Orengo RSLP variant selectable next
# to the default pt light stemmer (PortugueseStemFilter); *_minimal =
# the RSLP-S plural-only filters (GalicianMinimalStemFilter /
# PortugueseMinimalStemFilter)
from lucenenet_ray.analysis.rslp import (  # noqa: E402
    galician_minimal_stem as _rslp_gl_min,
    portuguese_minimal_stem as _rslp_pt_min)

_STEM_FN.update({"gl": _rslp_galician, "pt_rslp": _rslp_portuguese,
                 "gl_minimal": _rslp_gl_min, "pt_minimal": _rslp_pt_min})


class StemmingLangAnalyzer(LangAnalyzer):
    """LangAnalyzer + the language's light stemmer (the GermanAnalyzer /
    SpanishAnalyzer / FrenchAnalyzer chain shape: tokenizer → lowercase →
    stop → stem)."""

    def __init__(self, stop_words: frozenset[str], lang: str):
        super().__init__(stop_words)
        self._stem = _STEM_FN[lang]
        self._cache: dict[str, str] = {}

    def __call__(self, text: str):
        terms, positions = super().__call__(text)
        cache = self._cache
        stem = self._stem
        out = []
        for t in terms:
            s = cache.get(t)
            if s is None:
                s = stem(t)
                cache[t] = s
            out.append(s)
        return out, positions


def turkish_lowercase(term: str) -> str:
    """TurkishLowerCaseFilter.cs: I before a combining dot -> i (dot
    consumed), plain I -> dotless ı, İ -> i; everything else regular
    lowercase. The iOrAfter state lets nonspacing marks sit between the I
    and its dot."""
    import unicodedata

    out = []
    chars = list(term)
    i = 0
    n = len(chars)
    while i < n:
        ch = chars[i]
        if ch == "I":
            j = i + 1
            while j < n and unicodedata.category(chars[j]) == "Mn" \
                    and chars[j] != "̇":
                j += 1
            if j < n and chars[j] == "̇":
                out.append("i")
                out.extend(chars[i + 1: j])   # keep other marks
                i = j + 1
                continue
            out.append("ı")
            i += 1
            continue
        if ch == "İ":
            out.append("i")
            i += 1
            continue
        out.append(ch.lower())
        i += 1
    return "".join(out)


class TurkishAnalyzer:
    """TurkishAnalyzer.cs chain (4.8): StandardTokenizer →
    ApostropheFilter → TurkishLowerCaseFilter → stop → SnowballFilter
    (TurkishStemmer)."""

    def __init__(self, stop_words: frozenset[str]):
        self.stop_words = stop_words
        self._cache: dict[str, str] = {}

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        from lucenenet_ray.analysis.misc_filters import apostrophe_filter
        from lucenenet_ray.analysis.snowball_turkish import turkish_stem
        from lucenenet_ray.analysis.standard import tokenize

        terms: list[str] = []
        positions: list[int] = []
        pos = -1
        cache = self._cache
        for tok in tokenize(text):
            pos += 1
            low = turkish_lowercase(apostrophe_filter(tok))
            if low in self.stop_words:
                continue
            s = cache.get(low)
            if s is None:
                s = turkish_stem(low)
                cache[low] = s
            terms.append(s)
            positions.append(pos)
        return terms, positions


def _elision_ci(term: str, articles: frozenset[str]) -> str:
    """ElisionFilter with ignoreCase=true (the Ca/Ga analyzer configs):
    drop `<article>'` prefix comparing the article case-insensitively."""
    for i, ch in enumerate(term):
        if ch in ("'", "’"):
            if term[:i].lower() in articles:
                return term[i + 1:]
            return term
    return term


# CatalanAnalyzer.cs DEFAULT_ARTICLES / IrishAnalyzer.cs DEFAULT_ARTICLES
# + HYPHENATIONS (all ignoreCase=true in the reference CharArraySets)
_CA_ARTICLES = frozenset(("d", "l", "m", "n", "s", "t"))
_GA_ARTICLES = frozenset(("d", "m", "b"))
_GA_HYPHENATIONS = frozenset(("h", "n", "t"))


class CatalanAnalyzer:
    """CatalanAnalyzer.cs chain (4.8): StandardTokenizer →
    ElisionFilter(d/l/m/n/s/t, pre-lowercase, ignore-case) → LowerCase →
    stop → SnowballFilter(CatalanStemmer)."""

    def __init__(self, stop_words: frozenset[str]):
        self.stop_words = stop_words
        self._cache: dict[str, str] = {}

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        from lucenenet_ray.analysis.standard import tokenize

        terms: list[str] = []
        positions: list[int] = []
        pos = -1
        cache = self._cache
        for tok in tokenize(text):
            pos += 1
            low = _elision_ci(tok, _CA_ARTICLES).lower()
            if low in self.stop_words:
                continue
            s = cache.get(low)
            if s is None:
                s = _sb_catalan(low)
                cache[low] = s
            terms.append(s)
            positions.append(pos)
        return terms, positions


class IrishAnalyzer:
    """IrishAnalyzer.cs chain (4.8): StandardTokenizer →
    StopFilter(h/n/t hyphenation fragments) → ElisionFilter(d/m/b) →
    IrishLowerCaseFilter → stop → SnowballFilter(IrishStemmer)."""

    def __init__(self, stop_words: frozenset[str]):
        self.stop_words = stop_words
        self._cache: dict[str, str] = {}

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        from lucenenet_ray.analysis.standard import tokenize

        terms: list[str] = []
        positions: list[int] = []
        pos = -1
        cache = self._cache
        for tok in tokenize(text):
            pos += 1
            if tok.lower() in _GA_HYPHENATIONS:
                continue  # hyphenation-fragment stop (position hole kept)
            low = _ga_lower(_elision_ci(tok, _GA_ARTICLES))
            if low in self.stop_words:
                continue
            s = cache.get(low)
            if s is None:
                s = _sb_irish(low)
                cache[low] = s
            terms.append(s)
            positions.append(pos)
        return terms, positions


def _dutch_default_stem(term: str) -> str:
    """DutchAnalyzer.cs default chain tail: StemmerOverrideFilter with the
    built-in 4-entry dict, then the Dutch Snowball stemmer."""
    override = _NL_STEM_DICT.get(term)
    if override is not None:
        return override
    return _sb_dutch(term)


# DutchAnalyzer.cs DefaultSetHolder.DEFAULT_STEM_DICT
_NL_STEM_DICT = {"fiets": "fiets", "bromfiets": "bromfiets",
                 "ei": "eier", "kind": "kinder"}

_STEM_FN["nl_default"] = _dutch_default_stem
