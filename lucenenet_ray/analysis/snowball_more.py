"""Remaining Snowball stemmers (SnowballFilter analog, wave 3).

Russian / Finnish / Hungarian / Romanian / Turkish re-expressions of the
published Snowball algorithms, matching the reference's generated Tartarus
programs (``src/Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/*.cs``) —
each validated word-for-word against the reference vocabulary fixtures
(``TestSnowballVocabData.zip``).

See snowball_romance.py for the shared among/commit semantics notes.
"""

from __future__ import annotations

from lucenenet_ray.analysis.snowball_romance import _bylen, _longest, _r1

# ---------------------------------------------------------------------------
# Russian (RussianStemmer.cs; among tables a_0..a_7 at :44-260). The whole
# backward pass runs inside setlimit(RV), so every suffix (and the а/я
# look-behind of the group-1 endings) must fit after the first vowel.

_RU_V = frozenset("аеиоуыэюя")

_RU_PERF = tuple(sorted((
    ("в", 1), ("ив", 2), ("ыв", 2), ("вши", 1), ("ивши", 2), ("ывши", 2),
    ("вшись", 1), ("ившись", 2), ("ывшись", 2),
), key=lambda t: len(t[0]), reverse=True))
_RU_ADJ = _bylen(
    "ее", "ие", "ое", "ые", "ими", "ыми", "ей", "ий", "ой", "ый", "ем",
    "им", "ом", "ым", "его", "ого", "ему", "ому", "их", "ых", "ею", "ою",
    "ую", "юю", "ая", "яя")
_RU_PART = tuple(sorted((
    ("ем", 1), ("нн", 1), ("вш", 1), ("ивш", 2), ("ывш", 2), ("щ", 1),
    ("ющ", 1), ("ующ", 2),
), key=lambda t: len(t[0]), reverse=True))
_RU_VERB = tuple(sorted((
    [(s, 1) for s in ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
                      "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")]
    + [(s, 2) for s in ("ила", "ыла", "ена", "ите", "ейте", "уйте", "или",
                        "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
                        "ило", "ыло", "ено", "ует", "ит", "ыт", "уют",
                        "ят", "ены", "ить", "ыть", "ишь", "ю", "ую")]
), key=lambda t: len(t[0]), reverse=True))
_RU_NOUN = _bylen(
    "а", "ев", "ов", "е", "ие", "ье", "и", "еи", "ии", "ами", "ями",
    "иями", "й", "ей", "ией", "ий", "ой", "ам", "ем", "ием", "ом", "ям",
    "иям", "о", "у", "ах", "ях", "иях", "ы", "ь", "ю", "ию", "ью", "я",
    "ия", "ья")


def russian_stem(word: str) -> str:
    """Russian Snowball stemmer (RussianStemmer.cs Stem():1111-1220)."""
    w = word
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_V:
            rv = i + 1
            break
    r1 = _r1(w, _RU_V)
    r2 = _r1(w, _RU_V, r1)

    def fits(base: int) -> bool:
        return base >= rv

    def after_ay(base: int) -> bool:
        return base - 1 >= rv and w[base - 1] in "ая"

    # step 1: perfective gerund, else (reflexive; adjectival|verb|noun)
    done = False
    for suf, code in _RU_PERF:
        if w.endswith(suf) and fits(len(w) - len(suf)):
            base = len(w) - len(suf)
            if code == 2:
                w = w[:base]
                done = True
            elif after_ay(base):
                w = w[:base]
                done = True
            break
    if not done:
        for suf in ("ся", "сь"):
            if w.endswith(suf) and fits(len(w) - 2):
                w = w[:-2]
                break
        # adjectival: adjective then optional participle
        suf = _longest(w, _RU_ADJ, rv)
        if suf is not None:
            w = w[: -len(suf)]
            for psuf, code in _RU_PART:
                if w.endswith(psuf) and fits(len(w) - len(psuf)):
                    base = len(w) - len(psuf)
                    if code == 2:
                        w = w[:base]
                    elif base - 1 >= rv and w[base - 1] in "ая":
                        w = w[:base]
                    break
        else:
            matched_verb = False
            for vsuf, code in _RU_VERB:
                if w.endswith(vsuf) and fits(len(w) - len(vsuf)):
                    base = len(w) - len(vsuf)
                    if code == 2:
                        w = w[:base]
                        matched_verb = True
                    elif base - 1 >= rv and w[base - 1] in "ая":
                        w = w[:base]
                        matched_verb = True
                    break
            if not matched_verb:
                nsuf = _longest(w, _RU_NOUN, rv)
                if nsuf is not None:
                    w = w[: -len(nsuf)]

    # step 2: и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    # step 3: derivational (R2)
    for suf in ("ость", "ост"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r2 and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
            break
    # step 4: tidy up
    for suf, code in (("ейше", 1), ("ейш", 1), ("н", 2), ("ь", 3)):
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            base = len(w) - len(suf)
            if code == 1:
                w = w[:base]
                if w.endswith("нн") and len(w) - 1 >= rv:
                    w = w[:-1]
            elif code == 2:
                if base - 1 >= rv and w[base - 1] == "н":
                    w = w[:base]
            else:
                w = w[:base]
            break
    return w


# ---------------------------------------------------------------------------
# Finnish (FinnishStemmer.cs; among tables a_0..a_9 at :44-160)

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_AEI = frozenset("aäei")
_FI_PART_END = _FI_V1 | {"n", "t"}
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FI_PARTICLE = tuple(sorted((
    ("pa", 1), ("sti", 2), ("kaan", 1), ("han", 1), ("kin", 1),
    ("hän", 1), ("kään", 1), ("ko", 1), ("pä", 1), ("kö", 1),
), key=lambda t: len(t[0]), reverse=True))

_FI_POSS = tuple(sorted((
    [(s, -1) for s in ("lla", "na", "ssa", "ta", "lta", "sta", "llä",
                       "nä", "ssä", "tä", "ltä", "stä", "lle", "ine")]
    + [("nsa", 3), ("mme", 3), ("nne", 3), ("ni", 2), ("si", 1),
       ("an", 4), ("en", 6), ("än", 5), ("nsä", 3)]
), key=lambda t: len(t[0]), reverse=True))
_FI_AN_CTX = ("lla", "na", "ssa", "ta", "lta", "sta")          # a_1
_FI_AEN_CTX = ("llä", "nä", "ssä", "tä", "ltä", "stä")          # a_2
_FI_EN_CTX = ("lle", "ine")                                     # a_3

# (suffix, code, method): method "VI" = preceded by i after a V2 vowel,
# "LONG" = preceded by a doubled vowel — evaluated DURING the among match
# (inside the R1 limit), failing over to the next-longest entry.
_FI_CASE = tuple(sorted((
    ("a", 8, None), ("lla", -1, None), ("na", -1, None),
    ("ssa", -1, None), ("ta", -1, None), ("lta", -1, None),
    ("sta", -1, None), ("tta", 9, None), ("lle", -1, None),
    ("ine", -1, None), ("ksi", -1, None), ("n", 7, None),
    ("han", 1, None), ("den", -1, "VI"), ("seen", -1, "LONG"),
    ("hen", 2, None), ("tten", -1, "VI"), ("hin", 3, None),
    ("siin", -1, "VI"), ("hon", 4, None), ("hän", 5, None),
    ("hön", 6, None), ("ä", 8, None), ("llä", -1, None),
    ("nä", -1, None), ("ssä", -1, None), ("tä", -1, None),
    ("ltä", -1, None), ("stä", -1, None), ("ttä", 9, None),
), key=lambda t: len(t[0]), reverse=True))

_FI_OTHER = tuple(sorted((
    ("eja", -1), ("mma", 1), ("imma", -1), ("mpa", 1), ("impa", -1),
    ("mmi", 1), ("immi", -1), ("mpi", 1), ("impi", -1), ("ejä", -1),
    ("mmä", 1), ("immä", -1), ("mpä", 1), ("impä", -1),
), key=lambda t: len(t[0]), reverse=True))


def finnish_stem(word: str) -> str:
    """Finnish Snowball stemmer (FinnishStemmer.cs Stem():1559-1650)."""
    w = word
    p1 = _r1(w, _FI_V1)
    p2 = _r1(w, _FI_V1, p1)
    ending_removed = False

    # particle etc (setlimit R1; conditions after limit restore)
    for suf, code in _FI_PARTICLE:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            base = len(w) - len(suf)
            if code == 1:
                if base >= 1 and w[base - 1] in _FI_PART_END:
                    w = w[:base]
            elif base >= p2:
                w = w[:base]
            break

    # possessive (setlimit R1; context checks after restore)
    for suf, code in _FI_POSS:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            base = len(w) - len(suf)
            if code == 1:
                if not (base >= 1 and w[base - 1] == "k"):
                    w = w[:base]
            elif code == 2:
                w = w[:base]
                if w.endswith("kse"):
                    w = w[:-3] + "ksi"
            elif code == 3:
                w = w[:base]
            elif code == 4:
                if w[:base].endswith(_FI_AN_CTX):
                    w = w[:base]
            elif code == 5:
                if w[:base].endswith(_FI_AEN_CTX):
                    w = w[:base]
            elif code == 6:
                if w[:base].endswith(_FI_EN_CTX):
                    w = w[:base]
            break

    # case ending (setlimit R1; method-gated among; shared delete)
    for suf, code, method in _FI_CASE:
        if not (w.endswith(suf) and len(w) - len(suf) >= p1):
            continue
        base = len(w) - len(suf)
        if method == "VI":
            if not (base - 1 >= p1 and w[base - 1] == "i"
                    and base - 2 >= p1 and w[base - 2] in _FI_V2):
                continue
        elif method == "LONG":
            if not (base - 2 >= p1 and w[base - 2: base] in _FI_LONG):
                continue
        # among committed; run the post-restore condition
        if code == 1 and not (base >= 1 and w[base - 1] == "a"):
            break
        if code == 2 and not (base >= 1 and w[base - 1] == "e"):
            break
        if code == 3 and not (base >= 1 and w[base - 1] == "i"):
            break
        if code == 4 and not (base >= 1 and w[base - 1] == "o"):
            break
        if code == 5 and not (base >= 1 and w[base - 1] == "ä"):
            break
        if code == 6 and not (base >= 1 and w[base - 1] == "ö"):
            break
        if code == 9 and not (base >= 1 and w[base - 1] == "e"):
            break
        if code == 8 and not (base >= 2 and w[base - 1] in _FI_V1
                              and w[base - 2] not in _FI_V1):
            break
        if code == 7:
            # n: extend the deletion over the final char of a preceding
            # long vowel or "ie"
            if base >= 2 and (w[base - 2: base] in _FI_LONG
                              or w[base - 2: base] == "ie"):
                base -= 1
        w = w[:base]
        ending_removed = True
        break

    # other endings (setlimit R2; "po" veto checked after restore)
    for suf, code in _FI_OTHER:
        if w.endswith(suf) and len(w) - len(suf) >= p2:
            base = len(w) - len(suf)
            if code == 1 and w[:base].endswith("po"):
                break
            w = w[:base]
            break

    if ending_removed:
        # i_plural (setlimit R1)
        if w and w[-1] in "ij" and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        # t_plural: final t after a vowel (both inside R1), then the
        # R2 mma/imma cleanup
        if (w.endswith("t") and len(w) - 1 >= p1
                and len(w) - 2 >= p1 and w[-2] in _FI_V1):
            w = w[:-1]
            for suf, code in (("imma", -1), ("mma", 1)):
                if w.endswith(suf) and len(w) - len(suf) >= p2:
                    base = len(w) - len(suf)
                    if code == 1 and w[:base].endswith("po"):
                        break
                    w = w[:base]
                    break

    # tidy (four setlimit-R1 try-steps, then the consonant undouble)
    if len(w) - 2 >= p1 and w[-2:] in _FI_LONG:
        w = w[:-1]
    if (len(w) - 1 >= p1 and len(w) - 2 >= p1 and w[-1] in _FI_AEI
            and w[-2] not in _FI_V1):
        w = w[:-1]
    if (w.endswith("j") and len(w) - 1 >= p1 and len(w) - 2 >= p1
            and w[-2] in "ou"):
        w = w[:-1]
    if (w.endswith("o") and len(w) - 1 >= p1 and len(w) - 2 >= p1
            and w[-2] == "j"):
        w = w[:-1]
    # undouble: rightmost non-vowel, deleted when preceded by itself
    j = len(w) - 1
    while j >= 0 and w[j] in _FI_V1:
        j -= 1
    if j >= 1 and w[j - 1] == w[j]:
        w = w[:j] + w[j + 1:]
    return w


# ---------------------------------------------------------------------------
# Hungarian (HungarianStemmer.cs; among tables a_0..a_11 at :44-258).
# The reference's 2002-era tables use Latin-1 õ/û approximations for ő/ű;
# the vocabulary fixture uses the same codepoints.

_HU_V = frozenset("aeiouáéíóöõúüû")
_HU_DIGRAPH = ("dzs", "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
               "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_MARK_DI = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLE = ("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz", "bb", "cc",
              "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
              "ss", "tt", "vv", "zz")

_HU_CASE = _bylen(
    "ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul", "nál",
    "nél", "ból", "ról", "tól", "bõl", "rõl", "tõl", "ül", "n", "an",
    "ban", "en", "ben", "képpen", "on", "ön", "képp", "kor", "t", "at",
    "et", "ként", "anként", "enként", "onként", "ot", "ért", "öt", "hez",
    "hoz", "höz", "vá", "vé")

_HU_OWNED = tuple(sorted((
    ("éi", 7), ("áéi", 6), ("ééi", 5), ("é", 9), ("ké", 4), ("aké", 1),
    ("eké", 1), ("oké", 1), ("áké", 3), ("éké", 2), ("öké", 1),
    ("éé", 8),
), key=lambda t: len(t[0]), reverse=True))
_HU_SING = tuple(sorted((
    ("a", 18), ("ja", 17), ("d", 16), ("ad", 13), ("ed", 13), ("od", 13),
    ("ád", 14), ("éd", 15), ("öd", 13), ("e", 18), ("je", 17), ("nk", 4),
    ("unk", 1), ("ánk", 2), ("énk", 3), ("ünk", 1), ("uk", 8),
    ("juk", 7), ("ájuk", 5), ("ük", 8), ("jük", 7), ("éjük", 6),
    ("m", 12), ("am", 9), ("em", 9), ("om", 9), ("ám", 10), ("ém", 11),
    ("o", 18), ("á", 19), ("é", 20),
), key=lambda t: len(t[0]), reverse=True))
_HU_PLUR = tuple(sorted((
    ("id", 10), ("aid", 9), ("jaid", 6), ("eid", 9), ("jeid", 6),
    ("áid", 7), ("éid", 8), ("i", 15), ("ai", 14), ("jai", 11),
    ("ei", 14), ("jei", 11), ("ái", 12), ("éi", 13), ("itek", 24),
    ("eitek", 21), ("jeitek", 20), ("éitek", 23), ("ik", 29),
    ("aik", 26), ("jaik", 25), ("eik", 26), ("jeik", 25), ("áik", 27),
    ("éik", 28), ("ink", 20), ("aink", 17), ("jaink", 16), ("eink", 17),
    ("jeink", 16), ("áink", 18), ("éink", 19), ("aitok", 21),
    ("jaitok", 20), ("áitok", 22), ("im", 5), ("aim", 4), ("jaim", 1),
    ("eim", 4), ("jeim", 1), ("áim", 2), ("éim", 3),
), key=lambda t: len(t[0]), reverse=True))
# action per code: None = delete, else replacement text
_HU_SING_ACT = {1: None, 2: "a", 3: "e", 4: None, 5: "a", 6: "e",
                7: None, 8: None, 9: None, 10: "a", 11: "e", 12: None,
                13: None, 14: "a", 15: "e", 16: None, 17: None, 18: None,
                19: "a", 20: "e"}
_HU_OWNED_ACT = {1: None, 2: "e", 3: "a", 4: None, 5: "e", 6: "a",
                 7: None, 8: "e", 9: None}
_HU_PLUR_ACT = {1: None, 2: "a", 3: "e", 4: None, 5: None, 6: None,
                7: "a", 8: "e", 9: None, 10: None, 11: None, 12: "a",
                13: "e", 14: None, 15: None, 16: None, 17: None,
                18: "a", 19: "e", 20: None, 21: None, 22: "a", 23: "e",
                24: None, 25: None, 26: None, 27: "a", 28: "e",
                29: None}
_HU_PLURAL = tuple(sorted((
    ("k", 7), ("ak", 4), ("ek", 6), ("ok", 5), ("ák", 1), ("ék", 2),
    ("ök", 3),
), key=lambda t: len(t[0]), reverse=True))
_HU_PLURAL_ACT = {1: "a", 2: "e", 3: None, 4: None, 5: None, 6: None,
                  7: None}


def _hu_p1(w: str) -> int:
    """Vowel-initial: after the first consonant (digraph counts whole);
    consonant-initial: after the first vowel."""
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_V:
        for i in range(1, n):
            if w[i] not in _HU_V:
                for d in _HU_MARK_DI:
                    if w.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    for i in range(1, n):
        if w[i] in _HU_V:
            return i + 1
    return n


def _hu_undouble(w: str) -> str:
    """Remove the second-to-last char (...bb -> ...b, ...ccs -> ...cs)."""
    return w[:-2] + w[-1] if len(w) >= 2 else w


def _hu_v_ending(w: str, p1: int) -> str:
    if w and w[-1] in "áé" and len(w) - 1 >= p1:
        return w[:-1] + ("a" if w[-1] == "á" else "e")
    return w


def hungarian_stem(word: str) -> str:
    """Hungarian Snowball stemmer (HungarianStemmer.cs Stem():1118-1220)."""
    w = word
    p1 = _hu_p1(w)

    # instrum: al/el in R1 after a double consonant, then undouble
    for suf in ("al", "el"):
        if w.endswith(suf) and len(w) - 2 >= p1 \
                and w[:-2].endswith(_HU_DOUBLE):
            w = _hu_undouble(w[:-2])
            break
    # case
    suf = _longest(w, _HU_CASE)
    if suf is not None and len(w) - len(suf) >= p1:
        w = _hu_v_ending(w[: -len(suf)], p1)
    # case_special: én -> e, án/ánként -> a
    for suf, rep in (("ánként", "a"), ("án", "a"), ("én", "e")):
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                w = w[: -len(suf)] + rep
            break
    # case_other: (a/e)stul|stül forms
    for suf, rep in (("astul", ""), ("estül", ""), ("ástul", "a"),
                     ("éstül", "e"), ("stul", ""), ("stül", "")):
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                w = w[: -len(suf)] + rep
            break
    # factive: á/é in R1 after a double consonant, then undouble
    if w and w[-1] in "áé" and len(w) - 1 >= p1 \
            and w[:-1].endswith(_HU_DOUBLE):
        w = _hu_undouble(w[:-1])
    # owned / sing_owner / plur_owner / plural
    for table, acts in ((_HU_OWNED, _HU_OWNED_ACT),
                        (_HU_SING, _HU_SING_ACT),
                        (_HU_PLUR, _HU_PLUR_ACT),
                        (_HU_PLURAL, _HU_PLURAL_ACT)):
        for suf, code in table:
            if w.endswith(suf):
                if len(w) - len(suf) >= p1:
                    rep = acts[code]
                    w = w[: -len(suf)] + (rep or "")
                break
    return w


# ---------------------------------------------------------------------------
# Romanian (RomanianStemmer.cs; among tables a_0..a_5 at :44-290; uses the
# 2002-era cedilla forms ş/ţ, as does the vocabulary fixture)

_RO_V = frozenset("aăâeiîou")

_RO_STEP0 = tuple(sorted((
    ("ea", 3), ("aţia", 7), ("aua", 2), ("iua", 4), ("aţie", 7),
    ("ele", 3), ("ile", 5), ("iile", 4), ("iei", 4), ("atei", 6),
    ("ii", 4), ("ului", 1), ("ul", 1), ("elor", 3), ("ilor", 4),
    ("iilor", 4),
), key=lambda t: len(t[0]), reverse=True))
_RO_STEP0_ACT = {1: "", 2: "a", 3: "e", 4: "i", 5: "i", 6: "at",
                 7: "aţi"}

_RO_COMBO = tuple(sorted((
    ("icala", 4), ("iciva", 4), ("ativa", 5), ("itiva", 6), ("icale", 4),
    ("aţiune", 5), ("iţiune", 6), ("atoare", 5), ("itoare", 6),
    ("ătoare", 5), ("icitate", 4), ("abilitate", 1), ("ibilitate", 2),
    ("ivitate", 3), ("icive", 4), ("ative", 5), ("itive", 6),
    ("icali", 4), ("atori", 5), ("icatori", 4), ("itori", 6),
    ("ători", 5), ("icitati", 4), ("abilitati", 1), ("ivitati", 3),
    ("icivi", 4), ("ativi", 5), ("itivi", 6), ("icităi", 4),
    ("abilităi", 1), ("ivităi", 3), ("icităţi", 4), ("abilităţi", 1),
    ("ivităţi", 3), ("ical", 4), ("ator", 5), ("icator", 4),
    ("itor", 6), ("ător", 5), ("iciv", 4), ("ativ", 5), ("itiv", 6),
    ("icală", 4), ("icivă", 4), ("ativă", 5), ("itivă", 6),
), key=lambda t: len(t[0]), reverse=True))
_RO_COMBO_ACT = {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at",
                 6: "it"}

_RO_STD = tuple(sorted((
    [(s, 1) for s in ("ica", "abila", "ibila", "oasa", "ata", "ita",
                      "anta", "uta", "iva", "ic", "ice", "abile",
                      "ibile", "oase", "ate", "itate", "ite", "ante",
                      "ute", "ive", "ici", "abili", "ibili", "atori",
                      "osi", "ati", "itati", "iti", "anti", "uti",
                      "ivi", "ităi", "oşi", "ităţi", "abil", "ibil",
                      "ator", "os", "at", "it", "ant", "ut", "iv",
                      "ică", "abilă", "ibilă", "oasă", "ată", "ită",
                      "antă", "ută", "ivă")]
    + [(s, 2) for s in ("iune", "iuni")]
    + [(s, 3) for s in ("ista", "isme", "iste", "isti", "işti", "ism",
                        "ist", "istă")]
), key=lambda t: len(t[0]), reverse=True))

_RO_VERB = tuple(sorted((
    [(s, 1) for s in (
        "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
        "âre", "ase", "ise", "use", "âse", "eşte", "ăşte", "eze", "ai",
        "eai", "iai", "eşti", "ăşti", "ui", "ezi", "âi", "aşi",
        "aseşi", "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi",
        "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi", "userăţi",
        "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam", "iam",
        "asem", "isem", "usem", "âsem", "arăm", "aserăm", "iserăm",
        "userăm", "âserăm", "irăm", "urăm", "ârăm", "au", "eau", "iau",
        "indu", "ându", "ez", "ească", "ară", "aseră", "iseră",
        "useră", "âseră", "iră", "ură", "âră", "ează")]
    + [(s, 2) for s in ("se", "sese", "sei", "seşi", "seseşi", "aţi",
                        "eţi", "iţi", "âţi", "serăţi", "seserăţi",
                        "em", "sesem", "im", "âm", "ăm", "serăm",
                        "seserăm", "seră", "seseră")]
), key=lambda t: len(t[0]), reverse=True))

_RO_VOWEL = _bylen("a", "e", "ie", "i", "ă")


def _ro_prelude(w: str) -> str:
    ch = list(w)
    for i in range(1, len(ch) - 1):
        if ch[i] in "iu" and ch[i - 1] in _RO_V and ch[i + 1] in _RO_V:
            ch[i] = ch[i].upper()
    return "".join(ch)


def romanian_stem(word: str) -> str:
    """Romanian Snowball stemmer (RomanianStemmer.cs Stem():1542-1640)."""
    from lucenenet_ray.analysis.snowball_romance import _rv_romance

    w = _ro_prelude(word)
    rv = _rv_romance(w, _RO_V)
    r1 = _r1(w, _RO_V)
    r2 = _r1(w, _RO_V, r1)

    # step 0 (R1)
    for suf, code in _RO_STEP0:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if base >= r1:
                if code == 5 and w[:base].endswith("ab"):
                    break
                w = w[:base] + _RO_STEP0_ACT[code]
            break

    # standard suffix: repeat combo (R1), then the R2 residue
    removed = False
    changed = True
    while changed:
        changed = False
        for suf, code in _RO_COMBO:
            if w.endswith(suf) and len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + _RO_COMBO_ACT[code]
                removed = True
                changed = True
                break
    for suf, code in _RO_STD:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if base >= r2:
                if code == 1:
                    w = w[:base]
                    removed = True
                elif code == 2:
                    if base >= 1 and w[base - 1] == "ţ":
                        w = w[: base - 1] + "t"
                        removed = True
                else:
                    w = w[:base] + "ist"
                    removed = True
            break

    if not removed:
        # verb suffix (setlimit RV; code-1 needs a preceding non-vowel
        # or u, itself inside RV)
        for suf, code in _RO_VERB:
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                base = len(w) - len(suf)
                if code == 2:
                    w = w[:base]
                elif base - 1 >= rv and (w[base - 1] not in _RO_V
                                         or w[base - 1] == "u"):
                    w = w[:base]
                break

    # vowel suffix (RV)
    for suf in _RO_VOWEL:
        if w.endswith(suf):
            if len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
            break

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Porter (classic 1980 algorithm, Tartarus `porter` program —
# PorterStemmer.cs; distinct from the Porter2/English stemmer in
# analysis/snowball.py)

_PT1_V = frozenset("aeiouy")
_PT1_STEP2 = tuple(sorted((
    ("tional", "tion"), ("ational", "ate"), ("enci", "ence"),
    ("anci", "ance"), ("abli", "able"), ("entli", "ent"), ("eli", "e"),
    ("ousli", "ous"), ("ization", "ize"), ("izer", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("aliti", "al"),
    ("alli", "al"), ("fulness", "ful"), ("ousness", "ous"),
    ("iveness", "ive"), ("iviti", "ive"), ("biliti", "ble"),
), key=lambda t: len(t[0]), reverse=True))
_PT1_STEP3 = tuple(sorted((
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
), key=lambda t: len(t[0]), reverse=True))
_PT1_STEP4 = _bylen(
    "ic", "ance", "ence", "able", "ible", "ate", "ive", "ize", "iti",
    "al", "ism", "ion", "er", "ous", "ant", "ent", "ment", "ement", "ou")
_PT1_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")


def _pt1_shortv(w: str) -> bool:
    """non-vowel other than w/x/Y, then vowel, then non-vowel — at the
    word end (PorterStemmer.cs r_shortv)."""
    return (len(w) >= 3 and w[-1] not in _PT1_V and w[-1] not in "wxY"
            and w[-2] in _PT1_V and w[-3] not in _PT1_V)


def porter_classic_stem(word: str) -> str:
    """Classic Porter stemmer (PorterStemmer.cs Stem():750-920)."""
    w = word
    y_found = False
    ch = list(w)
    if ch and ch[0] == "y":
        ch[0] = "Y"
        y_found = True
    for i in range(1, len(ch)):
        if ch[i] == "y" and ch[i - 1] in _PT1_V:
            ch[i] = "Y"
            y_found = True
    w = "".join(ch)
    p1 = _r1(w, _PT1_V)
    p2 = _r1(w, _PT1_V, p1)

    # step 1a
    for suf, rep in (("sses", "ss"), ("ies", "i"), ("ss", None),
                     ("s", "")):
        if w.endswith(suf):
            if rep is not None:
                w = w[: -len(suf)] + rep
            break
    # step 1b
    for suf, code in (("eed", 1), ("ing", 2), ("ed", 2)):
        if w.endswith(suf):
            if code == 1:
                if len(w) - 3 >= p1:
                    w = w[:-3] + "ee"
            else:
                stem = w[: -len(suf)]
                if any(c in _PT1_V for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_PT1_DOUBLES):
                        w = w[:-1]
                    elif len(w) == p1 and _pt1_shortv(w):
                        w += "e"
            break
    # step 1c: y after some vowel -> i
    if w and w[-1] in "yY" and any(c in _PT1_V for c in w[:-1]):
        w = w[:-1] + "i"
    # step 2 (R1)
    for suf, rep in _PT1_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                w = w[: -len(suf)] + rep
            break
    # step 3 (R1)
    for suf, rep in _PT1_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                w = w[: -len(suf)] + rep
            break
    # step 4 (R2; ion only after s/t)
    for suf in _PT1_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= p2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break
    # step 5a
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (len(w) - 1 >= p1
                                and not _pt1_shortv(w[:-1])):
            w = w[:-1]
    # step 5b
    if (w.endswith("ll") and len(w) - 1 >= p2):
        w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w


# ---------------------------------------------------------------------------
# Armenian (ArmenianStemmer.cs; among tables a_0..a_3 at :44-240). Four
# sequential longest-match deletes (ending/verb/adjective/noun), the whole
# backward pass inside setlimit(RV); `ending` additionally requires R2.

_HY_V = frozenset("աեէըիուօ")

_HY_ADJ = ("երորդ", "րորդ", "որակ", "ական", "արան", "եկեն", "երեն",
           "որէն", "ովին", "լայն", "վուն", "ավետ", "ալի", "ակի", "գին",
           "պես", "կոտ", "բար", "եղ", "են", "ին", "իվ", "ատ")
_HY_VERB = ("ացրինք", "վեցինք", "ացնալ", "եցնել", "ացվել", "եցվել",
            "կոտել", "ացրին", "վեցին", "ացրիր", "վեցիր", "ացրեց",
            "ալուց", "ելուց", "ացրիք", "վեցիք", "ացանք", "ացինք",
            "եցինք", "ացրի", "վեցի", "անալ", "ենալ", "ցնել", "ատել",
            "ոտել", "վում", "ացան", "ացին", "եցին", "ալիս", "ելիս",
            "ացավ", "եցավ", "ալով", "ելով", "ացար", "եցար", "ացիր",
            "եցիր", "ալու", "ելու", "ացաք", "ացիք", "եցիք", "ցանք",
            "ացա", "եցա", "ացի", "եցի", "ըալ", "ըել", "նել", "չել",
            "վել", "տել", "ված", "ում", "ցան", "ցաք", "անք", "վե",
            "ալ", "ել", "ան", "ավ", "ար", "աց", "եց", "աք", "ա")
_HY_NOUN = ("ություն", "մունք", "ույթ", "ուհի", "անակ", "ստան", "արան",
            "եղէն", "յուն", "ուստ", "ավոր", "անօց", "ալիք", "անիք",
            "վածք", "ույք", "ունք", "որդ", "յակ", "ուկ", "պան", "ածո",
            "ուս", "գար", "վոր", "չեք", "ենք", "ոնք", "իչք", "արք",
            "ցի", "իլ", "ակ", "իկ", "ան", "իչ", "ոց", "ու", "իք", "ք")
_HY_END = ("ությանդ", "ությանը", "ությանն", "ությանս", "ներում",
           "ության", "անում", "երում", "ներին", "ներով", "վանից",
           "ներից", "վանդ", "ներդ", "վանը", "ները", "ների", "երին",
           "ներն", "վանս", "անով", "երով", "ոջից", "երից", "ամբ",
           "անդ", "ոջդ", "երդ", "ուդ", "անը", "ոջը", "երը", "երի",
           "վան", "երն", "ուն", "ոջս", "վով", "ներ", "վից", "ցից",
           "ուց", "սա", "վա", "վի", "ան", "ին", "ոջ", "ով", "եր",
           "ից", "ոց", "դ", "ը", "ի", "ն", "ց")


def armenian_stem(word: str) -> str:
    """Armenian Snowball stemmer (ArmenianStemmer.cs Stem():1680-1740)."""
    w = word
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _HY_V:
            rv = i + 1
            break
    r2 = _r1(w, _HY_V, _r1(w, _HY_V))

    suf = _longest(w, _HY_END, rv)
    if suf is not None and len(w) - len(suf) >= r2:
        w = w[: -len(suf)]
    for table in (_HY_VERB, _HY_ADJ, _HY_NOUN):
        suf = _longest(w, table, rv)
        if suf is not None:
            w = w[: -len(suf)]
    return w


# ---------------------------------------------------------------------------
# Lovins (LovinsStemmer.cs; the 1968 Lovins stemmer as a Snowball program:
# 294 condition-gated endings — the condition runs DURING the among match,
# failing over to the next-longest ending — then undouble + 34 respells)

_LOVINS_ENDINGS = (
    ("alistically", "B"), ("izationally", "B"), ("arizability", "A"),
    ("arisations", "A"), ("arizations", "A"), ("antialness", "A"),
    ("entialness", "A"), ("entialize", "A"), ("izational", "A"),
    ("entiation", "A"), ("arisation", "A"), ("arization", "A"),
    ("entations", "A"), ("eableness", "E"), ("ativeness", "A"),
    ("ionalness", "A"), ("itousness", "A"), ("antaneous", "A"),
    ("allically", "C"), ("istically", "A"), ("ationally", "B"),
    ("antiality", "A"), ("entiality", "A"), ("izability", "A"),
    ("arizable", "A"), ("ionalize", "A"), ("ionalism", "A"),
    ("entation", "A"), ("izations", "A"), ("ableness", "A"),
    ("ibleness", "A"), ("icalness", "A"), ("lessness", "A"),
    ("eousness", "A"), ("iousness", "A"), ("entially", "A"),
    ("ionality", "A"), ("alistic", "B"), ("aristic", "A"),
    ("ivistic", "A"), ("elihood", "E"), ("encible", "A"), ("entiate", "A"),
    ("icalize", "A"), ("arizing", "A"), ("istical", "A"), ("ational", "B"),
    ("icalism", "A"), ("ativism", "A"), ("ication", "G"), ("ination", "A"),
    ("isation", "A"), ("ization", "F"), ("alities", "A"), ("ivities", "A"),
    ("entials", "A"), ("ateness", "A"), ("iteness", "A"), ("iveness", "A"),
    ("ingness", "A"), ("ishness", "A"), ("ariness", "E"), ("fulness", "A"),
    ("ousness", "A"), ("entness", "A"), ("izement", "A"), ("icalist", "A"),
    ("atively", "A"), ("atingly", "A"), ("aically", "A"), ("oidally", "A"),
    ("ionally", "A"), ("entally", "A"), ("icianry", "A"), ("icality", "A"),
    ("ability", "A"), ("ibility", "A"), ("arized", "A"), ("icance", "A"),
    ("atable", "A"), ("izable", "E"), ("eature", "Z"), ("ionate", "D"),
    ("ialize", "A"), ("ancing", "B"), ("encing", "A"), ("ioning", "A"),
    ("enting", "C"), ("ancial", "A"), ("ential", "A"), ("oidism", "A"),
    ("action", "G"), ("ariser", "A"), ("arizer", "A"), ("istics", "A"),
    ("ancies", "A"), ("encies", "A"), ("nesses", "A"), ("atives", "A"),
    ("ionals", "A"), ("icians", "A"), ("ations", "B"), ("alness", "A"),
    ("icists", "A"), ("aceous", "A"), ("acious", "B"), ("ialist", "A"),
    ("ionist", "A"), ("entist", "A"), ("ically", "A"), ("efully", "A"),
    ("ifully", "A"), ("lessly", "A"), ("eously", "A"), ("iously", "A"),
    ("iality", "A"), ("allic", "BB"), ("antic", "C"), ("istic", "A"),
    ("anced", "B"), ("enced", "A"), ("ished", "A"), ("ioned", "A"),
    ("ented", "C"), ("aroid", "A"), ("ehood", "A"), ("ihood", "A"),
    ("icide", "A"), ("otide", "A"), ("idine", "I"), ("ature", "E"),
    ("inate", "A"), ("ative", "A"), ("alize", "A"), ("arize", "A"),
    ("aging", "B"), ("ening", "E"), ("ating", "I"), ("izing", "F"),
    ("aical", "A"), ("oidal", "A"), ("arial", "A"), ("ional", "A"),
    ("ental", "A"), ("icism", "A"), ("alism", "B"), ("inism", "J"),
    ("ician", "A"), ("ation", "B"), ("ances", "B"), ("ences", "A"),
    ("oides", "A"), ("acies", "A"), ("aries", "A"), ("ities", "A"),
    ("izers", "F"), ("ators", "A"), ("eless", "A"), ("eness", "E"),
    ("iness", "A"), ("itous", "A"), ("icant", "A"), ("ement", "A"),
    ("icist", "A"), ("alist", "A"), ("iedly", "A"), ("ately", "A"),
    ("ively", "A"), ("ingly", "B"), ("arily", "A"), ("ially", "A"),
    ("fully", "A"), ("early", "Y"), ("ously", "A"), ("ently", "A"),
    ("atory", "A"), ("acity", "A"), ("icity", "A"), ("ality", "A"),
    ("elity", "A"), ("inity", "CC"), ("arity", "B"), ("ivity", "A"),
    ("aric", "A"), ("atic", "B"), ("itic", "H"), ("ened", "E"),
    ("ated", "I"), ("ized", "F"), ("hood", "A"), ("ward", "A"),
    ("ance", "B"), ("ence", "A"), ("able", "A"), ("ible", "A"),
    ("wise", "A"), ("ying", "B"), ("yish", "A"), ("ical", "A"),
    ("eful", "A"), ("iful", "A"), ("ogen", "A"), ("izer", "F"),
    ("ator", "A"), ("ides", "L"), ("ages", "B"), ("ines", "M"),
    ("ates", "A"), ("ings", "N"), ("ials", "A"), ("isms", "B"),
    ("ians", "A"), ("ions", "B"), ("iers", "A"), ("less", "A"),
    ("ness", "A"), ("ants", "B"), ("ists", "A"), ("eous", "A"),
    ("ious", "A"), ("ancy", "B"), ("ency", "A"), ("ealy", "Y"),
    ("ably", "A"), ("ibly", "A"), ("edly", "E"), ("lily", "A"),
    ("ally", "B"), ("enly", "E"), ("arly", "K"), ("eity", "A"),
    ("ata", "A"), ("aic", "A"), ("ied", "A"), ("oid", "A"), ("ide", "L"),
    ("age", "B"), ("ene", "E"), ("ine", "M"), ("one", "R"), ("ese", "A"),
    ("ate", "A"), ("ite", "AA"), ("ive", "A"), ("ize", "F"), ("ing", "N"),
    ("ish", "C"), ("eal", "Y"), ("ial", "A"), ("ful", "A"), ("ism", "B"),
    ("ium", "A"), ("ian", "A"), ("ion", "Q"), ("ear", "Y"), ("ier", "A"),
    ("ics", "A"), ("ies", "P"), ("als", "BB"), ("ars", "O"), ("ous", "A"),
    ("ant", "B"), ("ent", "C"), ("ist", "A"), ("acy", "A"), ("ely", "E"),
    ("ily", "A"), ("ary", "F"), ("ery", "E"), ("ity", "A"), ("s'", "A"),
    ("ia", "A"), ("ic", "A"), ("ed", "E"), ("ae", "A"), ("al", "BB"),
    ("yl", "R"), ("um", "U"), ("en", "F"), ("on", "S"), ("ar", "X"),
    ("or", "T"), ("'s", "A"), ("as", "B"), ("es", "E"), ("is", "A"),
    ("us", "V"), ("ly", "B"), ("a", "A"), ("e", "A"), ("i", "A"),
    ("o", "A"), ("s", "W"), ("y", "B"),
)

_LOVINS_AA = ("ph", "th", "er", "or", "es", "d", "f", "l", "t")
_LOVINS_DOUBLE = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss",
                  "tt")
_LOVINS_RESPELL = tuple(sorted((
    ("iev", "ief", ""), ("uct", "uc", ""), ("umpt", "um", ""),
    ("rpt", "rb", ""), ("urs", "ur", ""), ("istr", "ister", ""),
    ("metr", "meter", ""), ("olv", "olut", ""), ("ul", "l", "!aio"),
    ("bex", "bic", ""), ("dex", "dic", ""), ("pex", "pic", ""),
    ("tex", "tic", ""), ("ax", "ac", ""), ("ex", "ec", ""),
    ("ix", "ic", ""), ("lux", "luc", ""), ("uad", "uas", ""),
    ("vad", "vas", ""), ("cid", "cis", ""), ("lid", "lis", ""),
    ("erid", "eris", ""), ("pand", "pans", ""), ("end", "ens", "!s"),
    ("ond", "ons", ""), ("lud", "lus", ""), ("rud", "rus", ""),
    ("her", "hes", "!pt"), ("mit", "mis", ""), ("ent", "ens", "!m"),
    ("ert", "ers", ""), ("et", "es", "!n"), ("yt", "ys", ""),
    ("yz", "ys", ""),
), key=lambda t: len(t[0]), reverse=True))


def _lovins_cond(cond: str, s: str) -> bool:
    """Conditions A..CC (LovinsStemmer.cs r_A:407 .. r_CC:1643); `s` is
    the candidate stem."""
    n = len(s)
    if cond == "A":
        return n >= 2
    if cond == "B":
        return n >= 3
    if cond == "C":
        return n >= 4
    if cond == "D":
        return n >= 5
    if cond == "E":
        return n >= 2 and s[-1] != "e"
    if cond == "F":
        return n >= 3 and s[-1] != "e"
    if cond == "G":
        return n >= 3 and s[-1] == "f"
    if cond == "H":
        return n >= 2 and (s[-1] == "t" or s.endswith("ll"))
    if cond == "I":
        return n >= 2 and s[-1] not in "oe"
    if cond == "J":
        return n >= 2 and s[-1] not in "ae"
    if cond in ("K", "X"):
        hop = 3 if cond == "K" else 2
        return n >= hop and (s[-1] in "li"
                             or (s[-1] == "e" and n >= 3
                                 and s[-3] == "u"))
    if cond == "L":
        return (n >= 2 and s[-1] not in "ux"
                and (s[-1] != "s" or s[-2] == "o"))
    if cond == "M":
        return n >= 2 and s[-1] not in "acem"
    if cond == "N":
        return n >= 3 and (s[-3] != "s" or n >= 4)
    if cond == "O":
        return n >= 2 and s[-1] in "li"
    if cond == "P":
        return n >= 2 and s[-1] != "c"
    if cond == "Q":
        return n >= 3 and s[-1] not in "ln"
    if cond == "R":
        return n >= 2 and s[-1] in "nr"
    if cond == "S":
        return n >= 2 and (s.endswith("dr")
                           or (s[-1] == "t" and not s.endswith("tt")))
    if cond == "T":
        return n >= 2 and (s[-1] == "s"
                           or (s[-1] == "t" and not s.endswith("ot")))
    if cond == "U":
        return n >= 2 and s[-1] in "lmnr"
    if cond == "V":
        return n >= 2 and s[-1] == "c"
    if cond == "W":
        return n >= 2 and s[-1] not in "su"
    if cond == "Y":
        return n >= 2 and s.endswith("in")
    if cond == "Z":
        return n >= 2 and s[-1] != "f"
    if cond == "AA":
        return n >= 2 and s.endswith(_LOVINS_AA)
    if cond == "BB":
        return (n >= 3 and not s.endswith("met")
                and not s.endswith("ryst"))
    if cond == "CC":
        return n >= 2 and s[-1] == "l"
    raise ValueError(cond)


def lovins_stem(word: str) -> str:
    """Lovins stemmer (LovinsStemmer.cs Stem():3010-3040)."""
    w = word
    for suf, cond in _LOVINS_ENDINGS:
        if w.endswith(suf) and _lovins_cond(cond, w[: -len(suf)]):
            w = w[: -len(suf)]
            break
    if w.endswith(_LOVINS_DOUBLE):
        w = w[:-1]
    for suf, rep, veto in _LOVINS_RESPELL:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if veto and base >= 1 and w[base - 1] in veto[1:]:
                break
            w = w[:base] + rep
            break
    return w
