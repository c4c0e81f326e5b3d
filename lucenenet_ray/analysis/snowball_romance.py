"""Romance-family Snowball stemmers (SnowballFilter analog, wave 2).

Re-expressions of the published Snowball algorithms (snowballstem.org) for
Spanish / Italian / Portuguese / French, matching the reference's generated
Tartarus programs (``src/Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/
{Spanish,Italian,Portuguese,French}Stemmer.cs``) — validated word-for-word
against the reference vocabulary fixtures (``TestSnowballVocabData.zip``,
20k+ words per language, the TestSnowballVocab.cs corpus).

Shared Snowball semantics reproduced here:

- ``among`` is a longest-match trie that COMMITS: once the longest suffix
  matches, its per-entry conditions run; a failed condition does not fall
  back to a shorter suffix (so conditions like R2 are checked after the
  pick). The exception is an among inside ``setlimit`` to RV (the verb-
  suffix steps): there the limit participates in matching, so the pick is
  the longest suffix that also FITS inside RV.
- Regions RV / R1 / R2 are computed once on the input word; later slices
  only shorten the end, so the region start offsets stay valid.
"""

from __future__ import annotations


def _r1(w: str, vowels: frozenset, start: int = 0) -> int:
    """Region after the first non-vowel following a vowel, from `start`."""
    n = len(w)
    for i in range(start, n - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            return i + 2
    return n


def _rv_romance(w: str, vowels: frozenset) -> int:
    """Standard Romance RV (SpanishStemmer.cs r_mark_regions:292-420 shape):
    second letter consonant -> after the next vowel; first two vowels ->
    after the next consonant; consonant+vowel -> after the third letter."""
    n = len(w)
    if n < 3:
        return n
    if w[0] in vowels:
        if w[1] in vowels:          # V V: after next consonant
            for i in range(2, n):
                if w[i] not in vowels:
                    return i + 1
            return n
        # V C: after next vowel
        for i in range(2, n):
            if w[i] in vowels:
                return i + 1
        return n
    if w[1] in vowels:              # C V: after third letter
        return 3
    for i in range(2, n):           # C C: after next vowel
        if w[i] in vowels:
            return i + 1
    return n


def _longest(w: str, sufs, min_start: int = 0) -> str | None:
    """Longest suffix of `w` from `sufs` (pre-sorted longest-first) whose
    stem start is >= min_start (setlimit-among semantics)."""
    for s in sufs:
        if w.endswith(s) and len(w) - len(s) >= min_start:
            return s
    return None


def _bylen(*sufs: str) -> tuple:
    return tuple(sorted(sufs, key=len, reverse=True))


# ---------------------------------------------------------------------------
# Spanish (SpanishStemmer.cs; among tables a_0..a_9 at :44-276)

_ES_V = frozenset("aeiouáéíóúü")

_ES_PRON = _bylen("me", "se", "sela", "selo", "selas", "selos", "la", "le",
                  "lo", "las", "les", "los", "nos")
# code: 1-5 accented (replace), 6 plain (delete pronoun), 7 yendo-after-u
_ES_PRE = tuple(sorted((
    ("iéndo", 1, "iendo"), ("ándo", 2, "ando"), ("ár", 3, "ar"),
    ("ér", 4, "er"), ("ír", 5, "ir"),
    ("ando", 6, None), ("iendo", 6, None), ("ar", 6, None), ("er", 6, None),
    ("ir", 6, None), ("yendo", 7, None),
), key=lambda t: len(t[0]), reverse=True))

_ES_STD = tuple(sorted((
    ("ica", 1), ("ancia", 2), ("encia", 5), ("adora", 2), ("osa", 1),
    ("ista", 1), ("iva", 9), ("anza", 1), ("logía", 3), ("idad", 8),
    ("able", 1), ("ible", 1), ("ante", 2), ("mente", 7), ("amente", 6),
    ("ación", 2), ("ución", 4), ("ico", 1), ("ismo", 1), ("oso", 1),
    ("amiento", 1), ("imiento", 1), ("ivo", 9), ("ador", 2), ("icas", 1),
    ("ancias", 2), ("encias", 5), ("adoras", 2), ("osas", 1), ("istas", 1),
    ("ivas", 9), ("anzas", 1), ("logías", 3), ("idades", 8), ("ables", 1),
    ("ibles", 1), ("aciones", 2), ("uciones", 4), ("adores", 2),
    ("antes", 2), ("icos", 1), ("ismos", 1), ("osos", 1), ("amientos", 1),
    ("imientos", 1), ("ivos", 9),
), key=lambda t: len(t[0]), reverse=True))

_ES_Y_VERB = _bylen("ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yas",
                    "yes", "yais", "yamos", "yó")

# code 1 = en/es/éis/emos (gu -> drop u), 2 = plain delete
_ES_VERB = tuple(sorted((
    [(s, 1) for s in ("en", "es", "éis", "emos")]
    + [(s, 2) for s in (
        "aba", "ada", "ida", "ara", "iera", "ía", "aría", "ería", "iría",
        "ad", "ed", "id", "ase", "iese", "aste", "iste", "an", "aban",
        "aran", "ieran", "ían", "arían", "erían", "irían", "asen", "iesen",
        "aron", "ieron", "arán", "erán", "irán", "ado", "ido", "ando",
        "iendo", "ar", "er", "ir", "as", "abas", "adas", "idas", "aras",
        "ieras", "ías", "arías", "erías", "irías", "ases", "ieses",
        "abais", "arais", "ierais", "íais", "aríais", "eríais", "iríais",
        "aseis", "ieseis", "asteis", "isteis", "áis", "aréis", "eréis",
        "iréis", "ados", "idos", "amos", "ábamos", "áramos", "iéramos",
        "íamos", "aríamos", "eríamos", "iríamos", "aremos", "eremos",
        "iremos", "ásemos", "iésemos", "imos", "arás", "erás", "irás",
        "ís", "ará", "erá", "irá", "aré", "eré", "iré", "ió")]
), key=lambda t: len(t[0]), reverse=True))

_ES_RESID = tuple(sorted((
    ("a", 1), ("e", 2), ("o", 1), ("os", 1), ("á", 1), ("é", 2), ("í", 1),
    ("ó", 1),
), key=lambda t: len(t[0]), reverse=True))

_ES_DEACCENT = str.maketrans("áéíóú", "aeiou")


def spanish_stem(word: str) -> str:
    """Spanish Snowball stemmer (SpanishStemmer.cs Stem():1216-1311)."""
    w = word
    rv = _rv_romance(w, _ES_V)
    r1 = _r1(w, _ES_V)
    r2 = _r1(w, _ES_V, r1)

    # attached pronoun (r_attached_pronoun :553-633): pronoun among, then
    # ending among; the ending must start inside RV; cases 1-5 de-accent
    # the ending, 6 deletes the pronoun, 7 (yendo) needs a preceding u.
    for p in _ES_PRON:
        if w.endswith(p):
            stem = w[: -len(p)]
            for suf, code, repl in _ES_PRE:
                if stem.endswith(suf):
                    if len(stem) - len(suf) >= rv:
                        if code <= 5:
                            w = stem[: -len(suf)] + repl
                        elif code == 6:
                            w = stem
                        elif (len(stem) > len(suf)
                              and stem[-len(suf) - 1] == "u"):
                            w = stem
                    break
            break

    did_std = False
    # standard suffix (r_standard_suffix :635-889)
    for suf, code in _ES_STD:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if code == 1 and base >= r2:
                w = w[:base]
                did_std = True
            elif code == 2 and base >= r2:
                w = w[:base]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
                did_std = True
            elif code == 3 and base >= r2:
                w = w[:base] + "log"
                did_std = True
            elif code == 4 and base >= r2:
                w = w[:base] + "u"
                did_std = True
            elif code == 5 and base >= r2:
                w = w[:base] + "ente"
                did_std = True
            elif code == 6 and base >= r1:   # amente
                w = w[:base]
                for pre in ("ic", "ad", "os", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        if pre == "iv" and w.endswith("at") \
                                and len(w) - 2 >= r2:
                            w = w[:-2]
                        break
                did_std = True
            elif code == 7 and base >= r2:   # mente
                w = w[:base]
                for pre in ("able", "ible", "ante"):
                    if w.endswith(pre):
                        if len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                        break
                did_std = True
            elif code == 8 and base >= r2:   # idad(es)
                w = w[:base]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre):
                        if len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                        break
                did_std = True
            elif code == 9 and base >= r2:   # iva/ivo/ivas/ivos
                w = w[:base]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                did_std = True
            break

    if not did_std:
        # y_verb_suffix (:891-940): among inside setlimit(RV); the
        # preceding u may lie outside RV.
        suf = _longest(w, _ES_Y_VERB, rv)
        if suf is not None and len(w) > len(suf) \
                and w[-len(suf) - 1] == "u":
            w = w[: -len(suf)]
        else:
            # y_verb failing its u-check falls through to verb_suffix
            # (Stem():1244-1267 or-chain).
            # verb_suffix (:942-1010): among inside setlimit(RV)
            for s, code in _ES_VERB:
                if w.endswith(s) and len(w) - len(s) >= rv:
                    base = len(w) - len(s)
                    if code == 1 and w[:base].endswith("gu"):
                        w = w[: base - 1]
                    else:
                        w = w[:base]
                    break

    # residual suffix (r_residual_suffix :1012-1081)
    for suf, code in _ES_RESID:
        if w.endswith(suf):
            if len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
                if code == 2 and w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]
            break

    return w.translate(_ES_DEACCENT)


# ---------------------------------------------------------------------------
# Italian (ItalianStemmer.cs; among tables a_0..a_7 at :44-250)

_IT_V = frozenset("aeiouàèìòù")
_IT_AEIO = frozenset("aeioàèìò")

_IT_PRON = _bylen(
    "la", "cela", "gliela", "mela", "tela", "vela", "le", "cele", "gliele",
    "mele", "tele", "vele", "ne", "cene", "gliene", "mene", "sene", "tene",
    "vene", "ci", "li", "celi", "glieli", "meli", "teli", "veli", "gli",
    "mi", "si", "ti", "vi", "lo", "celo", "glielo", "melo", "telo", "velo")
_IT_PRE = tuple(sorted((
    ("ando", 1), ("endo", 1), ("ar", 2), ("er", 2), ("ir", 2),
), key=lambda t: len(t[0]), reverse=True))

_IT_STD = tuple(sorted((
    ("ica", 1), ("logia", 3), ("osa", 1), ("ista", 1), ("iva", 9),
    ("anza", 1), ("enza", 5), ("ice", 1), ("atrice", 1), ("iche", 1),
    ("logie", 3), ("abile", 1), ("ibile", 1), ("usione", 4), ("azione", 2),
    ("uzione", 4), ("atore", 2), ("ose", 1), ("ante", 1), ("mente", 1),
    ("amente", 7), ("iste", 1), ("ive", 9), ("anze", 1), ("enze", 5),
    ("ici", 1), ("atrici", 1), ("ichi", 1), ("abili", 1), ("ibili", 1),
    ("ismi", 1), ("usioni", 4), ("azioni", 2), ("uzioni", 4), ("atori", 2),
    ("osi", 1), ("anti", 1), ("amenti", 6), ("imenti", 6), ("isti", 1),
    ("ivi", 9), ("ico", 1), ("ismo", 1), ("oso", 1), ("amento", 6),
    ("imento", 6), ("ivo", 9), ("ità", 8), ("istà", 1), ("istè", 1),
    ("istì", 1),
), key=lambda t: len(t[0]), reverse=True))

_IT_VERB = _bylen(
    "isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva", "erebbe",
    "irebbe", "isce", "ende", "are", "ere", "ire", "asse", "ate", "avate",
    "evate", "ivate", "ete", "erete", "irete", "ite", "ereste", "ireste",
    "ute", "erai", "irai", "isci", "endi", "erei", "irei", "assi", "ati",
    "iti", "eresti", "iresti", "uti", "avi", "evi", "ivi", "isco", "ando",
    "endo", "Yamo", "iamo", "avamo", "evamo", "ivamo", "eremo", "iremo",
    "assimo", "ammo", "emmo", "eremmo", "iremmo", "immo", "ano", "iscano",
    "avano", "evano", "ivano", "eranno", "iranno", "ono", "iscono",
    "arono", "erono", "irono", "erebbero", "irebbero", "assero", "essero",
    "issero", "ato", "ito", "uto", "avo", "evo", "ivo", "ar", "ir", "erà",
    "irà", "erò", "irò")

_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")


def _it_prelude(w: str) -> str:
    """ItalianStemmer.cs r_prelude: acute->grave, qu->qU, u/i between
    vowels -> U/I."""
    w = w.translate(_IT_ACUTE).replace("qu", "qU")
    ch = list(w)
    for i in range(1, len(ch) - 1):
        if ch[i] in "ui" and ch[i - 1] in _IT_V and ch[i + 1] in _IT_V:
            ch[i] = ch[i].upper()
    return "".join(ch)


def italian_stem(word: str) -> str:
    """Italian Snowball stemmer (ItalianStemmer.cs Stem():1195-1290)."""
    w = _it_prelude(word)
    rv = _rv_romance(w, _IT_V)
    r1 = _r1(w, _IT_V)
    r2 = _r1(w, _IT_V, r1)

    # attached pronoun: case 1 (ando/endo) deletes the pronoun, case 2
    # (ar/er/ir) replaces the pronoun with "e" (attaccarlo -> attaccare)
    for p in _IT_PRON:
        if w.endswith(p):
            stem = w[: -len(p)]
            for suf, code in _IT_PRE:
                if stem.endswith(suf) and len(stem) - len(suf) >= rv:
                    w = stem if code == 1 else stem + "e"
                    break
            break

    did_std = False
    for suf, code in _IT_STD:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if code == 1 and base >= r2:
                w = w[:base]
                did_std = True
            elif code == 2 and base >= r2:
                w = w[:base]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
                did_std = True
            elif code == 3 and base >= r2:
                w = w[:base] + "log"
                did_std = True
            elif code == 4 and base >= r2:
                w = w[:base] + "u"
                did_std = True
            elif code == 5 and base >= r2:
                w = w[:base] + "ente"
                did_std = True
            elif code == 6 and base >= rv:   # amento/amenti/imento/imenti
                w = w[:base]
                did_std = True
            elif code == 7 and base >= r1:   # amente
                w = w[:base]
                for pre, k in (("abil", 0), ("ic", 0), ("os", 0),
                               ("iv", 1)):
                    if w.endswith(pre):
                        if len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                            if k == 1 and w.endswith("at") \
                                    and len(w) - 2 >= r2:
                                w = w[:-2]
                        break
                did_std = True
            elif code == 8 and base >= r2:   # ità
                w = w[:base]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre):
                        if len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                        break
                did_std = True
            elif code == 9 and base >= r2:   # iva/ive/ivi/ivo
                w = w[:base]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]
                did_std = True
            break

    if not did_std:
        suf = _longest(w, _IT_VERB, rv)
        if suf is not None:
            w = w[: -len(suf)]

    # vowel_suffix: final a/e/i/o/à/è/ì/ò in RV (then a following i in RV),
    # then ch/gh -> c/g in RV
    if w and w[-1] in _IT_AEIO and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    if w.endswith(("ch", "gh")) and len(w) - 2 >= rv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Portuguese (PortugueseStemmer.cs; among tables a_0..a_8 at :44-290)

_PT_V = frozenset("aeiouáéíóúâêô")

_PT_STD = tuple(sorted((
    ("ica", 1), ("ância", 1), ("ência", 4), ("ira", 9), ("adora", 1),
    ("osa", 1), ("ista", 1), ("iva", 8), ("eza", 1), ("logía", 2),
    ("idade", 7), ("ante", 1), ("mente", 6), ("amente", 5), ("ável", 1),
    ("ível", 1), ("ución", 3), ("ico", 1), ("ismo", 1), ("oso", 1),
    ("amento", 1), ("imento", 1), ("ivo", 8), ("aça~o", 1), ("ador", 1),
    ("icas", 1), ("ências", 4), ("iras", 9), ("adoras", 1), ("osas", 1),
    ("istas", 1), ("ivas", 8), ("ezas", 1), ("logías", 2), ("idades", 7),
    ("uciones", 3), ("adores", 1), ("antes", 1), ("aço~es", 1),
    ("icos", 1), ("ismos", 1), ("osos", 1), ("amentos", 1),
    ("imentos", 1), ("ivos", 8),
), key=lambda t: len(t[0]), reverse=True))

_PT_VERB = _bylen(
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira", "ava",
    "asse", "esse", "isse", "aste", "este", "iste", "ei", "arei", "erei",
    "irei", "am", "iam", "ariam", "eriam", "iriam", "aram", "eram", "iram",
    "avam", "em", "arem", "erem", "irem", "assem", "essem", "issem", "ado",
    "ido", "ando", "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er",
    "ir", "as", "adas", "idas", "ias", "arias", "erias", "irias", "aras",
    "eras", "iras", "avas", "es", "ardes", "erdes", "irdes", "ares",
    "eres", "ires", "asses", "esses", "isses", "astes", "estes", "istes",
    "is", "ais", "eis", "areis", "ereis", "ireis", "áreis", "éreis",
    "íreis", "ásseis", "ésseis", "ísseis", "áveis", "íeis", "aríeis",
    "eríeis", "iríeis", "ados", "idos", "amos", "áramos", "éramos",
    "íramos", "ávamos", "íamos", "aríamos", "eríamos", "iríamos", "emos",
    "aremos", "eremos", "iremos", "ássemos", "êssemos", "íssemos", "imos",
    "armos", "ermos", "irmos", "ámos", "arás", "erás", "irás", "eu", "iu",
    "ou", "ará", "erá", "irá")

_PT_RESID = _bylen("os", "a", "i", "o", "á", "í", "ó")


def portuguese_stem(word: str) -> str:
    """Portuguese Snowball stemmer (PortugueseStemmer.cs Stem():1350-1460).

    Prelude maps nasal vowels to marked pairs (ã -> a~, õ -> o~) so the
    suffix tables can address them; the postlude maps back.
    """
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv = _rv_romance(w, _PT_V)
    r1 = _r1(w, _PT_V)
    r2 = _r1(w, _PT_V, r1)

    did = False
    for suf, code in _PT_STD:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if code == 1 and base >= r2:
                w = w[:base]
                did = True
            elif code == 2 and base >= r2:
                w = w[:base] + "log"
                did = True
            elif code == 3 and base >= r2:
                w = w[:base] + "u"
                did = True
            elif code == 4 and base >= r2:
                w = w[:base] + "ente"
                did = True
            elif code == 5 and base >= r1:   # amente
                w = w[:base]
                for pre, k in (("ic", 0), ("ad", 0), ("os", 0), ("iv", 1)):
                    if w.endswith(pre):
                        if len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                            if k == 1 and w.endswith("at") \
                                    and len(w) - 2 >= r2:
                                w = w[:-2]
                        break
                did = True
            elif code == 6 and base >= r2:   # mente
                w = w[:base]
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre):
                        if len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                        break
                did = True
            elif code == 7 and base >= r2:   # idade(s)
                w = w[:base]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre):
                        if len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                        break
                did = True
            elif code == 8 and base >= r2:   # iva/ivo/ivas/ivos
                w = w[:base]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                did = True
            elif code == 9 and base >= rv and base >= 1 \
                    and w[base - 1] == "e":  # (e)ira(s) -> ir
                w = w[:base] + "ir"
                did = True
            break

    if not did:
        suf = _longest(w, _PT_VERB, rv)
        if suf is not None:
            w = w[: -len(suf)]
            did = True

    if did:
        # trailing i of "ci" in RV (Stem():1395-1410)
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        for suf in _PT_RESID:
            if w.endswith(suf):
                if len(w) - len(suf) >= rv:
                    w = w[: -len(suf)]
                break

    # residual_form: e/é/ê in RV (then gu/ci undouble), ç -> c
    if w and w[-1] in "eéê":
        if len(w) - 1 >= rv:
            w = w[:-1]
            if ((w.endswith("gu") or w.endswith("ci"))
                    and len(w) - 1 >= rv):
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# French (FrenchStemmer.cs; among tables a_0..a_8 at :44-235)

_FR_V = frozenset("aeiouyàâèéêëîïôùû")
_FR_KEEP_S = frozenset("aiousè")   # g_keep_with_s :215

_FR_STD = tuple(sorted((
    ("iqUe", 1), ("atrice", 2), ("ance", 1), ("ence", 5), ("logie", 3),
    ("able", 1), ("isme", 1), ("euse", 11), ("iste", 1), ("ive", 8),
    ("if", 8), ("usion", 4), ("ation", 2), ("ution", 4), ("ateur", 2),
    ("iqUes", 1), ("atrices", 2), ("ances", 1), ("ences", 5),
    ("logies", 3), ("ables", 1), ("ismes", 1), ("euses", 11),
    ("istes", 1), ("ives", 8), ("ifs", 8), ("usions", 4), ("ations", 2),
    ("utions", 4), ("ateurs", 2), ("ments", 15), ("ements", 6),
    ("issements", 12), ("ités", 7), ("ment", 15), ("ement", 6),
    ("issement", 12), ("amment", 13), ("emment", 14), ("aux", 10),
    ("eaux", 9), ("eux", 1), ("ité", 7),
), key=lambda t: len(t[0]), reverse=True))

_FR_I_VERB = _bylen(
    "ira", "ie", "isse", "issante", "i", "irai", "ir", "iras", "ies",
    "îmes", "isses", "issantes", "îtes", "is", "irais", "issais",
    "irions", "issions", "irons", "issons", "issants", "it", "irait",
    "issait", "issant", "iraIent", "issaIent", "irent", "issent",
    "iront", "ît", "iriez", "issiez", "irez", "issez")

_FR_VERB = tuple(sorted((
    [("ions", 1)]
    + [(s, 2) for s in ("era", "ée", "erai", "er", "eras", "ées", "erais",
                        "erions", "erons", "és", "erait", "eraIent",
                        "èrent", "eront", "ez", "iez", "eriez", "erez",
                        "é")]
    + [(s, 3) for s in ("a", "asse", "ante", "ai", "as", "âmes", "asses",
                        "antes", "âtes", "ais", "assions", "ants", "ait",
                        "ant", "aIent", "assent", "ât", "assiez")]
), key=lambda t: len(t[0]), reverse=True))

_FR_RESID = tuple(sorted((
    ("e", 3), ("Ière", 2), ("ière", 2), ("ion", 1), ("Ier", 2),
    ("ier", 2), ("ë", 4),
), key=lambda t: len(t[0]), reverse=True))


def _fr_prelude(w: str) -> str:
    """FrenchStemmer.cs r_prelude: u/i between vowels -> U/I, y next to a
    vowel -> Y, u after q -> U."""
    ch = list(w)
    n = len(ch)
    i = 0
    while i < n:
        c = ch[i]
        replaced = False
        if c in _FR_V:
            if i + 2 < n and ch[i + 1] == "u" and ch[i + 2] in _FR_V:
                ch[i + 1] = "U"
                replaced = True
            elif i + 2 < n and ch[i + 1] == "i" and ch[i + 2] in _FR_V:
                ch[i + 1] = "I"
                replaced = True
            elif i + 1 < n and ch[i + 1] == "y":
                ch[i + 1] = "Y"
                replaced = True
        if not replaced:
            # the or-branches fall through at the same position ('y' is
            # itself in the vowel group, so a vowel-first miss must still
            # try the y-before-vowel branch)
            if c == "y" and i + 1 < n and ch[i + 1] in _FR_V:
                ch[i] = "Y"
            elif c == "q" and i + 1 < n and ch[i + 1] == "u":
                ch[i + 1] = "U"
        i += 1
    return "".join(ch)


def _rv_french(w: str) -> int:
    """French RV (r_mark_regions): two leading vowels or col/par/tap ->
    position 3; else after the first vowel past position 0."""
    n = len(w)
    if n >= 2 and w[0] in _FR_V and w[1] in _FR_V:
        return min(3, n)
    if w[:3] in ("col", "par", "tap"):
        return 3
    for i in range(1, n):
        if w[i] in _FR_V:
            return i + 1
    return n


def french_stem(word: str) -> str:
    """French Snowball stemmer (FrenchStemmer.cs Stem():1493-1613).

    The standard-suffix cases amment/emment/ment(s) slice and then FAIL
    (generated `return false` after SliceFrom/SliceDel), so the verb and
    residual steps still run on the already-sliced word.
    """
    w = _fr_prelude(word)
    rv = _rv_french(w)
    r1 = _r1(w, _FR_V)
    r2 = _r1(w, _FR_V, r1)

    did = False          # any of standard/i_verb/verb succeeded
    matched_std = False
    for suf, code in _FR_STD:
        if w.endswith(suf):
            matched_std = True
            base = len(w) - len(suf)
            if code == 1 and base >= r2:
                w = w[:base]
                did = True
            elif code == 2 and base >= r2:
                w = w[:base]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                did = True
            elif code == 3 and base >= r2:
                w = w[:base] + "log"
                did = True
            elif code == 4 and base >= r2:
                w = w[:base] + "u"
                did = True
            elif code == 5 and base >= r2:
                w = w[:base] + "ent"
                did = True
            elif code == 6 and base >= rv:   # ement(s)
                w = w[:base]
                for pre, k in (("Ièr", 4), ("ièr", 4), ("iqU", 3),
                               ("abl", 3), ("eus", 2), ("iv", 1)):
                    if w.endswith(pre):
                        b2 = len(w) - len(pre)
                        if k == 1 and b2 >= r2:
                            w = w[:b2]
                            if w.endswith("at") and len(w) - 2 >= r2:
                                w = w[:-2]
                        elif k == 2:
                            if b2 >= r2:
                                w = w[:b2]
                            elif b2 >= r1:
                                w = w[:b2] + "eux"
                        elif k == 3 and b2 >= r2:
                            w = w[:b2]
                        elif k == 4 and b2 >= rv:
                            w = w[:b2] + "i"
                        break
                did = True
            elif code == 7 and base >= r2:   # ité(s)
                w = w[:base]
                for pre, k in (("abil", 1), ("ic", 2), ("iv", 3)):
                    if w.endswith(pre):
                        b2 = len(w) - len(pre)
                        if k == 1:
                            w = w[:b2] if b2 >= r2 else w[:b2] + "abl"
                        elif k == 2:
                            w = w[:b2] if b2 >= r2 else w[:b2] + "iqU"
                        elif b2 >= r2:
                            w = w[:b2]
                        break
                did = True
            elif code == 8 and base >= r2:   # ive/ives/if/ifs
                w = w[:base]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
                did = True
            elif code == 9:                  # eaux -> eau
                w = w[:base] + "eau"
                did = True
            elif code == 10 and base >= r1:  # aux -> al
                w = w[:base] + "al"
                did = True
            elif code == 11:                 # euse(s)
                if base >= r2:
                    w = w[:base]
                    did = True
                elif base >= r1:
                    w = w[:base] + "eux"
                    did = True
            elif code == 12 and base >= r1 and base >= 1 \
                    and w[base - 1] not in _FR_V:   # issement(s)
                w = w[:base]
                did = True
            elif code == 13 and base >= rv:  # amment -> ant, then FAIL
                w = w[:base] + "ant"
            elif code == 14 and base >= rv:  # emment -> ent, then FAIL
                w = w[:base] + "ent"
            elif code == 15 and base >= 1 and w[base - 1] in _FR_V \
                    and base - 1 >= rv:      # ment(s) after RV vowel, FAIL
                w = w[:base]
            break

    if not did:
        # i_verb_suffix: among inside setlimit(RV); the preceding
        # non-vowel must also be readable inside RV (base > rv).
        suf = _longest(w, _FR_I_VERB, rv) if len(w) >= rv else None
        if suf is not None and len(w) - len(suf) > rv \
                and w[len(w) - len(suf) - 1] not in _FR_V:
            w = w[: -len(suf)]
            did = True
        elif len(w) >= rv:
            # verb_suffix: among inside setlimit(RV)
            for s, code in _FR_VERB:
                if w.endswith(s) and len(w) - len(s) >= rv:
                    base = len(w) - len(s)
                    if code == 1:
                        if base >= r2:
                            w = w[:base]
                            did = True
                    elif code == 2:
                        w = w[:base]
                        did = True
                    else:
                        w = w[:base]
                        if w.endswith("e") and len(w) - 1 >= rv:
                            w = w[:-1]
                        did = True
                    break

    if did:
        # try: final Y -> i, or ç -> c
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # residual_suffix: optional s-drop, then RV-limited among
        if len(w) >= 2 and w[-1] == "s" and w[-2] not in _FR_KEEP_S:
            w = w[:-1]
        if len(w) >= rv:
            for suf, code in _FR_RESID:
                if w.endswith(suf) and len(w) - len(suf) >= rv:
                    base = len(w) - len(suf)
                    if code == 1:
                        if base >= r2 and base - 1 >= rv \
                                and w[base - 1] in "st":
                            w = w[:base]
                    elif code == 2:
                        w = w[:base] + "i"
                    elif code == 3:
                        w = w[:base]
                    elif code == 4 and base >= rv + 2 \
                            and w[:base].endswith("gu"):
                        w = w[:base]
                    break

    # un_double: final letter of enn/onn/ett/ell/eill dropped
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # un_accent: é/è before a trailing run of 1+ non-vowels -> e
    i = len(w) - 1
    while i >= 0 and w[i] not in _FR_V:
        i -= 1
    if i < len(w) - 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")
