"""Turkish Snowball stemmer (SnowballFilter analog).

Re-expression of the published Turkish Snowball algorithm (Evren Kapusuz
Çilden), matching the reference's generated Tartarus program
(``src/Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/TurkishStemmer.cs``)
— validated word-for-word on the reference vocabulary fixture.

Implementation notes mirroring the generated program's semantics:

- ``mark_*`` helpers take ``(w, p)`` — the word and the ket position — and
  return the suffix-START position (possibly extended over an optional
  n/s/y consonant or U vowel) or ``None``. They never modify the buffer.
- Slice deletions PERSIST even when an enclosing try/or later fails; only
  cursor positions are restored (snowball cursor saves are end-relative).
  That is why the chain functions below keep partial deletions when a
  following ``stem_suffix_chain_before_ki`` fails.
- ``SnowballFilter.cs:72-80`` ignores ``Stem()``'s return value and takes
  the buffer as-is, so a mid-way failure (e.g. the reserved-word check or
  ``continue_stemming_noun_suffixes`` unset) still keeps prior deletions.
"""

from __future__ import annotations

_TR_V = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
# vowel harmony groups (g_vowel1..g_vowel6, TurkishStemmer.cs:238-248)
_TR_HARM = {"a": "aoıu", "e": "eiöü", "ı": "aı", "i": "ei",
            "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}


def _srt(*sufs: str) -> tuple:
    return tuple(sorted(sufs, key=len, reverse=True))


_A0 = _srt("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız",
           "nız")                                        # possessives
_A1 = _srt("leri", "ları")
_A2 = _srt("ni", "nu", "nü", "nı")
_A3 = _srt("in", "un", "ün", "ın")
_A4 = _srt("a", "e")
_A5 = _srt("na", "ne")
_A6 = _srt("da", "ta", "de", "te")
_A7 = _srt("nda", "nde")
_A8 = _srt("dan", "tan", "den", "ten")
_A9 = _srt("ndan", "nden")
_A10 = _srt("la", "le")
_A11 = _srt("ca", "ce")
_A12 = _srt("im", "um", "üm", "ım")
_A13 = _srt("sin", "sun", "sün", "sın")
_A14 = _srt("iz", "uz", "üz", "ız")
_A15 = _srt("siniz", "sunuz", "sünüz", "sınız")
_A16 = _srt("lar", "ler")
_A17 = _srt("niz", "nuz", "nüz", "nız")
_A18 = _srt("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_A19 = _srt("casına", "cesine")
_A20 = _srt("di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık",
            "tık", "dim", "tim", "dum", "tum", "düm", "tüm", "dım",
            "tım", "din", "tin", "dun", "tun", "dün", "tün", "dın",
            "tın", "du", "tu", "dü", "tü", "dı", "tı")
_A21 = _srt("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
_A22 = _srt("miş", "muş", "müş", "mış")


def _among(w: str, p: int, sufs: tuple) -> int | None:
    for s in sufs:
        q = p - len(s)
        if q >= 0 and w.startswith(s, q):
            return q
    return None


def _harmony(w: str, p: int) -> bool:
    """r_check_vowel_harmony (:260): last vowel before p, then ANY earlier
    char in its harmony group (intervening chars are skipped)."""
    j = p - 1
    while j >= 0 and w[j] not in _TR_V:
        j -= 1
    if j < 0:
        return False
    grp = _TR_HARM[w[j]]
    k = j - 1
    while k >= 0 and w[k] not in grp:
        k -= 1
    return k >= 0


def _opt_c(w: str, p: int, c: str) -> int | None:
    """mark_suffix_with_optional_{n,s,y}_consonant (:594-865)."""
    if p >= 2 and w[p - 1] == c:
        return p - 1 if w[p - 2] in _TR_V else None
    if p >= 1 and w[p - 1] == c:
        return None
    return p if p >= 2 and w[p - 2] in _TR_V else None


def _opt_U(w: str, p: int) -> int | None:
    """mark_suffix_with_optional_U_vowel (:866)."""
    if p >= 2 and w[p - 1] in _TR_U:
        return p - 1 if w[p - 2] not in _TR_V else None
    if p >= 1 and w[p - 1] in _TR_U:
        return None
    return p if p >= 2 and w[p - 2] not in _TR_V else None


def _mk_possessives(w, p):
    q = _among(w, p, _A0)
    return None if q is None else _opt_U(w, q)


def _mk_sU(w, p):
    if not _harmony(w, p):
        return None
    if not (p >= 1 and w[p - 1] in _TR_U):
        return None
    return _opt_c(w, p - 1, "s")


def _mk_lArI(w, p):
    return _among(w, p, _A1)


def _mk_yU(w, p):
    if not _harmony(w, p):
        return None
    if not (p >= 1 and w[p - 1] in _TR_U):
        return None
    return _opt_c(w, p - 1, "y")


def _mk_simple(table):
    def mk(w, p):
        if not _harmony(w, p):
            return None
        return _among(w, p, table)
    return mk


def _mk_opt(table, c):
    def mk(w, p):
        if not _harmony(w, p):
            return None
        q = _among(w, p, table)
        return None if q is None else _opt_c(w, q, c)
    return mk


_mk_nU = _mk_simple(_A2)
_mk_nUn = _mk_opt(_A3, "n")
_mk_yA = _mk_opt(_A4, "y")
_mk_nA = _mk_simple(_A5)
_mk_DA = _mk_simple(_A6)
_mk_ndA = _mk_simple(_A7)
_mk_DAn = _mk_simple(_A8)
_mk_ndAn = _mk_simple(_A9)
_mk_ylA = _mk_opt(_A10, "y")
_mk_ncA = _mk_opt(_A11, "n")
_mk_yUm = _mk_opt(_A12, "y")
_mk_sUn = _mk_simple(_A13)
_mk_yUz = _mk_opt(_A14, "y")
_mk_lAr = _mk_simple(_A16)
_mk_nUz = _mk_simple(_A17)
_mk_DUr = _mk_simple(_A18)
_mk_yDU = _mk_opt(_A20, "y")
_mk_ymUs = _mk_opt(_A22, "y")


def _mk_sUnUz(w, p):
    return _among(w, p, _A15)


def _mk_cAsInA(w, p):
    return _among(w, p, _A19)


def _mk_ysA(w, p):
    q = _among(w, p, _A21)
    return None if q is None else _opt_c(w, q, "y")


def _mk_yken(w, p):
    if p >= 3 and w.startswith("ken", p - 3):
        return _opt_c(w, p - 3, "y")
    return None


def _first(w, p, *marks):
    for mk in marks:
        q = mk(w, p)
        if q is not None:
            return q
    return None


def _nominal_verb(w: str) -> tuple[str, bool]:
    """r_stem_nominal_verb_suffixes (:1426). Returns (word, continue)."""
    n = len(w)
    # branch 1
    p = _first(w, n, _mk_ymUs, _mk_yDU, _mk_ysA, _mk_yken)
    if p is not None:
        return w[:p], True
    # branch 2: cAsInA (try person) ymUs_
    p = _mk_cAsInA(w, n)
    if p is not None:
        q = _first(w, p, _mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz)
        if q is None:
            q = p
        r = _mk_ymUs(w, q)
        if r is not None:
            return w[:r], True
    # branch 3: lAr, delete, try(DUr|yDU|ysA|ymUs_), stop noun stemming
    p = _mk_lAr(w, n)
    if p is not None:
        w2 = w[:p]
        q = _first(w2, len(w2), _mk_DUr, _mk_yDU, _mk_ysA, _mk_ymUs)
        if q is not None:
            w2 = w2[:q]
        return w2, False
    # branch 4: nUz (yDU|ysA)
    p = _mk_nUz(w, n)
    if p is not None:
        q = _first(w, p, _mk_yDU, _mk_ysA)
        if q is not None:
            return w[:q], True
    # branch 5: (sUnUz|yUz|sUn|yUm), delete, try ymUs_
    p = _first(w, n, _mk_sUnUz, _mk_yUz, _mk_sUn, _mk_yUm)
    if p is not None:
        w2 = w[:p]
        q = _mk_ymUs(w2, len(w2))
        return (w2[:q] if q is not None else w2), True
    # branch 6: DUr, delete, try((person|()) ymUs_)
    p = _mk_DUr(w, n)
    if p is not None:
        w2 = w[:p]
        q = _first(w2, len(w2), _mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn,
                   _mk_yUz)
        if q is None:
            q = len(w2)
        r = _mk_ymUs(w2, q)
        if r is not None:
            w2 = w2[:r]
        return w2, True
    return w, True


def _ki_chain(s: str) -> str | None:
    """r_stem_suffix_chain_before_ki (:1887) over the prefix `s` (the
    region ends at len(s)); returns the modified prefix or None."""
    if not s.endswith("ki") or len(s) < 2:
        return None
    p = len(s) - 2
    q = _mk_DA(s, p)
    if q is not None:
        s2 = s[:q]
        r = _mk_lAr(s2, len(s2))
        if r is not None:
            s3 = s2[:r]
            k = _ki_chain(s3)
            return k if k is not None else s3
        r = _mk_possessives(s2, len(s2))
        if r is not None:
            s3 = s2[:r]
            r2 = _mk_lAr(s3, len(s3))
            if r2 is not None:
                s3 = s3[:r2]
                k = _ki_chain(s3)
                if k is not None:
                    return k
            return s3
        return s2
    q = _mk_nUn(s, p)
    if q is not None:
        s2 = s[:q]
        r = _mk_lArI(s2, len(s2))
        if r is not None:
            return s2[:r]
        r = _first(s2, len(s2), _mk_possessives, _mk_sU)
        if r is not None:
            s3 = s2[:r]
            r2 = _mk_lAr(s3, len(s3))
            if r2 is not None:
                s3 = s3[:r2]
                k = _ki_chain(s3)
                if k is not None:
                    return k
            return s3
        k = _ki_chain(s2)
        return k if k is not None else s2
    q = _mk_ndA(s, p)
    if q is not None:
        # no delete of ndA+ki yet — sub-suffixes mark below it and the
        # deletion runs to the ORIGINAL end
        r = _mk_lArI(s, q)
        if r is not None:
            return s[:r]
        r = _mk_sU(s, q)
        if r is not None:
            s2 = s[:r]
            r2 = _mk_lAr(s2, len(s2))
            if r2 is not None:
                s3 = s2[:r2]
                k = _ki_chain(s3)
                if k is not None:
                    return k
                return s3
            return s2
        # recursion with the region ending at q; the tail stays
        k = _ki_chain(s[:q])
        if k is not None:
            return k + s[q:]
    return None


def _try_lAr_ki(w: str) -> str:
    """try([mark_lAr] delete stem_suffix_chain_before_ki) — the lAr
    deletion persists even when the ki chain fails."""
    r = _mk_lAr(w, len(w))
    if r is not None:
        w = w[:r]
        k = _ki_chain(w)
        if k is not None:
            w = k
    return w


def _noun_suffixes(w: str) -> str:
    """r_stem_noun_suffixes (:2224)."""
    n = len(w)
    # 1: lAr, try ki
    p = _mk_lAr(w, n)
    if p is not None:
        w = w[:p]
        k = _ki_chain(w)
        return k if k is not None else w
    # 2: ncA
    p = _mk_ncA(w, n)
    if p is not None:
        w = w[:p]
        q = _mk_lArI(w, len(w))
        if q is not None:
            return w[:q]
        q = _first(w, len(w), _mk_possessives, _mk_sU)
        if q is not None:
            w = w[:q]
            return _try_lAr_ki(w)
        return _try_lAr_ki(w)
    # 3: (ndA|nA) then (lArI | sU... | ki-chain)
    p = _first(w, n, _mk_ndA, _mk_nA)
    if p is not None:
        q = _mk_lArI(w, p)
        if q is not None:
            return w[:q]
        q = _mk_sU(w, p)
        if q is not None:
            return _try_lAr_ki(w[:q])
        k = _ki_chain(w[:p])
        if k is not None:
            return k + w[p:]
        # branch fails -> fall through
    # 4: (ndAn|nU) then (sU... | lArI)
    p = _first(w, n, _mk_ndAn, _mk_nU)
    if p is not None:
        q = _mk_sU(w, p)
        if q is not None:
            return _try_lAr_ki(w[:q])
        q = _mk_lArI(w, p)
        if q is not None:
            return w[:q]
        # branch fails -> fall through
    # 5: DAn, delete, try(poss... | lAr... | ki)
    p = _mk_DAn(w, n)
    if p is not None:
        w = w[:p]
        q = _mk_possessives(w, len(w))
        if q is not None:
            return _try_lAr_ki(w[:q])
        q = _mk_lAr(w, len(w))
        if q is not None:
            w = w[:q]
            k = _ki_chain(w)
            return k if k is not None else w
        k = _ki_chain(w)
        return k if k is not None else w
    # 6: (nUn|ylA), delete, try(lAr+ki | (poss|sU)... | ki)
    p = _first(w, n, _mk_nUn, _mk_ylA)
    if p is not None:
        w = w[:p]
        r = _mk_lAr(w, len(w))
        if r is not None:
            w = w[:r]
            k = _ki_chain(w)
            if k is not None:
                return k
            # lAr deletion persists; fall to the next alternative
        q = _first(w, len(w), _mk_possessives, _mk_sU)
        if q is not None:
            return _try_lAr_ki(w[:q])
        k = _ki_chain(w)
        return k if k is not None else w
    # 7: lArI
    p = _mk_lArI(w, n)
    if p is not None:
        return w[:p]
    # 8: ki chain at the end
    k = _ki_chain(w)
    if k is not None:
        return k
    # 9: (DA|yU|yA), delete, try(((poss [lAr]) | lAr) delete ki)
    p = _first(w, n, _mk_DA, _mk_yU, _mk_yA)
    if p is not None:
        w = w[:p]
        q = _mk_possessives(w, len(w))
        if q is not None:
            w = w[:q]
            r = _mk_lAr(w, len(w))
            pos = r if r is not None else len(w)
        else:
            pos = _mk_lAr(w, len(w))
            if pos is None:
                return w
        w = w[:pos]
        k = _ki_chain(w)
        return k if k is not None else w
    # 10: (poss|sU), delete, try(lAr delete ki)
    p = _first(w, n, _mk_possessives, _mk_sU)
    if p is not None:
        w = w[:p]
        r = _mk_lAr(w, len(w))
        if r is not None:
            w = w[:r]
            k = _ki_chain(w)
            if k is not None:
                w = k
        return w
    return w


def turkish_stem(word: str) -> str:
    """Turkish Snowball stemmer (TurkishStemmer.cs Stem():3690-3730)."""
    w = word
    if sum(1 for c in w if c in _TR_V) < 2:
        return w
    w, cont = _nominal_verb(w)
    if not cont:
        return w
    w = _noun_suffixes(w)
    # postlude (:3621): reserved words skip it; else append harmony vowel
    # after d/g, then devoice a final b/c/d/ğ
    if w in ("ad", "soyad"):
        return w
    if w.endswith(("d", "g")):
        j = len(w) - 1
        while j >= 0 and w[j] not in _TR_V:
            j -= 1
        if j >= 0:
            v = w[j]
            if v in "aı":
                w += "ı"
            elif v in "ei":
                w += "i"
            elif v in "ou":
                w += "u"
            else:
                w += "ü"
    last = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(w[-1:])
    if last:
        w = w[:-1] + last
    return w
