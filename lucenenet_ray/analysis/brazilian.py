"""Brazilian Portuguese stemmer (``Analysis/Br/BrazilianStemmer.cs``, the
Orengo/Huyck RSLP-style stemmer hard-coded in the reference).

Pipeline: fold accents (ChangeTerm), compute the R1/R2/RV regions, then
Step1 (standard suffixes gated on R1/R2/RV), else Step2 (verb suffixes in
RV), then Step3 (i-after-c) if altered else Step4 (residual vowel), then
Step5 (final e with gu/ci repair). Returns None for non-indexable input
(len <= 2 or >= 30 after folding) — the filter keeps the original term
then, like BrazilianStemFilter.cs.

Two reference bugs reproduced bit-for-bit: the Step1 "logias" branch
discards its ReplaceSuffix result (marks altered without changing CT), and
one Step2 entry checks RV for "ira" but removes "ava" (a no-op remove that
still short-circuits the scan).
"""

from __future__ import annotations

_BR_FOLD = {
    "á": "a", "â": "a", "ã": "a",
    "é": "e", "ê": "e",
    "í": "i",
    "ó": "o", "ô": "o", "õ": "o",
    "ú": "u", "ü": "u",
    "ç": "c", "ñ": "n",
}
_VOWELS = frozenset("aeiou")
_PUNCT = frozenset("\"'-,;.?!")


def _sfx(v: str | None, s: str) -> bool:
    return v is not None and len(v) >= len(s) and v.endswith(s)


def _rm(v: str, s: str) -> str:
    return v[: -len(s)] if _sfx(v, s) else v


def _repl(v: str, a: str, b: str) -> str:
    r = _rm(v, a)
    return v if r == v else r + b


def _preceded(v: str | None, suffix: str, prec: str) -> bool:
    return _sfx(v, suffix) and _sfx(_rm(v, suffix), prec)


def _change_term(v: str) -> str:
    return "".join(_BR_FOLD.get(ch, ch) for ch in v.lower())


def _create_ct(term: str) -> str:
    ct = _change_term(term)
    if len(ct) < 2:
        return ct
    if ct[0] in _PUNCT:
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in _PUNCT:
        ct = ct[:-1]
    return ct


def _get_r1(v: str | None) -> str | None:
    """Region after the first non-vowel following a vowel (last char is
    never scanned, matching the reference's ``j < len-1`` bounds)."""
    if v is None:
        return None
    i = len(v) - 1
    j = 0
    while j < i and not v[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and v[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return v[j + 1:]


def _get_rv(v: str | None) -> str | None:
    if v is None:
        return None
    i = len(v) - 1
    if i > 0 and v[1] not in _VOWELS:
        j = 2
        while j < i and v[j] not in _VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 1 and v[0] in _VOWELS and v[1] in _VOWELS:
        j = 2
        while j < i and v[j] in _VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 2:
        return v[3:]
    return None


# Step1 rows: (suffix, region ('R1'|'R2'|'RV'), min CT length or 0,
# replacement or None, extra SuffixPreceded char or None, assign?)
_STEP1 = (
    ("uciones", "R2", 0, "u", None, True),
    ("imentos", "R2", 6, None, None, True),
    ("amentos", "R2", 6, None, None, True),
    ("adores", "R2", 6, None, None, True),
    ("adoras", "R2", 6, None, None, True),
    ("logias", "R2", 6, "log", None, False),   # reference: result dropped
    ("encias", "R2", 6, "ente", None, True),
    ("amente", "R1", 6, None, None, True),
    ("idades", "R2", 6, None, None, True),
    ("acoes", "R2", 5, None, None, True),
    ("imento", "R2", 5, None, None, True),
    ("amento", "R2", 5, None, None, True),
    ("adora", "R2", 5, None, None, True),
    ("ismos", "R2", 5, None, None, True),
    ("istas", "R2", 5, None, None, True),
    ("logia", "R2", 5, "log", None, True),
    ("ucion", "R2", 5, "u", None, True),
    ("encia", "R2", 5, "ente", None, True),
    ("mente", "R2", 5, None, None, True),
    ("idade", "R2", 5, None, None, True),
    ("acao", "R2", 4, None, None, True),
    ("ezas", "R2", 4, None, None, True),
    ("icos", "R2", 4, None, None, True),
    ("icas", "R2", 4, None, None, True),
    ("ismo", "R2", 4, None, None, True),
    ("avel", "R2", 4, None, None, True),
    ("ivel", "R2", 4, None, None, True),
    ("ista", "R2", 4, None, None, True),
    ("osos", "R2", 4, None, None, True),
    ("osas", "R2", 4, None, None, True),
    ("ador", "R2", 4, None, None, True),
    ("ivas", "R2", 4, None, None, True),
    ("ivos", "R2", 4, None, None, True),
    ("iras", "RV", 4, "ir", "e", True),
    ("eza", "R2", 3, None, None, True),
    ("ico", "R2", 3, None, None, True),
    ("ica", "R2", 3, None, None, True),
    ("oso", "R2", 3, None, None, True),
    ("osa", "R2", 3, None, None, True),
    ("iva", "R2", 3, None, None, True),
    ("ivo", "R2", 3, None, None, True),
    ("ira", "RV", 3, "ir", "e", True),
)

# Step2 rows in exact source order: (RV suffix checked, CT suffix removed)
_STEP2 = (
    ("issemos", "issemos"), ("essemos", "essemos"), ("assemos", "assemos"),
    ("ariamos", "ariamos"), ("eriamos", "eriamos"), ("iriamos", "iriamos"),
    ("iremos", "iremos"), ("eremos", "eremos"), ("aremos", "aremos"),
    ("avamos", "avamos"), ("iramos", "iramos"), ("eramos", "eramos"),
    ("aramos", "aramos"), ("asseis", "asseis"), ("esseis", "esseis"),
    ("isseis", "isseis"), ("arieis", "arieis"), ("erieis", "erieis"),
    ("irieis", "irieis"), ("irmos", "irmos"), ("iamos", "iamos"),
    ("armos", "armos"), ("ermos", "ermos"), ("areis", "areis"),
    ("ereis", "ereis"), ("ireis", "ireis"), ("asses", "asses"),
    ("esses", "esses"), ("isses", "isses"), ("astes", "astes"),
    ("assem", "assem"), ("essem", "essem"), ("issem", "issem"),
    ("ardes", "ardes"), ("erdes", "erdes"), ("irdes", "irdes"),
    ("ariam", "ariam"), ("eriam", "eriam"), ("iriam", "iriam"),
    ("arias", "arias"), ("erias", "erias"), ("irias", "irias"),
    ("estes", "estes"), ("istes", "istes"), ("areis", "areis"),
    ("aveis", "aveis"), ("aria", "aria"), ("eria", "eria"),
    ("iria", "iria"), ("asse", "asse"), ("esse", "esse"),
    ("isse", "isse"), ("aste", "aste"), ("este", "este"),
    ("iste", "iste"), ("arei", "arei"), ("erei", "erei"),
    ("irei", "irei"), ("aram", "aram"), ("eram", "eram"),
    ("iram", "iram"), ("avam", "avam"), ("arem", "arem"),
    ("erem", "erem"), ("irem", "irem"), ("ando", "ando"),
    ("endo", "endo"), ("indo", "indo"), ("arao", "arao"),
    ("erao", "erao"), ("irao", "irao"), ("adas", "adas"),
    ("idas", "idas"), ("aras", "aras"), ("eras", "eras"),
    ("iras", "iras"), ("avas", "avas"), ("ares", "ares"),
    ("eres", "eres"), ("ires", "ires"), ("ados", "ados"),
    ("idos", "idos"), ("amos", "amos"), ("emos", "emos"),
    ("imos", "imos"), ("iras", "iras"), ("ieis", "ieis"),
    ("ada", "ada"), ("ida", "ida"), ("ara", "ara"), ("era", "era"),
    ("ira", "ava"),   # reference bug: checks ira, removes ava (no-op)
    ("iam", "iam"), ("ado", "ado"), ("ido", "ido"), ("ias", "ias"),
    ("ais", "ais"), ("eis", "eis"), ("ira", "ira"), ("ear", "ear"),
    ("ia", "ia"), ("ei", "ei"), ("am", "am"), ("em", "em"),
    ("ar", "ar"), ("er", "er"), ("ir", "ir"), ("as", "as"),
    ("es", "es"), ("is", "is"), ("eu", "eu"), ("iu", "iu"),
    ("iu", "iu"), ("ou", "ou"),
)


def brazilian_stem(term: str) -> str | None:
    """BrazilianStemmer.Stem: the folded discriminator, or None when the
    term is non-indexable (caller keeps the original, like the filter)."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):
        return None
    if not ct.isalpha():
        return ct
    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)

    altered = False
    # Step 1
    for sfx, region, min_len, repl, prec, assign in _STEP1:
        reg = r1 if region == "R1" else r2 if region == "R2" else rv
        if min_len and len(ct) < min_len:
            continue
        if not (_sfx(ct, sfx) and _sfx(reg, sfx)):
            continue
        if prec is not None and not _preceded(ct, sfx, prec):
            continue
        if repl is None:
            ct = _rm(ct, sfx)
        elif assign:
            ct = _repl(ct, sfx, repl)
        # assign=False: reference discards the replacement (logias bug)
        altered = True
        break
    # Step 2
    if not altered and rv is not None:
        for rv_sfx, ct_sfx in _STEP2:
            if _sfx(rv, rv_sfx):
                ct = _rm(ct, ct_sfx)
                altered = True
                break
    if altered:
        # Step 3 (uses the ORIGINAL RV region text like the reference —
        # RV is not recomputed after steps 1-2)
        if rv is not None and _sfx(rv, "i") and _preceded(rv, "i", "c"):
            ct = _rm(ct, "i")
    else:
        # Step 4
        if rv is not None:
            for sfx in ("os", "a", "i", "o"):
                if _sfx(rv, sfx):
                    ct = _rm(ct, sfx)
                    break
    # Step 5
    if rv is not None and _sfx(rv, "e"):
        if _preceded(rv, "e", "gu"):
            ct = _rm(ct, "e")
            ct = _rm(ct, "u")
        elif _preceded(rv, "e", "ci"):
            ct = _rm(ct, "e")
            ct = _rm(ct, "i")
        else:
            ct = _rm(ct, "e")
    return ct
