"""Dictionary-based compound word decomposition
(``Analysis/Compound/DictionaryCompoundWordTokenFilter.cs`` +
``CompoundWordTokenFilterBase.cs``).

Semantics: the ORIGINAL token is always emitted (posInc preserved); for
each token of length >= ``min_word``, every dictionary subword found at any
start offset (lengths ``min_sub..max_sub``, scanned start-ascending then
length-ascending) is appended at posIncrement 0. ``only_longest`` keeps
only the longest match per start offset (TestDumbCompoundWordsSELongestMatch
shape). Matching is case-insensitive like the reference's
CharArraySet(ignoreCase=true) dictionaries — pass a lowercased dict and
the filter lowercases candidate substrings for lookup while emitting the
ORIGINAL-case substring, matching the reference's CompoundToken text.

The hyphenation-grammar variant (HyphenationCompoundWordTokenFilter) needs
the external OFFO hyphenation XML data files and is n/a by design; its
dictionary mode is subsumed by this filter.
"""

from __future__ import annotations

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


def decompose_token(term: str, dictionary: frozenset[str],
                    min_sub: int = DEFAULT_MIN_SUBWORD_SIZE,
                    max_sub: int = DEFAULT_MAX_SUBWORD_SIZE,
                    only_longest: bool = False) -> list[str]:
    """DictionaryCompoundWordTokenFilter.Decompose over one token."""
    low = term.lower()
    n = len(term)
    out: list[str] = []
    for i in range(0, n - min_sub + 1):
        longest = None
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            if low[i:i + j] in dictionary:
                if only_longest:
                    if longest is None or len(longest) < j:
                        longest = term[i:i + j]
                else:
                    out.append(term[i:i + j])
        if only_longest and longest is not None:
            out.append(longest)
    return out


def dictionary_compound(terms: list[str], positions: list[int],
                        dictionary: frozenset[str],
                        min_word: int = DEFAULT_MIN_WORD_SIZE,
                        min_sub: int = DEFAULT_MIN_SUBWORD_SIZE,
                        max_sub: int = DEFAULT_MAX_SUBWORD_SIZE,
                        only_longest: bool = False
                        ) -> tuple[list[str], list[int]]:
    """Apply the compound filter to a token stream: original token, then
    its subwords at the same position (posInc 0)."""
    out_t: list[str] = []
    out_p: list[int] = []
    for t, p in zip(terms, positions):
        out_t.append(t)
        out_p.append(p)
        if len(t) >= min_word:
            for sub in decompose_token(t, dictionary, min_sub, max_sub,
                                       only_longest):
                out_t.append(sub)
                out_p.append(p)
    return out_t, out_p
