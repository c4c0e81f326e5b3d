"""Liang hyphenation patterns + HyphenationCompoundWordTokenFilter analog.

Re-expresses ``Analysis/Compound/Hyphenation/HyphenationTree.cs`` and
``Analysis/Compound/HyphenationCompoundWordTokenFilter.cs``. The
reference loads OFFO pattern XML (a data pack out of copy scope); the
ALGORITHM — Knuth/Liang competing patterns — is implemented here over
caller-supplied patterns:

* Pattern "a1bc" = letter sequence "abc" with inter-letter digit 1
  before 'b'. ``hyphenate(word)`` wraps the word in '.' markers, applies
  every pattern at every offset taking the per-position MAX digit
  (``HyphenationTree.cs:302-327`` SearchPatterns), and returns hyphen
  points where the value is odd within [remain, len-push]
  (``:497-537``), with the synthetic 0 and len endpoints prepended/
  appended. Words containing characters outside the registered classes
  are not hyphenated (``:434-459`` simplified: no leading-ignore run).
* ``HyphenationCompoundFilter.decompose(word)`` mirrors
  ``HyphenationCompoundWordTokenFilter.cs:197-287`` exactly: for every
  hyphen point, parts to every later point, bounded by
  min/maxSubwordSize, dictionary-checked (None dictionary accepts all),
  the partLength-1 genitive fallback, onlyLongestMatch mode; the
  original token always passes and words shorter than minWordSize
  (default 5, ``CompoundWordTokenFilterBase.cs:44,123-137``) are not
  decomposed.
"""

from __future__ import annotations

DEFAULT_MIN_WORD_SIZE = 5     # CompoundWordTokenFilterBase.cs:44
DEFAULT_MIN_SUBWORD_SIZE = 2  # :49
DEFAULT_MAX_SUBWORD_SIZE = 15  # :54


class HyphenationTree:
    """Liang pattern store: dict of letter-string -> digit tuple."""

    def __init__(self, patterns: list[str] | None = None):
        # letters -> values[len(letters)+1]: digit before each letter
        # position plus one after the last
        self.patterns: dict[str, tuple[int, ...]] = {}
        self.max_len = 0
        self.letters: set[str] = set()
        for p in patterns or ():
            self.add_pattern(p)

    def add_pattern(self, pat: str) -> None:
        letters: list[str] = []
        values: list[int] = []
        pending = 0
        for ch in pat:
            if ch.isdigit():
                pending = int(ch)
            else:
                letters.append(ch)
                values.append(pending)
                pending = 0
        values.append(pending)
        key = "".join(letters)
        self.patterns[key] = tuple(values)
        self.max_len = max(self.max_len, len(key))
        self.letters.update(c for c in key if c != ".")

    def hyphenate(self, word: str, remain: int = 1, push: int = 1
                  ) -> list[int] | None:
        """Hyphen points [0, p1..pk, len] or None (no points / non-letter
        char / too short)."""
        n = len(word)
        if n < remain + push:
            return None
        if any(c not in self.letters for c in word):
            return None
        w = "." + word + "."
        il = [0] * (len(w) + 1)
        for i in range(len(w)):
            for l in range(1, min(self.max_len, len(w) - i) + 1):
                vals = self.patterns.get(w[i:i + l])
                if vals is None:
                    continue
                for k, v in enumerate(vals):
                    if v > il[i + k]:
                        il[i + k] = v
        # letter index i of `word` maps to il[i + 1] (the '.' shift)
        points = [i for i in range(1, n)
                  if (il[i + 1] & 1) == 1 and remain <= i <= n - push]
        if not points:
            return None
        return [0] + points + [n]


class HyphenationCompoundFilter:
    """HyphenationCompoundWordTokenFilter.cs Decompose + base contract."""

    def __init__(self, tree: HyphenationTree,
                 dictionary: set[str] | None,
                 min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                 min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                 max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                 only_longest_match: bool = False):
        self.tree = tree
        self.dictionary = dictionary
        self.min_word_size = min_word_size
        self.min_subword_size = min_subword_size
        self.max_subword_size = max_subword_size
        self.only_longest_match = only_longest_match

    def decompose(self, word: str) -> list[str]:
        """Subword tokens only (the original is passed through by the
        caller, posIncr 0 semantics)."""
        if len(word) < self.min_word_size:
            return []
        hyp = self.tree.hyphenate(word, 1, 1)
        if hyp is None:
            return []
        out: list[str] = []
        for i in range(len(hyp)):
            start = hyp[i]
            longest: str | None = None
            for j in range(1, len(hyp) - i):
                part_len = hyp[i + j] - start
                if part_len > self.max_subword_size:
                    break
                if part_len < self.min_subword_size:
                    continue
                part = word[start:start + part_len]
                if self.dictionary is None or part in self.dictionary:
                    if self.only_longest_match:
                        if longest is None or len(longest) < part_len:
                            longest = part
                    else:
                        out.append(part)
                elif word[start:start + part_len - 1] in self.dictionary:
                    # genitive fallback (:256-280)
                    short = word[start:start + part_len - 1]
                    if self.only_longest_match:
                        if longest is None or len(longest) < len(short):
                            longest = short
                    else:
                        out.append(short)
            if self.only_longest_match and longest is not None:
                out.append(longest)
        return out

    def __call__(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        for t in tokens:
            out.append(t)
            out.extend(self.decompose(t))
        return out
