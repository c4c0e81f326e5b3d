"""Beider-Morse phonetic RULE ENGINE (Language/Bm/PhoneticEngine.cs).

The reference ships ~150 rule-pack text files (data, out of copy scope);
the ENGINE that interprets them is the algorithm and is re-expressed
here:

* ``Rule``: (pattern, lcontext, rcontext, phoneme). Context matching
  mirrors ``Rule.cs:843-870``: the pattern must match at position i, the
  left context must match the prefix before i, the right context the
  suffix after the pattern. Contexts here are the rule-pack subset the
  packs actually use most: '' (always), '^set' (next/previous char in a
  class), '$' (end/start boundary).
* Scan loop mirrors ``PhoneticEngine.RulesApplication.Invoke``
  (``:247-274``): rules are grouped by the first pattern char; at each
  position the FIRST matching rule in pack order fires, the cursor
  advances by the pattern length (or 1 with nothing emitted when no rule
  matches — unmatched chars are dropped).
* ``PhonemeBuilder`` alternates: a phoneme "(x|y)" forks every current
  expansion (``PhonemeBuilder.Apply``), capped at ``max_phonemes`` (20,
  ``PhoneticEngine.cs:46``); the encoder output joins the distinct
  expansions sorted with '|' (PhoneticEngine.Encode end).
* ``apply_final_rules`` re-runs the same scan over each expansion
  (``ApplyFinalRules``, ``:378-417``).
"""

from __future__ import annotations

MAX_PHONEMES = 20  # PhoneticEngine.cs:46 DEFAULT_MAX_PHONEMES


class Rule:
    def __init__(self, pattern: str, lcontext: str, rcontext: str,
                 phoneme: str):
        self.pattern = pattern
        self.lcontext = lcontext
        self.rcontext = rcontext
        self.phoneme = phoneme

    @staticmethod
    def _ctx_match(ctx: str, text: str, from_left: bool) -> bool:
        """'' always; '^abc' = adjacent char in class; '$' = boundary."""
        if not ctx:
            return True
        if ctx == "$":
            return not text
        if ctx.startswith("^"):
            if not text:
                return False
            ch = text[0] if from_left else text[-1]
            return ch in ctx[1:]
        raise ValueError(f"unsupported context {ctx!r}")

    def matches(self, text: str, i: int) -> bool:
        """Rule.cs:843-870 PatternAndContextMatches."""
        ipl = i + len(self.pattern)
        if ipl > len(text):
            return False
        if text[i:ipl] != self.pattern:
            return False
        if not self._ctx_match(self.rcontext, text[ipl:], from_left=True):
            return False
        return self._ctx_match(self.lcontext, text[:i], from_left=False)


def _group(rules: list[Rule]) -> dict[str, list[Rule]]:
    g: dict[str, list[Rule]] = {}
    for r in rules:
        g.setdefault(r.pattern[0], []).append(r)
    return g


def _apply(phoneme: str, expansions: list[str],
           max_phonemes: int) -> list[str]:
    """PhonemeBuilder.Apply: '(a|b)' forks every expansion, capped."""
    if phoneme.startswith("(") and phoneme.endswith(")"):
        alts = phoneme[1:-1].split("|")
    else:
        alts = [phoneme]
    out: list[str] = []
    for e in expansions:
        for a in alts:
            if len(out) >= max_phonemes:
                return out
            out.append(e + a)
    return out


class PhoneticEngine:
    """Scan + final-rules passes over caller-supplied rule packs."""

    def __init__(self, rules: list[Rule],
                 final_rules: list[Rule] | None = None,
                 max_phonemes: int = MAX_PHONEMES):
        self.rules = _group(rules)
        self.final_rules = _group(final_rules or [])
        self.max_phonemes = max_phonemes

    def _scan(self, grouped: dict[str, list[Rule]], text: str) -> list[str]:
        expansions = [""]
        i = 0
        while i < len(text):
            advance = 1
            for rule in grouped.get(text[i], ()):
                if rule.matches(text, i):
                    expansions = _apply(rule.phoneme, expansions,
                                        self.max_phonemes)
                    advance = len(rule.pattern)
                    break
            i += advance
        return expansions

    def encode(self, word: str) -> str:
        word = word.lower().strip()
        expansions = self._scan(self.rules, word)
        if self.final_rules:
            out: list[str] = []
            for e in expansions:
                out.extend(self._scan(self.final_rules, e))
            expansions = out
        return "|".join(sorted(set(expansions)))
