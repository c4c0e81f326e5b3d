"""Hunspell affix-dictionary stemmer
(``Analysis/Hunspell/Dictionary.cs`` + ``Stemmer.cs`` — the .aff/.dic
morphological stemmer behind HunspellStemFilter).

Subset faithful to the reference's stemming core:

- .dic entries ``word/FLAGS`` (morph fields after whitespace ignored),
  multiple homonym entries per word, ``ignore_case`` lowering both sides.
- .aff ``PFX``/``SFX`` blocks (multiple blocks per flag merge), strip,
  affix with ``/continuation`` classes, condition patterns (``[..]``
  classes, ``.``; dash escaped; unterminated ``[`` repaired), crossproduct
  flag, ``FLAG long|num`` parsing strategies, ``CIRCUMFIX`` flag.
- Stemming: whole-word dictionary stems (one per homonym entry), one
  prefix and up to two suffixes via continuation-class cross-checks,
  exactly the reference's recursion ladder (Stemmer.cs Stem/ApplyAffix,
  incl. the prefixFlag-through-continuation check and circumfix pairing).
- Reference quirk reproduced: the FIRST distinct condition pattern parsed
  gets ordinal 0, and ``CheckCondition`` skips ordinal 0 — that pattern is
  never actually checked (Stemmer.cs:325 ``if (condition != 0)``).
- ICONV/OCONV conversion tables (Dictionary.cs:330-350 + ApplyMappings
  :1168-1210): greedy longest-match rewriting applied to the INPUT (dic
  words, affix strips, and the token — CleanInput:1123-1165, with the
  reference's exact ignore-case ordering: lowercase-on-the-fly only when
  no ICONV, else lowercase AFTER conversion) and to OUTPUT stems
  (Stemmer.cs NewStem:137).
- AF flag aliases (Dictionary.cs ParseAlias:988-1006; numeric flag parts
  in affix continuation classes :442 and dic entries :843 resolve through
  the alias table, 1-based).
- IGNORE character stripping (Dictionary.cs:320-329).

- Escaped .dic entries (Dictionary.cs UnescapeEntry:713-734): ``\\x`` →
  literal x, bare ``/`` → the 0x1f flag separator, flag split at the
  LAST separator — so ``R2\\/D2/A`` is the word ``R2/D2`` with flag A
  and ``N\\/A`` is a flagless word containing a slash (TestEscaped.cs).

Out of re-expression scope (documented): COMPOUND* rules and
NEEDAFFIX/ONLYINCOMPOUND pruning are skipped as unknown keywords —
exactly what the reference's Dictionary.cs does (its Stemmer carries the
same ``TODO: some forms should not be added, e.g. ONLYINCOMPOUND``).
"""

from __future__ import annotations

import re


class _Affix:
    __slots__ = ("flag", "strip", "affix", "pattern", "cross",
                 "cont_flags", "ordinal")

    def __init__(self, flag, strip, affix, pattern, cross, cont_flags,
                 ordinal):
        self.flag = flag
        self.strip = strip
        self.affix = affix
        self.pattern = pattern   # compiled regex or None (unchecked)
        self.cross = cross
        self.cont_flags = cont_flags
        self.ordinal = ordinal


def _parse_flags(s: str, mode: str) -> tuple[str, ...]:
    if mode == "num":
        return tuple(x.strip() for x in s.split(",") if x.strip())
    if mode == "long":
        return tuple(s[i:i + 2] for i in range(0, len(s) - 1, 2))
    return tuple(s)


class _Conversions:
    """ICONV/OCONV mapping table (Dictionary.cs ApplyMappings:1168-1210):
    at each position take the LONGEST matching pattern, splice in its
    replacement, and continue scanning after the replacement."""

    def __init__(self):
        self.pairs: list[tuple[str, str]] = []

    def add(self, pattern: str, replacement: str) -> None:
        self.pairs.append((pattern, replacement))
        self.pairs.sort(key=lambda p: -len(p[0]))

    def apply(self, s: str) -> str:
        out = []
        i = 0
        while i < len(s):
            for pat, rep in self.pairs:
                if s.startswith(pat, i):
                    out.append(rep)
                    i += len(pat)
                    break
            else:
                out.append(s[i])
                i += 1
        return "".join(out)


def _unescape_entry(entry: str) -> str:
    """Dictionary.cs UnescapeEntry:713-734: backslash escapes a literal
    char; an unescaped '/' becomes the 0x1f flag separator."""
    out = []
    i = 0
    n = len(entry)
    while i < n:
        ch = entry[i]
        if ch == "\\" and i + 1 < n:
            out.append(entry[i + 1])
            i += 2
        elif ch == "/":
            out.append("\x1f")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class HunspellDictionary:
    def __init__(self, aff_text: str, dic_text: str,
                 ignore_case: bool = False):
        self.ignore_case = ignore_case
        self.flag_mode = "single"
        self.circumfix: str | None = None
        self.complex_prefixes = False
        self.two_stage = False
        self.iconv: _Conversions | None = None
        self.oconv: _Conversions | None = None
        self.ignore_chars: frozenset[str] = frozenset()
        self.aliases: list[str] | None = None
        self.prefixes: dict[str, list[_Affix]] = {}
        self.suffixes: dict[str, list[_Affix]] = {}
        self._parse_aff(aff_text)
        self.words: dict[str, list[frozenset]] = {}
        self._parse_dic(dic_text)

    @property
    def needs_input_cleaning(self) -> bool:
        return (self.ignore_case or self.iconv is not None
                or bool(self.ignore_chars))

    def clean_input(self, s: str) -> str:
        """Dictionary.cs CleanInput:1123-1165 — ignore-char strip, then
        either on-the-fly lowercase (no ICONV) or ICONV followed by
        lowercase (the reference's exact ordering)."""
        out = []
        for ch in s:
            if ch in self.ignore_chars:
                continue
            if self.ignore_case and self.iconv is None:
                ch = ch.lower()
            out.append(ch)
        s2 = "".join(out)
        if self.iconv is not None:
            s2 = self.iconv.apply(s2)
            if self.ignore_case:
                s2 = s2.lower()
        return s2

    def _alias_flags(self, flagpart: str) -> tuple[str, ...]:
        """Flag-part → flags, resolving a numeric AF alias reference
        (Dictionary.cs GetAliasValue:1002, 1-based)."""
        if self.aliases is not None and flagpart.isdigit():
            idx = int(flagpart)
            if not 1 <= idx <= len(self.aliases):
                raise ValueError(f"Bad flag alias number: {idx}")
            flagpart = self.aliases[idx - 1]
        return _parse_flags(flagpart, self.flag_mode)

    # -- parsing ----------------------------------------------------------
    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            i += 1
            if not parts:
                continue
            kw = parts[0]
            if kw == "FLAG":
                self.flag_mode = parts[1]
            elif kw == "CIRCUMFIX":
                self.circumfix = _parse_flags(parts[1], self.flag_mode)[0]
            elif kw == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif kw in ("ICONV", "OCONV"):
                conv = _Conversions()
                for _ in range(int(parts[1])):
                    cparts = lines[i].split()
                    i += 1
                    if len(cparts) != 3 or cparts[0] != kw:
                        raise ValueError(f"Illegal {kw} declaration")
                    conv.add(cparts[1], cparts[2])
                if kw == "ICONV":
                    self.iconv = conv
                else:
                    self.oconv = conv
            elif kw == "IGNORE":
                self.ignore_chars = frozenset(parts[1])
            elif kw == "AF":
                n = int(parts[1])
                self.aliases = []
                for _ in range(n):
                    aparts = lines[i].split()
                    i += 1
                    # an alias can map to no flags (Dictionary.cs:997)
                    self.aliases.append(aparts[1]
                                        if len(aparts) > 1 else "")
            elif kw in ("PFX", "SFX"):
                flag = _parse_flags(parts[1], self.flag_mode)[0]
                cross = parts[2] == "Y"
                n = int(parts[3])
                for _ in range(n):
                    rule = lines[i].split()
                    i += 1
                    strip = "" if rule[2] == "0" else rule[2]
                    affix_arg = rule[3]
                    cont: tuple[str, ...] = ()
                    if "/" in affix_arg:
                        affix_arg, _, flagpart = affix_arg.rpartition("/")
                        cont = self._alias_flags(flagpart)
                        self.two_stage = True
                    if self.needs_input_cleaning and affix_arg != "0":
                        affix_arg = self.clean_input(affix_arg)
                    cond = rule[4] if len(rule) > 4 else "."
                    pattern = self._condition(cond, strip, kw == "PFX")
                    aff = _Affix(flag, strip,
                                 "" if affix_arg == "0" else affix_arg,
                                 pattern, cross, frozenset(cont), 0)
                    target = (self.prefixes if kw == "PFX"
                              else self.suffixes)
                    target.setdefault(aff.affix, []).append(aff)

    def _condition(self, cond: str, strip: str, is_prefix: bool):
        """Pattern ordinal 0 is pre-reserved for the zero condition
        (Dictionary.cs:269 ``seenPatterns[".*"] = 0``) and CheckCondition
        skips ordinal 0 — so '.' and cond==strip compile to no check; every
        real pattern is checked."""
        if cond.startswith("[") and not cond.endswith("]"):
            cond = cond + "]"
        cond = cond.replace("-", "\\-")
        if cond == "." or cond == strip:
            return None
        regex = cond + ".*" if is_prefix else ".*" + cond
        return re.compile(regex)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for line in lines[start:]:
            entry = line.split()
            if not entry:
                continue
            token = _unescape_entry(entry[0])
            word, sep, flagpart = token.rpartition("\x1f")
            if not sep:
                word, flagpart = token, ""
            if self.needs_input_cleaning:
                word = self.clean_input(word)
            flags = frozenset(self._alias_flags(flagpart))
            self.words.setdefault(word, []).append(flags)


class HunspellStemmer:
    """Stemmer.cs recursion ladder over a HunspellDictionary."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    def stem(self, word: str) -> list[str]:
        if self.d.needs_input_cleaning:
            word = self.d.clean_input(word)
        stems = [word for _flags in self.d.words.get(word, [])]
        stems += self._stem(word, None, None, None, 0, True, True,
                            False, False)
        if self.d.oconv is not None:
            # Stemmer.cs NewStem:137 — OCONV rewrites every output stem
            stems = [self.d.oconv.apply(s) for s in stems]
        return stems

    def unique_stems(self, word: str) -> list[str]:
        seen: set[str] = set()
        out = []
        for s in self.stem(word):
            key = s.lower() if self.d.ignore_case else s
            if key not in seen:
                seen.add(key)
                out.append(s)
        return out

    def _stem(self, word, previous, prev_flag, prefix_flag, depth,
              do_prefix, do_suffix, prev_was_prefix, circumfix):
        d = self.d
        stems: list[str] = []
        if do_prefix and d.prefixes:
            for i in range(len(word) - 1, -1, -1):
                for e in d.prefixes.get(word[:i], ()):
                    if e is previous:
                        continue
                    if depth == 0:
                        compatible = True
                    elif e.cross:
                        compatible = prev_flag in e.cont_flags
                    else:
                        compatible = False
                    if not compatible:
                        continue
                    stripped = e.strip + word[i:]
                    if e.pattern is not None \
                            and not e.pattern.fullmatch(stripped):
                        continue
                    stems += self._apply(stripped, e, None, depth, True,
                                         circumfix)
        if do_suffix and d.suffixes:
            for i in range(len(word)):
                for e in d.suffixes.get(word[i:], ()):
                    if e is previous:
                        continue
                    if depth == 0:
                        compatible = True
                    elif e.cross:
                        compatible = ((not e.cont_flags and prev_was_prefix)
                                      or prev_flag in e.cont_flags)
                    else:
                        compatible = False
                    if not compatible:
                        continue
                    stripped = word[:i] + e.strip
                    if e.pattern is not None \
                            and not e.pattern.fullmatch(stripped):
                        continue
                    stems += self._apply(stripped, e, prefix_flag, depth,
                                         False, circumfix)
        return stems

    def _apply(self, stripped, e, prefix_flag, depth, is_prefix,
               circumfix):
        d = self.d
        stems: list[str] = []
        for flags in d.words.get(stripped, ()):
            if e.flag not in flags:
                continue
            chained_prefix = d.complex_prefixes and depth == 1 and is_prefix
            if (not chained_prefix and prefix_flag is not None
                    and prefix_flag not in flags
                    and prefix_flag not in e.cont_flags):
                continue
            if d.circumfix is not None:
                if (d.circumfix in e.cont_flags) != circumfix:
                    continue
            stems.append(stripped)
        if d.circumfix is not None and not circumfix and is_prefix:
            circumfix = d.circumfix in e.cont_flags
        if e.cross:
            if depth == 0:
                if is_prefix:
                    stems += self._stem(
                        stripped, e, e.flag, e.flag, 1,
                        d.complex_prefixes and d.two_stage, True, True,
                        circumfix)
                elif not d.complex_prefixes and d.two_stage:
                    stems += self._stem(stripped, e, e.flag, prefix_flag,
                                        1, False, True, False, circumfix)
            elif depth == 1:
                if is_prefix and d.complex_prefixes:
                    stems += self._stem(stripped, e, e.flag, e.flag, 2,
                                        False, True, True, circumfix)
                elif (not is_prefix and not d.complex_prefixes
                      and d.two_stage):
                    stems += self._stem(stripped, e, e.flag, prefix_flag,
                                        2, False, True, False, circumfix)
        return stems
