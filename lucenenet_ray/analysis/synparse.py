"""Synonym file-format parsers — Solr and WordNet prolog.

Re-expression of ``Analysis.Common/Analysis/Synonym/SolrSynonymParser.cs``
and ``WordnetSynonymParser.cs`` (both build SynonymMap Add(input, output)
pairs; SynonymMap.Parser.Analyze joins an entry's analyzed tokens with
``SynonymMap.WORD_SEPARATOR`` = U+0000).

Solr format (SolrSynonymParser.cs:25-52 doc + Parse :64-146):
- blank lines and ``#`` comments skipped;
- ``lhs1, lhs2 => rhs1, rhs2`` explicit mapping — every lhs maps to every
  rhs, the ``expand`` flag is ignored; more than one ``=>`` raises;
- ``a, b, c`` equivalence line — expand=True: all-pairs inside the class
  (incl. self), expand=False: every member maps to the FIRST member;
- multiple entries for one input merge (the Add-pair accumulation);
- ``\\``-escapes survive Split (:148-186) and are removed by Unescape;
- an entry that analyzes to zero tokens raises (the reference's
  "Invalid synonym rule" wrap of the Analyze ArgumentException).

WordNet prolog (WordnetSynonymParser.cs:43-137): lines
``s(synsetID,wordNo,'word',type,sense,tag).`` — consecutive lines sharing
``line[2:11]`` form a synset; ``''`` un-doubles to ``'``; synsets of size
<= 1 are dropped; expand=True: all-pairs, expand=False: members map to the
synset's FIRST entry.

Both parsers return the raw ordered Add-pair list (dedup'd like the
parsers' ``dedup=true`` default) plus ``build_map()`` which folds the
single-token pairs into the engine's SynonymMap (filters.py — the
documented single-token SynonymFilter subset; multi-token entries stay in
``pairs`` for callers that need them, count surfaced in ``n_multiword``).
"""

from __future__ import annotations

from dataclasses import dataclass

from lucenenet_ray.analysis.standard import _java_lower, tokenize

WORD_SEPARATOR = "\x00"  # SynonymMap.WORD_SEPARATOR


def _default_analyze(text: str) -> str:
    """SynonymMap.Parser.Analyze analog: run the analyzer, join tokens with
    WORD_SEPARATOR; zero tokens → ValueError (term: X analyzes to nothing).
    Default chain is tokenizer + lowercase WITHOUT stop removal (synonym
    entries like 'this test' must survive — the reference tests use a
    stop-free MockAnalyzer; pass ``analyze=`` for a different chain)."""
    toks = [_java_lower(t) for t in tokenize(text)]
    if not toks:
        raise ValueError(f"term: {text} analyzes to nothing")
    return WORD_SEPARATOR.join(toks)


@dataclass(frozen=True)
class ParsedSynonyms:
    pairs: tuple[tuple[str, str], ...]  # ordered (input, output) Add pairs

    @property
    def n_multiword(self) -> int:
        return sum(1 for i, o in self.pairs
                   if WORD_SEPARATOR in i or WORD_SEPARATOR in o)

    def build_map(self):
        """Single-token pairs → filters.SynonymMap-compatible object
        (lookup(term) = injected equivalents, source excluded)."""
        from lucenenet_ray.analysis.filters import SynonymMap

        m: dict[str, list[str]] = {}
        for i, o in self.pairs:
            if WORD_SEPARATOR in i or WORD_SEPARATOR in o or i == o:
                continue
            m.setdefault(i, [])
            if o not in m[i]:
                m[i].append(o)
        sm = SynonymMap({}, expand=False)
        sm.map = {k: tuple(v) for k, v in m.items()}
        return sm


def _split(s: str, sep: str) -> list[str]:
    """SolrSynonymParser.Split (:148-186): split on ``sep`` outside
    backslash escapes; the backslash and escaped char stay in the piece."""
    out: list[str] = []
    sb: list[str] = []
    pos, end = 0, len(s)
    while pos < end:
        if s.startswith(sep, pos):
            if sb:
                out.append("".join(sb))
                sb = []
            pos += len(sep)
            continue
        ch = s[pos]
        pos += 1
        if ch == "\\":
            sb.append(ch)
            if pos >= end:
                break
            ch = s[pos]
            pos += 1
        sb.append(ch)
    if sb:
        out.append("".join(sb))
    return out


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _add_pairs(pairs: list[tuple[str, str]], seen: set[tuple[str, str]],
               inputs: list[str], outputs: list[str]) -> None:
    for i in inputs:
        for o in outputs:
            if (i, o) not in seen:  # dedup=true parser default
                seen.add((i, o))
                pairs.append((i, o))


def parse_solr_synonyms(text: str, expand: bool = True,
                        analyze=_default_analyze) -> ParsedSynonyms:
    pairs: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    for ln, line in enumerate(text.splitlines(), 1):
        if not line or line[0] == "#":
            continue
        try:
            sides = _split(line, "=>")
            if len(sides) > 1:
                if len(sides) != 2:
                    raise ValueError(
                        "more than one explicit mapping specified on the "
                        "same line")
                inputs = [analyze(_unescape(x).strip())
                          for x in _split(sides[0], ",")]
                outputs = [analyze(_unescape(x).strip())
                           for x in _split(sides[1], ",")]
            else:
                inputs = [analyze(_unescape(x).strip())
                          for x in _split(line, ",")]
                outputs = inputs if expand else [inputs[0]]
        except ValueError as e:
            raise ValueError(f"Invalid synonym rule at line {ln}") from e
        _add_pairs(pairs, seen, inputs, outputs)
    return ParsedSynonyms(pairs=tuple(pairs))


def parse_wordnet_synonyms(text: str, expand: bool = True,
                           analyze=_default_analyze) -> ParsedSynonyms:
    pairs: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    synset: list[str] = []
    last_id = ""

    def flush() -> None:
        if len(synset) <= 1:
            return
        if expand:
            _add_pairs(pairs, seen, synset, synset)
        else:
            _add_pairs(pairs, seen, synset, [synset[0]])

    for ln, line in enumerate(text.splitlines(), 1):
        if not line:
            continue
        try:
            syn_id = line[2:11]
            if syn_id != last_id:
                flush()
                synset = []
            start = line.index("'") + 1
            end = line.rindex("'")
            word = line[start:end].replace("''", "'")
            synset.append(analyze(word))
            last_id = syn_id
        except ValueError as e:
            raise ValueError(f"Invalid synonym rule at line {ln}") from e
    flush()
    return ParsedSynonyms(pairs=tuple(pairs))
