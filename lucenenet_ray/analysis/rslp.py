"""RSLP (Removedor de Sufixos da Lingua Portuguesa) rule-file stemmer
engine — re-expression of the reference's generic step/rule interpreter
(``Analysis/Pt/RSLPStemmerBase.cs:84-279``) plus the two stemmers driven
by it: Portuguese (Orengo & Huyck 2001, "A Stemming Algorithm for the
Portuguese Language"; ``Analysis/Pt/PortugueseStemmer.cs:47-121``) and
Galician ("Regras do lematizador para o galego", bvg.udc.es;
``Analysis/Gl/GalicianStemmer.cs:48-97``).

Data model (mirrors the published .rslp file format the reference
parses, ``RSLPStemmerBase.Parse``):

- a RULE is ``(suffix, min_stem, replacement, exceptions)`` — fires when
  the word ends with ``suffix`` and ``len(word) - len(suffix) >=
  min_stem`` (min is measured BEFORE appending the replacement), unless
  an exception matches;
- a STEP is ``(min_word, whole_word_exceptions, entry_suffixes, rules)``
  — words shorter than ``min_word`` (auto-computed as min over rules of
  ``rule.min + len(suffix)`` when 0) bypass it, as do words ending with
  none of the ``entry_suffixes`` (when non-empty); the FIRST matching
  rule fires and ends the step. ``whole_word_exceptions`` selects how a
  rule's exception list is matched: True = the exception must equal the
  whole word, False = ends-with.

The rule tables live in ``rslp_gl.py`` / ``rslp_pt.py`` as Python data
(the same treatment as the Snowball suffix tables: published-algorithm
data, generated once from the published rule files via ``parse_rslp``
below, which re-expresses the reference's parser for that format).
"""

from __future__ import annotations

import re
from typing import NamedTuple


class Rule(NamedTuple):
    suffix: str
    min_stem: int
    replacement: str
    exceptions: tuple[str, ...]  # empty = no exceptions


class Step(NamedTuple):
    name: str
    min_word: int
    whole_word_exceptions: bool
    entry_suffixes: tuple[str, ...]  # empty = no entry condition
    rules: tuple[Rule, ...]


def make_step(name: str, min_word: int, whole: bool,
              entry: tuple[str, ...], rules: tuple[Rule, ...]) -> Step:
    """Auto-compute min_word=0 as the reference Step ctor does
    (RSLPStemmerBase.cs:210-218)."""
    if min_word == 0:
        min_word = min(r.min_stem + len(r.suffix) for r in rules)
    return Step(name, min_word, whole, entry, rules)


def apply_step(word: str, step: Step) -> str:
    """One RSLP step: entry gates, then the FIRST matching rule fires
    (RSLPStemmerBase.Step.Apply:236-268)."""
    if len(word) < step.min_word:
        return word
    if step.entry_suffixes and not word.endswith(step.entry_suffixes):
        return word
    for r in step.rules:
        if len(word) - len(r.suffix) < r.min_stem:
            continue
        if not word.endswith(r.suffix):
            continue
        if r.exceptions:
            if step.whole_word_exceptions:
                if word in r.exceptions:
                    continue
            elif word.endswith(r.exceptions):
                continue
        return word[:len(word) - len(r.suffix)] + r.replacement
    return word


# ---------------------------------------------------------------------------
# .rslp file-format parser (re-expressed RSLPStemmerBase.Parse:278-392) —
# used once to generate the rslp_gl/rslp_pt data modules and by the tests
# that pin the data against the published format.

_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$')


def _parse_list(s: str) -> tuple[str, ...]:
    if not s:
        return ()
    return tuple(x.strip()[1:-1] for x in s.rstrip().split(","))


def parse_rslp(text: str) -> dict[str, Step]:
    """Parse the published RSLP step-file format into named Steps."""
    lines = [ln.strip() for ln in text.splitlines()]
    lines = [ln for ln in lines if ln and not ln.startswith("#")]
    steps: dict[str, Step] = {}
    i = 0
    while i < len(lines):
        m = _HEADER.match(lines[i])
        if not m:
            raise ValueError(f"illegal step header: {lines[i]!r}")
        name, min_word = m.group(1), int(m.group(2))
        whole = m.group(3) == "1"
        entry = _parse_list(m.group(4))
        rules: list[Rule] = []
        i += 1
        while True:
            ln = lines[i]
            if (m := _STRIP.match(ln)):
                rules.append(Rule(m.group(1), int(m.group(2)), "", ()))
            elif (m := _REP.match(ln)):
                rules.append(Rule(m.group(1), int(m.group(2)),
                                  m.group(3), ()))
            elif (m := _EXC.match(ln)):
                exc = _parse_list(m.group(4))
                for e in exc:
                    if not e.endswith(m.group(1)):
                        raise ValueError(
                            f"exception {e!r} does not end with "
                            f"{m.group(1)!r}")
                rules.append(Rule(m.group(1), int(m.group(2)),
                                  m.group(3), exc))
            else:
                raise ValueError(f"illegal rule line: {ln!r}")
            i += 1
            if ln.endswith(";"):
                break
        steps[name] = make_step(name, min_word, whole, entry,
                                tuple(rules))
    return steps


# Deterministic gate-corpus splice vocabularies (shared constants with
# the SQL oracles): real words from the reference's own vocabulary
# fixtures chosen to exercise the paths English webtext never reaches —
# plural/adverb reductions, the 3-iteration Augmentative fixpoint
# ('raioliñas', 'orgánica'), the verb arm after a no-op noun step
# ('abandonara', 'abesullando'), and the accent-removal translate.
GL_SPLICE_WORDS = (
    "raioliñas", "orgánica", "abandonara", "abesullando",
    "politicamente", "cantábamos", "profesora", "amigos",
    "cancións", "grandísimo",
)
PT_SPLICE_WORDS = (
    "balões", "capitães", "felizmente", "chefona", "professora",
    "cansada", "grandezas", "quilométrico", "cantarão", "bebêssemos",
)

# ---------------------------------------------------------------------------
# Stemmer drivers

_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")
_PT_ACCENTS = str.maketrans("àáâãäåçèéêëìíîïñòóôõöùúûüýÿ",
                            "aaaaaaceeeeiiiinooooouuuuyy")


def _gl_steps():
    from lucenenet_ray.analysis.rslp_gl import STEPS

    return STEPS


def _pt_steps():
    from lucenenet_ray.analysis.rslp_pt import STEPS

    return STEPS


def galician_stem(word: str) -> str:
    """GalicianStemmer.Stem (GalicianStemmer.cs:48-97): plural →
    unification → adverb → augmentative-to-fixpoint → noun (verb only
    if noun removed nothing) → vowel → RSLG accent removal."""
    s = _gl_steps()
    w = apply_step(word, s["Plural"])
    w = apply_step(w, s["Unification"])
    w = apply_step(w, s["Adverb"])
    # the reference's change checks compare LENGTH, not content
    # (len != oldlen) — a same-length replacement counts as no change
    while True:
        w2 = apply_step(w, s["Augmentative"])
        changed = len(w2) != len(w)
        w = w2
        if not changed:
            break
    n = len(w)
    w = apply_step(w, s["Noun"])
    if len(w) == n:
        w = apply_step(w, s["Verb"])
    w = apply_step(w, s["Vowel"])
    return w.translate(_GL_ACCENTS)


def galician_minimal_stem(word: str) -> str:
    """GalicianMinimalStemmer (GalicianMinimalStemmer.cs:31-40 — the
    RSLP-S plural-only modification for Galician): just the Plural
    step, no accent removal."""
    return apply_step(word, _gl_steps()["Plural"])


def portuguese_minimal_stem(word: str) -> str:
    """PortugueseMinimalStemmer (PortugueseMinimalStemmer.cs:33-42 —
    RSLP-S, Orengo et al.): just the Plural step, no accent removal."""
    return apply_step(word, _pt_steps()["Plural"])


def portuguese_rslp_stem(word: str) -> str:
    """PortugueseStemmer.Stem (PortugueseStemmer.cs:47-121): plural →
    adverb → feminine → augmentative, then noun / else verb / else
    vowel, then RSLP accent removal."""
    s = _pt_steps()
    w = apply_step(word, s["Plural"])
    w = apply_step(w, s["Adverb"])
    w = apply_step(w, s["Feminine"])
    w = apply_step(w, s["Augmentative"])
    n = len(w)  # length-based change checks, as in the reference
    w = apply_step(w, s["Noun"])
    if len(w) == n:
        w = apply_step(w, s["Verb"])
        if len(w) == n:
            w = apply_step(w, s["Vowel"])
    return w.translate(_PT_ACCENTS)
