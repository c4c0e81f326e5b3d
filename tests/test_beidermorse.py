"""Beider-Morse PhoneticEngine core (analysis/beidermorse.py).

Cited semantics: first-match scan with pattern-length advance and
dropped unmatched chars (PhoneticEngine.cs:247-274), pattern + context
matching (Rule.cs:843-870), phoneme alternates capped at maxPhonemes
(PhonemeBuilder.Apply, PhoneticEngine.cs:46), final-rules re-scan
(ApplyFinalRules :378-417).
"""

from lucenenet_ray.analysis.beidermorse import (
    MAX_PHONEMES, PhoneticEngine, Rule,
)


def test_first_match_wins_and_advance_by_pattern():
    rules = [Rule("ab", "", "", "X"), Rule("a", "", "", "Y"),
             Rule("b", "", "", "Z")]
    e = PhoneticEngine(rules)
    assert e.encode("ab") == "X"        # "ab" fires, not "a"+"b"
    assert e.encode("ba") == "ZY"


def test_unmatched_chars_dropped():
    e = PhoneticEngine([Rule("a", "", "", "A")])
    assert e.encode("xaxxa") == "AA"


def test_right_context_class_and_boundary():
    rules = [Rule("a", "", "^bc", "1"), Rule("a", "", "$", "2"),
             Rule("a", "", "", "3"),
             Rule("b", "", "", "B"), Rule("c", "", "", "C")]
    e = PhoneticEngine(rules)
    assert e.encode("ab") == "1B"       # next char in class
    assert e.encode("a") == "2"         # boundary
    assert e.encode("ax") == "3"        # fallback (x dropped)


def test_left_context():
    rules = [Rule("a", "^b", "", "1"), Rule("a", "", "", "2"),
             Rule("b", "", "", "B")]
    e = PhoneticEngine(rules)
    assert e.encode("ba") == "B1"       # previous char is b
    assert e.encode("a") == "2"


def test_alternates_fork_and_sorted_join():
    rules = [Rule("a", "", "", "(x|y)"), Rule("b", "", "", "z")]
    e = PhoneticEngine(rules)
    assert e.encode("ab") == "xz|yz"
    assert e.encode("aa") == "xx|xy|yx|yy"


def test_alternates_capped_at_max_phonemes():
    rules = [Rule("a", "", "", "(x|y)")]
    e = PhoneticEngine(rules)
    out = e.encode("a" * 10)            # 2^10 uncapped
    assert len(out.split("|")) <= MAX_PHONEMES


def test_final_rules_rescan():
    rules = [Rule("a", "", "", "uv")]
    finals = [Rule("u", "", "", "w"), Rule("v", "", "", "w")]
    e = PhoneticEngine(rules, finals)
    assert e.encode("aa") == "wwww"
