"""Spell module analogs: string distances + WordBreakSpellChecker.

Reference: ``src/Lucene.Net.Suggest/Spell/{LevensteinDistance,
JaroWinklerDistance,NGramDistance,LuceneLevenshteinDistance,
WordBreakSpellChecker}.cs``. The distances are the exact published
formulas (including the reference's JaroWinkler variant: uncapped common
prefix and a ``min(0.1, 1/maxLen)`` bonus factor, JaroWinklerDistance.cs
Matches/GetDistance; and LuceneLevenshteinDistance's transposition row
normalized by ``min(m, n)``).

``suggest_word_breaks`` / ``suggest_word_combinations`` mirror
WordBreakSpellChecker.cs:60-230 over this engine's term dictionary: all
df lookups for a probe are satisfied by ONE predicate-pushed scan of the
term-stats parquet (every contiguous substring of the probe is a
candidate — O(len²) strings, tiny), so the recursion never touches
storage. At 100-TB scale the same lookup dict is built once per actor and
probes stream through ``map_batches``.

Ranking note: the reference drains a PriorityQueue whose comparers
(:436-499) order by (fewest words, then highest max/summed frequency) and
leave ties unspecified; we add a deterministic final tiebreak (the word
tuple) so results are stable and oracle-comparable.
"""

from __future__ import annotations


def levenstein_distance(a: str, b: str) -> float:
    """LevensteinDistance.cs GetDistance: 1 - d/max(len)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 1.0 if n == m else 0.0
    prev = list(range(n + 1))
    for j in range(1, m + 1):
        cur = [j] + [0] * n
        bj = b[j - 1]
        for i in range(1, n + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1, prev[i - 1] + cost)
        prev = cur
    return 1.0 - prev[n] / max(n, m)


def lucene_levenshtein_distance(a: str, b: str) -> float:
    """LuceneLevenshteinDistance.cs: Damerau transpositions, similarity
    normalized by min(len) (so it can go negative)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return 1.0 - d[n][m] / min(n, m)


def jaro_winkler_distance(s1: str, s2: str, threshold: float = 0.7
                          ) -> float:
    """JaroWinklerDistance.cs GetDistance (the reference variant)."""
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    trans = sum(1 for x, y in zip(ms1, ms2) if x != y) // 2
    prefix = 0
    for mi in range(len(mn)):
        if s1[mi] == s2[mi]:
            prefix += 1
        else:
            break
    m = float(matches)
    j = (m / len(s1) + m / len(s2) + (m - trans) / m) / 3
    if j < threshold:
        return j
    return j + min(0.1, 1.0 / len(mx)) * prefix * (1 - j)


def ngram_distance(source: str, target: str, n: int = 2) -> float:
    """NGramDistance.cs GetDistance: n-gram-cost edit distance with
    null-prefixed grams and prefix-match discounting."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(1 for i in range(min(sl, tl))
                   if source[i] == target[i])
        return cost / max(sl, tl)
    sa = "\x00" * (n - 1) + source
    prev = [float(i) for i in range(sl + 1)]
    for j in range(1, tl + 1):
        if j < n:
            t_j = "\x00" * (n - j) + target[: j]
        else:
            t_j = target[j - n: j]
        cur = [float(j)] + [0.0] * sl
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\x00":
                    tn -= 1
            if tn == 0:
                # input contained literal NULs (the gram-prefix sentinel):
                # C# float division yields NaN/Inf here rather than raising
                ec = float("nan") if cost == 0 else float("inf")
            else:
                ec = cost / tn
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1, prev[i - 1] + ec)
        prev = cur
    return 1.0 - prev[sl] / max(tl, sl)


# ---------------------------------------------------------------------------
# WordBreakSpellChecker


def _df_map(reader, texts: set[str]) -> dict[str, int]:
    """df for each candidate string — one pushed-down scan of the
    term-stats parquet (terms absent from the dictionary get df 0)."""
    import pyarrow.compute as pc

    if not texts:
        return {}
    t = reader._termstats().to_table(
        columns=["term", "df"],
        filter=pc.field("term").isin(sorted(texts)))
    out = dict.fromkeys(texts, 0)
    for term, df in zip(t.column("term").to_pylist(),
                        t.column("df").to_pylist()):
        out[term] = int(df)
    return out


def suggest_word_breaks(reader, term: str, max_suggestions: int = 10,
                        min_suggestion_frequency: int = 1,
                        min_break_word_length: int = 1,
                        max_changes: int = 1,
                        max_evaluations: int = 1000,
                        sort_by_sum: bool = False,
                        suggest_always: bool = True,
                        ) -> list[list[tuple[str, int]]]:
    """WordBreakSpellChecker.SuggestWordBreaks (:60-100 + the recursion at
    :175-225): split `term` into dictionary words, every piece with
    df >= min_suggestion_frequency. Returns [(word, freq), ...] lists
    ranked by (fewest words, max-or-summed freq desc, words asc)."""
    dfm = _df_map(reader, {term[i:j] for i in range(len(term))
                           for j in range(i + 1, len(term) + 1)})
    if not suggest_always and dfm.get(term, 0) > 0:
        return []
    results: list[list[tuple[str, int]]] = []
    state = {"evals": 0}

    def gen(text: str, number_breaks: int, prefix: list[tuple[str, int]]):
        tl = len(text)
        mbl = max(min_break_word_length, 1)
        if tl < mbl * 2:
            return
        for i in range(mbl, tl - mbl + 1):
            left, right = text[:i], text[i:]
            lf = dfm.get(left, 0)
            if lf >= min_suggestion_frequency:
                rf = dfm.get(right, 0)
                if rf >= min_suggestion_frequency:
                    results.append(prefix + [(left, lf), (right, rf)])
                if number_breaks + 1 <= max_changes:
                    gen(right, number_breaks + 1, prefix + [(left, lf)])
            state["evals"] += 1
            if state["evals"] >= max_evaluations:
                break

    gen(term, 1, [])
    metric = (sum if sort_by_sum
              else max)
    results.sort(key=lambda ws: (len(ws),
                                 -metric(f for _, f in ws),
                                 tuple(w for w, _ in ws)))
    return results[:max_suggestions]


def suggest_word_combinations(reader, terms: list[str],
                              max_suggestions: int = 10,
                              min_suggestion_frequency: int = 1,
                              max_combine_word_length: int = 20,
                              max_changes: int = 1,
                              max_evaluations: int = 1000,
                              suggest_always: bool = True,
                              ) -> list[tuple[tuple[int, ...], str, int]]:
    """WordBreakSpellChecker.SuggestWordCombinations (:103-170): combine
    adjacent query terms into one dictionary word. Returns
    [(orig_indexes, combined, freq)] ranked by (fewest combinations,
    freq desc, first index asc)."""
    cands = set(terms)
    for i in range(len(terms)):
        comb = terms[i]
        for j in range(i + 1, min(len(terms), i + max_changes + 1)):
            comb += terms[j]
            cands.add(comb)
    dfm = _df_map(reader, cands)
    orig = None if suggest_always else [dfm.get(t, 0) for t in terms]
    out = []
    evals = 0
    for i in range(len(terms) - 1):
        left = terms[i]
        if len(left) > max_combine_word_length:
            continue
        max_f = min_f = orig[i] if orig is not None else 0
        if orig is None:
            min_f = 1 << 62
        combined = left
        for j in range(i + 1, len(terms)):
            if j - i > max_changes:
                break
            combined += terms[j]
            if len(combined) > max_combine_word_length:
                break
            if orig is not None:
                max_f = max(max_f, orig[j])
                min_f = min(min_f, orig[j])
            cf = dfm.get(combined, 0)
            if (suggest_always or min_f == 0) \
                    and cf >= min_suggestion_frequency:
                out.append((tuple(range(i, j + 1)), combined, cf))
            evals += 1
            if evals == max_evaluations:
                break
    out.sort(key=lambda t: (len(t[0]), -t[2], t[0]))
    return out[:max_suggestions]


def _grams(word: str, ng: int) -> list[str]:
    """SpellChecker.FormGrams."""
    return [word[i: i + ng] for i in range(len(word) - ng + 1)]


def _gram_sizes(length: int) -> range:
    """SpellChecker.GetMin/GetMax (:GetMin/GetMax)."""
    if length > 5:
        return range(3, 5)
    if length == 5:
        return range(2, 4)
    return range(1, 3)


def spellchecker_ngram(reader, word: str, num_sug: int = 5,
                       accuracy: float = 0.5,
                       distance=levenstein_distance
                       ) -> list[tuple[str, float, int]]:
    """SpellChecker.cs SuggestSimilar analog over this engine's term
    dictionary: candidates share at least one n-gram with the probe (the
    reference cuts candidates at the gram query's top 10*numSug Lucene
    scores; as maxHits grows that cut converges to the full gram-sharing
    set used here — the documented delta), scored by the string distance
    (default LevensteinDistance similarity), filtered by `accuracy` and
    df >= 1, ranked (score desc, freq desc, term asc) — the
    SuggestWordScoreComparator order."""
    import pyarrow.compute as pc

    from lucenenet_ray.search.query import FIELD_SEP

    grams = set()
    for ng in _gram_sizes(len(word)):
        grams.update(_grams(word, ng))
    t = reader._termstats().to_table(columns=["term", "df"])
    mask = pc.invert(pc.match_substring(t.column("term"), FIELD_SEP))
    t = t.filter(mask)
    cand = None
    for g in sorted(grams):
        m = pc.match_substring(t.column("term"), g)
        cand = m if cand is None else pc.or_(cand, m)
    t = t.filter(cand)
    out = []
    for term, df in zip(t.column("term").to_pylist(),
                        t.column("df").to_pylist()):
        if term == word or df < 1:
            continue
        score = distance(word, term)
        if score >= accuracy:
            out.append((term, score, int(df)))
    out.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return out[:num_sug]
