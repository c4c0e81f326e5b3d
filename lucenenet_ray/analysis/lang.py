"""Per-language analyzer dispatch (SURVEY §2.2 "Per-language analyzers").

The reference ships 44 per-language analyzers, each = tokenizer + lowercase +
language stop set (+ stemmer) (``src/Lucene.Net.Analysis.Common/Analysis/
{De,Fr,Es,...}``). Here: the same UAX#29 tokenizer + lowercase chain with a
per-language stop set, dispatched on the ``lang`` column inside the tokenize
stage; unknown/``und`` languages route through the default English chain
(FIXTURES.md §1). Stemmers are an extension hook (``stem`` attribute),
deliberately None in v0 — stemming changes index terms and would need its own
golden suite (SURVEY §7.5).

Stop sets are compact high-frequency function-word sets (a pragmatic subset
of the reference's snowball lists, which are data files — swap in the full
lists for production parity).
"""

from __future__ import annotations

from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS, StandardAnalyzer

GERMAN_STOP = frozenset(
    "der die das und ist von zu mit nicht ein eine einer eines dem den im in "
    "auf für als auch an es sich bei aus nach wie um war sind oder aber wenn "
    "nur noch so über man sein ich du er sie wir ihr".split()
)
FRENCH_STOP = frozenset(
    "le la les un une des et de du à au aux est dans pour par sur avec ne pas "
    "que qui se ce cette ces son sa ses il elle ils elles nous vous je tu on "
    "mais ou où donc car si plus".split()
)
SPANISH_STOP = frozenset(
    "el la los las un una unos unas y de del a en que es por para con no se "
    "su sus lo como más pero sí o este esta estos estas él ella ellos ellas "
    "nosotros al ser son fue".split()
)


class LangAnalyzer(StandardAnalyzer):
    """StandardAnalyzer chain with a language-specific stop set."""

    def __init__(self, stop_words: frozenset[str]):
        self.stop_words = stop_words  # instance attr shadows the class attr


class MultiLangAnalyzer:
    """Dispatch-on-lang analyzer: the per-lang tables are built once per
    worker (module/actor state — SURVEY §2.3) and reused across documents."""

    def __init__(self) -> None:
        self.default = StandardAnalyzer()
        self.analyzers: dict[str, StandardAnalyzer] = {
            "en": self.default,
            "de": LangAnalyzer(GERMAN_STOP),
            "fr": LangAnalyzer(FRENCH_STOP),
            "es": LangAnalyzer(SPANISH_STOP),
        }

    def __call__(self, text: str, lang: str | None = None
                 ) -> tuple[list[str], list[int]]:
        return self.analyzers.get(lang or "", self.default)(text)

    def stop_set(self, lang: str | None) -> frozenset[str]:
        a = self.analyzers.get(lang or "", self.default)
        return a.stop_words if isinstance(a.stop_words, frozenset) else ENGLISH_STOP_WORDS
