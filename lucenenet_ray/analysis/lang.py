"""Per-language analyzer dispatch (SURVEY §2.2 "Per-language analyzers").

The reference ships 44 per-language analyzers, each = tokenizer + lowercase +
language stop set (+ stemmer) (``src/Lucene.Net.Analysis.Common/Analysis/
{De,Fr,Es,...}``). Here: the same UAX#29 tokenizer + lowercase chain with a
per-language stop set, dispatched on the ``lang`` column inside the tokenize
stage; unknown/``und`` languages route through the default English chain
(FIXTURES.md §1). Stemming chains live in ``lang_stem.py``
(StemmingLangAnalyzer: de/es/fr/it/pt/ru light stemmers, golden-tested);
CJK codepoint classes are handled inside the UAX#29 tokenizer itself.

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
ITALIAN_STOP = frozenset(
    "il lo la i gli le un uno una e di del della dei delle a al alla in nel "
    "nella che è per con non si su da come ma se più questo questa questi "
    "queste io tu lui lei noi voi loro sono era anche o dove chi cosa".split()
)
PORTUGUESE_STOP = frozenset(
    "o a os as um uma uns umas e de do da dos das em no na nos nas que é por "
    "para com não se seu sua seus suas ao à como mas ou este esta isto ele "
    "ela eles elas nós vós são foi ser tem mais já também".split()
)
DUTCH_STOP = frozenset(
    "de het een en van in op te dat die is was zijn met voor niet aan er om "
    "ook als bij nog maar dan uit naar door over zo geen wordt heeft naar "
    "deze dit hij zij wij jullie ik je hem haar hun ons".split()
)
RUSSIAN_STOP = frozenset(
    "и в во не что он на я с со как а то все она так его но да ты к у же вы "
    "за бы по ее мне было вот от меня еще нет о из ему теперь когда даже ну "
    "ли если уже или ни быть был него до вас нибудь".split()
)
SWEDISH_STOP = frozenset(
    "och det att i en jag hon som han på den med var sig för så till är men "
    "ett om hade de av icke mig du henne då sin nu har inte hans honom skulle "
    "hennes där min man ej vid kunde något från ut när efter upp vi dem vara "
    "vad över än dig kan sina här ha mot alla under någon eller allt".split()
)
FINNISH_STOP = frozenset(
    "ja ei se on että hän oli mutta kun niin myös kuin jos mitä joka siis "
    "vain me he nyt ole sen tai sitä olla".split()
)
HUNGARIAN_STOP = frozenset(
    "a az és hogy nem is de egy ez meg már csak mint el vagy ha volt lesz "
    "van még mi ki be fel le át".split()
)
CZECH_STOP = frozenset(
    "a se na je to v z že s o do i k by ale jako za po od pro tak když "
    "nebo už jen co".split()
)
INDONESIAN_STOP = frozenset(
    "yang dan di ke dari ini itu dengan untuk pada adalah tidak akan atau "
    "juga saya kami mereka ada sebagai dalam bisa telah sudah oleh".split()
)
LATVIAN_STOP = frozenset(
    "un ir es tu ka ar uz no par bet kā tas šis tā pie pēc jau vēl tikai "
    "vai bija būs viņš".split()
)
ARABIC_STOP = frozenset(
    "من في على أن إلى عن مع هذا هذه التي الذي ما لا لم و أو ثم قد كان "
    "كانت هو هي".split()
)
BULGARIAN_STOP = frozenset(
    "и в на с за от по но или като че да се е са било той тя то те този "
    "тази това тези при".split()
)
HINDI_STOP = frozenset(
    "के का एक में की है यह और से हैं को पर इस होता कि जो कर मे गया करने "
    "किया".split()
)
DANISH_STOP = frozenset(
    ("og i jeg det at en den til er som på de med han af for ikke der var "
     "mig sig men et har om vi min havde ham hun nu over da fra du ud sin "
     "dem os op man hans hvor eller hvad skal selv her alle vil blev kunne "
     "ind når være dog noget ville jo deres efter ned skulle denne end "
     "dette mit også under have dig anden hende mine alt meget sit sine "
     "vor mod disse hvis din nogle hos blive mange ad bliver hendes været "
     "thi jer sådan").split())  # Snowball danish_stop.txt (DanishAnalyzer)
SORANI_STOP = frozenset(
    "و بە لە کە بۆ ئەم ئەو هەر دە بوو دەبێت لەگەڵ وەک جا هیچ".split()
)
ROMANIAN_STOP = frozenset(
    "și în de la a al ale cu pe pentru este sunt care o un una nu se mai "
    "dar sau ca să din ei el ea noi voi lor fost fi după când unde ce".split()
)
NORWEGIAN_STOP = frozenset(
    "og i jeg det at en et den til er som på de med han av ikke der så "
    "var meg seg men ett har om vi min mitt ha hadde hun nå over da ved "
    "fra du ut sin dem oss opp man kan hans hvor eller hva skal selv".split()
)
TURKISH_STOP = frozenset(
    "ve bir bu da de için ile olarak olan daha çok en gibi kadar sonra "
    "ama ise ne var yok her o ki mi mı mu mü değil diye ya hem ancak".split()
)
CATALAN_STOP = frozenset(
    "a abans al als altre amb aquell aquest així això cada com contra de "
    "del dels dins el els em en encara ens entre era es està et ha hi ho "
    "i ja la les li lo los ma mentre meu molt ni no nosaltres o on per "
    "però perquè poc qual quan que què se ses seu si sobre son sota sou "
    "sóc són tal també tan tant teu tot un una unes uns us vosaltres "
    "vostre és".split())  # Snowball catalan stopwords (CatalanAnalyzer)
GALICIAN_STOP = frozenset(
    "a aínda alí aquel aquela aquelas aqueles aquilo aquí ao aos as así "
    "á ben cando che co coa comigo con connosco contigo convosco coas "
    "cos cun cuns cunha cunhas da dalgunha dalgunhas dalgún dalgúns das "
    "de del dela delas deles desde deste do dos dun duns dunha dunhas e "
    "el ela elas eles en era eran esa esas ese eses esta estar estaba "
    "está están este estes estiven estou eu é facer foi foron fun había "
    "hai iso isto la las lle lles lo los mais me meu meus min miña "
    "miñas moi na nas neste nin no non nos nosa nosas noso nosos nós "
    "nun nunha nuns nunhas o os ou ó ós para pero pode pois pola polas "
    "polo polos por que se senón ser seu seus sexa sido sobre súa súas "
    "tamén tan te ten teñen teño ter teu teus ti tido tiña tiven túa "
    "túas un unha unhas uns vos vosa vosas voso vosos vós".split())  # galician stopwords (GalicianAnalyzer stopwords.txt)
BASQUE_STOP = frozenset(
    "al anitz arabera asko baina bat batean batek bati batzuei batzuek "
    "batzuetan batzuk bera beraiek berau berauek bere berori beroriek "
    "beste bezala da dago dira ditu du dute edo egin ere eta eurak ez "
    "gainera gu gutxi guzti haiei haiek haietan hainbeste hala han "
    "handik hango hara hari hark hartan hau hauei hauek hauetan hemen "
    "hemendik hemengo hi hona honek honela honetan honi hor hori horiei "
    "horiek horietan horko horra horrek horrela horretan horri hortik "
    "hura izan ni noiz nola non nondik nongo nor nora ze zein zen "
    "zenbait zenbat zer zergatik ziren zituen zu zuek zuen "
    "zuten".split())  # Snowball basque stopwords (BasqueAnalyzer)
IRISH_STOP = frozenset(
    "a ach ag agus an aon ar arna as ba beirt bhúr caoga ceathair "
    "ceathrar chomh chtó chun cois céad cúig cúigear daichead dar de "
    "deich deichniúr den dhá do don dtí dá dár dó faoi faoin faoina "
    "faoinár fara fiche gach gan go gur haon hocht i iad idir in ina "
    "ins inár is le leis lena lenár mar mo mé na nach naoi naonúr ná ní "
    "níor nó nócha ocht ochtar os roimh sa seacht seachtar seachtó "
    "seasca seisear siad sibh sinn sna sé sí tar thar thú triúr trí "
    "tríocha tú um ár é éis í ó ón óna ónár".split())
# Snowball irish stopwords (IrishAnalyzer stopwords.txt)


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
            "it": LangAnalyzer(ITALIAN_STOP),
            "pt": LangAnalyzer(PORTUGUESE_STOP),
            "nl": LangAnalyzer(DUTCH_STOP),
            "ru": LangAnalyzer(RUSSIAN_STOP),
            "sv": LangAnalyzer(SWEDISH_STOP),
            "fi": LangAnalyzer(FINNISH_STOP),
            "hu": LangAnalyzer(HUNGARIAN_STOP),
            "cz": LangAnalyzer(CZECH_STOP),
            "id": LangAnalyzer(INDONESIAN_STOP),
            "lv": LangAnalyzer(LATVIAN_STOP),
            "ar": LangAnalyzer(ARABIC_STOP),
            "bg": LangAnalyzer(BULGARIAN_STOP),
            "hi": LangAnalyzer(HINDI_STOP),
            "ckb": LangAnalyzer(SORANI_STOP),
            "br": LangAnalyzer(PORTUGUESE_STOP),
        }
        from lucenenet_ray.analysis.greek import GreekAnalyzer

        self.analyzers["el"] = GreekAnalyzer()  # full fold→stop→stem chain
        # DanishAnalyzer.cs chain: stop (danish_stop.txt) + SnowballFilter
        # (DanishStemmer) — the only reference analyzer whose DEFAULT
        # stemmer is the Snowball program (analysis/snowball.py)
        from lucenenet_ray.analysis.lang_stem import (StemmingLangAnalyzer,
                                                      TurkishAnalyzer)

        self.analyzers["da"] = StemmingLangAnalyzer(DANISH_STOP, "da")
        # Reference-DEFAULT Snowball chains (each *Analyzer.cs builds
        # SnowballFilter(<lang>Stemmer) after lowercase+stop; the light
        # stemmers used for de/es/fr/it/pt are those analyzers' defaults,
        # but ru/sv/fi/hu/nl/ro/no/tr default to Snowball):
        self.analyzers["ru"] = StemmingLangAnalyzer(RUSSIAN_STOP,
                                                    "ru_snowball")
        self.analyzers["sv"] = StemmingLangAnalyzer(SWEDISH_STOP,
                                                    "sv_snowball")
        self.analyzers["fi"] = StemmingLangAnalyzer(FINNISH_STOP,
                                                    "fi_snowball")
        self.analyzers["hu"] = StemmingLangAnalyzer(HUNGARIAN_STOP,
                                                    "hu_snowball")
        # DutchAnalyzer.cs: StemmerOverride(4-entry default dict) +
        # Snowball Dutch
        self.analyzers["nl"] = StemmingLangAnalyzer(DUTCH_STOP,
                                                    "nl_default")
        self.analyzers["ro"] = StemmingLangAnalyzer(ROMANIAN_STOP,
                                                    "ro_snowball")
        self.analyzers["no"] = StemmingLangAnalyzer(NORWEGIAN_STOP,
                                                    "no_snowball")
        # TurkishAnalyzer.cs: Apostrophe + TurkishLowerCase + stop +
        # Snowball Turkish
        self.analyzers["tr"] = TurkishAnalyzer(TURKISH_STOP)
        # Final 3 Tartarus programs (analysis/snowball_ext.py):
        # BasqueAnalyzer.cs plain chain; CatalanAnalyzer.cs adds elision;
        # IrishAnalyzer.cs adds hyphenation-stop + elision + IrishLowerCase
        from lucenenet_ray.analysis.lang_stem import (CatalanAnalyzer,
                                                      IrishAnalyzer)

        self.analyzers["eu"] = StemmingLangAnalyzer(BASQUE_STOP,
                                                    "eu_snowball")
        self.analyzers["ca"] = CatalanAnalyzer(CATALAN_STOP)
        self.analyzers["ga"] = IrishAnalyzer(IRISH_STOP)
        # GalicianAnalyzer.cs: standard → lowercase → stop (stopwords.txt)
        # → GalicianStemFilter (the RSLP engine, analysis/rslp.py)
        self.analyzers["gl"] = StemmingLangAnalyzer(GALICIAN_STOP, "gl")

    def __call__(self, text: str, lang: str | None = None
                 ) -> tuple[list[str], list[int]]:
        return self.analyzers.get(lang or "", self.default)(text)

    def stop_set(self, lang: str | None) -> frozenset[str]:
        a = self.analyzers.get(lang or "", self.default)
        return a.stop_words if isinstance(a.stop_words, frozenset) else ENGLISH_STOP_WORDS
