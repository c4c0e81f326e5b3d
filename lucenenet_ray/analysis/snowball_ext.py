"""Basque, Catalan and Irish Snowball stemmers — the last 3 of the 23
Tartarus programs shipped by the reference
(`Tartarus/Snowball/Ext/{Basque,Catalan,Irish}Stemmer.cs`), completing
the family (VERDICT r3 item 7).

Re-expressed from the published Snowball grammars over the repo's shared
helpers (suffix tables transcribed as data, logic written against the
grammar semantics — not a transliteration of the generated C# control
flow):

* Irish (`IrishStemmer.cs:42-641`): forward initial-morphology pass
  (de-mutation of eclipsis/lenition prefixes: `bhf`→f, `mb`→b, `ts`→s …,
  and `h-`/`n-`/`t-`/`d'`/`b'`/`m'` deletions), then regions pV/R1/R2 on
  the de-mutated word and three independent backward steps — noun
  suffixes (R1/R2), derivational suffixes (R2 + fixed respellings like
  `grafaíocht*`→graf), verb suffixes (RV/R1).
* Catalan (`CatalanStemmer.cs:42-1152`): R1/R2 regions, backward
  attached-pronoun strip (R1), standard-suffix OR verb-suffix, residual
  vowel strip, then a forward diacritic cleaning pass (à/á→a … ü→u,
  `·`→`.`).
* Basque (`BasqueStemmer.cs:42-1054`): Romance-style RV + R1/R2;
  REPEATED verb-suffix (aditzak) and noun-suffix (izenak) stripping with
  faithful backward-cursor threading (a `<-` respelling protects its
  replacement text from re-matching, exactly the SnowballProgram slice
  semantics), then one adjective step (adjetiboak).

Among semantics everywhere: LONGEST suffix wins and a failed region
condition does NOT backtrack to a shorter candidate (these amongs carry
no alternative methods) — e.g. Basque `zaldi` survives because `aldi`
fails RV and `di` is never tried, matching the reference test vectors
(`TestBasqueAnalyzer.cs:44-58`, `TestIrishAnalyzer.cs:42-65`,
`TestCatalanAnalyzer.cs:40-54`).
"""

from __future__ import annotations

from lucenenet_ray.analysis.snowball_romance import _r1, _rv_romance

# --------------------------------------------------------------------------
# among tables: (suffix, case) transcribed from the reference, sorted
# longest-first (ties impossible: equal-length suffixes are distinct)

_GA_A_0 = (
    ("d'fh", 3), ('bhf', 9), ("b'", 4), ('bh', 14), ('bp', 11), ('ch', 15),
    ("d'", 2), ('dh', 16), ('dt', 13), ('fh', 17), ('gc', 7), ('gh', 18),
    ('h-', 1), ("m'", 4), ('mb', 6), ('mh', 19), ('n-', 1), ('nd', 8),
    ('ng', 10), ('ph', 20), ('sh', 5), ('t-', 1), ('th', 21), ('ts', 12),
)

_GA_A_1 = (
    ('aíochta', 1), ('íochta', 1), ('aíocht', 1), ('íocht', 1),
    ('aire', 2), ('eabh', 1), ('aibh', 1), ('eamh', 1), ('aimh', 1),
    ('airí', 2), ('ire', 2), ('abh', 1), ('ibh', 1), ('amh', 1),
    ('imh', 1), ('irí', 2),
)

_GA_A_2 = (
    ('grafaíochtaí', 4), ('grafaíochta', 4), ('grafaíocht', 4),
    ('grafaíoch', 4), ('arcachtaí', 2), ('óideacha', 6), ('arcachta', 2),
    ('eachtúil', 1), ('patacha', 5), ('óideach', 6), ('gineach', 3),
    ('pataigh', 5), ('achtúil', 1), ('arcacht', 2), ('eachta', 1),
    ('patach', 5), ('óidigh', 6), ('gineas', 3), ('achta', 1),
    ('paite', 5), ('ginis', 3), ('eacht', 1), ('each', 1), ('acht', 1),
    ('ach', 1),
)

_GA_A_3 = (
    ('aimid', 1), ('aímid', 1), ('faidh', 1), ('imid', 1), ('ímid', 1),
    ('eadh', 2), ('fidh', 1), ('tear', 2), ('adh', 2), ('áil', 2),
    ('ain', 2), ('tar', 2),
)

_CA_A_1 = (
    ('selas', 1), ('selos', 1), ('sela', 1), ('selo', 1), ('-les', 1),
    ('-nos', 1), ('-la', 1), ('-me', 1), ('-te', 1), ("'hi", 1),
    ('-li', 1), ("'ho", 1), ('las', 1), ('les', 1), ("'ls", 1), ('-ls', 1),
    ("'ns", 1), ('-ns', 1), ('ens', 1), ('los', 1), ('nos', 1), ('vos', 1),
    ('-us', 1), ('la', 1), ('le', 1), ('me', 1), ('se', 1), ('hi', 1),
    ('li', 1), ("'l", 1), ("'m", 1), ('-m', 1), ("'n", 1), ('-n', 1),
    ('ho', 1), ('lo', 1), ("'s", 1), ('us', 1), ("'t", 1),
)

_CA_A_2 = (
    ('quíssimes', 5), ('allengües', 1), ('ativitats', 1), ('quíssima', 5),
    ('ialismes', 1), ('ialistes', 1), ('ionistes', 1), ('lógiques', 3),
    ('quíssims', 5), ('bilitats', 1), ('ativitat', 1), ('ialista', 1),
    ('ionista', 1), ('ialisme', 1), ('ionisme', 1), ('quíssim', 5),
    ('atòries', 1), ('íssimes', 1), ('ivitats', 1), ('bilitat', 1),
    ('isament', 1), ('lógica', 3), ('atòria', 1), ('íssima', 1),
    ('ivisme', 1), ('ificar', 1), ('lógics', 3), ('ancies', 1),
    ('encies', 1), ('ències', 1), ('logies', 3), ('formes', 1),
    ('idores', 1), ('atives', 1), ('logíes', 3), ('íssims', 1),
    ('acions', 2), ('aments', 1), ('ivitat', 1), ('ancia', 1),
    ('encia', 1), ('ència', 1), ('logia', 3), ('íinia', 1), ('ívola', 1),
    ('sfera', 1), ('adora', 1), ('adura', 1), ('ativa', 1), ('logía', 3),
    ('ístic', 1), ('issem', 1), ('ìssem', 1), ('íssem', 1), ('íssim', 1),
    ('ìssin', 1), ('itzar', 1), ('doras', 1), ('ícies', 1), ('inies', 1),
    ('ínies', 1), ('eries', 1), ('àries', 1), ('ables', 1), ('ibles', 1),
    ('ismes', 1), ('dores', 1), ('dures', 1), ('asses', 1), ('ictes', 1),
    ('istes', 1), ('iques', 4), ('logis', 3), ('toris', 1), ('cions', 1),
    ('assos', 1), ('issos', 1), ('adors', 1), ('idors', 1), ('itats', 1),
    ('ïtats', 1), ('ments', 1), ('trius', 1), ('atius', 1), ('ament', 1),
    ('isseu', 1), ('ìsseu', 1), ('ísseu', 1), ('íssiu', 1), ('enca', 1),
    ('ícia', 1), ('inia', 1), ('eria', 1), ('ària', 1), ('alla', 1),
    ('ella', 1), ('dora', 1), ('assa', 1), ('essa', 1), ('issa', 1),
    ('ista', 1), ('atge', 1), ('able', 1), ('ible', 1), ('isme', 1),
    ('aire', 1), ('icte', 1), ('iste', 1), ('logi', 3), ('tori', 1),
    ('ívol', 1), ('isam', 1), ('amen', 1), ('egar', 1), ('ejar', 1),
    ('itar', 1), ('nces', 1), ('ades', 2), ('bles', 1), ('imes', 1),
    ('ines', 1), ('eres', 1), ('ores', 1), ('eses', 1), ('oses', 1),
    ('ites', 1), ('otes', 1), ('ives', 1), ('icis', 1), ('ícis', 1),
    ('aris', 1), ('ells', 1), ('ions', 1), ('esos', 1), ('osos', 1),
    ('dors', 1), ('ants', 1), ('ents', 1), ('itat', 1), ('ïtat', 1),
    ('ient', 1), ('ment', 1), ('triu', 1), ('atiu', 1), ('ació', 1),
    ('ica', 4), ('ada', 2), ('ima', 1), ('ana', 1), ('ina', 1), ('era', 1),
    ('ora', 1), ('esa', 1), ('osa', 1), ('eta', 1), ('ita', 1), ('ota', 1),
    ('iva', 1), ('nça', 1), ('enc', 1), ('esc', 1), ('ble', 1), ('ici', 1),
    ('íci', 1), ('ari', 1), ('all', 1), ('ell', 1), ('fer', 1), ('dor', 1),
    ('dur', 1), ('ics', 4), ('uds', 1), ('als', 1), ('ims', 1), ('ers', 1),
    ('ors', 1), ('ats', 1), ('ets', 1), ('ots', 1), ('uts', 1), ('ius', 1),
    ('dís', 1), ('ant', 1), ('ent', 1), ('ció', 1), ('ic', 4), ('ud', 1),
    ('al', 1), ('il', 1), ('ar', 1), ('or', 1), ('ls', 1), ('ès', 1),
    ('és', 1), ('ís', 1), ('ós', 1), ('et', 1), ('ot', 1), ('ió', 1),
    ('ó', 1),
)

_CA_A_3 = (
    ('iéramos', 1), ('aríamos', 1), ('eríamos', 1), ('iríamos', 1),
    ('iésemos', 1), ('eresseu', 1), ('esquen', 1), ('isquen', 1),
    ('ïsquen', 1), ('esquin', 1), ('adores', 1), ('esques', 1),
    ('ïsques', 1), ('ierais', 1), ('aríais', 1), ('eríais', 1),
    ('iríais', 1), ('ieseis', 1), ('asteis', 1), ('isteis', 1),
    ('esquis', 1), ('ábamos', 1), ('áramos', 1), ('aremos', 1),
    ('eremos', 1), ('iremos', 1), ('ásemos', 1), ('adora', 1),
    ('esqui', 1), ('àssem', 1), ('éssem', 1), ('iguem', 1), ('ïguem', 1),
    ('irìem', 1), ('aríem', 1), ('iríem', 1), ('assim', 1), ('essim', 1),
    ('issim', 1), ('àssim', 1), ('èssim', 1), ('éssim', 1), ('íssim', 1),
    ('arian', 1), ('ieran', 1), ('arían', 1), ('erían', 1), ('irían', 1),
    ('arien', 1), ('irien', 1), ('iesen', 1), ('assen', 1), ('essen', 1),
    ('issen', 1), ('éssen', 1), ('ïssen', 1), ('eixen', 1), ('assin', 1),
    ('essin', 1), ('issin', 1), ('ïssin', 1), ('eixin', 1), ('ieron', 1),
    ('iendo', 1), ('eixer', 1), ('ieras', 1), ('arías', 1), ('erías', 1),
    ('irías', 1), ('atges', 1), ('aries', 1), ('iries', 1), ('ieses', 1),
    ('asses', 1), ('esses', 1), ('isses', 1), ('ïsses', 1), ('eixes', 1),
    ('abais', 1), ('arais', 1), ('aseis', 1), ('assis', 1), ('essis', 1),
    ('issis', 1), ('ïssis', 1), ('eixis', 1), ('itzis', 1), ('aréis', 1),
    ('eréis', 1), ('iréis', 1), ('íamos', 1), ('adors', 1), ('erass', 1),
    ('asseu', 1), ('esseu', 1), ('àsseu', 1), ('ésseu', 1), ('igueu', 1),
    ('ïgueu', 1), ('itzeu', 1), ('irìeu', 1), ('aríeu', 1), ('iríeu', 1),
    ('assiu', 1), ('issiu', 1), ('àssiu', 1), ('èssiu', 1), ('éssiu', 1),
    ('íssiu', 1), ('esca', 1), ('isca', 1), ('ïsca', 1), ('aria', 1),
    ('iria', 1), ('iera', 1), ('itza', 1), ('aría', 1), ('ería', 1),
    ('iría', 1), ('iese', 1), ('aste', 1), ('iste', 1), ('eixi', 1),
    ('itzi', 1), ('arem', 1), ('irem', 1), ('àrem', 1), ('írem', 1),
    ('avem', 1), ('àvem', 1), ('ávem', 1), ('aban', 1), ('aran', 1),
    ('iran', 1), ('aren', 1), ('eren', 1), ('iren', 1), ('àren', 1),
    ('ïren', 1), ('asen', 1), ('aven', 1), ('ixen', 1), ('ïxen', 1),
    ('inin', 1), ('isin', 1), ('aron', 1), ('arán', 1), ('erán', 1),
    ('irán', 1), ('ando', 2), ('eixo', 1), ('itzo', 1), ('tzar', 1),
    ('ador', 1), ('abas', 1), ('adas', 1), ('idas', 1), ('aras', 1),
    ('ades', 1), ('ides', 1), ('udes', 1), ('ïdes', 1), ('ares', 1),
    ('ires', 1), ('ïres', 1), ('ases', 1), ('ques', 1), ('aves', 1),
    ('ixes', 1), ('ïxes', 1), ('íais', 1), ('inis', 1), ('isis', 1),
    ('ados', 1), ('idos', 1), ('amos', 1), ('imos', 1), ('ents', 1),
    ('aràs', 1), ('iràs', 1), ('arás', 1), ('erás', 1), ('irás', 1),
    ('arés', 1), ('erau', 1), ('ineu', 1), ('areu', 1), ('ireu', 1),
    ('àreu', 1), ('íreu', 1), ('àveu', 1), ('áveu', 1), ('itzà', 1),
    ('aba', 1), ('ada', 1), ('ida', 1), ('uda', 1), ('ïda', 1), ('ara', 1),
    ('ira', 1), ('ïra', 1), ('ava', 1), ('ixa', 1), ('isc', 1), ('ïsc', 1),
    ('dre', 1), ('ase', 1), ('ini', 1), ('íem', 1), ('ían', 1), ('ien', 1),
    ('ïen', 1), ('sin', 1), ('iïn', 1), ('ado', 1), ('ido', 1), ('ixo', 1),
    ('ïxo', 1), ('ías', 1), ('ids', 1), ('ies', 1), ('ïes', 1), ('sis', 1),
    ('áis', 1), ('ams', 1), ('ass', 1), ('ess', 1), ('ats', 1), ('its', 1),
    ('iïs', 1), ('ant', 1), ('ent', 1), ('int', 1), ('ieu', 1), ('ìeu', 1),
    ('íeu', 1), ('eix', 1), ('itz', 1), ('arà', 1), ('irà', 1), ('ará', 1),
    ('erá', 1), ('irá', 1), ('irè', 1), ('aré', 1), ('eré', 1), ('iré', 1),
    ('ia', 1), ('ía', 1), ('ïa', 1), ('ad', 1), ('ed', 1), ('id', 1),
    ('ie', 1), ('re', 1), ('ii', 1), ('am', 1), ('em', 1), ('ïm', 1),
    ('an', 1), ('en', 1), ('in', 1), ('io', 1), ('ar', 1), ('er', 1),
    ('ir', 1), ('as', 1), ('es', 1), ('às', 1), ('és', 1), ('ís', 1),
    ('at', 1), ('it', 1), ('ut', 1), ('ït', 1), ('au', 1), ('ïu', 1),
    ('ix', 1), ('ïx', 1), ('ià', 1), ('iï', 1), ('ió', 1), ('í', 1),
)

_CA_A_4 = (
    ('iqu', 2), ('itz', 1), ('ïn', 1), ('ir', 1), ('is', 1), ('os', 1),
    ('ïs', 1), ('it', 1), ('eu', 1), ('iu', 1), ('a', 1), ('e', 1),
    ('i', 1), ('o', 1), ('s', 1), ('à', 1), ('á', 1), ('é', 1), ('ì', 1),
    ('í', 1), ('ï', 1), ('ó', 1),
)

_EU_A_0 = (
    ('tzailea', 1), ('arabera', 4), ('atseden', 3), ('kundea', 1),
    ('tailea', 1), ('taldia', 1), ('garria', 2), ('karria', 1),
    ('tezina', 1), ('kizuna', 1), ('gailua', 1), ('erreza', 1),
    ('gaitza', 1), ('kaitza', 1), ('kuntza', 1), ('tzaile', 1),
    ('tarazi', 1), ('aldatu', 1), ('baditu', 5), ('bidea', 1),
    ('kidea', 1), ('pidea', 1), ('galea', 1), ('gunea', 1), ('kunea', 1),
    ('tzaga', 1), ('aldia', 1), ('karia', 1), ('tzaka', 1), ('ezina', 1),
    ('korra', 1), ('kunde', 1), ('tzake', 1), ('tzeke', 1), ('taile', 1),
    ('taldi', 1), ('etari', 1), ('garri', 2), ('karri', 1), ('arazi', 1),
    ('rekin', 1), ('tezin', 1), ('kizun', 1), ('gailu', 1), ('errez', 1),
    ('gaitz', 1), ('kaitz', 1), ('idea', 1), ('gaia', 1), ('mena', 1),
    ('pena', 1), ('kina', 1), ('kuna', 1), ('tuna', 1), ('bera', 1),
    ('kera', 1), ('pera', 1), ('orra', 1), ('dura', 1), ('gura', 1),
    ('kura', 1), ('tura', 1), ('keta', 1), ('bide', 1), ('kide', 1),
    ('pide', 1), ('gale', 1), ('gune', 1), ('kune', 1), ('atze', 1),
    ('aldi', 1), ('kari', 1), ('lari', 1), ('tari', 1), ('rean', 1),
    ('etan', 1), ('ezin', 1), ('dako', 1), ('tzat', 1), ('tatu', 1),
    ('tzez', 1), ('era', 1), ('eta', 1), ('eza', 1), ('tza', 2),
    ('ide', 1), ('tze', 1), ('gai', 1), ('ari', 1), ('ean', 1), ('kan', 1),
    ('men', 1), ('pen', 1), ('kin', 1), ('tun', 1), ('ago', 1), ('tio', 1),
    ('kor', 1), ('atu', 1), ('ka', 1), ('la', 1), ('le', 1), ('ki', 1),
    ('an', 1), ('go', 1), ('or', 1), ('du', 1), ('tu', 1), ('ez', 1),
)

_EU_A_1 = (
    ('minutuko', 6), ('garrena', 1), ('gerrena', 1), ('kaldea', 1),
    ('taldea', 1), ('tzalea', 1), ('zionea', 1), ('aurrea', 1),
    ('taldia', 1), ('handia', 1), ('mendia', 1), ('garria', 2),
    ('larria', 1), ('kirria', 1), ('ontzia', 1), ('gibela', 1),
    ('urrena', 1), ('tzaina', 1), ('tasuna', 1), ('kondoa', 1),
    ('tzarra', 1), ('mendua', 1), ('mentua', 1), ('koitza', 1),
    ('gintza', 1), ('kintza', 1), ('kuntza', 1), ('garren', 1),
    ('gerren', 1), ('tariko', 1), ('gintzo', 1), ('gintzu', 1),
    ('denda', 1), ('gabea', 1), ('kabea', 1), ('aldea', 1), ('ordea', 1),
    ('zalea', 1), ('gilea', 1), ('kumea', 1), ('gunea', 1), ('kotea', 1),
    ('artea', 1), ('ostea', 1), ('etxea', 1), ('aldia', 1), ('degia', 1),
    ('tegia', 1), ('nahia', 1), ('tokia', 1), ('karia', 1), ('laria', 1),
    ('taria', 1), ('keria', 1), ('teria', 1), ('duria', 1), ('bizia', 1),
    ('aurka', 10), ('kaila', 1), ('skila', 1), ('zaina', 1), ('garna', 1),
    ('asuna', 1), ('ondoa', 1), ('takoa', 1), ('zinoa', 1), ('taroa', 1),
    ('zaroa', 1), ('liara', 1), ('tiara', 1), ('etara', 1), ('tzara', 1),
    ('korra', 1), ('ordua', 1), ('lekua', 1), ('burua', 1), ('durua', 1),
    ('estua', 1), ('eroza', 1), ('antza', 1), ('kalde', 1), ('talde', 1),
    ('tzale', 1), ('zione', 1), ('aurre', 1), ('taldi', 1), ('geldi', 8),
    ('handi', 1), ('mendi', 1), ('garri', 2), ('larri', 1), ('kirri', 1),
    ('ontzi', 1), ('tarik', 1), ('gibel', 1), ('urren', 1), ('tzain', 1),
    ('tasun', 1), ('aizun', 1), ('kondo', 1), ('trako', 5), ('etako', 1),
    ('igaro', 9), ('behar', 1), ('zehar', 7), ('mendu', 1), ('mentu', 1),
    ('koitz', 1), ('kada', 1), ('anda', 1), ('emea', 1), ('enea', 1),
    ('unea', 1), ('anga', 1), ('gaia', 1), ('geia', 1), ('egia', 1),
    ('ohia', 1), ('koia', 1), ('aria', 1), ('eria', 1), ('asia', 1),
    ('ezia', 1), ('joka', 3), ('gela', 1), ('tila', 1), ('kana', 1),
    ('kina', 1), ('mina', 1), ('duna', 1), ('ngoa', 1), ('zioa', 1),
    ('zkoa', 1), ('aroa', 1), ('eroa', 1), ('oroa', 1), ('osoa', 1),
    ('ttoa', 1), ('ztoa', 1), ('txoa', 1), ('tzoa', 1), ('dara', 1),
    ('tara', 1), ('bera', 1), ('kera', 1), ('pera', 1), ('keta', 1),
    ('tsua', 1), ('txua', 1), ('tzua', 1), ('gabe', 1), ('kabe', 1),
    ('kide', 1), ('alde', 1), ('orde', 1), ('zale', 1), ('gile', 1),
    ('kume', 1), ('gune', 1), ('kote', 1), ('arte', 1), ('oste', 1),
    ('etxe', 1), ('aldi', 1), ('degi', 1), ('tegi', 1), ('nahi', 1),
    ('toki', 1), ('kari', 1), ('lari', 1), ('tari', 1), ('duri', 1),
    ('kail', 1), ('etan', 1), ('tzen', 4), ('zain', 1), ('asun', 1),
    ('ondo', 1), ('tako', 1), ('tuko', 1), ('zino', 1), ('taro', 1),
    ('zaro', 1), ('giro', 1), ('liar', 1), ('tiar', 1), ('tzar', 1),
    ('ordu', 1), ('leku', 1), ('buru', 2), ('duru', 1), ('tatu', 4),
    ('estu', 1), ('eroz', 1), ('ada', 1), ('nea', 1), ('pea', 1),
    ('tea', 1), ('kia', 1), ('oia', 1), ('tia', 1), ('ska', 1), ('xka', 1),
    ('zka', 1), ('ola', 1), ('ena', 1), ('una', 1), ('koa', 1), ('noa', 1),
    ('toa', 1), ('ñoa', 1), ('ara', 1), ('ora', 2), ('tra', 1), ('osa', 1),
    ('eta', 1), ('sta', 1), ('dua', 1), ('tua', 1), ('zua', 1), ('eza', 1),
    ('tza', 2), ('eme', 1), ('une', 1), ('gai', 1), ('gei', 1), ('egi', 1),
    ('ohi', 1), ('goi', 1), ('koi', 1), ('ari', 1), ('asi', 1), ('ail', 1),
    ('kan', 1), ('tan', 1), ('ren', 2), ('ten', 4), ('kin', 1), ('min', 1),
    ('dun', 1), ('ngo', 1), ('zio', 1), ('eko', 1), ('sko', 1), ('zko', 1),
    ('aro', 1), ('ero', 1), ('oro', 1), ('oso', 1), ('tto', 1), ('zto', 1),
    ('txo', 1), ('tzo', 1), ('dar', 1), ('tar', 1), ('kor', 1), ('ket', 1),
    ('tsu', 1), ('txu', 1), ('tzu', 1), ('ga', 1), ('ka', 1), ('na', 1),
    ('ra', 1), ('sa', 1), ('ta', 1), ('za', 1), ('ge', 1), ('ne', 1),
    ('pe', 1), ('te', 1), ('di', 1), ('ki', 1), ('oi', 1), ('ti', 1),
    ('ñi', 1), ('ak', 1), ('ek', 1), ('en', 4), ('go', 1), ('ko', 1),
    ('no', 1), ('ro', 1), ('to', 1), ('ño', 1), ('zp', 1), ('ar', 1),
    ('or', 2), ('os', 1), ('du', 1), ('tu', 1), ('zu', 1), ('ez', 1),
    ('tz', 1), ('z', 1),
)

_EU_A_2 = (
    ('keria', 1), ('lanik', 1), ('larik', 1), ('zlea', 2), ('dade', 1),
    ('tade', 1), ('date', 1), ('tate', 1), ('ztik', 1), ('era', 1),
    ('rik', 1), ('ero', 1), ('la', 1), ('gi', 1), ('ki', 1), ('ik', 1),
    ('go', 1), ('ro', 1), ('to', 1),
)


# --------------------------------------------------------------------------
# Irish  (IrishStemmer.cs; analyzer chain Ga/IrishAnalyzer.cs)

_GA_V = frozenset("aeiouáéíóú")
# initial_morph actions: case -> replacement ("" = delete)
_GA_PRE_ACT = {1: "", 2: "", 3: "f", 4: "", 5: "s", 6: "b", 7: "c",
               8: "d", 9: "f", 10: "g", 11: "p", 12: "s", 13: "t",
               14: "b", 15: "c", 16: "d", 17: "f", 18: "g", 19: "m",
               20: "p", 21: "t"}


def _after_first_vowel(w: str, vowels: frozenset) -> int:
    """gopast-vowel mark: position just past the first vowel (pV)."""
    for i, ch in enumerate(w):
        if ch in vowels:
            return i + 1
    return len(w)


def irish_stem(word: str) -> str:
    """Irish Snowball stemmer (IrishStemmer.cs Stem():569-641)."""
    w = word
    # initial_morph: longest matching mutation prefix, one shot
    for pre, case in _GA_A_0:
        if w.startswith(pre):
            w = _GA_PRE_ACT[case] + w[len(pre):]
            break
    pv = _after_first_vowel(w, _GA_V)
    p1 = _r1(w, _GA_V)
    p2 = _r1(w, _GA_V, p1)

    # noun_sfx (do): case1 R1 delete, case2 R2 delete
    for suf, case in _GA_A_1:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if case == 1 and base >= p1:
                w = w[:base]
            elif case == 2 and base >= p2:
                w = w[:base]
            break
    # deriv (do): case1 R2 delete; 2..6 fixed respellings (no region)
    _deriv = {2: "arc", 3: "gin", 4: "graf", 5: "paite", 6: "óid"}
    for suf, case in _GA_A_2:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if case == 1:
                if base >= p2:
                    w = w[:base]
            else:
                w = w[:base] + _deriv[case]
            break
    # verb_sfx (do): case1 RV delete, case2 R1 delete
    for suf, case in _GA_A_3:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if case == 1 and base >= pv:
                w = w[:base]
            elif case == 2 and base >= p1:
                w = w[:base]
            break
    return w


def irish_lowercase(term: str) -> str:
    """IrishLowerCaseFilter.cs: n/t + uppercase-vowel start → hyphenated
    prefix (nAthair → n-athair); otherwise plain lowercase."""
    if len(term) > 1 and term[0] in "nt" and term[1] in "AEIOUÁÉÍÓÚ":
        return term[0] + "-" + term[1:].lower()
    return term.lower()


# --------------------------------------------------------------------------
# Catalan  (CatalanStemmer.cs; analyzer chain Ca/CatalanAnalyzer.cs)

_CA_V = frozenset("aeiouàáèéìíïòóúü")
_CA_CLEAN = str.maketrans({"à": "a", "á": "a", "è": "e", "é": "e",
                           "ì": "i", "í": "i", "ï": "i", "ò": "o",
                           "ó": "o", "ú": "u", "ü": "u", "·": "."})


def catalan_stem(word: str) -> str:
    """Catalan Snowball stemmer (CatalanStemmer.cs Stem():1055-1152)."""
    w = word
    p1 = _r1(w, _CA_V)
    p2 = _r1(w, _CA_V, p1)

    # attached_pronoun (do): all R1 delete
    for suf, case in _CA_A_1:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                w = w[: -len(suf)]
            break
    # standard_suffix OR verb_suffix (do)
    matched = False
    for suf, case in _CA_A_2:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if case == 1 and base >= p1:
                w, matched = w[:base], True
            elif case == 2 and base >= p2:
                w, matched = w[:base], True
            elif case == 3 and base >= p2:
                w, matched = w[:base] + "log", True
            elif case == 4 and base >= p2:
                w, matched = w[:base] + "ic", True
            elif case == 5 and base >= p1:
                w, matched = w[:base] + "c", True
            break
    if not matched:
        for suf, case in _CA_A_3:
            if w.endswith(suf):
                base = len(w) - len(suf)
                if case == 1 and base >= p1:
                    w = w[:base]
                elif case == 2 and base >= p2:
                    w = w[:base]
                break
    # residual_suffix (do)
    for suf, case in _CA_A_4:
        if w.endswith(suf):
            base = len(w) - len(suf)
            if case == 1 and base >= p1:
                w = w[:base]
            elif case == 2 and base >= p1:
                w = w[:base] + "ic"
            break
    # cleaning (forward repeat): strip diacritics, midpoint → '.'
    return w.translate(_CA_CLEAN)


# --------------------------------------------------------------------------
# Basque  (BasqueStemmer.cs; analyzer chain Eu/BasqueAnalyzer.cs)

_EU_V = frozenset("aeiou")


def _eu_find_b(w: str, c: int, table):
    """Backward among at cursor c: longest (suffix, case) of w[:c]."""
    for suf, case in table:
        n = len(suf)
        if n <= c and w[c - n:c] == suf:
            return suf, case
    return None


def _eu_step(w: str, c: int, table, acts, pv: int, p1: int, p2: int):
    """One among step with backward-cursor threading: returns
    (w, cursor, success). acts maps case -> ('RV'|'R1'|'R2', '') for
    region-gated deletes or (None, respelling) for fixed respellings;
    a failed region gate does NOT retry shorter suffixes."""
    hit = _eu_find_b(w, c, table)
    if hit is None:
        return w, c, False
    suf, case = hit
    bra = c - len(suf)
    region, repl = acts[case]
    if region == "RV" and bra < pv:
        return w, c, False
    if region == "R1" and bra < p1:
        return w, c, False
    if region == "R2" and bra < p2:
        return w, c, False
    return w[:bra] + repl + w[c:], bra, True


_EU_ADITZAK_ACT = {1: ("RV", ""), 2: ("R2", ""), 3: (None, "atseden"),
                   4: (None, "arabera"), 5: (None, "baditu")}
_EU_IZENAK_ACT = {1: ("RV", ""), 2: ("R2", ""), 3: (None, "jok"),
                  4: ("R1", ""), 5: (None, "tra"), 6: (None, "minutu"),
                  7: (None, "zehar"), 8: (None, "geldi"),
                  9: (None, "igaro"), 10: (None, "aurka")}
_EU_ADJ_ACT = {1: ("RV", ""), 2: (None, "z")}


# Deterministic gate-corpus splice vocabulary (shared constant: embedded
# as literals into basque_stem_stats_sql and appended engine-side in
# _q_eu_stem_stats). Chosen so the repeat loops AND the
# adjetiboak-after-failed-izenak reset actually fire on the gate corpus:
# 'aberastasunik' (izenak fails, adjetiboak strips RV 'ik') and
# 'teknologikoki' (izenak strips 'ki' then fails, adjetiboak strips 'gi')
# diverge from any oracle missing the ok-reset before the j0 phase.
EU_SPLICE_WORDS = (
    "aberastasunik", "teknologikoki", "ikustekoa", "etxeetatik",
    "handiena", "gizonarekin", "liburuetan", "emakumeei",
    "mendietako", "zaldiarentzat",
)


def basque_stem(word: str) -> str:
    """Basque Snowball stemmer (BasqueStemmer.cs Stem():960-1054):
    repeat aditzak; repeat izenak; do adjetiboak — the repeats thread the
    backward cursor so a respelling's text is never re-matched."""
    w = word
    pv = _rv_romance(w, _EU_V)
    p1 = _r1(w, _EU_V)
    p2 = _r1(w, _EU_V, p1)
    c = len(w)
    ok = True
    while ok:
        w, c, ok = _eu_step(w, c, _EU_A_0, _EU_ADITZAK_ACT, pv, p1, p2)
    ok = True
    while ok:
        w, c, ok = _eu_step(w, c, _EU_A_1, _EU_IZENAK_ACT, pv, p1, p2)
    w, c, _ = _eu_step(w, c, _EU_A_2, _EU_ADJ_ACT, pv, p1, p2)
    return w
