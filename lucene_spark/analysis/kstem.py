"""KStem — Krovetz's dictionary-validated English stemmer, the engine
behind the reference's ``analysis/en/KStemFilter.java`` (KStemmer.java:71;
R. Krovetz, "Viewing morphology as an inference process", SIGIR'93).

Unlike suffix strippers, KStem only rewrites a word when the candidate
root is VALIDATED against a lexicon: each ending routine tries a series
of candidate transformations (remove -s/-ed/-ing, undouble a consonant,
restore a final e, convert -ity to -ble/-ive, map -ive to -ion, ...) and
keeps the first candidate the dictionary knows. The engine here mirrors
the reference's routine order, the j/k stem-index protocol, the
matched-entry caching (``wordInDict`` reuses a stale hit, ``lookup``
overwrites it even with a miss) and the exception/direct-conflation
entry semantics — verified by fuzz-diffing against the reference's OWN
KStemmer compiled with the installed JDK (zero mismatches; see
``tests/test_kstem.py``).

The LEXICON is pluggable data, like hunspell's .dic and the CJK word
table: ``KStem(lexicon=...)`` takes any head-word iterable (the
reference embeds the ~30k-entry UMass lexicon as KStemData1-8, which
``load_reference_lexicon`` can parse for tests). The small algorithmic
constants (exception words, direct conflations, country-nationality
maps, supplements, proper nouns) are bundled below.
"""

from __future__ import annotations

import re

__all__ = ["KStem", "load_reference_lexicon"]

MAX_WORD_LEN = 50

_EXCEPTION_WORDS = (
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done",
    "dune", "envelope", "gage", "grille", "grippe", "lobe", "mane", "mare",
    "nape", "node", "pane", "pate", "plane", "pope", "programme", "quite",
    "ripe", "rote", "rune", "sage", "severe", "shoppe", "sine", "slime",
    "snipe", "steppe", "suite", "swinge", "tare", "tine", "tope", "tripe",
    "twine",
)
_DIRECT_CONFLATIONS = (
    ("aging", "age"),
    ("going", "go"),
    ("goes", "go"),
    ("lying", "lie"),
    ("using", "use"),
    ("owing", "owe"),
    ("suing", "sue"),
    ("dying", "die"),
    ("tying", "tie"),
    ("vying", "vie"),
    ("aged", "age"),
    ("used", "use"),
    ("vied", "vie"),
    ("cued", "cue"),
    ("died", "die"),
    ("eyed", "eye"),
    ("hued", "hue"),
    ("iced", "ice"),
    ("lied", "lie"),
    ("owed", "owe"),
    ("sued", "sue"),
    ("toed", "toe"),
    ("tied", "tie"),
    ("does", "do"),
    ("doing", "do"),
    ("aeronautical", "aeronautics"),
    ("mathematical", "mathematics"),
    ("political", "politics"),
    ("metaphysical", "metaphysics"),
    ("cylindrical", "cylinder"),
    ("nazism", "nazi"),
    ("ambiguity", "ambiguous"),
    ("barbarity", "barbarous"),
    ("credulity", "credulous"),
    ("generosity", "generous"),
    ("spontaneity", "spontaneous"),
    ("unanimity", "unanimous"),
    ("voracity", "voracious"),
    ("fled", "flee"),
    ("miscarriage", "miscarry"),
)
_COUNTRY_NATIONALITY = (
    ("afghan", "afghanistan"),
    ("african", "africa"),
    ("albanian", "albania"),
    ("algerian", "algeria"),
    ("american", "america"),
    ("andorran", "andorra"),
    ("angolan", "angola"),
    ("arabian", "arabia"),
    ("argentine", "argentina"),
    ("armenian", "armenia"),
    ("asian", "asia"),
    ("australian", "australia"),
    ("austrian", "austria"),
    ("azerbaijani", "azerbaijan"),
    ("azeri", "azerbaijan"),
    ("bangladeshi", "bangladesh"),
    ("belgian", "belgium"),
    ("bermudan", "bermuda"),
    ("bolivian", "bolivia"),
    ("bosnian", "bosnia"),
    ("botswanan", "botswana"),
    ("brazilian", "brazil"),
    ("british", "britain"),
    ("bulgarian", "bulgaria"),
    ("burmese", "burma"),
    ("californian", "california"),
    ("cambodian", "cambodia"),
    ("canadian", "canada"),
    ("chadian", "chad"),
    ("chilean", "chile"),
    ("chinese", "china"),
    ("colombian", "colombia"),
    ("croat", "croatia"),
    ("croatian", "croatia"),
    ("cuban", "cuba"),
    ("cypriot", "cyprus"),
    ("czechoslovakian", "czechoslovakia"),
    ("danish", "denmark"),
    ("egyptian", "egypt"),
    ("equadorian", "equador"),
    ("eritrean", "eritrea"),
    ("estonian", "estonia"),
    ("ethiopian", "ethiopia"),
    ("european", "europe"),
    ("fijian", "fiji"),
    ("filipino", "philippines"),
    ("finnish", "finland"),
    ("french", "france"),
    ("gambian", "gambia"),
    ("georgian", "georgia"),
    ("german", "germany"),
    ("ghanian", "ghana"),
    ("greek", "greece"),
    ("grenadan", "grenada"),
    ("guamian", "guam"),
    ("guatemalan", "guatemala"),
    ("guinean", "guinea"),
    ("guyanan", "guyana"),
    ("haitian", "haiti"),
    ("hawaiian", "hawaii"),
    ("holland", "dutch"),
    ("honduran", "honduras"),
    ("hungarian", "hungary"),
    ("icelandic", "iceland"),
    ("indonesian", "indonesia"),
    ("iranian", "iran"),
    ("iraqi", "iraq"),
    ("iraqui", "iraq"),
    ("irish", "ireland"),
    ("israeli", "israel"),
    ("italian", "italy"),
    ("jamaican", "jamaica"),
    ("japanese", "japan"),
    ("jordanian", "jordan"),
    ("kampuchean", "cambodia"),
    ("kenyan", "kenya"),
    ("korean", "korea"),
    ("kuwaiti", "kuwait"),
    ("lankan", "lanka"),
    ("laotian", "laos"),
    ("latvian", "latvia"),
    ("lebanese", "lebanon"),
    ("liberian", "liberia"),
    ("libyan", "libya"),
    ("lithuanian", "lithuania"),
    ("macedonian", "macedonia"),
    ("madagascan", "madagascar"),
    ("malaysian", "malaysia"),
    ("maltese", "malta"),
    ("mauritanian", "mauritania"),
    ("mexican", "mexico"),
    ("micronesian", "micronesia"),
    ("moldovan", "moldova"),
    ("monacan", "monaco"),
    ("mongolian", "mongolia"),
    ("montenegran", "montenegro"),
    ("moroccan", "morocco"),
    ("myanmar", "burma"),
    ("namibian", "namibia"),
    ("nepalese", "nepal"),
    ("netherlands", "dutch"),
    ("nicaraguan", "nicaragua"),
    ("nigerian", "nigeria"),
    ("norwegian", "norway"),
    ("omani", "oman"),
    ("pakistani", "pakistan"),
    ("panamanian", "panama"),
    ("papuan", "papua"),
    ("paraguayan", "paraguay"),
    ("peruvian", "peru"),
    ("portuguese", "portugal"),
    ("romanian", "romania"),
    ("rumania", "romania"),
    ("rumanian", "romania"),
    ("russian", "russia"),
    ("rwandan", "rwanda"),
    ("samoan", "samoa"),
    ("scottish", "scotland"),
    ("serb", "serbia"),
    ("serbian", "serbia"),
    ("siam", "thailand"),
    ("siamese", "thailand"),
    ("slovakia", "slovak"),
    ("slovakian", "slovak"),
    ("slovenian", "slovenia"),
    ("somali", "somalia"),
    ("somalian", "somalia"),
    ("spanish", "spain"),
    ("swedish", "sweden"),
    ("swiss", "switzerland"),
    ("syrian", "syria"),
    ("taiwanese", "taiwan"),
    ("tanzanian", "tanzania"),
    ("texan", "texas"),
    ("thai", "thailand"),
    ("tunisian", "tunisia"),
    ("turkish", "turkey"),
    ("ugandan", "uganda"),
    ("ukrainian", "ukraine"),
    ("uruguayan", "uruguay"),
    ("uzbek", "uzbekistan"),
    ("venezuelan", "venezuela"),
    ("vietnamese", "viet"),
    ("virginian", "virginia"),
    ("yemeni", "yemen"),
    ("yugoslav", "yugoslavia"),
    ("yugoslavian", "yugoslavia"),
    ("zambian", "zambia"),
    ("zealander", "zealand"),
    ("zimbabwean", "zimbabwe"),
)
_SUPPLEMENT_DICT = (
    "aids", "applicator", "capacitor", "digitize", "electromagnet", "ellipsoid", "exosphere", "extensible",
    "ferromagnet", "graphics", "hydromagnet", "polygraph", "toroid", "superconduct", "backscatter", "connectionism",
)
_PROPER_NOUNS = (
    "abrams", "achilles", "acropolis", "adams", "agnes", "aires", "alexander", "alexis",
    "alfred", "algiers", "alps", "amadeus", "ames", "amos", "andes", "angeles",
    "annapolis", "antilles", "aquarius", "archimedes", "arkansas", "asher", "ashly", "athens",
    "atkins", "atlantis", "avis", "bahamas", "bangor", "barbados", "barger", "bering",
    "brahms", "brandeis", "brussels", "bruxelles", "cairns", "camoros", "camus", "carlos",
    "celts", "chalker", "charles", "cheops", "ching", "christmas", "cocos", "collins",
    "columbus", "confucius", "conners", "connolly", "copernicus", "cramer", "cyclops", "cygnus",
    "cyprus", "dallas", "damascus", "daniels", "davies", "davis", "decker", "denning",
    "dennis", "descartes", "dickens", "doris", "douglas", "downs", "dreyfus", "dukakis",
    "dulles", "dumfries", "ecclesiastes", "edwards", "emily", "erasmus", "euphrates", "evans",
    "everglades", "fairbanks", "federales", "fisher", "fitzsimmons", "fleming", "forbes", "fowler",
    "france", "francis", "goering", "goodling", "goths", "grenadines", "guiness", "hades",
    "harding", "harris", "hastings", "hawkes", "hawking", "hayes", "heights", "hercules",
    "himalayas", "hippocrates", "hobbs", "holmes", "honduras", "hopkins", "hughes", "humphreys",
    "illinois", "indianapolis", "inverness", "iris", "iroquois", "irving", "isaacs", "italy",
    "james", "jarvis", "jeffreys", "jesus", "jones", "josephus", "judas", "julius",
    "kansas", "keynes", "kipling", "kiwanis", "lansing", "laos", "leeds", "levis",
    "leviticus", "lewis", "louis", "maccabees", "madras", "maimonides", "maldive", "massachusetts",
    "matthews", "mauritius", "memphis", "mercedes", "midas", "mingus", "minneapolis", "mohammed",
    "moines", "morris", "moses", "myers", "myknos", "nablus", "nanjing", "nantes",
    "naples", "neal", "netherlands", "nevis", "nostradamus", "oedipus", "olympus", "orleans",
    "orly", "papas", "paris", "parker", "pauling", "peking", "pershing", "peter",
    "peters", "philippines", "phineas", "pisces", "pryor", "pythagoras", "queens", "rabelais",
    "ramses", "reynolds", "rhesus", "rhodes", "richards", "robins", "rodgers", "rogers",
    "rubens", "sagittarius", "seychelles", "socrates", "texas", "thames", "thomas", "tiberias",
    "tunis", "venus", "vilnius", "wales", "warner", "wilkins", "williams", "wyoming",
    "xmas", "yonkers", "zeus", "frances", "aarhus", "adonis", "andrews", "angus",
    "antares", "aquinas", "arcturus", "ares", "artemis", "augustus", "ayers", "barnabas",
    "barnes", "becker", "bejing", "biggs", "billings", "boeing", "boris", "borroughs",
    "briggs", "buenos", "calais", "caracas", "cassius", "cerberus", "ceres", "cervantes",
    "chantilly", "chartres", "chester", "connally", "conner", "coors", "cummings", "curtis",
    "daedalus", "dionysus", "dobbs", "dolores", "edmonds",
)

_DEFAULT = (None, False)


def load_reference_lexicon(java_dir: str) -> list:
    """Parse head words out of KStemData*.java files (test helper)."""
    import os

    words = []
    for name in sorted(os.listdir(java_dir)):
        if name.startswith("KStemData") and name.endswith(".java"):
            src = open(os.path.join(java_dir, name), encoding="utf-8").read()
            body = src[src.index("{"):]
            words.extend(re.findall(r'"([a-z]+)"', body))
    return words


class _JBuf:
    """OpenStringBuilder semantics: truncation keeps the backing array,
    and a later setLength GROWTH re-exposes the stale characters — the
    reference's er/or routine depends on this (it "removes the -r" by
    growing back over the buffer it truncated earlier)."""

    __slots__ = ("b", "n")

    def __init__(self, term: str):
        self.b = list(term) + ["\x00"] * 10  # reserve(len + 10)
        self.n = len(term)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.b[i]

    def __setitem__(self, i, c):
        self.b[i] = c

    def __iter__(self):
        return iter(self.b[: self.n])

    def append(self, c):
        if self.n < len(self.b):
            self.b[self.n] = c
        else:
            self.b.append(c)
        self.n += 1

    def extend(self, s):
        for c in s:
            self.append(c)

    def setlen(self, n):
        self.n = n

    def text(self):
        return "".join(self.b[: self.n])


class KStem:
    def __init__(self, lexicon=()):
        d = {}
        for w in _EXCEPTION_WORDS:
            d[w] = (w, True)
        for a, b in _DIRECT_CONFLATIONS:
            d.setdefault(a, (b, False))
        for a, b in _COUNTRY_NATIONALITY:
            d.setdefault(a, (b, False))
        for w in lexicon:
            d.setdefault(w, _DEFAULT)
        for w in _SUPPLEMENT_DICT:
            d.setdefault(w, _DEFAULT)
        for w in _PROPER_NOUNS:
            d.setdefault(w, _DEFAULT)
        self.dict = d

    # ----------------------------------------------------------- state ops
    def _is_cons(self, i):
        ch = self.w[i]
        if ch in "aeiou":
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _is_vowel(self, i):
        return not self._is_cons(i)

    def _ends(self, s):
        if len(s) > self.k:
            return False
        r = len(self.w) - len(s)
        if self.w.text()[r:] != s:
            self.j = self.k
            return False
        self.j = r - 1
        return True

    def _set_suffix(self, s):
        self.w.setlen(self.j + 1)
        self.w.extend(s)
        self.k = self.j + len(s)

    def _trunc(self, n):
        self.w.setlen(n)

    def _lookup(self):
        self.matched = self.dict.get(self.w.text())
        return self.matched is not None

    def _word_in_dict(self):
        if self.matched is not None:
            return self.matched
        e = self.dict.get(self.w.text())
        if e is not None and not e[1]:
            self.matched = e
        return e

    def _double_c(self, i):
        return i >= 1 and self.w[i] == self.w[i - 1] and self._is_cons(i)

    def _vowel_in_stem(self):
        return any(self._is_vowel(i) for i in range(self.j + 1))

    # ------------------------------------------------------------ routines
    def _plural(self):
        w = self.w
        if w[self.k] != "s":
            return
        if self._ends("ies"):
            self._trunc(self.j + 3)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            w.append("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends("es"):
            self._trunc(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (w[self.j] == "s" and
                                        w[self.j - 1] == "s")
            if try_e and self._lookup():
                return
            self._trunc(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            w.append("e")
            self.k += 1
            if not try_e:
                self._lookup()
        else:
            if len(w) > 3 and w[self.k - 1] != "s" and not self._ends("ous"):
                self._trunc(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self):
        w = self.w
        if len(w) <= 4:
            return
        if self._ends("ied"):
            self._trunc(self.j + 3)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            w.append("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends("ed") and self._vowel_in_stem():
            self._trunc(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            self._trunc(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.k):
                self._trunc(self.k)
                self.k -= 1
                if self._lookup():
                    return
                w.append(w[self.k])
                self.k += 1
                self._lookup()
                return
            if w[0] == "u" and w[1] == "n":
                w.append("e")
                w.append("d")
                self.k += 2
                return
            self._trunc(self.j + 1)
            w.append("e")
            self.k = self.j + 1

    def _aspect(self):
        w = self.w
        if len(w) <= 5:
            return
        if self._ends("ing") and self._vowel_in_stem():
            w[self.j + 1] = "e"
            self._trunc(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            self._trunc(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                self._trunc(self.k + 1)
                if self._lookup():
                    return
                w.append(w[self.k])
                self.k += 1
                self._lookup()
                return
            if self.j > 0 and self._is_cons(self.j) and                     self._is_cons(self.j - 1):
                self.k = self.j
                self._trunc(self.k + 1)
                return
            self._trunc(self.j + 1)
            w.append("e")
            self.k = self.j + 1

    def _ity(self):
        w = self.w
        old_k = self.k
        if not self._ends("ity"):
            return
        self._trunc(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        w[self.j + 1] = "i"
        w.extend("ty")
        self.k = old_k
        if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "l":
            self._trunc(self.j - 1)
            w.extend("le")
            self.k = self.j
            self._lookup()
            return
        if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "v":
            self._trunc(self.j + 1)
            w.append("e")
            self.k = self.j + 1
            self._lookup()
            return
        if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "l":
            self._trunc(self.j + 1)
            self.k = self.j
            self._lookup()
            return
        if self._lookup():
            return
        self._trunc(self.j + 1)
        self.k = self.j

    def _nce(self):
        w = self.w
        old_k = self.k
        if not self._ends("nce"):
            return
        wc = w[self.j]
        if wc not in ("e", "a"):
            return
        self._trunc(self.j)
        w.append("e")
        self.k = self.j
        if self._lookup():
            return
        self._trunc(self.j)
        self.k = self.j - 1
        if self._lookup():
            return
        w.append(wc)
        w.extend("nce")
        self.k = old_k

    def _ness(self):
        w = self.w
        if self._ends("ness"):
            self._trunc(self.j + 1)
            self.k = self.j
            if w[self.j] == "i":
                w[self.j] = "y"
            self._lookup()

    def _ism(self):
        if self._ends("ism"):
            self._trunc(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ment(self):
        w = self.w
        old_k = self.k
        if self._ends("ment"):
            self._trunc(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.extend("ment")
            self.k = old_k

    def _ize(self):
        w = self.w
        old_k = self.k
        if not self._ends("ize"):
            return
        self._trunc(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        w.append("i")
        if self._double_c(self.j):
            self._trunc(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            w.append(w[self.j - 1])
        self._trunc(self.j + 1)
        w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._trunc(self.j + 1)
        w.extend("ize")
        self.k = old_k

    def _ncy(self):
        w = self.w
        if not self._ends("ncy"):
            return
        if w[self.j] not in ("e", "a"):
            return
        w[self.j + 2] = "t"
        self._trunc(self.j + 3)
        self.k = self.j + 2
        if self._lookup():
            return
        w[self.j + 2] = "c"
        w.append("e")
        self.k = self.j + 3
        self._lookup()

    def _ble(self):
        w = self.w
        old_k = self.k
        if not self._ends("ble"):
            return
        if w[self.j] not in ("a", "i"):
            return
        wc = w[self.j]
        self._trunc(self.j)
        self.k = self.j - 1
        if self._lookup():
            return
        if self._double_c(self.k):
            self._trunc(self.k)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            w.append(w[self.k - 1])
        self._trunc(self.j)
        w.append("e")
        self.k = self.j
        if self._lookup():
            return
        self._trunc(self.j)
        w.extend("ate")
        self.k = self.j + 2
        if self._lookup():
            return
        self._trunc(self.j)
        w.append(wc)
        w.extend("ble")
        self.k = old_k

    def _ic(self):
        w = self.w
        if not self._ends("ic"):
            return
        self._trunc(self.j + 3)
        w.extend("al")
        self.k = self.j + 4
        if self._lookup():
            return
        w[self.j + 1] = "y"
        self._trunc(self.j + 2)
        self.k = self.j + 1
        if self._lookup():
            return
        w[self.j + 1] = "e"
        if self._lookup():
            return
        self._trunc(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        w.extend("ic")
        self.k = self.j + 2

    def _ion(self):
        w = self.w
        old_k = self.k
        if not self._ends("ion"):
            return
        if self._ends("ization"):
            self._trunc(self.j + 3)
            w.append("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends("ition"):
            self._trunc(self.j + 1)
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._trunc(self.j + 1)
            w.extend("ition")
            self.k = old_k
        elif self._ends("ation"):
            self._trunc(self.j + 3)
            w.append("e")
            self.k = self.j + 3
            if self._lookup():
                return
            self._trunc(self.j + 1)
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._trunc(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._trunc(self.j + 1)
            w.extend("ation")
            self.k = old_k
        if self._ends("ication"):
            self._trunc(self.j + 1)
            w.append("y")
            self.k = self.j + 1
            if self._lookup():
                return
            self._trunc(self.j + 1)
            w.extend("ication")
            self.k = old_k
        # plain -ion
        self.j = self.k - 3
        self._trunc(self.j + 1)
        w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._trunc(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self._trunc(self.j + 1)
        w.extend("ion")
        self.k = old_k

    def _er_or(self):
        w = self.w
        old_k = self.k
        if w[self.k] != "r":
            return
        if self._ends("izer"):
            self._trunc(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends("er") or self._ends("or"):
            wc = w[self.j + 1]
            if self._double_c(self.j):
                self._trunc(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.append(w[self.j - 1])
            if w[self.j] == "i":
                w[self.j] = "y"
                self._trunc(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                w[self.j] = "i"
                w.append("e")
            if w[self.j] == "e":
                self._trunc(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                w.append("e")
            self._trunc(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self._trunc(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w.append("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._trunc(self.j + 1)
            w.append(wc)
            w.append("r")
            self.k = old_k

    def _ly(self):
        w = self.w
        old_k = self.k
        if not self._ends("ly"):
            return
        w[self.j + 2] = "e"
        if self._lookup():
            return
        w[self.j + 2] = "y"
        self._trunc(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "l":
            return
        w.extend("ly")
        self.k = old_k
        if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "b":
            w[self.j + 2] = "e"
            self.k = self.j + 2
            return
        if w[self.j] == "i":
            self._trunc(self.j)
            w.append("y")
            self.k = self.j
            if self._lookup():
                return
            self._trunc(self.j)
            w.extend("ily")
            self.k = old_k
        self._trunc(self.j + 1)
        self.k = self.j

    def _al(self):
        w = self.w
        old_k = self.k
        if len(w) < 4:
            return
        if not self._ends("al"):
            return
        self._trunc(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        if self._double_c(self.j):
            self._trunc(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            w.append(w[self.j - 1])
        self._trunc(self.j + 1)
        w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._trunc(self.j + 1)
        w.extend("um")
        self.k = self.j + 2
        if self._lookup():
            return
        self._trunc(self.j + 1)
        w.extend("al")
        self.k = old_k
        if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "c":
            self._trunc(self.j - 1)
            self.k = self.j - 2
            if self._lookup():
                return
            self._trunc(self.j - 1)
            w.append("y")
            self.k = self.j - 1
            if self._lookup():
                return
            self._trunc(self.j - 1)
            w.extend("ic")
            self.k = self.j
            self._lookup()
            return
        if w[self.j] == "i":
            self._trunc(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            w.extend("ial")
            self.k = old_k
            self._lookup()

    def _ive(self):
        w = self.w
        old_k = self.k
        if not self._ends("ive"):
            return
        self._trunc(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        w.append("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._trunc(self.j + 1)
        w.extend("ive")
        if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "t":
            w[self.j - 1] = "e"
            self._trunc(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self._trunc(self.j - 1)
            if self._lookup():
                return
            w.extend("ative")
            self.k = old_k
        w[self.j + 2] = "o"
        w[self.j + 3] = "n"
        if self._lookup():
            return
        w[self.j + 2] = "v"
        w[self.j + 3] = "e"
        self.k = old_k

    # --------------------------------------------------------------- stem
    def stem(self, term: str) -> str:
        k = len(term) - 1
        if k <= 1 or k >= MAX_WORD_LEN - 1:
            return term
        entry = self.dict.get(term)
        if entry is not None:
            return entry[0] if entry[0] is not None else term
        if not re.fullmatch(r"[a-z]+", term):
            return term
        self.w = _JBuf(term)
        self.j = 0
        self.k = k
        self.matched = None
        for step in (self._plural, self._past_tense, self._aspect,
                     self._ity, self._ness, self._ion, self._er_or,
                     self._ly, self._al):
            step()
            if self.matched is not None:
                break
        else:
            self._word_in_dict()
            for step in (self._ive, self._ize, self._ment, self._ble,
                         self._ism, self._ic, self._ncy, self._nce):
                step()
                if self.matched is not None:
                    break
        entry = self.matched
        if entry is not None and entry[0] is not None:
            return entry[0]
        return self.w.text()
