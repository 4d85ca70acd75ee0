"""Reference-profile tokenizer — a fresh implementation of the rule set
of the reference parser (``Part C/parser_module.py:70-239`` and the rule
functions at :293-534).  NOT a copy: rules are re-implemented from their
observed semantics, with documented deviations where the original is
order-dependent or buggy:

- curse masking (P4, parser_module.py:316-321,494-499): the reference
  discards the ``str.replace`` result so masking is a no-op; we apply it
  as intended (tokens become ``*CENSORED*``, counted in n_curses per
  ``indexer.py:44-45``).
- entity rule (P15, :501-534): the reference adds an entity term only to
  the docs seen *after* the first (sequential state); we emit every
  candidate flagged ``is_entity`` and the index merge keeps entities with
  df ≥ 2 (order-free; includes the first doc — strictly better recall).
- entity stopword check (:516) compares one side unlowered; we lower both.
- case is preserved on tokens; the capital-letter folding (I2,
  ``indexer.py:126-150``) happens order-free at index-merge time.

All regexes are compiled once per instance — the tokenize stage holds one
instance per actor.
"""

from __future__ import annotations

import re
import string

from .stopwords import STOPWORDS_EN

_PUNC = (
    string.punctuation.replace("%", "").replace("@", "").replace("#", "").replace("*", "")
    + "”“•\n"
)  # parser_module.py:18-19
_PUNC_NO_SLASH = set(_PUNC) - {"/"}
_ASCII_PRINTABLE = set(string.printable)

_MONTHS_SHORT = "jan feb mar apr may jun jul aug sep oct nov dec".split()
_MONTHS_FULL = (
    "january february march april may june july august september october november december"
).split()

_NUMBER_MULT = {"thousand": 1000, "million": 1000000, "billion": 1000000000}
_PERCENT_WORDS = {"percent", "percents", "percentage", "percentages"}

_COVID_MAP = {  # parser_module.py:55-66
    "covid-19": "covidYear",
    "covid19": "covidYear",
    "covid_19": "covidYear",
}

_URL_EXCLUDED = {"t.co", "https", "http", "html", "t", "twitter.com", "web", "status", "etc"}


class ReferenceTokenizer:
    def __init__(self, stemming: bool = False, lemmatization: bool = False):
        # P17: the reference lemmatizes per token with spaCy
        # (parser_module.py:226-237, stem has PRIORITY over lemma);
        # spaCy is absent from this container, so the vendored
        # morphy-style rule lemmatizer stands in (functions/
        # lemmatizer.py — the Porter2/P16 precedent, adaptations
        # documented there)
        self.stemming = stemming
        self.lemmatization = lemmatization and not stemming
        self.re_curse = re.compile(r"[a-zA-Z]\*+[a-zA-Z]*")
        self.re_tweet_id = re.compile(r"\d{19,20}")
        self.re_special = re.compile(
            r"#\w+-\d+|#\w+|@\w+-\d+|@\w*|https?://[^\s]+"
        )
        self.re_covid = re.compile(r"[Cc][Oo][Vv][Ii][Dd][-_]?(?:19)?")
        self.re_date = re.compile(
            r"(?i)\b(" + "|".join(_MONTHS_FULL + _MONTHS_SHORT) + r")\s([0-9]{2,4})\b"
        )
        self.re_number_mult = re.compile(
            r"\b(\d+(?:\.\d+)?)\s+(thousand|million|billion|percent(?:age)?s?)\b",
            re.IGNORECASE,
        )
        self.re_fraction = re.compile(r"\b(\d+)\s+(\d+/\d+)\b")
        self.re_number = re.compile(r"[+-]?\d+\.\d*%?|\.\d+|\d+%|\d+")
        self.re_url_token = re.compile(r"[\w'+.]+")
        self.re_hashtag_parts = re.compile(r"[a-zA-Z][^A-Z_]*")
        self.re_entity_word = re.compile(r"[A-Z][A-Za-z’'-]*")
        self.re_dots = re.compile(r"[…]+")
        # P8 char filter (keep ASCII-printable minus punctuation): ASCII
        # words take a str.translate deletion table; the regex whitelist
        # handles words with non-ASCII chars — both C-level, no
        # per-character Python loop
        allowed = "".join(sorted(_ASCII_PRINTABLE - _PUNC_NO_SLASH))
        self.re_strip = re.compile(f"[^{re.escape(allowed)}]")
        self._strip_tbl = {
            i: None
            for i in range(128)
            if chr(i) in _PUNC_NO_SLASH or chr(i) not in _ASCII_PRINTABLE
        }
        if stemming:
            from .porter2 import Porter2Stemmer

            self._stemmer = Porter2Stemmer()
        else:
            self._stemmer = None

    # ------------------------------------------------------------------
    def parse_sentence(self, text) -> tuple[dict[str, int], set[str]]:
        """→ ({term: tf}, entity_candidate_terms)."""
        if text is None or text == "[]" or not isinstance(text, str):
            return {}, set()
        # P3: retweet markers + brackets (parser_module.py:94-96)
        text = text.replace(" RT ", " ")
        if text.startswith("RT "):
            text = text[3:]
        text = text.replace("[", "").replace("]", "")
        # P4: curse masking (intended semantics)
        text = self.re_curse.sub("*CENSORED*", text)
        # P5: tweet-id removal (:307-312)
        text = self.re_tweet_id.sub("", text)
        # P6: pull special tokens out of the text (:346-355)
        specials = self.re_special.findall(text)
        for w in specials:
            text = text.replace(w, " ")
        # P7: covid normalization (:293-305)
        text = self.re_covid.sub(self._covid_sub, text)

        counts: dict[str, int] = {}

        # P9/P10 number rules — collect canonical tokens and words
        # consumed (single finditer pass per rule; spans reused below)
        number_tokens: list[str] = []
        consumed: list[str] = []
        covered = set()
        for m in self.re_number_mult.finditer(text):
            num, word = m.group(1), m.group(2).lower()
            consumed += [m.group(1), m.group(2)]
            number_tokens.append(self._abbrev_mult(num, word))
            covered.add(m.span())
        for m in self.re_fraction.finditer(text):
            consumed += [m.group(1), m.group(2)]
            number_tokens.append(f"{m.group(1)} {m.group(2)}")
            covered.add(m.span())
        for m in self.re_number.finditer(text):
            if any(s <= m.start() and m.end() <= e for s, e in covered):
                continue
            number_tokens.append(self._abbrev_plain(m.group(0)))
            consumed.append(m.group(0))

        # P11 dates (:323-344) — extra tokens, nothing consumed
        date_tokens = [
            f"{m.group(1).lower()} {m.group(2)}" for m in self.re_date.finditer(text)
        ]

        # P8: whitespace pass (:111-143)
        queue = text.split()
        qi = 0
        while qi < len(queue):
            word = queue[qi]
            qi += 1
            if "…" in word or len(word) == 1:
                continue
            if word.isascii():
                word = word.translate(self._strip_tbl)
            else:
                word = self.re_strip.sub("", word)
            if not word or len(word) == 1 or "…" in word:
                continue
            if word == "*CENSORED*":
                counts[word] = counts.get(word, 0) + 1
                continue
            low = word.lower()
            if low in STOPWORDS_EN or word[0] in "#@" or word[:2] in ("ht", "ww"):
                continue
            if "/" in word:
                queue.extend(word.split("/"))
                continue
            if low in _COVID_MAP:
                word = _COVID_MAP[low]
            counts[word] = counts.get(word, 0) + 1

        # P10 third step: decrement words consumed by number rules (:151-159)
        for w in consumed:
            for cand in (w, w.lower()):
                if cand in counts:
                    if counts[cand] > 1:
                        counts[cand] -= 1
                    else:
                        del counts[cand]
                    break

        # P12-P14: parse the extracted special tokens (:161-171)
        generated: list[str] = []
        for sp in specials:
            if sp.startswith("#"):
                self._hashtag(sp, generated)
            elif sp.startswith("@"):
                if len(sp) > 1:
                    generated.append(sp)
            else:
                self._url(sp, generated)
        generated.extend(number_tokens)

        for w in generated:
            w = w.strip("\n")
            if not w or len(w) == 1:
                continue
            if w.lower() in _COVID_MAP:
                w = _COVID_MAP[w.lower()]
            counts[w] = counts.get(w, 0) + 1

        for d in date_tokens:
            if len(d) > 1:
                counts[d] = counts.get(d, 0) + 1

        # P15 entity candidates (:501-534) — flagged, filtered at merge
        entities: set[str] = set()
        ent_words = list(self.re_entity_word.finditer(text))
        for a, b in zip(ent_words, ent_words[1:]):
            if b.start() - a.end() != 1:
                continue
            wa, wb = a.group(0), b.group(0)
            if wa.lower() in STOPWORDS_EN or wb.lower() in STOPWORDS_EN:
                continue
            if len(wa) == 1 and len(wb) == 1:
                continue
            term = f"{wa}{text[a.end()]}{wb}"
            entities.add(term)
            counts[term] = counts.get(term, 0) + 1

        if self._stemmer is not None:
            stemmed: dict[str, int] = {}
            for w, c in counts.items():
                sw = w if w in entities else self._stemmer.stem(w)
                stemmed[sw] = stemmed.get(sw, 0) + c
            # entity surface forms are preserved under stemming
            counts = stemmed
        elif self.lemmatization:
            # P17 (parser_module.py:226-237): lemmatize each token key,
            # re-accumulating counts on the lemma.  Entity surfaces are
            # preserved, mirroring the stemming path's treatment.
            from .lemmatizer import lemmatize

            lemmed: dict[str, int] = {}
            for w, c in counts.items():
                lw = w if w in entities else lemmatize(w)
                lemmed[lw] = lemmed.get(lw, 0) + c
            counts = lemmed
        return counts, entities

    # ------------------------------------------------------------------
    @staticmethod
    def _covid_sub(m: re.Match) -> str:
        low = m.group(0).lower()
        return "covidYear" if low in _COVID_MAP else m.group(0)

    @staticmethod
    def _abbrev_mult(num: str, word: str) -> str:
        """'123 Thousand' → '123K' (parser_module.py:442-461 multiplier path)."""
        word = word.lower()
        if word in _PERCENT_WORDS:
            return f"{num}%"
        value = float(num) * _NUMBER_MULT[word.rstrip("s")]
        s = str(int(value)) if value == int(value) else str(value)
        if len(s) < 4 or "." in s:
            return s
        if len(s) <= 6:
            return s[:-3] + "K"
        if len(s) <= 9:
            return s[:-6] + "M"
        return s[:-9] + "B"

    @staticmethod
    def _abbrev_plain(tok: str) -> str:
        """Plain numbers (parser_module.py:474-486 KeyError path): float-
        divided form, e.g. 35000 → '35.0K'."""
        if "%" in tok or "." in tok or "+" in tok or "-" in tok:
            return tok
        try:
            n = int(tok)
        except ValueError:
            return tok
        s = str(n)
        if len(s) < 4:
            return s
        if len(s) <= 6:
            return f"{n / 1000}K"
        if len(s) <= 9:
            return f"{n / 1000000}M"
        return f"{n / 1000000000}B"

    def _hashtag(self, tag: str, out: list[str]) -> None:
        """#CamelCase_tag → components lowercased + the full tag
        (parser_module.py:376-390)."""
        if len(tag) == 2 or (len(tag) > 2 and tag[1].isupper() and tag[2].isupper()):
            out.append(tag)
            out.append(tag[1:])
            return
        out.extend(w.lower() for w in self.re_hashtag_parts.findall(tag))
        out.append(tag[0] + tag[1:].lower())

    def _url(self, url: str, out: list[str]) -> None:
        """URL → host + path tokens, t.co and boilerplate dropped
        (parser_module.py:399-417)."""
        if "t.co" in url:
            return
        for w in self.re_url_token.findall(url):
            if w in _URL_EXCLUDED:
                continue
            if w.startswith("www."):
                out.append(w[4:])
            else:
                out.append(w)


# P16 stemming: full Porter2 (Snowball English) — see functions/porter2.py
# (replaces the round-1 _SnowballLite suffix stripper; the reference uses
# NLTK's SnowballStemmer, Part C/stemmer.py:4-14, which IS Porter2)
