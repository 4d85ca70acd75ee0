"""Unit cases for the reference-profile tokenizer rules (SURVEY §2.2,
hand-derived from Part C/parser_module.py semantics)."""

from searchengine_ray.functions.reference_tokenizer import ReferenceTokenizer

TOK = ReferenceTokenizer()


def counts(text):
    c, _ = TOK.parse_sentence(text)
    return c


def test_rt_and_brackets_removed():
    c = counts("RT hello [world] again RT again")
    assert "RT" not in c and "rt" not in c
    assert c["world"] == 1 and c["hello"] == 1


def test_stopwords_and_single_chars_dropped():
    c = counts("the a I x yes maybe")
    assert "the" not in c and "a" not in c and "x" not in c
    assert c["yes"] == 1 and c["maybe"] == 1


def test_case_preserved():
    c = counts("Apple banana APPLE")
    assert c == {"Apple": 1, "banana": 1, "APPLE": 1}


def test_hashtag_camelcase_split():
    c = counts("#StayHome now")
    assert c["stay"] == 1 and c["home"] == 1 and c["#stayhome"] == 1


def test_hashtag_acronym_kept_whole():
    c = counts("#WHO announcement")
    assert c["#WHO"] == 1 and c["WHO"] == 1


def test_mention_kept_verbatim():
    c = counts("thanks @who for info")
    assert c["@who"] == 1


def test_url_parsed_excludes_boilerplate():
    c = counts("see https://www.example.org/covid/stats here")
    assert c["example.org"] == 1 and c["covid"] == 1 and c["stats"] == 1
    assert "https" not in c and "www.example.org" not in c


def test_tco_urls_dropped():
    c = counts("link https://t.co/abc123 end")
    assert all("t.co" not in k and "abc" not in k for k in c)


def test_number_multiplier_words():
    assert counts("about 35 Thousand cases")["35K"] == 1
    assert counts("over 3 Million doses")["3M"] == 1
    assert counts("grew 12 percent today")["12%"] == 1


def test_plain_number_abbreviation():
    # plain numbers use the reference's float-division form (parser_module.py:474-486)
    assert "2.02K" in counts("year 2020 review")
    assert "1.234567M" in counts("exactly 1234567 items")
    assert "123" in counts("only 123 left")


def test_decimal_and_percent_tokens():
    c = counts("rate 10.6 and 12% overall")
    assert c["10.6"] == 1 and c["12%"] == 1


def test_date_tokens():
    c = counts("back in Jun 2020 and January 2021")
    assert c["jun 2020"] == 1 and c["january 2021"] == 1


def test_covid_normalization():
    for form in ("covid-19", "COVID-19", "Covid-19", "covid19", "covid_19"):
        assert counts(f"news about {form} today").get("covidYear") == 1, form


def test_curse_masked():
    c = counts("what the f**k dude")
    assert c["*CENSORED*"] == 1


def test_tweet_id_removed():
    c = counts("id 1234567890123456789 trailing")
    assert all("123456789" not in k for k in c)


def test_slash_words_split():
    c = counts("corona/people problem")
    assert c["corona"] == 1 and c["people"] == 1


def test_entities_detected():
    c, ents = TOK.parse_sentence("Donald Trump visited New York yesterday")
    assert ents == {"Donald Trump", "New York"}
    assert c["Donald Trump"] == 1 and c["Donald"] == 1 and c["Trump"] == 1


def test_entity_stopword_excluded():
    _, ents = TOK.parse_sentence("The Storm passed While Ago")
    assert "The Storm" not in ents


def test_empty_inputs():
    assert counts(None) == {}
    assert counts("[]") == {}
    assert counts("") == {}
