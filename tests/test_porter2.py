"""Porter2 stemmer conformance against known pairs from the official
Snowball English sample vocabulary (snowballstem.org)."""

from searchengine_ray.functions.porter2 import stem

# (word, expected Porter2 stem) — drawn from the published algorithm
# description and its worked examples
KNOWN = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "tie"),
    ("cries", "cri"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("gas", "gas"),
    ("this", "this"),
    ("kiwis", "kiwi"),
    # 1a exceptions
    ("inning", "inning"),
    ("innings", "inning"),
    ("proceed", "proceed"),
    ("news", "news"),
    ("sky", "sky"),
    # step 1b
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("hoping", "hope"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    # exceptional forms
    ("dying", "die"),
    ("lying", "lie"),
    ("tying", "tie"),
    ("early", "earli"),
    ("only", "onli"),
    # step 1c
    ("happy", "happi"),
    ("crying", "cri"),
    ("by", "by"),
    ("say", "say"),
    # steps 2-5
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("hesitanci", "hesit"),
    ("digitizer", "digit"),
    ("conformabli", "conform"),
    ("radicalli", "radic"),
    ("differentli", "differ"),
    ("vileli", "vile"),
    ("analogousli", "analog"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"),
    ("formative", "format"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "communism"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5 / regions
    ("generate", "generat"),
    ("generously", "generous"),
    ("arsenic", "arsenic"),
    ("cease", "ceas"),
    ("white", "white"),
    ("controll", "control"),
    ("roll", "roll"),
]


def test_known_pairs():
    bad = [(w, e, stem(w)) for w, e in KNOWN if stem(w) != e]
    assert not bad, bad


def test_idempotent_and_short():
    for w, _ in KNOWN:
        s = stem(w)
        assert stem(s) == stem(s)  # deterministic
    assert stem("a") == "a"
    assert stem("ab") == "ab"
    assert stem("") == ""
    assert stem("'cause") == "caus"
