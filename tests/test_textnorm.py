"""Frozen normalizer/tokenizer semantics (SURVEY.md F1/F2, §7.0)."""

from information_retrieval_project_spark.functions.textnorm import (
    STOPWORDS,
    clean_normalize,
    normalize_tokenize,
    porter_stem,
    tokenize,
)


def test_symbol_replacement_and_lower():
    # the 13 reference symbols (data_manager.py:75-77) become spaces
    out = clean_normalize("A,B.C;(D)?E!F&G%H:I*J\"K-L", stopwords=False)
    # without the stopword split/rejoin the reference keeps raw spacing too
    assert out.split() == list("abcdefghijkl")


def test_stopword_removal():
    out = clean_normalize("the quick brown fox is a fox", stopwords=True)
    assert "the" not in out.split() and "is" not in out.split()
    assert "quick" in out.split()


def test_punctuation_strip_keeps_underscore():
    assert clean_normalize("foo_bar(baz)#@!", stopwords=False).split() == [
        "foo_bar",
        "baz",
    ]


def test_tokenize_strategies():
    text = "Def parse_config(x1): return x1 + 2"
    assert "parse_config" in tokenize(text, "code")
    assert "x1" in tokenize(text, "code")
    assert "parse_config" not in tokenize(text, "gensim")  # alpha runs only
    assert tokenize(text, "keras")  # whitespace chunks


def test_porter_known_pairs():
    # classic published examples of the Porter algorithm
    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "motoring": "motor",
        "conflated": "conflat",
        "happy": "happi",
        "relational": "relat",
        "rational": "ration",
        "hopeful": "hope",
        "goodness": "good",
        "adjustable": "adjust",
        "probate": "probat",
        "cease": "ceas",
        "controll": "control",
    }
    for w, s in cases.items():
        assert porter_stem(w) == s, (w, porter_stem(w), s)


def test_normalize_tokenize_deterministic():
    t = "Import numpy; def handle_request(req): RETURN req.Value"
    a = normalize_tokenize(t)
    assert a == normalize_tokenize(t)
    assert a[0] == "import"


def test_stopwords_frozen_size():
    assert len(STOPWORDS) > 80  # frozen list is non-trivial and checked in
