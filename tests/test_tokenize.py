from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.tokenize import (
    STOPWORDS,
    ngrams,
    sent_tokenize,
    word_tokenize,
)


def test_sentence_split_basic():
    t = "First sentence. Second one! Third? Yes."
    assert sent_tokenize(t) == ["First sentence.", "Second one!", "Third?", "Yes."]


def test_sentence_split_abbreviations_and_initials():
    t = "Dr. Smith met Mr. Jones at Acme Inc. in Boston. J. K. Rowling wrote it."
    sents = sent_tokenize(t)
    assert sents == [
        "Dr. Smith met Mr. Jones at Acme Inc. in Boston.",
        "J. K. Rowling wrote it.",
    ]


def test_sentence_split_newlines_and_no_terminator():
    assert sent_tokenize("para one\n\npara two") == ["para one", "para two"]
    assert sent_tokenize("no terminator at all") == ["no terminator at all"]
    assert sent_tokenize("") == []


def test_sentence_split_lowercase_continuation():
    # lowercase after period → no boundary (web-text run-ons stay joined)
    assert sent_tokenize("It ran in 1984. the SDF-1 is fast.") == [
        "It ran in 1984. the SDF-1 is fast."
    ]


def test_word_tokenize():
    assert word_tokenize("Hugging Face, Inc. is U.S. based don't!") == [
        "Hugging", "Face", ",", "Inc", ".", "is", "U.S", ".", "based", "don't", "!",
    ]


def test_ngrams():
    toks = ["a", "b", "c", "d"]
    assert ngrams(toks, 2) == ["a b", "b c", "c d"]
    assert ngrams(toks, 3) == ["a b c", "b c d"]
    assert ngrams(["x"], 2) == []


def test_stopwords():
    assert "the" in STOPWORDS and "is" in STOPWORDS
    assert "company" not in STOPWORDS
