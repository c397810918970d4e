from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.triples import (
    extract_from_text,
    extract_triples_grammar,
    parse_triplet_output,
    sanitize_relation,
)


def test_parse_marker_format():
    out = parse_triplet_output(
        "<pad><triplet> Hugging Face <relation> founded by <object> Clement Delangue"
        "</triplet></s>"
    )
    assert out == [("Hugging Face", "founded by", "Clement Delangue")]


def test_parse_marker_multiple():
    out = parse_triplet_output(
        "<triplet>A<relation>r1<object>B</triplet><triplet>C<relation>r2<object>D</triplet>"
    )
    assert out == [("A", "r1", "B"), ("C", "r2", "D")]


def test_parse_marker_missing_parts_dropped():
    assert parse_triplet_output("<triplet>A<relation><object>B</triplet>") == []
    assert parse_triplet_output("<triplet><relation><object>") == []


def test_parse_two_space_fallback():
    assert parse_triplet_output("<pad> Apple  acquired  NeXT</s>") == [
        ("Apple", "acquired", "NeXT")
    ]
    # wrong arity → nothing
    assert parse_triplet_output("only  two") == []
    assert parse_triplet_output("") == []


def test_sanitize_relation():
    # defined-but-unused in the reference write path (SURVEY.md M6)
    assert sanitize_relation("founded by!") == "FOUNDED_BY"
    assert sanitize_relation("is-a") == "ISA"


def test_grammar_copula():
    assert extract_triples_grammar(
        "Hugging Face, Inc. is an American company based in New York City."
    ) == [("Hugging Face Inc", "is", "American company based in New York City")]


def test_grammar_passive_phrase():
    assert extract_triples_grammar(
        "The Vision of Escaflowne was directed by Kazuki Akane."
    ) == [("The Vision of Escaflowne", "was directed by", "Kazuki Akane")]


def test_grammar_year_strip_and_verb_truncation():
    assert extract_triples_grammar("Van Fanel founded Fanelia Works in 1996.") == [
        ("Van Fanel", "founded", "Fanelia Works")
    ]
    # run-on: object truncates before the next verb
    assert extract_triples_grammar(
        "Van founded Works in 1984. the SDF-1 is piloted by Rick."
    ) == [("Van", "founded", "Works in 1984 the SDF-1")]


def test_grammar_no_verb_or_empty_sides():
    assert extract_triples_grammar("the fast key order sort") == []
    assert extract_triples_grammar("Is that") == []
    assert extract_triples_grammar("That is") == []


def test_extract_from_text_sentence_indices():
    text = "Alice founded Acme. Bob leads Acme."
    got = extract_from_text(text)
    assert [(si, t[0]) for si, t in got] == [(0, "Alice"), (1, "Bob")]
