from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.chunk import chunk_text, extract_ngrams
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.tokenize import word_tokenize


def test_empty_text():
    assert chunk_text("", 200) == []


def test_greedy_packing_flush_before_append():
    # Reference rule (core/ingest.py:84-94): flush when the incoming
    # sentence would overflow a NON-EMPTY chunk, then append it.
    s1 = "One two three four five."  # 6 tokens incl. period
    s2 = "Six seven eight nine ten."
    chunks = chunk_text(f"{s1} {s2}", max_tokens=8)
    assert [c[0] for c in chunks] == [s1, s2]
    assert [c[1] for c in chunks] == [6, 6]


def test_single_long_sentence_forms_chunk():
    words = " ".join(f"w{i}" for i in range(300))
    text = f"Sentence about {words} end."
    chunks = chunk_text(text, max_tokens=200)
    assert len(chunks) == 1  # one sentence > max_tokens still forms a chunk
    assert chunks[0][1] == len(word_tokenize(text))


def test_joined_with_single_space():
    chunks = chunk_text("A b. C d.", max_tokens=200)
    assert chunks == [("A b. C d.", 6)]


def test_ngram_semantics_bigrams_from_unfiltered_tokens():
    uni, bi, tri = extract_ngrams("The cat sat on the mat", remove_stopwords=True)
    # unigrams: lowercased alnum tokens minus stopwords
    assert uni == ["cat", "sat", "mat"]
    # bigrams/trigrams: from the UNFILTERED lowercased token list
    assert bi[0] == "the cat" and "on the" in bi
    assert tri[0] == "the cat sat"


def test_ngram_keep_stopwords():
    uni, _, _ = extract_ngrams("The cat", remove_stopwords=False)
    assert uni == ["the", "cat"]


def test_ngram_isalnum_filter():
    uni, bi, _ = extract_ngrams("cats, dogs & birds!", remove_stopwords=True)
    assert uni == ["cats", "dogs", "birds"]
    assert bi == ["cats dogs", "dogs birds"]
