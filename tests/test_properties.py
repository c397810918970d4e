"""Property-based invariants (hypothesis) for the semantic core."""

from hypothesis import given, settings
from hypothesis import strategies as st

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.chunk import chunk_text
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.dedup import (
    hamming64,
    jaccard,
    shingles,
    simhash64,
)
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.html import extract_text, render_html
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.link import canonical_key
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.tokenize import (
    sent_tokenize,
    word_tokenize,
)
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.triples import (
    extract_triples_grammar,
    parse_triplet_output,
)

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_parser_never_raises(s):
    out = parse_triplet_output(s)
    assert isinstance(out, list)
    for t in out:
        assert len(t) == 3 and all(isinstance(x, str) and x for x in t)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_tokenizers_total(s):
    # tokenizing never raises; sentence pieces re-tokenize to the same
    # word stream as the whole (per-block, whitespace-normalized)
    sents = sent_tokenize(s)
    assert all(x.strip() == x and x for x in sents)
    words_whole = [w for block in s.split("\n") for w in word_tokenize(block.strip())]
    words_sents = [w for sent in sents for w in word_tokenize(sent)]
    assert words_sents == words_whole


@settings(max_examples=100, deadline=None)
@given(text_strategy, st.integers(min_value=1, max_value=50))
def test_chunker_conserves_sentences(s, max_tokens):
    chunks = chunk_text(s, max_tokens)
    # every sentence lands in exactly one chunk, in order
    rejoined = " ".join(c for c, _n in chunks)
    assert rejoined == " ".join(sent_tokenize(s))
    # token counts are the sentence-token totals
    assert sum(n for _c, n in chunks) == sum(
        len(word_tokenize(x)) for x in sent_tokenize(s)
    )


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefg ABCDEFG.,'-", max_size=120))
def test_canonical_key_idempotent(s):
    k = canonical_key(s)
    assert canonical_key(k) == k


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_grammar_extractor_never_raises(s):
    for t in extract_triples_grammar(s):
        assert all(part for part in t)


@settings(max_examples=50, deadline=None)
@given(text_strategy)
def test_html_roundtrip_property(s):
    # any text without the paragraph separator round-trips exactly;
    # texts WITH it round-trip modulo paragraph-boundary normalization
    if "\n\n" not in s:
        assert extract_text(render_html("d", s)) == s
    else:
        assert extract_text(render_html("d", s)) == "\n\n".join(s.split("\n\n"))


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_simhash_jaccard_sane(a, b):
    assert 0 <= hamming64(simhash64(a), simhash64(b)) <= 64
    j = jaccard(shingles(a), shingles(b))
    assert 0.0 <= j <= 1.0
    assert jaccard(shingles(a), shingles(a)) == 1.0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0,
                max_size=50))
def test_popcount64_matches_python(vals):
    import numpy as np

    from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.dedup import popcount64

    arr = np.array(vals, dtype=np.uint64)
    got = popcount64(arr)
    assert list(got) == [bin(v).count("1") for v in vals]


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=400), st.integers(min_value=1,
                                                            max_value=64))
def test_capped_subgroups_partitions_exactly(n, cap):
    import pandas as pd

    from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.dedup import (
        capped_subgroups,
    )

    g = pd.DataFrame({"doc_id": range(n)})
    subs = list(capped_subgroups(g, "doc_id", max_bucket=cap))
    all_ids = sorted(i for s in subs for i in s["doc_id"])
    assert all_ids == list(range(n))  # exact partition, no loss/dup
    if n > cap:
        assert len(subs) > 1
