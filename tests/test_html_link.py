import numpy as np

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.embed import HashingEmbedder
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.html import (
    decode_html,
    extract_text,
    render_html,
)
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.link import (
    build_alias_dict,
    canonical_key,
    entity_id_for,
    merge_similar_keys,
)
from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.pages import page_row


def test_html_roundtrip_fixture_rows():
    for i in range(110):  # covers every edge-case slot at least once
        r = page_row("t", i)
        assert extract_text(r["html"]) == r["text"], i


def test_html_escaping_roundtrip():
    text = 'Salt & pepper <tags> are "escaped".\n\nSecond ¶ paragraph é.'
    assert extract_text(render_html("d", text)) == text


def test_latin1_fallback():
    assert decode_html("Café".encode("latin-1")) == "Café"
    assert decode_html("Café".encode("utf-8")) == "Café"


def test_generic_html_strip():
    raw = b"<html><body><div>Hello <b>world</b></div><script>var x=1;</script></body></html>"
    assert extract_text(raw) == "Hello world"


def test_canonical_key():
    assert canonical_key("Hugging Face, Inc.") == "hugging face"
    assert canonical_key("HUGGING FACE") == "hugging face"
    assert canonical_key("the United States") == "united states"
    assert canonical_key("The The") == "the"  # article strip is single-shot
    assert entity_id_for("x") == "e:x"


def test_alias_dict_exact_merge():
    emb = HashingEmbedder(64)
    d = build_alias_dict(
        ["HUGGING FACE", "hugging face", "Hugging Face, Inc.", "tokyo"], emb
    )
    ids = {d[n][0] for n in ("HUGGING FACE", "hugging face", "Hugging Face, Inc.")}
    assert ids == {"e:hugging face"}
    assert d["tokyo"][0] == "e:tokyo"


def test_merge_similar_keys_deterministic_and_thresholded():
    emb = HashingEmbedder(64)
    keys = sorted(["acme corp x", "acme corp x y", "zeta"])
    vecs = np.asarray(emb.encode(keys))
    m1 = merge_similar_keys(keys, vecs, threshold=0.8)
    m2 = merge_similar_keys(keys, vecs, threshold=0.8)
    assert m1 == m2
    # high threshold → no merge
    assert merge_similar_keys(keys, vecs, threshold=0.999) == {}
