import pandas as pd
import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.textstats import (
    bpe_ish_token_count,
    content_hash,
    detect_language,
    fingerprint64,
    quality_scores,
    ws_token_count,
)


def test_ws_token_count():
    assert ws_token_count("a b  c") == 3
    assert ws_token_count("") == 0
    assert ws_token_count("   ") == 0
    assert ws_token_count(" one ") == 1


def test_bpe_ish_token_count():
    assert bpe_ish_token_count("") == 0
    assert bpe_ish_token_count("hello world") == 2
    assert bpe_ish_token_count("don't stop") > 2  # contraction splits


def test_detect_language():
    assert detect_language("the cat and the dog of the house is in a tree") == "en"
    assert detect_language("der Hund und die Katze ist nicht in dem Haus") == "de"
    assert detect_language("xyz qqq zzz") == "und"
    assert detect_language("") == "und"


def test_quality_scores():
    good = quality_scores("The quick brown fox jumps over the lazy dog near the barn.")
    bad = quality_scores("@@@ ### $$$ 12345 ???")
    assert good["quality"] > bad["quality"]
    assert good["n_words"] == 12
    assert 0 <= good["quality"] <= 1


def test_fingerprint64():
    t = "one two three four five six seven eight nine ten"
    assert fingerprint64(t) == fingerprint64(t)
    assert fingerprint64(t) != fingerprint64(t.replace("three", "3"))
    assert fingerprint64("") == 0
    # local change flips some windows only
    assert fingerprint64("short text") != 0


def test_content_hash_stable():
    assert content_hash("x") == content_hash("x")
    assert len(content_hash("x")) == 32


def test_grouped_map_matches_naive_groupby(ray_session):
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.shuffle import (
        grouped_apply,
        grouped_map,
    )

    rows = [{"k": f"k{i % 17}", "v": i} for i in range(500)]
    ds = ray.data.from_items(rows)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "s": [int(g["v"].sum())]})

    got = {r["k"]: r["s"] for r in grouped_map(ds, ["k"], per_group, 8).take_all()}
    df = pd.DataFrame(rows)
    want = df.groupby("k")["v"].sum().to_dict()
    assert got == want

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.groupby("k", sort=True).agg(s=("v", "sum")).reset_index()

    got2 = {r["k"]: r["s"] for r in grouped_apply(ds, ["k"], per_partition, 8).take_all()}
    assert got2 == want


def test_grouped_map_empty_dataset(ray_session):
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.shuffle import grouped_map

    ds = ray.data.from_items([{"k": "a", "v": 1}]).filter(lambda r: False)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g

    assert grouped_map(ds, ["k"], per_group, 4).count() == 0


def test_multimodal_decode(ray_session):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.multimodal import (
        decode_images,
        synth_media_dataset,
    )

    out = decode_images(synth_media_dataset(32), feature_dim=16).take_all()
    assert len(out) == 32
    for r in out[:5]:
        assert r["width"] >= 16 and r["height"] >= 16
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
