"""The production decode→parse path: a marker-format model run through
the full pipeline must produce the same triples as the structured model
(M5 exercised inside the DAG, not just in unit tests)."""

from nlp_graphrag_with_qdrant_and_neo4j_ray.config import PipelineConfig
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.triples import (
    MarkerEchoTripletModel,
    extract_triples_grammar,
    render_marker_output,
)


def test_render_parse_roundtrip():
    from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.triples import (
        parse_triplet_output,
    )

    tr = [("Hugging Face", "founded by", "Clement"), ("A", "r", "B")]
    assert parse_triplet_output(render_marker_output(tr)) == tr
    assert parse_triplet_output(render_marker_output([])) == []


def test_marker_model_equals_grammar():
    m = MarkerEchoTripletModel()
    sents = [
        "Hugging Face, Inc. is an American company based in New York City.",
        "The Vision of Escaflowne was directed by Kazuki Akane.",
        "no verbs here at all",
    ]
    assert m.extract(sents) == [extract_triples_grammar(s) for s in sents]


def test_marker_pipeline_equals_grammar_pipeline(ray_session, tmp_path):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.kg import build_kg
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.pages import pages_dataset

    def triples(cfg, name):
        out = build_kg(lambda: pages_dataset(40, "mk"), str(tmp_path / name),
                       cfg, resume=False, lineage=False)
        return {
            (r["chunk_id"], r["sent_index"], r["subj"], r["pred"], r["obj"])
            for r in out["triples"].take_all()
        }

    a = triples(PipelineConfig(triplet_model="grammar"), "g")
    b = triples(PipelineConfig(triplet_model="marker-echo"), "m")
    assert a == b and a
