"""CLI surface (python -m nlp_graphrag_with_qdrant_and_neo4j_ray ...)."""

import json


def test_cli_ingest_query_reset(ray_session, tmp_path, capsys):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.__main__ import main

    out = str(tmp_path / "kg")
    assert main(["ingest", "--pages", "synth:40", "--out", out]) == 0
    ingest_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ingest_out["tables"]["edges"] > 0

    assert main(["query", "Hugging Face", "--out", out, "--top-k", "3"]) == 0
    q_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(q_out["chunks"]) == 3

    assert main(["query", "Hugging Face", "--out", out, "--with-triplets"]) == 0
    t_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "triplets" in t_out

    cid = q_out["chunks"][0]["chunk_id"]
    assert main(["chain", "--out", out, "--chunk-id", cid,
                 "--max-chunks", "2"]) == 0
    c_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert any(r["chunk_id"] == cid for r in c_out)
    idxs = [r["chunk_index"] for r in c_out]
    assert idxs == sorted(idxs)

    assert main(["reset", "--out", out]) == 0
    import os

    assert not os.path.exists(out)


def test_cli_env_check(ray_session, capsys):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.__main__ import main

    assert main(["env-check"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["fixture_roundtrip"] is True
    assert info["cluster_cpus"] >= 1


def test_cli_merge(ray_session, tmp_path, capsys):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.__main__ import main

    a = str(tmp_path / "kga")
    b = str(tmp_path / "kgb")
    out = str(tmp_path / "merged")
    assert main(["ingest", "--pages", "synth:20", "--out", a]) == 0
    ja = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(["ingest", "--pages", "synth:30", "--out", b]) == 0
    jb = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert main(["merge", a, b, out]) == 0
    jm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # doc-keyed tables union exactly; keyed tables merge to >= max side
    assert jm["tables"]["chunks"] == (ja["tables"]["chunks"]
                                      + jb["tables"]["chunks"])
    assert jm["tables"]["edges"] >= max(ja["tables"]["edges"],
                                        jb["tables"]["edges"])
    assert jm["tables"]["edges"] <= (ja["tables"]["edges"]
                                     + jb["tables"]["edges"])


def test_cli_shards(ray_session, tmp_path, capsys):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.__main__ import main

    docs = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "shards")
    assert main(["shards", "--docs", docs, "--out", out,
                 "--n-shards", "4"]) == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["shard_id"] for r in manifest] == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in manifest) > 0
    # re-run resumes from footers and prints the identical manifest
    assert main(["shards", "--docs", docs, "--out", out,
                 "--n-shards", "4"]) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again == manifest
