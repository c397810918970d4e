"""CLI parity with the reference's ``graphrag`` command
(/root/reference/graphrag/cli/main.py:311-359,447-500):

    python -m nlp_graphrag_with_qdrant_and_neo4j_ray ingest --pages <parquet-or-'synth:N'> --out <dir>
    python -m nlp_graphrag_with_qdrant_and_neo4j_ray query --out <dir> "<question>" [--with-context] [--with-triplets]
    python -m nlp_graphrag_with_qdrant_and_neo4j_ray reset --out <dir>
    python -m nlp_graphrag_with_qdrant_and_neo4j_ray env-check

``setup``/``reset`` map to output-dir lifecycle (S7/S8 — no live DBs);
``process`` → ``ingest``; ``query``/``interactive`` → ``query``.

This module OWNS a Ray session (guarded init + shutdown) — it is a CLI
entry point, not driver-imported library code.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys


def _ray():
    """Guarded session init; remembers whether WE started the session so
    the CLI never shuts down a session owned by an outer harness."""
    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ray._cli_owns_session = owns
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_ingest(args: argparse.Namespace) -> int:
    ray = _ray()
    from .pipelines.kg import build_kg
    from .sources.pages import pages_dataset

    if args.pages.startswith("synth:"):
        n = int(args.pages.split(":", 1)[1])
        factory = lambda: pages_dataset(n, "cli")  # noqa: E731
    elif args.pages.endswith((".warc", ".warc.gz", ".wet", ".wet.gz")) or (
        os.path.isdir(args.pages)
        and any(f.endswith((".warc", ".warc.gz", ".wet", ".wet.gz"))
                for f in os.listdir(args.pages))
    ):
        from .sources.warc import read_warc_as_pages

        factory = lambda: read_warc_as_pages(args.pages)  # noqa: E731
    else:
        import ray.data

        factory = lambda: ray.data.read_parquet(args.pages)  # noqa: E731
    tables = build_kg(factory, args.out, resume=not args.fresh)
    counts = {name: ds.count() for name, ds in tables.items()}
    print(json.dumps({"out": args.out, "tables": counts}))
    if getattr(ray, "_cli_owns_session", True):
        ray.shutdown()
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    ray = _ray()
    import ray.data

    from .pipelines import query as q
    from .stages.termindex import ensure_term_index

    tables = {
        name: ray.data.read_parquet(f"{args.out}/{name}")
        for name in ("chunks", "terms", "chunk_vectors", "edges")
    }
    # serving path: by-term index built lazily on first query of a KG dir
    term_index = ensure_term_index(
        args.out, tables["terms"],
        total_chunks=lambda: tables["chunks"].count(),
    )
    if args.with_triplets:
        res = q.hybrid_retrieve_with_triplets(
            tables["chunk_vectors"], term_index, tables["edges"],
            args.question, k=args.top_k,
        )
    else:
        hits = q.hybrid_retrieve(
            tables["chunk_vectors"], term_index, args.question, k=args.top_k
        )
        if args.with_context:
            res = {"chunks": q.with_context(tables["chunks"], hits,
                                            args.context_size)}
        else:
            res = {"chunks": hits}
    print(json.dumps(res, default=str))
    if getattr(ray, "_cli_owns_session", True):
        ray.shutdown()
    return 0


def cmd_interactive(args: argparse.Namespace) -> int:
    """REPL parity with the reference's interactive mode
    (cli/main.py:447-500): read a question per line, print hybrid hits."""
    ray = _ray()
    import ray.data

    from .pipelines import query as q

    from .stages.termindex import ensure_term_index

    tables = {
        name: ray.data.read_parquet(f"{args.out}/{name}")
        for name in ("terms", "chunk_vectors")
    }
    term_index = ensure_term_index(
        args.out, tables["terms"],
        # 1 vector row per chunk → chunk_vectors.count() is N for idf
        total_chunks=lambda: tables["chunk_vectors"].count(),
    )
    print("enter a question per line (blank line or EOF to quit)", flush=True)
    try:
        while True:
            try:
                line = input("query> ")
            except EOFError:
                break
            if not line.strip():
                break
            hits = q.hybrid_retrieve(
                tables["chunk_vectors"], term_index, line, k=args.top_k
            )
            print(json.dumps(hits), flush=True)
    finally:
        if getattr(ray, "_cli_owns_session", True):
            ray.shutdown()
    return 0


def cmd_chain(args: argparse.Namespace) -> int:
    """Document-chain walk (reference CLI chain inspection,
    core/retrieval.py:419-467): ±max-chunks around a chunk id."""
    ray = _ray()
    import ray.data

    from .pipelines import query as q

    chunks = ray.data.read_parquet(f"{args.out}/chunks")
    rows = q.get_document_chain(chunks, args.chunk_id, args.max_chunks)
    print(json.dumps(
        [{k: r[k] for k in ("chunk_id", "doc_id", "chunk_index", "text")}
         for r in rows],
        default=str,
    ))
    if getattr(ray, "_cli_owns_session", True):
        ray.shutdown()
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Publish built tables through a Sink (Parquet default; qdrant/neo4j
    when the client packages are installed — SURVEY.md §2.10 seam)."""
    ray = _ray()
    import ray.data

    from .sinks import make_sink

    kwargs = {}
    if args.sink == "parquet":
        kwargs["out_dir"] = args.target
    elif args.sink == "qdrant":
        kwargs["url"] = args.target
    else:
        kwargs["uri"] = args.target
    sink = make_sink(args.sink, **kwargs)
    results = [
        sink.write(name, ray.data.read_parquet(f"{args.out}/{name}"))
        for name in args.tables.split(",")
    ]
    print(json.dumps(results))
    if getattr(ray, "_cli_owns_session", True):
        ray.shutdown()
    return 0


def cmd_shards(args: argparse.Namespace) -> int:
    """Write deterministic, resumable training shards from a documents
    parquet (footer-manifest layout; re-runs recompute only missing
    shard files) and print the manifest."""
    ray = _ray()
    import ray.data

    from .pipelines.shards import write_training_shards

    manifest = write_training_shards(
        lambda: ray.data.read_parquet(args.docs).select_columns(
            [args.id_col, args.text_col]
        ),
        args.out,
        n_shards=args.n_shards,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    print(json.dumps(manifest.to_pylist()))
    if getattr(ray, "_cli_owns_session", True):
        ray.shutdown()
    return 0


def cmd_merge(args: argparse.Namespace) -> int:
    """Incremental update: merge two built KG dirs (base + increment)
    into a third without rebuilding — pipelines/kg.merge_kg semantics
    and exactness contract (see its docstring)."""
    ray = _ray()
    import ray.data

    from .pipelines.kg import merge_kg

    names = ("documents", "chunks", "terms", "term_nodes", "triples",
             "chunk_vectors", "entity_nodes", "edges")

    def load(d: str) -> dict:
        return {n: ray.data.read_parquet(f"{d}/{n}") for n in names
                if os.path.isdir(f"{d}/{n}")}

    merged = merge_kg(load(args.base), load(args.increment))
    counts = {}
    for name, ds in merged.items():
        path = os.path.join(args.out, name)
        os.makedirs(path, exist_ok=True)
        ds.write_parquet(path)
        counts[name] = ray.data.read_parquet(path).count()
    print(json.dumps({"out": args.out, "tables": counts}))
    if getattr(ray, "_cli_owns_session", True):
        ray.shutdown()
    return 0


def cmd_reset(args: argparse.Namespace) -> int:
    shutil.rmtree(args.out, ignore_errors=True)
    print(json.dumps({"reset": args.out}))
    return 0


def cmd_env_check(_args: argparse.Namespace) -> int:
    import numpy
    import pandas
    import pyarrow

    import ray

    info = {
        "ray": ray.__version__,
        "pyarrow": pyarrow.__version__,
        "pandas": pandas.__version__,
        "numpy": numpy.__version__,
    }
    ray_ = _ray()
    info["cluster_cpus"] = ray_.cluster_resources().get("CPU")
    from .sources.pages import page_row

    r = page_row("envcheck", 0)
    from .functions.html import extract_text

    info["fixture_roundtrip"] = extract_text(r["html"]) == r["text"]
    print(json.dumps(info))
    if getattr(ray_, "_cli_owns_session", True):
        ray_.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nlp_graphrag_with_qdrant_and_neo4j_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="build the KG from a pages parquet")
    pi.add_argument("--pages", required=True,
                    help="pages parquet path, a WARC/WET archive file or "
                         "directory, or synth:N for N fixture pages")
    pi.add_argument("--out", required=True)
    pi.add_argument("--fresh", action="store_true", help="ignore checkpoints")
    pi.set_defaults(fn=cmd_ingest)

    pq_ = sub.add_parser("query", help="query a built KG")
    pq_.add_argument("question")
    pq_.add_argument("--out", required=True)
    pq_.add_argument("--top-k", type=int, default=10)
    pq_.add_argument("--with-context", action="store_true")
    pq_.add_argument("--with-triplets", action="store_true")
    pq_.add_argument("--context-size", type=int, default=1)
    pq_.set_defaults(fn=cmd_query)

    pit = sub.add_parser("interactive", help="query REPL over a built KG")
    pit.add_argument("--out", required=True)
    pit.add_argument("--top-k", type=int, default=10)
    pit.set_defaults(fn=cmd_interactive)

    pc_ = sub.add_parser("chain", help="document-chain walk around a chunk id")
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--chunk-id", required=True)
    pc_.add_argument("--max-chunks", type=int, default=5)
    pc_.set_defaults(fn=cmd_chain)

    px = sub.add_parser("export", help="publish built tables through a sink")
    px.add_argument("--out", required=True, help="built KG dir")
    px.add_argument("--sink", choices=["parquet", "qdrant", "neo4j"],
                    default="parquet")
    px.add_argument("--target", required=True,
                    help="dir (parquet) / url (qdrant) / bolt uri (neo4j)")
    px.add_argument("--tables", default="chunks,terms,edges")
    px.set_defaults(fn=cmd_export)

    ps = sub.add_parser(
        "shards", help="write resumable training shards from a "
                       "documents parquet")
    ps.add_argument("--docs", required=True, help="documents parquet path")
    ps.add_argument("--out", required=True, help="shard output dir")
    ps.add_argument("--n-shards", type=int, default=8)
    ps.add_argument("--id-col", default="doc_id")
    ps.add_argument("--text-col", default="text")
    ps.set_defaults(fn=cmd_shards)

    pm = sub.add_parser(
        "merge", help="merge a KG increment into a base KG (additive)")
    pm.add_argument("base")
    pm.add_argument("increment")
    pm.add_argument("out")
    pm.set_defaults(fn=cmd_merge)

    pr = sub.add_parser("reset", help="delete an output dir (S8 parity)")
    pr.add_argument("--out", required=True)
    pr.set_defaults(fn=cmd_reset)

    pe = sub.add_parser("env-check", help="verify_setup.py parity")
    pe.set_defaults(fn=cmd_env_check)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
