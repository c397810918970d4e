"""Per-stage Parquet checkpoints with atomic publish + resume.

The reference has no checkpointing (a crash re-processes everything,
converging only via Cypher MERGE idempotency — SURVEY.md §4.1). Here each
stage's output table is a directory published atomically: write to
``<name>.__tmp__``, rename to ``<name>``, then drop a ``_SUCCESS`` marker.
On resume a stage whose ``_SUCCESS`` exists is loaded with
``read_parquet`` instead of recomputed, so a failed run skips finished
stages (per-partition skip within a stage comes from the partitioned
file layout + idempotent overwrite of the stage directory).
"""

from __future__ import annotations

import os
import shutil
import sys
import types
from collections.abc import Callable


def _pin_fsspec_http_module() -> None:
    """Make ``fsspec.implementations.http`` importable, thread-safely.

    Without aiohttp the module raises ModuleNotFoundError on every import
    attempt; Ray's ``_is_http_filesystem`` tolerates that — but when two
    driver threads call ``write_parquet`` concurrently, the failing import
    races and surfaces as a bare ``ImportError`` ("cannot import name
    'HTTPFileSystem'") that Ray does NOT catch. Registering a placeholder
    module with a never-instantiated HTTPFileSystem class makes the import
    succeed deterministically; Ray's isinstance check then simply returns
    False, which is the correct semantics here (local filesystem only).
    """
    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # placeholder; nothing ever instantiates it
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
    except ImportError:
        pass


_pin_fsspec_http_module()


SUCCESS = "_SUCCESS"


def table_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, name)


def is_complete(out_dir: str, name: str) -> bool:
    return os.path.exists(os.path.join(out_dir, name, SUCCESS))


def _publish(ds, path: str, write_kwargs: dict | None) -> None:
    """Write ``ds`` to ``path`` atomically (tmp dir → rename → _SUCCESS)."""
    tmp = path + ".__tmp__"
    for stale in (tmp, path):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    ds.write_parquet(tmp, **(write_kwargs or {}))
    # an all-empty dataset writes no files (and possibly no directory);
    # publish an explicit zero-row file so the checkpoint stays readable
    # with a stable schema
    os.makedirs(tmp, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
        import pyarrow.parquet as pq

        schema = ds.schema()
        arrow_schema = getattr(schema, "base_schema", None) if schema else None
        if arrow_schema is not None:
            pq.write_table(arrow_schema.empty_table(), os.path.join(tmp, "empty.parquet"))
    os.rename(tmp, path)
    with open(os.path.join(path, SUCCESS), "w") as f:
        f.write("ok")


def checkpointed(
    out_dir: str,
    name: str,
    compute: Callable[[], "ray.data.Dataset"],  # noqa: F821
    resume: bool = True,
    write_kwargs: dict | None = None,
):
    """Return a Dataset for table ``name``, recomputing only if needed.

    ``compute`` must return the (lazy) Dataset to materialize. The write
    streams through ``write_parquet`` (no driver materialization).
    """
    import ray.data

    path = table_path(out_dir, name)
    marker = os.path.join(path, SUCCESS)
    if resume and os.path.exists(marker):
        return ray.data.read_parquet(path)

    ds = compute()
    _publish(ds, path, write_kwargs)
    return ray.data.read_parquet(path)


def checkpointed_passthrough(
    out_dir: str,
    name: str,
    compute: Callable[[], "ray.data.Dataset"],  # noqa: F821
    resume: bool = True,
    write_kwargs: dict | None = None,
):
    """Like :func:`checkpointed`, but takes the checkpoint I/O off the
    stage's critical path: the stage materializes in the OBJECT STORE
    (spill-backed) and is handed to downstream consumers immediately,
    while a background thread streams the Parquet publish from the
    cached blocks.

    Returns ``(ds, finalize)``. ``finalize()`` must be called before the
    build returns: it joins the publish thread, re-raises any publish
    failure, and returns a disk-backed ``read_parquet`` Dataset so the
    object-store pin can be released (on the resume path it is a no-op
    returning the same Dataset). Correctness contract: a consumer that
    observed the in-memory Dataset and a resumed run that reads the
    checkpoint see identical rows — same blocks, one ``write_parquet``.
    """
    import threading

    import ray.data

    path = table_path(out_dir, name)
    marker = os.path.join(path, SUCCESS)
    if resume and os.path.exists(marker):
        ds = ray.data.read_parquet(path)
        return ds, (lambda: ds)

    ds = compute().materialize()
    err: list[BaseException] = []

    def run() -> None:
        try:
            _publish(ds, path, write_kwargs)
        except BaseException as e:  # re-raised at finalize()
            err.append(e)

    t = threading.Thread(target=run, name=f"publish-{name}", daemon=True)
    t.start()

    def finalize():
        t.join()
        if err:
            raise err[0]
        return ray.data.read_parquet(path)

    return ds, finalize
