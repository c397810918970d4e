"""Avro Object Container File → Ray Data source.

Ray Data ships no Avro reader and the environment has no avro lib, so
the format comes in through the vendored pure codec
(``functions/avro.py``) behind the same ``FileBasedDatasource`` seam
as the WARC and ORC sources: one file per read task (at 100 TB the
~10⁵ files are the parallelism axis), each file decoded BLOCK by
block off the stream — a worker holds one container block's rows,
never the whole file.

Column projection trims the emitted schema per block; Avro is
row-major, so the decode necessarily walks every field (unlike the
parquet readers, where projection prunes I/O — stated honestly rather
than pretended away).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa


class AvroDatasource:
    """Constructed lazily inside :func:`read_avro` so importing this
    module never imports ray."""

    def __new__(cls, paths, *, columns: list[str] | None = None,
                **kwargs):
        from ray.data.datasource import FileBasedDatasource

        class _Impl(FileBasedDatasource):
            _FILE_EXTENSIONS = ["avro"]

            def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
                from ..functions.avro import iter_blocks, read_header

                fields, codec, sync = read_header(f)
                for tbl in iter_blocks(f, fields, codec, sync):
                    yield tbl.select(columns) if columns else tbl

        return _Impl(paths, **kwargs)


def read_avro(paths, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_datasource`` over :class:`AvroDatasource`."""
    import ray.data

    return ray.data.read_datasource(
        AvroDatasource(paths, columns=columns), **kwargs)
