"""ORC → Ray Data source (and writer helper).

Ray Data ships no ORC reader; warehouses hand data over in ORC all the
time, so this adds the format through the same ``FileBasedDatasource``
seam as the WARC source: one file per read task (at 100 TB the ~10⁵
files are the parallelism), each file decoded STRIPE by stripe via
``pyarrow.orc`` so a worker holds one stripe's batches, never the whole
file.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa


class OrcDatasource:
    """Constructed lazily inside :func:`read_orc` so importing this
    module never imports ray."""

    def __new__(cls, paths, *, columns: list[str] | None = None,
                **kwargs):
        from ray.data.datasource import FileBasedDatasource

        class _Impl(FileBasedDatasource):
            _FILE_EXTENSIONS = ["orc"]

            def _open_input_source(self, filesystem, path: str,
                                   **open_args):
                # ORC's metadata lives in the file TAIL, so the reader
                # needs random access — open a seekable input file
                # instead of the default sequential stream.
                return filesystem.open_input_file(path)

            def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
                import pyarrow.orc as orc

                reader = orc.ORCFile(f)
                for i in range(reader.nstripes):
                    t = reader.read_stripe(i, columns=columns)
                    # read_stripe returns a RecordBatch on some pyarrow
                    # versions, a Table on others — normalize.
                    if isinstance(t, pa.RecordBatch):
                        t = pa.Table.from_batches([t])
                    yield t

        return _Impl(paths, **kwargs)


def read_orc(paths, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_datasource`` over :class:`OrcDatasource` —
    column projection pushes into each stripe read."""
    import ray.data

    return ray.data.read_datasource(
        OrcDatasource(paths, columns=columns), **kwargs)


def write_orc_file(table: pa.Table, path: str,
                   stripe_size: int = 64 * 1024 * 1024) -> None:
    """Write one ORC file (atomic via temp + rename) — the writer twin
    used by tests and the export path."""
    import os

    import pyarrow.orc as orc

    tmp = path + ".tmp"
    orc.write_table(table, tmp, stripe_size=stripe_size)
    os.replace(tmp, path)
