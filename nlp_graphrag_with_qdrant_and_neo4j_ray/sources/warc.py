"""WARC/WET → pages-table Ray Data source.

Production web corpora arrive as ~1 GB gzipped WARC/WET archives; at
100 TB that is ~10⁵ files — natural read parallelism, one file per read
task. Each file is parsed as a STREAM (``_read_stream``): records are
decoded incrementally off the multi-member gzip stream and emitted as
bounded Arrow blocks of ``records_per_block`` pages, so a worker never
holds more than one block plus one record in heap regardless of archive
size — unlike ``read_binary_files``, which would pin the whole
decompressed archive as a single object.

Downstream is the unchanged canonical pipeline: ``response`` records
carry html for the extract stage (the reference's raw-file path,
cli/main.py:115-156); WET ``conversion`` records carry extracted text
directly.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pyarrow as pa

from ..functions.warc import iter_warc_records, maybe_gzip_stream, record_to_page
from ..schemas import PAGES

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _pages_block(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=PAGES)


class WarcDatasource:
    """Constructed lazily inside :func:`read_warc_as_pages` so importing
    this module never imports ray."""

    def __new__(cls, paths, *, default_lang: str = "en",
                records_per_block: int = 512, **kwargs):
        from ray.data.datasource import FileBasedDatasource

        class _Impl(FileBasedDatasource):
            _FILE_EXTENSIONS = None  # .warc, .warc.gz, .wet.gz, ...

            def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
                stream = maybe_gzip_stream(f)
                rows: list[dict] = []
                for headers, body in iter_warc_records(stream):
                    page = record_to_page(headers, body, default_lang)
                    if page is None:
                        continue
                    rows.append(page)
                    if len(rows) >= records_per_block:
                        yield _pages_block(rows)
                        rows = []
                if rows:
                    yield _pages_block(rows)

        return _Impl(paths, **kwargs)


def read_warc_as_pages(paths, *, default_lang: str = "en",
                       records_per_block: int = 512,
                       **read_kwargs) -> "ray.data.Dataset":
    """Read WARC/WET archive file(s) into the canonical pages Dataset."""
    import ray.data

    source = WarcDatasource(paths, default_lang=default_lang,
                            records_per_block=records_per_block)
    return ray.data.read_datasource(source, **read_kwargs)
