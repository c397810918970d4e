"""Vendored Avro Object Container File codec + Ray datasource."""

import io
import json
import os

import pyarrow as pa
import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.avro import (
    _Reader,
    encode_container,
    infer_schema,
    iter_blocks,
    parse_schema,
    read_header,
    write_avro_file,
    zigzag_encode,
)


def _roundtrip(table: pa.Table, **kw) -> pa.Table:
    buf = io.BytesIO(encode_container(table, **kw))
    fields, codec, sync = read_header(buf)
    tables = list(iter_blocks(buf, fields, codec, sync))
    return pa.concat_tables(tables) if tables else table.slice(0, 0)


class TestBinary:
    def test_zigzag_roundtrip(self):
        for n in (0, 1, -1, 63, 64, -64, -65, 2**31, -2**31,
                  2**62, -2**62, 12345678901234):
            r = _Reader(zigzag_encode(n))
            assert r.long() == n, n

    def test_known_encodings(self):
        # spec examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
        assert zigzag_encode(0) == b"\x00"
        assert zigzag_encode(-1) == b"\x01"
        assert zigzag_encode(1) == b"\x02"
        assert zigzag_encode(-64) == b"\x7f"
        assert zigzag_encode(64) == b"\x80\x01"


class TestContainer:
    def _table(self, n=10):
        return pa.table({
            "id": pa.array(range(n), pa.int64()),
            "name": pa.array([f"row-{i}" for i in range(n)]),
            "score": pa.array([i / 4 for i in range(n)], pa.float64()),
            "flag": pa.array([i % 2 == 0 for i in range(n)]),
            "blob": pa.array([bytes([i]) * 3 for i in range(n)],
                             pa.binary()),
        })

    def test_roundtrip_null_codec(self):
        t = self._table()
        assert _roundtrip(t).equals(t)

    def test_roundtrip_deflate(self):
        t = self._table(100)
        assert _roundtrip(t, codec="deflate").equals(t)

    def test_multi_block_boundaries(self):
        t = self._table(25)
        got = _roundtrip(t, records_per_block=7)
        assert got.equals(t)
        # and the stream really had multiple blocks
        buf = io.BytesIO(encode_container(t, records_per_block=7))
        fields, codec, sync = read_header(buf)
        assert len(list(iter_blocks(buf, fields, codec, sync))) == 4

    def test_nullable_union_roundtrip(self):
        t = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "maybe": pa.array(["x", None, "z"]),
        })
        schema = json.loads(infer_schema(t))
        assert schema["fields"][1]["type"] == ["null", "string"]
        assert _roundtrip(t).equals(t)

    def test_bad_magic_and_sync(self):
        with pytest.raises(ValueError, match="magic"):
            read_header(io.BytesIO(b"PAR1" + b"\x00" * 32))
        raw = bytearray(encode_container(self._table(3)))
        raw[-1] ^= 0xFF  # corrupt the trailing sync marker
        buf = io.BytesIO(bytes(raw))
        fields, codec, sync = read_header(buf)
        with pytest.raises(ValueError, match="sync"):
            list(iter_blocks(buf, fields, codec, sync))

    def test_honest_guards(self):
        with pytest.raises(NotImplementedError, match="complex"):
            parse_schema(json.dumps({
                "type": "record", "name": "r",
                "fields": [{"name": "a",
                            "type": {"type": "array",
                                     "items": "long"}}],
            }))
        with pytest.raises(NotImplementedError, match="union"):
            parse_schema(json.dumps({
                "type": "record", "name": "r",
                "fields": [{"name": "a", "type": ["string", "long"]}],
            }))
        with pytest.raises(NotImplementedError, match="codec"):
            encode_container(self._table(1), codec="snappy")

    def test_logical_type_passthrough(self):
        fields = parse_schema(json.dumps({
            "type": "record", "name": "r",
            "fields": [{"name": "ts",
                        "type": {"type": "long",
                                 "logicalType": "timestamp-micros"}}],
        }))
        assert fields == [("ts", "long", False, -1)]


class TestDatasource:
    def test_read_avro_multi_file(self, ray_session, tmp_path):
        from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.avro import (
            read_avro,
        )

        t = pa.table({
            "id": pa.array(range(40), pa.int64()),
            "txt": pa.array([f"doc {i}" for i in range(40)]),
        })
        paths = []
        for i in range(3):
            p = os.path.join(tmp_path, f"part-{i}.avro")
            write_avro_file(t.slice(i * 13, 13), p,
                            codec="deflate" if i % 2 else "null",
                            records_per_block=5)
            paths.append(p)
        ds = read_avro(paths)
        got = ds.to_pandas().sort_values("id").reset_index(drop=True)
        assert list(got["id"]) == list(range(39))
        assert got["txt"][7] == "doc 7"
        # column projection
        one = read_avro(paths, columns=["id"]).to_pandas()
        assert list(one.columns) == ["id"]
        assert len(one) == 39
