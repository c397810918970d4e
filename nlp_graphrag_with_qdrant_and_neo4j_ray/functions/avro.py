"""Pure-python Avro Object Container File codec (Avro spec 1.11,
"Object Container Files" + "Binary Encoding") — reader and writer
twin, the same vendored-codec precedent as the PNG/WAV/JPEG and WARC
codecs: no avro/fastavro in the environment, and warehouses hand data
over in Avro constantly.

Scope (honest guards, not silent wrongness): top-level ``record``
schemas whose fields are primitives (``null boolean int long float
double bytes string``) or nullable unions (``["null", prim]`` either
order); ``logicalType`` annotations pass through to their base type.
Codecs ``null`` and ``deflate`` (raw RFC 1951, per spec). Nested
records / arrays / maps / enums / fixed and the ``snappy`` codec raise
``NotImplementedError`` naming the construct.

Decode walks each block sequentially (Avro is a row-major,
length-prefixed format — field boundaries are data-dependent, so
there is nothing to vectorize across records); the scale axis is
file- and block-level fan-out through the Ray datasource, like the
WARC source.
"""

from __future__ import annotations

import json
import struct
import zlib

import pyarrow as pa

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes",
    "string",
}

_ARROW_TYPES = {
    "null": pa.null(),
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bytes": pa.binary(),
    "string": pa.string(),
}


def _base_type(t) -> tuple[str, bool]:
    """Schema field type → (primitive name, nullable). Raises on
    anything outside the supported subset."""
    if isinstance(t, dict):
        # {"type": prim, "logicalType": ...} → base primitive
        inner = t.get("type")
        if inner in _PRIMITIVES:
            return inner, False
        raise NotImplementedError(
            f"avro: unsupported complex field type {inner!r}")
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(t) == 2 and "null" in t and len(branches) == 1 \
                and isinstance(branches[0], str) \
                and branches[0] in _PRIMITIVES:
            return branches[0], True
        raise NotImplementedError(
            f"avro: unsupported union {t!r} (only [null, primitive])")
    if t in _PRIMITIVES:
        return t, False
    raise NotImplementedError(f"avro: unsupported field type {t!r}")


def parse_schema(schema_json: str) -> list[tuple[str, str, bool, int]]:
    """Schema JSON → [(field name, primitive, nullable, null_index)];
    ``null_index`` is the union branch index that means null (-1 when
    the field is not a union)."""
    s = json.loads(schema_json)
    if not isinstance(s, dict) or s.get("type") != "record":
        raise NotImplementedError(
            "avro: only top-level record schemas are supported")
    out = []
    for f in s["fields"]:
        prim, nullable = _base_type(f["type"])
        null_idx = -1
        if nullable:
            null_idx = list(f["type"]).index("null")
        out.append((f["name"], prim, nullable, null_idx))
    return out


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def long(self) -> int:
        u = shift = 0
        buf, pos = self.buf, self.pos
        while True:
            b = buf[pos]
            pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self.pos = pos
        return (u >> 1) ^ -(u & 1)

    def raw(self, n: int) -> bytes:
        p = self.pos
        self.pos = p + n
        return self.buf[p:self.pos]


def _read_value(r: _Reader, prim: str):
    if prim == "null":
        return None
    if prim == "boolean":
        return r.raw(1) == b"\x01"
    if prim in ("int", "long"):
        return r.long()
    if prim == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if prim == "double":
        return struct.unpack("<d", r.raw(8))[0]
    # bytes / string
    data = r.raw(r.long())
    return data.decode("utf-8") if prim == "string" else data


def _write_value(out: bytearray, prim: str, v) -> None:
    if prim == "null":
        return
    if prim == "boolean":
        out += b"\x01" if v else b"\x00"
    elif prim in ("int", "long"):
        out += zigzag_encode(int(v))
    elif prim == "float":
        out += struct.pack("<f", float(v))
    elif prim == "double":
        out += struct.pack("<d", float(v))
    else:
        data = v.encode("utf-8") if prim == "string" else bytes(v)
        out += zigzag_encode(len(data)) + data


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def read_header(f) -> tuple[list, str, bytes]:
    """Consume the container header from a stream → (parsed fields,
    codec, sync marker)."""
    if f.read(4) != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    meta: dict[str, bytes] = {}
    while True:
        n = _stream_long(f)
        if n == 0:
            break
        if n < 0:  # block with byte-size prefix
            _stream_long(f)
            n = -n
        for _ in range(n):
            k = f.read(_stream_long(f)).decode("utf-8")
            meta[k] = f.read(_stream_long(f))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} not supported")
    fields = parse_schema(meta["avro.schema"].decode("utf-8"))
    sync = f.read(16)
    return fields, codec, sync


def _stream_long(f) -> int:
    u = shift = 0
    while True:
        c = f.read(1)
        if not c:
            raise EOFError("avro: truncated varint")
        b = c[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1)
        shift += 7


def iter_blocks(f, fields, codec: str, sync: bytes):
    """Yield one decoded ``pyarrow.Table`` per data block — a reader
    never holds more than one block in heap."""
    names = [n for n, _, _, _ in fields]
    types = {n: _ARROW_TYPES[p] for n, p, _, _ in fields}
    while True:
        c = f.read(1)
        if not c:
            return
        # re-assemble the first varint we already started reading
        u = c[0] & 0x7F
        shift = 7
        b = c[0]
        while b & 0x80:
            b = f.read(1)[0]
            u |= (b & 0x7F) << shift
            shift += 7
        n_records = (u >> 1) ^ -(u & 1)
        n_bytes = _stream_long(f)
        payload = f.read(n_bytes)
        if f.read(16) != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        r = _Reader(payload)
        cols: dict[str, list] = {n: [] for n in names}
        for _ in range(n_records):
            for name, prim, nullable, null_idx in fields:
                if nullable:
                    branch = r.long()
                    if branch == null_idx:
                        cols[name].append(None)
                        continue
                cols[name].append(_read_value(r, prim))
        yield pa.table(
            {n: pa.array(cols[n], type=types[n]) for n in names})


# ---------------------------------------------------------------------------
# writer twin
# ---------------------------------------------------------------------------

_INFER = {
    pa.bool_(): "boolean",
    pa.int32(): "int",
    pa.int64(): "long",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.string(): "string",
    pa.large_string(): "string",
    pa.binary(): "bytes",
    pa.large_binary(): "bytes",
}


def infer_schema(table: pa.Table, name: str = "row") -> str:
    """Arrow schema → Avro record schema JSON; columns with nulls
    become ``["null", prim]`` unions."""
    fields = []
    for col in table.schema:
        if col.type not in _INFER:
            raise NotImplementedError(
                f"avro: cannot infer schema for arrow type {col.type}")
        prim = _INFER[col.type]
        nullable = table.column(col.name).null_count > 0
        fields.append({
            "name": col.name,
            "type": ["null", prim] if nullable else prim,
        })
    return json.dumps(
        {"type": "record", "name": name, "fields": fields})


def encode_container(table: pa.Table, codec: str = "null",
                     records_per_block: int = 4096,
                     schema_json: str | None = None) -> bytes:
    """Encode a table as one Object Container File (deterministic:
    the sync marker derives from the schema, not randomness)."""
    import hashlib

    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} not supported")
    schema_json = schema_json or infer_schema(table)
    fields = parse_schema(schema_json)
    sync = hashlib.md5(schema_json.encode("utf-8")).digest()

    out = bytearray(MAGIC)
    meta = [("avro.schema", schema_json.encode("utf-8")),
            ("avro.codec", codec.encode("utf-8"))]
    out += zigzag_encode(len(meta))
    for k, v in meta:
        kb = k.encode("utf-8")
        out += zigzag_encode(len(kb)) + kb
        out += zigzag_encode(len(v)) + v
    out += zigzag_encode(0)
    out += sync

    rows = table.to_pylist()
    for start in range(0, len(rows), records_per_block):
        chunk = rows[start:start + records_per_block]
        body = bytearray()
        for row in chunk:
            for name, prim, nullable, null_idx in fields:
                v = row[name]
                if nullable:
                    if v is None:
                        body += zigzag_encode(null_idx)
                        continue
                    body += zigzag_encode(1 - null_idx)
                elif v is None:
                    raise ValueError(
                        f"avro: null in non-nullable field {name!r}")
                _write_value(body, prim, v)
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw RFC 1951
        out += zigzag_encode(len(chunk))
        out += zigzag_encode(len(payload))
        out += payload
        out += sync
    return bytes(out)


def write_avro_file(table: pa.Table, path: str, codec: str = "null",
                    records_per_block: int = 4096) -> None:
    """Writer twin (atomic via temp + rename), used by tests and the
    export path."""
    import os

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(encode_container(table, codec=codec,
                                 records_per_block=records_per_block))
    os.replace(tmp, path)
