"""Minimal Avro Object Container File reader.

Reference parity: `BallistaContext::read_avro` / `register_avro`
(client/src/context.rs; DataFusion's avro feature). The environment has no
avro package, so this implements the container format directly (spec
https://avro.apache.org/docs/current/specification/): null/deflate codecs,
records of primitive types, nullable unions, string/bytes/enum, and
logical date/timestamp annotations — the shapes SQL tables use.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Any, Dict, List, Tuple

MAGIC = b"Obj\x01"


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    # zig-zag varint (spec: binary encoding of int/long)
    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_value(self, schema) -> Any:
        if isinstance(schema, list):  # union
            idx = self.read_long()
            return self.read_value(schema[idx])
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                return {f["name"]: self.read_value(f["type"])
                        for f in schema["fields"]}
            if t == "enum":
                return schema["symbols"][self.read_long()]
            if t == "array":
                out = []
                while True:
                    n = self.read_long()
                    if n == 0:
                        break
                    if n < 0:
                        self.read_long()  # block byte size, ignored
                        n = -n
                    out.extend(self.read_value(schema["items"])
                               for _ in range(n))
                return out
            if t == "map":
                out = {}
                while True:
                    n = self.read_long()
                    if n == 0:
                        break
                    if n < 0:
                        self.read_long()
                        n = -n
                    for _ in range(n):
                        out[self.read_bytes().decode()] = \
                            self.read_value(schema["values"])
                return out
            if t == "fixed":
                return self.read(schema["size"])
            return self.read_value(t)  # annotated primitive
        # primitive names
        if schema == "null":
            return None
        if schema == "boolean":
            return self.read(1) != b"\x00"
        if schema in ("int", "long"):
            return self.read_long()
        if schema == "float":
            return struct.unpack("<f", self.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", self.read(8))[0]
        if schema == "bytes":
            return self.read_bytes()
        if schema == "string":
            return self.read_bytes().decode("utf-8")
        raise NotImplementedError(f"avro type {schema!r}")


def read_avro_rows(path: str) -> Tuple[dict, List[dict]]:
    """Returns (record schema, list of row dicts)."""
    with open(path, "rb") as fh:
        data = fh.read()
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"not an avro object container file: {path!r}")
    meta: Dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            r.read_long()
            n = -n
        for _ in range(n):
            key = r.read_bytes().decode()
            meta[key] = r.read_bytes()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    if schema.get("type") != "record":
        raise NotImplementedError("top-level avro schema must be a record")

    rows: List[dict] = []
    while not r.at_end():
        count = r.read_long()
        block = r.read_bytes()
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        br = _Reader(block)
        for _ in range(count):
            rows.append(br.read_value(schema))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt file)")
    return schema, rows


def _arrow_type(schema):
    """Avro field type -> pyarrow type (logical types honored)."""
    import pyarrow as pa
    nullable = False
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"general avro union {schema!r}")
        nullable = len(non_null) != len(schema)
        schema = non_null[0]
    logical = schema.get("logicalType") if isinstance(schema, dict) else None
    t = schema["type"] if isinstance(schema, dict) else schema
    if logical == "date":
        return pa.date32(), nullable
    if logical in ("timestamp-millis", "timestamp-micros"):
        return pa.timestamp("ms" if logical.endswith("millis") else "us"), \
            nullable
    if logical == "decimal":
        return pa.decimal128(schema.get("precision", 38),
                             schema.get("scale", 0)), nullable
    mapping = {"boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
               "float": pa.float32(), "double": pa.float64(),
               "string": pa.string(), "bytes": pa.binary(),
               "enum": pa.string()}
    if t in mapping:
        return mapping[t], nullable
    raise NotImplementedError(f"avro type {t!r} as a table column")


def read_avro(path: str):
    """Avro container file -> pyarrow.Table (columnar, typed)."""
    import pyarrow as pa
    schema, rows = read_avro_rows(path)
    fields = []
    arrays = []
    for f in schema["fields"]:
        at, nullable = _arrow_type(f["type"])
        col = [row[f["name"]] for row in rows]
        if pa.types.is_decimal(at):
            import decimal
            sc = at.scale
            col = [None if v is None else
                   decimal.Decimal(int.from_bytes(v, "big", signed=True))
                   .scaleb(-sc) for v in col]
        arrays.append(pa.array(col, type=at))
        fields.append(pa.field(f["name"], at, nullable=nullable))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def write_avro(path: str, table, codec: str = "deflate") -> None:
    """pyarrow.Table -> Avro container file (test fixture / egress helper)."""
    import pyarrow as pa

    def avro_field_type(f):
        t = f.type
        if pa.types.is_boolean(t):
            base = "boolean"
        elif pa.types.is_date32(t):
            base = {"type": "int", "logicalType": "date"}
        elif pa.types.is_integer(t):
            base = "int" if t.bit_width <= 32 else "long"
        elif pa.types.is_float32(t):
            base = "float"
        elif pa.types.is_floating(t):
            base = "double"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            base = "string"
        elif pa.types.is_binary(t):
            base = "bytes"
        else:
            raise NotImplementedError(f"avro write of {t}")
        return ["null", base] if f.nullable else base

    schema = {"type": "record", "name": "row",
              "fields": [{"name": f.name, "type": avro_field_type(f)}
                         for f in table.schema]}

    def zz(n: int) -> bytes:
        u = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def enc_value(v, ft) -> bytes:
        if isinstance(ft, list):
            if v is None:
                return zz(ft.index("null"))
            idx = next(i for i, s in enumerate(ft) if s != "null")
            return zz(idx) + enc_value(v, ft[idx])
        base = ft["type"] if isinstance(ft, dict) else ft
        if base == "boolean":
            return b"\x01" if v else b"\x00"
        if base in ("int", "long"):
            return zz(int(v))
        if base == "float":
            return struct.pack("<f", float(v))
        if base == "double":
            return struct.pack("<d", float(v))
        if base == "string":
            b = str(v).encode()
            return zz(len(b)) + b
        if base == "bytes":
            return zz(len(v)) + bytes(v)
        raise NotImplementedError(base)

    import datetime
    epoch = datetime.date(1970, 1, 1)
    cols = [c.to_pylist() for c in table.columns]
    for i, f in enumerate(table.schema):
        if pa.types.is_date32(f.type):
            cols[i] = [None if v is None else (v - epoch).days
                       for v in cols[i]]
    body = bytearray()
    for row in zip(*cols) if cols else []:
        for v, f in zip(row, schema["fields"]):
            body += enc_value(v, f["type"])
    block = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = co.compress(block) + co.flush()
    sync = b"\x00" * 16
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        meta = {"avro.schema": json.dumps(schema).encode(),
                "avro.codec": codec.encode()}
        fh.write(zz(len(meta)))
        for k, v in meta.items():
            kb = k.encode()
            fh.write(zz(len(kb)) + kb + zz(len(v)) + v)
        fh.write(zz(0))
        fh.write(sync)
        fh.write(zz(table.num_rows))
        fh.write(zz(len(block)) + block)
        fh.write(sync)
