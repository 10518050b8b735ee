"""Avro -> Table reader (the arrow-avro role: decode-only, SURVEY.md §2.3).

Pure-Python object-container-file reader built from the Avro 1.11 spec:
magic 'Obj\\x01', metadata map (avro.schema JSON + avro.codec), 16-byte sync
marker, then blocks of (row_count, byte_size, payload, sync).  Supported
schema subset: records of boolean/int/long/float/double/string/bytes/enum
and ["null", T] unions; codecs null and deflate (zlib).  Column batches
build host-side, then upload to device.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import BinaryIO, List, Optional

import numpy as np

from .. import dtypes as dt
from ..core.column import Column, PrimitiveColumn, StringColumn, column
from ..core.table import Table
from ..errors import ArrowInvalid, ArrowNotImplementedError

__all__ = ["read_avro", "ReaderBuilder"]

_MAGIC = b"Obj\x01"


class _Cursor:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise ArrowInvalid("truncated avro data")
        self.pos += n
        return b

    def vlq_long(self) -> int:
        """zig-zag varint (the reference's vlq, arrow-avro reader/vlq.rs)."""
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def string(self) -> bytes:
        return self.read(self.vlq_long())


def _read_header(cur: _Cursor):
    if cur.read(4) != _MAGIC:
        raise ArrowInvalid("not an avro object container file")
    meta = {}
    while True:
        n = cur.vlq_long()
        if n == 0:
            break
        if n < 0:  # negative count: size prefix follows
            cur.vlq_long()
            n = -n
        for _ in range(n):
            k = cur.string().decode()
            v = cur.string()
            meta[k] = v
    sync = cur.read(16)
    return meta, sync


def _decode_value(cur: _Cursor, schema):
    if isinstance(schema, list):  # union
        idx = cur.vlq_long()
        branch = schema[idx]
        return _decode_value(cur, branch)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode_value(cur, f["type"])
                    for f in schema["fields"]}
        if t == "enum":
            return schema["symbols"][cur.vlq_long()]
        if t in ("map", "array"):
            raise ArrowNotImplementedError(f"avro {t}")
        schema = t
    if schema == "null":
        return None
    if schema == "boolean":
        return cur.read(1) != b"\x00"
    if schema in ("int", "long"):
        return cur.vlq_long()
    if schema == "float":
        return struct.unpack("<f", cur.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", cur.read(8))[0]
    if schema == "string":
        return cur.string().decode()
    if schema == "bytes":
        return cur.string()
    raise ArrowNotImplementedError(f"avro type {schema}")


_AVRO_TO_DT = {"boolean": dt.bool_, "int": dt.int32, "long": dt.int64,
               "float": dt.float32, "double": dt.float64,
               "string": dt.utf8, "bytes": dt.binary}


def _field_dtype(schema) -> dt.DataType:
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ArrowNotImplementedError("multi-branch avro union")
        return _field_dtype(non_null[0])
    if isinstance(schema, dict):
        if schema["type"] == "enum":
            return dt.dictionary(dt.int32, dt.utf8)
        return _field_dtype(schema["type"])
    if schema in _AVRO_TO_DT:
        return _AVRO_TO_DT[schema]
    raise ArrowNotImplementedError(f"avro type {schema}")


def read_avro(source, batch_size: Optional[int] = None) -> Table:
    if isinstance(source, str):
        with open(source, "rb") as f:
            data = f.read()
    elif isinstance(source, bytes):
        data = source
    else:
        data = source.read()
    cur = _Cursor(data)
    meta, sync = _read_header(cur)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode() \
        if isinstance(meta.get("avro.codec", b"null"), bytes) \
        else meta.get("avro.codec", "null")
    if schema.get("type") != "record":
        raise ArrowNotImplementedError("top-level avro schema must be record")
    fields = schema["fields"]
    rows: List[dict] = []
    while cur.pos < len(data):
        count = cur.vlq_long()
        size = cur.vlq_long()
        payload = cur.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ArrowNotImplementedError(f"avro codec {codec}")
        block = _Cursor(payload)
        for _ in range(count):
            rows.append({f["name"]: _decode_value(block, f["type"])
                         for f in fields})
        if cur.read(16) != sync:
            raise ArrowInvalid("avro sync marker mismatch")
    cols = {}
    out_fields = []
    for f in fields:
        name = f["name"]
        d = _field_dtype(f["type"])
        vals = [r[name] for r in rows]
        if d.is_dictionary:
            from ..ops.strings import dictionary_encode
            col = dictionary_encode(StringColumn.from_pylist(
                [v for v in vals]))
        else:
            col = column(vals, dtype=d)
        cols[name] = col
        out_fields.append(dt.Field(name, col.dtype))
    return Table(list(cols.values()), dt.Schema(tuple(out_fields)))


class ReaderBuilder:
    """arrow-avro ReaderBuilder (reader/mod.rs:195) shape."""

    def __init__(self, batch_size: int = 65536):
        self.batch_size = batch_size

    def build(self, source) -> List[Table]:
        t = read_avro(source)
        if t.num_rows == 0:
            return [t]
        return [t.slice(i, min(self.batch_size, t.num_rows - i))
                for i in range(0, t.num_rows, self.batch_size)]
