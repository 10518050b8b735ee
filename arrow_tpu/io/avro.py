"""Avro -> Table reader (the arrow-avro role: decode-only, SURVEY.md §2.3).

Object-container-file reader built from the Avro 1.11 spec: magic
'Obj\\x01', metadata map (avro.schema JSON + avro.codec), 16-byte sync
marker, then blocks of (row_count, byte_size, payload, sync).

r2 coverage (arrow-avro codec.rs / reader/block.rs parity): nested
records (struct), arrays (list), maps, fixed, enums, ["null", T]
unions; logical types date/time-millis/time-micros/timestamp-millis/
timestamp-micros/uuid; codecs null, deflate, and snappy (native
hostcodec codec + CRC32 check); reader-vs-writer schema resolution
(field defaults, int->long->float->double and string<->bytes
promotions).  Column batches build host-side, then upload to device.
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
        if t == "array":
            out = []
            while True:
                n = cur.vlq_long()
                if n == 0:
                    break
                if n < 0:          # negative count: byte size follows
                    cur.vlq_long()
                    n = -n
                for _ in range(n):
                    out.append(_decode_value(cur, schema["items"]))
            return out
        if t == "map":
            out = []
            while True:
                n = cur.vlq_long()
                if n == 0:
                    break
                if n < 0:
                    cur.vlq_long()
                    n = -n
                for _ in range(n):
                    k = cur.string().decode()
                    out.append((k, _decode_value(cur, schema["values"])))
            return out
        if t == "fixed":
            return cur.read(schema["size"])
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


_LOGICAL_DT = {
    "date": dt.date32, "time-millis": dt.time32("ms"),
    "time-micros": dt.time64("us"),
    "timestamp-millis": dt.timestamp("ms"),
    "timestamp-micros": dt.timestamp("us"),
    "local-timestamp-millis": dt.timestamp("ms"),
    "local-timestamp-micros": dt.timestamp("us"),
    "uuid": dt.utf8,
}


def _field_dtype(schema) -> dt.DataType:
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ArrowNotImplementedError("multi-branch avro union")
        return _field_dtype(non_null[0])
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt in _LOGICAL_DT:
            return _LOGICAL_DT[lt]
        if lt == "decimal":
            # bytes/fixed big-endian two's-complement unscaled int
            # (codec.rs:215 Codec::Decimal -> Decimal128/256)
            p = schema["precision"]
            s = schema.get("scale", 0)
            return dt.decimal128(p, s) if p <= 38 else dt.decimal256(p, s)
        if lt == "duration" and schema.get("type") == "fixed" \
                and schema.get("size") == 12:
            # three little-endian u32: months, days, millis
            # (codec.rs:228 -> Interval(MonthDayNano))
            return dt.interval("month_day_nano")
        t = schema["type"]
        if t == "enum":
            return dt.dictionary(dt.int32, dt.utf8)
        if t == "array":
            return dt.list_(_field_dtype(schema["items"]))
        if t == "map":
            return dt.map_(dt.utf8, _field_dtype(schema["values"]))
        if t == "record":
            return dt.struct([dt.Field(f["name"],
                                       _field_dtype(f["type"]))
                              for f in schema["fields"]])
        if t == "fixed":
            return dt.fixed_size_binary(schema["size"])
        return _field_dtype(t)
    if schema in _AVRO_TO_DT:
        return _AVRO_TO_DT[schema]
    raise ArrowNotImplementedError(f"avro type {schema}")


def _build_column(vals, d: dt.DataType) -> Column:
    """Recursive host-side assembly via the engine's builders."""
    from ..core import builders as bl
    if d.name in ("decimal128", "decimal256") and any(
            isinstance(v, bytes) for v in vals):
        import decimal as _dec
        vals = [None if v is None else
                _dec.Decimal(int.from_bytes(v, "big", signed=True))
                .scaleb(-d.scale) for v in vals]
    if d.name == "interval" and d.unit == "month_day_nano" and any(
            isinstance(v, bytes) for v in vals):
        vals = [None if v is None else
                (int.from_bytes(v[0:4], "little"),
                 int.from_bytes(v[4:8], "little"),
                 int.from_bytes(v[8:12], "little") * 1_000_000)
                for v in vals]
    if d.is_dictionary:
        from ..ops.strings import dictionary_encode
        return dictionary_encode(StringColumn.from_pylist(
            ["" if v is None else v for v in vals]))
    if d.name == "list":
        import jax.numpy as jnp
        offs = [0]
        flat = []
        valid = []
        for v in vals:
            if v is None:
                valid.append(False)
            else:
                flat.extend(v)
                valid.append(True)
            offs.append(len(flat))
        child = _build_column(flat, d.value_type)
        validity = None if all(valid) else jnp.asarray(
            np.asarray(valid, bool))
        from ..core.column import ListColumn
        return ListColumn(jnp.asarray(np.asarray(offs, np.int32)), child,
                          validity)
    if d.name == "map":
        import jax.numpy as jnp
        from ..core.column import StructColumn
        from ..core.nested import MapColumn
        offs = [0]
        keys: List[str] = []
        items = []
        valid = []
        for v in vals:
            if v is None:
                valid.append(False)
            else:
                for k, it in v:
                    keys.append(k)
                    items.append(it)
                valid.append(True)
            offs.append(len(keys))
        kcol = StringColumn.from_pylist(keys)
        icol = _build_column(items, d.value_type.fields[1].dtype)
        entries = StructColumn((kcol, icol), d.value_type.fields)
        validity = None if all(valid) else jnp.asarray(
            np.asarray(valid, bool))
        return MapColumn(jnp.asarray(np.asarray(offs, np.int32)),
                         entries, validity)
    if d.name == "struct":
        import jax.numpy as jnp
        from ..core.column import StructColumn
        valid = [v is not None for v in vals]
        children = tuple(
            _build_column([None if v is None else v.get(f.name)
                           for v in vals], f.dtype)
            for f in d.fields)
        validity = None if all(valid) else jnp.asarray(
            np.asarray(valid, bool))
        return StructColumn(children, tuple(d.fields), validity)
    if d.name == "fixed_size_binary":
        from ..core.builders import FixedSizeBinaryBuilder
        b = FixedSizeBinaryBuilder(d.list_size)
        for v in vals:
            b.append(v)
        return b.finish()
    return column(vals, dtype=d)


def _resolve_value(v, writer_schema, reader_schema):
    """Schema resolution promotions (arrow-avro codec.rs resolution):
    int->long->float->double, string<->bytes."""
    wd = writer_schema if isinstance(writer_schema, str) else None
    rd = reader_schema if isinstance(reader_schema, str) else None
    if v is None or wd is None or rd is None or wd == rd:
        return v
    if wd in ("int", "long") and rd in ("long", "float", "double"):
        return float(v) if rd in ("float", "double") else int(v)
    if wd == "float" and rd == "double":
        return v
    if wd == "string" and rd == "bytes":
        return v.encode("utf-8")
    if wd == "bytes" and rd == "string":
        return v.decode("utf-8")
    return v


def read_avro(source, batch_size: Optional[int] = None,
              reader_schema: Optional[dict] = None) -> Table:
    """reader_schema: optional Avro schema dict for reader-vs-writer
    resolution (missing fields take their defaults; promoted types
    convert)."""
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
        elif codec == "snappy":
            # snappy block + 4-byte big-endian CRC32 of the raw bytes
            from ..utils import native as nt
            crc = struct.unpack(">I", payload[-4:])[0]
            # snappy header carries the uncompressed length varint
            ulen = 0
            shift = 0
            for b in payload:
                ulen |= (b & 0x7F) << shift
                if not (b & 0x80):
                    break
                shift += 7
            payload = nt.snappy_decompress(payload[:-4], ulen)
            if zlib.crc32(payload) & 0xFFFFFFFF != crc:
                raise ArrowInvalid("avro snappy block CRC mismatch")
        elif codec != "null":
            raise ArrowNotImplementedError(f"avro codec {codec}")
        block = _Cursor(payload)
        for _ in range(count):
            rows.append({f["name"]: _decode_value(block, f["type"])
                         for f in fields})
        if cur.read(16) != sync:
            raise ArrowInvalid("avro sync marker mismatch")
    writer_by_name = {f["name"]: f for f in fields}
    out_fields_src = reader_schema["fields"] if reader_schema else fields
    cols = []
    out_fields = []
    for f in out_fields_src:
        name = f["name"]
        d = _field_dtype(f["type"])
        wf = writer_by_name.get(name)
        if wf is None:
            if "default" in f:
                vals = [f["default"]] * len(rows)
            else:
                raise ArrowInvalid(
                    f"reader field {name!r} missing and has no default")
        else:
            vals = [r[name] for r in rows]
            if reader_schema is not None:
                vals = [_resolve_value(v, wf["type"], f["type"])
                        for v in vals]
        col = _build_column(vals, d)
        cols.append(col)
        out_fields.append(dt.Field(name, col.dtype))
    return Table(tuple(cols), dt.Schema(tuple(out_fields)))


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
