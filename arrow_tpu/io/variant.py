"""Variant semi-structured binary type (parquet-variant,
parquet-variant-json, parquet-variant-compute crates; the Parquet
Variant binary encoding spec).

Two buffers per value: `metadata` (versioned dictionary of object keys)
and `value` (tagged binary tree).  This module implements the spec's
encoding: build arbitrary Python values (None/bool/int/float/str/bytes/
Decimal/list/dict) into (metadata, value) byte pairs, parse them back,
convert to/from JSON (the parquet-variant-json role), and store batches
as a VariantColumn (a struct of two binary columns, the Arrow
shredding-free representation) with a `variant_get` path accessor
(parquet-variant-compute's core op).

Value header byte: basic_type in the 2 low bits —
  0 primitive (type id in bits 2-7: null/true/false/int8/16/32/64/
    double/decimal4/8/16/date/timestamp/ts_ntz/float/binary/string)
  1 short string (length in bits 2-7)
  2 object  (field-id/offset widths + is_large in bits 2-7)
  3 array   (offset width + is_large in bits 2-4)
Metadata header byte: version=1 in the 4 low bits, sorted_strings bit 4,
offset_size-1 in bits 6-7.
"""

from __future__ import annotations

import json as _json
import struct
from decimal import Decimal
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..errors import ArrowInvalid

__all__ = ["VariantBuilder", "parse_variant", "variant_to_json",
           "json_to_variant", "VariantColumn", "variant_get"]

_VERSION = 1

# primitive type ids (Variant spec)
_P_NULL, _P_TRUE, _P_FALSE = 0, 1, 2
_P_INT8, _P_INT16, _P_INT32, _P_INT64 = 3, 4, 5, 6
_P_DOUBLE = 7
_P_DEC4, _P_DEC8, _P_DEC16 = 8, 9, 10
_P_DATE, _P_TS, _P_TS_NTZ = 11, 12, 13
_P_FLOAT, _P_BINARY, _P_STRING = 14, 15, 16


def _min_width(n: int) -> int:
    for w in (1, 2, 3, 4):
        if n < (1 << (8 * w)):
            return w
    raise ArrowInvalid("value too large for variant offsets")


def _pack_uint(v: int, width: int) -> bytes:
    return v.to_bytes(width, "little")


class VariantBuilder:
    """Builds one Variant from a Python value (builder.rs:833)."""

    def __init__(self):
        self._keys: Dict[str, int] = {}

    def _key_id(self, k: str) -> int:
        i = self._keys.get(k)
        if i is None:
            i = len(self._keys)
            self._keys[k] = i
        return i

    # -- value encoding ---------------------------------------------------
    def _encode(self, v) -> bytes:
        if v is None:
            return bytes([_P_NULL << 2])
        if isinstance(v, bool):
            return bytes([(_P_TRUE if v else _P_FALSE) << 2])
        if isinstance(v, int):
            for tid, fmt, lo, hi in ((_P_INT8, "<b", -2**7, 2**7),
                                     (_P_INT16, "<h", -2**15, 2**15),
                                     (_P_INT32, "<i", -2**31, 2**31),
                                     (_P_INT64, "<q", -2**63, 2**63)):
                if lo <= v < hi:
                    return bytes([tid << 2]) + struct.pack(fmt, v)
            raise ArrowInvalid("int out of variant int64 range")
        if isinstance(v, float):
            return bytes([_P_DOUBLE << 2]) + struct.pack("<d", v)
        import datetime as _dt
        if isinstance(v, _dt.datetime):
            one_us = _dt.timedelta(microseconds=1)
            if v.tzinfo is not None:
                epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                return bytes([_P_TS << 2]) + \
                    struct.pack("<q", (v - epoch) // one_us)
            us = (v - _dt.datetime(1970, 1, 1)) // one_us
            return bytes([_P_TS_NTZ << 2]) + struct.pack("<q", us)
        if isinstance(v, _dt.date):
            days = (v - _dt.date(1970, 1, 1)).days
            return bytes([_P_DATE << 2]) + struct.pack("<i", days)
        if isinstance(v, Decimal):
            sign, digits, exp = v.as_tuple()
            scale = -exp if exp < 0 else 0
            unscaled = int(v.scaleb(scale))
            for tid, w in ((_P_DEC4, 4), (_P_DEC8, 8), (_P_DEC16, 16)):
                if -(1 << (8 * w - 1)) <= unscaled < (1 << (8 * w - 1)):
                    return bytes([tid << 2, scale]) + \
                        unscaled.to_bytes(w, "little", signed=True)
            raise ArrowInvalid("decimal out of variant range")
        if isinstance(v, str):
            b = v.encode()
            if len(b) < 64:
                return bytes([(len(b) << 2) | 1]) + b
            return bytes([_P_STRING << 2]) + struct.pack("<I", len(b)) + b
        if isinstance(v, (bytes, bytearray)):
            return bytes([_P_BINARY << 2]) + struct.pack("<I", len(v)) \
                + bytes(v)
        if isinstance(v, (list, tuple)):
            vals = [self._encode(x) for x in v]
            offs = [0]
            for b in vals:
                offs.append(offs[-1] + len(b))
            ow = _min_width(offs[-1])
            large = len(vals) > 255
            head = 3 | ((ow - 1) << 2) | ((1 if large else 0) << 4)
            out = bytearray([head])
            out += _pack_uint(len(vals), 4 if large else 1)
            for o in offs:
                out += _pack_uint(o, ow)
            for b in vals:
                out += b
            return bytes(out)
        if isinstance(v, dict):
            # the spec orders object fields lexicographically by field
            # NAME (builder.rs object finish), not by field id
            items = [(str(k), self._key_id(str(k)), self._encode(x))
                     for k, x in v.items()]
            items.sort(key=lambda kv: kv[0].encode())
            items = [(i, b) for _, i, b in items]
            offs = [0]
            for _, b in items:
                offs.append(offs[-1] + len(b))
            ow = _min_width(offs[-1])
            iw = _min_width(max((i for i, _ in items), default=0) + 1)
            large = len(items) > 255
            # spec layout (parquet-variant builder.rs object_header):
            # field-offset width in bits 2-3, field-id width in bits 4-5
            head = 2 | ((ow - 1) << 2) | ((iw - 1) << 4) \
                | ((1 if large else 0) << 6)
            out = bytearray([head])
            out += _pack_uint(len(items), 4 if large else 1)
            for i, _ in items:
                out += _pack_uint(i, iw)
            for o in offs:
                out += _pack_uint(o, ow)
            for _, b in items:
                out += b
            return bytes(out)
        raise ArrowInvalid(f"cannot encode {type(v)} as variant")

    def build(self, value) -> Tuple[bytes, bytes]:
        """-> (metadata, value) byte strings."""
        val = self._encode(value)
        keys = sorted(self._keys, key=self._keys.get)
        key_bytes = [k.encode() for k in keys]
        total = sum(len(b) for b in key_bytes)
        ow = _min_width(max(total, len(keys)))
        header = _VERSION | ((ow - 1) << 6)
        md = bytearray([header])
        md += _pack_uint(len(keys), ow)
        off = 0
        for b in key_bytes:
            md += _pack_uint(off, ow)
            off += len(b)
        md += _pack_uint(off, ow)
        for b in key_bytes:
            md += b
        self._keys = {}
        return bytes(md), val


def _read_uint(buf: bytes, i: int, w: int) -> int:
    return int.from_bytes(buf[i:i + w], "little")


def _parse_metadata(md: bytes) -> List[str]:
    if not md or (md[0] & 0x0F) != _VERSION:
        raise ArrowInvalid("bad variant metadata version")
    ow = ((md[0] >> 6) & 3) + 1
    n = _read_uint(md, 1, ow)
    offs = [_read_uint(md, 1 + ow * (1 + i), ow) for i in range(n + 1)]
    base = 1 + ow * (n + 2)
    return [md[base + offs[i]:base + offs[i + 1]].decode()
            for i in range(n)]


def _parse_value(buf: bytes, i: int, keys: List[str]) -> Tuple[Any, int]:
    head = buf[i]
    basic = head & 3
    if basic == 1:                                  # short string
        ln = head >> 2
        return buf[i + 1:i + 1 + ln].decode(), i + 1 + ln
    if basic == 0:                                  # primitive
        tid = head >> 2
        i += 1
        if tid == _P_NULL:
            return None, i
        if tid == _P_TRUE:
            return True, i
        if tid == _P_FALSE:
            return False, i
        if tid in (_P_INT8, _P_INT16, _P_INT32, _P_INT64):
            w = {_P_INT8: 1, _P_INT16: 2, _P_INT32: 4, _P_INT64: 8}[tid]
            return int.from_bytes(buf[i:i + w], "little", signed=True), \
                i + w
        if tid == _P_DOUBLE:
            return struct.unpack("<d", buf[i:i + 8])[0], i + 8
        if tid == _P_FLOAT:
            return struct.unpack("<f", buf[i:i + 4])[0], i + 4
        if tid in (_P_DEC4, _P_DEC8, _P_DEC16):
            w = {_P_DEC4: 4, _P_DEC8: 8, _P_DEC16: 16}[tid]
            scale = buf[i]
            unscaled = int.from_bytes(buf[i + 1:i + 1 + w], "little",
                                      signed=True)
            return Decimal(unscaled).scaleb(-scale), i + 1 + w
        if tid in (_P_STRING, _P_BINARY):
            ln = struct.unpack("<I", buf[i:i + 4])[0]
            raw = buf[i + 4:i + 4 + ln]
            return (raw.decode() if tid == _P_STRING else raw), i + 4 + ln
        import datetime as _dt
        if tid == _P_DATE:
            days = struct.unpack("<i", buf[i:i + 4])[0]
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=days), i + 4
        if tid in (_P_TS, _P_TS_NTZ):
            us = struct.unpack("<q", buf[i:i + 8])[0]
            base = _dt.datetime(1970, 1, 1,
                                tzinfo=_dt.timezone.utc
                                if tid == _P_TS else None)
            return base + _dt.timedelta(microseconds=us), i + 8
        raise ArrowInvalid(f"variant primitive type {tid}")
    if basic == 3:                                  # array
        ow = ((head >> 2) & 3) + 1
        large = (head >> 4) & 1
        i += 1
        n = _read_uint(buf, i, 4 if large else 1)
        i += 4 if large else 1
        offs = [_read_uint(buf, i + ow * j, ow) for j in range(n + 1)]
        base = i + ow * (n + 1)
        out = []
        for j in range(n):
            v, _ = _parse_value(buf, base + offs[j], keys)
            out.append(v)
        return out, base + offs[n]
    # object: offset width bits 2-3, id width bits 4-5 (spec order)
    ow = ((head >> 2) & 3) + 1
    iw = ((head >> 4) & 3) + 1
    large = (head >> 6) & 1
    i += 1
    n = _read_uint(buf, i, 4 if large else 1)
    i += 4 if large else 1
    ids = [_read_uint(buf, i + iw * j, iw) for j in range(n)]
    i += iw * n
    offs = [_read_uint(buf, i + ow * j, ow) for j in range(n + 1)]
    base = i + ow * (n + 1)
    out = {}
    for j in range(n):
        v, _ = _parse_value(buf, base + offs[j], keys)
        out[keys[ids[j]]] = v
    return out, base + offs[n]


def parse_variant(metadata: bytes, value: bytes):
    """(metadata, value) -> Python value (variant.rs:215 accessors)."""
    keys = _parse_metadata(metadata)
    v, _ = _parse_value(value, 0, keys)
    return v


def variant_to_json(metadata: bytes, value: bytes) -> str:
    """parquet-variant-json: Variant -> JSON text."""
    def default(o):
        import datetime
        if isinstance(o, Decimal):
            return float(o)
        if isinstance(o, bytes):
            import base64
            return base64.b64encode(o).decode()
        if isinstance(o, (datetime.date, datetime.datetime)):
            return o.isoformat()
        raise TypeError(o)
    return _json.dumps(parse_variant(metadata, value), default=default)


def json_to_variant(text: str) -> Tuple[bytes, bytes]:
    """parquet-variant-json: JSON text -> (metadata, value)."""
    return VariantBuilder().build(_json.loads(text))


class VariantColumn:
    """Batch of variants: two host byte columns (metadata, value) — the
    unshredded VariantArray of parquet-variant-compute."""

    def __init__(self, metadata: Sequence[Optional[bytes]],
                 values: Sequence[Optional[bytes]]):
        assert len(metadata) == len(values)
        self.metadata = list(metadata)
        self.values = list(values)

    def __len__(self):
        return len(self.values)

    @staticmethod
    def from_pylist(objs: Sequence) -> "VariantColumn":
        mds, vals = [], []
        for o in objs:
            if o is _NULL_SLOT:
                mds.append(None)
                vals.append(None)
            else:
                m, v = VariantBuilder().build(o)
                mds.append(m)
                vals.append(v)
        return VariantColumn(mds, vals)

    def to_pylist(self):
        return [None if v is None else parse_variant(m, v)
                for m, v in zip(self.metadata, self.values)]

    def to_struct_column(self):
        """Arrow storage: struct<metadata: binary, value: binary>."""
        from .. import dtypes as dt
        from ..core.builders import BinaryBuilder, StructBuilder
        sb = StructBuilder((dt.Field("metadata", dt.binary),
                            dt.Field("value", dt.binary)),
                           [BinaryBuilder(), BinaryBuilder()])
        for m, v in zip(self.metadata, self.values):
            sb.field_builder(0).append(m)
            sb.field_builder(1).append(v)
            sb.append(m is not None)
        return sb.finish()

    @staticmethod
    def from_struct_column(col) -> "VariantColumn":
        data = col.to_pylist()
        mds, vals = [], []
        for row in data:
            if row is None:
                mds.append(None)
                vals.append(None)
            else:
                mds.append(row["metadata"])
                vals.append(row["value"])
        return VariantColumn(mds, vals)


_NULL_SLOT = object()


def variant_get(col: VariantColumn, path: Sequence) -> list:
    """Path extraction over a variant batch (parquet-variant-compute
    variant_get): path elements are object keys (str) or list indices
    (int); missing paths yield None."""
    out = []
    for m, v in zip(col.metadata, col.values):
        if v is None:
            out.append(None)
            continue
        cur = parse_variant(m, v)
        for p in path:
            if isinstance(p, str) and isinstance(cur, dict):
                cur = cur.get(p)
            elif isinstance(p, int) and isinstance(cur, list) \
                    and 0 <= p < len(cur):
                cur = cur[p]
            else:
                cur = None
            if cur is None:
                break
        out.append(cur)
    return out
