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

from ..errors import ArrowInvalid, ArrowNotImplementedError

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
        self._packed = None            # lazy (vals, voffs, metas, moffs)

    def __len__(self):
        return len(self.values)

    def packed(self):
        """(values u8, value offsets i64, metas u8, meta offsets i64),
        cached — the columnar kernels' input form."""
        if self._packed is None:
            self._packed = _pack(self.values) + _pack(self.metadata)
        return self._packed

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


def _pack(parts: Sequence[Optional[bytes]]):
    """list of bytes|None -> (packed u8 array, i64 offsets); None rows
    are empty ranges.  One C-level join, no per-row numpy."""
    import numpy as np
    lens = np.fromiter((len(b) if b is not None else 0
                        for b in parts), np.int64, len(parts))
    offs = np.zeros(len(parts) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    joined = b"".join(b for b in parts if b)
    return np.frombuffer(joined, np.uint8), offs


def _walk_path(col: VariantColumn, path: Sequence):
    """C path walk -> (packed values u8, out_start i64, out_len i64);
    len -1 marks missing/null rows."""
    import ctypes
    import numpy as np
    from ..utils import native as nt
    lib = nt._req_lib()
    if not getattr(lib, "_variant_bound", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.variant_get_path.argtypes = [u8p, i64p, u8p, i64p, i64,
                                         i64, u8p, i64p, i64p, u8p,
                                         i64p, i64p]
        lib.variant_get_path.restype = i64
        lib._variant_bound = True
    vals, voffs, metas, moffs = col.packed()
    n_steps = len(path)
    kinds = np.zeros(max(n_steps, 1), np.uint8)
    idxs = np.zeros(max(n_steps, 1), np.int64)
    kstarts = np.zeros(n_steps + 1, np.int64)
    key_parts = []
    for k, p in enumerate(path):
        if isinstance(p, str):
            kb = p.encode()
            key_parts.append(kb)
            kinds[k] = 0
        elif isinstance(p, int):
            key_parts.append(b"")
            kinds[k] = 1
            idxs[k] = p
        else:
            raise ArrowInvalid(f"variant path element {p!r}")
        kstarts[k + 1] = kstarts[k] + len(key_parts[-1])
    keys_buf = np.frombuffer(b"".join(key_parts) or b"\0", np.uint8)
    n = len(col)
    out_start = np.zeros(n, np.int64)
    out_len = np.zeros(n, np.int64)
    rc = lib.variant_get_path(
        nt._u8(vals), nt._i64p(voffs), nt._u8(metas), nt._i64p(moffs),
        n, n_steps, nt._u8(kinds), nt._i64p(idxs), nt._i64p(kstarts),
        nt._u8(keys_buf), nt._i64p(out_start), nt._i64p(out_len))
    if rc != 0:
        raise ArrowInvalid(f"malformed variant at row {-rc - 1}")
    return vals, out_start, out_len


def variant_get_column(col: VariantColumn, path: Sequence
                       ) -> VariantColumn:
    """Columnar path extraction -> VariantColumn (variant_get.rs:35
    with as_type=None).  The sub-value bytes slice out of the original
    buffers; metadata is shared with the source row (field ids keep
    referencing the source dictionary, which remains valid)."""
    vals, out_start, out_len = _walk_path(col, path)
    raw = vals.tobytes()
    values = [None if out_len[i] < 0
              else raw[out_start[i]:out_start[i] + out_len[i]]
              for i in range(len(col))]
    metas = [m if values[i] is not None else None
             for i, m in enumerate(col.metadata)]
    return VariantColumn(metas, values)


def variant_get_typed(col: VariantColumn, path: Sequence, as_type):
    """Columnar path extraction decoded straight to an engine column
    (variant_get.rs GetOptions.as_type — the reference leaves this arm
    NotYetImplemented; supported here for int64/float64/bool/utf8).
    Mismatched leaves decode as null (CastOptions safe behavior)."""
    import numpy as np
    import jax.numpy as jnp
    from .. import dtypes as dt
    from ..core.column import PrimitiveColumn, StringColumn
    vals, start, ln = _walk_path(col, path)
    n = len(col)
    present = ln >= 0
    pos = np.where(present, start, 0)
    hdr = vals[pos] if len(vals) else np.zeros(n, np.uint8)
    basic = hdr & 3
    tid = hdr >> 2
    name = as_type.name if hasattr(as_type, "name") else str(as_type)
    if name == "int64":
        # one C range-gather into an 8B/row little-endian plane, then a
        # vectorized sign-extend — no per-width fancy gathers
        width = np.zeros(n, np.int64)
        for t, w in ((_P_INT8, 1), (_P_INT16, 2), (_P_INT32, 4),
                     (_P_INT64, 8)):
            width[present & (basic == 0) & (tid == t)] = w
        valid = width > 0
        raw = np.zeros(n * 8, np.uint8)
        from ..utils import native as nt
        nt.gather_ranges(vals, pos + 1, width,
                         np.arange(n, dtype=np.int64) * 8, raw)
        v = raw.view(np.uint64)
        bits = (width * 8).astype(np.uint64)
        sign = np.zeros(n, bool)
        nz = width > 0
        sign[nz] = (raw.reshape(n, 8)[nz, width[nz] - 1] & 0x80) != 0
        ext = np.where(width < 8,
                       (~np.uint64(0)) << np.minimum(bits, 63), 0)
        out = np.where(sign & (width < 8), v | ext, v).view(np.int64)
        out = np.where(valid, out, 0)
        return PrimitiveColumn(jnp.asarray(out), dt.int64,
                               jnp.asarray(valid)
                               if not valid.all() else None)
    if name == "float64":
        out = np.zeros(n, np.float64)
        valid = np.zeros(n, bool)
        m = present & (basic == 0) & (tid == _P_DOUBLE)
        if m.any():
            idx = pos[m, None] + 1 + np.arange(8)
            out[m] = np.ascontiguousarray(
                vals[np.minimum(idx, len(vals) - 1)]).view(
                np.float64).ravel()
            valid[m] = True
        m = present & (basic == 0) & (tid == _P_FLOAT)
        if m.any():
            idx = pos[m, None] + 1 + np.arange(4)
            out[m] = np.ascontiguousarray(
                vals[np.minimum(idx, len(vals) - 1)]).view(
                np.float32).ravel().astype(np.float64)
            valid[m] = True
        return PrimitiveColumn(jnp.asarray(out), dt.float64,
                               jnp.asarray(valid)
                               if not valid.all() else None)
    if name == "bool":
        m = present & (basic == 0) & ((tid == _P_TRUE)
                                      | (tid == _P_FALSE))
        out = (tid == _P_TRUE) & m
        return PrimitiveColumn(jnp.asarray(out), dt.bool_,
                               jnp.asarray(m) if not m.all() else None)
    if name in ("utf8", "large_utf8"):
        short = present & (basic == 1)
        longs = present & (basic == 0) & (tid == _P_STRING)
        valid = short | longs
        slen = np.where(short, (hdr >> 2).astype(np.int64), 0)
        if longs.any():
            lidx = pos[longs, None] + 1 + np.arange(4)
            lw = np.ascontiguousarray(
                vals[np.minimum(lidx, len(vals) - 1)]).view(
                np.uint32).ravel().astype(np.int64)
            slen[longs] = lw
        data_pos = np.where(short, pos + 1,
                            np.where(longs, pos + 5, 0))
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(slen, out=offs[1:])
        total = int(offs[-1])
        out = np.zeros(total, np.uint8)
        from ..utils import native as nt
        nt.gather_ranges(vals, data_pos, slen, offs, out)
        return StringColumn(jnp.asarray(offs.astype(np.int32)),
                            jnp.asarray(out), dt.utf8,
                            jnp.asarray(valid)
                            if not valid.all() else None)
    raise ArrowNotImplementedError(f"variant_get as_type {name}")


def variant_get(col: VariantColumn, path: Sequence) -> list:
    """Path extraction over a variant batch -> Python values
    (variant_get.rs role, list form for tests/oracles).  The walk runs
    in C; only the surviving leaves decode through the Python parser."""
    sub = variant_get_column(col, path)
    return sub.to_pylist()


# ---------------------------------------------------------------------------
# shredding: VariantColumn <-> struct-of-binary (+ typed_value) <-> parquet
# (parquet-variant-compute/src/variant_array.rs:55 — the reference's
# VariantArray is a StructArray of metadata/value binaries whose shredding
# arm is NotYetImplemented; here shredding to a typed_value leaf per the
# Parquet Variant Shredding spec is implemented for the primitive types
# variant_get_typed covers)
# ---------------------------------------------------------------------------

_SHRED_TYPES = ("int64", "float64", "bool", "utf8")


def _binary_column(parts: Sequence[Optional[bytes]], dtype=None):
    """list of bytes|None -> engine binary column (None -> null row)."""
    import jax.numpy as jnp
    from .. import dtypes as dt
    from ..core.column import StringColumn
    data, offs = _pack(parts)
    valid = np.fromiter((p is not None for p in parts), bool,
                        len(parts))
    return StringColumn(jnp.asarray(offs.astype(np.int32)),
                        jnp.asarray(data), dtype or dt.binary,
                        jnp.asarray(valid) if not valid.all() else None)


def _binary_rows(col) -> List[Optional[bytes]]:
    """engine binary column -> list of bytes|None."""
    offs = np.asarray(col.offsets).astype(np.int64)
    raw = np.asarray(col.data).tobytes()
    valid = (np.asarray(col.validity) if col.validity is not None
             else None)
    return [raw[offs[i]:offs[i + 1]]
            if valid is None or valid[i] else None
            for i in range(len(offs) - 1)]


def variant_struct_fields(shred_type=None):
    """Field layout of the Arrow/parquet representation: metadata
    (required), value (optional), typed_value (optional, shredded)."""
    from .. import dtypes as dt
    fields = [dt.Field("metadata", dt.binary, False),
              dt.Field("value", dt.binary, True)]
    if shred_type is not None:
        fields.append(dt.Field("typed_value", shred_type, True))
    return tuple(fields)


def variant_to_struct(col: VariantColumn, shred_type=None):
    """VariantColumn -> StructColumn of metadata/value[/typed_value].
    With shred_type, rows whose value IS that primitive move to the
    typed_value leaf and their value slot becomes null (Variant
    Shredding spec: value and typed_value never both set)."""
    import jax.numpy as jnp
    from ..core.column import StructColumn
    n = len(col)
    row_valid = np.fromiter((v is not None for v in col.values),
                            bool, n)
    metas = [m if m is not None else b"" for m in col.metadata]
    typed = None
    values = list(col.values)
    if shred_type is not None:
        name = (shred_type.name if hasattr(shred_type, "name")
                else str(shred_type))
        if name not in _SHRED_TYPES:
            raise ArrowNotImplementedError(
                f"variant shredding to {name}")
        typed = variant_get_typed(col, [], shred_type)
        tv = (np.asarray(typed.validity) if typed.validity is not None
              else np.ones(n, bool))
        values = [None if tv[i] else values[i] for i in range(n)]
    children = [_binary_column(metas), _binary_column(values)]
    fields = variant_struct_fields(shred_type)
    if typed is not None:
        children.append(typed)
    return StructColumn(tuple(children), fields,
                        jnp.asarray(row_valid)
                        if not row_valid.all() else None)


def _encode_typed_rows(typed, rows: np.ndarray) -> List[bytes]:
    """Re-encode typed_value leaves (engine column) at `rows` back into
    variant value bytes, vectorized per type."""
    name = typed.dtype.name
    k = len(rows)
    if name == "int64":
        vals = np.asarray(typed.values)[rows].astype("<i8")
        raw = np.zeros((k, 9), np.uint8)
        raw[:, 0] = _P_INT64 << 2
        raw[:, 1:] = vals.view(np.uint8).reshape(k, 8)
        b = raw.tobytes()
        return [b[i * 9:i * 9 + 9] for i in range(k)]
    if name == "float64":
        vals = np.asarray(typed.values)[rows].astype("<f8")
        raw = np.zeros((k, 9), np.uint8)
        raw[:, 0] = _P_DOUBLE << 2
        raw[:, 1:] = vals.view(np.uint8).reshape(k, 8)
        b = raw.tobytes()
        return [b[i * 9:i * 9 + 9] for i in range(k)]
    if name == "bool":
        vals = np.asarray(typed.values)[rows]
        t, f = bytes([_P_TRUE << 2]), bytes([_P_FALSE << 2])
        return [t if v else f for v in vals]
    if name in ("utf8", "large_utf8"):
        offs = np.asarray(typed.offsets).astype(np.int64)
        data = np.asarray(typed.data)
        starts, lens = offs[rows], offs[rows + 1] - offs[rows]
        short = lens < 64
        out_len = np.where(short, 1 + lens, 5 + lens)
        out_offs = np.zeros(k + 1, np.int64)
        np.cumsum(out_len, out=out_offs[1:])
        out = np.zeros(int(out_offs[-1]), np.uint8)
        out[out_offs[:-1]] = np.where(
            short, (lens << 2) | 1, _P_STRING << 2)
        le = out_offs[:-1][~short]
        if len(le):
            lw = lens[~short].astype("<u4").view(np.uint8).reshape(-1, 4)
            for j in range(4):
                out[le + 1 + j] = lw[:, j]
        from ..utils import native as nt
        nt.gather_ranges(data, starts, lens,
                         out_offs[:-1] + np.where(short, 1, 5), out)
        raw = out.tobytes()
        return [raw[out_offs[i]:out_offs[i + 1]] for i in range(k)]
    raise ArrowNotImplementedError(f"variant unshred of {name}")


def variant_from_struct(sc) -> VariantColumn:
    """StructColumn of metadata/value[/typed_value] -> VariantColumn
    (unshred: typed_value rows re-encode to variant bytes)."""
    names = [f.name for f in sc.fields]
    meta_c = sc.children[names.index("metadata")]
    val_c = sc.children[names.index("value")]
    typed = (sc.children[names.index("typed_value")]
             if "typed_value" in names else None)
    n = len(meta_c)
    row_valid = (np.asarray(sc.validity) if sc.validity is not None
                 else np.ones(n, bool))
    metas = _binary_rows(meta_c)
    values = _binary_rows(val_c)
    if typed is not None:
        tvalid = (np.asarray(typed.validity)
                  if typed.validity is not None else np.ones(n, bool))
        rows = np.nonzero(row_valid & tvalid
                          & np.fromiter((v is None for v in values),
                                        bool, n))[0]
        if len(rows):
            enc = _encode_typed_rows(typed, rows)
            for j, i in enumerate(rows):
                values[i] = enc[j]
    out_m, out_v = [], []
    for i in range(n):
        if not row_valid[i] or values[i] is None:
            out_m.append(None)
            out_v.append(None)
        else:
            out_m.append(metas[i] if metas[i] else b"\x01\x00\x00")
            out_v.append(values[i])
    return VariantColumn(out_m, out_v)


def write_variant_parquet(sink, col: VariantColumn, name: str = "v",
                          shred_type=None, **props):
    """Write a VariantColumn to a native parquet file as a VARIANT-
    annotated group (LogicalType VariantType, parquet.thrift field 16)
    of metadata/value[/typed_value] — the shredded layout the reference
    defines but does not yet implement (variant_array.rs:55)."""
    from .. import dtypes as dt
    from ..core.table import Table
    from .parquet_writer import write_parquet_native
    sc = variant_to_struct(col, shred_type)
    field = dt.Field(
        name, dt.struct(sc.fields), True,
        metadata=(("ARROW:extension:name", "arrow.variant"),))
    write_parquet_native(sink, Table([sc], dt.Schema((field,))),
                         **props)


def read_variant_parquet(src, name: Optional[str] = None
                         ) -> VariantColumn:
    """Read a VARIANT-annotated (or metadata/value-shaped) group from a
    native parquet file back into a VariantColumn."""
    from .parquet_native import read_parquet_native
    t = read_parquet_native(src)
    for i, f in enumerate(t.schema.fields):
        if name is not None and f.name != name:
            continue
        d = f.dtype
        if d.name == "struct" and {ff.name for ff in d.fields} >= \
                {"metadata", "value"}:
            return variant_from_struct(t.columns[i])
    raise ArrowInvalid("no variant column in file")
