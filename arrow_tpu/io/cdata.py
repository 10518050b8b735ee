"""Arrow C Data Interface — real C-ABI ArrowSchema/ArrowArray structs.

Re-designs the reference's FFI layer (arrow-data/src/ffi.rs:39
FFI_ArrowArray, arrow-schema/src/ffi.rs FFI_ArrowSchema, arrow-array/
src/ffi.rs:256 to_ffi/from_ffi, arrow-pyarrow/src/lib.rs:88 PyCapsule
protocol) for this engine: the structs are built in ctypes memory with
format strings per the C data interface spec, exported/imported through
PyCapsules named "arrow_schema"/"arrow_array" — NO pyarrow types cross
the boundary (pyarrow is the test oracle only).

Engine specifics: dense bool validity masks pack to Arrow validity
BITMAPS on export and unpack on import; device (jax) buffers hop to
host numpy once per column.

  export_column(col)  -> (schema_capsule, array_capsule)
  import_column(caps) <- any producer's capsules
  export_table / import_table: a table is a struct array of its columns
  (the RecordBatch convention).  Column and Table grow
  __arrow_c_array__, so `pa.array(col)` / `pa.record_batch(t)` work
  directly.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import dtypes as dt
from ..core.column import (Column, DictionaryColumn, ListColumn,
                           NullColumn, PrimitiveColumn, StringColumn,
                           StructColumn)
from ..core.nested import (DecimalColumn, FixedSizeBinaryColumn,
                           FixedSizeListColumn, MapColumn)
from ..errors import ArrowInvalid, ArrowNotImplementedError

__all__ = ["export_column", "import_column", "export_table",
           "import_table", "export_stream", "import_stream"]


class ArrowSchema(ctypes.Structure):
    pass


class ArrowArray(ctypes.Structure):
    pass


_SCHEMA_RELEASE = ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowSchema))
_ARRAY_RELEASE = ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowArray))

ArrowSchema._fields_ = [
    ("format", ctypes.c_char_p),
    ("name", ctypes.c_char_p),
    ("metadata", ctypes.c_char_p),
    ("flags", ctypes.c_int64),
    ("n_children", ctypes.c_int64),
    ("children", ctypes.POINTER(ctypes.POINTER(ArrowSchema))),
    ("dictionary", ctypes.POINTER(ArrowSchema)),
    ("release", _SCHEMA_RELEASE),
    ("private_data", ctypes.c_void_p),
]

ArrowArray._fields_ = [
    ("length", ctypes.c_int64),
    ("null_count", ctypes.c_int64),
    ("offset", ctypes.c_int64),
    ("n_buffers", ctypes.c_int64),
    ("n_children", ctypes.c_int64),
    ("buffers", ctypes.POINTER(ctypes.c_void_p)),
    ("children", ctypes.POINTER(ctypes.POINTER(ArrowArray))),
    ("dictionary", ctypes.POINTER(ArrowArray)),
    ("release", _ARRAY_RELEASE),
    ("private_data", ctypes.c_void_p),
]

ARROW_FLAG_NULLABLE = 2

# exported trees stay alive until the consumer calls release()
_LIVE: Dict[int, object] = {}
_NEXT_ID = [1]


def _register(keepalive) -> int:
    token = _NEXT_ID[0]
    _NEXT_ID[0] += 1
    _LIVE[token] = keepalive
    return token


@_SCHEMA_RELEASE
def _schema_release(ptr):
    s = ptr.contents
    _LIVE.pop(int(s.private_data or 0), None)
    s.release = ctypes.cast(None, _SCHEMA_RELEASE)


@_ARRAY_RELEASE
def _array_release(ptr):
    a = ptr.contents
    _LIVE.pop(int(a.private_data or 0), None)
    a.release = ctypes.cast(None, _ARRAY_RELEASE)


# ---------------------------------------------------------------------------
# format strings (C data interface spec)
# ---------------------------------------------------------------------------

_PRIM_FMT = {
    "bool": "b", "int8": "c", "uint8": "C", "int16": "s", "uint16": "S",
    "int32": "i", "uint32": "I", "int64": "l", "uint64": "L",
    "float16": "e", "float32": "f", "float64": "g",
    "date32": "tdD", "date64": "tdm",
}
_FMT_PRIM = {v: k for k, v in _PRIM_FMT.items()}


def _fmt_for(d: dt.DataType) -> str:
    n = d.name
    if n == "null":
        return "n"
    if n in _PRIM_FMT:
        return _PRIM_FMT[n]
    if n == "utf8":
        return "u"
    if n == "large_utf8":
        return "U"
    if n == "binary":
        return "z"
    if n == "large_binary":
        return "Z"
    if n == "fixed_size_binary":
        return f"w:{d.list_size}"
    if n in ("decimal128", "decimal256"):
        bits = 128 if n == "decimal128" else 256
        suffix = "" if bits == 128 else f",{bits}"
        return f"d:{d.precision},{d.scale}{suffix}"
    if n == "timestamp":
        u = {"s": "s", "ms": "m", "us": "u", "ns": "n"}[d.unit]
        return f"ts{u}:{d.tz or ''}"
    if n == "time32":
        return "tts" if d.unit == "s" else "ttm"
    if n == "time64":
        return "ttu" if d.unit == "us" else "ttn"
    if n == "duration":
        u = {"s": "s", "ms": "m", "us": "u", "ns": "n"}[d.unit]
        return f"tD{u}"
    if n == "list":
        return "+l"
    if n == "large_list":
        return "+L"
    if n == "fixed_size_list":
        return f"+w:{d.list_size}"
    if n == "struct":
        return "+s"
    if n == "map":
        return "+m"
    raise ArrowNotImplementedError(f"C data export of {d!r}")


def _dtype_from_fmt(fmt: str) -> dt.DataType:
    if fmt in _FMT_PRIM:
        n = _FMT_PRIM[fmt]
        return dt.bool_ if n == "bool" else getattr(dt, n)
    if fmt == "n":
        return dt.null
    if fmt == "u":
        return dt.utf8
    if fmt == "U":
        return dt.large_utf8
    if fmt == "z":
        return dt.binary
    if fmt == "Z":
        return dt.large_binary
    if fmt.startswith("w:"):
        return dt.fixed_size_binary(int(fmt[2:]))
    if fmt.startswith("d:"):
        parts = fmt[2:].split(",")
        prec, scale = int(parts[0]), int(parts[1])
        if len(parts) > 2 and parts[2] == "256":
            return dt.decimal256(prec, scale)
        return dt.decimal128(prec, scale)
    if fmt.startswith("ts") and ":" in fmt:
        unit = {"s": "s", "m": "ms", "u": "us", "n": "ns"}[fmt[2]]
        tz = fmt.split(":", 1)[1] or None
        return dt.timestamp(unit, tz)
    if fmt in ("tts", "ttm"):
        return dt.time32("s" if fmt == "tts" else "ms")
    if fmt in ("ttu", "ttn"):
        return dt.time64("us" if fmt == "ttu" else "ns")
    if fmt.startswith("tD"):
        unit = {"s": "s", "m": "ms", "u": "us", "n": "ns"}[fmt[2]]
        return dt.duration(unit)
    raise ArrowNotImplementedError(f"C data import of format {fmt!r}")


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def _bitmap(validity, n: int) -> Optional[np.ndarray]:
    if validity is None:
        return None
    m = np.asarray(validity)
    return np.packbits(m, bitorder="little")


def _build_schema(d: dt.DataType, name: str, nullable: bool,
                  keep: list) -> ArrowSchema:
    s = ArrowSchema()
    fmt = _fmt_for(d).encode()
    nm = name.encode()
    keep.append(fmt)
    keep.append(nm)
    s.format = fmt
    s.name = nm
    s.metadata = None
    s.flags = ARROW_FLAG_NULLABLE if nullable else 0
    children: List[Tuple[str, dt.DataType, bool]] = []
    if d.name in ("list", "large_list", "fixed_size_list"):
        children = [("item", d.value_type, True)]
    elif d.name == "struct":
        children = [(f.name, f.dtype, f.nullable) for f in d.fields]
    elif d.name == "map":
        children = [("entries", d.value_type, False)]
    if children:
        arr = (ctypes.POINTER(ArrowSchema) * len(children))()
        for i, (cn, cd, cnul) in enumerate(children):
            ch = _build_schema(cd, cn, cnul, keep)
            keep.append(ch)
            arr[i] = ctypes.pointer(ch)
        keep.append(arr)
        s.children = arr
        s.n_children = len(children)
    else:
        s.children = None
        s.n_children = 0
    if d.name == "map":
        # entries struct is marked non-nullable; key field required
        pass
    s.dictionary = None
    s.release = _schema_release
    s.private_data = None
    return s


def _np_keep(keep: list, a: np.ndarray) -> int:
    a = np.ascontiguousarray(a)
    keep.append(a)
    return a.ctypes.data


def _build_array(col: Column, keep: list) -> ArrowArray:
    a = ArrowArray()
    n = len(col)
    a.length = n
    a.offset = 0
    a.dictionary = None
    a.release = _array_release
    a.private_data = None
    v = None if col.validity is None else np.asarray(col.validity)
    a.null_count = 0 if v is None else int(n - v.sum())
    bufs: List[Optional[int]] = []
    bm = _bitmap(col.validity, n)
    bufs.append(None if bm is None else _np_keep(keep, bm))
    children: List[Column] = []

    if isinstance(col, NullColumn):
        bufs = [None]
        a.null_count = n
    elif isinstance(col, PrimitiveColumn):
        vals = np.asarray(col.values)
        if col.dtype.name == "bool":
            vals = np.packbits(vals.astype(bool), bitorder="little")
        bufs.append(_np_keep(keep, vals))
    elif isinstance(col, DecimalColumn):
        bufs.append(_np_keep(keep, np.asarray(col.limbs)))
    elif isinstance(col, FixedSizeBinaryColumn):
        bufs.append(_np_keep(keep, np.asarray(col.data)))
    elif isinstance(col, StringColumn):
        offs = np.asarray(col.offsets)
        width = np.int64 if col.dtype.name.startswith("large") \
            else np.int32
        bufs.append(_np_keep(keep, offs.astype(width, copy=False)))
        data = np.asarray(col.data)
        bufs.append(_np_keep(keep, data if len(data) else
                             np.zeros(1, np.uint8)))
    elif isinstance(col, (ListColumn, MapColumn)):
        offs = np.asarray(col.offsets)
        width = np.int64 if col.dtype.name == "large_list" else np.int32
        bufs.append(_np_keep(keep, offs.astype(width, copy=False)))
        children = [col.entries if isinstance(col, MapColumn)
                    else col.child]
    elif isinstance(col, FixedSizeListColumn):
        children = [col.child]
    elif isinstance(col, StructColumn):
        children = list(col.children)
    else:
        raise ArrowNotImplementedError(
            f"C data export of {type(col).__name__}")

    buf_arr = (ctypes.c_void_p * len(bufs))(
        *[ctypes.c_void_p(b) for b in bufs])
    keep.append(buf_arr)
    a.buffers = buf_arr
    a.n_buffers = len(bufs)
    if children:
        arr = (ctypes.POINTER(ArrowArray) * len(children))()
        for i, ch in enumerate(children):
            ca = _build_array(ch, keep)
            keep.append(ca)
            arr[i] = ctypes.pointer(ca)
        keep.append(arr)
        a.children = arr
        a.n_children = len(children)
    else:
        a.children = None
        a.n_children = 0
    return a


_PyCapsule_New = ctypes.pythonapi.PyCapsule_New
_PyCapsule_New.restype = ctypes.py_object
_PyCapsule_New.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                           ctypes.c_void_p]
_PyCapsule_GetPointer = ctypes.pythonapi.PyCapsule_GetPointer
_PyCapsule_GetPointer.restype = ctypes.c_void_p
_PyCapsule_GetPointer.argtypes = [ctypes.py_object, ctypes.c_char_p]


def _capsule(struct, name: bytes):
    return _PyCapsule_New(ctypes.byref(struct), name, None)


def export_column(col: Column, name: str = "",
                  nullable: bool = True):
    """-> (schema_capsule, array_capsule) for any consumer.

    Schema and array keep SEPARATE keepalives: consumers routinely
    release the schema immediately after copying it while the array
    outlives it (move semantics, C data interface spec)."""
    skeep: list = []
    akeep: list = []
    s = _build_schema(col.dtype, name, nullable, skeep)
    a = _build_array(col, akeep)
    skeep.append(s)
    akeep.append(a)
    s.private_data = _register(skeep)
    a.private_data = _register(akeep)
    return (_capsule(s, b"arrow_schema"), _capsule(a, b"arrow_array"))


def export_table(table):
    """Table -> capsules of a struct array of its columns (the
    RecordBatch convention understood by pa.RecordBatch)."""
    sc = StructColumn(tuple(table.columns),
                      tuple(table.schema.fields))
    return export_column(sc, "", False)


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------

def _read_buffer(ptr: int, dtype, count: int) -> np.ndarray:
    if count == 0:
        return np.zeros(0, dtype)
    buf = (ctypes.c_char * (np.dtype(dtype).itemsize * count)) \
        .from_address(ptr)
    return np.frombuffer(bytes(buf), dtype=dtype)


def _unpack_bitmap(ptr: int, n: int) -> Optional[np.ndarray]:
    if not ptr or n == 0:
        return None
    raw = _read_buffer(ptr, np.uint8, (n + 7) // 8)
    return np.unpackbits(raw, bitorder="little")[:n].astype(bool)


def _import_schema(s: ArrowSchema):
    fmt = s.format.decode()
    name = (s.name or b"").decode()
    nullable = bool(s.flags & ARROW_FLAG_NULLABLE)
    kids = [_import_schema(s.children[i].contents)
            for i in range(s.n_children)]
    if fmt == "+s":
        d = dt.struct([dt.Field(kn, kd, knul)
                       for kn, kd, knul in kids])
    elif fmt in ("+l", "+L"):
        d = (dt.list_ if fmt == "+l" else dt.large_list)(kids[0][1])
    elif fmt.startswith("+w:"):
        d = dt.fixed_size_list(kids[0][1], int(fmt[3:]))
    elif fmt == "+m":
        kv = kids[0][1]
        d = dt.map_(kv.fields[0].dtype, kv.fields[1].dtype)
    elif fmt.startswith("+"):
        raise ArrowNotImplementedError(f"C data import of {fmt!r}")
    else:
        d = _dtype_from_fmt(fmt)
    return name, d, nullable


def _import_array(a: ArrowArray, d: dt.DataType) -> Column:
    import jax.numpy as jnp
    n = int(a.length)
    off = int(a.offset)
    if off:
        raise ArrowNotImplementedError("non-zero offset C arrays")

    def buf(i):
        return int(a.buffers[i]) if a.buffers and i < a.n_buffers \
            and a.buffers[i] else 0

    validity = _unpack_bitmap(buf(0), n) \
        if int(a.null_count) != 0 else None
    nm = d.name
    if nm == "null":
        return NullColumn(n)
    if nm == "bool":
        raw = _read_buffer(buf(1), np.uint8, (n + 7) // 8)
        vals = np.unpackbits(raw, bitorder="little")[:n].astype(bool)
        return PrimitiveColumn(vals, d, validity)
    if nm in ("decimal128", "decimal256"):
        k = 2 if nm == "decimal128" else 4
        limbs = _read_buffer(buf(1), np.uint64, n * k).reshape(n, k)
        return DecimalColumn(limbs, d, validity)
    if nm == "fixed_size_binary":
        data = _read_buffer(buf(1), np.uint8, n * d.list_size) \
            .reshape(n, d.list_size)
        return FixedSizeBinaryColumn(data, validity)
    if nm in ("utf8", "large_utf8", "binary", "large_binary"):
        width = np.int64 if nm.startswith("large") else np.int32
        offs = _read_buffer(buf(1), width, n + 1)
        nbytes = int(offs[-1]) if n else 0
        data = _read_buffer(buf(2), np.uint8, nbytes)
        return StringColumn(offs, data, d, validity)
    if nm in ("list", "large_list"):
        width = np.int64 if nm == "large_list" else np.int32
        offs = _read_buffer(buf(1), width, n + 1)
        child = _import_array(a.children[0].contents, d.value_type)
        return ListColumn(offs, child, validity)
    if nm == "fixed_size_list":
        child = _import_array(a.children[0].contents, d.value_type)
        return FixedSizeListColumn(child, d.list_size, validity)
    if nm == "map":
        offs = _read_buffer(buf(1), np.int32, n + 1)
        entries = _import_array(a.children[0].contents, d.value_type)
        return MapColumn(offs, entries, validity)
    if nm == "struct":
        kids = tuple(_import_array(a.children[i].contents,
                                   f.dtype)
                     for i, f in enumerate(d.fields))
        return StructColumn(kids, tuple(d.fields), validity)
    # fixed-width primitive
    vals = _read_buffer(buf(1), d.to_numpy(), n)
    return PrimitiveColumn(vals, d, validity)


def _caps_from(obj):
    if isinstance(obj, tuple):
        return obj
    if hasattr(obj, "__arrow_c_array__"):
        return obj.__arrow_c_array__()
    raise ArrowInvalid(f"no C data interface on {type(obj)}")


def import_column(obj) -> Column:
    """(schema_capsule, array_capsule) or any object with
    __arrow_c_array__ -> engine Column (data copied; the producer's
    release is then called)."""
    sc, ac = _caps_from(obj)
    sp = ctypes.cast(_PyCapsule_GetPointer(sc, b"arrow_schema"),
                     ctypes.POINTER(ArrowSchema))
    ap = ctypes.cast(_PyCapsule_GetPointer(ac, b"arrow_array"),
                     ctypes.POINTER(ArrowArray))
    _, d, _ = _import_schema(sp.contents)
    col = _import_array(ap.contents, d)
    if ap.contents.release:
        ap.contents.release(ap)
    if sp.contents.release:
        sp.contents.release(sp)
    return col


def import_table(obj):
    """Struct-array capsules (RecordBatch convention) -> Table."""
    from ..core.table import Table
    col = import_column(obj)
    if not isinstance(col, StructColumn):
        raise ArrowInvalid("import_table expects a struct array")
    return Table(tuple(col.children), dt.Schema(tuple(col.fields)))


# ---------------------------------------------------------------------------
# ArrowArrayStream (arrow-array/src/ffi_stream.rs:87 role)
# ---------------------------------------------------------------------------

class ArrowArrayStream(ctypes.Structure):
    pass


_GET_SCHEMA = ctypes.CFUNCTYPE(ctypes.c_int,
                               ctypes.POINTER(ArrowArrayStream),
                               ctypes.POINTER(ArrowSchema))
_GET_NEXT = ctypes.CFUNCTYPE(ctypes.c_int,
                             ctypes.POINTER(ArrowArrayStream),
                             ctypes.POINTER(ArrowArray))
_GET_LAST_ERROR = ctypes.CFUNCTYPE(ctypes.c_char_p,
                                   ctypes.POINTER(ArrowArrayStream))
_STREAM_RELEASE = ctypes.CFUNCTYPE(None,
                                   ctypes.POINTER(ArrowArrayStream))

ArrowArrayStream._fields_ = [
    ("get_schema", _GET_SCHEMA),
    ("get_next", _GET_NEXT),
    ("get_last_error", _GET_LAST_ERROR),
    ("release", _STREAM_RELEASE),
    ("private_data", ctypes.c_void_p),
]

# stream state: token -> {"batches": [...], "pos": int, "schema": dtype
# struct-source}
_STREAMS: Dict[int, dict] = {}


@_GET_SCHEMA
def _stream_get_schema(sp, out):
    st = _STREAMS.get(int(sp.contents.private_data or 0))
    if st is None:
        return 5                       # EIO
    keep: list = []
    s = _build_schema(st["dtype"], "", False, keep)
    keep.append(s)
    s.private_data = _register(keep)
    ctypes.memmove(out, ctypes.byref(s), ctypes.sizeof(ArrowSchema))
    return 0


@_GET_NEXT
def _stream_get_next(sp, out):
    st = _STREAMS.get(int(sp.contents.private_data or 0))
    if st is None:
        return 5
    if st["pos"] >= len(st["batches"]):
        # end of stream: released out marks exhaustion
        ctypes.memset(out, 0, ctypes.sizeof(ArrowArray))
        return 0
    col = st["batches"][st["pos"]]
    st["pos"] += 1
    keep: list = []
    a = _build_array(col, keep)
    keep.append(a)
    a.private_data = _register(keep)
    ctypes.memmove(out, ctypes.byref(a), ctypes.sizeof(ArrowArray))
    return 0


@_GET_LAST_ERROR
def _stream_get_last_error(sp):
    return None


@_STREAM_RELEASE
def _stream_release(sp):
    s = sp.contents
    _STREAMS.pop(int(s.private_data or 0), None)
    _LIVE.pop(int(s.private_data or 0), None)
    s.release = ctypes.cast(None, _STREAM_RELEASE)


def export_stream(tables) -> object:
    """Tables/batches -> "arrow_array_stream" capsule (each batch a
    struct array; pa.table() and pa.RecordBatchReader consume it)."""
    batches = []
    d = None
    for t in tables:
        sc = StructColumn(tuple(t.columns), tuple(t.schema.fields))
        batches.append(sc)
        d = sc.dtype
    if d is None:
        raise ArrowInvalid("export_stream needs at least one batch")
    stream = ArrowArrayStream()
    stream.get_schema = _stream_get_schema
    stream.get_next = _stream_get_next
    stream.get_last_error = _stream_get_last_error
    stream.release = _stream_release
    token = _register([stream])
    stream.private_data = token
    _STREAMS[token] = {"batches": batches, "pos": 0, "dtype": d}
    return _capsule(stream, b"arrow_array_stream")


def import_stream(obj):
    """"arrow_array_stream" capsule (or object with
    __arrow_c_stream__) -> list of Tables, one per batch."""
    cap = obj.__arrow_c_stream__() \
        if hasattr(obj, "__arrow_c_stream__") else obj
    sp = ctypes.cast(
        _PyCapsule_GetPointer(cap, b"arrow_array_stream"),
        ctypes.POINTER(ArrowArrayStream))
    st = sp.contents
    from ..core.table import Table
    s_out = ArrowSchema()
    if st.get_schema(sp, ctypes.byref(s_out)) != 0:
        raise ArrowInvalid("stream get_schema failed")
    _, d, _ = _import_schema(s_out)
    if s_out.release:
        s_out.release(ctypes.byref(s_out))
    if d.name != "struct":
        raise ArrowInvalid("import_stream expects struct batches")
    out = []
    while True:
        a_out = ArrowArray()
        if st.get_next(sp, ctypes.byref(a_out)) != 0:
            raise ArrowInvalid("stream get_next failed")
        if not a_out.release:
            break
        col = _import_array(a_out, d)
        a_out.release(ctypes.byref(a_out))
        out.append(Table(tuple(col.children),
                         dt.Schema(tuple(col.fields))))
    if st.release:
        st.release(sp)
    return out
