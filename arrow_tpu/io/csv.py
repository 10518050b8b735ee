"""CSV read/write — native typed parser (the arrow-csv role).

Round-2 native rewrite: the indexing pass (RFC 4180 quotes) and every
typed field parser run in C (native/hostcodec.cpp csv_* functions) —
re-designing the reference's own typed parser rather than delegating to
Arrow C++:

  ReaderBuilder + schema inference   arrow-csv/src/reader/mod.rs:309,410
  push Decoder                       reader/mod.rs:555
  WriterBuilder                      arrow-csv/src/writer.rs:191

Inference probes each column with the typed parsers in the reference's
order (bool -> int64 -> float64 -> date32 -> timestamp -> utf8); a
column is a type iff every non-empty sampled field parses.
"""

from __future__ import annotations

import io as _io
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..core.column import Column, PrimitiveColumn, StringColumn
from ..core.table import Table
from ..errors import ArrowInvalid
from ..utils import native as nt

__all__ = ["ReaderBuilder", "Decoder", "WriterBuilder", "read_csv",
           "write_csv", "infer_schema"]

_UNIT_SCALE = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


def _as_bytes(source) -> bytes:
    if isinstance(source, bytes):
        return source
    if isinstance(source, str):
        if "\n" in source or "," in source and not _looks_path(source):
            return source.encode("utf-8")
        with open(source, "rb") as f:
            return f.read()
    if hasattr(source, "read"):
        data = source.read()
        return data.encode("utf-8") if isinstance(data, str) else data
    raise ArrowInvalid(f"cannot read CSV from {type(source)}")


def _looks_path(s: str) -> bool:
    import os
    return os.path.exists(s)


class _Indexed:
    """Field bounds for a CSV byte buffer."""

    def __init__(self, data: bytes, delimiter: str = ",",
                 quote: str = '"'):
        lib = nt.csv_lib()
        self.data = np.frombuffer(data, np.uint8)
        cap = max(len(data) // 2 + 16, 64)
        while True:
            starts = np.zeros(cap, np.int64)
            ends = np.zeros(cap, np.int64)
            escaped = np.zeros(cap, np.uint8)
            nrows = np.zeros(1, np.int64)
            ncols = np.zeros(1, np.int64)
            nf = lib.csv_index(
                nt._u8(self.data), len(self.data),
                ord(delimiter), ord(quote),
                nt._i64p(starts), nt._i64p(ends), nt._u8(escaped), cap,
                nt._i64p(nrows), nt._i64p(ncols))
            if nf == -1:
                cap *= 2
                continue
            if nf == -2:
                raise ArrowInvalid(
                    "ragged CSV: rows have differing field counts")
            break
        self.n_fields = int(nf)
        self.n_rows = int(nrows[0])
        self.n_cols = int(ncols[0])
        self.starts = starts[:self.n_fields]
        self.ends = ends[:self.n_fields]
        self.escaped = escaped[:self.n_fields]

    def column_bounds(self, col: int, row0: int, nrows: int):
        idx = (np.arange(row0, row0 + nrows) * self.n_cols + col)
        return (np.ascontiguousarray(self.starts[idx]),
                np.ascontiguousarray(self.ends[idx]),
                np.ascontiguousarray(self.escaped[idx]))


def _try_parse(kind: str, data: np.ndarray, starts, ends,
               unit: str = "us"):
    """-> (values, valid) or None when some field fails to parse."""
    lib = nt.csv_lib()
    n = len(starts)
    valid = np.zeros(n, np.uint8)
    if kind == "int64":
        out = np.zeros(n, np.int64)
        bad = lib.csv_parse_i64(nt._u8(data), nt._i64p(starts),
                                nt._i64p(ends), n, nt._i64p(out),
                                nt._u8(valid))
    elif kind == "float64":
        out = np.zeros(n, np.float64)
        bad = lib.csv_parse_f64(nt._u8(data), nt._i64p(starts),
                                nt._i64p(ends), n,
                                out.ctypes.data_as(
                                    __import__("ctypes").POINTER(
                                        __import__("ctypes").c_double)),
                                nt._u8(valid))
    elif kind == "bool":
        out = np.zeros(n, np.uint8)
        bad = lib.csv_parse_bool(nt._u8(data), nt._i64p(starts),
                                 nt._i64p(ends), n, nt._u8(out),
                                 nt._u8(valid))
        out = out.astype(np.bool_)
    elif kind in ("date32", "timestamp"):
        out = np.zeros(n, np.int64)
        scale = 86_400 * 1_000_000_000 if kind == "date32" \
            else _UNIT_SCALE[unit]
        bad = lib.csv_parse_timestamp(
            nt._u8(data), nt._i64p(starts), nt._i64p(ends), n, scale,
            1 if kind == "date32" else 0, nt._i64p(out), nt._u8(valid))
        if kind == "date32":
            out = out.astype(np.int32)
    else:
        raise ArrowInvalid(kind)
    if bad >= 0:
        return None
    return out, valid.astype(bool)


def _parse_column(idx: _Indexed, col: int, row0: int, nrows: int,
                  d: dt.DataType) -> Column:
    starts, ends, escaped = idx.column_bounds(col, row0, nrows)
    name = d.name
    if name in ("utf8", "large_utf8", "binary", "large_binary"):
        lib = nt.csv_lib()
        offs = np.zeros(nrows + 1, np.int64)
        cap = int((ends - starts).sum()) + 1
        out = np.zeros(cap, np.uint8)
        lib.csv_extract(nt._u8(idx.data), nt._i64p(starts),
                        nt._i64p(ends), nt._u8(escaped), nrows,
                        ord('"'), nt._i64p(offs), nt._u8(out))
        # empty fields are empty strings, not null (reference behavior)
        return StringColumn(jnp.asarray(offs.astype(np.int32)),
                            jnp.asarray(out[:int(offs[-1])]), d)
    kind = {"bool": "bool", "int64": "int64", "int32": "int64",
            "int16": "int64", "int8": "int64", "uint8": "int64",
            "uint16": "int64", "uint32": "int64", "uint64": "int64",
            "float64": "float64", "float32": "float64",
            "date32": "date32", "timestamp": "timestamp"}.get(name)
    if kind is None:
        raise ArrowInvalid(f"CSV parse into {d!r} unsupported")
    r = _try_parse(kind, idx.data, starts, ends,
                   d.unit if name == "timestamp" else "us")
    if r is None:
        raise ArrowInvalid(f"column {col}: unparseable as {d!r}")
    vals, valid = r
    vals = vals.astype(d.to_numpy(), copy=False)
    mask = None if valid.all() else jnp.asarray(valid)
    return PrimitiveColumn(jnp.asarray(vals), d, mask,
                           _canonical=mask is None)


_INFER_ORDER = ("bool", "int64", "float64", "date32", "timestamp")
_INFER_DT = {"bool": dt.bool_, "int64": dt.int64, "float64": dt.float64,
             "date32": dt.date32, "timestamp": dt.timestamp("us")}


def _infer_column(idx: _Indexed, col: int, row0: int, nrows: int,
                  sample: int) -> dt.DataType:
    m = min(nrows, sample)
    starts, ends, _ = idx.column_bounds(col, row0, m)
    nonempty = starts < ends
    if not nonempty.any():
        return dt.utf8
    for kind in _INFER_ORDER:
        if _try_parse(kind, idx.data, starts, ends) is not None:
            return _INFER_DT[kind]
    return dt.utf8


def _header_names(idx: _Indexed) -> List[str]:
    data = idx.data.tobytes()
    names = []
    for c in range(idx.n_cols):
        i = c    # row 0, column c
        s, e = int(idx.starts[i]), int(idx.ends[i])
        text = data[s:e].decode("utf-8")
        if idx.escaped[i]:
            text = text.replace('""', '"')
        names.append(text)
    return names


def infer_schema(source, max_records: Optional[int] = 1000,
                 has_header: bool = True, delimiter: str = ",") \
        -> dt.Schema:
    """Schema inference (reader/mod.rs:410 infer_schema)."""
    idx = _Indexed(_as_bytes(source), delimiter)
    row0 = 1 if has_header else 0
    nrows = idx.n_rows - row0
    names = _header_names(idx) if has_header else \
        [f"column_{i + 1}" for i in range(idx.n_cols)]
    sample = max_records if max_records is not None else nrows
    return dt.Schema(tuple(
        dt.Field(names[c], _infer_column(idx, c, row0, nrows, sample))
        for c in range(idx.n_cols)))


def read_csv(source, schema: Optional[dt.Schema] = None,
             has_header: bool = True, delimiter: str = ",",
             projection=None) -> Table:
    """`projection` (reader/mod.rs with_projection): names or column
    indices to parse — unselected columns are never typed/parsed."""
    data = _as_bytes(source)
    idx = _Indexed(data, delimiter)
    row0 = 1 if has_header else 0
    nrows = idx.n_rows - row0
    if has_header:
        names = _header_names(idx)
    else:
        names = [f"column_{i + 1}" for i in range(idx.n_cols)]
    sel = range(idx.n_cols)
    if projection is not None:
        sel = [names.index(p) if isinstance(p, str) else int(p)
               for p in projection]
    if schema is None:
        fields = [dt.Field(names[c],
                           _infer_column(idx, c, row0, nrows, 1000))
                  for c in sel]
    else:
        by_name = {f.name: f for f in schema.fields}
        fields = [by_name.get(names[c], dt.Field(names[c], dt.utf8))
                  for c in sel]
    cols = tuple(_parse_column(idx, c, row0, nrows, f.dtype)
                 for c, f in zip(sel, fields))
    return Table(cols, dt.Schema(tuple(fields)))


@dataclass
class ReaderBuilder:
    """Builder-pattern reader (reader/mod.rs:309)."""
    schema: Optional[dt.Schema] = None
    has_header: bool = True
    delimiter: str = ","
    batch_size: int = 65536
    projection: Optional[Sequence] = None    # names or indices

    def build(self, source) -> List[Table]:
        t = read_csv(source, self.schema, self.has_header,
                     self.delimiter, self.projection)
        return [t.slice(i, min(self.batch_size, t.num_rows - i))
                for i in range(0, max(t.num_rows, 1), self.batch_size)
                if t.num_rows]

    def build_decoder(self) -> "Decoder":
        return Decoder(self)


class Decoder:
    """Push-based CSV decoder (reader/mod.rs:555): feed byte chunks,
    flush() parses all completed lines."""

    def __init__(self, builder: ReaderBuilder):
        self._b = builder
        self._buf = bytearray()
        self._header: Optional[bytes] = None

    def decode(self, data: bytes) -> None:
        self._buf.extend(data)

    def flush(self) -> Optional[Table]:
        nl = self._buf.rfind(b"\n")
        if nl < 0:
            return None
        complete = bytes(self._buf[:nl + 1])
        del self._buf[:nl + 1]
        if self._b.has_header:
            if self._header is None:
                head_end = complete.find(b"\n")
                self._header = complete[:head_end + 1]
                complete = complete[head_end + 1:]
                if not complete:
                    return None
            complete = self._header + complete
        return read_csv(complete, self._b.schema, self._b.has_header,
                        self._b.delimiter)


@dataclass
class WriterBuilder:
    """CSV writer (writer.rs:191) — vectorized host formatting."""
    include_header: bool = True
    delimiter: str = ","

    def write(self, sink, table: Table) -> None:
        own = isinstance(sink, str)
        out = open(sink, "wb") if own else sink
        try:
            if self.include_header:
                out.write((self.delimiter.join(
                    _quote(n, self.delimiter)
                    for n in table.column_names) + "\n").encode())
            cols = [_format_column(c, self.delimiter)
                    for c in table.columns]
            delim = self.delimiter.encode()
            for i in range(table.num_rows):
                out.write(delim.join(col[i] for col in cols))
                out.write(b"\n")
        finally:
            if own:
                out.close()


def _quote(v: str, delim: str) -> str:
    if any(ch in v for ch in (delim, '"', "\n", "\r")):
        return '"' + v.replace('"', '""') + '"'
    return v


def _format_column(col: Column, delim: str = ",") -> List[bytes]:
    """Per-row CSV cell bytes (nulls -> empty; ArrayFormatter for the
    value text, writer.rs formatting semantics)."""
    from ..utils.display import ArrayFormatter, FormatOptions
    fmt = ArrayFormatter(col, FormatOptions(null=""))
    vals = col.to_pylist()
    out = []
    for i, v in enumerate(vals):
        if v is None:
            out.append(b"")
        else:
            out.append(_quote(fmt.value(i), delim).encode("utf-8"))
    return out


def write_csv(sink_or_path, table: Table, include_header: bool = True):
    WriterBuilder(include_header=include_header).write(sink_or_path, table)
