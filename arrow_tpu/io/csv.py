"""CSV read/write (the arrow-csv role).

ReaderBuilder with schema inference (arrow-csv/src/reader/mod.rs:309,410),
a push-based Decoder (reader/mod.rs:555), and a WriterBuilder
(writer.rs:191).  Bulk parsing delegates to the Arrow C++ CSV reader
(pyarrow) — the same division as the reference, where hot parsing is native
code under a thin builder API; the push Decoder frames lines incrementally
and parses completed chunks.
"""

from __future__ import annotations

import io as _io
from dataclasses import dataclass, field
from typing import List, Optional

import pyarrow as pa
import pyarrow.csv as pacsv

from .. import dtypes as dt
from ..core.table import Table
from ..errors import ArrowInvalid
from .interop import dtype_to_pyarrow, table_from_pyarrow, table_to_pyarrow

__all__ = ["ReaderBuilder", "Decoder", "WriterBuilder", "read_csv",
           "write_csv", "infer_schema"]


def infer_schema(source, max_records: Optional[int] = 1000) -> dt.Schema:
    """Schema inference (reader/mod.rs:410 infer_schema)."""
    tbl = _read_pa(source)
    from .interop import dtype_from_pyarrow
    return dt.Schema(tuple(
        dt.Field(f.name, dtype_from_pyarrow(f.type), f.nullable)
        for f in tbl.schema))


def _read_pa(source, schema: Optional[dt.Schema] = None,
             has_header: bool = True, delimiter: str = ","):
    parse = pacsv.ParseOptions(delimiter=delimiter)
    convert = None
    read = pacsv.ReadOptions(autogenerate_column_names=not has_header)
    if schema is not None:
        convert = pacsv.ConvertOptions(column_types={
            f.name: dtype_to_pyarrow(f.dtype) for f in schema.fields})
    if isinstance(source, bytes):
        source = _io.BytesIO(source)
    elif isinstance(source, str) and "\n" in source:
        source = _io.BytesIO(source.encode())
    return pacsv.read_csv(source, read_options=read, parse_options=parse,
                          convert_options=convert)


def read_csv(source, schema: Optional[dt.Schema] = None,
             has_header: bool = True, delimiter: str = ",") -> Table:
    return table_from_pyarrow(_read_pa(source, schema, has_header,
                                       delimiter))


@dataclass
class ReaderBuilder:
    """Builder-pattern reader (reader/mod.rs:309)."""
    schema: Optional[dt.Schema] = None
    has_header: bool = True
    delimiter: str = ","
    batch_size: int = 65536

    def build(self, source) -> List[Table]:
        t = read_csv(source, self.schema, self.has_header, self.delimiter)
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
    """CSV writer (writer.rs:191)."""
    include_header: bool = True
    delimiter: str = ","

    def write(self, sink, table: Table) -> None:
        opts = pacsv.WriteOptions(include_header=self.include_header,
                                  delimiter=self.delimiter)
        pacsv.write_csv(table_to_pyarrow(table), sink, opts)


def write_csv(sink_or_path, table: Table, include_header: bool = True):
    WriterBuilder(include_header=include_header).write(sink_or_path, table)
