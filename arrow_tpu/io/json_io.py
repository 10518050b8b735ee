"""JSON read/write (the arrow-json role).

Reader: line-delimited JSON -> Table (arrow-json two-phase tape+decoder,
reader/tape.rs — bulk parse delegated to the Arrow C++ reader), plus a
from-python-objects decode path (the reference's serde path,
reader/mod.rs:177).  Writer: LineDelimited and JsonArray formats
(writer/mod.rs:154,171).
"""

from __future__ import annotations

import io as _io
import json
import math
from typing import Iterable, List, Optional

import pyarrow as pa
import pyarrow.json as pajson

from .. import dtypes as dt
from ..core.table import Table
from ..errors import ArrowInvalid
from .interop import dtype_to_pyarrow, table_from_pyarrow

__all__ = ["read_json", "read_json_objects", "write_json", "WriterBuilder"]


def read_json(source, schema: Optional[dt.Schema] = None) -> Table:
    """Line-delimited JSON -> Table."""
    if isinstance(source, str) and "\n" in source or isinstance(source, str) \
            and source.lstrip().startswith("{"):
        source = _io.BytesIO(source.encode())
    elif isinstance(source, bytes):
        source = _io.BytesIO(source)
    opts = None
    if schema is not None:
        opts = pajson.ParseOptions(explicit_schema=pa.schema(
            [pa.field(f.name, dtype_to_pyarrow(f.dtype)) for f in schema]))
    return table_from_pyarrow(pajson.read_json(source, parse_options=opts))


def read_json_objects(objs: Iterable[dict],
                      schema: Optional[dt.Schema] = None) -> Table:
    """Decode from python mappings (the serde::Serialize decode path)."""
    pa_schema = None
    if schema is not None:
        pa_schema = pa.schema([pa.field(f.name, dtype_to_pyarrow(f.dtype))
                               for f in schema])
    tbl = pa.Table.from_pylist(list(objs), schema=pa_schema)
    return table_from_pyarrow(tbl)


class WriterBuilder:
    """writer/mod.rs: LineDelimited (default) or JsonArray; nulls
    explicit or omitted."""

    def __init__(self, format: str = "lines", explicit_nulls: bool = False):
        if format not in ("lines", "array"):
            raise ArrowInvalid("format must be 'lines' or 'array'")
        self.format = format
        self.explicit_nulls = explicit_nulls

    def _rows(self, table: Table) -> List[dict]:
        d = table.to_pydict()
        names = list(d.keys())
        rows = []
        for i in range(table.num_rows):
            row = {}
            for n in names:
                v = d[n][i]
                if v is None and not self.explicit_nulls:
                    continue
                row[n] = _json_value(v)
            rows.append(row)
        return rows

    def write(self, sink, table: Table) -> None:
        rows = self._rows(table)
        if self.format == "array":
            sink.write(json.dumps(rows).encode())
        else:
            for r in rows:
                sink.write(json.dumps(r).encode() + b"\n")

    def write_str(self, table: Table) -> str:
        buf = _io.BytesIO()
        self.write(buf, table)
        return buf.getvalue().decode()


def _json_value(v):
    import datetime
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None  # JSON has no NaN/inf; reference errors — we null
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    return v


def write_json(sink, table: Table, format: str = "lines"):
    WriterBuilder(format).write(sink, table)
