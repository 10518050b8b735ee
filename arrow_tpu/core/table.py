"""RecordBatch / Table: a schema-tagged bundle of equal-length columns.

Mirrors the reference RecordBatch (arrow-array/src/record_batch.rs:202) but
as a JAX pytree: `jit`-transparent, shardable with jax.sharding, and usable
directly as an argument to fused kernels.  There is no Table-of-chunks type;
re-chunking is ops.coalesce's job (the reference's BatchCoalescer,
arrow-select/src/coalesce.rs:132).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import dtypes as dt
from ..errors import ArrowInvalid, SchemaError
from .column import Column, column as make_column

__all__ = ["Table", "RecordBatch"]


@jax.tree_util.register_pytree_node_class
class Table:
    """Named, equal-length columns (RecordBatch::try_new semantics,
    record_batch.rs:241: verifies column count and row-length agreement)."""

    def __init__(self, columns: Sequence[Column], schema: dt.Schema,
                 *, _validated: bool = False):
        columns = tuple(columns)
        if not _validated:
            if len(columns) != len(schema.fields):
                raise SchemaError(
                    f"{len(columns)} columns vs {len(schema.fields)} fields")
            lengths = {len(c) for c in columns}
            if len(lengths) > 1:
                raise ArrowInvalid(f"column lengths differ: {lengths}")
        self.columns = columns
        self.schema = schema

    def tree_flatten(self):
        return self.columns, self.schema

    @classmethod
    def tree_unflatten(cls, schema, columns):
        obj = cls.__new__(cls)
        obj.columns = tuple(columns)
        obj.schema = schema
        return obj

    # -- construction --------------------------------------------------------
    @staticmethod
    def from_pydict(data: Dict[str, object],
                    schema: Optional[dt.Schema] = None) -> "Table":
        cols = []
        fields = []
        for i, (name, raw) in enumerate(data.items()):
            want = schema.fields[i].dtype if schema is not None else None
            col = make_column(raw, dtype=want)
            cols.append(col)
            fields.append(dt.Field(name, col.dtype,
                                   nullable=col.validity is not None))
        return Table(cols, schema or dt.Schema(tuple(fields)))

    @staticmethod
    def from_pyarrow(batch) -> "Table":
        from ..io.interop import table_from_pyarrow
        return table_from_pyarrow(batch)

    # -- access --------------------------------------------------------------
    @property
    def num_rows(self) -> int:
        return len(self.columns[0]) if self.columns else 0

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    @property
    def column_names(self) -> List[str]:
        return self.schema.names

    def column(self, i) -> Column:
        if isinstance(i, str):
            return self.columns[self.schema.index_of(i)]
        return self.columns[i]

    def __getitem__(self, i) -> Column:
        return self.column(i)

    def __len__(self) -> int:
        return self.num_rows

    def equals(self, other) -> bool:
        """RecordBatch PartialEq role: full Schema equality (fields incl.
        metadata, schema-level metadata) and every column logically
        equal."""
        if self is other:
            return True
        if not isinstance(other, Table):
            return False
        if len(self.schema.fields) != len(other.schema.fields):
            return False
        if sorted(self.schema.metadata) != sorted(other.schema.metadata):
            return False
        for f, g in zip(self.schema.fields, other.schema.fields):
            if (f.name, f.dtype, f.nullable) != (g.name, g.dtype,
                                                 g.nullable):
                return False
            if sorted(f.metadata) != sorted(g.metadata):
                return False
        return all(c.equals(o) for c, o in zip(self.columns,
                                               other.columns))

    def select(self, names_or_indices) -> "Table":
        idx = [self.schema.index_of(i) if isinstance(i, str) else i
               for i in names_or_indices]
        return Table(tuple(self.columns[i] for i in idx),
                     self.schema.project(idx), _validated=True)

    def set_column(self, i: int, field: dt.Field, col: Column) -> "Table":
        cols = list(self.columns)
        fields = list(self.schema.fields)
        cols[i] = col
        fields[i] = field
        return Table(tuple(cols), dt.Schema(tuple(fields)))

    def append_column(self, name: str, col: Column) -> "Table":
        return Table(self.columns + (col,),
                     dt.Schema(self.schema.fields + (
                         dt.Field(name, col.dtype,
                                  nullable=col.validity is not None),)))

    def drop_column(self, name: str) -> "Table":
        idx = self.schema.index_of(name)
        keep = [i for i in range(self.num_columns) if i != idx]
        return self.select(keep)

    def rename_columns(self, names: Sequence[str]) -> "Table":
        fields = tuple(f.with_name(n)
                       for f, n in zip(self.schema.fields, names))
        return Table(self.columns, dt.Schema(fields), _validated=True)

    def slice(self, offset: int, length: int) -> "Table":
        return Table(tuple(c.slice(offset, length) for c in self.columns),
                     self.schema, _validated=True)

    # -- host conversion ------------------------------------------------------
    def __arrow_c_array__(self, requested_schema=None):
        """Arrow PyCapsule protocol: the table as a struct array (the
        RecordBatch convention) — pa.record_batch(t) works directly."""
        from ..io.cdata import export_table
        return export_table(self)

    def __arrow_c_stream__(self, requested_schema=None):
        """Arrow PyCapsule stream protocol — pa.table(t) works
        directly (one batch; ffi_stream.rs role)."""
        from ..io.cdata import export_stream
        return export_stream([self])

    def to_pyarrow(self):
        from ..io.interop import table_to_pyarrow
        return table_to_pyarrow(self)

    def to_pydict(self):
        return {f.name: c.to_pylist()
                for f, c in zip(self.schema.fields, self.columns)}

    def __repr__(self):
        cols = ", ".join(f"{f.name}: {f.dtype!r}" for f in self.schema.fields)
        return f"Table[{self.num_rows} rows]({cols})"


RecordBatch = Table  # the reference distinguishes them; here one type suffices
