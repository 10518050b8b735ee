"""pyarrow <-> arrow_tpu bridge.

Plays the role of the reference's arrow-pyarrow crate
(arrow-pyarrow/src/lib.rs:88-96): host-side interchange with the Arrow
ecosystem.  Data enters/leaves the device through this module; it is also
the golden-test oracle (the reference cross-validates against pyarrow in CI,
.github/workflows/integration.yml:128, so pyarrow outputs are authoritative
Arrow semantics).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from .. import dtypes as dt
from ..core.column import (Column, DictionaryColumn, ListColumn, NullColumn,
                           PrimitiveColumn, StringColumn, StructColumn)
from ..core.table import Table
from ..errors import ArrowNotImplementedError
from ..utils import native as _native

__all__ = ["column_from_pyarrow", "column_to_pyarrow",
           "table_from_pyarrow", "table_to_pyarrow",
           "dtype_from_pyarrow", "dtype_to_pyarrow"]


# ---- dtype mapping ----------------------------------------------------------

_PA_TO_DT = {
    pa.bool_(): dt.bool_,
    pa.int8(): dt.int8, pa.int16(): dt.int16,
    pa.int32(): dt.int32, pa.int64(): dt.int64,
    pa.uint8(): dt.uint8, pa.uint16(): dt.uint16,
    pa.uint32(): dt.uint32, pa.uint64(): dt.uint64,
    pa.float16(): dt.float16, pa.float32(): dt.float32,
    pa.float64(): dt.float64,
    pa.string(): dt.utf8, pa.large_string(): dt.large_utf8,
    pa.binary(): dt.binary,
    pa.date32(): dt.date32, pa.date64(): dt.date64,
    pa.null(): dt.null,
}


def dtype_from_pyarrow(t: pa.DataType) -> dt.DataType:
    if t in _PA_TO_DT:
        return _PA_TO_DT[t]
    if pa.types.is_timestamp(t):
        return dt.timestamp(t.unit, t.tz)
    if pa.types.is_time32(t):
        return dt.time32(t.unit)
    if pa.types.is_time64(t):
        return dt.time64(t.unit)
    if pa.types.is_duration(t):
        return dt.duration(t.unit)
    if pa.types.is_decimal(t):
        return dt.decimal128(t.precision, t.scale)
    if pa.types.is_dictionary(t):
        return dt.dictionary(dtype_from_pyarrow(t.index_type),
                             dtype_from_pyarrow(t.value_type))
    if pa.types.is_list(t):
        return dt.list_(dtype_from_pyarrow(t.value_type))
    if pa.types.is_struct(t):
        return dt.struct([dt.Field(t.field(i).name,
                                   dtype_from_pyarrow(t.field(i).type),
                                   t.field(i).nullable)
                          for i in range(t.num_fields)])
    raise ArrowNotImplementedError(f"pyarrow type {t}")


def dtype_to_pyarrow(d: dt.DataType) -> pa.DataType:
    for k, v in _PA_TO_DT.items():
        if v == d:
            return k
    if d.name == "timestamp":
        return pa.timestamp(d.unit, d.tz)
    if d.name == "time32":
        return pa.time32(d.unit)
    if d.name == "time64":
        return pa.time64(d.unit)
    if d.name == "duration":
        return pa.duration(d.unit)
    if d.name == "decimal128":
        return pa.decimal128(d.precision, d.scale)
    if d.name == "dictionary":
        return pa.dictionary(dtype_to_pyarrow(d.index_type),
                             dtype_to_pyarrow(d.value_type))
    if d.name == "list":
        return pa.list_(dtype_to_pyarrow(d.value_type))
    if d.name == "struct":
        return pa.struct([pa.field(f.name, dtype_to_pyarrow(f.dtype),
                                   f.nullable) for f in d.fields])
    raise ArrowNotImplementedError(f"dtype {d}")


# ---- pyarrow -> device ------------------------------------------------------

def _validity_of(arr: pa.Array):
    if arr.null_count == 0:
        return None
    return jnp.asarray(arr.is_valid().to_numpy(zero_copy_only=False))


def column_from_pyarrow(arr) -> Column:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    ldt = dtype_from_pyarrow(t)

    if pa.types.is_null(t):
        return NullColumn(len(arr))

    if ldt.is_primitive:
        phys = np.dtype(ldt.to_jax())
        if arr.null_count:
            import pyarrow.compute as pc
            storage = arr.cast(_storage_pa_type(t)) if _needs_storage_cast(t) else arr
            np_vals = pc.fill_null(storage, _zero_py(storage.type)) \
                .to_numpy(zero_copy_only=False).astype(phys, copy=False)
        else:
            storage = arr.cast(_storage_pa_type(t)) if _needs_storage_cast(t) else arr
            np_vals = storage.to_numpy(zero_copy_only=False).astype(phys,
                                                                    copy=False)
        return PrimitiveColumn(jnp.asarray(np_vals), ldt, _validity_of(arr))

    if ldt.is_string or ldt.is_binary:
        offsets = np.asarray(arr.offsets if hasattr(arr, "offsets") else None)
        # robust path: rebuild via buffers with offset handling
        a = arr
        if a.offset != 0:
            a = pa.concat_arrays([a])  # compacts the slice
        bufs = a.buffers()
        offs = np.frombuffer(bufs[1], np.int32)[: len(a) + 1].copy()
        data = (np.frombuffer(bufs[2], np.uint8)[: offs[-1]].copy()
                if bufs[2] is not None else np.zeros((0,), np.uint8))
        return StringColumn(jnp.asarray(offs), jnp.asarray(data), ldt,
                            _validity_of(arr))

    if ldt.is_dictionary:
        values = column_from_pyarrow(arr.dictionary)
        import pyarrow.compute as pc
        idx = arr.indices
        if idx.null_count:
            idx = pc.fill_null(idx, 0)
        codes = jnp.asarray(idx.to_numpy(zero_copy_only=False))
        return DictionaryColumn(codes, values, _validity_of(arr))

    if ldt.name == "list":
        a = arr
        if a.offset != 0:
            a = pa.concat_arrays([a])
        offs = np.frombuffer(a.buffers()[1], np.int32)[: len(a) + 1].copy()
        child = column_from_pyarrow(a.values)
        return ListColumn(jnp.asarray(offs), child, _validity_of(arr))

    if ldt.name == "struct":
        children = tuple(column_from_pyarrow(arr.field(i))
                         for i in range(arr.type.num_fields))
        return StructColumn(children, ldt.fields, _validity_of(arr))

    raise ArrowNotImplementedError(f"ingest of {t}")


def _needs_storage_cast(t: pa.DataType) -> bool:
    return (pa.types.is_timestamp(t) or pa.types.is_date(t)
            or pa.types.is_time(t) or pa.types.is_duration(t))


def _storage_pa_type(t: pa.DataType) -> pa.DataType:
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return pa.int32()
    return pa.int64()


def _zero_py(t: pa.DataType):
    if pa.types.is_floating(t):
        return 0.0
    if pa.types.is_boolean(t):
        return False
    return 0


# ---- device -> pyarrow ------------------------------------------------------

def _mask_arg(col: Column):
    if col.validity is None:
        return None
    return ~np.asarray(col.validity)


def column_to_pyarrow(col: Column) -> pa.Array:
    pa_type = dtype_to_pyarrow(col.dtype)

    if isinstance(col, NullColumn):
        return pa.nulls(len(col))

    if isinstance(col, PrimitiveColumn):
        vals = np.asarray(col.values)
        if col.dtype.is_temporal:
            storage = pa.array(vals, mask=_mask_arg(col))
            return storage.cast(pa_type)
        return pa.array(vals, type=pa_type, mask=_mask_arg(col))

    if isinstance(col, StringColumn):
        offs = np.asarray(col.offsets, np.int32)
        data = np.asarray(col.data, np.uint8)
        validity_buf = None
        if col.validity is not None:
            bits = _native.pack_bits(np.asarray(col.validity, np.uint8))
            validity_buf = pa.py_buffer(bits.tobytes())
        cls = pa.StringArray if col.dtype.is_string else pa.BinaryArray
        return cls.from_buffers(len(col), pa.py_buffer(offs.tobytes()),
                                pa.py_buffer(data.tobytes()), validity_buf,
                                col.null_count if col.validity is not None else 0)

    if isinstance(col, DictionaryColumn):
        indices = pa.array(np.asarray(col.codes), mask=_mask_arg(col))
        return pa.DictionaryArray.from_arrays(indices,
                                              column_to_pyarrow(col.values))

    if isinstance(col, ListColumn):
        offs = pa.array(np.asarray(col.offsets, np.int32), pa.int32())
        child = column_to_pyarrow(col.child)
        out = pa.ListArray.from_arrays(offs, child)
        if col.validity is not None:
            # from_arrays lacks a mask argument pre-14; rebuild with validity
            bits = _native.pack_bits(np.asarray(col.validity, np.uint8))
            out = pa.Array.from_buffers(
                out.type, len(col),
                [pa.py_buffer(bits.tobytes()), out.buffers()[1]],
                children=[child])
        return out

    if isinstance(col, StructColumn):
        children = [column_to_pyarrow(c) for c in col.children]
        names = [f.name for f in col.fields]
        out = pa.StructArray.from_arrays(children, names)
        if col.validity is not None:
            bits = _native.pack_bits(np.asarray(col.validity, np.uint8))
            out = pa.Array.from_buffers(out.type, len(col),
                                        [pa.py_buffer(bits.tobytes())],
                                        children=children)
        return out

    raise ArrowNotImplementedError(f"export of {type(col)}")


# ---- tables -----------------------------------------------------------------

def table_from_pyarrow(batch) -> Table:
    if isinstance(batch, pa.Table):
        batch = batch.combine_chunks()
        cols = [column_from_pyarrow(batch.column(i))
                for i in range(batch.num_columns)]
    else:
        cols = [column_from_pyarrow(batch.column(i))
                for i in range(batch.num_columns)]
    fields = tuple(dt.Field(f.name, dtype_from_pyarrow(f.type), f.nullable)
                   for f in batch.schema)
    return Table(cols, dt.Schema(fields))


def table_to_pyarrow(table: Table) -> pa.RecordBatch:
    arrays = [column_to_pyarrow(c) for c in table.columns]
    fields = [pa.field(f.name, a.type, f.nullable)
              for f, a in zip(table.schema.fields, arrays)]
    return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))
