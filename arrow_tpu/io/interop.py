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
    pa.binary(): dt.binary, pa.large_binary(): dt.large_binary,
    pa.string_view(): dt.utf8_view, pa.binary_view(): dt.binary_view,
    pa.date32(): dt.date32, pa.date64(): dt.date64,
    pa.month_day_nano_interval(): dt.interval("month_day_nano"),
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
        ctor = {"decimal32": dt.decimal32, "decimal64": dt.decimal64,
                "decimal128": dt.decimal128, "decimal256": dt.decimal256}
        return ctor[str(t).split("(")[0]](t.precision, t.scale)
    if pa.types.is_fixed_size_binary(t):
        return dt.fixed_size_binary(t.byte_width)
    if pa.types.is_dictionary(t):
        return dt.dictionary(dtype_from_pyarrow(t.index_type),
                             dtype_from_pyarrow(t.value_type),
                             ordered=bool(t.ordered))
    if pa.types.is_list(t):
        return dt.list_(dtype_from_pyarrow(t.value_type))
    if pa.types.is_large_list(t):
        return dt.large_list(dtype_from_pyarrow(t.value_type))
    if pa.types.is_list_view(t):
        return dt.list_view(dtype_from_pyarrow(t.value_type))
    if pa.types.is_large_list_view(t):
        return dt.large_list_view(dtype_from_pyarrow(t.value_type))
    if pa.types.is_fixed_size_list(t):
        return dt.fixed_size_list(dtype_from_pyarrow(t.value_type),
                                  t.list_size)
    if pa.types.is_map(t):
        return dt.map_(dtype_from_pyarrow(t.key_type),
                       dtype_from_pyarrow(t.item_type))
    if pa.types.is_struct(t):
        return dt.struct([dt.Field(t.field(i).name,
                                   dtype_from_pyarrow(t.field(i).type),
                                   t.field(i).nullable)
                          for i in range(t.num_fields)])
    if pa.types.is_union(t):
        fields = [dt.Field(t.field(i).name,
                           dtype_from_pyarrow(t.field(i).type),
                           t.field(i).nullable)
                  for i in range(t.num_fields)]
        return dt.union(fields,
                        "sparse" if t.mode == "sparse" else "dense",
                        t.type_codes)
    if pa.types.is_run_end_encoded(t):
        return dt.run_end_encoded(dtype_from_pyarrow(t.run_end_type),
                                  dtype_from_pyarrow(t.value_type))
    if pa.types.is_interval(t):
        # dispatch the concrete unit: handing a 4/8-byte buffer to the
        # 16-byte MDN struct parser would read garbage (ADVICE r1).
        # pyarrow 25 exposes no Python constructors for the
        # months/day-time units, so match on the C++ type id.
        import pyarrow.lib as _palib
        if t.id == _palib.Type_INTERVAL_MONTH_DAY_NANO:
            return dt.interval("month_day_nano")
        if t.id == _palib.Type_INTERVAL_MONTHS:
            return dt.interval("year_month")
        if t.id == _palib.Type_INTERVAL_DAY_TIME:
            return dt.interval("day_time")
        raise ArrowNotImplementedError(f"interval type {t}")
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
    if d.is_decimal:
        ctor = {"decimal32": pa.decimal32, "decimal64": pa.decimal64,
                "decimal128": pa.decimal128, "decimal256": pa.decimal256}
        return ctor[d.name](d.precision, d.scale)
    if d.name == "fixed_size_binary":
        return pa.binary(d.list_size)
    if d.name == "interval":
        if d.unit == "month_day_nano":
            return pa.month_day_nano_interval()
        # pyarrow 25 has no Python constructor for months/day-time
        # intervals; the native IPC writer handles them instead
        raise ArrowNotImplementedError(f"pyarrow cannot build {d!r}")
    if d.name == "dictionary":
        return pa.dictionary(dtype_to_pyarrow(d.index_type),
                             dtype_to_pyarrow(d.value_type),
                             ordered=bool(d.ordered))
    if d.name == "list":
        return pa.list_(dtype_to_pyarrow(d.value_type))
    if d.name == "large_list":
        return pa.large_list(dtype_to_pyarrow(d.value_type))
    if d.name == "list_view":
        return pa.list_view(dtype_to_pyarrow(d.value_type))
    if d.name == "large_list_view":
        return pa.large_list_view(dtype_to_pyarrow(d.value_type))
    if d.name == "fixed_size_list":
        return pa.list_(dtype_to_pyarrow(d.value_type), d.list_size)
    if d.name == "map":
        kv = d.value_type
        return pa.map_(dtype_to_pyarrow(kv.fields[0].dtype),
                       dtype_to_pyarrow(kv.fields[1].dtype))
    if d.name == "struct":
        return pa.struct([pa.field(f.name, dtype_to_pyarrow(f.dtype),
                                   f.nullable) for f in d.fields])
    if d.name == "union":
        pafields = [pa.field(f.name, dtype_to_pyarrow(f.dtype), f.nullable)
                    for f in d.fields]
        mk = pa.sparse_union if d.mode == "sparse" else pa.dense_union
        return mk(pafields, list(d.type_ids))
    if d.name == "run_end_encoded":
        return pa.run_end_encoded(dtype_to_pyarrow(d.index_type),
                                  dtype_to_pyarrow(d.value_type))
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

    if ldt.name == "fixed_size_binary":
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        w = t.byte_width
        raw = np.frombuffer(a.buffers()[1], np.uint8)[: len(a) * w].copy()
        from ..core.nested import FixedSizeBinaryColumn
        return FixedSizeBinaryColumn(jnp.asarray(raw.reshape(len(a), w)),
                                     _validity_of(arr))

    if ldt.is_string or ldt.is_binary:
        a = arr
        if ldt.name in ("utf8_view", "binary_view"):
            # views normalize to offset layout on ingest; dtype retained
            a = a.cast(pa.string() if ldt.name == "utf8_view"
                       else pa.binary())
        if a.offset != 0:
            a = pa.concat_arrays([a])  # compacts the slice
        bufs = a.buffers()
        off_np = np.int64 if ldt.name in ("large_utf8", "large_binary") \
            else np.int32
        offs = np.frombuffer(bufs[1], off_np)[: len(a) + 1].copy()
        data = (np.frombuffer(bufs[2], np.uint8)[: offs[-1]].copy()
                if bufs[2] is not None else np.zeros((0,), np.uint8))
        return StringColumn(jnp.asarray(offs), jnp.asarray(data), ldt,
                            _validity_of(arr))

    if ldt.is_decimal and ldt.name in ("decimal128", "decimal256"):
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        k = 2 if ldt.name == "decimal128" else 4
        raw = np.frombuffer(a.buffers()[1], np.uint64)[: len(a) * k].copy()
        from ..core.nested import DecimalColumn
        return DecimalColumn(jnp.asarray(raw.reshape(len(a), k)), ldt,
                             _validity_of(arr))

    if ldt.is_decimal:      # decimal32 / decimal64 single-tensor storage
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        phys = np.int32 if ldt.name == "decimal32" else np.int64
        raw = np.frombuffer(a.buffers()[1], phys)[: len(a)].copy()
        return PrimitiveColumn(jnp.asarray(raw), ldt, _validity_of(arr))

    if ldt.name == "interval" and ldt.unit == "year_month":
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        raw = np.frombuffer(a.buffers()[1], np.int32)[: len(a)].copy()
        return PrimitiveColumn(jnp.asarray(raw), ldt, _validity_of(arr))

    if ldt.name == "interval" and ldt.unit == "day_time":
        # pyarrow buffer is [i32 days][i32 millis]; engine packing is
        # i64 days<<32 | millis (dtypes.py to_jax)
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        raw = np.frombuffer(
            a.buffers()[1],
            np.dtype([("d", "<i4"), ("ms", "<i4")]))[: len(a)]
        packed = ((raw["d"].astype(np.int64) << 32)
                  | (raw["ms"].astype(np.int64) & 0xFFFFFFFF))
        return PrimitiveColumn(jnp.asarray(packed), ldt, _validity_of(arr))

    if ldt.name == "interval" and ldt.unit == "month_day_nano":
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        raw = np.frombuffer(
            a.buffers()[1],
            np.dtype([("m", "<i4"), ("d", "<i4"), ("n", "<i8")]))[: len(a)]
        from ..core.nested import IntervalMDNColumn
        return IntervalMDNColumn(jnp.asarray(raw["m"].copy()),
                                 jnp.asarray(raw["d"].copy()),
                                 jnp.asarray(raw["n"].copy()),
                                 _validity_of(arr))

    if ldt.is_dictionary:
        values = column_from_pyarrow(arr.dictionary)
        import pyarrow.compute as pc
        idx = arr.indices
        if idx.null_count:
            idx = pc.fill_null(idx, 0)
        codes = jnp.asarray(idx.to_numpy(zero_copy_only=False))
        return DictionaryColumn(codes, values, _validity_of(arr),
                                ordered=bool(ldt.ordered))

    if ldt.name in ("list", "large_list"):
        a = arr
        if a.offset != 0:
            a = pa.concat_arrays([a])
        off_np = np.int64 if ldt.name == "large_list" else np.int32
        offs = np.frombuffer(a.buffers()[1], off_np)[: len(a) + 1].copy()
        child = column_from_pyarrow(a.values)
        lc = ListColumn(jnp.asarray(offs), child, _validity_of(arr))
        if ldt.name == "large_list":
            lc.dtype = ldt
        return lc

    if ldt.name in ("list_view", "large_list_view"):
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        off_np = np.int64 if ldt.name == "large_list_view" else np.int32
        offs = np.frombuffer(a.buffers()[1], off_np)[: len(a)].copy()
        sizes = np.frombuffer(a.buffers()[2], off_np)[: len(a)].copy()
        from ..core.nested import ListViewColumn
        return ListViewColumn(jnp.asarray(offs), jnp.asarray(sizes),
                              column_from_pyarrow(a.values),
                              _validity_of(arr), ldt)

    if ldt.name == "fixed_size_list":
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        child = column_from_pyarrow(a.values)
        from ..core.nested import FixedSizeListColumn
        return FixedSizeListColumn(child, t.list_size, _validity_of(arr))

    if ldt.name == "map":
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        offs = np.frombuffer(a.buffers()[1], np.int32)[: len(a) + 1].copy()
        keys = column_from_pyarrow(a.keys)
        items = column_from_pyarrow(a.items)
        entries = StructColumn((keys, items), ldt.value_type.fields)
        from ..core.nested import MapColumn
        return MapColumn(jnp.asarray(offs), entries, _validity_of(arr))

    if ldt.name == "struct":
        children = tuple(column_from_pyarrow(arr.field(i))
                         for i in range(arr.type.num_fields))
        return StructColumn(children, ldt.fields, _validity_of(arr))

    if ldt.name == "union":
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        tids = np.frombuffer(a.buffers()[1], np.int8)[: len(a)].copy()
        from ..core.nested import UnionColumn
        if t.mode == "sparse":
            children = [column_from_pyarrow(a.field(i))
                        for i in range(t.num_fields)]
            return UnionColumn(jnp.asarray(tids), None, children,
                               ldt.fields, ldt.type_ids)
        offs = np.frombuffer(a.buffers()[2], np.int32)[: len(a)].copy()
        children = [column_from_pyarrow(a.field(i))
                    for i in range(t.num_fields)]
        return UnionColumn(jnp.asarray(tids), jnp.asarray(offs), children,
                           ldt.fields, ldt.type_ids)

    if ldt.name == "run_end_encoded":
        a = arr if arr.offset == 0 else pa.concat_arrays([arr])
        run_ends = column_from_pyarrow(a.run_ends).values
        vals = column_from_pyarrow(a.values)
        from ..core.nested import RunEndColumn
        return RunEndColumn(run_ends, vals, len(a))

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
        if col.dtype.is_decimal:    # decimal32/64: raw storage buffers
            vb = None
            if col.validity is not None:
                bits = _native.pack_bits(np.asarray(col.validity, np.uint8))
                vb = pa.py_buffer(bits.tobytes())
            return pa.Array.from_buffers(
                pa_type, len(col),
                [vb, pa.py_buffer(np.ascontiguousarray(vals).tobytes())])
        if col.dtype.is_temporal:
            storage = pa.array(vals, mask=_mask_arg(col))
            return storage.cast(pa_type)
        return pa.array(vals, type=pa_type, mask=_mask_arg(col))

    if isinstance(col, StringColumn):
        name = col.dtype.name
        large = name in ("large_utf8", "large_binary")
        offs = np.asarray(col.offsets, np.int64 if large else np.int32)
        data = np.asarray(col.data, np.uint8)
        validity_buf = None
        if col.validity is not None:
            bits = _native.pack_bits(np.asarray(col.validity, np.uint8))
            validity_buf = pa.py_buffer(bits.tobytes())
        if name in ("utf8_view", "binary_view"):
            storage_t = pa.string() if col.dtype.is_string else pa.binary()
        else:
            storage_t = pa_type
        out = pa.Array.from_buffers(
            storage_t, len(col),
            [validity_buf, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(data.tobytes())])
        if name in ("utf8_view", "binary_view"):
            out = out.cast(pa_type)     # offset layout -> view layout
        return out

    if isinstance(col, DictionaryColumn):
        indices = pa.array(np.asarray(col.codes), mask=_mask_arg(col))
        return pa.DictionaryArray.from_arrays(
            indices, column_to_pyarrow(col.values),
            ordered=bool(col.dtype.ordered))

    from ..core.nested import ListViewColumn
    if isinstance(col, ListViewColumn):
        large = col.dtype.name == "large_list_view"
        off_np = np.int64 if large else np.int32
        cls_ = pa.LargeListViewArray if large else pa.ListViewArray
        m = _mask_arg(col)
        return cls_.from_arrays(
            np.asarray(col.offsets, off_np), np.asarray(col.sizes, off_np),
            column_to_pyarrow(col.child),
            mask=None if m is None else pa.array(m))

    if isinstance(col, ListColumn):
        large = col.dtype.name == "large_list"
        if large:
            offs = pa.array(np.asarray(col.offsets, np.int64), pa.int64())
        else:
            offs = pa.array(np.asarray(col.offsets, np.int32), pa.int32())
        child = column_to_pyarrow(col.child)
        out = (pa.LargeListArray if large else pa.ListArray) \
            .from_arrays(offs, child)
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

    from ..core.nested import (DecimalColumn, FixedSizeBinaryColumn,
                               FixedSizeListColumn, IntervalMDNColumn,
                               MapColumn, RunEndColumn, UnionColumn)

    def _vbuf(c):
        if c.validity is None:
            return None
        bits = _native.pack_bits(np.asarray(c.validity, np.uint8))
        return pa.py_buffer(bits.tobytes())

    if isinstance(col, FixedSizeBinaryColumn):
        data = np.ascontiguousarray(np.asarray(col.data, np.uint8))
        return pa.Array.from_buffers(
            pa_type, len(col),
            [_vbuf(col), pa.py_buffer(data.tobytes())])

    if isinstance(col, DecimalColumn):
        raw = np.ascontiguousarray(np.asarray(col.limbs, np.uint64))
        return pa.Array.from_buffers(
            pa_type, len(col), [_vbuf(col), pa.py_buffer(raw.tobytes())])

    if isinstance(col, IntervalMDNColumn):
        raw = np.zeros(len(col), np.dtype([("m", "<i4"), ("d", "<i4"),
                                           ("n", "<i8")]))
        raw["m"] = np.asarray(col.months)
        raw["d"] = np.asarray(col.days)
        raw["n"] = np.asarray(col.nanos)
        return pa.Array.from_buffers(
            pa_type, len(col), [_vbuf(col), pa.py_buffer(raw.tobytes())])

    if isinstance(col, FixedSizeListColumn):
        child = column_to_pyarrow(col.child)
        return pa.Array.from_buffers(pa_type, len(col), [_vbuf(col)],
                                     children=[child])

    if isinstance(col, MapColumn):
        offs = np.asarray(col.offsets, np.int32)
        keys = column_to_pyarrow(col.keys)
        items = column_to_pyarrow(col.items)
        # entries must carry the map's exact struct type (non-nullable key)
        entries_t = pa.struct([pa_type.key_field, pa_type.item_field])
        entries = pa.Array.from_buffers(entries_t, len(keys), [None],
                                        children=[keys, items])
        return pa.Array.from_buffers(
            pa_type, len(col), [_vbuf(col), pa.py_buffer(offs.tobytes())],
            children=[entries])

    if isinstance(col, UnionColumn):
        children = [column_to_pyarrow(c) for c in col.children]
        tids = pa.py_buffer(np.asarray(col.type_ids, np.int8).tobytes())
        bufs = [None, tids]
        if col.offsets is not None:
            bufs.append(pa.py_buffer(
                np.asarray(col.offsets, np.int32).tobytes()))
        return pa.Array.from_buffers(pa_type, len(col), bufs,
                                     children=children)

    if isinstance(col, RunEndColumn):
        re_arr = pa.array(np.asarray(col.run_ends))
        vals = column_to_pyarrow(col.values)
        return pa.RunEndEncodedArray.from_arrays(re_arr, vals, pa_type)

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
    def md_of(f):
        if not f.metadata:
            return ()
        return tuple(sorted((k.decode() if isinstance(k, bytes) else k,
                             v.decode() if isinstance(v, bytes) else v)
                            for k, v in f.metadata.items()))
    fields = tuple(dt.Field(f.name, dtype_from_pyarrow(f.type),
                            f.nullable, metadata=md_of(f))
                   for f in batch.schema)
    return Table(cols, dt.Schema(fields))


def table_to_pyarrow(table: Table) -> pa.RecordBatch:
    arrays = [column_to_pyarrow(c) for c in table.columns]
    fields = [pa.field(f.name, a.type, f.nullable,
                       metadata=dict(f.metadata) if f.metadata else None)
              for f, a in zip(table.schema.fields, arrays)]
    return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))
