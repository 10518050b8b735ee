"""Core array-model tests: construction, nulls, slicing, pyarrow round-trip.

Coverage model: the reference's inline unit tests on arrow-array
(arrow-array/src/array/*.rs bottom halves) + pyarrow round-trip parity
(arrow-pyarrow-integration-testing)."""

import numpy as np
import pyarrow as pa
import pytest

import arrow_tpu as at
from arrow_tpu import dtypes as dt
from arrow_tpu.utils.bench_util import (create_boolean_array,
                                        create_primitive_array,
                                        create_string_array,
                                        create_string_dict_array,
                                        create_timestamp_array)
from util import assert_column_equals_pa


ROUNDTRIP_ARRAYS = [
    create_primitive_array(1000, 0.0, np.int64),
    create_primitive_array(1000, 0.2, np.int32),
    create_primitive_array(1000, 0.5, np.float64),
    create_primitive_array(1000, 0.1, np.float32),
    create_primitive_array(1000, 0.0, np.uint16),
    create_boolean_array(1000, 0.2),
    create_string_array(500, 0.2),
    create_string_dict_array(500, 0.2),
    create_timestamp_array(500, 0.1),
    pa.array([], type=pa.int64()),
    pa.array([None, None], type=pa.float64()),
    pa.array([[1, 2], None, [], [3]], type=pa.list_(pa.int64())),
    pa.array([{"x": 1, "y": "a"}, {"x": None, "y": "b"}, None],
             type=pa.struct([("x", pa.int64()), ("y", pa.string())])),
]


@pytest.mark.parametrize("arr", ROUNDTRIP_ARRAYS,
                         ids=lambda a: f"{a.type}-{len(a)}")
def test_pyarrow_roundtrip(arr):
    col = at.column(arr)
    assert len(col) == len(arr)
    assert col.null_count == arr.null_count
    assert_column_equals_pa(col, arr)


def test_column_from_pylist_inference():
    assert at.column([1, 2, 3]).dtype == at.int64
    assert at.column([1.0, 2.0]).dtype == at.float64
    assert at.column([True, False]).dtype == at.bool_
    assert at.column(["a", "b"]).dtype == at.utf8
    assert at.column([None, None]).dtype == at.null


def test_column_from_numpy():
    col = at.column(np.arange(10, dtype=np.int32))
    assert col.dtype == at.int32
    assert col.to_pylist() == list(range(10))


def test_slice():
    arr = create_primitive_array(100, 0.3, np.int64)
    col = at.column(arr)
    assert_column_equals_pa(col.slice(10, 50), arr.slice(10, 50))


def test_slice_strings():
    arr = create_string_array(100, 0.2)
    col = at.column(arr)
    assert_column_equals_pa(col.slice(7, 31), arr.slice(7, 31))


def test_null_canonicalization():
    """Null slots must hold the dtype's zero bit pattern (engine invariant
    for deterministic hashing/goldens)."""
    col = at.column([1, None, 3])
    assert np.asarray(col.values).tolist() == [1, 0, 3]


def test_table_construction_and_select():
    t = at.Table.from_pydict({"a": [1, 2], "b": ["x", "y"]})
    assert t.num_rows == 2 and t.num_columns == 2
    assert t.column_names == ["a", "b"]
    s = t.select(["b"])
    assert s.column_names == ["b"]
    with pytest.raises(at.ArrowError):
        at.Table.from_pydict({"a": [1, 2], "b": [1]})


def test_table_pyarrow_roundtrip():
    batch = pa.record_batch({
        "i": create_primitive_array(200, 0.1, np.int64),
        "f": create_primitive_array(200, 0.3, np.float64),
        "s": create_string_array(200, 0.2),
        "d": create_string_dict_array(200, 0.1),
    })
    t = at.Table.from_pyarrow(batch)
    rt = t.to_pyarrow()
    for i in range(batch.num_columns):
        assert_column_equals_pa(t.columns[i], batch.column(i))


def test_table_is_pytree():
    import jax
    t = at.Table.from_pydict({"a": [1, 2, None], "b": [1.0, 2.0, 3.0]})
    leaves = jax.tree_util.tree_leaves(t)
    assert len(leaves) == 3  # a.values, a.validity, b.values
    t2 = jax.tree_util.tree_map(lambda x: x, t)
    assert isinstance(t2, at.Table)
    assert t2.column("a").to_pylist() == [1, 2, None]


def test_scalar():
    s = at.scalar(5)
    assert s.dtype == at.int64 and s.valid
    sn = at.scalar(None, at.float64)
    assert not sn.valid


def test_schema_try_merge():
    """Schema::try_merge semantics (arrow-schema/src/schema.rs:295):
    null widening, nullable OR, new fields append, conflicts raise."""
    from arrow_tpu.errors import SchemaError
    s1 = dt.Schema((dt.Field("a", dt.int64, False),
                    dt.Field("b", dt.null),
                    dt.Field("s", dt.struct([
                        dt.Field("x", dt.int32, False)]), False)),
                   (("origin", "s1"),))
    s2 = dt.Schema((dt.Field("b", dt.utf8, False),
                    dt.Field("a", dt.int64, True),
                    dt.Field("c", dt.float64),
                    dt.Field("s", dt.struct([
                        dt.Field("y", dt.utf8)]))),
                   (("kind", "merged"),))
    m = dt.Schema.try_merge([s1, s2])
    assert m.names == ["a", "b", "s", "c"]
    assert m.field("a").nullable          # OR of False, True
    assert m.field("b").dtype == dt.utf8  # null widened
    assert m.field("b").nullable
    assert [f.name for f in m.field("s").dtype.fields] == ["x", "y"]
    assert dict(m.metadata) == {"origin": "s1", "kind": "merged"}

    # dtype conflict raises
    import pytest
    with pytest.raises(SchemaError):
        dt.Schema.try_merge([
            dt.Schema((dt.Field("a", dt.int64),)),
            dt.Schema((dt.Field("a", dt.utf8),))])
    # list element types merge recursively
    m2 = dt.Schema.try_merge([
        dt.Schema((dt.Field("l", dt.list_(dt.int32)),)),
        dt.Schema((dt.Field("l", dt.list_(dt.int32)),))])
    assert m2.field("l").dtype == dt.list_(dt.int32)
    # conflicting metadata raises
    with pytest.raises(SchemaError):
        dt.Schema.try_merge([
            dt.Schema((), (("k", "1"),)),
            dt.Schema((), (("k", "2"),))])


def test_column_table_equals():
    """arrow-data equal/ + PartialEq role: NaN-equal data equality."""
    a = at.column([1.0, float("nan"), None])
    b = at.column([1.0, float("nan"), None])
    assert a.equals(b)                      # NaN == NaN (byte equality)
    assert not a.equals(at.column([1.0, 2.0, None]))
    assert not a.equals(at.column([1.0, float("nan"), None], at.float32))
    n = at.column([[1, None], None], at.dtypes.list_(at.int64))
    assert n.equals(at.column([[1, None], None], at.dtypes.list_(at.int64)))
    t1 = at.Table.from_pydict({"x": [1, 2], "y": ["a", None]})
    t2 = at.Table.from_pydict({"x": [1, 2], "y": ["a", None]})
    assert t1.equals(t2)
    assert not t1.equals(t2.select(["y", "x"]))
    assert not t1.equals(at.Table.from_pydict({"x": [1, 2], "z": ["a", None]}))


def test_equals_byte_level_and_metadata():
    """PartialEq is byte-level: -0.0 != 0.0; RecordBatch equality
    includes schema/field metadata (record_batch.rs PartialEq)."""
    assert not at.column([0.0, -0.0]).equals(at.column([0.0, 0.0]))
    assert at.column([-0.0]).equals(at.column([-0.0]))
    t1 = at.Table.from_pydict({"x": [1]})
    f = t1.schema.fields[0]
    s_md = dt.Schema(t1.schema.fields, (("k", "v"),))
    t2 = at.Table(t1.columns, s_md)
    assert not t1.equals(t2) and t2.equals(t2)
    f_md = dt.Field(f.name, f.dtype, f.nullable, (("fk", "fv"),))
    t3 = at.Table(t1.columns, dt.Schema((f_md,)))
    assert not t1.equals(t3)


def test_dictionary_occupancy_with_null_codes():
    """Null codes must not mark values[size-1] as used (JAX mode='drop'
    normalizes -1 before dropping)."""
    import jax.numpy as jnp
    from arrow_tpu.core.column import DictionaryColumn, StringColumn
    from arrow_tpu.core.pool import dictionary_occupancy
    vals = StringColumn.from_pylist(["a", "b", "c", "d"])
    d = DictionaryColumn(jnp.asarray(np.array([0, 0, 1], np.int32)),
                         vals,
                         jnp.asarray(np.array([True, False, False])))
    assert dictionary_occupancy(d) == 0.25


def test_np_bool_scalar_datum():
    from arrow_tpu.ops import cmp as c_ops
    c = at.column([True, False])
    out = c_ops.eq(c, np.bool_(True))
    assert out.to_pylist() == [True, False]
