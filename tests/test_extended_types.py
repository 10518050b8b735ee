"""Extended type-system coverage: fixed-size list/binary, map, union,
run-end encoded, decimal32/64/128/256, interval, large/view strings,
extension types.  Round-trips validate against pyarrow (the golden
oracle), and `take` is exercised per layout (take.rs per-layout dispatch
parity)."""

import numpy as np
import pyarrow as pa
import pytest
import jax.numpy as jnp

import arrow_tpu as at
from arrow_tpu import dtypes as dt
from arrow_tpu.io.interop import column_from_pyarrow, column_to_pyarrow
from arrow_tpu.ops.take import take


def roundtrip(arr: pa.Array) -> pa.Array:
    return column_to_pyarrow(column_from_pyarrow(arr))


def assert_rt(arr: pa.Array):
    out = roundtrip(arr)
    assert out.type == arr.type, (out.type, arr.type)
    assert out.equals(arr), f"\ngot:  {out}\nwant: {arr}"


# ---- round trips -------------------------------------------------------------

def test_fixed_size_binary_roundtrip():
    arr = pa.array([b"abcd", None, b"wxyz"], pa.binary(4))
    assert_rt(arr)


def test_decimal128_roundtrip():
    arr = pa.array([None, 12345, -9876543210], pa.decimal128(25, 3))
    assert_rt(arr)


def test_decimal256_roundtrip():
    big = 10**60
    arr = pa.array([big, -big, None, 7], pa.decimal256(76, 0))
    assert_rt(arr)


def test_decimal64_roundtrip():
    arr = pa.array([None, 12345, -999], pa.decimal64(12, 2))
    assert_rt(arr)


def test_interval_mdn_roundtrip():
    mdn = pa.scalar((1, 2, 3), pa.month_day_nano_interval()).as_py()
    arr = pa.array([mdn, None], pa.month_day_nano_interval())
    assert_rt(arr)


def test_large_string_binary_roundtrip():
    assert_rt(pa.array(["hello", None, "world"], pa.large_string()))
    assert_rt(pa.array([b"a", b"bc", None], pa.large_binary()))


def test_string_view_roundtrip():
    assert_rt(pa.array(["short", None, "a string long enough to not inline"],
                       pa.string_view()))


def test_large_list_roundtrip():
    arr = pa.array([[1, 2], None, [3]], pa.large_list(pa.int64()))
    assert_rt(arr)


def test_fixed_size_list_roundtrip():
    arr = pa.array([[1, 2], None, [5, 6]], pa.list_(pa.int64(), 2))
    assert_rt(arr)


def test_map_roundtrip():
    arr = pa.array([[("a", 1), ("b", 2)], None, [("c", 3)]],
                   pa.map_(pa.string(), pa.int64()))
    assert_rt(arr)


def test_sparse_union_roundtrip():
    tids = pa.array([0, 1, 0], pa.int8())
    a = pa.array([1, 2, 3], pa.int64())
    b = pa.array([1.5, 2.5, 3.5], pa.float64())
    arr = pa.UnionArray.from_sparse(tids, [a, b])
    assert_rt(arr)


def test_dense_union_roundtrip():
    tids = pa.array([0, 1, 0], pa.int8())
    offs = pa.array([0, 0, 1], pa.int32())
    a = pa.array([7, 8], pa.int64())
    b = pa.array([9.5], pa.float64())
    arr = pa.UnionArray.from_dense(tids, offs, [a, b])
    assert_rt(arr)


def test_run_end_roundtrip():
    arr = pa.RunEndEncodedArray.from_arrays(
        pa.array([3, 5, 9], pa.int32()),
        pa.array(["x", None, "y"]))
    assert_rt(arr)


# ---- take per layout ---------------------------------------------------------

def _idx(*vals):
    return at.column(np.array(vals, np.int64))


def test_take_fixed_size_binary():
    col = column_from_pyarrow(pa.array([b"aa", b"bb", None, b"dd"],
                                       pa.binary(2)))
    out = column_to_pyarrow(take(col, _idx(3, 2, 0)))
    assert out.to_pylist() == [b"dd", None, b"aa"]


def test_take_decimal256():
    col = column_from_pyarrow(pa.array([10**40, None, -3], pa.decimal256(76)))
    out = take(col, _idx(2, 0, 1))
    assert out.to_pyarrow().to_pylist() == \
        [-3, 10**40, None]


def test_take_interval():
    mdn = pa.scalar((1, 2, 3), pa.month_day_nano_interval()).as_py()
    col = column_from_pyarrow(pa.array([mdn, None], pa.month_day_nano_interval()))
    out = column_to_pyarrow(take(col, _idx(1, 0, 0)))
    assert out.is_valid().to_pylist() == [False, True, True]


def test_take_fixed_size_list():
    col = column_from_pyarrow(pa.array([[1, 2], [3, 4], None],
                                       pa.list_(pa.int64(), 2)))
    out = column_to_pyarrow(take(col, _idx(2, 0)))
    assert out.to_pylist() == [None, [1, 2]]


def test_take_map():
    col = column_from_pyarrow(pa.array([[("a", 1)], [("b", 2), ("c", 3)]],
                                       pa.map_(pa.string(), pa.int64())))
    out = column_to_pyarrow(take(col, _idx(1, 0)))
    assert out.to_pylist() == [[("b", 2), ("c", 3)], [("a", 1)]]


def test_take_union_sparse_dense():
    tids = pa.array([0, 1, 0], pa.int8())
    a = pa.array([1, 2, 3], pa.int64())
    b = pa.array([1.5, 2.5, 3.5], pa.float64())
    sparse = column_from_pyarrow(pa.UnionArray.from_sparse(tids, [a, b]))
    out = column_to_pyarrow(take(sparse, _idx(2, 1)))
    assert out.to_pylist() == [3, 2.5]

    offs = pa.array([0, 0, 1], pa.int32())
    dense = column_from_pyarrow(pa.UnionArray.from_dense(
        tids, offs, [pa.array([7, 8], pa.int64()),
                     pa.array([9.5], pa.float64())]))
    out = column_to_pyarrow(take(dense, _idx(1, 2, 0)))
    assert out.to_pylist() == [9.5, 8, 7]


def test_take_run_end():
    col = column_from_pyarrow(pa.RunEndEncodedArray.from_arrays(
        pa.array([2, 5], pa.int32()), pa.array([10, 20], pa.int64())))
    out = take(col, _idx(0, 1, 2, 4))
    assert out.dtype.is_run_end_encoded
    assert column_to_pyarrow(out).to_pylist() == [10, 10, 20, 20]
    assert out.num_runs == 2          # adjacent physical runs merged


def test_run_end_slice():
    col = column_from_pyarrow(pa.RunEndEncodedArray.from_arrays(
        pa.array([2, 5, 6], pa.int32()), pa.array([1, 2, 3], pa.int64())))
    s = col.slice(1, 4)
    assert column_to_pyarrow(s).to_pylist() == [1, 2, 2, 2]


# ---- extension types ---------------------------------------------------------

def test_extension_types():
    u = dt.uuid()
    assert u.storage == dt.fixed_size_binary(16)
    assert dict(u.field_metadata())["ARROW:extension:name"] == "arrow.uuid"
    t = dt.fixed_shape_tensor(dt.float32, (2, 3))
    assert t.storage.list_size == 6
    assert dt.bool8().storage == dt.int8
    assert dt.json_().storage == dt.utf8
    o = dt.opaque(dt.binary, "geometry", "postgis")
    assert "postgis" in o.extension_metadata


def test_dtype_reprs():
    assert "union" in repr(dt.union([dt.Field("a", dt.int32)], "dense"))
    assert repr(dt.decimal256(76, 10)) == "decimal256(76, 10)"
    assert repr(dt.interval("year_month")) == "interval[year_month]"
    assert repr(dt.fixed_size_binary(8)) == "fixed_size_binary(8)"


# ---- ops over the new layouts -------------------------------------------------

def test_run_end_encode_decode():
    from arrow_tpu.ops.ree import run_end_encode, run_end_decode
    col = at.column(np.array([5, 5, 5, 2, 2, 9], np.int64),
                    validity=np.array([1, 1, 1, 1, 0, 1], bool))
    ree = run_end_encode(col)
    assert ree.num_runs == 4          # [5,5,5], [2], [null], [9]
    back = run_end_decode(ree)
    assert back.to_pylist() == [5, 5, 5, 2, None, 9]


def test_union_extract():
    from arrow_tpu.ops.select_misc import union_extract
    tids = pa.array([0, 1, 0], pa.int8())
    a = pa.array([1, 2, 3], pa.int64())
    b = pa.array([1.5, 2.5, 3.5], pa.float64())
    sparse = column_from_pyarrow(pa.UnionArray.from_sparse(tids, [a, b]))
    out = union_extract(sparse, sparse.fields[0].name)
    assert out.to_pylist() == [1, None, 3]

    offs = pa.array([0, 0, 1], pa.int32())
    dense = column_from_pyarrow(pa.UnionArray.from_dense(
        tids, offs, [pa.array([7, 8], pa.int64()),
                     pa.array([9.5], pa.float64())]))
    out = union_extract(dense, dense.fields[1].name)
    assert out.to_pylist() == [None, 9.5, None]


def test_concat_new_layouts():
    from arrow_tpu.ops.concat import concat
    # fixed-size binary
    a = column_from_pyarrow(pa.array([b"ab", None], pa.binary(2)))
    b = column_from_pyarrow(pa.array([b"cd"], pa.binary(2)))
    assert column_to_pyarrow(concat([a, b])).to_pylist() == \
        [b"ab", None, b"cd"]
    # decimal256
    d1 = column_from_pyarrow(pa.array([10**50], pa.decimal256(76)))
    d2 = column_from_pyarrow(pa.array([None, -5], pa.decimal256(76)))
    assert column_to_pyarrow(concat([d1, d2])).to_pylist() == \
        [10**50, None, -5]
    # dense union
    tids = pa.array([0, 1], pa.int8())
    offs = pa.array([0, 0], pa.int32())
    u1 = column_from_pyarrow(pa.UnionArray.from_dense(
        tids, offs, [pa.array([1], pa.int64()),
                     pa.array([2.5], pa.float64())]))
    u2 = column_from_pyarrow(pa.UnionArray.from_dense(
        tids, offs, [pa.array([3], pa.int64()),
                     pa.array([4.5], pa.float64())]))
    assert column_to_pyarrow(concat([u1, u2])).to_pylist() == \
        [1, 2.5, 3, 4.5]
    # run-end
    r1 = column_from_pyarrow(pa.RunEndEncodedArray.from_arrays(
        pa.array([2], pa.int32()), pa.array([1], pa.int64())))
    r2 = column_from_pyarrow(pa.RunEndEncodedArray.from_arrays(
        pa.array([1], pa.int32()), pa.array([9], pa.int64())))
    assert column_to_pyarrow(concat([r1, r2])).to_pylist() == [1, 1, 9]
    # map
    m1 = column_from_pyarrow(pa.array([[("a", 1)]],
                                      pa.map_(pa.string(), pa.int64())))
    m2 = column_from_pyarrow(pa.array([[("b", 2)]],
                                      pa.map_(pa.string(), pa.int64())))
    assert column_to_pyarrow(concat([m1, m2])).to_pylist() == \
        [[("a", 1)], [("b", 2)]]


def test_filter_new_layouts():
    from arrow_tpu.ops.filter import filter as filter_kernel
    col = column_from_pyarrow(pa.array([b"aa", b"bb", b"cc"], pa.binary(2)))
    keep = at.column(np.array([True, False, True]))
    assert column_to_pyarrow(filter_kernel(col, keep)).to_pylist() == \
        [b"aa", b"cc"]


def test_extension_field_metadata_roundtrip():
    """Canonical extension types ride field metadata across the pyarrow
    boundary (arrow-schema extension/mod.rs:188 model)."""
    import arrow_tpu as at
    from arrow_tpu.io.interop import table_from_pyarrow, table_to_pyarrow
    u = dt.uuid()
    col = at.FixedSizeBinaryColumn(
        jnp.asarray(np.frombuffer(b"0123456789abcdef" * 2, np.uint8)
                    .reshape(2, 16)))
    t = at.Table([col], dt.Schema((dt.Field("id", u.storage,
                                            metadata=u.field_metadata()),)))
    rb = table_to_pyarrow(t)
    assert rb.schema.field("id").metadata[b"ARROW:extension:name"] == \
        b"arrow.uuid"
    back = table_from_pyarrow(rb)
    assert dict(back.schema.field("id").metadata)[
        "ARROW:extension:name"] == "arrow.uuid"


def test_sort_run_end_column():
    from arrow_tpu.ops.sort import sort_to_indices
    col = column_from_pyarrow(pa.RunEndEncodedArray.from_arrays(
        pa.array([2, 4, 6], pa.int32()),
        pa.array([30, 10, 20], pa.int64())))
    idx = np.asarray(sort_to_indices(col).values)
    assert list(idx) == [2, 3, 4, 5, 0, 1]   # 10s, 20s, 30s (stable)


# ---- ListView / LargeListView (list_view_array.rs) ---------------------------

class TestListView:
    def _col(self):
        a = pa.array([[1, 2], None, [3], []], pa.list_view(pa.int64()))
        return column_from_pyarrow(a), a

    def test_roundtrip(self):
        c, a = self._col()
        assert column_to_pyarrow(c).to_pylist() == a.to_pylist()
        b = pa.array([[1.5], [2.5, 3.5]], pa.large_list_view(pa.float64()))
        cb = column_from_pyarrow(b)
        assert cb.dtype.name == "large_list_view"
        assert column_to_pyarrow(cb).to_pylist() == b.to_pylist()

    def test_take_shares_child(self):
        from arrow_tpu.ops.take import take
        c, _ = self._col()
        out = take(c, at.column(np.asarray([2, 0, 0], np.int64)))
        assert column_to_pyarrow(out).to_pylist() == [[3], [1, 2], [1, 2]]
        assert out.child is c.child          # no child copy

    def test_slice_is_view(self):
        c, _ = self._col()
        s = c.slice(1, 2)
        assert column_to_pyarrow(s).to_pylist() == [None, [3]]
        assert s.child is c.child

    def test_concat(self):
        from arrow_tpu.ops.concat import concat
        c, a = self._col()
        out = concat([c, c.slice(0, 2)])
        assert column_to_pyarrow(out).to_pylist() == \
            [[1, 2], None, [3], [], [1, 2], None]
        assert out.dtype.name == "list_view"

    def test_casts(self):
        from arrow_tpu.ops.cast import cast, can_cast
        c, _ = self._col()
        l = cast(c, dt.list_(dt.int64))
        assert column_to_pyarrow(l).to_pylist() == [[1, 2], None, [3], []]
        lf = cast(c, dt.list_(dt.float64))
        assert column_to_pyarrow(lf).to_pylist() == \
            [[1.0, 2.0], None, [3.0], []]
        v = cast(l, dt.list_view(dt.int64))
        assert column_to_pyarrow(v).to_pylist() == [[1, 2], None, [3], []]
        lv = cast(l, dt.large_list_view(dt.int64))
        assert column_to_pyarrow(lv).type == pa.large_list_view(pa.int64())
        assert can_cast(dt.list_view(dt.int64), dt.large_list(dt.float64))

    def test_out_of_order_overlapping_views(self):
        # views may overlap and be out of order (list_view_array.rs)
        from arrow_tpu.core.nested import ListViewColumn
        import jax.numpy as jnp
        child = at.column(np.asarray([10, 20, 30, 40], np.int64))
        c = ListViewColumn(jnp.asarray([2, 0, 1], jnp.int32),
                           jnp.asarray([2, 3, 1], jnp.int32), child)
        assert column_to_pyarrow(c).to_pylist() == \
            [[30, 40], [10, 20, 30], [20]]
        from arrow_tpu.ops.cast import cast
        assert column_to_pyarrow(
            cast(c, dt.list_(dt.int64))).to_pylist() == \
            [[30, 40], [10, 20, 30], [20]]


# ---- parse_data_type (datatype_parse.rs) -------------------------------------

class TestTypeParser:
    def test_simple_and_parameterized(self):
        from arrow_tpu.typeparse import parse_data_type as p
        assert p("Int32") == dt.int32
        assert p("Timestamp(Nanosecond, None)") == dt.timestamp("ns")
        assert p('Timestamp(Millisecond, Some("+08:00"))') == \
            dt.timestamp("ms", "+08:00")
        assert p("Dictionary(Int32, Utf8)") == \
            dt.dictionary(dt.int32, dt.utf8)
        assert p("List(FixedSizeBinary(2))") == \
            dt.list_(dt.fixed_size_binary(2))
        assert p("Struct(a Int32, b Utf8)") == dt.struct(
            [dt.Field("a", dt.int32), dt.Field("b", dt.utf8)])
        assert p("Decimal128(38, 10)") == dt.decimal128(38, 10)
        assert p("Decimal64(10, -2)") == dt.decimal64(10, -2)
        assert p("Interval(MonthDayNano)") == dt.interval("month_day_nano")
        assert p("ListView(Int64)") == dt.list_view(dt.int64)
        assert p("LargeListView(Utf8)") == dt.large_list_view(dt.utf8)
        assert p("FixedSizeList(3, Float32)") == \
            dt.fixed_size_list(dt.float32, 3)
        assert p("Duration(Microsecond)") == dt.duration("us")
        assert p("Time64(Nanosecond)") == dt.time64("ns")
        assert p("Struct()") == dt.struct([])

    def test_round_trips_whitespace(self):
        from arrow_tpu.typeparse import parse_data_type as p
        assert p("  List( Int8 ) ") == dt.list_(dt.int8)

    def test_errors(self):
        from arrow_tpu.typeparse import parse_data_type as p
        for bad in ("NotAType", "Int32, Int64", "Timestamp(Bogus, None)",
                    "List(", "Decimal128(1)", "Timestamp(Nanosecond)",
                    ""):
            with pytest.raises(at.ArrowInvalid):
                p(bad)


def test_run_end_encode_overflow_raises():
    """Run ends beyond the run-end type's max raise (pyarrow raises
    too) instead of wrapping negative."""
    from arrow_tpu.ops.ree import run_end_encode
    from arrow_tpu.errors import ArrowInvalid
    c = at.column(np.arange(40_000, dtype=np.int64))
    with pytest.raises(ArrowInvalid):
        run_end_encode(c, at.int16)
