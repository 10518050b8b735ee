"""Decimal and list cast matrix (cast/decimal.rs, cast/list.rs) —
pyarrow.compute.cast is the behavior oracle."""

from decimal import Decimal

import numpy as np
import jax.numpy as jnp
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import dtypes as dt
from arrow_tpu.io.interop import column_from_pyarrow, column_to_pyarrow
from arrow_tpu.ops.cast import cast, can_cast, CastOptions


def oracle_cast(arr: pa.Array, to: pa.DataType) -> list:
    return pc.cast(arr, to).to_pylist()


def ours(arr: pa.Array, to: dt.DataType) -> list:
    return column_to_pyarrow(cast(column_from_pyarrow(arr), to)).to_pylist()


def test_decimal_rescale_up():
    arr = pa.array([Decimal("12.34"), None, Decimal("-0.05")],
                   pa.decimal128(10, 2))
    to = dt.decimal128(12, 4)
    assert ours(arr, to) == oracle_cast(arr, pa.decimal128(12, 4))


def test_decimal_rescale_down_rounds():
    arr = pa.array([Decimal("12.345"), Decimal("12.344"),
                    Decimal("-12.345")], pa.decimal128(10, 3))
    got = ours(arr, dt.decimal128(10, 2))
    # 12.345 -> 12.35 / 12.344 -> 12.34 / -12.345 -> -12.35 (half away)
    assert [str(x) for x in got] == ["12.35", "12.34", "-12.35"]


def test_decimal_widths():
    arr = pa.array([Decimal("0.7"), None], pa.decimal128(10, 1))
    got = ours(arr, dt.decimal256(40, 3))
    assert [None if x is None else str(x) for x in got] == ["0.700", None]
    arr2 = pa.array([Decimal(123)], pa.decimal64(10, 0))
    assert str(ours(arr2, dt.decimal32(5, 1))[0]) == "123.0"


def test_decimal_to_int_float_string():
    arr = pa.array([Decimal("123.45"), Decimal("-6.78"), None],
                   pa.decimal128(10, 2))
    assert ours(arr, dt.int64) == [123, -6, None]
    assert ours(arr, dt.float64) == [123.45, -6.78, None]
    assert ours(arr, dt.utf8) == ["123.45", "-6.78", None]


def test_int_float_string_to_decimal():
    ints = pa.array([12, None, -3], pa.int64())
    assert [None if x is None else str(x)
            for x in ours(ints, dt.decimal128(10, 2))] == \
        ["12.00", None, "-3.00"]
    floats = pa.array([1.005, -2.5], pa.float64())
    got = ours(floats, dt.decimal128(10, 2))
    assert str(got[1]) == "-2.50"
    strs = pa.array(["12.345", "bad", None], pa.string())
    got = ours(strs, dt.decimal128(10, 2))
    assert str(got[0]) == "12.35" and got[1] is None and got[2] is None


def test_decimal_overflow_safe_and_raise():
    arr = pa.array([Decimal(99999)], pa.decimal128(5, 0))
    got = cast(column_from_pyarrow(arr), dt.decimal32(3, 0))
    assert got.to_pyarrow().to_pylist() == [None]
    with pytest.raises(Exception):
        cast(column_from_pyarrow(arr), dt.decimal32(3, 0),
             CastOptions(safe=False))


def test_list_to_large_list_and_back():
    arr = pa.array([[1, 2], None, [3]], pa.list_(pa.int64()))
    got = ours(arr, dt.large_list(dt.int64))
    assert got == [[1, 2], None, [3]]
    back = ours(pa.array([[1], [2, 3]], pa.large_list(pa.int64())),
                dt.list_(dt.int64))
    assert back == [[1], [2, 3]]


def test_list_child_cast():
    arr = pa.array([[1, 2], [3]], pa.list_(pa.int64()))
    got = column_to_pyarrow(cast(column_from_pyarrow(arr),
                                 dt.list_(dt.float64)))
    assert got.to_pylist() == [[1.0, 2.0], [3.0]]
    assert got.type == pa.list_(pa.float64())


def test_list_to_fixed_size_list():
    arr = pa.array([[1, 2], [3, 4], None], pa.list_(pa.int64()))
    got = ours(arr, dt.fixed_size_list(dt.int64, 2))
    assert got == [[1, 2], [3, 4], None]
    ragged = pa.array([[1], [2, 3]], pa.list_(pa.int64()))
    got = ours(ragged, dt.fixed_size_list(dt.int64, 2))
    assert got == [None, [2, 3]]          # safe: bad lengths -> null


def test_fixed_size_list_to_list():
    arr = pa.array([[1, 2], None], pa.list_(pa.int64(), 2))
    assert ours(arr, dt.list_(dt.int64)) == [[1, 2], None]


def test_can_cast_matrix():
    assert can_cast(dt.decimal128(10, 2), dt.decimal256(40, 3))
    assert can_cast(dt.int64, dt.decimal64(10, 2))
    assert can_cast(dt.decimal32(5, 1), dt.utf8)
    assert can_cast(dt.list_(dt.int64), dt.large_list(dt.float64))
    assert not can_cast(dt.decimal128(10, 2), dt.list_(dt.int64))


def test_map_casts():
    arr = pa.array([[("a", 1)], None, [("b", 2), ("c", 3)]],
                   pa.map_(pa.string(), pa.int64()))
    col = column_from_pyarrow(arr)
    # map -> map (item cast)
    out = cast(col, dt.map_(dt.utf8, dt.float64))
    got = column_to_pyarrow(out)
    assert got.type == pa.map_(pa.string(), pa.float64())
    assert got.to_pylist() == [[("a", 1.0)], None, [("b", 2.0), ("c", 3.0)]]
    # map -> list<struct>
    lst = cast(col, dt.list_(dt.struct([
        dt.Field("key", dt.utf8, nullable=False),
        dt.Field("value", dt.int64)])))
    assert column_to_pyarrow(lst).to_pylist() == \
        [[{"key": "a", "value": 1}], None,
         [{"key": "b", "value": 2}, {"key": "c", "value": 3}]]
    # list<struct> -> map
    back = cast(lst, dt.map_(dt.utf8, dt.int64))
    assert column_to_pyarrow(back).equals(arr)


def test_decimal_arithmetic_matches_pyarrow():
    from arrow_tpu.ops import numeric as num
    a = pa.array([Decimal("1.25"), None, Decimal("-3.5")],
                 pa.decimal128(10, 2))
    b = pa.array([Decimal("2.5"), Decimal("1"), Decimal("0.5")],
                 pa.decimal128(8, 1))
    ca, cb = column_from_pyarrow(a), column_from_pyarrow(b)
    for op, pcop in (("add", pc.add), ("sub", pc.subtract),
                     ("mul", pc.multiply)):
        got = column_to_pyarrow(getattr(num, op)(ca, cb))
        want = pcop(a, b)
        assert got.type == want.type, (op, got.type, want.type)
        assert got.to_pylist() == want.to_pylist(), op
    # division scale: arrow-rs uses the postgres-style s1 + 4
    # (numeric.rs:884) where Arrow C++ uses s1 + p2 - s2 + 1 — we follow
    # arrow-rs (same stance as struct-cast-by-position)
    got = column_to_pyarrow(num.div(ca, cb))
    assert got.type == pa.decimal128(15, 6), got.type
    assert [None if v is None else str(v) for v in got.to_pylist()] == \
        ["0.500000", None, "-7.000000"]


def test_decimal_div_truncates_and_dbz():
    from arrow_tpu.ops import numeric as num
    from arrow_tpu.errors import DivideByZero
    a = pa.array([Decimal("2"), Decimal("-1")], pa.decimal128(3, 0))
    b = pa.array([Decimal("3"), Decimal("3")], pa.decimal128(3, 0))
    got = column_to_pyarrow(num.div(column_from_pyarrow(a),
                                    column_from_pyarrow(b)))
    assert [str(x) for x in got.to_pylist()] == ["0.6666", "-0.3333"]
    z = pa.array([Decimal("0"), Decimal("1")], pa.decimal128(3, 0))
    with pytest.raises(DivideByZero):
        num.div(column_from_pyarrow(a), column_from_pyarrow(z))


def test_decimal_small_width_arith():
    from arrow_tpu.ops import numeric as num
    a = pa.array([Decimal("1.5")], pa.decimal64(5, 1))
    b = pa.array([Decimal("2.5")], pa.decimal64(5, 1))
    out = num.add(column_from_pyarrow(a), column_from_pyarrow(b))
    assert out.dtype.name == "decimal64"           # keeps input width
    assert column_to_pyarrow(out).to_pylist() == [Decimal("4.0")]


def test_sort_decimal_columns():
    from arrow_tpu.ops.sort import sort_to_indices, SortOptions
    arr = pa.array([Decimal(10**30), None, Decimal(-5), Decimal(0),
                    Decimal(-10**30)], pa.decimal256(76, 0))
    col = column_from_pyarrow(arr)
    idx = np.asarray(sort_to_indices(col).values)
    assert list(idx) == [1, 4, 2, 3, 0]        # nulls first, ascending
    idx_d = np.asarray(sort_to_indices(
        col, SortOptions(descending=True, nulls_first=False)).values)
    assert list(idx_d) == [0, 3, 2, 4, 1]
    # decimal64 storage sorts through the int path
    small = column_from_pyarrow(pa.array(
        [Decimal("2.5"), Decimal("-1.5")], pa.decimal64(10, 1)))
    assert list(np.asarray(sort_to_indices(small).values)) == [1, 0]


def test_decimal_compare():
    from arrow_tpu.ops import cmp as C
    a = pa.array([Decimal("1.25"), Decimal("-3"), None, Decimal(10**30)],
                 pa.decimal256(76, 2))
    b = pa.array([Decimal("1.3"), Decimal("-3.0"), Decimal("0"),
                  Decimal(-10**30)], pa.decimal128(38, 1))
    ca, cb = column_from_pyarrow(a), column_from_pyarrow(b)
    got_lt = C.lt(ca, cb).to_pylist()
    assert got_lt == [True, False, None, False]
    got_eq = C.eq(ca, cb).to_pylist()
    assert got_eq == [False, True, None, False]
    # small widths on the device-int path
    sa = column_from_pyarrow(pa.array([Decimal("2.5")], pa.decimal64(5, 1)))
    sb = column_from_pyarrow(pa.array([Decimal("2.50")], pa.decimal32(5, 2)))
    assert C.eq(sa, sb).to_pylist() == [True]


def test_decimal_aggregates():
    from arrow_tpu.ops import aggregate as agg
    arr = pa.array([Decimal("1.25"), None, Decimal("-3.50"),
                    Decimal(10**30)], pa.decimal256(76, 2))
    col = column_from_pyarrow(arr)
    assert agg.sum_(col).as_py() == Decimal(10**30) + Decimal("-2.25")
    assert agg.min_(col).as_py() == Decimal("-3.50")
    assert agg.max_(col).as_py() == Decimal(10**30)
    small = column_from_pyarrow(pa.array([Decimal("2.5"), Decimal("1.0")],
                                         pa.decimal64(5, 1)))
    assert agg.sum_(small).as_py() == Decimal("3.5")
    empty = column_from_pyarrow(pa.array([None, None],
                                         pa.decimal128(10, 2)))
    assert not agg.sum_(empty).valid


# ---- interval casts (cast/mod.rs:283-298, display.rs:699-846) -----------------

class TestIntervalCasts:
    def _mdn(self, rows):
        from arrow_tpu.core.nested import IntervalMDNColumn
        import jax.numpy as jnp
        m, d, ns = zip(*rows)
        return IntervalMDNColumn(jnp.asarray(m, jnp.int32),
                                 jnp.asarray(d, jnp.int32),
                                 jnp.asarray(ns, jnp.int64))

    def test_year_month_to_mdn(self):
        c = at.PrimitiveColumn(jnp.asarray([14, -3], jnp.int32),
                               dt.interval("year_month"))
        out = cast(c, dt.interval("month_day_nano"))
        assert [int(x) for x in np.asarray(out.months)] == [14, -3]
        assert np.asarray(out.days).tolist() == [0, 0]
        assert np.asarray(out.nanos).tolist() == [0, 0]

    def test_day_time_to_mdn(self):
        packed = (np.int64(3) << 32) | np.int64(1500)   # 3 days, 1500 ms
        c = at.PrimitiveColumn(jnp.asarray([packed], jnp.int64),
                               dt.interval("day_time"))
        out = cast(c, dt.interval("month_day_nano"))
        assert int(np.asarray(out.days)[0]) == 3
        assert int(np.asarray(out.nanos)[0]) == 1500 * 10**6

    def test_duration_roundtrip_mdn(self):
        c = at.PrimitiveColumn(jnp.asarray([5, -7], jnp.int64),
                               dt.duration("ms"))
        mdn = cast(c, dt.interval("month_day_nano"))
        assert np.asarray(mdn.nanos).tolist() == [5 * 10**6, -7 * 10**6]
        back = cast(mdn, dt.duration("us"))
        assert np.asarray(back.values).tolist() == [5000, -7000]

    def test_mdn_to_duration_nonzero_months_nulls(self):
        mdn = self._mdn([(1, 0, 10**9), (0, 0, 10**9)])
        out = cast(mdn, dt.duration("s"))
        assert out.to_pylist()[0] is None
        assert out.to_pylist()[1] is not None
        with pytest.raises(at.CastError):
            cast(mdn, dt.duration("s"), CastOptions(safe=False))

    def test_interval_to_int64_and_back(self):
        c = at.PrimitiveColumn(jnp.asarray([25], jnp.int32),
                               dt.interval("year_month"))
        out = cast(c, dt.int64)
        assert np.asarray(out.values).tolist() == [25]
        back = cast(at.PrimitiveColumn(jnp.asarray([25], jnp.int32),
                                       dt.int32), dt.interval("year_month"))
        assert back.dtype == dt.interval("year_month")

    def test_interval_display(self):
        c = at.PrimitiveColumn(jnp.asarray([14, -3], jnp.int32),
                               dt.interval("year_month"))
        assert cast(c, dt.utf8).to_pylist() == \
            ["1 years 2 mons", "-1 years 9 mons"]
        mdn = self._mdn([(1, 2, 3_661_000_000_500),
                         (0, 0, -500_000_000)])
        got = cast(mdn, dt.utf8).to_pylist()
        assert got[0] == "1 mons 2 days 1 hours 1 mins 1.000000500 secs"
        assert got[1] == "-0.500000000 secs"

    def test_parse_interval_strings(self):
        s = at.column(["1 year 2 months", "3 days 04:05:06.5",
                       "250 milliseconds", "garbage"])
        out = cast(s, dt.interval("month_day_nano"))
        vals = list(zip(np.asarray(out.months).tolist(),
                        np.asarray(out.days).tolist(),
                        np.asarray(out.nanos).tolist()))
        assert vals[0] == (14, 0, 0)
        assert vals[1] == (0, 3, (4 * 3600 + 5 * 60 + 6) * 10**9 + 5 * 10**8)
        assert vals[2] == (0, 0, 250 * 10**6)
        assert np.asarray(out.validity).tolist() == [True, True, True, False]
        with pytest.raises(at.CastError):
            cast(s, dt.interval("month_day_nano"), CastOptions(safe=False))

    def test_parse_to_year_month_and_day_time(self):
        s = at.column(["2 years", "1 day"])
        ym = cast(s, dt.interval("year_month"))
        vals = np.asarray(ym.values).tolist()
        valid = np.asarray(ym.is_valid_mask()).tolist()
        assert vals[0] == 24 and valid == [True, False]  # days -> null
        dtc = cast(s, dt.interval("day_time"))
        x = np.asarray(dtc.values).astype(np.int64)
        assert (int(x[1]) >> 32) == 1
        assert np.asarray(dtc.is_valid_mask()).tolist() == [False, True]

    def test_can_cast_matrix(self):
        from arrow_tpu.ops.cast import can_cast
        assert can_cast(dt.interval("year_month"), dt.int64)
        assert can_cast(dt.interval("day_time"), dt.int64)
        assert not can_cast(dt.interval("month_day_nano"), dt.int64)
        assert can_cast(dt.int32, dt.interval("year_month"))
        assert not can_cast(dt.int32, dt.interval("day_time"))
        assert can_cast(dt.duration("s"), dt.interval("month_day_nano"))
        assert can_cast(dt.interval("month_day_nano"), dt.duration("ns"))
        assert not can_cast(dt.interval("year_month"), dt.duration("s"))
        assert can_cast(dt.utf8, dt.interval("month_day_nano"))
        assert can_cast(dt.interval("day_time"), dt.utf8)
        assert not can_cast(dt.float64, dt.interval("month_day_nano"))
