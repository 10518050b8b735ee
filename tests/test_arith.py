"""Arithmetic kernel goldens vs pyarrow.compute (arrow-arith parity)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import create_primitive_array
from util import assert_column_equals_pa


CASES = [
    (np.int64, 0.0), (np.int64, 0.2), (np.int32, 0.1),
    (np.float64, 0.0), (np.float64, 0.3), (np.float32, 0.1),
]


@pytest.mark.parametrize("dtype,nulls", CASES)
def test_add_sub_mul(dtype, nulls):
    a = create_primitive_array(1000, nulls, dtype, seed=1)
    b = create_primitive_array(1000, nulls, dtype, seed=2)
    ca, cb = at.column(a), at.column(b)
    assert_column_equals_pa(ops.add(ca, cb), pc.add_checked(a, b))
    assert_column_equals_pa(ops.sub(ca, cb), pc.subtract_checked(a, b))
    assert_column_equals_pa(ops.mul(ca, cb), pc.multiply_checked(a, b))


def test_unsigned_add_mul():
    a = create_primitive_array(1000, 0.2, np.uint32, seed=1)
    b = create_primitive_array(1000, 0.2, np.uint32, seed=2)
    assert_column_equals_pa(ops.add(at.column(a), at.column(b)),
                            pc.add_checked(a, b))
    assert_column_equals_pa(ops.mul(at.column(a), at.column(b)),
                            pc.multiply_checked(a, b))


def test_div_int_trunc_toward_zero():
    a = at.column([7, -7, 7, -7, 0, None])
    b = at.column([2, 2, -2, -2, 3, 3])
    got = ops.div(a, b)
    assert got.to_pylist() == [3, -3, -3, 3, 0, None]


def test_div_float():
    a = create_primitive_array(500, 0.1, np.float64, seed=3)
    b = create_primitive_array(500, 0.1, np.float64, seed=4)
    assert_column_equals_pa(ops.div(at.column(a), at.column(b)),
                            pc.divide(a, b))


def test_rem():
    a = at.column([7, -7, 7, -7, None])
    b = at.column([3, 3, -3, -3, 2])
    assert ops.rem(a, b).to_pylist() == [1, -1, 1, -1, None]


def test_div_by_zero_raises():
    with pytest.raises(at.DivideByZero):
        ops.div(at.column([1, 2]), at.column([1, 0]))
    # zero under a null slot does NOT raise (try_binary skips nulls)
    got = ops.div(at.column([1, 2]), at.column([1, None]))
    assert got.to_pylist() == [1, None]


def test_checked_overflow_raises():
    i64max = np.iinfo(np.int64).max
    with pytest.raises(at.ArithmeticOverflow):
        ops.add(at.column(np.array([i64max])), at.column(np.array([1])))
    with pytest.raises(at.ArithmeticOverflow):
        ops.mul(at.column(np.array([i64max])), at.column(np.array([2])))
    with pytest.raises(at.ArithmeticOverflow):
        ops.sub(at.column(np.array([np.iinfo(np.int64).min])),
                at.column(np.array([1])))
    # overflow under null is ignored
    got = ops.add(at.column([i64max, 1]), at.column([None, 2]))
    assert got.to_pylist() == [None, 3]


def test_wrapping():
    i64max = np.iinfo(np.int64).max
    got = ops.add_wrapping(at.column(np.array([i64max])),
                           at.column(np.array([1])))
    assert got.to_pylist() == [np.iinfo(np.int64).min]


def test_unsigned_overflow():
    u8max = np.array([255], np.uint8)
    with pytest.raises(at.ArithmeticOverflow):
        ops.add(at.column(u8max), at.column(np.array([1], np.uint8)))
    with pytest.raises(at.ArithmeticOverflow):
        ops.sub(at.column(np.array([0], np.uint8)),
                at.column(np.array([1], np.uint8)))


def test_neg():
    assert ops.neg(at.column([1, -2, None])).to_pylist() == [-1, 2, None]
    with pytest.raises(at.ArithmeticOverflow):
        ops.neg(at.column(np.array([np.iinfo(np.int64).min])))


def test_scalar_broadcast():
    a = create_primitive_array(100, 0.2, np.int64)
    assert_column_equals_pa(ops.add(at.column(a), at.scalar(5)),
                            pc.add_checked(a, 5))
    assert_column_equals_pa(ops.sub(at.scalar(100), at.column(a)),
                            pc.subtract_checked(100, a))
    # null scalar nullifies everything
    got = ops.add(at.column([1, 2]), at.scalar(None, at.int64))
    assert got.to_pylist() == [None, None]


def test_timestamp_duration_arith():
    ts = at.column(pa.array([1000, 2000, None]).cast(pa.timestamp("us")))
    dur = at.column(pa.array([5, -5, 7]).cast(pa.duration("us")))
    got = ops.add(ts, dur)
    assert got.dtype == at.timestamp("us")
    assert got.to_pylist()[:2] == [pa.array([1005]).cast(
        pa.timestamp("us")).to_pylist()[0],
        pa.array([1995]).cast(pa.timestamp("us")).to_pylist()[0]]
    diff = ops.sub(ts, ts)
    assert diff.dtype == at.duration("us")


def test_type_mismatch_raises():
    with pytest.raises(at.ArrowError):
        ops.add(at.column([1, 2]), at.column([1.0, 2.0]))


def test_duration_plus_timestamp_unit_mismatch_raises():
    """The commuted (duration, timestamp) arm checks units too
    (numeric.rs dispatch) — raw count addition was silently wrong."""
    from arrow_tpu.ops import numeric as num
    from arrow_tpu.errors import ArrowTypeError
    d = at.column([3_600_000], dtype=at.duration("ms"))
    ts = at.column([0], dtype=at.timestamp("s"))
    with pytest.raises(ArrowTypeError):
        num.add(d, ts)


def test_neg_interval_and_decimal():
    """neg covers decimals and all three interval units with per-part
    checked semantics (numeric.rs:114-171)."""
    from arrow_tpu.ops import numeric as num
    from arrow_tpu.errors import ArithmeticOverflow
    ym = at.column(np.array([5, -3], np.int32),
                   dtype=at.interval("year_month"))
    assert np.asarray(num.neg(ym).values).tolist() == [-5, 3]
    packed = (2 << 32) | (0xFFFFFFFF & -7)      # days=2, ms=-7
    dti = at.column(np.array([packed], np.int64),
                    dtype=at.interval("day_time"))
    out = np.asarray(num.neg(dti).values)[0]
    assert (out >> 32) == -2 and np.int32(out & 0xFFFFFFFF) == 7
    bad = at.column(np.array([(-2**31) << 32], np.int64),
                    dtype=at.interval("day_time"))
    with pytest.raises(ArithmeticOverflow):
        num.neg(bad)
    from arrow_tpu.ops.cast import cast as _cast
    dec = _cast(at.column([1, -2, 3]), at.decimal128(10, 2))
    got = num.neg(dec)
    assert got.to_pylist() == [__import__("decimal").Decimal("-1.00"),
                               __import__("decimal").Decimal("2.00"),
                               __import__("decimal").Decimal("-3.00")]


def test_rem_min_by_neg_one_checked():
    """MIN % -1 is a checked error (Rust checked_rem), not 0."""
    from arrow_tpu.ops import numeric as num
    from arrow_tpu.errors import DivideByZero
    lo = np.iinfo(np.int64).min
    a = at.column(np.array([lo], np.int64))
    b = at.column(np.array([-1], np.int64))
    with pytest.raises(DivideByZero):
        num.rem(a, b)
