"""Reduction goldens vs pyarrow.compute (arrow-arith/aggregate.rs parity)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import (create_boolean_array,
                                        create_primitive_array)


@pytest.mark.parametrize("dtype,nulls", [(np.int64, 0.0), (np.int64, 0.3),
                                         (np.int32, 0.2)])
def test_int_sum_min_max(dtype, nulls):
    arr = create_primitive_array(1000, nulls, dtype)
    col = at.column(arr)
    assert ops.sum_(col).as_py() == pc.sum(arr).as_py()
    assert ops.sum_checked(col).as_py() == pc.sum(arr).as_py()
    assert ops.min_(col).as_py() == pc.min(arr).as_py()
    assert ops.max_(col).as_py() == pc.max(arr).as_py()
    assert ops.count(col) == pc.count(arr).as_py()


def test_narrow_int_sum_wraps_in_type():
    """arrow-rs `sum` accumulates in T (wrapping); pyarrow promotes —
    we follow the reference."""
    arr = create_primitive_array(1000, 0.1, np.uint16)
    col = at.column(arr)
    exp = pc.sum(arr).as_py() % (1 << 16)
    assert ops.sum_(col).as_py() == exp
    with pytest.raises(at.ArithmeticOverflow):
        ops.sum_checked(col)


def test_float_sum_min_max():
    arr = create_primitive_array(1000, 0.2, np.float64)
    col = at.column(arr)
    assert ops.sum_(col).as_py() == pytest.approx(pc.sum(arr).as_py(),
                                                  rel=1e-12)
    assert ops.min_(col).as_py() == pc.min(arr).as_py()
    assert ops.max_(col).as_py() == pc.max(arr).as_py()


def test_empty_and_all_null():
    empty = at.column([], at.int64)
    assert ops.sum_(empty).as_py() is None
    assert ops.min_(empty).as_py() is None
    all_null = at.column([None, None], at.float64)
    assert ops.sum_(all_null).as_py() is None
    assert ops.max_(all_null).as_py() is None
    assert ops.count(all_null) == 0
    assert ops.count_nulls(all_null) == 2


def test_sum_checked_overflow():
    big = np.array([np.iinfo(np.int64).max, 1], np.int64)
    col = at.column(big)
    with pytest.raises(at.ArithmeticOverflow):
        ops.sum_checked(col)
    # wrapping sum does not raise
    assert ops.sum_(col).as_py() == np.iinfo(np.int64).min


def test_min_max_nan_total_order():
    """NaN counts as greater than +inf (ArrowNativeTypeOp::compare)."""
    col = at.column([1.0, float("nan"), 2.0])
    assert np.isnan(ops.max_(col).as_py())
    assert ops.min_(col).as_py() == 1.0


def test_bool_and_or():
    arr = create_boolean_array(500, 0.2)
    col = at.column(arr)
    assert ops.bool_and(col).as_py() == pc.all(arr).as_py()
    assert ops.bool_or(col).as_py() == pc.any(arr).as_py()
    assert ops.bool_and(at.column([], at.bool_)).as_py() is None


def test_string_min_max_golden():
    arr = pa.array(["pear", None, "apple", "zebra"])
    assert ops.min_(at.column(arr)).as_py() == "apple"
    assert ops.max_(at.column(arr)).as_py() == "zebra"
    d = at.column(arr.dictionary_encode())
    assert ops.min_(d).as_py() == "apple"
    assert ops.max_(d).as_py() == "zebra"


def test_bit_aggregates():
    """bit_and/bit_or/bit_xor (aggregate.rs:719-752)."""
    from arrow_tpu.ops.aggregate import bit_and, bit_or, bit_xor
    from arrow_tpu.io.interop import column_from_pyarrow
    c = column_from_pyarrow(pa.array([0b1101, 0b1011, None], pa.int64()))
    assert bit_and(c).as_py() == 0b1001
    assert bit_or(c).as_py() == 0b1111
    assert bit_xor(c).as_py() == 0b0110
    u = column_from_pyarrow(pa.array([3, 5, 6], pa.uint8()))
    assert bit_and(u).as_py() == 0
    assert bit_or(u).as_py() == 7
    assert bit_xor(u).as_py() == 0
    empty = column_from_pyarrow(pa.array([None, None], pa.int32()))
    assert not bit_and(empty).valid
    assert not bit_xor(empty).valid
    with pytest.raises(at.ArrowTypeError):
        bit_and(column_from_pyarrow(pa.array([1.5], pa.float64())))


def test_min_max_sentinel_tie_with_null():
    """max over [None, i64::MIN] (and min over [None, i64::MAX]):
    the null slot's sentinel key ties with the extreme value — the
    extremum must come from a VALID slot."""
    from arrow_tpu.ops import aggregate as agg
    lo, hi = -2**63, 2**63 - 1
    c = at.column([None, lo])
    assert int(np.asarray(agg.max_(c).value)) == lo
    assert agg.max_(c).valid
    c2 = at.column([None, hi])
    assert int(np.asarray(agg.min_(c2).value)) == hi
    c3 = at.column([None, float("nan")])
    import math
    assert math.isnan(float(np.asarray(agg.min_(c3).value)))
