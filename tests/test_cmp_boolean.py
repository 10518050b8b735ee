"""Comparison + boolean kernel goldens vs pyarrow.compute
(arrow-ord/src/cmp.rs, arrow-arith/src/boolean.rs parity)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import (create_boolean_array,
                                        create_primitive_array)
from util import assert_column_equals_pa


OPS = [("eq", "equal"), ("neq", "not_equal"), ("lt", "less"),
       ("lt_eq", "less_equal"), ("gt", "greater"), ("gt_eq", "greater_equal")]


@pytest.mark.parametrize("dtype,nulls", [(np.int64, 0.0), (np.int64, 0.2),
                                         (np.float64, 0.3)])
@pytest.mark.parametrize("op,pa_op", OPS)
def test_cmp(op, pa_op, dtype, nulls):
    # narrow value range to get plenty of equal pairs
    a = create_primitive_array(1000, nulls, dtype, seed=1, lo=-5, hi=5)
    b = create_primitive_array(1000, nulls, dtype, seed=2, lo=-5, hi=5)
    got = getattr(ops, op)(at.column(a), at.column(b))
    assert_column_equals_pa(got, getattr(pc, pa_op)(a, b))


def test_cmp_scalar():
    a = create_primitive_array(500, 0.2, np.int64)
    assert_column_equals_pa(ops.gt(at.column(a), at.scalar(0)),
                            pc.greater(a, 0))
    assert_column_equals_pa(ops.lt_eq(at.scalar(0), at.column(a)),
                            pc.less_equal(0, a))


def test_cmp_nan_ieee():
    a = at.column([float("nan"), 1.0])
    got = ops.eq(a, a)
    assert got.to_pylist() == [False, True]


def test_distinct():
    a = at.column([1, None, 3, None])
    b = at.column([1, None, 4, 5])
    assert ops.distinct(a, b).to_pylist() == [False, False, True, True]
    assert ops.not_distinct(a, b).to_pylist() == [True, True, False, False]


def test_and_or_not():
    a = create_boolean_array(1000, 0.2, seed=1)
    b = create_boolean_array(1000, 0.2, seed=2)
    ca, cb = at.column(a), at.column(b)
    assert_column_equals_pa(ops.and_(ca, cb), pc.and_(a, b))
    assert_column_equals_pa(ops.or_(ca, cb), pc.or_(a, b))
    assert_column_equals_pa(ops.not_(ca), pc.invert(a))


def test_kleene():
    vals = [True, False, None]
    a = at.column([x for x in vals for _ in vals], at.bool_)
    b = at.column(vals * 3, at.bool_)
    pa_a = pa.array([x for x in vals for _ in vals], pa.bool_())
    pa_b = pa.array(vals * 3, pa.bool_())
    assert_column_equals_pa(ops.and_kleene(a, b), pc.and_kleene(pa_a, pa_b))
    assert_column_equals_pa(ops.or_kleene(a, b), pc.or_kleene(pa_a, pa_b))


def test_kleene_random():
    a = create_boolean_array(1000, 0.3, seed=3)
    b = create_boolean_array(1000, 0.3, seed=4)
    assert_column_equals_pa(ops.and_kleene(at.column(a), at.column(b)),
                            pc.and_kleene(a, b))
    assert_column_equals_pa(ops.or_kleene(at.column(a), at.column(b)),
                            pc.or_kleene(a, b))


def test_is_null():
    a = at.column([1, None, 3])
    assert ops.is_null(a).to_pylist() == [False, True, False]
    assert ops.is_not_null(a).to_pylist() == [True, False, True]
    b = at.column([1, 2])
    assert ops.is_null(b).to_pylist() == [False, False]
