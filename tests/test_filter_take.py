"""Selection kernel goldens vs pyarrow (arrow-select filter.rs/take.rs
parity): all layouts, null predicates, null indices, batch-level reuse."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import (create_boolean_array,
                                        create_primitive_array,
                                        create_string_array,
                                        create_string_dict_array)
from util import assert_column_equals_pa


ARRAYS = [
    create_primitive_array(1000, 0.0, np.int64),
    create_primitive_array(1000, 0.3, np.float64),
    create_boolean_array(1000, 0.2),
    create_string_array(1000, 0.2),
    create_string_dict_array(1000, 0.2),
    pa.array([[1, 2], None, [], [3, 4, 5]] * 250, pa.list_(pa.int64())),
    pa.array([{"x": i if i % 3 else None} for i in range(1000)],
             pa.struct([("x", pa.int64())])),
]


@pytest.mark.parametrize("arr", ARRAYS, ids=lambda a: str(a.type))
@pytest.mark.parametrize("selectivity", [0.0, 0.1, 0.5, 0.99, 1.0])
def test_filter_golden(arr, selectivity):
    pred = create_boolean_array(len(arr), 0.0, selectivity, seed=7)
    got = ops.filter(at.column(arr), at.column(pred))
    assert_column_equals_pa(got, arr.filter(pred))


def test_filter_null_predicate_drops():
    """Null predicate slots drop rows (prep_null_mask_filter,
    filter.rs:116)."""
    arr = pa.array([1, 2, 3, 4])
    pred = pa.array([True, None, False, True])
    got = ops.filter(at.column(arr), at.column(pred))
    assert got.to_pylist() == [1, 4]
    assert_column_equals_pa(got, arr.filter(pred, null_selection_behavior="drop"))


@pytest.mark.parametrize("arr", ARRAYS, ids=lambda a: str(a.type))
def test_take_golden(arr):
    rng = np.random.default_rng(5)
    idx = pa.array(rng.integers(0, len(arr), 300), pa.int64())
    got = ops.take(at.column(arr), at.column(idx))
    assert_column_equals_pa(got, arr.take(idx))


def test_take_null_indices():
    arr = pa.array([10, 20, 30])
    idx = pa.array([0, None, 2, None])
    got = ops.take(at.column(arr), at.column(idx))
    assert got.to_pylist() == [10, None, 30, None]


def test_take_bounds_check():
    arr = at.column([1, 2, 3])
    with pytest.raises(at.ArrowError):
        ops.take(arr, at.column([0, 5]), check_bounds=True)
    # null index out of range is fine
    got = ops.take(arr, at.column(pa.array([0, None])), check_bounds=True)
    assert got.to_pylist() == [1, None]


def test_filter_table_shares_predicate():
    batch = pa.record_batch({
        "a": create_primitive_array(500, 0.1, np.int64),
        "s": create_string_array(500, 0.2),
        "d": create_string_dict_array(500, 0.0),
    })
    pred = create_boolean_array(500, 0.1, 0.5, seed=9)
    t = at.Table.from_pyarrow(batch)
    got = ops.filter_table(t, at.column(pred))
    exp = batch.filter(pred)  # pyarrow default drops nulls for record batch
    for i in range(batch.num_columns):
        assert_column_equals_pa(got.columns[i], exp.column(i))


def test_take_table():
    batch = pa.record_batch({"a": pa.array([1, 2, 3]),
                             "b": pa.array(["x", "y", "z"])})
    t = at.Table.from_pyarrow(batch)
    got = ops.take_table(t, at.column([2, 0]))
    assert got.to_pydict() == {"a": [3, 1], "b": ["z", "x"]}


def test_filter_static():
    import jax.numpy as jnp
    vals = jnp.arange(10, dtype=jnp.int64)
    keep = jnp.asarray([True, False] * 5)
    out, n = ops.filter_static(vals, keep)
    assert int(n) == 5
    assert np.asarray(out)[:5].tolist() == [0, 2, 4, 6, 8]
    # jit-compatible: no host sync inside
    import jax
    out2, n2 = jax.jit(ops.filter_static)(vals, keep)
    assert int(n2) == 5
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_filter_empty_and_all():
    arr = pa.array([1, 2, 3])
    assert ops.filter(at.column(arr), at.column([False] * 3)).to_pylist() == []
    assert ops.filter(at.column(arr), at.column([True] * 3)).to_pylist() == \
        [1, 2, 3]


def test_take_unchecked_clamps_bytes_and_list():
    """Unchecked take clamps out-of-range indices on STRING and LIST
    layouts like the primitive path (numpy fancy indexing crashed)."""
    s = at.column(["aa", "bb"])
    out = ops.take(s, at.column(np.array([7, 7], np.int64)))
    assert out.to_pylist() == ["bb", "bb"]
    out2 = ops.take(s, at.column(np.array([-1], np.int64)))
    assert out2.to_pylist() == ["aa"]
    lst = at.column([[1], [2, 3]])
    out3 = ops.take(lst, at.column(np.array([5], np.int64)))
    assert out3.to_pylist() == [[2, 3]]
