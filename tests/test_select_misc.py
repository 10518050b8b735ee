"""concat/interleave/zip/nullif/shift goldens (arrow-select parity)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import (create_primitive_array,
                                        create_string_array,
                                        create_string_dict_array)
from util import assert_column_equals_pa


def test_concat_primitive():
    parts = [create_primitive_array(100, nd, np.int64, seed=s)
             for s, nd in [(1, 0.0), (2, 0.3), (3, 0.1)]]
    got = ops.concat([at.column(p) for p in parts])
    assert_column_equals_pa(got, pa.concat_arrays(parts))


def test_concat_strings():
    parts = [create_string_array(50, 0.2, seed=s) for s in (1, 2)]
    got = ops.concat([at.column(p) for p in parts])
    assert_column_equals_pa(got, pa.concat_arrays(parts))


def test_concat_dictionary():
    parts = [create_string_dict_array(50, 0.1, cardinality=10, seed=s)
             for s in (1, 2)]
    got = ops.concat([at.column(p) for p in parts])
    exp = pa.concat_arrays([p.cast(pa.string()) for p in parts])
    # compare decoded values (dictionaries merge differently by design)
    assert got.to_pylist() == exp.to_pylist()


def test_concat_type_mismatch():
    with pytest.raises(at.ArrowError):
        ops.concat([at.column([1]), at.column([1.0])])


def test_concat_tables():
    t1 = at.Table.from_pydict({"a": [1, 2], "b": ["x", "y"]})
    t2 = at.Table.from_pydict({"a": [3], "b": [None]}, schema=t1.schema)
    got = ops.concat_tables([t1, t2])
    assert got.to_pydict() == {"a": [1, 2, 3], "b": ["x", "y", None]}


def test_interleave():
    a = at.column([1, 2, None])
    b = at.column([10, None])
    got = ops.interleave([a, b], [(0, 2), (1, 0), (1, 1), (0, 0)])
    assert got.to_pylist() == [None, 10, None, 1]


def test_interleave_strings():
    a = at.column(["a", "bb"])
    b = at.column(["ccc", None])
    got = ops.interleave([a, b], [(1, 0), (0, 0), (1, 1)])
    assert got.to_pylist() == ["ccc", "a", None]


def test_zip_golden():
    """zip.rs doctest semantics: null mask -> FALSY value (pyarrow's
    if_else DIFFERS — null mask -> null; we follow arrow-rs)."""
    mask = pa.array([True, True, False, None, True])
    a = pa.array([1, None, 3, 4, 5])
    b = pa.array([10, 20, 30, 40, 50])
    got = ops.zip_(at.column(mask), at.column(a), at.column(b))
    assert got.to_pylist() == [1, None, 30, 40, 5]


def test_zip_scalar():
    mask = at.column([True, False, True])
    got = ops.zip_(mask, at.scalar(99), at.column([1, 2, 3]))
    assert got.to_pylist() == [99, 2, 99]


def test_nullif():
    col = at.column([1, 2, 3, None])
    cond = at.column([True, False, None, False])
    assert ops.nullif(col, cond).to_pylist() == [None, 2, 3, None]


def test_shift():
    col = at.column([1, 2, None, 4])
    assert ops.shift(col, 1).to_pylist() == [None, 1, 2, None]
    assert ops.shift(col, -2).to_pylist() == [None, 4, None, None]
    assert ops.shift(col, 0).to_pylist() == [1, 2, None, 4]
    assert ops.shift(col, 9).to_pylist() == [None] * 4


def test_zip_generic_layouts():
    """Non-primitive zip rides the interleave copy engine (zip.rs
    MutableArrayData fallback role)."""
    m = at.column([True, False, True, None])
    s = ops.zip_(m, at.column(["a", "b", None, "d"]),
                 at.column(["w", "x", "y", "z"]))
    assert s.to_pylist() == ["a", "x", None, "z"]
    l = ops.zip_(m, at.column([[1], [2], None, [4]],
                              at.dtypes.list_(at.int64)),
                 at.column([[9], [8], [7], [6]],
                           at.dtypes.list_(at.int64)))
    assert l.to_pylist() == [[1], [8], None, [6]]
    d1 = ops.dictionary_encode(at.column(["p", "q", "p", "r"]))
    d2 = ops.dictionary_encode(at.column(["z", "z", "y", "y"]))
    dz = ops.zip_(m, d1, d2)
    assert dz.to_pylist() == ["p", "z", "p", "y"]
    st = ops.zip_(at.column([False, True]),
                  at.column([{"a": 1}, {"a": 2}],
                            at.dtypes.struct([at.dtypes.Field("a",
                                                              at.int64)])),
                  at.column([{"a": 8}, None],
                            at.dtypes.struct([at.dtypes.Field("a",
                                                              at.int64)])))
    assert st.to_pylist() == [{"a": 8}, {"a": 2}]


def test_shift_generic_layouts():
    """window.rs:55 composes null-pad + slice + concat for any type."""
    s = at.column(["a", "b", "c"])
    assert ops.shift(s, 1).to_pylist() == [None, "a", "b"]
    assert ops.shift(s, -2).to_pylist() == ["c", None, None]
    assert ops.shift(s, 5).to_pylist() == [None, None, None]
    l = at.column([[1], [2, 3], None], at.dtypes.list_(at.int64))
    assert ops.shift(l, -1).to_pylist() == [[2, 3], None, None]
    d = ops.dictionary_encode(at.column(["x", "y", "x"]))
    assert ops.shift(d, 1).to_pylist() == [None, "x", "y"]
    # primitive beyond-length now also yields typed all-null
    p = ops.shift(at.column([1, 2]), 9)
    assert p.to_pylist() == [None, None] and p.dtype == at.int64


def test_shift_view_union_ree_layouts():
    """shift() pads with typed all-null columns for list_view, union and
    run-end layouts too (window.rs:55 + new_null_array roles)."""
    import jax.numpy as jnp
    from arrow_tpu.core.nested import (ListViewColumn, RunEndColumn,
                                       UnionColumn)
    lv = ListViewColumn(jnp.array([0, 2, 4], jnp.int32),
                        jnp.array([2, 2, 1], jnp.int32),
                        at.column([1, 2, 3, 4, 5]))
    assert ops.shift(lv, 1).to_pylist() == [None, [1, 2], [3, 4]]
    assert ops.shift(lv, -2).to_pylist() == [[5], None, None]
    u = UnionColumn(jnp.array([0, 1, 0], jnp.int8), None,
                    [at.column([1, 2, 3]), at.column([1.5, 2.5, 3.5])],
                    [at.dtypes.Field("i", at.int64),
                     at.dtypes.Field("f", at.float64)])
    assert ops.shift(u, 1).to_pylist() == [None, 1, 2.5]
    r = RunEndColumn(jnp.array([2, 5], jnp.int32), at.column([7, 9]))
    assert ops.shift(r, 2).to_pylist() == [None, None, 7, 7, 9]
    assert ops.shift(r, -2).to_pylist() == [9, 9, 9, None, None]


def test_union_extract_empty_dense_child():
    """Dense union with an empty child extracts as all-null
    (union_extract.rs new_null_array) instead of crashing."""
    import jax.numpy as jnp
    from arrow_tpu.core.nested import UnionColumn
    from arrow_tpu.ops.select_misc import union_extract
    u = UnionColumn(jnp.asarray(np.array([1, 1], np.int8)),
                    jnp.asarray(np.array([0, 1], np.int32)),
                    [at.column(np.zeros(0, np.int32)),
                     at.column([1.5, 2.5])],
                    [at.Field("a", at.int32), at.Field("b", at.float64)])
    out = union_extract(u, "a")
    assert out.to_pylist() == [None, None]
    assert out.dtype == at.int32


def test_concat_dictionary_key_space_merge():
    """Concat of int8-keyed dictionaries whose combined value count
    exceeds 127 merges (dedups) values instead of wrapping codes
    (merge_dictionary_values, dictionary.rs:177)."""
    from arrow_tpu.core.column import DictionaryColumn, StringColumn
    import jax.numpy as jnp

    def mkdict(vals, codes):
        return DictionaryColumn(jnp.asarray(np.asarray(codes, np.int8)),
                                StringColumn.from_pylist(vals), None)

    vals = [f"v{i}" for i in range(100)]
    a = mkdict(vals, [0, 50, 99])
    b = mkdict(vals, [99, 0])            # same values: merge dedups
    out = ops.concat([a, b])
    assert out.to_pylist() == ["v0", "v50", "v99", "v99", "v0"]
    assert len(out.values) == 100
    # genuinely >127 distinct values cannot fit int8 codes: raise
    c = mkdict([f"w{i}" for i in range(100)], [0])
    with pytest.raises(at.errors.ArrowInvalid):
        ops.concat([a, c])


def test_concat_run_end_overflow_raises():
    from arrow_tpu.core.nested import RunEndColumn
    import jax.numpy as jnp
    v = at.column([1])
    a = RunEndColumn(jnp.asarray(np.array([30000], np.int16)), v, 30000)
    b = RunEndColumn(jnp.asarray(np.array([30000], np.int16)),
                     at.column([2]), 30000)
    with pytest.raises(at.errors.ArrowInvalid):
        ops.concat([a, b])
