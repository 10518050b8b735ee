"""String kernel goldens vs pyarrow.compute (arrow-string parity)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import create_string_array
from util import assert_column_equals_pa


ARR = pa.array(["apple", "BANANA", None, "cherry", "apple pie", "",
                "grape%fruit", "a_b"])
COL = at.column(ARR)


def test_dictionary_encode_decode_roundtrip():
    d = ops.dictionary_encode(COL)
    assert isinstance(d, at.DictionaryColumn)
    assert d.to_pylist() == ARR.to_pylist()
    s = ops.dictionary_decode(d)
    assert isinstance(s, at.StringColumn)
    assert s.to_pylist() == ARR.to_pylist()


@pytest.mark.parametrize("pattern", ["a%", "%e", "%an%", "a_b",
                                     "grape\\%fruit", "%"])
def test_like_golden(pattern):
    got = ops.like(COL, pattern)
    exp = pc.match_like(ARR, pattern)
    assert_column_equals_pa(got, exp)


def test_ilike():
    got = ops.ilike(COL, "ban%")
    exp = pc.match_like(ARR, "ban%", ignore_case=True)
    assert_column_equals_pa(got, exp)


def test_nlike():
    got = ops.nlike(COL, "a%")
    exp = pc.invert(pc.match_like(ARR, "a%"))
    assert_column_equals_pa(got, exp)


def test_starts_ends_contains():
    assert_column_equals_pa(ops.starts_with(COL, "a"),
                            pc.starts_with(ARR, "a"))
    assert_column_equals_pa(ops.ends_with(COL, "e"), pc.ends_with(ARR, "e"))
    assert_column_equals_pa(ops.contains(COL, "pp"),
                            pc.match_substring(ARR, "pp"))


def test_regexp():
    assert_column_equals_pa(ops.regexp_is_match(COL, "^[ab]"),
                            pc.match_substring_regex(ARR, "^[ab]"))


def test_string_eq_scalar():
    got = ops.eq(COL, "apple")
    exp = pc.equal(ARR, "apple")
    assert_column_equals_pa(got, exp)
    got2 = ops.lt(COL, "b")
    exp2 = pc.less(ARR, "b")
    assert_column_equals_pa(got2, exp2)


def test_string_cmp_columns():
    a = create_string_array(300, 0.2, cardinality=20, seed=1)
    b = create_string_array(300, 0.2, cardinality=20, seed=2)
    for op, pa_op in [("eq", pc.equal), ("lt", pc.less),
                      ("gt_eq", pc.greater_equal)]:
        got = getattr(ops, op)(at.column(a), at.column(b))
        assert_column_equals_pa(got, pa_op(a, b))


def test_dict_cmp_scalar():
    d = at.column(ARR.dictionary_encode())
    got = ops.eq(d, "apple")
    assert_column_equals_pa(got, pc.equal(ARR, "apple"))


def test_lengths():
    s = pa.array(["", "a", "héllo", None, "日本語"])
    col = at.column(s)
    assert_column_equals_pa(ops.length(col), pc.utf8_length(s),
                            check_dtype=False)
    assert_column_equals_pa(ops.octet_length(col), pc.binary_length(s),
                            check_dtype=False)
    got_bits = ops.bit_length(col).to_pylist()
    exp_bits = [None if v is None else v * 8
                for v in pc.binary_length(s).to_pylist()]
    assert got_bits == exp_bits


def test_case_transforms():
    assert_column_equals_pa(ops.upper(COL), pc.utf8_upper(ARR))
    assert_column_equals_pa(ops.lower(COL), pc.utf8_lower(ARR))


def test_substring():
    s = pa.array(["hello", "hi", None, ""])
    got = ops.substring(at.column(s), 1, 3)
    exp = pc.utf8_slice_codeunits(s, 1, 4)  # ASCII: bytes == codeunits
    assert got.to_pylist() == exp.to_pylist()


def test_concat_elements():
    a = pa.array(["a", "b", None])
    b = pa.array(["x", None, "z"])
    got = ops.concat_elements(at.column(a), at.column(b))
    assert got.to_pylist() == ["ax", None, None]


def test_string_min_max():
    assert ops.min_(COL).as_py() == ""
    assert ops.max_(COL).as_py() == "grape%fruit"


def test_regexp_match_capture_groups():
    import arrow_tpu as at
    from arrow_tpu.ops.strings import regexp_match
    col = at.column(["a-1", "b-22", None, "nope"])
    out = regexp_match(col, r"([a-z])-(\d+)")
    assert out.to_pyarrow().to_pylist() == \
        [["a", "1"], ["b", "22"], None, None]
    # no capture groups: whole match
    out2 = regexp_match(col, r"\d+")
    assert out2.to_pyarrow().to_pylist() == [["1"], ["22"], None, None]


def test_length_of_nested_layouts():
    """length.rs list/fsl/fsb arms: element counts, not characters."""
    import pyarrow.compute as _pc
    l = at.column([[1, 2], None, [3]], at.dtypes.list_(at.int64))
    assert ops.length(l).to_pylist() == \
        _pc.list_value_length(pa.array([[1, 2], None, [3]])).to_pylist()
    ll = at.column([[1], None], at.dtypes.large_list(at.int64))
    got = ops.length(ll)
    assert got.dtype == at.int64 and got.to_pylist() == [1, None]
    fsl = at.column([[1, 2], None], at.dtypes.fixed_size_list(at.int64, 2))
    assert ops.length(fsl).to_pylist() == [2, None]
    fsb = at.column([b"abc", None], at.dtypes.fixed_size_binary(3))
    assert ops.length(fsb).to_pylist() == [3, None]
    m = at.column([[("k", 1), ("j", 2)], None],
                  at.dtypes.map_(at.utf8, at.int64))
    assert ops.length(m).to_pylist() == [2, None]


def test_length_dict_null_entries():
    """length/octet_length over a dictionary whose VALUES contain a
    null: rows coded to the null slot are null (length.rs dictionary
    arm folds the values' validity through the keys)."""
    import jax.numpy as jnp
    from arrow_tpu.core.column import DictionaryColumn, StringColumn
    from arrow_tpu.ops import strings as st
    vals = StringColumn.from_pylist(["ab", None, "c"])
    d = DictionaryColumn(jnp.asarray(np.array([0, 1, 2, 1], np.int32)),
                         vals, None)
    assert st.octet_length(d).to_pylist() == [2, None, 1, None]
    assert st.length(d).to_pylist() == [2, None, 1, None]
