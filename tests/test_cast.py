"""Cast matrix goldens (arrow-cast parity; CastOptions{safe} semantics:
safe=True -> null on failure, safe=False -> CastError)."""

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import create_primitive_array
from util import assert_column_equals_pa


NUMERIC = [at.int8, at.int16, at.int32, at.int64,
           at.uint8, at.uint16, at.uint32, at.float32, at.float64]


@pytest.mark.parametrize("to", NUMERIC, ids=lambda d: d.name)
def test_numeric_cast_in_range(to):
    """In-range conversions match pyarrow exactly."""
    arr = create_primitive_array(500, 0.2, np.int64, lo=0, hi=100)
    got = ops.cast(at.column(arr), to)
    assert_column_equals_pa(got, arr.cast(_pa(to)))


def _pa(d):
    from arrow_tpu.io.interop import dtype_to_pyarrow
    return dtype_to_pyarrow(d)


def test_cast_same_type_noop():
    c = at.column([1, 2, None])
    assert ops.cast(c, at.int64) is c


def test_int_narrowing_safe_nulls():
    got = ops.cast(at.column([1, 300, None, -5]), at.int8)
    assert got.to_pylist() == [1, None, None, -5]


def test_int_narrowing_unsafe_raises():
    with pytest.raises(at.CastError):
        ops.cast(at.column([300]), at.int8, ops.CastOptions(safe=False))


def test_signed_to_unsigned():
    got = ops.cast(at.column([-1, 0, 5]), at.uint8)
    assert got.to_pylist() == [None, 0, 5]


def test_float_to_int_truncates():
    got = ops.cast(at.column([1.9, -2.9, 0.5]), at.int32)
    assert got.to_pylist() == [1, -2, 0]


def test_float_to_int_fails_on_nan_inf_range():
    got = ops.cast(at.column([float("nan"), float("inf"), 1e30, 1.0]),
                   at.int64)
    assert got.to_pylist() == [None, None, None, 1]


def test_int_to_float():
    arr = create_primitive_array(300, 0.1, np.int64)
    assert_column_equals_pa(ops.cast(at.column(arr), at.float64),
                            arr.cast(pa.float64()))


def test_bool_casts():
    assert ops.cast(at.column([True, False, None]), at.int32).to_pylist() \
        == [1, 0, None]
    assert ops.cast(at.column([0, 7, None]), at.bool_).to_pylist() \
        == [False, True, None]


def test_string_to_numeric():
    got = ops.cast(at.column(["42", " 7 ", "nope", None, "-3"]), at.int64)
    assert got.to_pylist() == [42, 7, None, None, -3]
    with pytest.raises(at.CastError):
        ops.cast(at.column(["nope"]), at.int64, ops.CastOptions(safe=False))
    got_f = ops.cast(at.column(["1.5", "-2e3", "inf"]), at.float64)
    assert got_f.to_pylist() == [1.5, -2000.0, float("inf")]


def test_numeric_to_string():
    assert ops.cast(at.column([1, -2, None]), at.utf8).to_pylist() == \
        ["1", "-2", None]
    assert ops.cast(at.column([1.5, None]), at.utf8).to_pylist() == \
        ["1.5", None]
    assert ops.cast(at.column([True, False]), at.utf8).to_pylist() == \
        ["true", "false"]


def test_string_temporal_parse():
    got = ops.cast(at.column(["2020-01-02", "bad", None]), at.date32)
    assert got.to_pylist() == [datetime.date(2020, 1, 2), None, None]
    ts = ops.cast(at.column(["2020-01-02T03:04:05.123456"]),
                  at.timestamp("us"))
    assert ts.to_pylist() == [datetime.datetime(2020, 1, 2, 3, 4, 5, 123456)]


def test_timestamp_unit_conversion_golden():
    arr = pa.array([1_700_000_000_123_456, None]).cast(pa.timestamp("us"))
    col = at.column(arr)
    for unit in ("s", "ms", "us", "ns"):
        got = ops.cast(col, at.timestamp(unit))
        exp = arr.cast(pa.timestamp(unit), safe=False)
        assert_column_equals_pa(got, exp)


def test_timestamp_to_date():
    arr = pa.array([1_700_000_000, -1]).cast(pa.timestamp("s"))
    got = ops.cast(at.column(arr), at.date32)
    exp = arr.cast(pa.date32())
    assert_column_equals_pa(got, exp)


def test_date_to_timestamp():
    arr = pa.array([0, 19000, -400], pa.int32()).cast(pa.date32())
    got = ops.cast(at.column(arr), at.timestamp("us"))
    exp = arr.cast(pa.timestamp("us"))
    assert_column_equals_pa(got, exp)


def test_int_timestamp_reinterpret():
    got = ops.cast(at.column([123, None]), at.timestamp("ms"))
    exp = pa.array([123, None], pa.int64()).cast(pa.timestamp("ms"))
    assert_column_equals_pa(got, exp)
    back = ops.cast(at.column(exp), at.int64)
    assert back.to_pylist() == [123, None]


def test_dictionary_casts():
    arr = pa.array(["a", "b", None, "a"])
    d = ops.cast(at.column(arr), at.dictionary(at.int32, at.utf8))
    assert isinstance(d, at.DictionaryColumn)
    assert d.to_pylist() == arr.to_pylist()
    back = ops.cast(d, at.utf8)
    assert isinstance(back, at.StringColumn)
    assert back.to_pylist() == arr.to_pylist()


def test_dict_numeric_string_path():
    d = ops.cast(at.column(pa.array(["1", "2", "1"]).dictionary_encode()),
                 at.int64)
    assert d.to_pylist() == [1, 2, 1]


def test_null_column_cast():
    got = ops.cast(at.NullColumn(3), at.int64)
    assert got.to_pylist() == [None, None, None]
    gs = ops.cast(at.NullColumn(2), at.utf8)
    assert gs.to_pylist() == [None, None]


def test_null_to_nested_casts():
    """Null -> every composite family (cast/mod.rs:306 Null->T arms)."""
    dtp = at.dtypes
    targets = [dtp.decimal128(10, 2), dtp.decimal256(40, 5),
               dtp.list_(dtp.int32), dtp.large_list(dtp.utf8),
               dtp.fixed_size_list(dtp.int32, 2),
               dtp.fixed_size_binary(4),
               dtp.struct([dtp.Field("a", dtp.int32),
                           dtp.Field("b", dtp.utf8)]),
               dtp.map_(dtp.utf8, dtp.int32),
               dtp.interval("month_day_nano"),
               dtp.dictionary(dtp.int32, dtp.utf8)]
    for t in targets:
        got = ops.cast(at.NullColumn(3), t)
        assert got.dtype == t, t
        assert got.to_pylist() == [None, None, None], t
    # inverse: anything -> null discards values
    assert ops.cast(at.column(["a", None]).dictionary_encode()
                    if hasattr(at.column(["a", None]), "dictionary_encode")
                    else ops.dictionary_encode(at.column(["a", None])),
                    dtp.null).to_pylist() == [None, None]


def test_signed_to_uint64_cast():
    """i64 -> u64: bounds check must not overflow the i64 literal."""
    got = ops.cast(at.column([1, None, 2 ** 62]), at.uint64)
    assert got.dtype == at.uint64
    assert got.to_pylist() == [1, None, 2 ** 62]
    import pytest as _pytest
    from arrow_tpu.errors import CastError
    with _pytest.raises(CastError):
        ops.cast(at.column([-1]), at.uint64,
                 ops.CastOptions(safe=False))
    assert ops.cast(at.column([-1, 5]), at.uint64).to_pylist() == [None, 5]


def test_can_cast():
    assert ops.can_cast(at.int64, at.float32)
    assert ops.can_cast(at.utf8, at.int64)
    assert ops.can_cast(at.utf8, at.dictionary(at.int32, at.utf8))
    assert ops.can_cast(at.timestamp("us"), at.date32)


def test_struct_cast_positional():
    """Struct->Struct casts children positionally with target names
    (cast/mod.rs Struct arm semantics; pyarrow casts by-name instead,
    so the oracle is used only for the same-name case)."""
    import pyarrow as pa
    from arrow_tpu.io.interop import column_from_pyarrow
    from arrow_tpu import dtypes as dtp
    arr = pa.array([{"p": 1, "q": 2.5}, None, {"p": None, "q": -1.0}],
                   pa.struct([("p", pa.int32()), ("q", pa.float64())]))
    col = column_from_pyarrow(arr)
    out1 = ops.cast(col, dtp.struct([dtp.Field("p", dtp.int64),
                                     dtp.Field("q", dtp.float32)]))
    ref1 = arr.cast(pa.struct([("p", pa.int64()), ("q", pa.float32())]))
    assert out1.to_pyarrow().equals(ref1)
    out2 = ops.cast(col, dtp.struct([dtp.Field("x", dtp.int64),
                                     dtp.Field("y", dtp.float32)]))
    assert out2.to_pylist() == [{"x": 1, "y": 2.5}, None,
                                {"x": None, "y": -1.0}]
    # nested struct-in-struct recursion
    arr2 = pa.array([{"in": {"v": 7}}, {"in": None}],
                    pa.struct([("in", pa.struct([("v", pa.int32())]))]))
    col2 = column_from_pyarrow(arr2)
    out3 = ops.cast(col2, dtp.struct([
        dtp.Field("in", dtp.struct([dtp.Field("v", dtp.float64)]))]))
    assert out3.to_pylist() == [{"in": {"v": 7.0}}, {"in": None}]


def test_base64_roundtrip():
    """base64.rs b64_encode/b64_decode (STANDARD alphabet)."""
    import base64
    import pyarrow as pa
    from arrow_tpu.io.interop import column_from_pyarrow
    from arrow_tpu.ops.cast import base64_encode, base64_decode
    vals = [b"hello", b"", None, b"\x00\xff\x10", b"1" * 100]
    col = column_from_pyarrow(pa.array(vals, pa.binary()))
    enc = base64_encode(col)
    assert enc.to_pylist() == [
        None if v is None else base64.b64encode(v).decode() for v in vals]
    assert base64_decode(enc).to_pylist() == vals
    with pytest.raises(Exception):
        from arrow_tpu.core.column import StringColumn
        base64_decode(StringColumn.from_pylist(["!not-base64!"]))


def test_dict_to_dict_key_narrowing_checked():
    """dictionary<int32> -> dictionary<int8> with >127 distinct codes:
    out-of-range codes become null (safe) / raise (unsafe), never wrap
    (dictionary_cast, mod.rs:742)."""
    import jax.numpy as jnp
    from arrow_tpu.core.column import DictionaryColumn, StringColumn
    from arrow_tpu.ops.cast import CastOptions, cast
    from arrow_tpu.errors import CastError
    vals = StringColumn.from_pylist([f"v{i:04d}" for i in range(200)])
    codes = jnp.asarray(np.array([0, 150, 199], np.int32))
    d = DictionaryColumn(codes, vals, None)
    out = cast(d, at.dictionary(at.int8, at.utf8))
    assert out.to_pylist() == ["v0000", None, None]
    with pytest.raises(CastError):
        cast(d, at.dictionary(at.int8, at.utf8), CastOptions(safe=False))


def test_large_list_survives_pytree_boundary():
    """cast list->large_list keeps its dtype through jit/pytree
    round-trips (the retag used to be recomputed away)."""
    import jax
    from arrow_tpu.ops.cast import cast
    c = at.column([[1, 2], [3]])
    big = cast(c, at.large_list(at.int64))
    assert big.dtype.name == "large_list"
    leaves, treedef = jax.tree_util.tree_flatten(big)
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.dtype.name == "large_list"
    assert back.to_pylist() == [[1, 2], [3]]


def test_utf8_to_timestamp_normalizes_offsets():
    """Offset-bearing strings convert to UTC
    (string_to_timestamp_nanos, parse.rs) — the offset used to be
    dropped."""
    from arrow_tpu.core.column import StringColumn
    from arrow_tpu.ops.cast import cast
    c = StringColumn.from_pylist(["1970-01-01T00:00:00+05:00",
                                  "1970-01-01T00:00:00Z"])
    out = cast(c, at.timestamp("s"))
    assert np.asarray(out.values).tolist() == [-18000, 0]


def test_temporal_upscale_overflow_checked():
    """Unit up-conversion uses checked_mul (cast/mod.rs:1542 unary_opt):
    overflow -> null (safe) / CastError (unsafe), never a wrapped int."""
    from arrow_tpu.ops.cast import cast, CastOptions, CastError
    big = 2 ** 62
    c = at.column(np.array([big, 1], np.int64), dtype=at.timestamp("s"))
    out = cast(c, at.timestamp("ns"))
    assert out.to_pylist()[0] is None
    assert np.asarray(out.values)[1] == 1_000_000_000
    with pytest.raises(CastError):
        cast(c, at.timestamp("ns"), CastOptions(safe=False))


def test_utf8_to_fixed_size_binary():
    """(Binary, FixedSizeBinary) arm (cast/mod.rs:2268): wrong-length
    values null out (safe) / raise (unsafe); the result is a real
    FixedSizeBinaryColumn, not a retagged varlen column."""
    from arrow_tpu.core.column import StringColumn
    from arrow_tpu.core.nested import FixedSizeBinaryColumn
    from arrow_tpu.ops.cast import cast, CastOptions, CastError
    c = StringColumn.from_pylist(["ab", "c", None, "de"])
    out = cast(c, at.fixed_size_binary(2))
    assert isinstance(out, FixedSizeBinaryColumn)
    assert out.to_pylist() == [b"ab", None, None, b"de"]
    with pytest.raises(CastError):
        cast(c, at.fixed_size_binary(2), CastOptions(safe=False))


def test_list_view_to_large_list_view_offsets_widen():
    from arrow_tpu.ops.cast import cast
    c = cast(at.column([[1, 2], [3]]), at.dtypes.list_view(at.int64))
    big = cast(c, at.dtypes.large_list_view(at.int64))
    assert big.offsets.dtype == np.int64 and big.sizes.dtype == np.int64
    assert big.to_pylist() == [[1, 2], [3]]


def test_utf8_to_time_and_date64():
    """String -> time32/time64/date64 parse arms (parse.rs:299 and the
    Date64 parser)."""
    from arrow_tpu.core.column import StringColumn
    from arrow_tpu.ops.cast import cast
    s = StringColumn.from_pylist(["02:10:01.123456", "23:59:59", None,
                                  "bad"])
    t64 = cast(s, at.time64("us"))
    assert np.asarray(t64.values)[:2].tolist() == \
        [(2 * 3600 + 10 * 60 + 1) * 10**6 + 123456,
         (23 * 3600 + 59 * 60 + 59) * 10**6]
    assert t64.to_pylist()[2] is None and t64.to_pylist()[3] is None
    t32 = cast(s, at.time32("ms"))
    assert np.asarray(t32.values)[0] == (2 * 3600 + 10 * 60 + 1) \
        * 1000 + 123
    d64 = cast(StringColumn.from_pylist(
        ["2020-02-29", "1970-01-02T03:00:00"]), at.date64)
    assert np.asarray(d64.values).tolist() == \
        [18321 * 86_400_000, 86_400_000 + 3 * 3_600_000]


def test_ree_cast_arms():
    """REE cast arms (cast/mod.rs:166 RunEndEncoded): decode-then-cast,
    value cast with runs kept (run-end width re-checked), and
    encode-after-cast incl. strings; oracle = pyarrow run_end kernels."""
    import jax.numpy as jnp
    from arrow_tpu.core.nested import RunEndColumn
    from arrow_tpu.ops.cast import can_cast, cast

    ree = RunEndColumn(jnp.asarray([2, 5], jnp.int32), at.column([1, 9]))
    assert cast(ree, at.int64).to_pylist() == [1, 1, 9, 9, 9]
    assert cast(ree, at.float64).to_pylist() == [1.0, 1.0, 9.0, 9.0, 9.0]

    r2 = cast(ree, at.dtypes.run_end_encoded(at.int64, at.float32))
    assert r2.num_runs == 2
    assert r2.to_pylist() == [1.0, 1.0, 9.0, 9.0, 9.0]

    for src, re_t in (([1, 1, 2, None, None], pa.int32()),
                      (["a", "a", "b", None, "b"], pa.int16())):
        d = at.dtypes.run_end_encoded(
            at.int32 if re_t == pa.int32() else at.int16,
            at.utf8 if isinstance(src[0], str) else at.int64)
        got = cast(at.column(src), d)
        oracle = pa.compute.run_end_encode(pa.array(src),
                                           run_end_type=re_t)
        assert got.num_runs == len(oracle.run_ends)
        assert got.to_pylist() == src

    assert can_cast(at.dtypes.run_end_encoded(at.int32, at.int64),
                    at.float64)
    assert not can_cast(at.dtypes.list_(at.int64),
                        at.dtypes.run_end_encoded(at.int32,
                                                  at.dtypes.list_(at.int64)))
