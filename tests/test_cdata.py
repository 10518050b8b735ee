"""Arrow C Data Interface (io/cdata.py): raw ArrowSchema/ArrowArray
capsules interop with pyarrow in BOTH directions — no pyarrow types
cross the boundary (arrow-data/src/ffi.rs:39 + arrow-array/src/ffi.rs
:256 parity)."""

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

import arrow_tpu as at
from arrow_tpu.io.cdata import (export_column, export_table,
                                import_column, import_table)
from arrow_tpu.io.interop import table_from_pyarrow


def _tab():
    return pa.table({
        "i64": pa.array([1, None, 3], pa.int64()),
        "u16": pa.array([0, 9, None], pa.uint16()),
        "f32": pa.array([1.5, 2.0, None], pa.float32()),
        "s": pa.array(["a", None, "ccc"]),
        "ls": pa.array(["a", None, "ccc"], pa.large_string()),
        "bin": pa.array([b"\x00", None, b""], pa.binary()),
        "bool": pa.array([True, None, False]),
        "ts": pa.array([1, 2, None], pa.timestamp("us", "UTC")),
        "d32": pa.array([1, None, 3], pa.date32()),
        "dur": pa.array([1, 2, 3], pa.duration("ms")),
        "dec": pa.array([Decimal("1.23"), None, Decimal("-9.99")],
                        pa.decimal128(10, 2)),
        "fsb": pa.array([b"ab", None, b"xy"], pa.binary(2)),
        "l": pa.array([[1, 2], None, []], pa.list_(pa.int64())),
        "ll": pa.array([[[1], None], None, [[2, 3]]],
                       pa.list_(pa.list_(pa.int64()))),
        "fsl": pa.array([[1, 2], None, [3, 4]], pa.list_(pa.int64(),
                                                         2)),
        "st": pa.array([{"x": 1, "y": "a"}, None,
                        {"x": None, "y": None}],
                       pa.struct([("x", pa.int64()),
                                  ("y", pa.string())])),
        "m": pa.array([[("k", 1)], None, []],
                      pa.map_(pa.string(), pa.int64())),
    })


def test_export_every_type():
    tab = _tab()
    t = table_from_pyarrow(tab)
    for name in tab.column_names:
        caps = export_column(t.column(name), name)
        back = pa.Array._import_from_c_capsule(*caps)
        assert back.to_pylist() == tab[name].to_pylist(), name


def test_import_every_type():
    tab = _tab()
    for name in tab.column_names:
        col = import_column(tab[name].combine_chunks())
        assert col.to_pylist() == tab[name].to_pylist(), name


def test_table_roundtrip_via_struct_convention():
    tab = _tab()
    t = table_from_pyarrow(tab)
    rb = pa.RecordBatch._import_from_c_capsule(*export_table(t))
    for name in tab.column_names:
        assert rb[name].to_pylist() == tab[name].to_pylist(), name
    # and back in: pyarrow batch -> struct array -> our table
    t2 = import_table(tab.to_batches()[0].to_struct_array())
    for name in tab.column_names:
        assert t2.column(name).to_pylist() == \
            tab[name].to_pylist(), name


def test_validity_bitmaps_roundtrip():
    rng = np.random.default_rng(0)
    n = 1000
    arr = pa.array(rng.integers(0, 100, n), mask=rng.random(n) < 0.3)
    col = import_column(arr)
    assert col.to_pylist() == arr.to_pylist()
    back = pa.Array._import_from_c_capsule(*export_column(col))
    assert back.to_pylist() == arr.to_pylist()


def test_export_is_c_owned_release():
    """Exports carry NATIVE release callbacks (hostcodec
    cdata_release_*) and create no Python keepalives, so a consumer
    may release after interpreter finalization (the old Python
    trampolines segfaulted there)."""
    import ctypes
    from arrow_tpu.io import cdata
    before = len(cdata._LIVE)
    t = table_from_pyarrow(pa.table({"x": [1, 2, 3]}))
    caps = export_column(t.column("x"), "x")
    assert len(cdata._LIVE) == before          # no Python keepalives
    ap = ctypes.cast(
        cdata._PyCapsule_GetPointer(caps[1], b"arrow_array"),
        ctypes.POINTER(cdata.ArrowArray))
    lib = cdata._clib()
    native = ctypes.cast(lib.cdata_release_array, ctypes.c_void_p).value
    ours = ctypes.cast(ap.contents.release, ctypes.c_void_p).value
    assert ours == native
    back = pa.Array._import_from_c_capsule(*caps)
    assert back.to_pylist() == [1, 2, 3]
    del back
    import gc
    gc.collect()
    assert len(cdata._LIVE) == before


def test_stream_roundtrip():
    """ArrowArrayStream callbacks: pa.table() consumes our stream
    capsule; our import_stream drains pyarrow's."""
    from arrow_tpu.io.cdata import export_stream, import_stream
    tab = pa.table({"x": [1, None, 3], "s": ["a", "b", None]})
    t = table_from_pyarrow(tab)
    got = pa.table(t)               # via __arrow_c_stream__
    for name in tab.column_names:
        assert got[name].to_pylist() == tab[name].to_pylist(), name
    # multi-batch export through the raw capsule
    cap = export_stream([t, t])
    rdr = pa.RecordBatchReader._import_from_c_capsule(cap)
    batches = list(rdr)
    assert len(batches) == 2
    assert batches[1]["x"].to_pylist() == [1, None, 3]
    # pyarrow stream -> our tables
    parts = import_stream(pa.table({"x": [5, 6]}))
    assert len(parts) >= 1
    assert sum(p.num_rows for p in parts) == 2
    assert parts[0].column("x").to_pylist()[:2] == [5, 6]


def test_pa_array_consumes_our_dunder():
    """Column.__arrow_c_array__ lets pa.array()/pa.record_batch()
    consume engine objects directly."""
    t = table_from_pyarrow(pa.table({"x": [1, None, 3],
                                     "s": ["a", "b", None]}))
    a = pa.array(t.column("x"))
    assert a.to_pylist() == [1, None, 3]
    rb = pa.record_batch(t)
    assert rb["s"].to_pylist() == ["a", "b", None]


def test_dictionary_ffi_roundtrip():
    """Dictionary arrays cross the C ABI (arrow-schema ffi.rs
    dictionary member): ours -> pyarrow and pyarrow -> ours."""
    from arrow_tpu.io import cdata
    from arrow_tpu.ops.strings import dictionary_encode
    from arrow_tpu.core.column import StringColumn
    d = dictionary_encode(StringColumn.from_pylist(["b", "a", None, "b"]))
    back = pa.Array._import_from_c_capsule(*cdata.export_column(d))
    assert pa.types.is_dictionary(back.type)
    assert back.to_pylist() == ["b", "a", None, "b"]
    pd = pa.DictionaryArray.from_arrays(
        pa.array([0, 1, None, 0], pa.int32()), pa.array(["x", "y"]))
    col = cdata.import_column(pd.__arrow_c_array__())
    assert col.dtype.name == "dictionary"
    assert col.to_pylist() == ["x", "y", None, "x"]


def test_sliced_import():
    """Non-zero offset C arrays import correctly (buffers are windowed
    by `offset`, ffi.rs consumer semantics)."""
    from arrow_tpu.io import cdata
    cases = [
        pa.array([1, 2, 3, 4, 5], pa.int64()).slice(2, 2),
        pa.array(["aa", "bb", None, "dd"]).slice(1, 3),
        pa.array([[1], [2, 3], [4], []]).slice(1, 2),
        pa.array([{"a": 1}, {"a": 2}, {"a": 3}]).slice(1, 2),
        pa.array([True, False, None, True]).slice(1, 3),
    ]
    for arr in cases:
        col = cdata.import_column(arr.__arrow_c_array__())
        assert col.to_pylist() == arr.to_pylist(), arr.type


def test_interval_ffi():
    """Interval formats tiM/tiD/tin cross the boundary."""
    from arrow_tpu.io import cdata
    mdn = pa.array([(1, 2, 3), None], pa.month_day_nano_interval())
    col = cdata.import_column(mdn.__arrow_c_array__())
    back = pa.Array._import_from_c_capsule(*cdata.export_column(col))
    assert back.to_pylist() == mdn.to_pylist()


def test_union_and_ree_ffi():
    """Union (+ud:/+us:) and RunEndEncoded (+r) cross the C ABI."""
    from arrow_tpu.io import cdata
    u = pa.UnionArray.from_dense(
        pa.array([0, 1, 0, 0, 1], pa.int8()),
        pa.array([0, 0, 1, 2, 1], pa.int32()),
        [pa.array([1, 2, 3]), pa.array(["a", "b"])], ["i", "s"])
    col = cdata.import_column(u.__arrow_c_array__())
    assert col.dtype.name == "union" and col.dtype.mode == "dense"
    back = pa.Array._import_from_c_capsule(*cdata.export_column(col))
    assert back.to_pylist() == u.to_pylist()
    su = pa.UnionArray.from_sparse(
        pa.array([0, 1, 0], pa.int8()),
        [pa.array([1, 2, 3]), pa.array(["a", "b", "c"])])
    col2 = cdata.import_column(su.__arrow_c_array__())
    back2 = pa.Array._import_from_c_capsule(*cdata.export_column(col2))
    assert back2.to_pylist() == su.to_pylist()
    ree = pa.RunEndEncodedArray.from_arrays(
        pa.array([2, 5], pa.int32()), pa.array(["x", None]))
    col3 = cdata.import_column(ree.__arrow_c_array__())
    assert col3.dtype.name == "run_end_encoded"
    back3 = pa.Array._import_from_c_capsule(*cdata.export_column(col3))
    assert back3.to_pylist() == ree.to_pylist()


def test_cdata_string_binary_views():
    """utf8_view/binary_view ride the C data view layout (vu/vz format
    strings, 16B views + variadic data + trailing i64 sizes buffer) —
    both directions with pyarrow."""
    from arrow_tpu.io.cdata import import_column
    from arrow_tpu.ops.cast import cast
    vals = ["ab", None, "long-string-beyond-twelve-bytes", "",
            "exactly12byt"]
    sv = cast(at.column(vals), at.dtypes.utf8_view)
    out = pa.array(sv)
    assert str(out.type) == "string_view" and out.to_pylist() == vals
    col = import_column(pa.array(vals, pa.string_view()))
    assert col.dtype.name == "utf8_view" and col.to_pylist() == vals
    bvals = [b"xy", None, b"a-binary-blob-over-12-bytes!"]
    colb = import_column(pa.array(bvals, pa.binary_view()))
    assert colb.to_pylist() == bvals
    assert str(pa.array(colb).type) == "binary_view"


def test_cdata_list_views():
    """list_view/large_list_view C data (+vl/+vL: validity, offsets,
    sizes buffers) both directions with pyarrow."""
    import jax.numpy as jnp
    from arrow_tpu.core.nested import ListViewColumn
    from arrow_tpu.io.cdata import import_column
    lv = ListViewColumn(jnp.asarray(np.array([2, 0, 1], np.int32)),
                        jnp.asarray(np.array([2, 2, 3], np.int32)),
                        at.column([10, 20, 30, 40, 50]),
                        jnp.asarray(np.array([True, True, False])))
    out = pa.array(lv)
    assert str(out.type).startswith("list_view")
    assert out.to_pylist() == [[30, 40], [10, 20], None]
    back = import_column(pa.array([[1], None, [2, 3]],
                                  pa.list_view(pa.int64())))
    assert back.dtype.name == "list_view"
    assert back.to_pylist() == [[1], None, [2, 3]]
