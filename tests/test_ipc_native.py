"""Native IPC format: every dtype through our reader AND writer with
pyarrow as the byte-level oracle (arrow-ipc reader.rs:638 / writer.rs:477
parity).  Direction tested both ways:

  pyarrow stream -> ipc.read_stream -> ipc.write_stream -> pyarrow
  (final pyarrow batch must .equals the original exactly)
"""

import io

import numpy as np
import pyarrow as pa
import pytest

import arrow_tpu as at
from arrow_tpu.io import ipc


def _arrays():
    out = {}
    out["null"] = pa.nulls(4)
    out["bool"] = pa.array([True, None, False, True])
    for t in ["int8", "int16", "int32", "int64",
              "uint8", "uint16", "uint32", "uint64"]:
        out[t] = pa.array([1, 2, None, 4], getattr(pa, t)())
    out["f16"] = pa.array(np.array([1.5, 2.0, -0.5], np.float16),
                          pa.float16())
    out["f32"] = pa.array([1.5, None, np.inf], pa.float32())
    # NaN is excluded here because pa.Array.equals is NaN-unequal by
    # design; test_nan_bits covers it bit-exactly instead
    out["f64"] = pa.array([-1.5, 2.25e300, None], pa.float64())
    out["ts_us"] = pa.array([1, None, 3], pa.timestamp("us"))
    out["ts_ns_tz"] = pa.array([10, 20, None],
                               pa.timestamp("ns", tz="America/New_York"))
    out["ts_s"] = pa.array([7, 8, 9], pa.timestamp("s"))
    out["date32"] = pa.array([0, 1, None], pa.date32())
    out["date64"] = pa.array([86400000, None, 0], pa.date64())
    out["time32_s"] = pa.array([1, 2, 3], pa.time32("s"))
    out["time32_ms"] = pa.array([1, None, 3], pa.time32("ms"))
    out["time64_us"] = pa.array([1, 2, None], pa.time64("us"))
    out["time64_ns"] = pa.array([4, 5, 6], pa.time64("ns"))
    out["dur_ms"] = pa.array([100, None, -5], pa.duration("ms"))
    out["interval_mdn"] = pa.array([(1, 2, 3), None, (-1, 0, 10**10)],
                                   pa.month_day_nano_interval())
    out["utf8"] = pa.array(["alpha", None, "", "β-utf8"])
    out["large_utf8"] = pa.array(["x", "yy", None], pa.large_string())
    out["binary"] = pa.array([b"\x00\x01", None, b""], pa.binary())
    out["large_binary"] = pa.array([b"abc", b"", None], pa.large_binary())
    out["fsb"] = pa.array([b"abcd", None, b"wxyz"], pa.binary(4))
    out["utf8_view"] = pa.array(
        ["short", None, "a string long enough to spill out of the view",
         ""], pa.string_view())
    out["binary_view"] = pa.array([b"\x01" * 20, b"ab", None],
                                  pa.binary_view())
    from decimal import Decimal
    out["dec32"] = pa.array([Decimal("1.25"), None, Decimal("-3.50")],
                            pa.decimal32(7, 2))
    out["dec64"] = pa.array([Decimal("10.125"), Decimal("0.250"), None],
                            pa.decimal64(14, 3))
    out["dec128"] = pa.array([Decimal("12.3456"), None,
                              Decimal("-0.0999")], pa.decimal128(25, 4))
    out["dec256"] = pa.array([Decimal("-5"), Decimal("7.5"), None],
                             pa.decimal256(55, 10))
    out["list"] = pa.array([[1, 2], None, [], [3]],
                           pa.list_(pa.int64()))
    out["large_list"] = pa.array([["a"], [], None],
                                 pa.large_list(pa.string()))
    out["fsl"] = pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                          pa.list_(pa.float64(), 2))
    out["list_nested"] = pa.array([[[1], [2, None]], None, [[]]],
                                  pa.list_(pa.list_(pa.int32())))
    out["struct"] = pa.array(
        [{"p": 1, "q": "a"}, None, {"p": None, "q": "c"}],
        pa.struct([("p", pa.int32()), ("q", pa.string())]))
    out["map"] = pa.array([[("k1", 1), ("k2", 2)], None, []],
                          pa.map_(pa.string(), pa.int64()))
    out["dict"] = pa.array(["lo", "hi", None, "lo"],
                           pa.dictionary(pa.int16(), pa.string()))
    out["ree"] = pa.RunEndEncodedArray.from_arrays(
        pa.array([2, 3, 6], pa.int32()),
        pa.array([7, None, 9], pa.int64()))
    # unions
    ta = pa.array([1, 2, 3], pa.int32())
    tb = pa.array(["x", "y", "z"])
    tids = pa.array([0, 1, 0], pa.int8())
    out["sparse_union"] = pa.UnionArray.from_sparse(tids, [ta, tb])
    offs = pa.array([0, 0, 1], pa.int32())
    out["dense_union"] = pa.UnionArray.from_dense(tids, offs, [ta, tb])
    return out


def _pa_stream_bytes(batch, **opts) -> bytes:
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, batch.schema,
                           options=pa.ipc.IpcWriteOptions(**opts)) as w:
        w.write_batch(batch)
    return sink.getvalue()


def _roundtrip_via_ours(batch, compression=None) -> pa.RecordBatch:
    ours = ipc.read_stream(_pa_stream_bytes(batch))
    assert len(ours) == 1
    buf = io.BytesIO()
    ipc.write_stream(buf, ours[0], compression=compression)
    back = list(pa.ipc.open_stream(pa.py_buffer(buf.getvalue())))
    assert len(back) == 1
    return back[0]


@pytest.mark.parametrize("name", sorted(_arrays().keys()))
def test_dtype_roundtrip(name):
    arr = _arrays()[name]
    batch = pa.record_batch({name: arr})
    back = _roundtrip_via_ours(batch)
    assert back.equals(batch), (back.to_pydict(), batch.to_pydict())


def test_all_dtypes_one_batch():
    arrs = _arrays()
    # unions can't be mixed with length-4 columns; split by length
    by_len = {}
    for k, v in arrs.items():
        by_len.setdefault(len(v), {})[k] = v
    for _, group in by_len.items():
        batch = pa.record_batch(group)
        back = _roundtrip_via_ours(batch)
        assert back.equals(batch)


def test_file_format_with_dictionary(tmp_path):
    batch = pa.record_batch({
        "d": pa.array(["a", "b", None, "a"],
                      pa.dictionary(pa.int32(), pa.string())),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
    })
    # pyarrow file -> our reader
    sink = io.BytesIO()
    with pa.ipc.new_file(sink, batch.schema) as w:
        w.write_batch(batch)
        w.write_batch(batch)
    ours = ipc.read_file(io.BytesIO(sink.getvalue()))
    assert len(ours) == 2
    # our file -> pyarrow reader
    p = str(tmp_path / "dict.arrow")
    ipc.write_file(p, ours)
    with pa.OSFile(p) as f:
        r = pa.ipc.open_file(f)
        assert r.num_record_batches == 2
        assert r.get_batch(0).equals(batch)
        assert r.get_batch(1).equals(batch)


def test_stream_decoder_chunked_small():
    batch = pa.record_batch({
        "s": pa.array(["aa", None, "cc"]),
        "n": pa.array([1, 2, 3], pa.int64()),
    })
    data = _pa_stream_bytes(batch) * 1  # schema + one batch
    for chunk in (1, 3, 7, 64):
        dec = ipc.StreamDecoder()
        for i in range(0, len(data), chunk):
            dec.feed(data[i:i + chunk])
        t = dec.next_batch()
        assert t is not None
        assert t.to_pydict() == {"s": ["aa", None, "cc"], "n": [1, 2, 3]}
        assert dec.next_batch() is None


def test_dictionary_replacement_stream():
    # two batches with different dictionaries: our writer must emit a
    # replacement dictionary batch; pyarrow reads it back (replacement
    # is legal in streams)
    t1 = at.Table.from_pydict({"k": ["a", "b", "a"]})
    t2 = at.Table.from_pydict({"k": ["c", "d", "c"]})
    from arrow_tpu.ops.strings import dictionary_encode
    c1 = dictionary_encode(t1.column("k"))
    c2 = dictionary_encode(t2.column("k"))
    import arrow_tpu.dtypes as dt
    s = dt.Schema((dt.Field("k", c1.dtype),))
    from arrow_tpu.core.table import Table as T
    buf = io.BytesIO()
    w = ipc.StreamWriter(buf, T((c1,), s))
    w.write(T((c1,), s))
    w.write(T((c2,), s))
    w.close()
    back = list(pa.ipc.open_stream(pa.py_buffer(buf.getvalue())))
    assert back[0].column(0).to_pylist() == ["a", "b", "a"]
    assert back[1].column(0).to_pylist() == ["c", "d", "c"]
    # and our own decoder handles the replacement too
    ours = ipc.read_stream(buf.getvalue())
    assert ours[1].column("k").to_pylist() == ["c", "d", "c"]


def test_dictionary_delta_stream_from_pyarrow():
    # pyarrow emits delta dictionaries when configured; our reader must
    # append them (reader.rs dictionary delta tracking)
    b1 = pa.record_batch({"k": pa.array(["a", "b"]).dictionary_encode()})
    b2 = pa.record_batch(
        {"k": pa.array(["a", "b", "c", "d"]).dictionary_encode()})
    sink = io.BytesIO()
    opts = pa.ipc.IpcWriteOptions(emit_dictionary_deltas=True)
    with pa.ipc.new_stream(sink, b1.schema, options=opts) as w:
        w.write_batch(b1)
        w.write_batch(b2)
    ours = ipc.read_stream(sink.getvalue())
    assert ours[0].column("k").to_pylist() == ["a", "b"]
    assert ours[1].column("k").to_pylist() == ["a", "b", "c", "d"]


@pytest.mark.parametrize("codec", ["zstd", "lz4"])
def test_compression_both_directions(codec):
    if codec == "lz4":
        from arrow_tpu.utils import native
        if not native.available():
            pytest.skip("native lz4 unavailable")
    batch = pa.record_batch({
        "x": pa.array(np.arange(1000) % 7, pa.int64()),
        "s": pa.array([f"value-{i % 13}" for i in range(1000)]),
    })
    # pyarrow-compressed -> our reader
    data = _pa_stream_bytes(batch, compression=codec)
    ours = ipc.read_stream(data)
    assert ours[0].column("x").to_pylist() == batch.column(0).to_pylist()
    # our compressed stream -> pyarrow
    buf = io.BytesIO()
    ipc.write_stream(buf, ours[0], compression=codec)
    assert len(buf.getvalue()) < len(_pa_stream_bytes(batch))  # it compressed
    back = list(pa.ipc.open_stream(pa.py_buffer(buf.getvalue())))
    assert back[0].equals(batch)


def test_nan_bits():
    batch = pa.record_batch({"f": pa.array([np.nan, 1.0, -np.nan])})
    back = _roundtrip_via_ours(batch)
    a = np.asarray(back.column(0)).view(np.uint64)
    b = np.asarray(batch.column(0)).view(np.uint64)
    assert np.array_equal(a, b)   # bit-exact, NaN payloads included


def test_empty_batch_and_no_nulls():
    batch = pa.record_batch({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.string())})
    back = _roundtrip_via_ours(batch)
    assert back.equals(batch)


def test_schema_metadata_preserved():
    schema = pa.schema([pa.field("a", pa.int64(),
                                 metadata={b"k": b"v"})],
                       metadata={b"top": b"meta"})
    batch = pa.record_batch([pa.array([1, 2])], schema=schema)
    back = _roundtrip_via_ours(batch)
    assert back.schema.metadata == {b"top": b"meta"}
    assert back.schema.field("a").metadata == {b"k": b"v"}


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_roundtrip(seed):
    """Randomized mixed batches through our writer -> pyarrow -> our
    reader (tier-3 fuzz role for the wire format)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 300))

    def prim(dtype, lo=-1000, hi=1000):
        mask = rng.random(n) < rng.choice([0.0, 0.3])
        return pa.array(rng.integers(lo, hi, n), dtype,
                        mask=mask)

    batch = pa.record_batch({
        "a": prim(pa.int64()),
        "b": prim(pa.int32()),
        "c": pa.array(rng.standard_normal(n),
                      mask=rng.random(n) < 0.2),
        "d": pa.array([f"s{int(i)}" for i in
                       rng.integers(0, 50, n)]),
        "e": pa.array(rng.random(n) < 0.5,
                      mask=rng.random(n) < 0.1),
        "f": pa.array([[int(x) for x in
                        rng.integers(0, 9, rng.integers(0, 4))]
                       for _ in range(n)], pa.list_(pa.int64())),
    })
    # pyarrow -> ours -> pyarrow must be exact
    back = _roundtrip_via_ours(batch)
    assert back.equals(batch)
    # ours -> ours via file format
    from arrow_tpu.io import ipc
    import arrow_tpu as at
    t = at.Table.from_pyarrow(batch)
    buf = io.BytesIO()
    ipc.write_file(buf, t, compression="zstd")
    back2 = ipc.read_file(io.BytesIO(buf.getvalue()))[0]
    assert back2.to_pydict() == t.to_pydict()


def test_view_multi_variadic_buffers(monkeypatch):
    """>2GB of view value bytes split across several variadic data
    buffers (limit shrunk to test without 2GB); pyarrow reads them."""
    import io as _io
    import pyarrow.ipc as paipc
    from arrow_tpu.io import ipc as aipc
    from arrow_tpu.io import ipc_format as fmt
    monkeypatch.setattr(fmt, "_VIEW_BUF_LIMIT", 48)
    longs = [f"long-string-payload-{i:04d}-abcdefghijklmnop" for i in range(7)]
    vals = ["tiny", None] + longs + ["x"]
    from arrow_tpu.io.interop import column_from_pyarrow
    from arrow_tpu import dtypes as dt
    col = column_from_pyarrow(pa.array(vals, pa.string_view()))
    t = at.Table([col], dt.Schema((dt.Field("v", dt.utf8_view),)))
    buf = _io.BytesIO()
    aipc.write_stream(buf, [t])
    raw = buf.getvalue()
    # our own reader
    back = aipc.read_stream(_io.BytesIO(raw))[0]
    assert back.columns[0].to_pylist() == vals
    # pyarrow oracle reads the multi-buffer stream
    pt = paipc.open_stream(pa.BufferReader(raw)).read_all()
    assert pt.column(0).to_pylist() == vals


def test_day_time_interval_wire_order():
    """Spec layout is [i32 days][i32 ms] — little-endian i64 encode
    would put ms first (regression: silent days/ms swap on encode)."""
    import jax.numpy as jnp
    from arrow_tpu.core.column import PrimitiveColumn
    import arrow_tpu.dtypes as dt
    col = PrimitiveColumn(jnp.asarray(np.array([(1 << 32) | 2], np.int64)),
                          dt.interval("day_time"))
    t = at.Table((col,), dt.Schema((dt.Field("i", col.dtype),)))
    buf = io.BytesIO()
    ipc.write_stream(buf, t)
    raw = buf.getvalue()
    assert bytes([1, 0, 0, 0, 2, 0, 0, 0]) in raw   # days first
    v = np.asarray(ipc.read_stream(raw)[0].column(0).values)
    assert int(v[0]) == (1 << 32) | 2


def test_nested_dictionary_roundtrip():
    """dict<i32, list<dict<i32,utf8>>>: inner dictionaries get their own
    ids/batches (preorder, reader.rs nested-dict support); innermost
    batches are written first."""
    import jax.numpy as jnp
    from arrow_tpu.core.column import DictionaryColumn, ListColumn
    from arrow_tpu import compute as ops
    import arrow_tpu.dtypes as dt
    inner = ops.dictionary_encode(at.column(["x", "y", "x"]))
    lst = ListColumn(jnp.array([0, 2, 3], jnp.int32), inner)
    outer = DictionaryColumn(jnp.array([0, 1, 0, 1], jnp.int32), lst)
    t = at.Table((outer,), dt.Schema((dt.Field("d", outer.dtype),)))
    buf = io.BytesIO()
    ipc.write_stream(buf, t)
    t2 = ipc.read_stream(buf.getvalue())[0]
    assert t2.column(0).to_pylist() == t.column(0).to_pylist()


def test_dictionary_replacement_not_fooled_by_id_recycling():
    """The writer dedups dictionary batches by held object identity —
    id() of a garbage-collected values column can be recycled by a new,
    different dictionary (regression: silent skip -> data corruption)."""
    import gc
    from arrow_tpu import compute as ops
    buf = io.BytesIO()
    t1 = at.Table.from_pydict(
        {"d": ops.dictionary_encode(at.column(["aa", "bb"]))})
    w = ipc.StreamWriter(buf, t1)
    w.write(t1)
    del t1
    gc.collect()
    for k in range(100):          # churn allocations to recycle ids
        ops.dictionary_encode(at.column([f"junk{k}", "zz"]))
    t2 = at.Table.from_pydict(
        {"d": ops.dictionary_encode(at.column(["cc", "dd"]))})
    w.write(t2)
    w.close()
    out = ipc.read_stream(buf.getvalue())
    assert out[0].column(0).to_pylist() == ["aa", "bb"]
    assert out[1].column(0).to_pylist() == ["cc", "dd"]


def test_truncated_stream_raises():
    """A partial trailing message raises instead of silently returning
    fewer batches (reader.rs:1330 errors on truncation too)."""
    from arrow_tpu.errors import ArrowInvalid
    buf = io.BytesIO()
    ipc.write_stream(buf, at.Table.from_pydict({"x": [1, 2, 3, 4]}))
    raw = buf.getvalue()
    with pytest.raises(ArrowInvalid):
        ipc.read_stream(raw[:-12])


def test_legacy_v4_ipc_compat():
    """Legacy (pre-1.0) IPC tolerance: metadata V4 + use_legacy_format
    (no continuation marker, 4-byte length prefix) reads through both
    the stream and the file reader — the arrow-integration-testing
    ipc_reader.rs backward-compat role, with pyarrow's legacy writer as
    the golden producer (no 0.14.x golden files in this image)."""
    import io
    import numpy as np
    import pyarrow as pa
    import pyarrow.ipc as paipc
    from arrow_tpu.io import ipc as at_ipc
    rng = np.random.default_rng(0)
    pt = pa.table({
        "a": pa.array(rng.integers(-10**9, 10**9, 500), pa.int64()),
        "s": pa.array(["v%d" % (i % 7) for i in range(500)]),
        "d": pa.array(["w%d" % (i % 5) for i in range(500)]
                      ).dictionary_encode(),
        "f": pa.array(rng.random(500), pa.float64()),
    })
    opts = paipc.IpcWriteOptions(
        use_legacy_format=True,
        metadata_version=paipc.MetadataVersion.V4)
    buf = io.BytesIO()
    with paipc.new_stream(buf, pt.schema, options=opts) as w:
        w.write_table(pt)
    got = at_ipc.read_stream(io.BytesIO(buf.getvalue()))
    if isinstance(got, list):
        from arrow_tpu.ops.concat import concat_tables
        got = got[0] if len(got) == 1 else concat_tables(got)
    assert got.to_pydict() == pt.to_pydict()
    buf2 = io.BytesIO()
    with paipc.new_file(buf2, pt.schema, options=opts) as w:
        w.write_table(pt)
    f = at_ipc.FileReader(buf2.getvalue())
    assert f.get_batch(0).to_pydict() == pt.to_pydict()


def test_stream_writer_appends_to_nonempty_sink():
    """StreamWriter appending to a BytesIO that already holds data: the
    >1MB pre-extend optimization must seek relative to the sink's base
    position, not absolute 0, or it overwrites the existing prefix."""
    import numpy as np
    prefix = b"HEADERBYTES!" * 10
    buf = io.BytesIO()
    buf.write(prefix)
    t = at.Table.from_pydict({"x": np.arange(400_000, dtype=np.int64)})
    w = ipc.StreamWriter(buf, t.schema)
    w.write(t)                     # body ~3.2 MB > the 1 MB threshold
    w.close()
    raw = buf.getvalue()
    assert raw[:len(prefix)] == prefix
    got = ipc.read_stream(raw[len(prefix):])
    got = got[0] if isinstance(got, list) else got
    assert np.array_equal(np.asarray(got.column("x").values),
                          np.arange(400_000))
