"""Native Parquet reader vs pyarrow-written files (the codec oracle).

Covers: all codecs, v1+v2 data pages, dictionary pages, DELTA_*,
BYTE_STREAM_SPLIT, nested lists/structs/maps, decimals, row-group
projection — with pyarrow absent from the read path (parquet/src/
encodings/decoding.rs + file/serialized_reader.rs:95 parity)."""

import io
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arrow_tpu.io.parquet_native import ParquetFile
from arrow_tpu.io import parquet_io


def _mixed_table():
    return pa.table({
        "i64": pa.array([1, None, 3, 4], pa.int64()),
        "i32": pa.array([1, 2, None, -5], pa.int32()),
        "u16": pa.array([0, 9, None, 65535], pa.uint16()),
        "f64": pa.array([1.5, None, 2.0, 3.0]),
        "f32": pa.array([1.0, 2.5, None, -1.0], pa.float32()),
        "bool": pa.array([True, False, None, True]),
        "s": pa.array(["alpha", "beta", None, "alpha"]),
        "bin": pa.array([b"\x00", None, b"", b"xyz"], pa.binary()),
        "ts": pa.array([1, 2, 3, None], pa.timestamp("us")),
        "d32": pa.array([10, None, 12, 13], pa.date32()),
    })


def _assert_reads_equal(tab, **write_opts):
    buf = io.BytesIO()
    pq.write_table(tab, buf, **write_opts)
    got = ParquetFile(buf.getvalue()).read().to_pyarrow()
    for name in tab.column_names:
        a = got.column(got.schema.get_field_index(name))
        b = tab[name].combine_chunks()
        assert a.equals(b), (name, a.to_pylist(), b.to_pylist())


@pytest.mark.parametrize("comp", ["NONE", "SNAPPY", "ZSTD", "GZIP", "LZ4"])
def test_codecs(comp):
    _assert_reads_equal(_mixed_table(), compression=comp,
                        use_dictionary=False)


@pytest.mark.parametrize("ver", ["1.0", "2.0"])
def test_page_versions_with_dictionary(ver):
    _assert_reads_equal(_mixed_table(), compression="SNAPPY",
                        use_dictionary=True, data_page_version=ver)


def _nested_table():
    return pa.table({
        "list": pa.array([[1, 2], None, [], [3, None]],
                         pa.list_(pa.int64())),
        "lstr": pa.array([["a", "bb"], [], None, ["c"]],
                         pa.list_(pa.string())),
        "struct": pa.array(
            [{"p": 1, "q": "x"}, None, {"p": None, "q": "z"},
             {"p": 4, "q": None}],
            pa.struct([("p", pa.int32()), ("q", pa.string())])),
        "map": pa.array([[("k", 1)], None, [], [("a", 2), ("b", None)]],
                        pa.map_(pa.string(), pa.int64())),
        "ls": pa.array([[{"u": 1}], None, [{"u": None}, {"u": 3}], []],
                       pa.list_(pa.struct([("u", pa.int64())]))),
        "ss": pa.array(
            [{"in": {"v": 1}}, None, {"in": None}, {"in": {"v": None}}],
            pa.struct([("in", pa.struct([("v", pa.int64())]))])),
        "dec": pa.array([Decimal("1.23"), None, Decimal("-9.99"),
                         Decimal("0")], pa.decimal128(20, 2)),
        "fsb": pa.array([b"abcd", None, b"wxyz", b"0000"], pa.binary(4)),
        "f16": pa.array(np.array([1.5, 2.0, -1.0, 0.25], np.float16),
                        pa.float16()),
    })


@pytest.mark.parametrize("ver,comp", [("1.0", "SNAPPY"), ("2.0", "ZSTD")])
def test_nested(ver, comp):
    _assert_reads_equal(_nested_table(), compression=comp,
                        data_page_version=ver)


@pytest.mark.parametrize("ver", ["1.0", "2.0"])
def test_deep_nested_read(ver):
    """Multi-level repetition written by pyarrow (reader.rs nested
    assembly parity at depth >1)."""
    tab = pa.table({
        "ll": pa.array([[[1, None], []], None, [], [None, [2]]],
                       pa.list_(pa.list_(pa.int64()))),
        "lll": pa.array([[[[1], []]], [], None, [None, [[2, 3]]]],
                        pa.list_(pa.list_(pa.list_(pa.int64())))),
        "lm": pa.array([[[("a", 1)], None], None, [[]]],
                       pa.list_(pa.map_(pa.string(), pa.int64()))
                       ).take(pa.array([0, 1, 2, 2])),
        "sl": pa.array(
            [{"x": [[1], None]}, None, {"x": None}, {"x": [[None]]}],
            pa.struct([("x", pa.list_(pa.list_(pa.int64())))])),
        "lsl": pa.array(
            [[{"y": [1, 2]}], None, [{"y": None}, None], []],
            pa.list_(pa.struct([("y", pa.list_(pa.int64()))]))),
        "ml": pa.array([[("k", [1, None])], None, [("j", [])]],
                       pa.map_(pa.string(), pa.list_(pa.int64()))
                       ).take(pa.array([0, 1, 2, 0])),
    })
    _assert_reads_equal(tab, data_page_version=ver)
    # and the same table through our own writer, read by both readers
    import arrow_tpu as at
    from arrow_tpu.io.parquet_writer import write_parquet_native
    t = at.Table.from_pyarrow(tab)
    buf = io.BytesIO()
    write_parquet_native(buf, t, data_page_version=ver)
    data = buf.getvalue()
    ref = pq.read_table(io.BytesIO(data))
    ours = ParquetFile(data).read()
    for name in tab.column_names:
        assert ref[name].to_pylist() == tab[name].to_pylist(), name
        assert ours.column(name).to_pylist() == \
            tab[name].to_pylist(), (name, "ours")


def test_dict_to_plain_fallback_page_order():
    """Writers fall back from dictionary to PLAIN encoding mid-chunk
    when the dictionary overflows; the dict-encoded pages come FIRST
    and decoded values must stay in page order (column/writer/mod.rs
    fallback; regression: values used to come back reordered)."""
    n = 20000
    vals = [f"value-{i}" for i in range(n)]          # all distinct
    ints = list(range(n))
    tab = pa.table({"s": pa.array(vals), "i": pa.array(ints)})
    buf = io.BytesIO()
    pq.write_table(tab, buf, compression="snappy",
                   dictionary_pagesize_limit=4096,
                   data_page_size=4096)
    got = ParquetFile(buf.getvalue()).read()
    assert got.column("s").to_pylist() == vals
    assert got.column("i").to_pylist() == ints


def test_delta_encodings():
    t2 = pa.table({
        "di": pa.array(range(10000), pa.int64()),
        "ds": pa.array([f"prefix-common-{i % 50:04d}"
                        for i in range(10000)]),
        "di32": pa.array(np.arange(10000, dtype=np.int32) * 7),
    })
    _assert_reads_equal(t2, use_dictionary=False, column_encoding={
        "di": "DELTA_BINARY_PACKED", "ds": "DELTA_BYTE_ARRAY",
        "di32": "DELTA_BINARY_PACKED"})


def test_delta_length_byte_array():
    t = pa.table({"s": pa.array([f"v{i % 17}" for i in range(3000)])})
    _assert_reads_equal(t, use_dictionary=False,
                        column_encoding={"s": "DELTA_LENGTH_BYTE_ARRAY"})


def test_byte_stream_split():
    rng = np.random.default_rng(0)
    t = pa.table({"f": pa.array(rng.standard_normal(5000)),
                  "g": pa.array(rng.standard_normal(5000)
                                .astype(np.float32))})
    _assert_reads_equal(t, use_dictionary=False, column_encoding={
        "f": "BYTE_STREAM_SPLIT", "g": "BYTE_STREAM_SPLIT"})


def test_row_groups_and_projection():
    t2 = pa.table({
        "di": pa.array(range(10000), pa.int64()),
        "ds": pa.array([f"w{i % 50}" for i in range(10000)]),
    })
    buf = io.BytesIO()
    pq.write_table(t2, buf, row_group_size=1234)
    pf = ParquetFile(buf.getvalue())
    assert len(pf.row_groups) == 9
    got = pf.read(columns=["ds"])
    assert got.num_columns == 1 and got.num_rows == 10000
    assert got.column("ds").to_pylist() == t2["ds"].to_pylist()


def test_as_dictionary_stays_encoded():
    buf = io.BytesIO()
    pq.write_table(pa.table({"k": pa.array(["x", "y", "x", "z"] * 100)}),
                   buf)
    t = ParquetFile(buf.getvalue()).read(as_dictionary=["k"])
    from arrow_tpu.core.column import DictionaryColumn
    assert isinstance(t.column("k"), DictionaryColumn)
    assert t.column("k").to_pylist() == ["x", "y", "x", "z"] * 100


def test_int96_timestamps():
    t = pa.table({"ts": pa.array([0, 10**15, None], pa.timestamp("ns"))})
    buf = io.BytesIO()
    pq.write_table(t, buf, use_deprecated_int96_timestamps=True)
    got = ParquetFile(buf.getvalue()).read().to_pyarrow()
    assert got.column(0).to_pylist() == t["ts"].to_pylist()


def test_metadata_native():
    buf = io.BytesIO()
    pq.write_table(_mixed_table(), buf)
    md = parquet_io.read_metadata(io.BytesIO(buf.getvalue()))
    assert md.num_rows == 4
    assert md.num_row_groups == 1
    assert "i64" in [f.name for f in md.schema.fields]
    st = md.column_statistics(0, 0)
    assert st is not None and st["null_count"] == 1


class TestNativeWriter:
    """Native parquet writer (arrow_writer/mod.rs:131 + levels.rs roles):
    files must read back bit-exact in BOTH pyarrow and our reader."""

    def _table(self):
        import arrow_tpu as at
        from arrow_tpu.io.interop import table_from_pyarrow
        return table_from_pyarrow(pa.record_batch({
            "i": pa.array([1, None, 3, 4], pa.int64()),
            "u16": pa.array([1, 2, 65535, None], pa.uint16()),
            "f32": pa.array([1.5, None, 2.0, 0.0], pa.float32()),
            "s": pa.array(["alpha", "beta", None, "alpha"]),
            "bin": pa.array([b"\x00\x01", None, b"", b"zz"],
                            pa.binary()),
            "ts": pa.array([1, 2, None, 4], pa.timestamp("us")),
            "d32": pa.array([10, None, 12, 13], pa.date32()),
            "fsb": pa.array([b"abcd", None, b"wxyz", b"0000"],
                            pa.binary(4)),
            "list": pa.array([[1, 2], None, [], [3, None]],
                             pa.list_(pa.int64())),
            "struct": pa.array(
                [{"p": 1, "q": "x"}, None, {"p": None, "q": "z"},
                 {"p": 4, "q": None}],
                pa.struct([("p", pa.int32()), ("q", pa.string())])),
        }))

    @pytest.mark.parametrize("comp", ["none", "snappy", "zstd", "gzip"])
    def test_roundtrip_both_readers(self, comp):
        from arrow_tpu.io.parquet_writer import write_parquet_native
        t = self._table()
        buf = io.BytesIO()
        write_parquet_native(buf, t, compression=comp)
        data = buf.getvalue()
        ref = pq.read_table(io.BytesIO(data))
        exp = t.to_pydict()
        for name in t.column_names:
            assert ref[name].to_pylist() == exp[name], (comp, name)
        ours = ParquetFile(data).read()
        for name in t.column_names:
            assert ours.column(name).to_pylist() == exp[name], \
                (comp, name, "ours")

    def test_statistics_and_row_groups(self):
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        rng = np.random.default_rng(1)
        t = at.Table.from_pydict({
            "v": rng.integers(-500, 500, 1000),
        })
        buf = io.BytesIO()
        write_parquet_native(buf, t, row_group_size=300)
        md = pq.read_metadata(io.BytesIO(buf.getvalue()))
        assert md.num_row_groups == 4
        st = md.row_group(0).column(0).statistics
        vals = np.asarray(t.column("v").values)[:300]
        assert st.min == int(vals.min()) and st.max == int(vals.max())

    def test_bloom_filter_prune(self):
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        t = at.Table.from_pydict({
            "k": [f"key-{i}" for i in range(1000)],
            "v": np.arange(1000, dtype=np.int64),
        })
        buf = io.BytesIO()
        write_parquet_native(buf, t, bloom_filter_columns=["k", "v"],
                             row_group_size=250)
        pf = ParquetFile(buf.getvalue())
        hit = pf.bloom_filter_check(0, "k", ["key-10", "key-999",
                                             "absent"])
        assert hit[0] and not hit[1] and not hit[2]
        assert pf.prune_row_groups("v", 700) == [2]
        assert pf.prune_row_groups("k", "key-0") == [0]

    def _nested_roundtrip(self, tab, **kw):
        import arrow_tpu as at
        from arrow_tpu.io.parquet_io import _native_writable
        from arrow_tpu.io.parquet_writer import write_parquet_native
        t = at.Table.from_pyarrow(tab)
        assert _native_writable(t.schema), "should route native"
        buf = io.BytesIO()
        write_parquet_native(buf, t, **kw)
        data = buf.getvalue()
        ref = pq.read_table(io.BytesIO(data))
        for name in tab.column_names:
            assert ref[name].to_pylist() == tab[name].to_pylist(), name
        ours = ParquetFile(data).read()
        for name in tab.column_names:
            assert ours.column(name).to_pylist() == \
                tab[name].to_pylist(), (name, "ours")

    @pytest.mark.parametrize("ver", ["1.0", "2.0"])
    def test_nested_list_of_list(self, ver):
        tab = pa.table({
            "ll": pa.array(
                [[[1, 2], None, []], None, [], [[None, 3]], [[]]],
                pa.list_(pa.list_(pa.int64()))),
            "ls": pa.array([[["a", None]], [], None, [None], [["b"]]],
                           pa.list_(pa.list_(pa.string()))),
        })
        self._nested_roundtrip(tab, data_page_version=ver)

    def test_nested_struct_in_list(self, ):
        tab = pa.table({
            "lr": pa.array(
                [[{"a": 1, "b": "x"}, None], [], None,
                 [{"a": None, "b": None}]],
                pa.list_(pa.struct([("a", pa.int64()),
                                    ("b", pa.string())]))),
            "rl": pa.array(
                [{"v": [1, None]}, None, {"v": None}, {"v": []}],
                pa.struct([("v", pa.list_(pa.int64()))])),
        })
        self._nested_roundtrip(tab)

    @pytest.mark.parametrize("comp", ["none", "snappy"])
    def test_map_write(self, comp):
        tab = pa.table({
            "m": pa.array(
                [[("k1", 1), ("k2", None)], [], None, [("k3", 3)]],
                pa.map_(pa.string(), pa.int64())),
        })
        self._nested_roundtrip(tab, compression=comp)

    def test_fixed_size_list_write(self):
        # pyarrow cannot read back FSL-with-nulls parquet (it chokes on
        # its OWN writer's output: "Expected all lists to be of size=2"),
        # so the pyarrow-oracle leg runs without the ARROW:schema embed
        # (degrades to plain list, which pyarrow reads fine)
        tab = pa.table({
            "fsl": pa.array([[1, 2], None, [3, None], [5, 6]],
                            pa.list_(pa.int64(), 2)),
        })
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        t = at.Table.from_pyarrow(tab)
        buf = io.BytesIO()
        write_parquet_native(buf, t, store_schema=False)
        ref = pq.read_table(io.BytesIO(buf.getvalue()))
        assert ref["fsl"].to_pylist() == tab["fsl"].to_pylist()
        # with the embed, OUR reader recovers the exact FSL type
        # (arrow-rs parity: schema/primitive.rs apply_hint + the
        # FixedSizeList reconstruction)
        buf = io.BytesIO()
        write_parquet_native(buf, t)
        ours = ParquetFile(buf.getvalue()).read()
        assert str(ours.column("fsl").dtype) == \
            str(t.column("fsl").dtype)
        assert ours.column("fsl").to_pylist() == tab["fsl"].to_pylist()

    def test_dictionary_in_list(self):
        inner = pa.array(["a", "b", None, "a", "c", "b"]
                         ).dictionary_encode()
        offs = pa.array([0, 2, 2, 5, 6], pa.int32())
        lst = pa.ListArray.from_arrays(offs, inner)
        tab = pa.table({"ld": lst})
        self._nested_roundtrip(tab)

    def test_nested_fuzz(self):
        rng = np.random.default_rng(5)
        n = 400
        def rand_list(gen, null_p=0.1, empty_p=0.1):
            out = []
            for _ in range(n):
                r = rng.random()
                if r < null_p:
                    out.append(None)
                elif r < null_p + empty_p:
                    out.append([])
                else:
                    out.append([gen() for _ in
                                range(int(rng.integers(1, 5)))])
            return out
        iv = lambda: (None if rng.random() < 0.15
                      else int(rng.integers(-100, 100)))
        sv = lambda: (None if rng.random() < 0.15
                      else f"s{int(rng.integers(0, 50))}")
        tab = pa.table({
            "li": pa.array(rand_list(iv), pa.list_(pa.int64())),
            "ls": pa.array(rand_list(sv), pa.list_(pa.string())),
            "lli": pa.array(rand_list(lambda: [iv(), iv()]),
                            pa.list_(pa.list_(pa.int64()))),
        })
        self._nested_roundtrip(tab, data_page_size=2048)

    @pytest.mark.parametrize("ver", ["1.0", "2.0"])
    @pytest.mark.parametrize("comp", ["none", "snappy", "zstd"])
    def test_multi_page_both_versions(self, ver, comp):
        """data_page_size splits chunks into many pages; v1 and v2
        headers; CRC32 checksums verified by the Arrow C++ reader."""
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        rng = np.random.default_rng(7)
        n = 5000
        vals = rng.integers(-10**6, 10**6, n)
        f = rng.random(n)
        s = [f"s{i % 97}" if i % 11 else None for i in range(n)]
        t = at.Table.from_pyarrow(pa.table({
            "v": pa.array(vals, mask=rng.random(n) < 0.1),
            "f": pa.array(f), "s": pa.array(s)}))
        buf = io.BytesIO()
        write_parquet_native(buf, t, compression=comp,
                             data_page_size=4096,
                             data_page_version=ver,
                             write_page_checksum=True,
                             write_page_index=True)
        data = buf.getvalue()
        exp = t.to_pydict()
        # pyarrow verifies checksums page by page when asked to
        ref = pq.ParquetFile(io.BytesIO(data),
                             page_checksum_verification=True).read()
        for name in t.column_names:
            assert ref[name].to_pylist() == exp[name], (ver, comp, name)
        pf = ParquetFile(data)
        ours = pf.read()
        for name in t.column_names:
            assert ours.column(name).to_pylist() == exp[name]
        # offset index covers every page; first_row_index is cumulative
        oi = pf.offset_index(0, "v")
        assert oi is not None and len(oi) > 3
        assert oi[0][2] == 0
        assert [fr for _, _, fr in oi] == sorted(
            fr for _, _, fr in oi)
        # column index min/max bound each page; nulls counted
        ci = pf.column_index(0, "v")
        assert ci is not None and len(ci["min_values"]) == len(oi)
        assert sum(ci["null_counts"]) == sum(
            1 for x in exp["v"] if x is None)
        import struct as _st
        mn0 = _st.unpack("<q", ci["min_values"][0])[0]
        page0 = [x for x in exp["v"][:oi[1][2]] if x is not None]
        assert mn0 == min(page0)

    def test_page_index_ascending_boundary(self):
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        t = at.Table.from_pydict({
            "k": np.arange(4000, dtype=np.int64)})
        buf = io.BytesIO()
        write_parquet_native(buf, t, data_page_size=2048,
                             write_page_index=True, compression="none")
        pf = ParquetFile(buf.getvalue())
        ci = pf.column_index(0, "k")
        assert ci["boundary_order"] == 1          # ascending
        assert not any(ci["null_pages"])

    def test_page_index_dictionary_column(self):
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        s = [f"v{i % 13:02d}" for i in range(3000)]
        t = at.Table.from_pyarrow(pa.table({"s": pa.array(s)}))
        buf = io.BytesIO()
        write_parquet_native(buf, t, data_page_size=2048,
                             write_page_index=True)
        pf = ParquetFile(buf.getvalue())
        ci = pf.column_index(0, "s")
        oi = pf.offset_index(0, "s")
        assert len(oi) > 1 and len(ci["min_values"]) == len(oi)
        assert ci["min_values"][0] == b"v00"
        assert ci["max_values"][0] == b"v12"
        assert pq.read_table(io.BytesIO(buf.getvalue()))[
            "s"].to_pylist() == s

    def test_view_f16_date64_ts_second_write(self):
        """arrow-rs schema/mod.rs:509-630 mappings: f16 -> FLBA(2)
        FLOAT16, date64/ts[s] -> plain INT64, views -> BYTE_ARRAY."""
        tab = pa.table({
            "sv": pa.array(["a", None, "ccc"], pa.string_view()),
            "bv": pa.array([b"x", b"", None], pa.binary_view()),
            "f16": pa.array(np.array([1.5, -2.0, 0.25], np.float16),
                            pa.float16()),
            "d64": pa.array([86400000, None, 0], pa.date64()),
            "tss": pa.array([1, 2, None], pa.timestamp("s")),
        })
        import arrow_tpu as at
        from arrow_tpu.io.parquet_io import _native_writable
        from arrow_tpu.io.parquet_writer import write_parquet_native
        t = at.Table.from_pyarrow(tab)
        assert _native_writable(t.schema)
        buf = io.BytesIO()
        write_parquet_native(buf, t)
        data = buf.getvalue()
        ref = pq.read_table(io.BytesIO(data))
        assert ref["sv"].to_pylist() == ["a", None, "ccc"]
        assert ref["bv"].to_pylist() == [b"x", b"", None]
        assert ref["f16"].to_pylist() == [1.5, -2.0, 0.25]
        # date64/ts[s] have no parquet annotation: values survive as i64
        assert ref["d64"].to_pylist() == [86400000, None, 0]
        assert ref["tss"].to_pylist() == [1, 2, None]
        ours = ParquetFile(data).read()
        assert ours.column("f16").to_pylist() == [1.5, -2.0, 0.25]

    def test_streaming_writer_native(self, tmp_path):
        import arrow_tpu as at
        from arrow_tpu.io.parquet_io import (ParquetWriter,
                                             WriterProperties,
                                             read_parquet)
        from arrow_tpu.io.parquet_writer import NativeParquetWriter
        t = at.Table.from_pydict({"v": np.arange(500, dtype=np.int64)})
        p = str(tmp_path / "s.parquet")
        w = ParquetWriter(p, t, WriterProperties(row_group_size=200))
        assert isinstance(w._w, NativeParquetWriter)
        w.write(t.slice(0, 250))
        w.write(t.slice(250, 250))
        w.close()
        got = read_parquet(p)
        assert got.to_pydict() == t.to_pydict()
        md = pq.read_metadata(p)
        assert md.num_row_groups == 4        # 200+50 per write call

    def test_v2_default_encodings(self):
        """PARQUET_2_0 fallback encodings (column/writer/mod.rs:1444):
        RLE bools, DELTA_BINARY_PACKED ints, DELTA_BYTE_ARRAY strings —
        readable by Arrow C++ and our own decoder, block/miniblock
        boundaries fuzzed."""
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        rng = np.random.default_rng(9)
        for n in (1, 2, 32, 127, 128, 129, 640, 4097):
            vals = rng.integers(-10**14, 10**14, n)
            mask = rng.random(n) < 0.2
            tab = pa.table({
                "v": pa.array(vals, mask=mask),
                "s": pa.array([None if i % 7 == 3 else f"s{i%50}"
                               for i in range(n)]),
                "b": pa.array((vals % 2 == 0).tolist()),
            })
            t = at.Table.from_pyarrow(tab)
            buf = io.BytesIO()
            write_parquet_native(buf, t, data_page_version="2.0",
                                 dictionary_enabled=False,
                                 data_page_size=1024)
            data = buf.getvalue()
            ref = pq.read_table(io.BytesIO(data))
            ours = ParquetFile(data).read()
            for name in tab.column_names:
                assert ref[name].to_pylist() == \
                    tab[name].to_pylist(), (n, name)
                assert ours.column(name).to_pylist() == \
                    tab[name].to_pylist(), (n, name, "ours")
        md = pq.read_metadata(io.BytesIO(data))
        encs = {md.schema.column(i).name:
                set(md.row_group(0).column(i).encodings)
                for i in range(3)}
        assert "DELTA_BINARY_PACKED" in encs["v"]
        assert "DELTA_BYTE_ARRAY" in encs["s"]

    def test_v2_delta_extreme_values(self):
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        vals = [-2**63, 2**63 - 1, 0, -1, 2**62, -2**62, 17]
        t = at.Table.from_pydict({"v": np.array(vals, np.int64)})
        buf = io.BytesIO()
        write_parquet_native(buf, t, data_page_version="2.0",
                             dictionary_enabled=False)
        assert pq.read_table(io.BytesIO(buf.getvalue()))[
            "v"].to_pylist() == vals
        assert ParquetFile(buf.getvalue()).read().column(
            "v").to_pylist() == vals

    def test_empty_table_roundtrip(self):
        import arrow_tpu as at
        from arrow_tpu.io.parquet_writer import write_parquet_native
        t = at.Table.from_pyarrow(pa.table({
            "v": pa.array([], pa.int64()),
            "s": pa.array([], pa.string())}))
        buf = io.BytesIO()
        write_parquet_native(buf, t)
        got = ParquetFile(buf.getvalue()).read()
        assert got.num_rows == 0
        assert got.column_names == ("v", "s") or \
            list(got.column_names) == ["v", "s"]

    def test_rle_fuzz(self):
        from arrow_tpu.utils import native as nt
        rng = np.random.default_rng(2)
        for _ in range(50):
            n = int(rng.integers(1, 2000))
            bw = int(rng.choice([1, 2, 3, 5, 8, 12, 20]))
            vals = rng.integers(0, 2 ** min(bw, 31), n) \
                .astype(np.uint32)
            for _ in range(4):
                p0 = int(rng.integers(0, n))
                vals[p0:p0 + int(rng.integers(1, 40))] = vals[p0]
            enc = nt.rle_bp_encode(vals, bw)
            assert np.array_equal(nt.rle_bp_decode(enc, bw, n), vals)

    def test_large_random_via_default_path(self, tmp_path):
        # write_parquet routes to the native writer by default
        import arrow_tpu as at
        from arrow_tpu.io import parquet_io
        rng = np.random.default_rng(3)
        n = 50_000
        t = at.Table.from_pydict({
            "a": rng.integers(-10**12, 10**12, n),
            "b": rng.standard_normal(n),
            "s": [f"w{i % 97}" for i in range(n)],
        })
        p = str(tmp_path / "big.parquet")
        parquet_io.write_parquet(p, t)
        back = parquet_io.read_parquet(p)
        assert np.array_equal(np.asarray(back.column("a").values),
                              np.asarray(t.column("a").values))
        assert back.column("s").to_pylist()[:5] == \
            t.column("s").to_pylist()[:5]
        # and pyarrow agrees
        ref = pq.read_table(p)
        assert ref["a"].to_pylist()[:50] == \
            t.column("a").to_pylist()[:50]


def test_page_index_read():
    """ColumnIndex/OffsetIndex parse (file/page_index role) from a
    pyarrow-written page index."""
    t = pa.table({"v": pa.array(list(range(10000)))})
    buf = io.BytesIO()
    pq.write_table(t, buf, write_page_index=True, data_page_size=4096,
                   use_dictionary=False)
    pf = ParquetFile(buf.getvalue())
    ci = pf.column_index(0, "v")
    oi = pf.offset_index(0, "v")
    assert ci is not None and oi is not None
    assert len(oi) == len(ci["min_values"]) > 1
    assert ci["null_pages"] == [False] * len(oi)
    # page first_row_index strictly increasing from 0
    firsts = [r for _, _, r in oi]
    assert firsts[0] == 0 and firsts == sorted(firsts)
    # min of page 0 decodes to 0 (little-endian int64 PLAIN)
    import struct as _st
    assert _st.unpack("<q", ci["min_values"][0])[0] == 0


def test_lazy_range_reads(tmp_path):
    """Path sources fetch only footer + projected chunks (the
    async_reader/mod.rs:712 access pattern, range-based)."""
    rng = np.random.default_rng(5)
    t = pa.table({
        "a": pa.array(rng.integers(0, 1000, 100_000)),
        "b": pa.array(rng.standard_normal(100_000)),
        "big": pa.array([f"text-{i}" * 4 for i in range(100_000)]),
    })
    p = str(tmp_path / "wide.parquet")
    pq.write_table(t, p, use_dictionary=False)
    total = __import__("os").path.getsize(p)

    reads = []
    real_open = open

    class CountingFile:
        def __init__(self, path):
            self._f = real_open(path, "rb")

        def seek(self, *a):
            return self._f.seek(*a)

        def tell(self):
            return self._f.tell()

        def read(self, n=-1):
            reads.append(n)
            return self._f.read(n)

    pf = ParquetFile(CountingFile(p))
    got = pf.read(columns=["a"])
    assert got.num_rows == 100_000
    fetched = sum(r for r in reads if r and r > 0)
    # the "big" string chunk dominates the file; projecting "a" must
    # not fetch it
    assert fetched < total // 2, (fetched, total)


def test_reader_builder_bloom_pruning(tmp_path):
    import arrow_tpu as at
    from arrow_tpu.io.parquet_writer import write_parquet_native
    t = at.Table.from_pydict({
        "k": [f"key-{i}" for i in range(1000)],
        "v": np.arange(1000, dtype=np.int64),
    })
    p = str(tmp_path / "b.parquet")
    write_parquet_native(p, t, bloom_filter_columns=["v"],
                         row_group_size=250)
    batches = list(parquet_io.ParquetReaderBuilder(p)
                   .with_bloom_filter("v", 600).build())
    got = sum(b.num_rows for b in batches)
    assert got == 250                      # only row group 2 survives
    assert any(600 in b.column("v").to_pylist() for b in batches)


class TestArrowSchemaHint:
    """ARROW:schema embedded metadata: exact Arrow type recovery on
    read (schema/mod.rs:146 encode/decode_arrow_schema role)."""

    @staticmethod
    def _vals(c):
        v = np.asarray(c.values)
        m = None if c.validity is None else np.asarray(c.validity)
        return [None if (m is not None and not m[i]) else int(v[i])
                for i in range(len(v))]

    def test_native_roundtrip_hint_types(self, tmp_path):
        import arrow_tpu as at
        from arrow_tpu import dtypes as dt
        cols = {
            "dur": at.column([1, 2, None, 4], dt.duration("ms")),
            "ym": at.column([12, None, -3, 0],
                            dt.interval("year_month")),
            "dtv": at.column([(5 << 32) | 100, None, (1 << 32) | 7, 0],
                             dt.interval("day_time")),
            "ts": at.column([10, 20, 30, None],
                            dt.timestamp("us", "America/New_York")),
        }
        t = at.Table.from_pydict(cols)
        p = str(tmp_path / "hint.parquet")
        parquet_io.write_parquet(p, t)
        back = parquet_io.read_parquet(p)
        for name, col in cols.items():
            got = back.column(name)
            assert got.dtype == col.dtype, (name, got.dtype)
            assert self._vals(got) == self._vals(col), name
        # pyarrow consumes the same embedded schema (duration has no
        # parquet logical type: only the hint can produce it)
        ref = pq.read_table(p)
        assert ref.schema.field("dur").type == pa.duration("ms")
        assert ref.schema.field("ts").type == \
            pa.timestamp("us", "America/New_York")
        import datetime as _dtm
        assert ref["dur"].to_pylist() == [
            _dtm.timedelta(milliseconds=v) if v is not None else None
            for v in (1, 2, None, 4)]

    def test_hint_from_pyarrow_file(self):
        t = pa.table({
            "dur": pa.array([1, None, 3], pa.duration("s")),
            "lu": pa.array(["a", "bb", None], pa.large_string()),
            "dct": pa.array(["x", "y", "x"]).dictionary_encode(),
            "ts": pa.array([1, 2, 3],
                           pa.timestamp("ms", "Asia/Kathmandu")),
            "d64": pa.array([86400000, None, 172800000], pa.date64()),
        })
        buf = io.BytesIO()
        pq.write_table(t, buf)
        got = ParquetFile(buf.getvalue()).read()
        names = {f.name: str(f.dtype) for f in got.schema.fields}
        assert names["dur"] == "duration[s]"
        assert names["lu"] == "large_utf8"
        assert names["dct"].startswith("dictionary<")
        assert names["ts"] == "timestamp[ms, tz=Asia/Kathmandu]"
        assert names["d64"] == "date64"
        import datetime as _dtm
        assert got.column("dur").to_pylist() == [
            _dtm.timedelta(seconds=1), None, _dtm.timedelta(seconds=3)]
        assert got.column("lu").to_pylist() == ["a", "bb", None]

    def test_store_schema_false(self, tmp_path):
        import arrow_tpu as at
        from arrow_tpu import dtypes as dt
        t = at.Table.from_pydict(
            {"dur": at.column([5, 6], dt.duration("us"))})
        p = str(tmp_path / "nohint.parquet")
        parquet_io.write_parquet(
            p, t,
            properties=parquet_io.WriterProperties(store_schema=False))
        pf = ParquetFile(p)
        assert "ARROW:schema" not in pf.key_value_metadata()
        # without the hint, duration degrades to its physical int64
        assert str(pf.read().column("dur").dtype) == "int64"

    def test_custom_key_value_metadata(self, tmp_path):
        import arrow_tpu as at
        t = at.Table.from_pydict({"v": [1, 2, 3]})
        p = str(tmp_path / "kv.parquet")
        parquet_io.write_parquet(
            p, t, properties=parquet_io.WriterProperties(
                key_value_metadata={"who": "arrow_tpu", "n": "3"}))
        kv = ParquetFile(p).key_value_metadata()
        assert kv["who"] == b"arrow_tpu" and kv["n"] == b"3"
        # pyarrow sees them too
        md = pq.read_metadata(p).metadata
        assert md[b"who"] == b"arrow_tpu"

    def test_interval_pyarrow_reads_flba(self, tmp_path):
        """Our INTERVAL columns surface to pyarrow as FLBA(12) with the
        spec's months/days/millis layout (arrow_writer/mod.rs:1252)."""
        import arrow_tpu as at
        from arrow_tpu import dtypes as dt
        t = at.Table.from_pydict({
            "ym": at.column([14, None], dt.interval("year_month")),
            "dtv": at.column([(3 << 32) | 250, 0],
                             dt.interval("day_time")),
        })
        p = str(tmp_path / "iv.parquet")
        parquet_io.write_parquet(
            p, t,
            properties=parquet_io.WriterProperties(store_schema=False))
        ref = pq.read_table(p)
        assert ref.schema.field("ym").type == pa.binary(12)
        raw = ref["ym"].to_pylist()
        assert raw[0][:4] == (14).to_bytes(4, "little") and \
            raw[1] is None
        raw = ref["dtv"].to_pylist()
        assert raw[0][4:8] == (3).to_bytes(4, "little")
        assert raw[0][8:12] == (250).to_bytes(4, "little")


def test_per_column_writer_properties(tmp_path):
    """properties.rs per-column overrides: compression, dictionary, and
    statistics toggled per column; pyarrow confirms the layout."""
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import WriterProperties, write_parquet
    t = at.Table.from_pydict({
        "a": ["x", "y", "x", "z"] * 50,
        "b": ["p", "q", "r", "s"] * 50,
        "c": list(range(200)),
    })
    p = str(tmp_path / "pc.parquet")
    write_parquet(p, t, WriterProperties(
        compression="snappy",
        column_properties={
            "a": {"compression": "zstd"},
            "b": {"dictionary_enabled": False,
                  "write_statistics": False},
        }))
    md = pq.ParquetFile(p).metadata
    cols = {md.row_group(0).column(i).path_in_schema:
            md.row_group(0).column(i) for i in range(md.num_columns)}
    assert cols["a"].compression == "ZSTD"
    assert cols["c"].compression == "SNAPPY"
    assert "PLAIN_DICTIONARY" not in str(cols["b"].encodings) and \
        "RLE_DICTIONARY" not in str(cols["b"].encodings)
    assert "RLE_DICTIONARY" in str(cols["a"].encodings)
    assert cols["b"].statistics is None
    assert cols["c"].statistics is not None
    # values intact through mixed codecs
    assert pq.read_table(p).to_pydict() == t.to_pydict()


def test_forced_column_encodings(tmp_path):
    """set_column_encoding role: BYTE_STREAM_SPLIT floats, DELTA ints,
    DELTA_BYTE_ARRAY strings forced per column; both readers agree."""
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import WriterProperties, write_parquet
    t = at.Table.from_pydict({
        "f": [float(i) * 0.5 for i in range(300)],
        "i": list(range(300)),
        "s": [f"str-{i:03d}" for i in range(300)],
    })
    p = str(tmp_path / "enc.parquet")
    write_parquet(p, t, WriterProperties(
        data_page_version="1.0",
        column_properties={
            "f": {"encoding": "byte_stream_split"},
            "i": {"encoding": "delta_binary_packed"},
            "s": {"encoding": "delta_byte_array"},
        }))
    md = pq.ParquetFile(p).metadata
    encs = {md.row_group(0).column(i).path_in_schema:
            str(md.row_group(0).column(i).encodings)
            for i in range(md.num_columns)}
    assert "BYTE_STREAM_SPLIT" in encs["f"]
    assert "DELTA_BINARY_PACKED" in encs["i"]
    assert "DELTA_BYTE_ARRAY" in encs["s"]
    assert pq.read_table(p).to_pydict() == t.to_pydict()
    assert ParquetFile(open(p, "rb").read()).read().to_pydict() == \
        t.to_pydict()


def test_streaming_writer_column_properties(tmp_path):
    """ParquetWriter (streaming) honors per-column overrides
    (properties.rs set_column_* roles) — regression: silently dropped."""
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import ParquetWriter, WriterProperties
    t = at.Table.from_pydict({"a": [1, 2, 3] * 50,
                              "b": [1.5, 2.5, 3.5] * 50})
    p = str(tmp_path / "colprops.parquet")
    w = ParquetWriter(p, t, WriterProperties(
        column_properties={"a": {"compression": "zstd"}}))
    w.write(t)
    w.close()
    md = pq.ParquetFile(p).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"
    assert md.row_group(0).column(1).compression == "SNAPPY"
    assert pq.read_table(p).column("a").to_pylist() == [1, 2, 3] * 50


def test_float_stats_skip_nan(tmp_path):
    """NaN is excluded from min/max statistics (statistics.rs role)."""
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import write_parquet
    t = at.Table.from_pydict({"x": [1.0, float("nan"), 2.0]})
    p = str(tmp_path / "nan.parquet")
    write_parquet(p, t)
    st = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    assert st.min == 1.0 and st.max == 2.0
    t2 = at.Table.from_pydict({"x": [float("nan")] * 3})
    p2 = str(tmp_path / "allnan.parquet")
    write_parquet(p2, t2)
    st2 = pq.ParquetFile(p2).metadata.row_group(0).column(0).statistics
    assert st2 is None or not st2.has_min_max


def test_unsigned_and_empty_string_stats(tmp_path):
    """uint32 > INT32_MAX and all-empty-string columns keep statistics
    (regression: struct.pack raised and stats silently vanished)."""
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import write_parquet
    t = at.Table.from_pydict({"u": at.column([3_000_000_000, 5],
                                             at.uint32),
                              "s": ["", ""]})
    p = str(tmp_path / "ustats.parquet")
    write_parquet(p, t)
    md = pq.ParquetFile(p).metadata.row_group(0)
    su = md.column(0).statistics
    assert su.min == 5 and su.max == 3_000_000_000
    ss = md.column(1).statistics
    assert ss.min_raw == b"" and ss.max_raw == b""


def test_dict_column_override_materializes(tmp_path):
    """dictionary_enabled=False (or a forced encoding) on a
    dictionary-typed column materializes it instead of silently keeping
    RLE_DICTIONARY pages."""
    import arrow_tpu as at
    from arrow_tpu import compute as ops
    from arrow_tpu.io.parquet_io import (ParquetWriter, WriterProperties,
                                         read_parquet)
    d = ops.dictionary_encode(at.column(["a", "b", "a", "c"] * 10))
    t = at.Table.from_pydict({"d": d})
    p = str(tmp_path / "nodict.parquet")
    w = ParquetWriter(p, t, WriterProperties(
        column_properties={"d": {"dictionary_enabled": False}}))
    w.write(t)
    w.close()
    encs = pq.ParquetFile(p).metadata.row_group(0).column(0).encodings
    assert "RLE_DICTIONARY" not in encs and "PLAIN_DICTIONARY" not in encs
    assert read_parquet(p).column("d").to_pylist() == \
        ["a", "b", "a", "c"] * 10


def test_nested_chunk_addressing_and_projection_errors(tmp_path):
    """column_index/bloom filters resolve nested leaves by root or
    dotted path; ambiguous bare leaf names raise; unknown projection
    names raise (regression: silent None / silent empty table)."""
    import arrow_tpu as at
    from arrow_tpu.errors import ArrowInvalid
    from arrow_tpu.io.parquet_io import write_parquet, WriterProperties
    t = at.Table.from_pydict({
        "v": [7, 5],
        "a": at.column([[1, 2], [3]], at.dtypes.list_(at.int64)),
        "b": at.column([[9], [8]], at.dtypes.list_(at.int64))})
    p = str(tmp_path / "nested.parquet")
    write_parquet(p, t, WriterProperties(write_page_index=True,
                                         bloom_filter_columns=("a",)))
    pf = ParquetFile(open(p, "rb").read())
    ci = pf.column_index(0, "v")
    assert ci is not None and ci["min_values"]
    assert pf._leaf_index_for("a") == 1          # root-name resolution
    assert pf._leaf_index_for("a.list.element") == 1   # dotted path
    with pytest.raises(ArrowInvalid):
        pf._leaf_index_for("element")       # ambiguous across a and b
    hit = pf.bloom_filter_check(0, "a", [1])
    assert hit is not None and bool(hit[0])
    with pytest.raises(ArrowInvalid):
        pf.read(columns=["typo"])


def test_bitpacked_levels_decode():
    """Deprecated BIT_PACKED level decoding: MSB-first packing."""
    from arrow_tpu.io.parquet_native import _bitpacked_levels
    # levels [1,0,1,1,0,1,0,0] at bit width 1 -> one byte 0b10110100
    out = _bitpacked_levels(bytes([0b10110100]), 1, 8)
    assert list(out) == [1, 0, 1, 1, 0, 1, 0, 0]
    # width 2: values [3,1,2] -> bits 11 01 10 xx -> byte 0b11011000
    out = _bitpacked_levels(bytes([0b11011000]), 2, 3)
    assert list(out) == [3, 1, 2]


def test_parquet_decimal32_64_native(tmp_path):
    """decimal32/64 write as INT32/INT64 + DECIMAL (schema/mod.rs:634);
    width restores through the ARROW:schema hint; pyarrow agrees."""
    import arrow_tpu as at
    from arrow_tpu.io import parquet_io
    d32 = at.column([1234, None, -567], at.dtypes.decimal32(7, 2))
    d64 = at.column([98765432101, None, -5], at.dtypes.decimal64(15, 3))
    t = at.Table((d32, d64), at.Schema((at.Field("a", d32.dtype),
                                        at.Field("b", d64.dtype))))
    p = str(tmp_path / "d.parquet")
    parquet_io.write_parquet(p, t)
    pa_t = pq.read_table(p)
    assert pa_t.column("a").to_pylist() == [Decimal("12.34"), None,
                                            Decimal("-5.67")]
    assert str(pa_t.schema.field("a").type) == "decimal32(7, 2)"
    ours = parquet_io.read_parquet(p)
    assert str(ours.schema.fields[0].dtype) == "decimal32(7, 2)"
    assert str(ours.schema.fields[1].dtype) == "decimal64(15, 3)"
    assert ours.column("b").to_pylist() == pa_t.column("b").to_pylist()


def test_parquet_null_column_native(tmp_path):
    """Null columns write as INT32 + LogicalType UNKNOWN
    (schema/mod.rs:444, primitive.rs:194)."""
    import arrow_tpu as at
    from arrow_tpu.core.column import NullColumn
    from arrow_tpu.io import parquet_io
    t = at.Table((at.column([1, 2, 3]), NullColumn(3)),
                 at.Schema((at.Field("x", at.int64),
                            at.Field("n", at.dtypes.null))))
    p = str(tmp_path / "n.parquet")
    parquet_io.write_parquet(p, t)
    pa_t = pq.read_table(p)
    assert str(pa_t.schema.field("n").type) == "null"
    assert pa_t.column("n").to_pylist() == [None] * 3
    ours = parquet_io.read_parquet(p)
    assert isinstance(ours.column("n"), NullColumn)
    assert ours.column("x").to_pylist() == [1, 2, 3]


def test_parquet_numeric_dictionary_native(tmp_path):
    """dictionary<numeric> writes natively (codes materialize through
    the page dictionary; ARROW:schema restores the dict dtype)."""
    import arrow_tpu as at
    import jax.numpy as jnp
    from arrow_tpu.core.column import DictionaryColumn
    from arrow_tpu.io import parquet_io
    d = DictionaryColumn(jnp.asarray(np.array([2, 0, 1, 2], np.int32)),
                         at.column(np.array([10, 20, 30], np.int64)),
                         None)
    t = at.Table((d,), at.Schema((at.Field("d", d.dtype),)))
    assert parquet_io._native_writable(t.schema)
    p = str(tmp_path / "dict.parquet")
    parquet_io.write_parquet(p, t)
    assert pq.read_table(p).column("d").to_pylist() == [30, 10, 20, 30]
    ours = parquet_io.read_parquet(p)
    assert ours.column("d").to_pylist() == [30, 10, 20, 30]
    assert ours.schema.fields[0].dtype.name == "dictionary"


def test_parquet_list_view_native(tmp_path):
    """list_view/large_list_view store as lists (the reference rejects
    views, schema/mod.rs:717); the ARROW:schema embed restores the view
    dtype on read — in pyarrow too."""
    import arrow_tpu as at
    import jax.numpy as jnp
    from arrow_tpu.core.nested import ListViewColumn
    from arrow_tpu.io import parquet_io
    lv = ListViewColumn(jnp.asarray(np.array([2, 0, 1], np.int32)),
                        jnp.asarray(np.array([2, 2, 3], np.int32)),
                        at.column([10, 20, 30, 40, 50]),
                        jnp.asarray(np.array([True, True, False])))
    t = at.Table((lv,), at.Schema((at.Field("v", lv.dtype),)))
    assert parquet_io._native_writable(t.schema)
    p = str(tmp_path / "lv.parquet")
    parquet_io.write_parquet(p, t)
    pa_t = pq.read_table(p)
    assert pa_t.column("v").to_pylist() == [[30, 40], [10, 20], None]
    assert str(pa_t.schema.field("v").type).startswith("list_view")
    ours = parquet_io.read_parquet(p)
    assert ours.column("v").to_pylist() == [[30, 40], [10, 20], None]
    assert ours.schema.fields[0].dtype.name == "list_view"


# ---------------------------------------------------------------------------
# round 3: prefetching scan + pluggable range source
# (parquet/src/arrow/async_reader/mod.rs:712 overlap role)
# ---------------------------------------------------------------------------

def test_prefetching_scan_matches_sync(tmp_path):
    import os
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import (ParquetReaderBuilder,
                                         write_parquet,
                                         WriterProperties)
    p = str(tmp_path / "multi_rg.parquet")
    n = 40_000
    t = at.Table.from_pydict({
        "i": np.arange(n), "v": np.arange(n) * 0.5,
        "s": [f"r{i % 97}" for i in range(n)]})
    write_parquet(p, t, WriterProperties(row_group_size=7_000))
    # prefetch on (default) vs off produce identical batch streams
    batches = list(ParquetReaderBuilder(p, batch_size=3_000).build())
    os.environ["ARROW_TPU_PARQUET_PREFETCH"] = "0"
    try:
        sync = list(ParquetReaderBuilder(p, batch_size=3_000).build())
    finally:
        del os.environ["ARROW_TPU_PARQUET_PREFETCH"]
    assert len(batches) == len(sync)
    got = np.concatenate([np.asarray(b.columns[0].values)
                          for b in batches])
    exp = np.concatenate([np.asarray(b.columns[0].values) for b in sync])
    assert (got == exp).all() and len(got) == n
    # limit short-circuits mid-stream without deadlocking the pool
    lim = list(ParquetReaderBuilder(p, batch_size=3_000, limit=5)
               .build())
    assert sum(b.num_rows for b in lim) == 5


def test_pluggable_range_source(tmp_path):
    import threading
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import write_parquet
    from arrow_tpu.io.parquet_native import read_parquet_native

    p = str(tmp_path / "src.parquet")
    t = at.Table.from_pydict({"x": np.arange(1000)})
    write_parquet(p, t)
    raw = open(p, "rb").read()

    class CountingStore:
        """Remote-store stand-in: byte-range API + fetch accounting."""
        def __init__(self, buf):
            self._buf = buf
            self.calls = 0
            self._lock = threading.Lock()
        def size(self):
            return len(self._buf)
        def get_range(self, off, ln):
            with self._lock:
                self.calls += 1
            return self._buf[off:off + ln]

    store = CountingStore(raw)
    out = read_parquet_native(store)
    assert np.asarray(out.columns[0].values).sum() == 999 * 500
    # lazy: footer + column chunk ranges, NOT one whole-file read
    assert store.calls >= 2


# ---- RowSelection page-skip pushdown (VERDICT r4 item 7) --------------------
# selection.rs:100 RowSelection + arrow_reader/mod.rs:736 ReadPlan: a
# RowFilter's mask becomes a RowSelection that SKIPS decoding pages
# outside it (offset index driven).

def test_row_filter_page_skip_pushdown():
    import io
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu import compute as ops
    from arrow_tpu.core.datum import Scalar
    from arrow_tpu import dtypes as dtp
    from arrow_tpu.ops.concat import concat_tables
    from arrow_tpu.io.parquet_io import (ParquetReaderBuilder, RowFilter,
                                         WriterProperties, write_parquet)
    from arrow_tpu.io import parquet_native as pn

    rng = np.random.default_rng(0)
    n = 80_000
    t = at.Table.from_pydict({
        "k": np.arange(n),
        "v": rng.integers(0, 10**6, n),
        "s": ["r%d" % (i % 97) for i in range(n)],
    })
    buf = io.BytesIO()
    write_parquet(buf, t, WriterProperties(write_page_index=True,
                                           data_page_size=8_000,
                                           row_group_size=40_000))
    data = buf.getvalue()

    def pred(tbl):
        k = tbl.column("k")
        return ops.and_(ops.gt_eq(k, Scalar(10_000, dtp.int64)),
                        ops.lt(k, Scalar(12_000, dtp.int64)))

    def rd(b):
        ts = list(b.build())
        return concat_tables(ts) if len(ts) > 1 else ts[0]

    pn.PAGES_DECODED[0] = 0
    pn.PAGES_SKIPPED[0] = 0
    got = rd(ParquetReaderBuilder(io.BytesIO(data)).with_row_filter(
        RowFilter(pred, ["k"])).with_batch_size(1_000_000))
    assert got.num_rows == 2_000
    # the selection covers ~2.5% of rows: most non-predicate pages must
    # never decode
    assert pn.PAGES_SKIPPED[0] > 3 * pn.PAGES_DECODED[0], \
        (pn.PAGES_DECODED[0], pn.PAGES_SKIPPED[0])
    # bitwise identical to the decode-everything-then-filter path
    full = rd(ParquetReaderBuilder(io.BytesIO(data))
              .with_row_filter(pred).with_batch_size(1_000_000))
    assert got.to_pydict() == full.to_pydict()
    # schema column order is preserved even though the predicate column
    # decodes separately
    assert got.schema.names == ["k", "v", "s"]


def test_row_filter_pushdown_without_page_index():
    """No offset index -> no skipping, but identical rows."""
    import io
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu import compute as ops
    from arrow_tpu.core.datum import Scalar
    from arrow_tpu import dtypes as dtp
    from arrow_tpu.ops.concat import concat_tables
    from arrow_tpu.io.parquet_io import (ParquetReaderBuilder, RowFilter,
                                         WriterProperties, write_parquet)
    rng = np.random.default_rng(1)
    n = 30_000
    t = at.Table.from_pydict({"k": np.arange(n),
                              "v": rng.integers(0, 100, n)})
    buf = io.BytesIO()
    write_parquet(buf, t, WriterProperties(data_page_size=8_000,
                                           row_group_size=10_000))
    data = buf.getvalue()

    def pred(tbl):
        return ops.lt(tbl.column("k"), Scalar(777, dtp.int64))

    def rd(b):
        ts = list(b.build())
        return concat_tables(ts) if len(ts) > 1 else ts[0]

    got = rd(ParquetReaderBuilder(io.BytesIO(data)).with_row_filter(
        RowFilter(pred, ["k"])))
    full = rd(ParquetReaderBuilder(io.BytesIO(data))
              .with_row_filter(pred))
    assert got.to_pydict() == full.to_pydict()


def test_row_selection_algebra():
    from arrow_tpu.io.parquet_io import RowSelection
    import numpy as np
    a = RowSelection([(0, 10), (8, 20), (30, 40)])
    assert a.intervals == [(0, 20), (30, 40)]
    assert a.row_count() == 30
    b = RowSelection.from_mask(np.array([0, 1, 1, 0, 1], bool))
    assert b.intervals == [(1, 3), (4, 5)]
    assert a.intersection(RowSelection([(15, 35)])).intervals == \
        [(15, 20), (30, 35)]
    assert a.union(RowSelection([(20, 30)])).intervals == [(0, 40)]
    assert RowSelection.from_mask(np.zeros(0, bool)).intervals == []


def test_async_parquet_writer_multipart():
    """AsyncParquetWriter (async_writer/mod.rs role): encode overlaps
    multipart upload; parts reassemble to a readable file."""
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.io.async_writer import AsyncParquetWriter, MemorySink
    from arrow_tpu.io.parquet_io import WriterProperties
    from arrow_tpu.io.parquet_native import ParquetFile
    rng = np.random.default_rng(0)
    t1 = at.Table.from_pydict({"a": rng.integers(0, 100, 50_000),
                               "s": ["x%d" % i for i in range(50_000)]})
    t2 = at.Table.from_pydict({"a": rng.integers(0, 100, 30_000),
                               "s": ["y%d" % i for i in range(30_000)]})
    sink = MemorySink()
    w = AsyncParquetWriter(sink, t1,
                           WriterProperties(row_group_size=20_000),
                           buffer_size=64_000)
    w.write(t1)
    w.write(t2)
    w.close()
    assert sink.completed
    assert len(sink.parts) > 1          # multipart actually happened
    got = ParquetFile(sink.getvalue()).read()
    exp = {"a": (t1.to_pydict()["a"] + t2.to_pydict()["a"]),
           "s": t1.to_pydict()["s"] + t2.to_pydict()["s"]}
    assert got.to_pydict() == exp


def test_with_row_selection_direct():
    """Explicit RowSelection scan (arrow_reader with_row_selection):
    file-relative intervals decode only intersecting pages per group."""
    import io
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.ops.concat import concat_tables
    from arrow_tpu.io.parquet_io import (ParquetReaderBuilder,
                                         RowSelection, WriterProperties,
                                         write_parquet)
    from arrow_tpu.io import parquet_native as pn
    rng = np.random.default_rng(0)
    n = 100_000
    t = at.Table.from_pydict({"k": np.arange(n),
                              "v": rng.integers(0, 100, n)})
    buf = io.BytesIO()
    write_parquet(buf, t, WriterProperties(write_page_index=True,
                                           data_page_size=8_000,
                                           row_group_size=40_000))
    sel = RowSelection([(5, 10), (39_990, 40_020), (99_000, 100_000)])
    pn.PAGES_DECODED[0] = 0
    pn.PAGES_SKIPPED[0] = 0
    ts = list(ParquetReaderBuilder(io.BytesIO(buf.getvalue()))
              .with_row_selection(sel).with_batch_size(10**6).build())
    got = concat_tables(ts) if len(ts) > 1 else ts[0]
    assert got.to_pydict()["k"] == \
        [i for s, e in sel.intervals for i in range(s, e)]
    assert pn.PAGES_SKIPPED[0] > pn.PAGES_DECODED[0]


def test_statistics_converter():
    """StatisticsConverter (arrow_reader/statistics.rs role): row-group
    and page statistics decode into engine columns through the leaf's
    physical type."""
    import io
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import (StatisticsConverter,
                                         WriterProperties, write_parquet)
    rng = np.random.default_rng(0)
    n = 50_000
    t = at.Table.from_pydict({"k": np.arange(n), "f": rng.random(n),
                              "s": ["v%03d" % (i % 50)
                                    for i in range(n)]})
    buf = io.BytesIO()
    write_parquet(buf, t, WriterProperties(write_page_index=True,
                                           data_page_size=8_000,
                                           row_group_size=20_000))
    data = buf.getvalue()
    sc = StatisticsConverter(io.BytesIO(data), "k")
    rg = sc.row_group_statistics().to_pydict()
    assert rg["min"] == [0, 20_000, 40_000]
    assert rg["max"] == [19_999, 39_999, 49_999]
    assert rg["null_count"] == [0, 0, 0]
    ps = sc.page_statistics(0).to_pydict()
    assert ps["min"][0] == 0
    assert all(a < b for a, b in zip(ps["min"], ps["min"][1:]))
    # string column: byte-array stats decode as utf8
    rgs = StatisticsConverter(io.BytesIO(data), "s") \
        .row_group_statistics().to_pydict()
    assert rgs["min"][0] == "v000" and rgs["max"][0] == "v049"


def test_row_selection_relative_to_selected_groups():
    """with_row_groups + with_row_selection: the selection indexes the
    CONCATENATION OF THE SELECTED GROUPS, not the file (arrow-rs
    with_row_selection — 'rows from skipped row groups should not be
    included')."""
    import io
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.ops.concat import concat_tables
    from arrow_tpu.io.parquet_io import (ParquetReaderBuilder,
                                         RowSelection, WriterProperties,
                                         write_parquet)
    n = 120_000
    t = at.Table.from_pydict({"k": np.arange(n)})
    buf = io.BytesIO()
    write_parquet(buf, t, WriterProperties(write_page_index=True,
                                           data_page_size=8_000,
                                           row_group_size=40_000))
    # groups 1 and 2 selected -> selection row 0 is file row 40_000
    sel = RowSelection([(0, 5), (40_000, 40_010)])
    ts = list(ParquetReaderBuilder(io.BytesIO(buf.getvalue()))
              .with_row_groups([1, 2]).with_row_selection(sel)
              .with_batch_size(10**6).build())
    got = concat_tables(ts) if len(ts) > 1 else ts[0]
    assert got.to_pydict()["k"] == \
        list(range(40_000, 40_005)) + list(range(80_000, 80_010))


def test_statistics_logical_type_decode():
    """Stats decode through the LOGICAL type (statistics.rs): uint32/
    uint64 with the high bit set stay unsigned, decimal FLBA blobs
    decode to Decimal (pyarrow-written file as the golden producer)."""
    import io
    from decimal import Decimal
    import pyarrow as pa
    import pyarrow.parquet as pq
    from arrow_tpu.io.parquet_io import StatisticsConverter, read_metadata
    pt = pa.table({
        "u32": pa.array([2**31 + 5, 2**32 - 1, 7], pa.uint32()),
        "u64": pa.array([2**63 + 9, 2**64 - 2, 11], pa.uint64()),
        "dec": pa.array([Decimal("12.34"), Decimal("-0.07"),
                         Decimal("99999.99")], pa.decimal128(10, 2)),
    })
    buf = io.BytesIO()
    pq.write_table(pt, buf)
    data = buf.getvalue()
    rg = StatisticsConverter(io.BytesIO(data), "u32") \
        .row_group_statistics().to_pydict()
    assert rg["min"] == [7] and rg["max"] == [2**32 - 1]
    rg = StatisticsConverter(io.BytesIO(data), "u64") \
        .row_group_statistics().to_pydict()
    assert rg["min"] == [11] and rg["max"] == [2**64 - 2]
    rg = StatisticsConverter(io.BytesIO(data), "dec") \
        .row_group_statistics().to_pydict()
    assert rg["min"] == [Decimal("-0.07")]
    assert rg["max"] == [Decimal("99999.99")]
    md = read_metadata(io.BytesIO(data))
    st = md.column_statistics(0, 1)
    assert st["min"] == 11 and st["max"] == 2**64 - 2


# ---- writer encoding breadth (encodings/encoding/mod.rs:95-102,
# properties.rs:156 set_encoding / set_column_encoding) ----------------------

@pytest.mark.parametrize("enc,colname", [
    ("delta_binary_packed", "i32"),
    ("delta_binary_packed", "i64"),
    ("delta_binary_packed", "u64"),
    ("delta_length_byte_array", "s"),
    ("delta_byte_array", "s"),
    ("byte_stream_split", "f32"),
    ("byte_stream_split", "f64"),
    ("byte_stream_split", "i64"),
])
@pytest.mark.parametrize("version", ["1.0", "2.0"])
def test_writer_encoding_matrix(enc, colname, version):
    """Per-column encoding override round-trips through BOTH our
    reader and pyarrow."""
    import io
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import (ParquetReaderBuilder,
                                         WriterProperties, write_parquet)
    rng = np.random.default_rng(3)
    n = 20_000
    cols = {
        "i32": at.column(np.sort(rng.integers(-10**6, 10**6, n))
                         .astype(np.int32)),
        "i64": at.column(rng.integers(-10**12, 10**12, n)),
        "u64": at.column(rng.integers(0, 2**63, n).astype(np.uint64)
                         + np.uint64(2**63)),
        "f32": at.column(rng.random(n).astype(np.float32)),
        "f64": at.column(rng.random(n)),
        "s": at.column(["key_%06d_%s" % (i // 3, "x" * (i % 5))
                        for i in range(n)]),
    }
    t = at.Table.from_pydict({colname: cols[colname]})
    buf = io.BytesIO()
    write_parquet(buf, t, WriterProperties(
        data_page_version=version, data_page_size=16_000,
        column_properties={colname: {"encoding": enc}}))
    data = buf.getvalue()
    got = next(iter(ParquetReaderBuilder(io.BytesIO(data))
                    .with_batch_size(10**6).build()))
    assert got.to_pydict() == t.to_pydict()
    pt = pq.read_table(io.BytesIO(data))
    if colname == "f32":
        assert np.allclose(pt.column(colname).to_numpy(),
                           np.asarray(t.column(colname).values))
    else:
        assert pt.to_pydict() == t.to_pydict()


def test_writer_default_encoding_and_sizes():
    """A file-level default encoding applies to every column
    (set_encoding), and delta encodings actually SHRINK files:
    sorted ints (DELTA_BINARY_PACKED) and shared-prefix strings
    (DELTA_BYTE_ARRAY) vs PLAIN."""
    import io
    import numpy as np
    import pyarrow.parquet as pq
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import WriterProperties, write_parquet

    def size(t, props):
        buf = io.BytesIO()
        write_parquet(buf, t, props)
        return len(buf.getvalue()), buf.getvalue()

    n = 100_000
    ti = at.Table.from_pydict({"k": np.arange(n) * 7 + 3})
    s_plain, _ = size(ti, WriterProperties(
        compression="none", dictionary_enabled=False, encoding="plain"))
    s_delta, raw = size(ti, WriterProperties(
        compression="none", encoding="delta_binary_packed"))
    assert s_delta < s_plain / 10       # sorted ints pack tiny
    assert pq.read_table(io.BytesIO(raw)).to_pydict() == ti.to_pydict()

    ts = at.Table.from_pydict(
        {"s": at.column(["user/%08d/profile" % (i // 2)
                         for i in range(n)])})
    s_plain, _ = size(ts, WriterProperties(
        compression="none", dictionary_enabled=False))
    s_dba, raw = size(ts, WriterProperties(
        compression="none",
        column_properties={"s": {"encoding": "delta_byte_array"}}))
    assert s_dba < s_plain * 0.55       # shared prefixes compress away
    assert pq.read_table(io.BytesIO(raw)).to_pydict() == ts.to_pydict()

    # incompatible global default raises (arrow-rs errors too)
    import pytest as _pytest
    from arrow_tpu.errors import ArrowNotImplementedError
    with _pytest.raises(ArrowNotImplementedError):
        size(ts, WriterProperties(encoding="delta_binary_packed"))


def test_delta_byte_array_prefix_parity_with_pyarrow():
    """Our prefix-compressed DELTA_BYTE_ARRAY and pyarrow's read of it
    agree on adversarial prefix shapes (empty strings, full-prefix
    repeats, prefix growth/shrink)."""
    import io
    import numpy as np
    import pyarrow.parquet as pq
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import (ParquetReaderBuilder,
                                         WriterProperties, write_parquet)
    vals = ["", "", "a", "a", "ab", "abc", "abc", "abd", "", "xyz",
            "xy", "x", "xx" * 500, "xx" * 500 + "q", "zz", ""]
    t = at.Table.from_pydict({"s": at.column(vals)})
    buf = io.BytesIO()
    write_parquet(buf, t, WriterProperties(
        compression="none",
        column_properties={"s": {"encoding": "delta_byte_array"}}))
    data = buf.getvalue()
    assert pq.read_table(io.BytesIO(data)).to_pydict() == {"s": vals}
    got = next(iter(ParquetReaderBuilder(io.BytesIO(data))
                    .with_batch_size(10**6).build()))
    assert got.to_pydict() == {"s": vals}


def test_dictionary_page_size_limit_fallback():
    """dictionary_page_size_limit (properties.rs:39, default 1 MB):
    a chunk whose dictionary would exceed the limit falls back to the
    value encodings (no dictionary page; column/writer/mod.rs
    fallback), low-cardinality chunks keep the dictionary."""
    import io
    import numpy as np
    import pyarrow.parquet as pq
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import WriterProperties, write_parquet

    def encodings_of(data):
        md = pq.ParquetFile(io.BytesIO(data)).metadata
        return set(md.row_group(0).column(0).encodings)

    # low cardinality: dictionary stays
    n = 30_000
    low = at.Table.from_pydict(
        {"s": at.column(["v%03d" % (i % 100) for i in range(n)])})
    buf = io.BytesIO()
    write_parquet(buf, low, WriterProperties(compression="none"))
    low_data = buf.getvalue()
    assert "RLE_DICTIONARY" in encodings_of(low_data) or \
        "PLAIN_DICTIONARY" in encodings_of(low_data)

    # high cardinality (all-distinct 40-char strings -> dict >1MB):
    # falls back to PLAIN, and the file round-trips
    hi = at.Table.from_pydict(
        {"s": at.column(["row_%036d" % i for i in range(n)])})
    buf = io.BytesIO()
    write_parquet(buf, hi, WriterProperties(compression="none"))
    hi_data = buf.getvalue()
    encs = encodings_of(hi_data)
    assert "RLE_DICTIONARY" not in encs and "PLAIN_DICTIONARY" not in encs
    assert pq.read_table(io.BytesIO(hi_data)).to_pydict() == \
        hi.to_pydict()

    # a tiny custom limit forces the fallback even at low cardinality;
    # a pre-encoded DictionaryColumn materializes on fallback
    from arrow_tpu.ops.strings import dictionary_encode
    pre = at.Table.from_pydict(
        {"s": dictionary_encode(low.column("s"))})
    buf = io.BytesIO()
    write_parquet(buf, pre, WriterProperties(
        compression="none", dictionary_page_size_limit=64))
    tiny = buf.getvalue()
    encs = encodings_of(tiny)
    assert "RLE_DICTIONARY" not in encs and "PLAIN_DICTIONARY" not in encs
    assert pq.read_table(io.BytesIO(tiny)).to_pydict() == \
        low.to_pydict()


def test_nested_leaf_projection():
    """Dotted-path projection (the ProjectionMask::leaves role): only
    the selected struct branches decode and assemble; sibling leaves
    never decode.  List/map subtrees stay whole."""
    import io
    import pyarrow as pa
    import pyarrow.parquet as pq
    import arrow_tpu as at
    from arrow_tpu.io.parquet_native import ParquetFile
    pt = pa.table({
        "a": pa.array([{"x": i, "y": "s%d" % i, "z": float(i)}
                       for i in range(500)]),
        "b": pa.array(range(500)),
        "lst": pa.array([[i, i + 1] for i in range(500)]),
    })
    buf = io.BytesIO()
    pq.write_table(pt, buf)
    f = ParquetFile(buf.getvalue())
    t = f.read_row_group(0, columns=["a.x", "b"])
    assert t.column_names == ["a", "b"]
    a = t.column("a")
    assert [fl.name for fl in a.dtype.fields] == ["x"]
    assert a.to_pylist() == [{"x": i} for i in range(500)]
    assert t.column("b").to_pylist() == list(range(500))
    # two branches of the same struct
    t2 = f.read_row_group(0, columns=["a.z", "a.x"])
    assert [fl.name for fl in t2.column("a").dtype.fields] == ["x", "z"]
    # list columns addressed by name come back whole
    t3 = f.read_row_group(0, columns=["lst"])
    assert t3.column("lst").to_pylist()[:2] == [[0, 1], [1, 2]]
    # nothing-matches path drops the column entirely
    t4 = f.read_row_group(0, columns=["a.nope", "b"])
    assert t4.column_names == ["b"]
    # builder surface takes the dotted names too
    from arrow_tpu.io.parquet_io import ParquetReaderBuilder
    got = next(iter(ParquetReaderBuilder(io.BytesIO(buf.getvalue()))
                    .with_projection(["a.y"]).with_batch_size(10**6)
                    .build()))
    assert got.column("a").to_pylist()[:2] == [{"y": "s0"},
                                               {"y": "s1"}]


def test_write_nested_list_empty_inner():
    """Nested lists whose INNER list column has zero rows (every outer
    slot null or empty) write correctly — offs[sr+1] on the empty
    child's 1-element offsets was an IndexError (found by the r5
    extended fuzz campaign, seed 9068)."""
    import io
    import pyarrow as pa
    import pyarrow.parquet as pq
    import arrow_tpu as at
    from arrow_tpu.io.parquet_writer import write_parquet_native
    from arrow_tpu.io.parquet_native import ParquetFile
    cases = [
        [None, []],                    # inner column: 0 rows
        [None, None],
        [[]],
        [[], None, []],
    ]
    ty = pa.list_(pa.list_(pa.int64()))
    for vals in cases:
        tab = pa.table({"c": pa.array(vals, ty)})
        t = at.Table.from_pyarrow(tab)
        buf = io.BytesIO()
        write_parquet_native(buf, t)
        data = buf.getvalue()
        assert pq.read_table(io.BytesIO(data)).to_pydict() == \
            {"c": vals}, vals
        assert ParquetFile(data).read().column("c").to_pylist() == \
            vals, vals
    # deeper: struct-of-list-of-list with all-empty middles
    ty2 = pa.struct([("x", pa.list_(pa.list_(pa.string())))])
    tab = pa.table({"s": pa.array([{"x": []}, {"x": None}], ty2)})
    t = at.Table.from_pyarrow(tab)
    buf = io.BytesIO()
    write_parquet_native(buf, t)
    assert pq.read_table(io.BytesIO(buf.getvalue())).to_pydict() == \
        tab.to_pydict()
