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
