"""I/O layer tests: IPC file/stream/push-decoder, CSV (+ push decoder),
JSON, Parquet (projection/pushdown/limit), Avro, Flight gRPC roundtrip
(SURVEY.md §4 tier-2: the in-process server fixture pattern)."""

import io as _io
import json
import os
import struct
import tempfile
import zlib

import numpy as np
import pyarrow as pa
import pytest

import arrow_tpu as at
from arrow_tpu.io import avro, csv as acsv, ipc, json_io, parquet_io
from arrow_tpu.utils.bench_util import (create_primitive_array,
                                        create_string_array)


@pytest.fixture
def table():
    return at.Table.from_pyarrow(pa.record_batch({
        "i": create_primitive_array(200, 0.1, np.int64),
        "f": create_primitive_array(200, 0.2, np.float64),
        "s": create_string_array(200, 0.1),
    }))


def _eq(a: at.Table, b: at.Table):
    assert a.to_pydict() == b.to_pydict()


class TestIpc:
    def test_file_roundtrip(self, table, tmp_path):
        p = str(tmp_path / "t.arrow")
        ipc.write_file(p, [table, table.slice(0, 10)])
        back = ipc.read_file(p)
        assert len(back) == 2
        _eq(back[0], table)
        assert back[1].num_rows == 10

    def test_file_compression(self, table, tmp_path):
        p = str(tmp_path / "t.arrow")
        ipc.write_file(p, table, compression="zstd")
        _eq(ipc.read_file(p)[0], table)

    def test_stream_roundtrip(self, table):
        data = ipc.serialize_table(table)
        _eq(ipc.deserialize_table(data), table)

    def test_push_decoder_chunked(self, table):
        data = ipc.serialize_table(table)
        dec = ipc.StreamDecoder()
        for i in range(0, len(data), 13):
            dec.feed(data[i:i + 13])
        got = dec.next_batch()
        assert got is not None
        _eq(got, table)

    def test_push_decoder_dictionary(self):
        td = at.Table.from_pyarrow(pa.record_batch(
            {"d": pa.array(["a", "b", "a", None]).dictionary_encode()}))
        dec = ipc.StreamDecoder()
        dec.feed(ipc.serialize_table(td))
        got = dec.next_batch()
        assert got.to_pydict() == {"d": ["a", "b", "a", None]}

    def test_cross_implementation(self, table, tmp_path):
        """Our file is readable by stock pyarrow and vice versa."""
        p = str(tmp_path / "x.arrow")
        ipc.write_file(p, table)
        with pa.ipc.open_file(p) as r:
            assert r.get_batch(0).num_rows == table.num_rows


class TestCsv:
    def test_roundtrip(self, table, tmp_path):
        p = str(tmp_path / "t.csv")
        acsv.write_csv(p, table.select(["i", "f"]))
        back = acsv.read_csv(p)
        _eq(back, table.select(["i", "f"]))

    def test_schema_inference(self):
        src = "a,b,c\n1,x,1.5\n2,y,2.5\n"
        schema = acsv.infer_schema(src)
        assert [f.dtype for f in schema.fields] == \
            [at.int64, at.utf8, at.float64]

    def test_explicit_schema(self):
        src = "a\n1\n2\n"
        schema = at.Schema((at.Field("a", at.float64),))
        t = acsv.read_csv(src, schema=schema)
        assert t.column("a").dtype == at.float64

    def test_push_decoder(self):
        dec = acsv.ReaderBuilder().build_decoder()
        dec.decode(b"a,b\n1,x\n2,")
        t1 = dec.flush()
        assert t1.to_pydict() == {"a": [1], "b": ["x"]}
        dec.decode(b"y\n3,z\n")
        t2 = dec.flush()
        assert t2.to_pydict() == {"a": [2, 3], "b": ["y", "z"]}


class TestJson:
    def test_read_lines(self):
        src = '{"a": 1, "b": "x"}\n{"a": null, "b": "y"}\n'
        t = json_io.read_json(src)
        assert t.to_pydict() == {"a": [1, None], "b": ["x", "y"]}

    def test_read_objects(self):
        t = json_io.read_json_objects([{"a": 1}, {"a": 2}])
        assert t.to_pydict() == {"a": [1, 2]}

    def test_write_lines(self, table):
        small = table.slice(0, 3)
        s = json_io.WriterBuilder("lines").write_str(small)
        rows = [json.loads(l) for l in s.strip().split("\n")]
        assert len(rows) == 3

    def test_write_array_roundtrip(self):
        t = at.Table.from_pydict({"a": [1, None, 3], "b": ["x", "y", None]})
        s = json_io.WriterBuilder("array", explicit_nulls=True).write_str(t)
        assert json.loads(s) == [{"a": 1, "b": "x"}, {"a": None, "b": "y"},
                                 {"a": 3, "b": None}]


class TestParquet:
    def test_roundtrip(self, table, tmp_path):
        p = str(tmp_path / "t.parquet")
        parquet_io.write_parquet(p, table)
        _eq(parquet_io.read_parquet(p), table)

    def test_projection_and_batches(self, table, tmp_path):
        p = str(tmp_path / "t.parquet")
        parquet_io.write_parquet(p, table)
        batches = list(parquet_io.ParquetReaderBuilder(p)
                       .with_projection(["i"])
                       .with_batch_size(64).build())
        assert all(b.column_names == ["i"] for b in batches)
        assert sum(b.num_rows for b in batches) == table.num_rows

    def test_row_filter_pushdown(self, table, tmp_path):
        from arrow_tpu import compute as ops
        p = str(tmp_path / "t.parquet")
        parquet_io.write_parquet(p, table)
        batches = list(parquet_io.ParquetReaderBuilder(p)
                       .with_row_filter(lambda t: ops.gt(t["i"], 0))
                       .build())
        total = sum(b.num_rows for b in batches)
        exp = sum(1 for v in table.column("i").to_pylist()
                  if v is not None and v > 0)
        assert total == exp

    def test_limit_offset(self, table, tmp_path):
        p = str(tmp_path / "t.parquet")
        parquet_io.write_parquet(p, table)
        got = list(parquet_io.ParquetReaderBuilder(p).with_batch_size(32)
                   .with_offset(10).with_limit(50).build())
        assert sum(b.num_rows for b in got) == 50
        first = got[0].column("i").to_pylist()[0]
        assert first == table.column("i").to_pylist()[10]

    def test_metadata(self, table, tmp_path):
        p = str(tmp_path / "t.parquet")
        parquet_io.write_parquet(p, table)
        md = parquet_io.read_metadata(p)
        assert md.num_rows == table.num_rows


def _avro_bytes(rows, schema_json, codec=b"null"):
    """Hand-rolled avro writer for test fixtures."""
    def zz(n):
        n = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def enc_str(s):
        b = s.encode() if isinstance(s, str) else s
        return zz(len(b)) + b

    def enc_val(v, sch):
        if isinstance(sch, list):
            if v is None:
                return zz(sch.index("null"))
            idx = next(i for i, s in enumerate(sch) if s != "null")
            return zz(idx) + enc_val(v, sch[idx])
        if sch == "long" or sch == "int":
            return zz(v)
        if sch == "double":
            return struct.pack("<d", v)
        if sch == "string":
            return enc_str(v)
        if sch == "boolean":
            return b"\x01" if v else b"\x00"
        raise AssertionError(sch)

    schema = json.loads(schema_json)
    body = b""
    for r in rows:
        if isinstance(r, (bytes, bytearray)):
            body += bytes(r)           # pre-encoded row (nested fixtures)
            continue
        for f in schema["fields"]:
            body += enc_val(r[f["name"]], f["type"])
    if codec == b"deflate":
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    sync = b"S" * 16
    header = b"Obj\x01"
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec}
    header += zz(len(meta))
    for k, v in meta.items():
        header += enc_str(k) + enc_str(v)
    header += zz(0) + sync
    return header + zz(len(rows)) + zz(len(body)) + body + sync


class TestAvro:
    SCHEMA = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"},
            {"name": "x", "type": "double"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "ok", "type": "boolean"},
        ]})
    ROWS = [{"id": 1, "x": 1.5, "s": "a", "ok": True},
            {"id": -2, "x": -0.25, "s": None, "ok": False},
            {"id": 3, "x": 2.0, "s": "ccc", "ok": True}]

    def test_read(self):
        t = avro.read_avro(_avro_bytes(self.ROWS, self.SCHEMA))
        assert t.to_pydict() == {
            "id": [1, -2, 3], "x": [1.5, -0.25, 2.0],
            "s": ["a", None, "ccc"], "ok": [True, False, True]}

    def test_deflate(self):
        t = avro.read_avro(_avro_bytes(self.ROWS, self.SCHEMA,
                                       codec=b"deflate"))
        assert t.num_rows == 3

    def test_reader_builder_batches(self):
        t = avro.ReaderBuilder(batch_size=2).build(
            _avro_bytes(self.ROWS, self.SCHEMA))
        assert [b.num_rows for b in t] == [2, 1]


class TestFlight:
    def test_do_get_do_put_exchange(self, table):
        from arrow_tpu.io.flight import FlightServer, FlightTableClient
        from arrow_tpu import compute as ops
        server = FlightServer(
            exchange_fn=lambda t: at.Table(
                (ops.add(t["i"], at.scalar(1)),),
                at.Schema((at.Field("i", at.int64),))))
        server.register("t0", table)
        client = FlightTableClient(server.uri)
        try:
            assert "t0" in client.list_flights()
            got = client.do_get("t0")
            _eq(got, table)
            client.do_put("up", table.slice(0, 50))
            _eq(server.get_table("up"), table.slice(0, 50))
            small = at.Table.from_pydict({"i": [1, 2, None]})
            outs = client.do_exchange("x", small)
            assert outs[0].to_pydict() == {"i": [2, 3, None]}
        finally:
            client.close()
            server.shutdown()


def test_parquet_page_index_and_sorting(tmp_path, rng):
    import pyarrow.parquet as pq
    import arrow_tpu as at
    from arrow_tpu.io.parquet_io import (write_parquet, WriterProperties,
                                         read_parquet)
    n = 1000
    t = at.Table.from_pydict({
        "k": at.column(np.sort(rng.integers(0, 100, n)).astype(np.int64)),
        "v": at.column(rng.random(n)),
    })
    path = str(tmp_path / "pi.parquet")
    write_parquet(path, t, WriterProperties(
        write_page_index=True, write_page_checksum=True,
        sorting_columns=(("k", False),)))
    md = pq.read_metadata(path)
    rg = md.row_group(0)
    assert rg.sorting_columns and rg.sorting_columns[0].column_index == 0
    assert rg.column(0).has_offset_index           # page index written
    assert read_parquet(path).num_rows == n


class TestAvroNested:
    """r2 avro completeness: nested types, snappy, schema resolution
    (arrow-avro codec.rs / reader/block.rs parity)."""

    def _container(self, schema_json, encoded_rows, codec=b"null"):
        return _avro_bytes(encoded_rows, schema_json, codec)

    def test_nested_array_map_record(self):
        import json as _json
        schema = {
            "type": "record", "name": "r", "fields": [
                {"name": "arr", "type": {"type": "array",
                                         "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "long"}},
                {"name": "rec", "type": {"type": "record", "name": "in",
                                         "fields": [
                                             {"name": "u", "type": "long"},
                                             {"name": "s",
                                              "type": "string"}]}},
                {"name": "fx", "type": {"type": "fixed", "name": "f4",
                                        "size": 4}},
            ]}

        def zz(n):
            n = (n << 1) ^ (n >> 63)
            out = bytearray()
            while True:
                b = n & 0x7F
                n >>= 7
                if n:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    return bytes(out)

        def s(x):
            b = x.encode() if isinstance(x, str) else x
            return zz(len(b)) + b

        row = (zz(2) + zz(10) + zz(20) + zz(0)        # arr [10, 20]
               + zz(1) + s("k") + zz(7) + zz(0)       # map {k: 7}
               + zz(5) + s("hi")                       # rec {u:5, s:hi}
               + b"ABCD")                              # fixed
        data = self._container(_json.dumps(schema), [row])
        t = avro.read_avro(data)
        assert t.column("arr").to_pylist() == [[10, 20]]
        assert t.column("m").to_pylist() == [[("k", 7)]]
        assert t.column("rec").to_pylist() == [{"u": 5, "s": "hi"}]
        assert t.column("fx").to_pylist() == [b"ABCD"]

    def test_snappy_codec(self):
        import json as _json
        import zlib as _zlib
        from arrow_tpu.utils import native as nt
        if not nt.available():
            pytest.skip("no native lib")
        schema = {"type": "record", "name": "r",
                  "fields": [{"name": "v", "type": "long"}]}

        def zz(n):
            n = (n << 1) ^ (n >> 63)
            out = bytearray()
            while True:
                b = n & 0x7F
                n >>= 7
                if n:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    return bytes(out)

        rows = [zz(i * 3) for i in range(100)]
        raw = b"".join(rows)
        comp = nt.snappy_compress(raw) + \
            __import__("struct").pack(">I", _zlib.crc32(raw) & 0xFFFFFFFF)
        # hand-build container with snappy codec
        import struct as _struct
        meta = {b"avro.schema": _json.dumps(schema).encode(),
                b"avro.codec": b"snappy"}
        out = bytearray(b"Obj\x01")
        out += zz(len(meta))
        for k, v in meta.items():
            out += zz(len(k)) + k + zz(len(v)) + v
        out += zz(0)
        sync = b"S" * 16
        out += sync
        out += zz(100) + zz(len(comp)) + comp + sync
        t = avro.read_avro(bytes(out))
        assert t.column("v").to_pylist() == [i * 3 for i in range(100)]

    def test_schema_resolution_defaults_and_promotion(self):
        import json as _json
        writer = {"type": "record", "name": "r",
                  "fields": [{"name": "a", "type": "int"},
                             {"name": "drop", "type": "long"}]}

        def zz(n):
            n = (n << 1) ^ (n >> 63)
            out = bytearray()
            while True:
                b = n & 0x7F
                n >>= 7
                if n:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    return bytes(out)

        rows = [zz(5) + zz(100), zz(-3) + zz(200)]
        data = self._container(_json.dumps(writer), rows)
        reader = {"type": "record", "name": "r",
                  "fields": [{"name": "a", "type": "double"},
                             {"name": "extra", "type": "long",
                              "default": 42}]}
        t = avro.read_avro(data, reader_schema=reader)
        assert t.column("a").to_pylist() == [5.0, -3.0]
        assert t.column("a").dtype.name == "float64"
        assert t.column("extra").to_pylist() == [42, 42]
        assert "drop" not in t.column_names


def test_avro_decimal_duration_local_ts():
    """codec.rs:215 Decimal, :228 Duration(fixed 12)->Interval(MDN),
    local-timestamp logical types."""
    import decimal
    schema_json = json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "dec", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 10, "scale": 2}},
            {"name": "dur", "type": {"type": "fixed", "name": "dur12",
                                     "size": 12,
                                     "logicalType": "duration"}},
            {"name": "lts", "type": {"type": "long",
                                     "logicalType":
                                     "local-timestamp-micros"}},
        ]})

    def zz(n):
        n = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def enc_dec(unscaled):
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        b = unscaled.to_bytes(nbytes, "big", signed=True)
        return zz(len(b)) + b

    rows = [
        enc_dec(12345) + struct.pack("<III", 1, 2, 3000) + zz(1_000_000),
        enc_dec(-100) + struct.pack("<III", 0, 10, 0) + zz(-5),
    ]
    t = avro.read_avro(_avro_bytes(rows, schema_json))
    assert t.column("dec").dtype.name == "decimal128"
    assert t.column("dec").to_pylist() == [decimal.Decimal("123.45"),
                                           decimal.Decimal("-1.00")]
    assert t.column("dur").dtype.name == "interval"
    d0 = t.column("dur").to_pylist()[0]
    assert (d0.months, d0.days, d0.nanoseconds) == (1, 2, 3_000_000_000)
    assert t.column("lts").dtype.name == "timestamp"
    assert np.asarray(t.column("lts").values).tolist() == [1_000_000, -5]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_avro_writer_roundtrip(codec):
    """write_avro (beyond the reference — arrow-avro is decode-only):
    object container files our reader and spec-compliant readers
    consume; all three codecs."""
    import io as _io
    from arrow_tpu.io.avro import read_avro, write_avro
    from arrow_tpu.ops.cast import cast
    pt = pa.table({
        "i": pa.array([1, None, 3]),
        "f": pa.array([1.5, 2.5, None]),
        "s": pa.array(["a", None, "ccc"]),
        "b": pa.array([b"x", b"yy", None], pa.binary()),
        "ok": pa.array([True, False, None]),
        "lst": pa.array([[1, 2], None, []], pa.list_(pa.int64())),
        "st": pa.array([{"p": 1, "q": "u"}, None, {"p": 3, "q": None}]),
        "m": pa.array([[("k1", 7)], None, []],
                      pa.map_(pa.string(), pa.int64())),
        "d32": pa.array([1, 2, 3], pa.int32()).cast(pa.date32()),
        "ts": pa.array([10**15, 5, -3], pa.int64())
            .cast(pa.timestamp("us")),
        "mdn": pa.array([(1, 2, 3_000_000), None, (0, 0, 0)],
                        pa.month_day_nano_interval()),
    })
    t = at.Table.from_pyarrow(pt)
    t = t.append_column("dec", cast(at.column([123, -45, 0]),
                                    at.dtypes.decimal128(10, 2)))
    buf = _io.BytesIO()
    write_avro(buf, t, codec=codec)
    back = read_avro(buf.getvalue())
    for name in t.column_names:
        a = t.column(name).to_pylist()
        b = back.column(name).to_pylist()
        if name == "m":
            a = [None if x is None else list(x) for x in a]
            b = [None if x is None else list(x) for x in b]
        assert a == b, (codec, name)


def test_avro_writer_multi_block():
    import io as _io
    from arrow_tpu.io.avro import read_avro, write_avro
    n = 10_000
    t = at.Table.from_pydict({"x": list(range(n)),
                              "s": [f"v{i % 100}" for i in range(n)]})
    buf = _io.BytesIO()
    write_avro(buf, t, codec="deflate", block_rows=1000)
    back = read_avro(buf.getvalue())
    assert back.column("x").to_pylist() == list(range(n))
    assert back.column("s").to_pylist()[:3] == ["v0", "v1", "v2"]


def test_avro_writer_ns_timestamp_exact():
    """timestamp[ns] writes as timestamp-nanos with full precision
    (pandas Timestamp pylist values carry exact ns via .value)."""
    import io as _io
    from arrow_tpu.io.avro import read_avro, write_avro
    t = at.Table.from_pydict({
        "ts": at.column(np.array([10**18, -5], np.int64),
                        dtype=at.timestamp("ns"))})
    buf = _io.BytesIO()
    write_avro(buf, t)
    back = read_avro(buf.getvalue())
    assert str(back.schema.fields[0].dtype) == "timestamp[ns]"
    assert back.column("ts").to_pylist() == t.column("ts").to_pylist()


def test_malformed_inputs_raise_arrow_errors():
    """Corrupt/truncated container bytes raise ArrowError (the
    reference's ParseError role) — never raw struct.error/KeyError/
    AttributeError (fuzzed with random byte flips; deterministic
    samples pinned here)."""
    import io as _io
    from arrow_tpu.io import parquet_io
    from arrow_tpu.io.ipc import serialize_table, deserialize_table
    from arrow_tpu.io.avro import read_avro, write_avro
    t = at.Table.from_pydict({"a": list(range(50)),
                              "s": [f"v{i}" for i in range(50)]})
    from arrow_tpu.io.json_io import read_json, write_json
    p = serialize_table(t)
    pqb = _io.BytesIO()
    parquet_io.write_parquet(pqb, t)
    ab = _io.BytesIO()
    write_avro(ab, t)
    jb = _io.BytesIO()
    write_json(jb, t)
    rng = np.random.default_rng(1)
    for blob, reader in [
            (p, deserialize_table),
            (pqb.getvalue(),
             lambda b: parquet_io.read_parquet(_io.BytesIO(b))),
            (ab.getvalue(), read_avro),
            (jb.getvalue(), lambda b: read_json(_io.BytesIO(b)))]:
        for _ in range(40):
            b = bytearray(blob)
            for _ in range(4):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            try:
                reader(bytes(b))
            except at.ArrowError:
                pass                     # the only acceptable failure
        with pytest.raises(at.ArrowError):
            reader(blob[: len(blob) // 3])


def test_avro_columnar_matches_per_row(monkeypatch):
    """The native columnar decoder (hostcodec avro_decode_block +
    vectorized assembly) must engage for vanilla schemas and produce
    exactly what the per-row fallback produces — including nested
    list/struct/map, enums-as-dictionary nulls, and union validity."""
    import io as _io
    from arrow_tpu.io import avro as av
    rng = np.random.default_rng(11)
    n = 5_000
    ints = rng.integers(0, 10**6, n)
    pt = pa.table({
        "i": pa.array([int(x) if x % 7 else None for x in ints],
                      pa.int64()),
        "f": pa.array(rng.random(n), pa.float32()),
        "s": pa.array([f"v{x % 97}" if x % 5 else None for x in ints]),
        "l": pa.array([[int(y) for y in rng.integers(0, 9, x % 4)]
                       if x % 6 else None for x in ints],
                      pa.list_(pa.int64())),
        "st": pa.array([{"a": int(x), "b": f"w{x % 10}"} if x % 3
                        else None for x in ints],
                       pa.struct([("a", pa.int64()),
                                  ("b", pa.string())])),
        "m": pa.array([[(f"k{x % 3}", int(x))] if x % 4 else None
                       for x in ints], pa.map_(pa.string(), pa.int64())),
    })
    t = at.Table.from_pyarrow(pt)
    buf = _io.BytesIO()
    av.write_avro(buf, t, codec="deflate")
    data = buf.getvalue()

    hits = []
    orig = av._read_columnar

    def spy(*a, **k):
        r = orig(*a, **k)
        hits.append(r is not None)
        return r

    monkeypatch.setattr(av, "_read_columnar", spy)
    fast = av.read_avro(data)
    assert hits == [True], "columnar path must engage for this schema"
    monkeypatch.setattr(av, "_read_columnar", lambda *a, **k: None)
    slow = av.read_avro(data)
    for name in fast.column_names:
        a = fast.column(name).to_pylist()
        b = slow.column(name).to_pylist()
        if name == "m":
            a = [None if x is None else list(x) for x in a]
            b = [None if x is None else list(x) for x in b]
        assert a == b, name


def test_async_writer_sink_error_no_deadlock():
    """A failing sink must surface through close() instead of
    deadlocking the bounded upload queue (uploader drains after
    recording the error)."""
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.errors import ArrowInvalid
    from arrow_tpu.io.async_writer import AsyncParquetWriter, ObjectStoreSink

    class FailSink(ObjectStoreSink):
        def __init__(self):
            self.aborted = False

        def put_part(self, data):
            raise OSError("upload rejected")

        def abort(self):
            self.aborted = True

    t = at.Table.from_pydict({"x": np.arange(50_000, dtype=np.int64)})
    sink = FailSink()
    w = AsyncParquetWriter(sink, t, buffer_size=1)
    import pytest
    with pytest.raises(ArrowInvalid, match="upload rejected"):
        for _ in range(8):             # enough parts to overfill maxsize=4
            w.write(t)
        w.close()
    assert sink.aborted


def test_avro_codec_matrix():
    """All six container codecs round-trip (compression.rs:35-106:
    null/deflate/snappy/zstandard/bzip2/xz — the r5 codec-breadth
    item); compressed files are actually smaller."""
    import io
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.io.avro import read_avro, write_avro
    rng = np.random.default_rng(5)
    n = 5_000
    t = at.Table.from_pydict({
        "k": at.column(rng.integers(0, 50, n)),
        "s": at.column(["repeat_%d" % (i % 20) for i in range(n)]),
        "f": at.column(rng.random(n)),
    })
    sizes = {}
    for codec in ("null", "deflate", "snappy", "zstandard", "bzip2",
                  "xz"):
        buf = io.BytesIO()
        write_avro(buf, t, codec=codec)
        data = buf.getvalue()
        sizes[codec] = len(data)
        got = read_avro(io.BytesIO(data))
        assert got.to_pydict() == t.to_pydict(), codec
    for codec in ("deflate", "zstandard", "bzip2", "xz"):
        assert sizes[codec] < sizes["null"] * 0.7, (codec, sizes)
