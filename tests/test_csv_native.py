"""Native CSV engine (arrow-csv/src/reader/mod.rs:555 typed-parser
parity; pyarrow.csv is the oracle where semantics align)."""

import io
import time

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import pytest

import arrow_tpu as at
from arrow_tpu.io import csv as acsv
from arrow_tpu.errors import ArrowInvalid


def test_quotes_escapes_crlf():
    src = ('a,b,c\r\n'
           '"x,1","say ""hi""",3\r\n'
           'plain,"multi\nline",-7\r\n')
    t = acsv.read_csv(src)
    assert t.column("a").to_pylist() == ["x,1", "plain"]
    assert t.column("b").to_pylist() == ['say "hi"', "multi\nline"]
    assert t.column("c").to_pylist() == [3, -7]


def test_inference_matrix():
    src = ("b,i,f,d,ts,s\n"
           "true,1,1.5,2021-01-01,2021-01-01T00:00:01.5,hey\n"
           "false,-2,2e3,1999-12-31,2021-06-01 12:30:00,ho\n"
           ",,,,,\n")
    schema = acsv.infer_schema(src)
    names = [f.dtype.name for f in schema.fields]
    assert names == ["bool", "int64", "float64", "date32", "timestamp",
                     "utf8"]
    t = acsv.read_csv(src)
    assert t.column("b").to_pylist() == [True, False, None]
    assert t.column("i").to_pylist() == [1, -2, None]
    assert t.column("f").to_pylist() == [1.5, 2000.0, None]
    ref = pacsv.read_csv(io.BytesIO(src.encode()))
    assert t.column("d").to_pylist() == ref["d"].to_pylist()
    assert [v.replace(tzinfo=None) if v else None
            for v in t.column("ts").to_pylist()] == \
        [v for v in ref["ts"].to_pylist()]
    # strings: empty field stays "" (reference reads empty utf8, not null)
    assert t.column("s").to_pylist() == ["hey", "ho", ""]


def test_explicit_schema_and_int_widths():
    src = "x,y\n1,250\n-3,12\n"
    schema = at.Schema((at.Field("x", at.int16), at.Field("y", at.uint8)))
    t = acsv.read_csv(src, schema=schema)
    assert t.column("x").dtype == at.int16
    assert t.column("y").dtype == at.uint8
    assert t.column("y").to_pylist() == [250, 12]


def test_ragged_raises():
    with pytest.raises(ArrowInvalid):
        acsv.read_csv("a,b\n1,2\n3\n")


def test_overflow_rejected_in_inference():
    # > i64 max falls back to float64
    src = "v\n99999999999999999999\n1\n"
    schema = acsv.infer_schema(src)
    assert schema.fields[0].dtype == at.float64


def test_write_read_roundtrip_with_quoting():
    t = at.Table.from_pydict({
        "s": ["plain", 'q"uote', "com,ma", None, "nl\nin"],
        "v": np.array([1, 2, 3, 4, 5], np.int64),
    })
    buf = io.BytesIO()
    acsv.write_csv(buf, t)
    back = acsv.read_csv(buf.getvalue())
    # nulls write as empty -> read back as "" for strings
    exp = ["plain", 'q"uote', "com,ma", "", "nl\nin"]
    assert back.column("s").to_pylist() == exp
    assert back.column("v").to_pylist() == [1, 2, 3, 4, 5]
    # pyarrow can read our output too
    ref = pacsv.read_csv(io.BytesIO(buf.getvalue()))
    assert ref["v"].to_pylist() == [1, 2, 3, 4, 5]


def test_push_decoder_chunks():
    src = "a,b\n" + "".join(f"{i},w{i}\n" for i in range(100))
    dec = acsv.ReaderBuilder().build_decoder()
    out_rows = 0
    data = src.encode()
    for i in range(0, len(data), 17):
        dec.decode(data[i:i + 17])
        t = dec.flush()
        if t is not None:
            out_rows += t.num_rows
    assert out_rows == 100


def test_speed_1M_rows():
    n = 1_000_000
    rng = np.random.default_rng(0)
    vals = rng.integers(-10**9, 10**9, n)
    fs = rng.random(n)
    src = ("a,b\n" + "\n".join(f"{a},{b:.6f}"
                               for a, b in zip(vals, fs)) + "\n").encode()
    t0 = time.time()
    t = acsv.read_csv(src)
    dt_s = time.time() - t0
    assert t.num_rows == n
    assert np.array_equal(np.asarray(t.column("a").values), vals)
    assert dt_s < 10.0, f"1M-row CSV parse took {dt_s:.1f}s"


def test_projection():
    """reader/mod.rs with_projection: only selected columns parse."""
    from arrow_tpu.io.csv import ReaderBuilder, read_csv
    data = b"a,b,c\n1,x,0.5\n2,y,1.5\n"
    t = read_csv(data, projection=["c", "a"])
    assert t.schema.names == ["c", "a"]
    assert t.to_pydict() == {"c": [0.5, 1.5], "a": [1, 2]}
    t2 = ReaderBuilder(projection=[1]).build(data)[0]
    assert t2.to_pydict() == {"b": ["x", "y"]}


def test_custom_delimiter_write_quotes_and_header_unescape():
    """writer.rs: quoting keys off the WRITER's delimiter, not ','; and
    quoted headers with doubled quotes unescape (reader/mod.rs)."""
    import io
    from arrow_tpu.io.csv import WriterBuilder, read_csv
    t = read_csv(b"a,b\nx;y,2\nplain,3\n")
    buf = io.BytesIO()
    WriterBuilder(delimiter=";").write(buf, t)
    assert buf.getvalue() == b'a;b\n"x;y";2\nplain;3\n'
    rt = read_csv(buf.getvalue(), delimiter=";")
    assert rt.to_pydict() == t.to_pydict()
    t2 = read_csv(b'"he""llo",x\n1,2\n')
    assert t2.column_names == ['he"llo', 'x']


def test_timestamp_date_cells_match_numpy_iso():
    """C civil-calendar formatter == np.datetime64 ISO text across
    units (plus ISO 4-digit year padding, which numpy drops)."""
    import io
    from arrow_tpu.io.csv import write_csv
    rng = np.random.default_rng(7)
    scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}
    for unit in ("s", "ms", "us", "ns"):
        lim = min(250_000 * 366 * 86400 * scale[unit], 2**62)
        vals = rng.integers(-lim, lim, 500)
        vals = np.where(vals < -62135596800 * scale[unit], -vals, vals)
        tt = at.Table((at.column(vals, dtype=at.timestamp(unit)),),
                      at.Schema((at.Field("t", at.timestamp(unit)),)))
        b = io.BytesIO()
        write_csv(b, tt)
        got = b.getvalue().decode().strip().split("\n")[1:]
        assert got == vals.astype(f"datetime64[{unit}]") \
            .astype("U").tolist(), unit
    d = rng.integers(-719162, 10**6, 500).astype(np.int32)  # year >= 1
    tt = at.Table((at.column(d, dtype=at.date32),),
                  at.Schema((at.Field("d", at.date32),)))
    b = io.BytesIO()
    write_csv(b, tt)
    assert b.getvalue().decode().strip().split("\n")[1:] == \
        d.astype("datetime64[D]").astype("U").tolist()
    # ISO 8601 keeps >=4 year digits for negative years
    tt = at.Table((at.column(np.array([-87695305876000], np.int64),
                             dtype=at.timestamp("ms")),),
                  at.Schema((at.Field("t", at.timestamp("ms")),)))
    b = io.BytesIO()
    write_csv(b, tt)
    assert b.getvalue() == b"t\n-0809-01-18T00:48:44.000\n"
