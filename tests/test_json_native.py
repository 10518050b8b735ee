"""Native JSON tape reader (arrow-json/src/reader/tape.rs re-design);
pyarrow.json is the oracle where semantics align."""

import io
import json
import time

import numpy as np
import pyarrow as pa
import pyarrow.json as pajson
import pytest

import arrow_tpu as at
from arrow_tpu.io import json_io
from arrow_tpu.errors import ArrowInvalid


def test_scalars_and_nulls():
    src = ('{"i": 1, "f": 1.5, "b": true, "s": "hey"}\n'
           '{"i": null, "f": 2e3, "b": false, "s": "a\\"b\\u00e9"}\n'
           '{"f": -0.25, "b": null, "s": null}\n')
    t = json_io.read_json(src)
    assert t.column("i").to_pylist() == [1, None, None]
    assert t.column("f").to_pylist() == [1.5, 2000.0, -0.25]
    assert t.column("b").to_pylist() == [True, False, None]
    assert t.column("s").to_pylist() == ["hey", 'a"bé', None]


def test_matches_pyarrow_inference():
    rows = [{"x": i, "y": f"w{i % 5}", "z": i / 3} for i in range(100)]
    rows[7] = {"x": None, "y": None, "z": None}
    src = "\n".join(json.dumps(r) for r in rows)
    t = json_io.read_json(src)
    ref = pajson.read_json(io.BytesIO(src.encode()))
    for name in ("x", "y", "z"):
        assert t.column(name).to_pylist() == ref[name].to_pylist(), name


def test_nested_struct_and_list():
    src = ('{"o": {"a": 1, "b": "x"}, "l": [1, 2, 3]}\n'
           '{"o": null, "l": []}\n'
           '{"o": {"a": null, "b": "z"}, "l": null}\n'
           '{"o": {"b": "w"}, "l": [7]}\n')
    t = json_io.read_json(src)
    assert t.column("o").to_pylist() == [
        {"a": 1, "b": "x"}, None, {"a": None, "b": "z"},
        {"a": None, "b": "w"}]
    assert t.column("l").to_pylist() == [[1, 2, 3], [], None, [7]]


def test_list_of_struct():
    src = ('{"ls": [{"v": 1}, {"v": 2}]}\n'
           '{"ls": []}\n')
    t = json_io.read_json(src)
    assert t.column("ls").to_pylist() == [[{"v": 1}, {"v": 2}], []]


def test_timestamps_via_schema():
    # inference keeps strings (arrow-rs infer_json_schema); an explicit
    # schema converts through cast's utf8->timestamp parser
    src = ('{"ts": "2021-01-01T00:00:01"}\n'
           '{"ts": "2022-06-15 12:30:00.250"}\n')
    t = json_io.read_json(src)
    assert t.column("ts").dtype.name == "utf8"
    schema = at.Schema((at.Field("ts", at.timestamp("us")),))
    t2 = json_io.read_json(src, schema=schema)
    assert t2.column("ts").dtype.name == "timestamp"
    import datetime
    assert t2.column("ts").to_pylist()[0] == \
        datetime.datetime(2021, 1, 1, 0, 0, 1)


def test_json_array_form_and_schema_cast():
    src = '[{"a": 1}, {"a": 2}]'
    schema = at.Schema((at.Field("a", at.float32),))
    t = json_io.read_json(src, schema=schema)
    assert t.column("a").dtype == at.float32
    assert t.column("a").to_pylist() == [1.0, 2.0]


def test_writer_roundtrip():
    t = at.Table.from_pydict({"a": np.arange(5), "s": ["x", "y", "z",
                                                       None, "w"]})
    out = json_io.WriterBuilder("lines").write_str(t)
    back = json_io.read_json(out)
    assert back.column("a").to_pylist() == list(range(5))
    assert back.column("s").to_pylist() == ["x", "y", "z", None, "w"]


def test_malformed_raises():
    with pytest.raises(Exception):
        json_io.read_json('{"a": }')


def test_read_json_objects_native():
    t = json_io.read_json_objects([{"k": 1}, {"k": 2, "m": "x"}])
    assert t.column("k").to_pylist() == [1, 2]
    assert t.column("m").to_pylist() == [None, "x"]


def test_speed_200k_rows():
    rows = "\n".join(
        f'{{"a": {i}, "b": "w{i % 50}", "c": {i / 7:.4f}}}'
        for i in range(200_000))
    t0 = time.time()
    t = json_io.read_json(rows)
    dt_s = time.time() - t0
    assert t.num_rows == 200_000
    assert dt_s < 10.0, f"200k-row JSON parse took {dt_s:.1f}s"


def test_writer_binary_decimal_temporal():
    """encoder.rs arms: hex binary, numeric decimals, ISO temporals,
    nested values handled recursively."""
    import decimal
    import json as _json
    from arrow_tpu.io.json_io import WriterBuilder
    t = at.Table.from_pydict({
        "ts": at.column([1_700_000_000_000_000, None],
                        at.dtypes.timestamp("us")),
        "dec": at.column([decimal.Decimal("1.25"), None],
                         at.dtypes.decimal128(5, 2)),
        "b": at.column([b"\x01\xff", None], at.dtypes.binary),
        "lb": at.column([[b"\x02"], None],
                        at.dtypes.list_(at.dtypes.binary)),
        "m": at.column([[("k", 1)], None],
                       at.dtypes.map_(at.utf8, at.int64)),
    })
    lines = WriterBuilder().write_str(t).strip().split("\n")
    r0 = _json.loads(lines[0])
    assert r0["b"] == "01ff"
    assert r0["lb"] == ["02"]
    assert r0["dec"] == 1.25
    assert r0["ts"].startswith("2023-11-14T22:13:20")
    assert r0["m"] == {"k": 1}
    assert _json.loads(lines[1]) == {}     # implicit nulls drop keys


def test_json_writer_empty_map_renders_object():
    """MapEncoder always writes an object (encoder.rs:755): an empty map
    cell is {}, not [] — dtype-aware cell rendering."""
    from arrow_tpu.io.interop import column_from_pyarrow
    from arrow_tpu.io.json_io import WriterBuilder
    m = pa.array([[], [("a", 1)], None], pa.map_(pa.string(), pa.int64()))
    cm = column_from_pyarrow(m)
    t = at.Table((cm,), at.dtypes.Schema((at.dtypes.Field("m", cm.dtype),)))
    lines = WriterBuilder("lines").write_str(t).strip().split("\n")
    assert lines == ['{"m": {}}', '{"m": {"a": 1}}', '{}']


def test_schema_drives_output():
    """reader/mod.rs:298: the schema builds the decoder tree — missing
    fields decode as nulls, unknown data keys are ignored (non-strict),
    column order follows the schema."""
    src = '{"b": 1, "x": 9}\n{"b": 2}\n'
    schema = at.Schema((at.Field("a", at.int32), at.Field("b", at.int64)))
    t = json_io.read_json(src, schema=schema)
    assert t.column_names == ["a", "b"]
    assert t.column("a").dtype == at.int32
    assert t.column("a").to_pylist() == [None, None]
    assert t.column("b").to_pylist() == [1, 2]


def test_vectorized_lines_writer_matches_slow_path():
    """The S-matrix fast path and the per-row path agree (escapes,
    omitted nulls, NaN->omitted, bool casing, explicit nulls)."""
    import json as js
    t = at.Table.from_pydict({
        "i": [1, None, 3],
        "f": [0.5, float("nan"), 2.5e-8],
        "b": [True, False, None],
        "s": ['pl"ai\n', "x", None],
    })
    out = json_io.WriterBuilder("lines").write_str(t)
    rows = [js.loads(ln) for ln in out.strip().split("\n")]
    assert rows == [{"i": 1, "f": 0.5, "b": True, "s": 'pl"ai\n'},
                    {"b": False, "s": "x"},
                    {"i": 3, "f": 2.5e-8}]
    out2 = json_io.WriterBuilder("lines", explicit_nulls=True) \
        .write_str(t)
    rows2 = [js.loads(ln) for ln in out2.strip().split("\n")]
    assert rows2[1] == {"i": None, "f": None, "b": False, "s": "x"}


def test_vectorized_temporal_fragments():
    """Timestamp/date cells in the lines fast path use the reference's
    unit-width ISO text (encoder.rs: 2018-11-13T17:11:10.011375)."""
    import json as js
    t = at.Table(
        (at.column([1542129070011375, None], dtype=at.timestamp("us")),
         at.column([17848, None], dtype=at.date32)),
        at.Schema((at.Field("ts", at.timestamp("us")),
                   at.Field("d", at.date32))))
    s = json_io.WriterBuilder("lines").write_str(t)
    rows = [js.loads(ln) for ln in s.strip().split("\n")]
    assert rows[0] == {"ts": "2018-11-13T17:11:10.011375",
                       "d": "2018-11-13"}
    assert rows[1] == {}
