"""Arrow integration-test JSON format (arrow-integration-test crate
parity): round-trips, a hand-written golden snippet, union/dictionary
encoding, and the arrow-json-integration-test CLI modes over native IPC."""

import decimal
import json
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu import dtypes as dt
from arrow_tpu.io import integration_json as ij


def rich_table():
    return at.Table.from_pydict({
        "i64": [1, None, -5],
        "i8": at.column([1, 2, None], dt.int8),
        "u64": at.column([1, None, 2 ** 63], dt.uint64),
        "f64": [1.5, None, 2.0],
        "f16": at.column([0.5, None, 1.0], dt.float16),
        "s": ["a", None, "bcd"],
        "ls": at.column(["x", None, "yy"], dt.large_utf8),
        "b": at.column([b"\x01\x02", None, b""], dt.binary),
        "bool": [True, None, False],
        "ts": at.column([10 ** 6, None, 5], dt.timestamp("us", "UTC")),
        "dur": at.column([7, None, 8], dt.duration("ns")),
        "d32": at.column([100, None, 200], dt.date32),
        "t64": at.column([3600000000, None, 1], dt.time64("us")),
        "d128": at.column([decimal.Decimal("1.25"), None,
                           decimal.Decimal("-3.50")], dt.decimal128(10, 2)),
        "d256": at.column([decimal.Decimal("1.00001"), None,
                           decimal.Decimal("-2.00002")],
                          dt.decimal256(50, 5)),
        "lst": at.column([[1, 2], None, [3]], dt.list_(dt.int64)),
        "st": at.column([{"x": 1, "y": "a"}, None, {"x": 2, "y": "b"}],
                        dt.struct([dt.Field("x", dt.int64),
                                   dt.Field("y", dt.utf8)])),
        "dct": at.compute.dictionary_encode(at.column(["p", None, "p"])),
        "mdn": at.column([(1, 2, 3), None, (4, 5, 6)],
                         dt.interval("month_day_nano")),
        "fsb": at.column([b"abcd", None, b"wxyz"], dt.fixed_size_binary(4)),
        "map": at.column([[("k", 1)], None, [("j", 2)]],
                         dt.map_(dt.utf8, dt.int64)),
        "fsl": at.column([[1, 2], None, [3, 4]],
                         dt.fixed_size_list(dt.int64, 2)),
    })


def test_roundtrip_rich():
    t = rich_table()
    doc = json.loads(json.dumps(ij.table_to_json(t)))
    t2 = ij.table_from_json(doc)
    assert t.to_pydict() == t2.to_pydict()
    assert [f.dtype for f in t.schema.fields] == \
        [f.dtype for f in t2.schema.fields]


def test_value_conventions():
    """64-bit ints/decimals are strings, binary is uppercase hex,
    VALIDITY is 0/1 (the C++/Rust reader conventions)."""
    t = at.Table.from_pydict({
        "i64": [5, None],
        "i32": at.column([5, None], dt.int32),
        "bin": at.column([b"\xab\xcd", None], dt.binary),
        "dec": at.column([decimal.Decimal("1.50"), None],
                         dt.decimal128(5, 2)),
    })
    doc = ij.table_to_json(t)
    cols = {c["name"]: c for c in doc["batches"][0]["columns"]}
    assert cols["i64"]["DATA"][0] == "5"          # string for 64-bit
    assert cols["i32"]["DATA"][0] == 5            # number for 32-bit
    assert cols["bin"]["DATA"][0] == "ABCD"       # uppercase hex
    assert cols["dec"]["DATA"][0] == "150"        # scaled int string
    assert cols["i64"]["VALIDITY"] == [1, 0]


def test_golden_snippet_parse():
    """Hand-written document in the reference's own test shape
    (arrow-integration-test/src/lib.rs test_schema_equality)."""
    snippet = {"schema": {"fields": [
        {"name": "c1", "type": {"name": "int", "isSigned": True,
                                "bitWidth": 32},
         "nullable": True, "children": []},
        {"name": "c4", "type": {"name": "list"}, "nullable": True,
         "children": [{"name": "custom_item",
                       "type": {"name": "int", "isSigned": True,
                                "bitWidth": 32},
                       "nullable": False, "children": []}]}]},
        "batches": [{"count": 2, "columns": [
            {"name": "c1", "count": 2, "VALIDITY": [1, 0], "DATA": [7, 0]},
            {"name": "c4", "count": 2, "VALIDITY": [1, 1],
             "OFFSET": [0, 2, 3], "children": [
                {"name": "custom_item", "count": 3,
                 "VALIDITY": [1, 1, 1], "DATA": [1, 2, 3]}]}]}]}
    t = ij.table_from_json(snippet)
    assert t.to_pydict() == {"c1": [7, None], "c4": [[1, 2], [3]]}
    assert t.schema.fields[0].dtype == dt.int32


def test_union_roundtrip():
    from arrow_tpu.core.nested import UnionColumn
    fields = (dt.Field("a", dt.int32), dt.Field("b", dt.utf8))
    kids = (at.column([10, 20], dt.int32),
            at.column(["x"], dt.utf8))
    u = UnionColumn(jnp.asarray(np.asarray([0, 1, 0], np.int8)),
                    jnp.asarray(np.asarray([0, 0, 1], np.int32)),
                    kids, fields, ids=(0, 1))
    t = at.Table([u], dt.Schema((dt.Field("u", u.dtype),)))
    doc = json.loads(json.dumps(ij.table_to_json(t)))
    t2 = ij.table_from_json(doc)
    assert t2.columns[0].to_pylist() == u.to_pylist()
    assert doc["schema"]["fields"][0]["type"]["mode"] == "DENSE"


def test_dictionary_wiring():
    t = at.Table.from_pydict(
        {"d": at.compute.dictionary_encode(at.column(["aa", "bb", "aa",
                                                      None]))})
    doc = ij.table_to_json(t)
    assert doc["schema"]["fields"][0]["dictionary"]["id"] == 0
    # engine dictionaries may carry a placeholder slot for nulls;
    # what matters is that codes decode through it correctly
    assert set(["aa", "bb"]) <= \
        set(doc["dictionaries"][0]["data"]["columns"][0]["DATA"])
    t2 = ij.table_from_json(doc)
    assert t2.columns[0].to_pylist() == ["aa", "bb", "aa", None]
    assert t2.schema.fields[0].dtype.is_dictionary


def test_cli_modes(tmp_path):
    t = at.Table.from_pydict({"a": [1, None, 3], "s": ["x", "y", None]})
    jp, ap = str(tmp_path / "t.json"), str(tmp_path / "t.arrow")
    ij.write_json_file(jp, t)
    ij.json_to_arrow(jp, ap)
    # native IPC file reads back equal
    from arrow_tpu.io.ipc import read_file
    tables = read_file(ap)
    assert tables[0].to_pydict() == t.to_pydict()
    assert ij.validate(ap, jp)
    # ARROW_TO_JSON inverse
    jp2 = str(tmp_path / "t2.json")
    ij.arrow_to_json(ap, jp2)
    assert ij.read_json_file(jp2).to_pydict() == t.to_pydict()
    # corrupted golden fails validation
    doc = json.load(open(jp))
    doc["batches"][0]["columns"][0]["DATA"][0] = "999"
    json.dump(doc, open(jp, "w"))
    assert not ij.validate(ap, jp)


def test_pyarrow_type_oracle():
    """Schema json of every type family parses back to the same dtype."""
    cases = [dt.null, dt.bool_, dt.int8, dt.uint16, dt.int64, dt.float16,
             dt.float64, dt.utf8, dt.large_binary, dt.fixed_size_binary(3),
             dt.date32, dt.date64, dt.time32("s"), dt.time64("ns"),
             dt.timestamp("ms", "America/New_York"), dt.duration("us"),
             dt.interval("year_month"), dt.interval("day_time"),
             dt.interval("month_day_nano"), dt.decimal128(10, 2),
             dt.decimal256(60, 10),
             dt.list_(dt.int32), dt.large_list(dt.utf8),
             dt.fixed_size_list(dt.float32, 4),
             dt.struct([dt.Field("q", dt.int16)]),
             dt.map_(dt.utf8, dt.int64)]
    for d in cases:
        f = dt.Field("c", d)
        obj = ij._field_to_json(f, None, None)
        f2, _ = ij.field_from_json(json.loads(json.dumps(obj)))
        assert f2.dtype == d, d


def test_nested_dictionary_ids():
    """Dictionary ids resolve for NESTED dictionary fields (the id
    lives only in the schema field tree; lib.rs dictionary tracking)."""
    doc = {
        "schema": {"fields": [
            {"name": "top", "type": {"name": "utf8"}, "nullable": True,
             "children": [],
             "dictionary": {"id": 0,
                            "indexType": {"name": "int",
                                          "bitWidth": 32,
                                          "isSigned": True},
                            "isOrdered": False}},
            {"name": "st", "type": {"name": "struct"}, "nullable": True,
             "children": [
                 {"name": "s", "type": {"name": "utf8"},
                  "nullable": True, "children": [],
                  "dictionary": {"id": 1,
                                 "indexType": {"name": "int",
                                               "bitWidth": 32,
                                               "isSigned": True},
                                 "isOrdered": False}}]},
        ]},
        "dictionaries": [
            {"id": 0, "data": {"count": 2, "columns": [
                {"name": "DICT0", "count": 2, "VALIDITY": [1, 1],
                 "OFFSET": [0, 1, 2], "DATA": ["x", "y"]}]}},
            {"id": 1, "data": {"count": 2, "columns": [
                {"name": "DICT1", "count": 2, "VALIDITY": [1, 1],
                 "OFFSET": [0, 1, 2], "DATA": ["p", "q"]}]}},
        ],
        "batches": [{"count": 2, "columns": [
            {"name": "top", "count": 2, "VALIDITY": [1, 1],
             "DATA": [0, 1]},
            {"name": "st", "count": 2, "VALIDITY": [1, 1],
             "children": [
                 {"name": "s", "count": 2, "VALIDITY": [1, 1],
                  "DATA": [1, 0]}]},
        ]}],
    }
    t = ij.table_from_json(doc)
    assert t.column("top").to_pylist() == ["x", "y"]
    assert t.column("st").to_pylist() == [{"s": "q"}, {"s": "p"}]
