"""Variant binary format (parquet-variant / -json / -compute)."""

from decimal import Decimal

import pytest

import arrow_tpu.io.variant as variant
from arrow_tpu.io.variant import (VariantBuilder, parse_variant,
                                  variant_to_json, json_to_variant,
                                  VariantColumn, variant_get)


def rt(v):
    m, b = VariantBuilder().build(v)
    return parse_variant(m, b)


def test_primitives_roundtrip():
    for v in [None, True, False, 0, -1, 127, 128, -32769, 2**40,
              -2**62, 3.5, "", "hi", "x" * 100, b"\x00\xff",
              Decimal("12.345")]:
        assert rt(v) == v, v


def test_known_bytes():
    # spec-pinned encodings
    b = VariantBuilder()
    assert b._encode(None) == b"\x00"
    assert b._encode(True) == bytes([1 << 2])
    assert b._encode(3) == bytes([3 << 2]) + b"\x03"     # int8
    assert b._encode("ab") == bytes([(2 << 2) | 1]) + b"ab"


def test_object_header_spec_bits():
    # Spec (parquet-variant builder.rs object_header): basic_type 2 in
    # the low bits, field-OFFSET width in bits 2-3, field-ID width in
    # bits 4-5, large flag bit 6.  Regression for the r1 swap: when the
    # two widths differ, a spec reader must agree with us byte-for-byte.
    b = VariantBuilder()
    # >255 distinct small values: iw=2 (ids up to ~300), ow=2 as well —
    # force differing widths with one long value so offsets exceed 255
    # while ids stay 1-byte.
    obj = {"k%d" % i: i % 5 for i in range(10)}
    obj["long"] = "x" * 300   # pushes offset width to 2, id width stays 1
    m, v = b.build(obj)
    head = v[0]
    assert head & 3 == 2
    ow = ((head >> 2) & 3) + 1
    iw = ((head >> 4) & 3) + 1
    assert (ow, iw) == (2, 1)
    assert parse_variant(m, v) == obj
    # hand-built spec bytes: object {a: int8 7} with ow=1, iw=1
    # metadata: version 1, ow=1, 1 key "a"
    md = bytes([0x01, 1, 0, 1]) + b"a"
    val = bytes([2 | (0 << 2) | (0 << 4),  # ow=1, iw=1, small
                 1,                        # n fields
                 0,                        # field id 0
                 0, 2,                     # offsets 0, 2
                 (3 << 2), 7])             # int8 7
    assert parse_variant(md, val) == {"a": 7}


def test_nested_roundtrip():
    v = {"a": [1, 2.5, "three", None], "b": {"c": True, "d": [[]]},
         "e": Decimal("-0.01")}
    assert rt(v) == v


def test_object_keys_shared():
    # repeated keys intern to one metadata entry
    m, b = VariantBuilder().build([{"k": 1}, {"k": 2}])
    from arrow_tpu.io.variant import _parse_metadata
    assert _parse_metadata(m) == ["k"]


def test_json_bridge():
    m, b = json_to_variant('{"x": [1, 2], "y": null}')
    assert parse_variant(m, b) == {"x": [1, 2], "y": None}
    assert variant_to_json(m, b) == '{"x": [1, 2], "y": null}'


def test_large_array():
    v = list(range(500))                 # forces is_large + wider offsets
    assert rt(v) == v


def test_variant_column_and_get():
    rows = [{"user": {"id": 7, "tags": ["a", "b"]}},
            {"user": {"id": 8}},
            None]
    col = VariantColumn.from_pylist([r if r is not None else
                                     __import__(
                                         "arrow_tpu.io.variant",
                                         fromlist=["_NULL_SLOT"])._NULL_SLOT
                                     for r in rows])
    assert len(col) == 3
    assert variant_get(col, ["user", "id"]) == [7, 8, None]
    assert variant_get(col, ["user", "tags", 1]) == ["b", None, None]

    sc = col.to_struct_column()
    back = VariantColumn.from_struct_column(sc)
    assert back.to_pylist() == [rows[0], rows[1], None]


def test_object_fields_sorted_by_name():
    """Spec: object fields ordered lexicographically by field NAME
    (builder.rs), not by insertion-order id."""
    m, v = VariantBuilder().build({"b": 1, "a": 2})
    keys = variant._parse_metadata(m)
    # ids follow insertion order; parse respects name-sorted layout
    assert parse_variant(m, v) == {"b": 1, "a": 2}
    # first field in the encoded object must be 'a': its id is 1
    head = v[0]
    iw = ((head >> 4) & 3) + 1
    n = v[1]
    first_id = int.from_bytes(v[2:2 + iw], "little")
    assert n == 2 and keys[first_id] == "a"


def test_date_timestamp_primitives():
    import datetime
    d = datetime.date(2021, 3, 4)
    ts = datetime.datetime(2021, 3, 4, 5, 6, 7, 250,
                           tzinfo=datetime.timezone.utc)
    ntz = datetime.datetime(2021, 3, 4, 5, 6, 7, 250)
    m, v = VariantBuilder().build({"d": d, "ts": ts, "ntz": ntz})
    back = parse_variant(m, v)
    assert back["d"] == d and back["ts"] == ts and back["ntz"] == ntz
    # external bytes with primitive ids 11-13 parse (spec conformance)
    s = variant_to_json(m, v)
    assert "2021-03-04" in s


# ---------------------------------------------------------------------------
# columnar compute + shredding (round 3)
# ---------------------------------------------------------------------------

def _mixed_objs():
    return [{"a": 1, "b": "x"}, 42, "hello", "a" * 100, 3.5, True,
            None, [1, 2, {"c": None}], -2 ** 40, {"k": [False]},
            {"a": -5}, {"a": 2 ** 33}, {"a": 300}, {"a": "s"},
            {"a": None}, {"a": [7]}, {"a": {"z": 1}}]


def test_variant_get_column_matches_per_row():
    from arrow_tpu.io.variant import VariantColumn, variant_get_column
    col = VariantColumn.from_pylist(_mixed_objs())
    sub = variant_get_column(col, ["a"])
    exp = [o.get("a", None) if isinstance(o, dict) else None
           for o in _mixed_objs()]
    assert sub.to_pylist() == exp
    # nested path + array index
    col2 = VariantColumn.from_pylist(
        [{"u": {"tags": ["a", "b"]}}, {"u": {"tags": []}}, {"u": 3}])
    assert variant_get_column(col2, ["u", "tags", 1]).to_pylist() == \
        ["b", None, None]


def test_variant_get_typed_int64_widths_and_nulls():
    import numpy as np
    from arrow_tpu import dtypes as dt
    from arrow_tpu.io.variant import VariantColumn, variant_get_typed
    objs = [{"a": v} for v in (5, -5, 300, -300, 70000, -70000,
                               2 ** 40, -2 ** 40)] + \
        [{"b": 1}, {"a": "str"}, {"a": 1.5}, None]
    col = VariantColumn.from_pylist(objs)
    c = variant_get_typed(col, ["a"], dt.int64)
    assert c.to_pylist() == [5, -5, 300, -300, 70000, -70000,
                             2 ** 40, -2 ** 40, None, None, None, None]


def test_variant_get_typed_other_types():
    from arrow_tpu import dtypes as dt
    from arrow_tpu.io.variant import VariantColumn, variant_get_typed
    objs = [{"a": 1.5}, {"a": True}, {"a": False}, {"a": "hi"},
            {"a": "y" * 80}, {"a": 3}, None]
    col = VariantColumn.from_pylist(objs)
    assert variant_get_typed(col, ["a"], dt.float64).to_pylist() == \
        [1.5, None, None, None, None, None, None]
    assert variant_get_typed(col, ["a"], dt.bool_).to_pylist() == \
        [None, True, False, None, None, None, None]
    assert variant_get_typed(col, ["a"], dt.utf8).to_pylist() == \
        [None, None, None, "hi", "y" * 80, None, None]


def test_variant_shred_struct_roundtrip():
    from arrow_tpu import dtypes as dt
    from arrow_tpu.io.variant import (VariantColumn, variant_to_struct,
                                      variant_from_struct)
    col = VariantColumn.from_pylist(_mixed_objs())
    for st in (None, dt.int64, dt.utf8, dt.float64, dt.bool_):
        sc = variant_to_struct(col, st)
        assert variant_from_struct(sc).to_pylist() == col.to_pylist()
    # shredded rows actually moved to typed_value
    sc = variant_to_struct(col, dt.int64)
    tv = sc.children[2]
    assert tv.to_pylist()[1] == 42 and tv.to_pylist()[8] == -2 ** 40
    import numpy as np
    vv = sc.children[1]
    assert np.asarray(vv.validity)[1] == False  # noqa: E712


def test_variant_parquet_roundtrip_and_pyarrow_interop():
    import io
    from arrow_tpu import dtypes as dt
    from arrow_tpu.io.variant import (VariantColumn,
                                      write_variant_parquet,
                                      read_variant_parquet)
    col = VariantColumn.from_pylist(_mixed_objs())
    for st in (None, dt.int64, dt.utf8):
        b = io.BytesIO()
        write_variant_parquet(b, col, shred_type=st)
        b.seek(0)
        assert read_variant_parquet(b).to_pylist() == col.to_pylist()
    # pyarrow reads the VARIANT-annotated group as struct-of-binary
    import pyarrow.parquet as pq
    b = io.BytesIO()
    write_variant_parquet(b, col, shred_type=dt.int64)
    t = pq.read_table(io.BytesIO(b.getvalue()))
    f = t.schema.field("v")
    assert f.metadata[b"ARROW:extension:name"] == b"arrow.variant"
    names = [c.name for c in f.type]
    assert names == ["metadata", "value", "typed_value"]
    # every non-shredded value byte string matches ours exactly
    ours = col.values
    theirs = [r["v"]["value"] for r in t.to_pylist()]
    for i, (a, b2) in enumerate(zip(ours, theirs)):
        if b2 is not None:
            assert a == b2, i
