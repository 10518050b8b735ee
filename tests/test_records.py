"""Row-oriented parquet record API (parquet/src/record/ parity)."""

import decimal

import pytest

import arrow_tpu as at
from arrow_tpu import dtypes as dt
from arrow_tpu.errors import ArrowTypeError
from arrow_tpu.io import records as rec
from arrow_tpu.io.parquet_io import write_parquet


@pytest.fixture
def pq_file(tmp_path):
    t = at.Table.from_pydict({
        "i": at.column([1, None, 3], dt.int32),
        "l": [10, 20, None],
        "f": at.column([0.5, 1.5, None], dt.float32),
        "s": ["a", None, "ccc"],
        "b": at.column([b"\x01", b"\x02\x03", None], dt.binary),
        "ok": [True, False, None],
        "lst": at.column([[1, 2], None, [3]], dt.list_(dt.int64)),
        "st": at.column([{"x": 1}, {"x": 2}, None],
                        dt.struct([dt.Field("x", dt.int64)])),
    })
    p = str(tmp_path / "r.parquet")
    write_parquet(p, t)
    return p


def test_row_iter_and_getters(pq_file):
    rows = list(rec.RowIter.from_file(pq_file))
    assert len(rows) == 3
    r0 = rows[0]
    assert r0.get_int(0) == 1
    assert r0.get_long(1) == 10
    assert abs(r0.get_float(2) - 0.5) < 1e-6
    assert r0.get_string(3) == "a"
    assert r0.get_bytes(4) == b"\x01"
    assert r0.get_bool(5) is True
    lst = r0.get_list(6)
    assert list(lst.elements) == [1, 2]
    grp = r0.get_group(7)
    assert grp.get_long(0) == 1
    # nulls surface as None through the raw value
    assert rows[1].get_int(0) is None
    # wrong-type access raises (api.rs get_* type checks)
    with pytest.raises(ArrowTypeError):
        r0.get_string(0)
    with pytest.raises(ArrowTypeError):
        r0.get_int(3)
    with pytest.raises(ArrowTypeError):
        r0.get_group(0)


def test_column_iter_and_repr(pq_file):
    r0 = next(iter(rec.RowIter(pq_file)))
    pairs = dict(r0.get_column_iter())
    assert pairs["i"] == 1 and pairs["s"] == "a"
    assert "i: 1" in repr(r0)


def test_projection_and_limit(pq_file):
    rows = rec.read_records(pq_file, projection=["s", "i"], limit=2)
    assert len(rows) == 2
    assert len(rows[0]) == 2
    # projection keeps file schema order (ProjectionMask semantics)
    assert dict(rows[0].get_column_iter()) == {"i": 1, "s": "a"}


def test_to_json_value(pq_file):
    import base64
    r0 = next(iter(rec.RowIter(pq_file)))
    j = r0.to_json_value()
    assert j["i"] == 1 and j["s"] == "a"
    assert j["b"] == base64.b64encode(b"\x01").decode()   # api.rs base64
    assert j["lst"] == [1, 2]
    assert j["st"] == {"x": 1}
    r1 = list(rec.RowIter(pq_file))[1]
    assert r1.to_json_value()["i"] is None


def test_map_and_decimal(tmp_path):
    t = at.Table.from_pydict({
        "m": at.column([[("k", 1)], [("a", 2), ("b", 3)]],
                       dt.map_(dt.utf8, dt.int64)),
        "d": at.column([decimal.Decimal("1.25"),
                        decimal.Decimal("-3.00")], dt.decimal128(9, 2)),
    })
    p = str(tmp_path / "m.parquet")
    write_parquet(p, t)
    rows = list(rec.RowIter(p))
    m = rows[1].get_map(0)
    assert m.keys() == ["a", "b"] and m.values() == [2, 3]
    assert rows[0].get_decimal(1) == decimal.Decimal("1.25")
    j = rows[0].to_json_value()
    assert j["d"] == "1.25"
    assert j["m"] == {"k": 1}
