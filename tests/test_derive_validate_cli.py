"""Dataclass record derive (parquet_derive role), invariant validation
(arrow-data validate/validate_full), make_comparator (arrow-ord ord.rs),
and the CLI tool suite (parquet/src/bin, flight_sql_client)."""

import dataclasses
import datetime
import io
import sys
from contextlib import redirect_stdout
from typing import List, Optional

import numpy as np
import pytest
import jax.numpy as jnp

import arrow_tpu as at
from arrow_tpu import dtypes as dt
from arrow_tpu.io.derive import (derive_schema, records_to_table,
                                 table_to_records, write_records,
                                 read_records)


@dataclasses.dataclass
class Trade:
    id: int
    px: float
    sym: Optional[str]
    ok: bool
    tags: List[int]


def _trades():
    return [Trade(1, 1.5, "a", True, [1, 2]),
            Trade(2, 2.5, None, False, [])]


def test_derive_schema():
    s = derive_schema(Trade)
    assert s.field("id").dtype == dt.int64
    assert s.field("px").dtype == dt.float64
    assert s.field("sym").dtype == dt.utf8 and s.field("sym").nullable
    assert not s.field("id").nullable
    assert s.field("tags").dtype == dt.list_(dt.int64)


def test_records_roundtrip(tmp_path):
    path = str(tmp_path / "t.parquet")
    write_records(path, _trades())
    back = read_records(path, Trade)
    assert back == _trades()


def test_records_table():
    t = records_to_table(_trades())
    assert t.num_rows == 2
    assert table_to_records(t, Trade) == _trades()


# ---- validation ---------------------------------------------------------------

def test_validate_catches_bad_offsets():
    from arrow_tpu.core.validate import validate, validate_full
    good = at.StringColumn(jnp.asarray(np.array([0, 1, 3], np.int32)),
                           jnp.asarray(np.frombuffer(b"abc", np.uint8)),
                           dt.utf8, None)
    validate_full(good)
    bad = at.StringColumn(jnp.asarray(np.array([0, 2, 1], np.int32)),
                          jnp.asarray(np.frombuffer(b"abc", np.uint8)),
                          dt.utf8, None)
    with pytest.raises(Exception):
        validate_full(bad)


def test_validate_catches_bad_utf8():
    from arrow_tpu.core.validate import validate_full
    bad = at.StringColumn(jnp.asarray(np.array([0, 2], np.int32)),
                          jnp.asarray(np.array([0xFF, 0xFE], np.uint8)),
                          dt.utf8, None)
    with pytest.raises(Exception):
        validate_full(bad)


def test_validate_dictionary_codes():
    from arrow_tpu.core.validate import validate_full
    bad = at.DictionaryColumn(jnp.asarray(np.array([0, 7], np.int32)),
                              at.column(["a", "b"]), None,
                              _canonical=True)
    with pytest.raises(Exception):
        validate_full(bad)


def test_validate_run_ends():
    from arrow_tpu.core.validate import validate_full
    from arrow_tpu.core.nested import RunEndColumn
    bad = RunEndColumn(jnp.asarray(np.array([3, 2], np.int32)),
                       at.column(np.array([1, 2], np.int64)), 3)
    with pytest.raises(Exception):
        validate_full(bad)


# ---- make_comparator ------------------------------------------------------------

def test_make_comparator():
    from arrow_tpu.ops.ord import make_comparator
    from arrow_tpu.ops.row_format import SortOptions
    a = at.column(np.array([5, 1, 3], np.int64),
                  validity=np.array([1, 1, 0], bool))
    b = at.column(np.array([2, 5], np.int64))
    cmp = make_comparator(a, b)
    assert cmp(0, 0) > 0          # 5 > 2
    assert cmp(1, 0) < 0          # 1 < 2
    assert cmp(0, 1) == 0         # 5 == 5
    assert cmp(2, 0) < 0          # null first by default
    cmp_d = make_comparator(a, b, SortOptions(descending=True))
    assert cmp_d(0, 0) < 0


def test_lexicographic_comparator():
    from arrow_tpu.ops.ord import make_lexicographic_comparator
    from arrow_tpu.ops.row_format import SortOptions
    a1 = at.column(np.array([1, 1], np.int64))
    a2 = at.column(np.array([9, 2], np.int64))
    cmp = make_lexicographic_comparator(
        [a1, a2], [a1, a2], [SortOptions(), SortOptions()])
    assert cmp(0, 1) > 0 and cmp(1, 0) < 0 and cmp(0, 0) == 0


# ---- CLI ------------------------------------------------------------------------

def _run_cli(*argv) -> str:
    from arrow_tpu.cli import main
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(list(argv))
    return buf.getvalue()


@pytest.fixture
def pq_file(tmp_path):
    from arrow_tpu.io.parquet_io import write_parquet
    path = str(tmp_path / "data.parquet")
    write_parquet(path, at.Table.from_pydict({
        "id": at.column(np.arange(5, dtype=np.int64)),
        "name": at.column(["a", "b", "c", "d", "e"]),
    }))
    return path


def test_cli_parquet_read(pq_file):
    out = _run_cli("parquet-read", pq_file, "--limit", "2")
    lines = out.strip().splitlines()
    assert len(lines) == 2
    import json
    assert json.loads(lines[0]) == {"id": 0, "name": "a"}


def test_cli_parquet_schema(pq_file):
    out = _run_cli("parquet-schema", pq_file)
    assert "num_rows: 5" in out and "name" in out


def test_cli_pretty(pq_file):
    out = _run_cli("pretty", pq_file, "--limit", "3")
    assert out.startswith("+") and "| id" in out


def test_cli_rewrite_concat(tmp_path, pq_file):
    out2 = str(tmp_path / "z.parquet")
    _run_cli("parquet-rewrite", pq_file, out2, "--compression", "zstd")
    cat = str(tmp_path / "cat.parquet")
    _run_cli("parquet-concat", cat, pq_file, out2)
    from arrow_tpu.io.parquet_io import read_parquet
    assert read_parquet(cat).num_rows == 10


def test_cli_fromcsv(tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("x,y\n1,a\n2,b\n")
    out = str(tmp_path / "o.parquet")
    _run_cli("parquet-fromcsv", str(csv), out)
    from arrow_tpu.io.parquet_io import read_parquet
    assert read_parquet(out).to_pydict() == {"x": [1, 2], "y": ["a", "b"]}


def test_cli_flight_sql():
    from arrow_tpu.io.flightsql import FlightSQLServer
    srv = FlightSQLServer("grpc://127.0.0.1:0")
    srv.register("t", at.Table.from_pydict({
        "v": at.column(np.array([1, 2], np.int64))}))
    try:
        out = _run_cli("flight-sql", "--uri", srv.uri,
                       "SELECT * FROM t WHERE v = 2")
        assert "| 2" in out
    finally:
        srv.shutdown()


def test_derive_deep_nested_dataclasses(tmp_path):
    """Nested dataclasses reconstruct at ANY depth (round-trip equality,
    parquet_derive reader role)."""
    import dataclasses
    from typing import List, Optional
    from arrow_tpu.io.derive import read_records, write_records

    @dataclasses.dataclass
    class C:
        z: int

    @dataclasses.dataclass
    class B:
        c: C
        tags: List[int]

    @dataclasses.dataclass
    class A:
        b: B
        name: Optional[str]

    rows = [A(B(C(1), [1, 2]), "x"), A(B(C(2), []), None)]
    p = str(tmp_path / "deep.parquet")
    write_records(p, rows, A)
    back = read_records(p, A)
    assert back == rows
    assert isinstance(back[0].b.c, C)
