"""Packed-sort high-cardinality group-by path (ops/groupby.py
_packed_sort_path): parity with the general discovery path and with the
pyarrow oracle.  The path triggers whenever integer keys exceed the
perfect-binning cap but the (key, class, value) bits fit one u64."""
import numpy as np
import pyarrow as pa
import pytest

import arrow_tpu as at
from arrow_tpu.ops import groupby as _gb


def _packed_vs_general(t, keys, aggs, monkeypatch):
    got = _gb._int_range_fast_path(t, [t.column(k) for k in keys], keys,
                                   aggs)
    assert got is not None, "packed path did not trigger"
    with monkeypatch.context() as m:
        m.setattr(_gb, "_int_range_fast_path", lambda *a: None)
        exp = _gb.group_by(t, keys, aggs)
    da, db = got.to_pydict(), exp.to_pydict()
    assert set(da) == set(db)
    for k in da:
        for x, y in zip(da[k], db[k]):
            if isinstance(x, float) and isinstance(y, float):
                if np.isnan(x) and np.isnan(y):
                    continue
                assert x == y or abs(x - y) <= 1e-6 * max(1.0, abs(x)), \
                    (k, x, y)
            else:
                assert x == y, (k, x, y)
    return got


@pytest.mark.parametrize("seed", range(4))
def test_packed_randomized(seed, monkeypatch):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(500, 4000))
    # key range far beyond the bin cap (4n) so the packed path triggers
    k1 = rng.integers(-10**6, 10**6, n)
    k2 = rng.integers(0, 5, n).astype(np.int16)
    v = rng.integers(-1000, 1000, n)
    f = rng.standard_normal(n).astype(np.float32)
    f[rng.random(n) < 0.05] = np.nan
    f[rng.random(n) < 0.03] = np.inf
    f[rng.random(n) < 0.03] = -np.inf
    m1 = rng.random(n) < 0.9
    mv = rng.random(n) < 0.85
    mf = rng.random(n) < 0.9
    t = at.Table.from_pyarrow(pa.table({
        "k1": pa.array(k1, mask=~m1),
        "k2": pa.array(k2),
        "v": pa.array(v, mask=~mv),
        "f": pa.array(f, mask=~mf),
        "s": pa.array([f"x{i % 11}" if i % 13 else None
                       for i in range(n)]),
    }))
    aggs = [_gb.AggSpec("v", "sum"), _gb.AggSpec("v", "min"),
            _gb.AggSpec("v", "max"), _gb.AggSpec("v", "mean"),
            _gb.AggSpec("f", "sum"), _gb.AggSpec("f", "min"),
            _gb.AggSpec("f", "max"), _gb.AggSpec("f", "count"),
            _gb.AggSpec("s", "count"), _gb.AggSpec("k1", "count_all")]
    _packed_vs_general(t, ["k1", "k2"], aggs, monkeypatch)


def test_packed_pyarrow_oracle():
    rng = np.random.default_rng(7)
    n = 30_000
    k = rng.integers(0, 10**7, n)
    v = rng.integers(-10**6, 10**6, n)
    t = at.Table.from_pydict({"k": k, "v": v})
    aggs = [_gb.AggSpec("v", "sum"), _gb.AggSpec("v", "count"),
            _gb.AggSpec("v", "min"), _gb.AggSpec("v", "max")]
    out = _gb.group_by(t, ["k"], aggs)
    exp = pa.table({"k": k, "v": v}).group_by("k").aggregate(
        [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")]) \
        .sort_by("k")
    got = out.to_pyarrow()
    for name in ("k", "v_sum", "v_count", "v_min", "v_max"):
        g, e = got.column(name), exp.column(name)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        assert g == e, name


def test_packed_wide_value_rides_own_bits(monkeypatch):
    # value range needs ~41 bits; key range ~17 bits -> fits 63
    rng = np.random.default_rng(3)
    n = 2000
    k = rng.integers(0, 100_000, n)
    v = rng.integers(-(2**40), 2**40, n)
    t = at.Table.from_pydict({"k": k, "v": v})
    _packed_vs_general(
        t, ["k"], [_gb.AggSpec("v", "min"), _gb.AggSpec("v", "max"),
                   _gb.AggSpec("v", "sum")], monkeypatch)


def test_packed_u64_values(monkeypatch):
    # key bits (20) + value bits (34) fit the 63-bit budget
    k = np.array([0, 10**6, 5, 0, 10**6], np.int64)
    vu = np.array([2**33 + 5, 3, 2**33, 7, 11], np.uint64)
    t = at.Table.from_pyarrow(pa.table({"k": pa.array(k),
                                        "vu": pa.array(vu)}))
    got = _packed_vs_general(
        t, ["k"], [_gb.AggSpec("vu", "min"), _gb.AggSpec("vu", "max"),
                   _gb.AggSpec("vu", "sum")], monkeypatch)
    d = got.to_pydict()
    assert d["vu_sum"][0] == 2**33 + 12
    assert d["vu_max"][1] == 2**33
    assert d["vu_max"][2] == 11


def test_packed_declines_f64_minmax():
    # f64 min/max cannot pack (no f64 device bitcast) -> general path
    n = 3000
    rng = np.random.default_rng(1)
    t = at.Table.from_pydict({
        "k": rng.integers(0, 10**6, n),
        "f": rng.standard_normal(n)})
    r = _gb._int_range_fast_path(
        t, [t.column("k")], ["k"],
        [_gb.AggSpec("f", "min")])
    assert r is None
    out = _gb.group_by(t, ["k"], [_gb.AggSpec("f", "min")])
    assert out.num_rows > 0


def test_packed_f64_sum_rides_payload(monkeypatch):
    # f64 SUM has no packing problem (payload plane, not key bits)
    n = 2500
    rng = np.random.default_rng(2)
    f = rng.standard_normal(n)
    f[::97] = np.nan
    mf = rng.random(n) < 0.9
    t = at.Table.from_pyarrow(pa.table({
        "k": pa.array(rng.integers(0, 10**6, n)),
        "f": pa.array(f, mask=~mf)}))
    _packed_vs_general(t, ["k"], [_gb.AggSpec("f", "sum"),
                                  _gb.AggSpec("f", "mean"),
                                  _gb.AggSpec("f", "count")], monkeypatch)


def test_packed_float16(monkeypatch):
    n = 1500
    rng = np.random.default_rng(4)
    f = rng.standard_normal(n).astype(np.float16)
    t = at.Table.from_pyarrow(pa.table({
        "k": pa.array(rng.integers(0, 50_000, n)),
        "f": pa.array(f)}))
    _packed_vs_general(t, ["k"], [_gb.AggSpec("f", "min"),
                                  _gb.AggSpec("f", "max")], monkeypatch)


def test_packed_all_null_keys(monkeypatch):
    n = 1200
    rng = np.random.default_rng(5)
    k = pa.array([None] * n, pa.int64())
    v = rng.integers(0, 100, n)
    # single group (null); force packed trigger via a second wide key
    k2 = rng.integers(0, 10**6, n)
    t = at.Table.from_pyarrow(pa.table({"k": k, "k2": pa.array(k2),
                                        "v": pa.array(v)}))
    got = _packed_vs_general(
        t, ["k", "k2"], [_gb.AggSpec("v", "sum")], monkeypatch)
    assert got.to_pydict()["k"][0] is None


def test_packed_single_row_groups(monkeypatch):
    # every group singleton: ng == n, k_b == n
    n = 1777
    k = np.arange(n) * 1000 + 17
    v = np.arange(n) - 800
    t = at.Table.from_pydict({"k": k, "v": v})
    got = _packed_vs_general(
        t, ["k"], [_gb.AggSpec("v", "sum"), _gb.AggSpec("v", "min"),
                   _gb.AggSpec("v", "max"), _gb.AggSpec("v", "count")],
        monkeypatch)
    assert got.num_rows == n


def test_packed_count_only_column(monkeypatch):
    n = 2000
    rng = np.random.default_rng(6)
    s = pa.array([f"v{i % 7}" if i % 5 else None for i in range(n)])
    t = at.Table.from_pyarrow(pa.table({
        "k": pa.array(rng.integers(0, 10**6, n)), "s": s}))
    _packed_vs_general(t, ["k"], [_gb.AggSpec("s", "count"),
                                  _gb.AggSpec("s", "count_all")],
                       monkeypatch)
