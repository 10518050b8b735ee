"""Hash aggregate + hash join goldens vs pyarrow (BASELINE configs 4-5
operators; composed from engine primitives per SURVEY.md §7 M5-M6)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import (create_primitive_array,
                                        create_string_array)


def _sorted_pydict(d):
    keys = list(d.keys())
    rows = list(zip(*[d[k] for k in keys]))
    rows.sort(key=lambda r: tuple((x is not None, x) for x in r))
    return {k: [r[i] for r in rows] for i, k in enumerate(keys)}


def test_group_by_golden_int_keys():
    n = 2000
    t_pa = pa.table({
        "k": create_primitive_array(n, 0.1, np.int64, lo=0, hi=50, seed=1),
        "v": create_primitive_array(n, 0.2, np.float64, seed=2),
        "w": create_primitive_array(n, 0.0, np.int64, lo=-10, hi=10, seed=3),
    })
    t = at.Table.from_pyarrow(t_pa)
    got = ops.group_by(t, ["k"], [
        ops.AggSpec("v", "sum"), ops.AggSpec("v", "count"),
        ops.AggSpec("w", "min"), ops.AggSpec("w", "max"),
        ops.AggSpec("v", "mean"),
    ])
    exp = t_pa.group_by("k").aggregate([
        ("v", "sum"), ("v", "count"), ("w", "min"), ("w", "max"),
        ("v", "mean"),
    ])
    g = _sorted_pydict(got.to_pydict())
    e = _sorted_pydict({
        "k": exp.column("k").to_pylist(),
        "v_sum": exp.column("v_sum").to_pylist(),
        "v_count": exp.column("v_count").to_pylist(),
        "w_min": exp.column("w_min").to_pylist(),
        "w_max": exp.column("w_max").to_pylist(),
        "v_mean": exp.column("v_mean").to_pylist(),
    })
    assert g["k"] == e["k"]
    assert g["v_count"] == e["v_count"]
    assert g["w_min"] == e["w_min"]
    assert g["w_max"] == e["w_max"]
    np.testing.assert_allclose(
        np.array(g["v_sum"], float), np.array(e["v_sum"], float), rtol=1e-12)
    np.testing.assert_allclose(
        np.array(g["v_mean"], float), np.array(e["v_mean"], float),
        rtol=1e-12)


def test_group_by_string_keys():
    t_pa = pa.table({
        "k": create_string_array(500, 0.1, cardinality=10, seed=4),
        "v": create_primitive_array(500, 0.0, np.int64, lo=0, hi=9, seed=5),
    })
    t = at.Table.from_pyarrow(t_pa)
    got = ops.group_by(t, ["k"], [ops.AggSpec("v", "sum"),
                                  ops.AggSpec("v", "count_all")])
    exp = t_pa.group_by("k").aggregate([("v", "sum"), ("v", "count",
                                                       pc.CountOptions(mode="all"))])
    g = _sorted_pydict(got.to_pydict())
    e = _sorted_pydict({"k": exp.column("k").to_pylist(),
                        "v_sum": exp.column("v_sum").to_pylist(),
                        "v_count_all": exp.column("v_count").to_pylist()})
    assert g == e


def test_group_by_multi_key():
    t_pa = pa.table({
        "a": create_primitive_array(800, 0.1, np.int64, lo=0, hi=4, seed=6),
        "b": create_primitive_array(800, 0.1, np.int64, lo=0, hi=4, seed=7),
        "v": create_primitive_array(800, 0.0, np.int64, lo=0, hi=99, seed=8),
    })
    t = at.Table.from_pyarrow(t_pa)
    got = ops.group_by(t, ["a", "b"], [ops.AggSpec("v", "sum")])
    exp = t_pa.group_by(["a", "b"]).aggregate([("v", "sum")])
    g = _sorted_pydict(got.to_pydict())
    e = _sorted_pydict({"a": exp.column("a").to_pylist(),
                        "b": exp.column("b").to_pylist(),
                        "v_sum": exp.column("v_sum").to_pylist()})
    assert g == e


def test_group_by_empty():
    t = at.Table.from_pydict({"k": at.column([], at.int64),
                              "v": at.column([], at.float64)})
    got = ops.group_by(t, ["k"], [ops.AggSpec("v", "sum")])
    assert got.num_rows == 0


def test_group_by_all_null_group():
    t = at.Table.from_pydict({"k": [1, 1], "v": [None, None]})
    got = ops.group_by(t, ["k"], [ops.AggSpec("v", "sum"),
                                  ops.AggSpec("v", "count")])
    assert got.to_pydict() == {"k": [1], "v_sum": [None], "v_count": [0]}


# ---- join -------------------------------------------------------------------

def _join_golden(lt, rt, on, how_pa, how_us, n=None):
    l = at.Table.from_pyarrow(lt)
    r = at.Table.from_pyarrow(rt)
    got = ops.join(l, r, on, how=how_us)
    exp = lt.join(rt, keys=on, join_type=how_pa)
    g = _sorted_pydict(got.to_pydict())
    e = _sorted_pydict({c: exp.column(c).to_pylist()
                        for c in got.column_names})
    assert g == e


def test_inner_join_golden():
    lt = pa.table({
        "k": create_primitive_array(500, 0.05, np.int64, lo=0, hi=80,
                                    seed=1),
        "lv": create_primitive_array(500, 0.0, np.int64, seed=2)})
    rt = pa.table({
        "k": create_primitive_array(200, 0.05, np.int64, lo=0, hi=80,
                                    seed=3),
        "rv": create_primitive_array(200, 0.0, np.int64, seed=4)})
    _join_golden(lt, rt, ["k"], "inner", "inner")


def test_left_join_golden():
    lt = pa.table({"k": [1, 2, 3, None, 2], "lv": [10, 20, 30, 40, 50]})
    rt = pa.table({"k": [2, 2, 3, None], "rv": ["a", "b", "c", "d"]})
    _join_golden(lt, rt, ["k"], "left outer", "left")


def test_semi_anti_join_golden():
    lt = pa.table({"k": [1, 2, 3, None, 2], "lv": [10, 20, 30, 40, 50]})
    rt = pa.table({"k": [2, 3], "rv": [1, 2]})
    _join_golden(lt, rt, ["k"], "left semi", "semi")
    _join_golden(lt, rt, ["k"], "left anti", "anti")


def test_multi_key_join_golden():
    lt = pa.table({
        "a": create_primitive_array(300, 0.0, np.int64, lo=0, hi=9, seed=5),
        "b": create_primitive_array(300, 0.0, np.int64, lo=0, hi=9, seed=6),
        "lv": create_primitive_array(300, 0.0, np.int64, seed=7)})
    rt = pa.table({
        "a": create_primitive_array(100, 0.0, np.int64, lo=0, hi=9, seed=8),
        "b": create_primitive_array(100, 0.0, np.int64, lo=0, hi=9, seed=9),
        "rv": create_primitive_array(100, 0.0, np.int64, seed=10)})
    _join_golden(lt, rt, ["a", "b"], "inner", "inner")


def test_join_string_keys():
    lt = pa.table({"k": ["a", "b", None, "c"], "lv": [1, 2, 3, 4]})
    rt = pa.table({"k": ["b", "c", "c"], "rv": [10, 20, 30]})
    _join_golden(lt, rt, ["k"], "inner", "inner")


def test_join_zipf_skew():
    """Skewed keys (the BASELINE config-5 shape, downscaled)."""
    rng = np.random.default_rng(0)
    probe_keys = (rng.zipf(1.5, 5000) % 100).astype(np.int64)
    build_keys = np.arange(100, dtype=np.int64)
    lt = pa.table({"k": probe_keys,
                   "lv": np.arange(5000, dtype=np.int64)})
    rt = pa.table({"k": build_keys,
                   "rv": build_keys * 10})
    _join_golden(lt, rt, ["k"], "inner", "inner")


def test_group_by_minmax_at_int64_extremes(rng):
    """Nulls must not tie with genuine i64::MAX values in the min/max
    secondary sort."""
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.ops.groupby import group_by, AggSpec
    imax, imin = np.iinfo(np.int64).max, np.iinfo(np.int64).min
    keys = np.array([1, 1, 1, 2, 2], np.int64)
    vals = np.array([imax, 5, 0, imin, 7], np.int64)
    valid = np.array([True, True, False, True, True])
    t = at.Table.from_pydict({"k": at.column(keys),
                              "v": at.column(vals, validity=valid)})
    d = group_by(t, ["k"], [AggSpec("v", "min"),
                            AggSpec("v", "max")]).to_pydict()
    assert d["v_max"] == [imax, 7]
    assert d["v_min"] == [5, imin]


def test_group_by_chunked_two_level(monkeypatch):
    """>150M-row inputs run partial/final two-level aggregation; the
    output matches the single-pass plan (forced via a tiny chunk)."""
    from arrow_tpu.ops import groupby as gb
    from arrow_tpu.ops.groupby import group_by, AggSpec
    from arrow_tpu.io.interop import table_from_pyarrow
    rng = np.random.default_rng(7)
    n = 5000
    rb = pa.record_batch([
        pa.array(rng.integers(0, 40, n), mask=rng.random(n) < 0.1),
        pa.array(rng.integers(-100, 100, n), mask=rng.random(n) < 0.2),
        pa.array(rng.normal(size=n), pa.float64()),
    ], names=["k", "v", "f"])
    t = table_from_pyarrow(rb)
    specs = [AggSpec("v", "sum"), AggSpec("v", "count"),
             AggSpec("v", "min"), AggSpec("v", "max"),
             AggSpec("v", "mean"), AggSpec("f", "sum"),
             AggSpec("f", "min"), AggSpec("k", "count_all")]
    whole = group_by(t, ["k"], specs).to_pydict()
    monkeypatch.setattr(gb, "_SORT_AGG_CHUNK", 700)
    chunked = group_by(t, ["k"], specs).to_pydict()
    for k in whole:
        for a, b in zip(whole[k], chunked[k]):
            if isinstance(a, float):
                assert (np.isnan(a) and np.isnan(b)) or \
                    abs(a - b) <= 1e-9 * max(1, abs(a)), (k, a, b)
            else:
                assert a == b, (k, a, b)


from arrow_tpu.ops.join import join_indices


@pytest.mark.parametrize("seed", range(3))
def test_join_random_m_to_n(seed):
    """Randomized m:n join vs a numpy oracle (exercises the sort-merge
    probe + cummax-packed expansion end to end)."""
    rng = np.random.default_rng(seed)
    n_l = int(rng.integers(1, 700))
    n_r = int(rng.integers(1, 400))
    pk = rng.integers(0, 40, n_l)
    bk = rng.integers(0, 40, n_r)
    pmask = rng.random(n_l) < 0.9
    bmask = rng.random(n_r) < 0.9
    L = at.Table.from_pyarrow(pa.record_batch(
        {"k": pa.array(pk, mask=~pmask)}))
    R = at.Table.from_pyarrow(pa.record_batch(
        {"k": pa.array(bk, mask=~bmask)}))
    li, ri = join_indices(L, R, ["k"])
    got = sorted(zip(np.asarray(li).tolist(), np.asarray(ri).tolist()))
    exp = sorted((i, j)
                 for i in range(n_l) if pmask[i]
                 for j in range(n_r) if bmask[j] and pk[i] == bk[j])
    assert got == exp
    # probe-ordered output
    assert (np.diff(np.asarray(li)) >= 0).all()
