"""Pallas kernel tests (interpreter mode on the CPU backend).

Kernels are exercised two ways: directly (exact-equality vs a numpy
oracle) and through group_by with ARROW_TPU_USE_PALLAS=1, comparing
against the XLA fallback path the rest of the suite validates against
pyarrow.  Shapes stay small — the Pallas interpreter is slow.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import arrow_tpu as at
from arrow_tpu.kernels.segagg import grouped_sum_count, grouped_count
from arrow_tpu.kernels.groupminmax import grouped_min_max
from arrow_tpu.ops.groupby import group_by, AggSpec


def _np_groups(vals, codes, valid, G):
    sums = np.zeros(G, np.int64)
    counts = np.zeros(G, np.int64)
    mins, maxs = {}, {}
    for g in range(G):
        m = (codes == g) & valid
        counts[g] = m.sum()
        if m.any():
            sums[g] = vals[m].sum()
            mins[g] = vals[m].min()
            maxs[g] = vals[m].max()
    return sums, counts, mins, maxs


@pytest.mark.parametrize("dtype,lo,hi", [
    (np.int64, -10**17, 10**17),
    (np.int32, -2**31, 2**31),
    (np.uint64, 0, 2**63),
    (np.int16, -2**15, 2**15),
])
def test_grouped_sum_count_exact(rng, dtype, lo, hi):
    n, G = 3000, 37
    vals = rng.integers(lo, hi, n).astype(dtype)
    codes = rng.integers(0, G, n).astype(np.int32)
    valid = rng.random(n) > 0.25
    s, c = grouped_sum_count(jnp.asarray(vals), jnp.asarray(codes),
                             jnp.asarray(valid), G)
    exp_s, exp_c, _, _ = _np_groups(vals.astype(np.int64), codes, valid, G)
    assert (np.asarray(c) == exp_c).all()
    assert (np.asarray(s) == exp_s).all()


def test_grouped_sum_wrapping(rng):
    # wrapping i64 sums match a sequential wrapping loop in any order
    n, G = 1100, 3
    vals = rng.integers(2**62, 2**63, n).astype(np.uint64).astype(np.int64)
    codes = rng.integers(0, G, n).astype(np.int32)
    valid = np.ones(n, bool)
    s, _ = grouped_sum_count(jnp.asarray(vals), jnp.asarray(codes),
                             jnp.asarray(valid), G)
    exp = np.zeros(G, np.int64)
    for g in range(G):
        exp[g] = vals[codes == g].sum()      # numpy wraps
    assert (np.asarray(s) == exp).all()


def test_grouped_count_none_valid(rng):
    n, G = 2500, 140          # G > 128 exercises lane padding
    codes = rng.integers(0, G, n).astype(np.int32)
    c = grouped_count(jnp.asarray(codes), None, G)
    exp = np.bincount(codes, minlength=G)
    assert (np.asarray(c) == exp).all()


@pytest.mark.parametrize("dtype,lo,hi", [
    (np.int64, -10**17, 10**17),
    (np.uint32, 0, 2**32),
    (np.int8, -128, 128),
])
def test_grouped_min_max_exact(rng, dtype, lo, hi):
    n, G = 3000, 37
    vals = rng.integers(lo, hi, n).astype(dtype)
    codes = rng.integers(0, G, n).astype(np.int32)
    valid = rng.random(n) > 0.25
    mn, mx = grouped_min_max(jnp.asarray(vals), jnp.asarray(codes),
                             jnp.asarray(valid), G)
    _, counts, mins, maxs = _np_groups(vals, codes, valid, G)
    mn, mx = np.asarray(mn), np.asarray(mx)
    for g in range(G):
        if counts[g]:
            assert mn[g] == mins[g], g
            assert mx[g] == maxs[g], g


def test_group_by_pallas_matches_xla(rng, monkeypatch):
    # general (sorted) path: Pallas kernels vs XLA segment ops
    n = 4000
    keys = rng.integers(0, 11, n).astype(np.int64)
    vals = rng.integers(-1000, 1000, n).astype(np.int64)
    kv = np.where(rng.random(n) > 0.1, True, False)
    vv = np.where(rng.random(n) > 0.1, True, False)
    t = at.Table.from_pydict({
        "k": at.column(keys, validity=kv),
        "v": at.column(vals, validity=vv),
    })
    aggs = [AggSpec("v", "sum"), AggSpec("v", "count"),
            AggSpec("v", "min"), AggSpec("v", "max"),
            AggSpec("v", "mean"), AggSpec("v", "count_all")]

    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "0")
    ref = group_by(t, ["k"], aggs).to_pydict()
    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "1")
    got = group_by(t, ["k"], aggs).to_pydict()
    assert got == ref


def test_group_by_dictionary_fast_path(rng, monkeypatch):
    # dictionary-key fast path (no row sort) vs the general path
    n = 3000
    codes = rng.integers(0, 5, n)
    kv = rng.random(n) > 0.1
    vals = rng.integers(-10**9, 10**9, n).astype(np.int64)
    vv = rng.random(n) > 0.2
    dict_col = at.DictionaryColumn(
        jnp.asarray(codes.astype(np.int32)),
        at.column(["a", "b", "c", "d", "e"]),
        jnp.asarray(kv))
    t = at.Table.from_pydict({
        "k": dict_col,
        "v": at.column(vals, validity=vv),
    })
    aggs = [AggSpec("v", "sum"), AggSpec("v", "count"),
            AggSpec("v", "min"), AggSpec("v", "max"),
            AggSpec("v", "count_all")]

    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "0")
    ref = group_by(t, ["k"], aggs).to_pydict()
    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "1")
    got = group_by(t, ["k"], aggs).to_pydict()
    assert got == ref


def test_compact_mask_arrays_kernel(rng):
    """MXU permutation compaction vs numpy (interpreter mode)."""
    from arrow_tpu.kernels.compact import compact_mask_arrays
    n = 2500
    keep = rng.random(n) < 0.4
    x = rng.integers(-10**17, 10**17, n).astype(np.int64)
    y = rng.random(n).astype(np.float32)
    f = rng.integers(0, 2, n).astype(bool)
    u = rng.integers(0, 2**62, n).astype(np.uint64)
    outs, count = compact_mask_arrays(
        jnp.asarray(keep), [jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(f), jnp.asarray(u)])
    c = int(count)
    assert c == keep.sum()
    assert (np.asarray(outs[0][:c]) == x[keep]).all()
    assert (np.asarray(outs[1][:c]) == y[keep]).all()
    assert (np.asarray(outs[2][:c]) == f[keep]).all()
    assert (np.asarray(outs[3][:c]) == u[keep]).all()


def test_filter_table_pallas_route(rng, monkeypatch):
    """filter_table through the Pallas compaction matches the sort path."""
    import arrow_tpu as at
    from arrow_tpu.ops.filter import filter_table
    n = 2000
    t = at.Table.from_pydict({
        "a": at.column(rng.integers(-100, 100, n).astype(np.int64),
                       validity=rng.random(n) > 0.1),
        "b": at.column(rng.integers(0, 9, n).astype(np.int32)),
        "c": at.column(rng.integers(0, 2**40, n).astype(np.uint64)),
    })
    pred = at.column(rng.random(n) < 0.5)
    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "0")
    ref = filter_table(t, pred).to_pydict()
    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "1")
    got = filter_table(t, pred).to_pydict()
    assert got == ref


def test_grouped_min_max_float32(rng):
    n, G = 2000, 19
    vals = rng.normal(0, 1e6, n).astype(np.float32)
    vals[rng.random(n) < 0.05] = np.inf
    vals[rng.random(n) < 0.05] = -np.inf
    codes = rng.integers(0, G, n).astype(np.int32)
    valid = rng.random(n) > 0.2
    mn, mx = grouped_min_max(jnp.asarray(vals), jnp.asarray(codes),
                             jnp.asarray(valid), G)
    mn, mx = np.asarray(mn), np.asarray(mx)
    for g in range(G):
        m = (codes == g) & valid
        if m.any():
            assert mn[g] == vals[m].min(), g
            assert mx[g] == vals[m].max(), g


def test_group_by_float_minmax_fast_path(rng, monkeypatch):
    n = 1500
    codes = rng.integers(0, 4, n)
    vals = rng.normal(0, 100, n).astype(np.float32)
    t = at.Table.from_pydict({
        "k": at.DictionaryColumn(jnp.asarray(codes.astype(np.int32)),
                                 at.column(["a", "b", "c", "d"])),
        "v": at.column(vals),
    })
    aggs = [AggSpec("v", "min"), AggSpec("v", "max")]
    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "0")
    ref = group_by(t, ["k"], aggs).to_pydict()
    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "1")
    got = group_by(t, ["k"], aggs).to_pydict()
    assert got == ref


def test_fast_agg_chunked_matches_unchunked(monkeypatch):
    """The >64M-row chunked dictionary fast path merges per-group
    partials in the kernel's encoded order space (decoded floats
    collapse NaN with empty-group identities — measured bug)."""
    import jax.numpy as jnp
    from arrow_tpu.ops import groupby as gb
    from arrow_tpu.ops.groupby import group_by, AggSpec
    monkeypatch.setenv("ARROW_TPU_USE_PALLAS", "1")
    codes = np.array([0] * 8 + [1] * 8 + [2] * 8, np.int32)
    vals = np.full(24, np.nan)
    vals[:8] = np.arange(8)
    vals[16:] = [1.5] + [np.nan] * 7
    t = at.Table.from_pydict({
        "g": at.DictionaryColumn(jnp.asarray(codes),
                                 at.column(["a", "b", "c"])),
        "v": at.column(jnp.asarray(vals, dtype=jnp.float32)),
        "w": at.column(jnp.asarray(np.arange(24, dtype=np.int64) * 3)),
    })
    specs = [AggSpec("v", "min"), AggSpec("v", "max"),
             AggSpec("w", "sum"), AggSpec("w", "min"),
             AggSpec("w", "max"), AggSpec("v", "count")]
    monkeypatch.setattr(gb, "_FAST_AGG_CHUNK", 8)
    chunked = group_by(t, ["g"], specs).to_pydict()
    monkeypatch.setattr(gb, "_FAST_AGG_CHUNK", 10 ** 9)
    whole = group_by(t, ["g"], specs).to_pydict()
    for k in chunked:
        for a, b in zip(chunked[k], whole[k]):
            if isinstance(a, float) and np.isnan(a):
                assert np.isnan(b), k
            else:
                assert a == b, k
    # NaN-only group stays NaN; group absent from later chunks keeps
    # its real extremes
    assert chunked["v_min"][0] == 0.0 and chunked["v_max"][0] == 7.0
    assert np.isnan(chunked["v_min"][1])
