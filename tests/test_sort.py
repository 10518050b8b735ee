"""Sort/rank/partition goldens vs pyarrow (arrow-ord parity) and
row-format ordering invariants (arrow-row parity)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.ops.row_format import SortOptions
from arrow_tpu.utils.bench_util import (create_primitive_array,
                                        create_string_array,
                                        create_string_dict_array)
from util import assert_column_equals_pa


SORT_ARRAYS = [
    create_primitive_array(500, 0.0, np.int64, lo=-50, hi=50),
    create_primitive_array(500, 0.2, np.int64, lo=-50, hi=50),
    create_primitive_array(500, 0.3, np.float64),
    create_primitive_array(500, 0.1, np.uint32),
    create_string_array(500, 0.2, cardinality=30),
    create_string_dict_array(500, 0.2, cardinality=30),
]


def pa_sorted(arr, descending=False, nulls_first=True):
    order = "descending" if descending else "ascending"
    placement = "at_start" if nulls_first else "at_end"
    return arr.take(pc.array_sort_indices(arr, order=order,
                                          null_placement=placement))


@pytest.mark.parametrize("arr", SORT_ARRAYS, ids=lambda a: str(a.type))
@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("nulls_first", [True, False])
def test_sort_values_golden(arr, descending, nulls_first):
    got = ops.sort(at.column(arr), SortOptions(descending, nulls_first))
    assert_column_equals_pa(got, pa_sorted(arr, descending, nulls_first))


def test_sort_indices_stable():
    """Stable indices match pyarrow's stable sort_indices."""
    arr = create_primitive_array(300, 0.2, np.int64, lo=-5, hi=5)
    got = ops.sort_to_indices(at.column(arr))
    exp = pc.array_sort_indices(arr, null_placement="at_start")
    assert got.to_pylist() == exp.to_pylist()


def test_sort_limit():
    arr = create_primitive_array(1000, 0.1, np.int64)
    got = ops.sort(at.column(arr), limit=10)
    exp = pa_sorted(arr).slice(0, 10)
    assert_column_equals_pa(got, exp)


def test_float_total_order():
    """NaN > +inf, -NaN ... reference total_cmp semantics; nulls first."""
    col = at.column([1.5, float("nan"), None, -0.0, 0.0, float("-inf"),
                     float("inf")])
    got = ops.sort(col).to_pylist()
    assert got[0] is None
    assert got[1] == float("-inf")
    assert str(got[2]) == "-0.0"
    assert got[3] == 0.0
    assert got[4] == 1.5
    assert got[5] == float("inf")
    assert np.isnan(got[6])


def test_lexsort_golden():
    t = pa.table({
        "a": create_primitive_array(400, 0.2, np.int64, lo=0, hi=5, seed=1),
        "b": create_string_array(400, 0.2, cardinality=5, seed=2),
    })
    got = ops.lexsort_to_indices([
        ops.SortColumn(at.column(t.column("a").combine_chunks())),
        ops.SortColumn(at.column(t.column("b").combine_chunks())),
    ])
    exp = pc.sort_indices(t, sort_keys=[("a", "ascending"),
                                        ("b", "ascending")],
                          null_placement="at_start")
    assert got.to_pylist() == exp.to_pylist()


def test_lexsort_mixed_directions():
    a = at.column([1, 1, 2, 2, 1, None])
    b = at.column([5.0, None, 1.0, 2.0, 6.0, 0.0])
    idx = ops.lexsort_to_indices([
        ops.SortColumn(a, SortOptions(descending=False, nulls_first=True)),
        ops.SortColumn(b, SortOptions(descending=True, nulls_first=False)),
    ])
    t = pa.table({"a": [1, 1, 2, 2, 1, None],
                  "b": [5.0, None, 1.0, 2.0, 6.0, 0.0]})
    exp = pc.sort_indices(
        t, sort_keys=[("a", "ascending"), ("b", "descending")],
        null_placement="at_start")
    # pyarrow applies one null_placement globally; our per-column
    # nulls_first matches arrow-rs. Check b's descending nulls-last
    # ordering directly instead:
    rows = [(x, y) for x, y in
            zip(ops.take(a, idx).to_pylist(), ops.take(b, idx).to_pylist())]
    assert rows == [(None, 0.0), (1, 6.0), (1, 5.0), (1, None),
                    (2, 2.0), (2, 1.0)]


def test_rank_reference_doctest():
    """arrow-ord/src/rank.rs doctest: [foo, None, foo, None, bar] ->
    [5, 2, 5, 2, 3]."""
    got = ops.rank(at.column(["foo", None, "foo", None, "bar"]))
    assert np.asarray(got).tolist() == [5, 2, 5, 2, 3]


def test_rank_golden():
    arr = create_primitive_array(300, 0.2, np.int64, lo=-10, hi=10)
    got = np.asarray(ops.rank(at.column(arr)))
    exp = pc.rank(arr, sort_keys="ascending", null_placement="at_start",
                  tiebreaker="max").to_numpy()
    np.testing.assert_array_equal(got, exp)


def test_partition():
    p = ops.partition([at.column([1, 1, 2, 2, 2, None, None])])
    assert p.ranges() == [(0, 2), (2, 5), (5, 7)]
    # multi-column
    p2 = ops.partition([at.column([1, 1, 1, 2]),
                        at.column(["a", "a", "b", "b"])])
    assert p2.ranges() == [(0, 2), (2, 3), (3, 4)]
    assert len(ops.partition([at.column([], at.int64)]).ranges()) == 0


def test_partition_mask_device_and_jittable():
    import jax
    cols = [at.column([1, 1, 2, 2, 2, None, None]),
            at.column([1.0, 1.0, float("nan"), float("nan"), 2.0, 0.0, 0.0])]
    m = np.asarray(ops.partition_mask(cols))
    np.testing.assert_array_equal(
        m, [True, False, True, False, True, True, False])
    # NaNs compare equal; float column alone
    m2 = np.asarray(ops.partition_mask([cols[1]]))
    np.testing.assert_array_equal(
        m2, [True, False, True, False, True, True, False])
    # stays jittable (fuse-friendly): run-count under jit
    f = jax.jit(lambda: ops.partition_mask(cols).sum())
    assert int(f()) == 4
    assert np.asarray(ops.partition_mask([at.column([], at.int64)])).size == 0


def test_sort_table():
    t = at.Table.from_pydict({"k": [2, 1, 2, None], "v": [1.0, 2.0, 3.0, 4.0]})
    got = ops.sort_table(t, [("k", SortOptions())])
    assert got.to_pydict() == {"k": [None, 1, 2, 2], "v": [4.0, 2.0, 1.0, 3.0]}


class TestRowFormat:
    def test_argsort_matches_lexsort(self):
        cols = [at.column(create_primitive_array(200, 0.2, np.int64,
                                                 lo=0, hi=4, seed=3)),
                at.column(create_primitive_array(200, 0.1, np.float64,
                                                 seed=4))]
        fields = [ops.SortField(), ops.SortField()]
        conv = ops.RowConverter(fields)
        rows = conv.convert_columns(cols)
        got = rows.argsort().tolist()
        exp = ops.lexsort_to_indices([ops.SortColumn(c) for c in cols])
        assert got == exp.to_pylist()

    def test_roundtrip(self):
        cols = [at.column([3, None, 1, -7]),
                at.column([1.5, 2.5, None, float("nan")]),
                at.column([True, False, None, True])]
        conv = ops.RowConverter([ops.SortField()] * 3)
        rows = conv.convert_columns(cols)
        back = conv.convert_rows(rows, cols)
        for orig, rt in zip(cols, back):
            np.testing.assert_array_equal(
                np.asarray(orig.is_valid_mask()),
                np.asarray(rt.is_valid_mask()))
            np.testing.assert_array_equal(np.asarray(orig.values),
                                          np.asarray(rt.values))

    def test_descending_field(self):
        col = at.column([5, 1, None, 3])
        conv = ops.RowConverter([ops.SortField(
            SortOptions(descending=True, nulls_first=False))])
        rows = conv.convert_columns([col])
        assert ops.take(col, at.PrimitiveColumn(
            rows.argsort(), at.uint32)).to_pylist() == [5, 3, 1, None]

    def test_rows_memcmp_contract(self):
        """byte-lexicographic order == logical row order."""
        cols = [at.column([2, 1, 1, None]), at.column(["b", "z", "a", "a"])]
        conv = ops.RowConverter([ops.SortField(), ops.SortField()])
        rows = np.asarray(conv.convert_columns(cols).data)
        order = sorted(range(4), key=lambda i: rows[i].tobytes())
        exp = ops.lexsort_to_indices(
            [ops.SortColumn(c) for c in cols]).to_pylist()
        assert order == exp


def test_row_format_varlen_strings(rng):
    """arrow-row variable-length string encoding (variable.rs:28-100):
    memcmp order == string order (nulls/empties included), byte-faithful
    block layout, and lossless decode without a dictionary."""
    import arrow_tpu as at
    from arrow_tpu.ops.row_format import RowConverter, SortField, SortOptions

    vals = ["hello", "", None, "hell", "a" * 40, "a" * 32, "b", None, "az"]
    col = at.column(vals)
    conv = RowConverter([SortField()])
    rows = conv.convert_columns([col])

    # spec-pinned layout: "hello" -> 0x02 'h' 'e' 'l' 'l' 'o' 0x00*27 0x06
    r0 = rows.to_numpy()[0]
    assert r0[0] == 0x02
    assert bytes(r0[1:6]) == b"hello"
    assert (r0[6:33] == 0).all() and r0[33] == 0x06
    # empty -> 0x01 tag only; null -> 0x00 (nulls first)
    assert rows.to_numpy()[1][0] == 0x01
    assert rows.to_numpy()[2][0] == 0x00
    # 40-byte string: first block continued with 0xFF token
    r4 = rows.to_numpy()[4]
    assert r4[33] == 0xFF and r4[66] == 9  # 8 bytes in final block + 1

    # memcmp order == (nulls first, then string order)
    import numpy as np
    order = np.asarray(rows.argsort())
    got = [vals[i] for i in order]
    expect = sorted(range(len(vals)),
                    key=lambda i: (vals[i] is not None, vals[i] or ""))
    assert got == [vals[i] for i in expect]

    # lossless inverse
    back, = conv.convert_rows(rows, [col])
    assert back.to_pylist() == vals


def test_row_format_varlen_descending():
    import arrow_tpu as at
    import numpy as np
    from arrow_tpu.ops.row_format import RowConverter, SortField, SortOptions
    vals = ["b", None, "a", "ab"]
    col = at.column(vals)
    conv = RowConverter([SortField(SortOptions(descending=True,
                                            nulls_first=False))])
    rows = conv.convert_columns([col])
    order = np.asarray(rows.argsort())
    assert [vals[i] for i in order] == ["b", "ab", "a", None]
    back, = conv.convert_rows(rows, [col])
    assert back.to_pylist() == vals


from arrow_tpu.io.interop import table_from_pyarrow, table_to_pyarrow
from arrow_tpu.ops.sort import sort_table
import pyarrow.compute as pc


class TestSortTableDecode:
    """sort_table's key-decode path: key columns are recovered from the
    sorted key bits (row_format.decode_sorted_group), not gathered."""

    def _make(self, n=800, seed=3):
        rng = np.random.default_rng(seed)
        null = rng.random(n) < 0.15
        rb = pa.record_batch([
            pa.array(rng.integers(-100, 100, n), pa.int64(), mask=null),
            pa.array([f"w{i % 7}" for i in range(n)],
                     pa.string()).dictionary_encode(),
            pa.array(rng.normal(size=n), pa.float64()),
            pa.array(rng.integers(0, 2, n) > 0, pa.bool_()),
            pa.array(rng.integers(0, 1000, n), pa.uint16()),
        ], names=["k", "d", "f", "b", "u"])
        return table_from_pyarrow(rb), rb

    @pytest.mark.parametrize("desc,nf", [(False, True), (True, False),
                                         (True, True), (False, False)])
    def test_all_key_parity(self, desc, nf):
        t, rb = self._make()
        keys = [("k", SortOptions(descending=desc, nulls_first=nf)),
                ("d", SortOptions()), ("f", SortOptions()),
                ("b", SortOptions()), ("u", SortOptions())]
        got = table_to_pyarrow(sort_table(t, keys))
        tbl = pa.table(rb).set_column(
            1, "d", pa.table(rb).column("d").cast(pa.string()))
        order = "descending" if desc else "ascending"
        place = "at_start" if nf else "at_end"
        idx = pc.sort_indices(
            tbl, sort_keys=[("k", order)] + [(c, "ascending")
                                             for c in "dfbu"],
            null_placement=place)
        want = tbl.take(idx)
        for c in ("k", "f", "b", "u"):
            assert got.column(c).to_pylist() == \
                want.column(c).to_pylist(), (c, desc, nf)
        assert got.column("d").cast(pa.string()).to_pylist() == \
            want.column("d").to_pylist()

    def test_nonkey_columns_ride_gather(self):
        t, rb = self._make()
        got = table_to_pyarrow(sort_table(t, [("k", SortOptions())]))
        idx = pc.sort_indices(pa.table(rb),
                              sort_keys=[("k", "ascending")],
                              null_placement="at_start")
        want = pa.table(rb).take(idx)
        for c in ("k", "f", "b", "u"):
            assert got.column(c).to_pylist() == want.column(c).to_pylist()

    def test_limit(self):
        t, rb = self._make()
        got = table_to_pyarrow(sort_table(
            t, [("f", SortOptions())], limit=17))
        assert got.num_rows == 17
        idx = pc.sort_indices(pa.table(rb),
                              sort_keys=[("f", "ascending")])[:17]
        want = pa.table(rb).take(idx)
        assert got.column("f").to_pylist() == want.column("f").to_pylist()
        assert got.column("k").to_pylist() == want.column("k").to_pylist()

    def test_float_nan_and_temporal(self):
        vals = [3.5, float("nan"), -0.0, float("inf"), None,
                float("-inf"), 1.0]
        rb = pa.record_batch([
            pa.array(vals, pa.float64()),
            pa.array(list(range(7)), pa.int64()).cast(
                pa.timestamp("us")),
        ], names=["f", "ts"])
        t = table_from_pyarrow(rb)
        got = table_to_pyarrow(sort_table(
            t, [("f", SortOptions()), ("ts", SortOptions())]))
        # ascending totalOrder: -inf < -0.0 < 1.0 < 3.5 < inf < NaN,
        # nulls first
        fl = got.column("f").to_pylist()
        assert fl[0] is None and fl[1] == float("-inf")
        assert np.isnan(fl[-1]) and fl[-2] == float("inf")
        assert got.column("ts").to_pylist() == \
            [pa.table(rb).column("ts").to_pylist()[i]
             for i in [4, 5, 2, 6, 0, 3, 1]]


def test_sort_table_payload_mode(monkeypatch):
    """At scale, non-key primitive columns ride the sort as payload
    operands instead of a take gather; outputs must match the gather
    path exactly (crossover lowered to force the payload path)."""
    import importlib
    so = importlib.import_module("arrow_tpu.ops.sort")
    rng = np.random.default_rng(11)
    n = 4000
    t = at.Table.from_pydict({
        "k": rng.integers(0, 64, n),
        "v": rng.standard_normal(n),
        "w": rng.integers(-50, 50, n).astype(np.int32),
        "s": [f"w{int(i) % 9}" for i in rng.integers(0, 9, n)],
    })
    ref = so.sort_table(t, [("k", so.SortOptions())])
    monkeypatch.setattr(so, "_PAYLOAD_CROSSOVER", 10)
    got = so.sort_table(t, [("k", so.SortOptions())])
    assert got.to_pydict() == ref.to_pydict()
    got2 = so.sort_table(t, [("k", so.SortOptions(descending=True))],
                         limit=57)
    ref2 = ref  # recompute reference with the normal path
    monkeypatch.setattr(so, "_PAYLOAD_CROSSOVER", 50_000_000)
    ref2 = so.sort_table(t, [("k", so.SortOptions(descending=True))],
                         limit=57)
    assert got2.to_pydict() == ref2.to_pydict()


class TestNestedSort:
    """sort of list/fsl/fsb/struct/interval columns (sort.rs:208-240
    child_rank design; struct via the make_comparator role)."""

    def test_list_asc_nulls_first(self):
        c = at.column([[3], None, [1, 2], [1], [], [1, None]],
                      at.dtypes.list_(at.int64))
        assert ops.sort(c).to_pylist() == \
            [None, [], [1], [1, None], [1, 2], [3]]

    def test_list_desc_nulls_last(self):
        # child nulls_first inverts with descending (sort.rs:516) so the
        # reversed comparator leaves child nulls ordered consistently
        c = at.column([[3], None, [1, 2], [1], [], [1, None]],
                      at.dtypes.list_(at.int64))
        got = ops.sort(c, SortOptions(descending=True,
                                      nulls_first=False)).to_pylist()
        assert got == [[3], [1, 2], [1, None], [1], [], None]

    def test_fsb_and_struct(self):
        f = at.column([b"zz", None, b"aa", b"mm"],
                      at.dtypes.fixed_size_binary(2))
        assert ops.sort(f).to_pylist() == [None, b"aa", b"mm", b"zz"]
        st = at.column(
            [{"a": 2, "b": "x"}, None, {"a": 1, "b": "z"},
             {"a": 1, "b": "a"}],
            at.dtypes.struct([at.dtypes.Field("a", at.int64),
                              at.dtypes.Field("b", at.utf8)]))
        assert ops.sort(st).to_pylist() == \
            [None, {"a": 1, "b": "a"}, {"a": 1, "b": "z"},
             {"a": 2, "b": "x"}]

    def test_interval_mdn_field_order(self):
        # Ord derives (months, days, nanos) lexicographic
        # (arrow-buffer/src/interval.rs:68)
        m = at.column([(2, 0, 0), (1, 5, 0), None, (1, 2, 3)],
                      at.dtypes.interval("month_day_nano"))
        got = [None if v is None else (v.months, v.days, v.nanoseconds)
               for v in ops.sort(m).to_pylist()]
        assert got == [None, (1, 2, 3), (1, 5, 0), (2, 0, 0)]

    def test_lexsort_nested_with_primitive(self):
        from arrow_tpu.ops.sort import SortColumn
        c = at.column([[2], [1], [1], None], at.dtypes.list_(at.int64))
        tie = at.column([9, 5, 3, 1])
        idx = ops.lexsort_to_indices([SortColumn(c), SortColumn(tie)])
        assert list(np.asarray(idx.values)) == [3, 2, 1, 0]

    def test_rank_and_float_nan_children(self):
        nan = float("nan")
        c = at.column([[nan], [1.0], [2.0]],
                      at.dtypes.list_(at.float64))
        # NaN ranks above all numbers (totalOrder), so [nan] sorts last
        out = ops.sort(c).to_pylist()
        assert out[0] == [1.0] and out[1] == [2.0]
        assert out[2][0] != out[2][0]
        r = np.asarray(ops.rank(at.column([[1], [1], None],
                                          at.dtypes.list_(at.int64))))
        assert list(r) == [3, 3, 1]


def test_sort_table_mixed_nested_key():
    """Decodable primary + host-ranked nested secondary in one table
    sort; the nested key column itself rides the gather."""
    t = at.Table.from_pydict({
        "k": [2, 1, 2, 1],
        "n": at.column([[1], [2], None, [0]], at.dtypes.list_(at.int64))})
    out = ops.sort_table(t, [("k", SortOptions()), ("n", SortOptions())])
    assert out.to_pydict() == {"k": [1, 1, 2, 2],
                               "n": [[0], [2], None, [1]]}


def test_make_comparator_nested():
    """ord.rs:28: nested comparisons go through make_comparator (cmp
    kernels reject them); ranks agree across the two arrays."""
    from arrow_tpu.ops.ord import make_comparator
    a = at.column([[1, 2], None, [5]], at.dtypes.list_(at.int64))
    b = at.column([[1, 2, 0], [0]], at.dtypes.list_(at.int64))
    cmp = make_comparator(a, b)
    assert cmp(0, 0) == -1       # [1,2] < [1,2,0] (prefix shorter)
    assert cmp(2, 1) == 1        # [5] > [0]
    assert cmp(1, 0) == -1       # null first by default
    s = at.dtypes.struct([at.dtypes.Field("x", at.int64)])
    sa = at.column([{"x": 3}], s)
    sb = at.column([{"x": 3}, {"x": 9}], s)
    c2 = make_comparator(sa, sb)
    assert c2(0, 0) == 0 and c2(0, 1) == -1


def test_lexsort_decodable_fast_path():
    """lexsort over all-decodable keys returns sorted columns via the
    key-bit decode (sort.rs:766 lexsort role) — regression: the fast
    path mis-unpacked _decode_sort's 3-tuple."""
    a = at.column([3, 1, 2, 1, None])
    b = at.column([1.0, 2.0, 3.0, 0.5, 9.9])
    out = ops.lexsort([ops.SortColumn(a), ops.SortColumn(b)])
    assert out[0].to_pylist() == [None, 1, 1, 2, 3]
    assert out[1].to_pylist() == [9.9, 0.5, 2.0, 3.0, 1.0]
    lim = ops.lexsort([ops.SortColumn(a), ops.SortColumn(b)], limit=2)
    assert [c.to_pylist() for c in lim] == [[None, 1], [9.9, 0.5]]


def test_sort_map_and_list_of_map_keys():
    """Host comparator ranks cover map cells (entries-list ordering) and
    maps nested inside lists (sort.rs:514 child_rank composition)."""
    from arrow_tpu.io.interop import column_from_pyarrow
    m = pa.array([[("b", 2)], None, [("a", 1)], []],
                 pa.map_(pa.string(), pa.int64()))
    got = ops.sort(column_from_pyarrow(m)).to_pylist()
    assert got == [None, [], [("a", 1)], [("b", 2)]]
    lm = pa.array([[[("a", 1)]], None, [[("b", 2)], [("a", 1)]], []],
                  pa.list_(pa.map_(pa.string(), pa.int64())))
    got = ops.sort(column_from_pyarrow(lm)).to_pylist()
    assert got == [None, [], [[("a", 1)]], [[("b", 2)], [("a", 1)]]]


def test_make_comparator_strings_cross_array():
    """String/dict ranks must be computed over the CONCAT of both
    arrays (ord.rs make_comparator) — per-array ranks mis-ordered
    'b' vs 'b'."""
    from arrow_tpu.ops.ord import make_comparator
    a = at.column(["b", "z"])
    b = at.column(["a", "b"])
    cmp = make_comparator(a, b)
    assert cmp(0, 1) == 0        # 'b' vs 'b'
    assert cmp(0, 0) == 1        # 'b' vs 'a'
    assert cmp(1, 1) == 1        # 'z' vs 'b'
    assert cmp(0, 0) == 1 and cmp(1, 0) == 1


def test_sort_dictionary_duplicate_values():
    """Dense ranks are non-unique for dictionaries with repeated
    values; the rank->slot inverse must map to a slot with the SAME
    value (argsort misaligned it)."""
    import jax.numpy as jnp
    from arrow_tpu.core.column import DictionaryColumn, StringColumn
    d = DictionaryColumn(jnp.asarray(np.array([2, 0], np.int32)),
                         StringColumn.from_pylist(["a", "a", "b"]), None)
    assert ops.sort(d).to_pylist() == ["a", "b"]


def test_string_ranks_trailing_nul():
    """b'a' and b'a\\x00' are distinct values (S-dtype NUL padding
    collapsed them); shorter sorts first."""
    from arrow_tpu.core.column import StringColumn
    s = StringColumn.from_pylist(["a\x00", "a", "b"])
    assert ops.sort(s).to_pylist() == ["a", "a\x00", "b"]


def test_rank_empty_column():
    from arrow_tpu.ops.sort import rank
    out = rank(at.column(np.zeros(0, np.int64)))
    assert len(np.asarray(out)) == 0


def test_day_time_interval_sort_signed_millis():
    """day_time low 32 bits are SIGNED millis: {0d,-1ms} sorts before
    {0d,+1ms} (lexicographic signed pair, interval.rs Ord)."""
    pos = (0 << 32) | 1
    neg = 0xFFFFFFFF & -1          # days=0, ms=-1
    c = at.column([pos, neg], dtype=at.interval("day_time"))
    out = ops.sort(c)
    got = np.asarray(out.values).tolist()
    assert got == [neg, pos], got


def test_sort_limit_topk_single_key():
    """sort(limit=k) on a single-key column rides lax.top_k (the
    partial_sort role, sort.rs:853); output matches full-sort prefix,
    indices stay stable."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, 500)          # many ties
    c = at.column(vals)
    for desc in (False, True):
        opt = ops.SortOptions(descending=desc)
        full = ops.sort(c, opt).to_pylist()
        lim = ops.sort(c, opt, limit=10).to_pylist()
        assert lim == full[:10], desc
        idx_full = np.asarray(ops.sort_to_indices(c, opt).values)[:10]
        idx_lim = np.asarray(ops.sort_to_indices(c, opt, limit=10).values)
        assert np.array_equal(idx_full, idx_lim), desc
    # nullable column (extra null-class key) takes the full-sort path
    # (arrow-rs SortOptions default: nulls first)
    cn = at.column([3, None, 1, 2, None])
    assert ops.sort(cn, limit=3).to_pylist() == [None, None, 1]
    f = at.column(rng.standard_normal(100))
    assert ops.sort(f, limit=5).to_pylist() == ops.sort(f).to_pylist()[:5]


def test_ordered_dictionary_flag():
    """dictionary_encode(ordered=True) (datatype.rs Dictionary ordered
    bool; arrow-row dictionary codec lib.rs:420): the flag rides the
    dtype, skips the host rank-verification in key_parts, survives
    IPC + C-ABI round-trips, and clears when concat merges foreign
    dictionaries."""
    import io
    import numpy as np
    import pyarrow as pa
    import arrow_tpu as at
    from arrow_tpu.ops import strings as s_ops
    from arrow_tpu.ops.concat import concat
    from arrow_tpu.ops import row_format as rf
    import importlib
    rfm = importlib.import_module("arrow_tpu.ops.row_format")

    c = at.column(["q", "b", "zz", "b", "a", "q"])
    d = s_ops.dictionary_encode(c, ordered=True)
    assert d.dtype.ordered and d.ordered
    assert s_ops.dictionary_encode(c).dtype.ordered is None

    # the fast path must not even CALL dictionary_value_ranks
    orig = rfm.dictionary_value_ranks
    try:
        def boom(values):
            raise AssertionError("rank verification ran")
        rfm.dictionary_value_ranks = boom
        parts = rfm.key_parts(d)
        assert parts[1] is None        # ranks skipped: codes ARE ranks
    finally:
        rfm.dictionary_value_ranks = orig
    # and the sort is still right
    from arrow_tpu.ops.sort import sort as sort_col, SortOptions
    assert sort_col(d, SortOptions()).to_pylist() == \
        ["a", "b", "b", "q", "q", "zz"]

    # slices / code rewraps keep the flag
    assert d.slice(1, 3).dtype.ordered
    assert d.with_codes(d.codes).dtype.ordered

    # IPC round-trip (Schema.fbs DictionaryEncoding.isOrdered)
    from arrow_tpu.io import ipc
    t = at.Table.from_pydict({"d": d})
    buf = io.BytesIO()
    ipc.write_stream(buf, t)
    back = ipc.read_stream(buf.getvalue())
    back = back[0] if isinstance(back, list) else back
    assert back.column("d").dtype.ordered
    assert back.column("d").to_pylist() == d.to_pylist()

    # C-ABI round-trip through pyarrow (ARROW_FLAG_DICTIONARY_ORDERED)
    pt = t.to_pyarrow()
    assert pt.schema.field("d").type.ordered
    back2 = at.Table.from_pyarrow(pt)
    assert back2.column("d").dtype.ordered

    # concat: shared dictionary keeps the flag; merged foreign
    # dictionaries clear it
    cc = concat([d, d.slice(0, 2)])
    assert cc.dtype.ordered and cc.to_pylist() == \
        d.to_pylist() + ["q", "b"]
    other = s_ops.dictionary_encode(at.column(["mm", "nn"]),
                                    ordered=True)
    mixed = concat([d, other])
    assert not bool(mixed.dtype.ordered)
    assert mixed.to_pylist() == d.to_pylist() + ["mm", "nn"]
