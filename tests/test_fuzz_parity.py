"""Randomized cross-implementation parity (the Archery tier-3 role,
SURVEY.md §4): random mixed-type batches run through the engine's
operators and through pyarrow.compute, outputs compared exactly.
Seeds are fixed — failures reproduce."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import jax.numpy as jnp

import arrow_tpu as at
from arrow_tpu.io.interop import (column_from_pyarrow, column_to_pyarrow,
                                  table_from_pyarrow, table_to_pyarrow)
from arrow_tpu.ops.sort import sort_to_indices, SortOptions
from arrow_tpu.ops.filter import filter as filter_kernel
from arrow_tpu.ops.take import take
from arrow_tpu.ops.cast import cast
from arrow_tpu import dtypes as dt


def _random_array(rng, n, kind):
    null = rng.random(n) < rng.choice([0.0, 0.1, 0.5])
    if kind == "i64":
        vals = rng.integers(-10**12, 10**12, n)
        arr = pa.array(vals, pa.int64(), mask=null)
    elif kind == "i32":
        arr = pa.array(rng.integers(-2**31, 2**31, n), pa.int32(),
                       mask=null)
    elif kind == "f64":
        vals = rng.normal(0, 1e6, n)
        vals[rng.random(n) < 0.05] = np.inf
        vals[rng.random(n) < 0.05] = -np.inf
        arr = pa.array(vals, pa.float64(), mask=null)
    elif kind == "bool":
        arr = pa.array(rng.random(n) < 0.5, pa.bool_(), mask=null)
    elif kind == "str":
        words = [f"w{i}" for i in range(17)] + [""]
        arr = pa.array([words[i] for i in rng.integers(0, 18, n)],
                       pa.string(), mask=null)
    elif kind == "ts":
        arr = pa.array(rng.integers(0, 2**40, n), pa.int64(),
                       mask=null).cast(pa.timestamp("us"))
    return arr


KINDS = ["i64", "i32", "f64", "bool", "str", "ts"]


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_sort_parity(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    kind = KINDS[seed % len(KINDS)]
    arr = _random_array(rng, n, kind)
    col = column_from_pyarrow(arr)
    for desc in (False, True):
        for nf in (True, False):
            ours = np.asarray(sort_to_indices(
                col, SortOptions(descending=desc, nulls_first=nf)).values)
            order = "descending" if desc else "ascending"
            place = "at_start" if nf else "at_end"
            want = pc.sort_indices(
                arr, sort_keys=[("x", order)],
                null_placement=place).to_numpy()
            # both stable -> identical permutations
            assert (ours == want).all(), (kind, n, desc, nf)


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_filter_take_parity(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 300))
    kind = KINDS[seed % len(KINDS)]
    arr = _random_array(rng, n, kind)
    col = column_from_pyarrow(arr)
    keep = rng.random(n) < 0.5
    ours = column_to_pyarrow(filter_kernel(
        col, at.column(keep))).to_pylist()
    want = arr.filter(pa.array(keep)).to_pylist()
    assert ours == want, (kind, n)

    idx = rng.integers(0, n, int(rng.integers(1, 200)))
    ours = column_to_pyarrow(take(col, at.column(idx))).to_pylist()
    want = arr.take(pa.array(idx)).to_pylist()
    assert ours == want, (kind, n)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_cast_parity(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(1, 300))
    pairs = [("i64", dt.float64, pa.float64()),
             ("i32", dt.int64, pa.int64()),
             ("f64", dt.float32, pa.float32()),
             ("ts", dt.date32, pa.date32())]
    kind, to_dt, to_pa = pairs[seed % len(pairs)]
    arr = _random_array(rng, n, kind)
    ours = column_to_pyarrow(cast(column_from_pyarrow(arr), to_dt))
    want = pc.cast(arr, to_pa)
    assert ours.to_pylist() == want.to_pylist(), (kind, n)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_table_roundtrip(seed):
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(1, 500))
    arrays = {f"c{i}": _random_array(rng, n, k)
              for i, k in enumerate(KINDS)}
    rb = pa.record_batch(list(arrays.values()), names=list(arrays))
    back = table_to_pyarrow(table_from_pyarrow(rb))
    assert back.equals(rb), n


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_group_by_parity(seed):
    from arrow_tpu.ops.groupby import group_by, AggSpec
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(2, 500))
    keys = pa.array(rng.integers(0, 9, n),
                    mask=rng.random(n) < 0.1)
    vals = pa.array(rng.integers(-1000, 1000, n),
                    mask=rng.random(n) < 0.2)
    rb = pa.record_batch([keys, vals], names=["k", "v"])
    t = table_from_pyarrow(rb)
    ours = group_by(t, ["k"], [AggSpec("v", "sum"), AggSpec("v", "count"),
                               AggSpec("v", "min"), AggSpec("v", "max"),
                               AggSpec("v", "mean")]).to_pydict()
    want_tbl = pa.table(rb).group_by("k").aggregate(
        [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max"),
         ("v", "mean")]).sort_by([("k", "ascending")])
    want = {c: want_tbl.column(c).to_pylist()
            for c in want_tbl.column_names}
    # pyarrow sorts nulls last in sort_by; our group order is nulls first
    def rot(lst):
        return lst[-1:] + lst[:-1] if want["k"][-1] is None else lst
    has_null_key = want["k"][-1] is None
    for col_ours, col_pa in (("k", "k"), ("v_sum", "v_sum"),
                             ("v_count", "v_count"), ("v_min", "v_min"),
                             ("v_max", "v_max"), ("v_mean", "v_mean")):
        w = rot(want[col_pa]) if has_null_key else want[col_pa]
        assert ours[col_ours] == w, (seed, col_ours, ours[col_ours], w)


def _random_dtype(rng, depth=0):
    leaves = [pa.int64(), pa.int32(), pa.float64(), pa.string(),
              pa.bool_(), pa.timestamp("us"), pa.date32()]
    if depth >= 2:
        return leaves[rng.integers(0, len(leaves))]
    r = rng.random()
    if r < 0.55:
        return leaves[rng.integers(0, len(leaves))]
    if r < 0.75:
        return pa.list_(_random_dtype(rng, depth + 1))
    if r < 0.9:
        k = max(1, int(rng.integers(1, 4)))
        return pa.struct([(f"f{i}", _random_dtype(rng, depth + 1))
                          for i in range(k)])
    return pa.map_(pa.string(), _random_dtype(rng, depth + 1))


def _random_value(rng, ty):
    if rng.random() < 0.12:
        return None
    if pa.types.is_list(ty):
        return [_random_value(rng, ty.value_type)
                for _ in range(int(rng.integers(0, 4)))]
    if pa.types.is_struct(ty):
        return {f.name: _random_value(rng, f.type) for f in ty}
    if pa.types.is_map(ty):
        return [(f"k{j}", _random_value(rng, ty.item_type))
                for j in range(int(rng.integers(0, 3)))]
    if pa.types.is_string(ty):
        return f"s{int(rng.integers(0, 50))}"
    if pa.types.is_boolean(ty):
        return bool(rng.integers(0, 2))
    if pa.types.is_floating(ty):
        return float(rng.standard_normal())
    if pa.types.is_date(ty):
        return int(rng.integers(-50000, 50000))   # python date range
    return int(rng.integers(-10**6, 10**6))


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_parquet_nested_write_read(seed):
    """Random nested schemas through the NATIVE parquet writer, read by
    BOTH Arrow C++ and our reader (levels.rs / array_reader fuzz tier)."""
    import io as _io
    from arrow_tpu.io.parquet_io import _native_writable
    from arrow_tpu.io.parquet_native import ParquetFile
    from arrow_tpu.io.parquet_writer import write_parquet_native
    rng = np.random.default_rng(seed + 100)
    n = int(rng.integers(1, 120))
    fields, cols = [], {}
    for i in range(int(rng.integers(1, 5))):
        ty = _random_dtype(rng)
        vals = [_random_value(rng, ty) for _ in range(n)]
        try:
            cols[f"c{i}"] = pa.array(vals, ty)
        except pa.lib.ArrowInvalid:
            continue
    if not cols:
        return
    tab = pa.table(cols)
    t = at.Table.from_pyarrow(tab)
    if not _native_writable(t.schema):
        return
    buf = _io.BytesIO()
    write_parquet_native(buf, t,
                         data_page_version=["1.0", "2.0"][seed % 2],
                         compression=["snappy", "none", "zstd"][seed % 3])
    data = buf.getvalue()
    import pyarrow.parquet as _pq
    ref = _pq.read_table(_io.BytesIO(data))
    ours = ParquetFile(data).read()
    for name in tab.column_names:
        assert ref[name].to_pylist() == tab[name].to_pylist(), \
            (seed, name)
        assert ours.column(name).to_pylist() == \
            tab[name].to_pylist(), (seed, name, "ours")


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_integration_json_roundtrip(seed):
    """Random nested tables through the integration JSON format
    (arrow-integration-test round-trip tier)."""
    import json as _json
    from arrow_tpu.io import integration_json as ij
    rng = np.random.default_rng(seed + 500)
    n = int(rng.integers(1, 60))
    cols = {}
    for i in range(int(rng.integers(1, 5))):
        ty = _random_dtype(rng)
        vals = [_random_value(rng, ty) for _ in range(n)]
        try:
            cols[f"c{i}"] = pa.array(vals, ty)
        except pa.lib.ArrowInvalid:
            continue
    if not cols:
        return
    t = at.Table.from_pyarrow(pa.table(cols))
    doc = _json.loads(_json.dumps(ij.table_to_json(t)))
    t2 = ij.table_from_json(doc)
    assert t.to_pydict() == t2.to_pydict()
    assert [f.dtype for f in t.schema.fields] == \
        [f.dtype for f in t2.schema.fields]


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_csv_writer_pyarrow_reads(seed):
    """Random flat tables through OUR vectorized CSV writer; pyarrow's
    CSV reader (explicit schema) must recover the exact values —
    quoting, escapes, unicode, nulls, shortest float repr."""
    import io
    import pyarrow.csv as pcsv
    from arrow_tpu.io.csv import WriterBuilder
    from arrow_tpu.io.interop import table_from_pyarrow
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 200))
    tricky = ["", "a,b", 'q"t', "line\nbreak", "semi;co", "βeta",
              "plain", " lead", "trail ", "\tab"]
    cols = {
        "i": _random_array(rng, n, "i64"),
        "f": _random_array(rng, n, "f64"),
        "b": _random_array(rng, n, "bool"),
        "s": pa.array([tricky[i] for i in rng.integers(0, len(tricky),
                                                       n)],
                      mask=rng.random(n) < 0.2),
    }
    tab = pa.table(cols)
    ours = table_from_pyarrow(tab)
    buf = io.BytesIO()
    WriterBuilder().write(buf, ours)
    got = pcsv.read_csv(
        io.BytesIO(buf.getvalue()),
        convert_options=pcsv.ConvertOptions(
            column_types={"i": pa.int64(), "f": pa.float64(),
                          "b": pa.bool_(), "s": pa.string()},
            strings_can_be_null=False),
        parse_options=pcsv.ParseOptions(newlines_in_values=True))
    assert got["i"].to_pylist() == tab["i"].to_pylist()
    fb = got["f"].to_pylist()
    fa = tab["f"].to_pylist()
    for x, y in zip(fa, fb):
        assert (x is None and y is None) or x == y or \
            (x in (np.inf, -np.inf) and y == x)
    assert got["b"].to_pylist() == tab["b"].to_pylist()
    # CSV cannot distinguish null from "" for strings (both empty field)
    want_s = ["" if v is None else v for v in tab["s"].to_pylist()]
    got_s = ["" if v is None else v for v in got["s"].to_pylist()]
    assert got_s == want_s


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_json_writer_pyarrow_reads(seed):
    """Random flat tables through OUR vectorized JSON lines writer;
    pyarrow's JSON reader must recover the exact values."""
    import io
    import pyarrow.json as pjson
    from arrow_tpu.io.json_io import WriterBuilder
    from arrow_tpu.io.interop import table_from_pyarrow
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(1, 200))
    tricky = ["", 'q"t', "line\nbreak", "βeta", "back\\slash",
              "\x01ctl", "plain"]
    tab = pa.table({
        "i": _random_array(rng, n, "i64"),
        "b": _random_array(rng, n, "bool"),
        "s": pa.array([tricky[i] for i in rng.integers(0, len(tricky),
                                                       n)],
                      mask=rng.random(n) < 0.2),
    })
    ours = table_from_pyarrow(tab)
    buf = io.BytesIO()
    WriterBuilder("lines").write(buf, ours)
    got = pjson.read_json(
        io.BytesIO(buf.getvalue()),
        parse_options=pjson.ParseOptions(explicit_schema=pa.schema(
            [("i", pa.int64()), ("b", pa.bool_()), ("s", pa.string())])))
    assert got["i"].to_pylist() == tab["i"].to_pylist()
    assert got["b"].to_pylist() == tab["b"].to_pylist()
    assert got["s"].to_pylist() == tab["s"].to_pylist()


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_join_parity(seed):
    """Random multi-key joins vs pyarrow acero (config-5 operator
    tier): inner/left/semi/anti, null keys, duplicate build keys.
    Row order is implementation-defined, so compare sorted row sets."""
    from arrow_tpu.ops.join import join
    rng = np.random.default_rng(300 + seed)
    nl = int(rng.integers(1, 400))
    nr = int(rng.integers(1, 200))
    card = int(rng.integers(2, 40))

    def keys(n):
        mask = rng.random(n) < rng.choice([0.0, 0.15])
        return pa.array(rng.integers(0, card, n), pa.int64(), mask=mask)

    lt = pa.table({"a": keys(nl), "b": keys(nl),
                   "v": pa.array(rng.integers(0, 10**9, nl))})
    rt = pa.table({"a": keys(nr), "b": keys(nr),
                   "w": pa.array(rng.integers(0, 10**9, nr))})
    L, R = at.Table.from_pyarrow(lt), at.Table.from_pyarrow(rt)
    for how, pa_how in [("inner", "inner"), ("left", "left outer"),
                        ("semi", "left semi"), ("anti", "left anti")]:
        got = join(L, R, ["a", "b"], how=how)
        exp = lt.join(rt, keys=["a", "b"], join_type=pa_how)
        gd, ed = got.to_pydict(), exp.to_pydict()
        assert sorted(gd.keys()) == sorted(ed.keys()), how
        key = lambda d: sorted(zip(*[
            [(x is not None, x) for x in d[k]] for k in sorted(d)]))
        assert key(gd) == key(ed), (how, seed)


# ---- regexp fuzz: native lazy-DFA vs Python `re` oracle --------------------
# (VERDICT r4 item 10; engine: hostcodec.cpp rex::, ops/strings.py
# _regex_native_mask — grammar: literals, ., [classes], * + ?,
# alternation, groups, anchors, \d \w \s escapes)

def _random_pattern(rng) -> str:
    """Random pattern from the native engine's supported grammar."""
    def atom(depth):
        r = rng.random()
        if r < 0.35:
            return chr(rng.integers(97, 103))          # literal a-f
        if r < 0.5:
            return "."
        if r < 0.62:
            lo = chr(rng.integers(97, 100))
            hi = chr(ord(lo) + int(rng.integers(1, 4)))
            neg = "^" if rng.random() < 0.25 else ""
            return f"[{neg}{lo}-{hi}]"
        if r < 0.72:
            return rng.choice(["\\d", "\\w", "\\s"])
        if depth >= 2:
            return chr(rng.integers(97, 103))
        return "(" + expr(depth + 1) + ")"

    def piece(depth):
        a = atom(depth)
        r = rng.random()
        if r < 0.2:
            return a + rng.choice(["*", "+", "?"])
        return a

    def branch(depth):
        return "".join(piece(depth)
                       for _ in range(int(rng.integers(1, 4))))

    def expr(depth):
        n = int(rng.integers(1, 3))
        return "|".join(branch(depth) for _ in range(n))

    pat = expr(0)
    if rng.random() < 0.2:
        pat = "^" + pat
    if rng.random() < 0.2:
        pat = pat + "$"
    return pat


@pytest.mark.parametrize("seed", range(50))
def test_fuzz_regexp_native_vs_re(seed):
    import re as _re
    from arrow_tpu.core.column import StringColumn
    from arrow_tpu.ops import strings as st
    rng = np.random.default_rng(1000 + seed)
    pat = _random_pattern(rng)
    try:
        rx = _re.compile(pat)
    except _re.error:
        return
    alphabet = "abcdefg 0137_"
    n = 200
    vals = ["".join(alphabet[i] for i in
                    rng.integers(0, len(alphabet),
                                 rng.integers(0, 12)))
            for _ in range(n)]
    null = rng.random(n) < 0.1
    col = StringColumn.from_pylist(
        [None if m else v for v, m in zip(vals, null)])
    got = st.regexp_is_match(col, pat)
    gv = np.asarray(got.values)
    gm = np.ones(n, bool) if got.validity is None \
        else np.asarray(got.validity)
    for i in range(n):
        if null[i]:
            assert not gm[i]
            continue
        exp = rx.search(vals[i]) is not None
        assert gm[i] and bool(gv[i]) == exp, \
            (seed, pat, vals[i], bool(gv[i]), exp)


# ---- variant fuzz: round-trip + path-get vs the per-row parser --------------

def _random_json_value(rng, depth=0):
    r = rng.random()
    if depth >= 3 or r < 0.45:
        k = rng.integers(0, 5)
        if k == 0:
            return None
        if k == 1:
            return bool(rng.random() < 0.5)
        if k == 2:
            return int(rng.integers(-10**12, 10**12))
        if k == 3:
            return float(np.round(rng.normal(0, 100), 6))
        return "s" + str(rng.integers(0, 100))
    if r < 0.75:
        return [_random_json_value(rng, depth + 1)
                for _ in range(rng.integers(0, 4))]
    return {f"k{j}": _random_json_value(rng, depth + 1)
            for j in range(rng.integers(0, 4))}


@pytest.mark.parametrize("seed", range(50))
def test_fuzz_variant_roundtrip_and_get(seed):
    import json
    from arrow_tpu.io import variant as vr
    rng = np.random.default_rng(2000 + seed)
    rows = [_random_json_value(rng) for _ in range(20)]
    cols = []
    for v in rows:
        md, val = vr.json_to_variant(json.dumps(v))
        back = vr.parse_variant(md, val)
        assert back == v, (seed, v, back)
        cols.append((md, val))
    # columnar path-get vs the per-row parser on a random object field
    objs = [{"a": _random_json_value(rng, 2),
             "b": [_random_json_value(rng, 3)
                   for _ in range(rng.integers(1, 3))]}
            for _ in range(10)]
    pairs = [vr.json_to_variant(json.dumps(o)) for o in objs]
    col = vr.VariantColumn([m for m, _ in pairs],
                           [v for _, v in pairs])
    got = vr.variant_get(col, ["a"])
    exp = [o["a"] for o in objs]
    assert got == exp, seed


# ---- FlightSQL command round-trips ------------------------------------------

@pytest.mark.parametrize("seed", range(50))
def test_fuzz_flightsql_command_roundtrip(seed):
    """Random FlightSQL commands encode -> Any-unpack -> field-decode
    back to the same payloads (io/pb.py wire codec parity)."""
    from arrow_tpu.io import flightsql as fs
    from arrow_tpu.io import pb
    rng = np.random.default_rng(3000 + seed)
    q = "SELECT c" + str(rng.integers(0, 100)) + " FROM t WHERE x < " \
        + str(rng.integers(-10**9, 10**9))
    handle = bytes(rng.integers(0, 256, rng.integers(1, 30),
                                dtype=np.uint8))
    table = "tbl_" + str(rng.integers(0, 1000))

    name, payload = fs._any_unpack(fs.cmd_statement_query(q))
    assert name.endswith("CommandStatementQuery")
    assert pb.first_str(pb.parse_fields(payload), 1) == q

    name, payload = fs._any_unpack(
        fs.cmd_prepared_statement_query(handle))
    assert name.endswith("CommandPreparedStatementQuery")
    assert pb.first_bytes(pb.parse_fields(payload), 1) == handle

    name, payload = fs._any_unpack(fs.cmd_get_primary_keys(table))
    assert name.endswith("CommandGetPrimaryKeys")
    assert pb.first_str(pb.parse_fields(payload), 3) == table

    ids = sorted(int(x) for x in
                 rng.integers(0, 600, rng.integers(0, 6)))
    name, payload = fs._any_unpack(fs.cmd_get_sql_info(ids))
    assert name.endswith("CommandGetSqlInfo")
    got_ids = pb.parse_fields(payload).get(1, []) if payload else []
    flat = []
    for g in got_ids:
        if isinstance(g, (bytes, bytearray)):
            # packed repeated uint32
            i = 0
            while i < len(g):
                v, i = pb.read_varint(g, i)
                flat.append(int(v))
        else:
            flat.append(int(g))
    assert flat == ids


@pytest.mark.parametrize("seed", range(50))
def test_fuzz_parquet_encoding_matrix(seed):
    """r5 writer-encoding fuzz: random (encoding x codec x page version
    x nullability x page size) against BOTH readers — the
    encodings/encoding round-trip tier of the reference's test matrix
    (encoding/mod.rs tests + arrow_writer round-trips)."""
    import io as _io
    from arrow_tpu.io.parquet_native import ParquetFile
    from arrow_tpu.io.parquet_writer import write_parquet_native
    rng = np.random.default_rng(seed + 7000)
    n = int(rng.integers(1, 3000))
    kind = ["i32", "i64", "u32", "u64", "f32", "f64", "str"][seed % 7]
    nullable = bool(rng.integers(0, 2))
    if kind == "str":
        vals = ["" if rng.random() < 0.1 else
                "p%05d/%s" % (rng.integers(0, n // 2 + 1),
                              "s" * int(rng.integers(0, 9)))
                for _ in range(n)]
        enc = ["plain", "delta_length_byte_array",
               "delta_byte_array"][seed % 3]
    elif kind in ("f32", "f64"):
        vals = rng.random(n).astype(np.float32 if kind == "f32"
                                    else np.float64)
        enc = ["plain", "byte_stream_split"][seed % 2]
    else:
        npdt = {"i32": np.int32, "i64": np.int64,
                "u32": np.uint32, "u64": np.uint64}[kind]
        lo, hi = (0, 2**31) if kind.startswith("u") else (-2**30, 2**30)
        vals = rng.integers(lo, hi, n).astype(npdt)
        if bool(rng.integers(0, 2)):
            vals = np.sort(vals)
        enc = ["plain", "delta_binary_packed",
               "byte_stream_split"][seed % 3]
        if enc == "byte_stream_split" and kind in ("u32", "u64"):
            enc = "plain"              # BSS is INT32/INT64/FLOAT/DOUBLE
    pavals = list(vals.tolist() if hasattr(vals, "tolist") else vals)
    if nullable:
        pavals = [None if rng.random() < 0.15 else v for v in pavals]
    patype = {"i32": pa.int32(), "i64": pa.int64(), "u32": pa.uint32(),
              "u64": pa.uint64(), "f32": pa.float32(),
              "f64": pa.float64(), "str": pa.string()}[kind]
    tab = pa.table({"c": pa.array(pavals, patype)})
    t = at.Table.from_pyarrow(tab)
    buf = _io.BytesIO()
    write_parquet_native(
        buf, t,
        data_page_version=["1.0", "2.0"][seed % 2],
        compression=["none", "snappy", "zstd"][seed % 3],
        data_page_size=int(rng.integers(512, 64_000)),
        column_properties={"c": {"encoding": enc}})
    data = buf.getvalue()
    import pyarrow.parquet as _pq
    ref = _pq.read_table(_io.BytesIO(data))
    ours = ParquetFile(data).read()
    assert ref["c"].to_pylist() == pavals, (seed, enc)
    assert ours.column("c").to_pylist() == pavals, (seed, enc, "ours")


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_sql_dml_model(seed):
    """r5 DML fuzz: random INSERT/UPDATE/DELETE sequences against a
    plain-Python row model — execute_sql_update must track it exactly
    (the application side of FlightSQL CommandStatementUpdate)."""
    from arrow_tpu.sql import execute_sql_update
    rng = np.random.default_rng(seed + 31000)
    rows = [[int(rng.integers(-50, 50)), float(rng.integers(0, 10))]
            for _ in range(int(rng.integers(0, 30)))]
    # typed empties: from_pydict([]) would infer the null dtype
    tables = {"t": at.Table.from_pydict(
        {"a": at.column([r[0] for r in rows], at.int64),
         "v": at.column([r[1] for r in rows], at.float64)})}
    model = [list(r) for r in rows]
    for _ in range(int(rng.integers(3, 12))):
        op = rng.integers(0, 3)
        thr = int(rng.integers(-50, 50))
        if op == 0:
            vals = [(int(rng.integers(-50, 50)),
                     float(rng.integers(0, 10)))
                    for _ in range(int(rng.integers(1, 4)))]
            stmt = "INSERT INTO t VALUES " + ", ".join(
                f"({a}, {v})" for a, v in vals)
            mut, n = execute_sql_update(tables, stmt)
            assert n == len(vals)
            model.extend([a, v] for a, v in vals)
        elif op == 1:
            delta = int(rng.integers(1, 5))
            stmt = f"UPDATE t SET v = v + {delta} WHERE a >= {thr}"
            mut, n = execute_sql_update(tables, stmt)
            hits = [r for r in model if r[0] >= thr]
            assert n == len(hits)
            for r in hits:
                r[1] += delta
        else:
            stmt = f"DELETE FROM t WHERE a < {thr}"
            mut, n = execute_sql_update(tables, stmt)
            assert n == sum(1 for r in model if r[0] < thr)
            model = [r for r in model if not (r[0] < thr)]
        tables.update({k: v for k, v in mut.items() if v is not None})
        got = tables["t"].to_pydict()
        assert got["a"] == [r[0] for r in model], (seed, stmt)
        assert got["v"] == [r[1] for r in model], (seed, stmt)


def _empty_heavy_type(rng, depth=0):
    prims = [pa.int64(), pa.float64(), pa.string(), pa.bool_()]
    if depth >= 3:
        return prims[rng.integers(0, len(prims))]
    r = rng.integers(0, 6)
    if r <= 2:
        return prims[rng.integers(0, len(prims))]
    if r == 3:
        return pa.list_(_empty_heavy_type(rng, depth + 1))
    if r == 4:
        return pa.struct([("f%d" % i, _empty_heavy_type(rng, depth + 1))
                          for i in range(int(rng.integers(1, 3)))])
    return pa.list_(pa.list_(_empty_heavy_type(rng, depth + 2)))


def _empty_heavy_val(rng, ty, bias):
    if rng.random() < bias:
        return None
    if pa.types.is_list(ty):
        if rng.random() < bias:
            return []
        return [_empty_heavy_val(rng, ty.value_type, bias)
                for _ in range(int(rng.integers(0, 3)))]
    if pa.types.is_struct(ty):
        return {f.name: _empty_heavy_val(rng, f.type, bias) for f in ty}
    if pa.types.is_boolean(ty):
        return bool(rng.integers(0, 2))
    if pa.types.is_integer(ty):
        return int(rng.integers(-100, 100))
    if pa.types.is_floating(ty):
        return float(rng.integers(-10, 10))
    return "s%d" % rng.integers(0, 5)


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_empty_heavy_nested(seed):
    """r5 adversarial class: nested shapes where entire LEVELS are
    empty or null (the seed-9068 Dremel bug family) through parquet
    (both readers), IPC (both readers) and the C-ABI."""
    import io as _io
    from arrow_tpu.io.parquet_io import _native_writable
    from arrow_tpu.io.parquet_native import ParquetFile
    from arrow_tpu.io.parquet_writer import write_parquet_native
    from arrow_tpu.io import ipc as at_ipc
    rng = np.random.default_rng(seed + 77000)
    ty = _empty_heavy_type(rng)
    n = int(rng.integers(0, 8))
    bias = [0.5, 0.8, 0.95][seed % 3]
    vals = [_empty_heavy_val(rng, ty, bias) for _ in range(n)]
    tab = pa.table({"c": pa.array(vals, ty)})
    t = at.Table.from_pyarrow(tab)
    if _native_writable(t.schema):
        buf = _io.BytesIO()
        write_parquet_native(buf, t)
        data = buf.getvalue()
        import pyarrow.parquet as _pq
        assert _pq.read_table(_io.BytesIO(data)).to_pydict() == \
            tab.to_pydict(), (seed, "pq-pyarrow")
        assert ParquetFile(data).read().column("c").to_pylist() == \
            tab["c"].to_pylist(), (seed, "pq-ours")
    buf = _io.BytesIO()
    at_ipc.write_stream(buf, t)
    back = at_ipc.read_stream(buf.getvalue())
    back = back[0] if isinstance(back, list) else back
    assert back.column("c").to_pylist() == tab["c"].to_pylist(), seed
    import pyarrow.ipc as paipc
    pt = paipc.open_stream(_io.BytesIO(buf.getvalue())).read_all()
    assert pt["c"].to_pylist() == tab["c"].to_pylist(), seed
    back2 = at.Table.from_pyarrow(t.to_pyarrow())
    assert back2.column("c").to_pylist() == tab["c"].to_pylist(), seed
