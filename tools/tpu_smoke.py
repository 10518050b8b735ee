"""Hardware audit: every op family once on the REAL TPU backend.

CPU tests cannot catch backend-specific compile failures (e.g. the
f64->u64 bitcast gap that silently broke all float sorting on hardware
while 380+ CPU tests stayed green).  Run this after kernel/ops changes:

    python tools/tpu_smoke.py      # on the axon TPU machine

Prints OK/FAIL per op family; exits non-zero on any FAIL.
"""
import numpy as np, jax, jax.numpy as jnp, traceback
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import arrow_tpu as at
from arrow_tpu import compute as C

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(5)
n = 5000
i64 = at.column(rng.integers(-10**9, 10**9, n).astype(np.int64),
                validity=rng.random(n) > 0.1)
f64 = at.column(rng.normal(0, 100, n))
f64n = at.column(rng.normal(0, 100, n), validity=rng.random(n) > 0.1)
b = at.column(rng.random(n) < 0.5)
s = at.column([f"w{i%37}" for i in range(n)])
ts = at.column(rng.integers(0, 2**40, n).astype(np.int64),
               dtype=at.timestamp("us"))

FAILURES = []


def check(name, fn):
    try:
        r = fn()
        # force materialization
        if hasattr(r, "to_pylist"):
            r.to_pylist()[:2]
        elif hasattr(r, "values"):
            np.asarray(r.values)[:2]
        elif isinstance(r, tuple):
            [np.asarray(x)[:1] for x in r if hasattr(x, "shape")]
        else:
            np.asarray(r)[:2] if hasattr(r, "shape") else r
        print(f"OK   {name}", flush=True)
    except Exception as e:
        FAILURES.append(name)
        print(f"FAIL {name}: {str(e).splitlines()[0][:110]}", flush=True)

import importlib
numeric = importlib.import_module("arrow_tpu.ops.numeric")
cmp = importlib.import_module("arrow_tpu.ops.cmp")
boolean = importlib.import_module("arrow_tpu.ops.boolean")
aggregate = importlib.import_module("arrow_tpu.ops.aggregate")
castm = importlib.import_module("arrow_tpu.ops.cast")
sortm = importlib.import_module("arrow_tpu.ops.sort")
filtm = importlib.import_module("arrow_tpu.ops.filter")
takem = importlib.import_module("arrow_tpu.ops.take")
concm = importlib.import_module("arrow_tpu.ops.concat")
select_misc = importlib.import_module("arrow_tpu.ops.select_misc")
temporal = importlib.import_module("arrow_tpu.ops.temporal")
strings = importlib.import_module("arrow_tpu.ops.strings")
bitwise = importlib.import_module("arrow_tpu.ops.bitwise")
joinm = importlib.import_module("arrow_tpu.ops.join")
gbm = importlib.import_module("arrow_tpu.ops.groupby")
from arrow_tpu.ops.row_format import RowConverter, SortField, SortOptions

check("add i64", lambda: numeric.add(i64, i64))
check("mul f64", lambda: numeric.mul(f64, f64))
check("div f64", lambda: numeric.div(f64n, f64))
check("cmp lt f64", lambda: cmp.lt(f64, f64n))
check("cmp eq str", lambda: strings.compare("eq", s, s))
check("and kleene", lambda: boolean.and_kleene(b, b) if hasattr(boolean, "and_kleene") else boolean.and_(b, b))
check("sum f64", lambda: aggregate.sum_(f64))
check("minmax f64", lambda: aggregate.min_max(f64n))
check("cast i64->f64", lambda: castm.cast(i64, at.float64))
check("cast f64->i32 safe", lambda: castm.cast(f64, at.int32))
check("cast i64->utf8", lambda: castm.cast(i64, at.utf8))
check("cast utf8->i64", lambda: castm.cast(at.column(["1","2","x"]), at.int64))
check("cast ts->date32", lambda: castm.cast(ts, at.date32))
check("sort f64 desc nulls_last", lambda: sortm.sort(
    f64n, SortOptions(descending=True, nulls_first=False)))
check("lexsort i64+f64", lambda: sortm.lexsort_to_indices(
    [sortm.SortColumn(i64), sortm.SortColumn(f64)]))
check("rank f64", lambda: sortm.rank(f64n))
check("partition f64", lambda: sortm.partition([at.column(np.sort(rng.integers(0, 5, n)).astype(np.float64))]))
check("filter f64", lambda: filtm.filter(f64n, b))
check("take str", lambda: takem.take(s, at.column(np.arange(100, dtype=np.int64))))
check("concat f64", lambda: concm.concat([f64, f64n]))
check("interleave", lambda: concm.interleave([i64, i64], [(0, 1), (1, 2)]))
check("zip", lambda: select_misc.zip_(b, i64, i64))
check("shift", lambda: select_misc.shift(i64, 3))
check("date_part year", lambda: temporal.year(ts))
tstz = at.column(rng.integers(0, 2**40, n).astype(np.int64),
                 dtype=at.timestamp("us", "America/New_York"))
check("date_part tz hour", lambda: temporal.hour(tstz))
check("iso_week", lambda: temporal.iso_week(ts))
check("sort top-k", lambda: sortm.sort_to_indices(i64, limit=64))
check("like", lambda: strings.like(s, "w1%"))
check("substring", lambda: strings.substring(s, 1, 2))
check("bitwise_and", lambda: bitwise.bitwise_and(i64, i64))
check("row_format f64", lambda: RowConverter([SortField()]).convert_columns([f64n]))
tl = at.Table.from_pydict({"k": at.column(rng.integers(0, 50, n).astype(np.int64)),
                           "v": f64})
tr = at.Table.from_pydict({"k": at.column(np.arange(50, dtype=np.int64)),
                           "w": at.column(np.arange(50, dtype=np.int64))})
check("join int keys", lambda: joinm.join(tl, tr, ["k"]))
tfl = at.Table.from_pydict({"k": at.column((rng.integers(0, 9, n) * 1.5)),
                            "v": i64})
tfr = at.Table.from_pydict({"k": at.column(np.arange(9) * 1.5),
                            "w": at.column(np.arange(9, dtype=np.int64))})
check("join FLOAT keys", lambda: joinm.join(tfl, tfr, ["k"]))
check("group_by f64 mean", lambda: gbm.group_by(
    tl, ["k"], [gbm.AggSpec("v", "mean"), gbm.AggSpec("v", "sum")]))

# decimals / intervals / run-end (host+device mixed paths)
import pyarrow as pa
from decimal import Decimal
from arrow_tpu.io.interop import column_from_pyarrow
dec = column_from_pyarrow(pa.array([Decimal("1.25"), None, Decimal(10**30)],
                                   pa.decimal256(50, 2)))
dec2 = column_from_pyarrow(pa.array([Decimal("1.3"), Decimal("0"),
                                     Decimal("-1")], pa.decimal128(38, 1)))
check("decimal sort", lambda: sortm.sort_to_indices(dec))
check("decimal cmp", lambda: cmp.lt(dec, dec2))
check("decimal arith", lambda: numeric.add(dec, dec2))
check("decimal agg", lambda: aggregate.sum_(dec))
mdn = pa.scalar((1, 2, 3_600_000_000_000),
                pa.month_day_nano_interval()).as_py()
iv = column_from_pyarrow(pa.array([mdn] * n, pa.month_day_nano_interval()))
check("add_interval", lambda: temporal.add_interval(ts, iv))
ree = column_from_pyarrow(pa.RunEndEncodedArray.from_arrays(
    pa.array([2, 5], pa.int32()), pa.array([7, 3], pa.int64())))
check("ree sort", lambda: sortm.sort_to_indices(ree))
print("smoke done", flush=True)
sys.exit(1 if FAILURES else 0)
