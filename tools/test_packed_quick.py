import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import pyarrow as pa
import arrow_tpu as at
from arrow_tpu.ops.groupby import group_by, AggSpec
from arrow_tpu.core.table import Table

rng = np.random.default_rng(42)
N = 20_000

def check(tag, arrays, keys, aggs, pa_aggs):
    cols = {k: v for k, v in arrays.items()}
    t = Table.from_pydict(cols)
    out = group_by(t, keys, aggs)
    patab = pa.table(cols)
    exp = patab.group_by(keys).aggregate(pa_aggs)
    exp = exp.sort_by([(k, "ascending") for k in keys])
    got = out.to_pyarrow()
    # engine group order: ascending by keys, nulls first; pyarrow
    # sort_by puts nulls last -> re-sort both with pandas-free compare
    import pyarrow.compute as pc
    idx = pc.sort_indices(got, sort_keys=[(k, "ascending") for k in keys],
                          null_placement="at_end")
    got = got.take(idx)
    ok = True
    for name in exp.column_names:
        # pyarrow names: col_op
        lk = "v3_count_all" if name == "count_all" else name
        g = got.column(lk) if lk in got.column_names else None
        if g is None:
            print(f"{tag}: MISSING column {name} in {got.column_names}")
            ok = False
            continue
        e = exp.column(name).combine_chunks()
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if e.cast(g.type) != g:
            en, gn = e.to_pylist(), g.to_pylist()
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(en, gn))
                   if (a != b and not (a != a and b != b))][:5]
            if bad:
                print(f"{tag}: MISMATCH {name}: {bad}")
                ok = False
    print(f"{tag}: {'OK' if ok else 'FAIL'} rows={out.num_rows}/{exp.num_rows}")

# 1. high-card int keys, int values (non-null)
k = rng.integers(0, 500_000, N)
v = rng.integers(-1000, 1000, N)
check("hc int", {"k": k, "v": v}, ["k"],
      [AggSpec("v", "sum"), AggSpec("v", "count"), AggSpec("v", "min"),
       AggSpec("v", "max"), AggSpec("v", "mean")],
      [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max"),
       ("v", "mean")])

# 2. nullable keys + nullable int values
k2 = pa.array(np.where(rng.random(N) < 0.05, None,
                       rng.integers(0, 300_000, N).astype(object)))
v2 = pa.array(np.where(rng.random(N) < 0.3, None,
                       rng.integers(0, 50, N).astype(object)),
              type=pa.int64())
check("nullable", {"k": k2, "v": v2}, ["k"],
      [AggSpec("v", "sum"), AggSpec("v", "count"), AggSpec("v", "min"),
       AggSpec("v", "max")],
      [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")])

# 3. float32 values with NaN (pyarrow skips NaN in min/max? engine
# semantics differ) -- compare against the engine's own general path
from arrow_tpu.ops import groupby as gmod
f = rng.normal(size=N).astype(np.float32)
f[rng.random(N) < 0.01] = np.nan
f[rng.random(N) < 0.005] = np.inf
karr = rng.integers(0, 400_000, N)
t3 = Table.from_pydict({"k": karr, "f": f})
aggs3 = [AggSpec("f", "sum"), AggSpec("f", "min"), AggSpec("f", "max"),
         AggSpec("f", "count")]
out_p = group_by(t3, ["k"], aggs3)
orig = gmod._int_range_fast_path
gmod._int_range_fast_path = lambda *a, **kw: None
out_g = group_by(t3, ["k"], aggs3)
gmod._int_range_fast_path = orig
a1, a2 = out_p.to_pyarrow(), out_g.to_pyarrow()
ok = a1.column("k") == a2.column("k")
for nm in ("f_sum", "f_min", "f_max", "f_count"):
    x = np.asarray(a1.column(nm).to_numpy(zero_copy_only=False), dtype=float)
    y = np.asarray(a2.column(nm).to_numpy(zero_copy_only=False), dtype=float)
    same = np.allclose(x, y, equal_nan=True, rtol=1e-5)
    if not same:
        bad = np.where(~(np.isclose(x, y, equal_nan=True, rtol=1e-5)))[0][:5]
        print(f"float {nm} MISMATCH at {bad}: {x[bad]} vs {y[bad]}")
        ok = False
print("float vs general:", "OK" if ok else "FAIL", out_p.num_rows, out_g.num_rows)

# 4. multi-key + count_all + two mm columns + sum-only column
ka = rng.integers(0, 2000, N)
kb = rng.integers(0, 2000, N)
v1 = rng.integers(0, 10**9, N)
v2b = rng.integers(-5, 5, N)
v3 = rng.integers(0, 100, N)
check("multikey", {"a": ka, "b": kb, "v1": v1, "v2": v2b, "v3": v3},
      ["a", "b"],
      [AggSpec("v1", "min"), AggSpec("v1", "max"), AggSpec("v2", "min"),
       AggSpec("v2", "sum"), AggSpec("v3", "sum"),
       AggSpec("v3", "count_all")],
      [("v1", "min"), ("v1", "max"), ("v2", "min"), ("v2", "sum"),
       ("v3", "sum"), ([], "count_all")])
print("done")
