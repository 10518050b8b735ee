"""Profile the high-cardinality group-by (config4 100M_10M) stage by
stage on the real TPU, and prototype a packed single-operand sort plan.

Run: timeout 1200 python tools/profile_groupby_hc.py
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import arrow_tpu  # noqa: F401  (enables x64)
import jax
import jax.numpy as jnp

N = 100_000_000
G = 10_000_000


def fetch(x):
    return float(np.asarray(jax.device_get(x if x.ndim == 0 else x[0])))


def timeit(label, fn, *args, reps=2):
    fn(*args)  # compile
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    fetch(leaves[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        fetch(leaves[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:42s} {dt*1000:9.1f} ms")
    return out


@jax.jit
def gen():
    i = jnp.arange(N, dtype=jnp.uint64) + jnp.uint64(7)
    h = (i ^ (i >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    key = (h % jnp.uint64(G)).astype(jnp.int64)
    val = (h >> jnp.uint64(32)).astype(jnp.int64) % 1000
    return key, val


key, val = gen()
key.block_until_ready()
print("data ready")

# --- current pipeline stages -------------------------------------------
from arrow_tpu.ops.groupby import _discover_stage, _agg_stage
from arrow_tpu.ops.row_format import key_kind, key_parts
from arrow_tpu.core.column import PrimitiveColumn
from arrow_tpu import dtypes as dt

kc = PrimitiveColumn(key, dt.int64)
kinds = (key_kind(kc),)
parts = (key_parts(kc),)

t0 = time.perf_counter()
out = _discover_stage(kinds, parts, (val,))
ng = int(out[4])
print(f"discover first call (incl compile): {time.perf_counter()-t0:.2f}s ng={ng}")


def disc():
    o = _discover_stage(kinds, parts, (val,))
    return o[4]

timeit("discover (encode+sort+bounds)", disc)

order, gid, run_start, starts_raw, ng_t, sorted_payloads = \
    _discover_stage(kinds, parts, (val,))
num_groups = int(ng_t)

plan = (("sum", 0, "int"), ("count", 0, "int"),
        ("min", 0, "int"), ("max", 0, "int"))
arrays = ((sorted_payloads[0], None),)


def agg():
    return _agg_stage(plan, num_groups, False, order, gid, run_start,
                      starts_raw, arrays, presorted=True)

timeit("agg stage (4 aggs)", agg)

outs, first_idx = agg()


@jax.jit
def take_keys(k, idx):
    return k[idx]

timeit("take keys (gather 10M of 100M)", take_keys, key,
       first_idx.astype(jnp.int64))

# --- prototype: packed single-operand u64 sort plan ---------------------
VAL_BITS = 10


@jax.jit
def packed_plan(k, v):
    packed = (k.astype(jnp.uint64) << jnp.uint64(VAL_BITS)) \
        | v.astype(jnp.uint64)
    (s,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
    kpart = s >> jnp.uint64(VAL_BITS)
    vpart = (s & jnp.uint64((1 << VAL_BITS) - 1)).astype(jnp.int64)
    neq = kpart[1:] != kpart[:-1]
    run_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), neq])
    ngv = jnp.sum(run_start.astype(jnp.int64))
    csum = jnp.cumsum(vpart)          # i64 inclusive cumsum
    return s, kpart, vpart, run_start, csum, ngv


res = timeit("packed: sort+bounds+cumsum", packed_plan, key, val)
ng2 = int(res[5])
print("groups:", ng2)

s, kpart, vpart, run_start, csum, ngv = packed_plan(key, val)


@jax.jit
def starts_by_sort(run_start):
    _, st = jax.lax.sort((~run_start, jnp.arange(N, dtype=jnp.int32)),
                         num_keys=1, is_stable=True)
    return st

timeit("starts via partition sort", starts_by_sort, run_start)
starts_all = starts_by_sort(run_start)


@jax.jit
def finalize(s, csum, starts_all):
    st = starts_all[:G]               # static G == num_groups here
    ends = jnp.concatenate([st[1:], jnp.array([N], jnp.int32)]) - 1
    sk = s[st]                        # gather run starts (packed)
    se = s[ends]
    keys_out = (sk >> jnp.uint64(VAL_BITS)).astype(jnp.int64)
    mn = (sk & jnp.uint64(1023)).astype(jnp.int64)
    mx = (se & jnp.uint64(1023)).astype(jnp.int64)
    ce = csum[ends]
    c0 = jnp.where(st > 0, csum[jnp.maximum(st - 1, 0)], 0)
    sums = ce - c0
    cnt = (ends - st + 1).astype(jnp.int64)
    return keys_out, mn, mx, sums, cnt

timeit("finalize (gathers at bounds)", finalize, s, csum, starts_all)


def full_packed(k, v):
    s, kpart, vpart, run_start, csum, ngv = packed_plan(k, v)
    ngi = int(ngv)   # host sync
    starts_all = starts_by_sort(run_start)
    return finalize(s, csum, starts_all)

t0 = time.perf_counter()
o = full_packed(key, val)
fetch(o[0])
print(f"packed full pipeline (warm): {time.perf_counter()-t0:.3f}s")
t0 = time.perf_counter()
o = full_packed(key, val)
fetch(o[0])
dt_s = time.perf_counter() - t0
print(f"packed full pipeline (warm2): {dt_s:.3f}s = {N/dt_s/1e6:.1f}M rows/s")

# sanity: compare sums against current path output
cur_sum = np.asarray(outs[0][0][:10])
new_sum = np.asarray(o[3][:10])
print("sum match:", np.array_equal(cur_sum, new_sum),
      cur_sum[:5], new_sum[:5])
