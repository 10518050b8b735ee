"""Variant timings for the high-card group-by finalize on real TPU."""
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
VAL_BITS = 10


def fetch(x):
    return np.asarray(jax.device_get(x if x.ndim == 0 else x[:1]))


def timeit(label, fn, *args, reps=2):
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        fetch(leaf)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            fetch(leaf)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt*1000:9.1f} ms", flush=True)
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
fetch(key)
print("data ready", flush=True)


@jax.jit
def sort_stage(k, v):
    packed = (k.astype(jnp.uint64) << jnp.uint64(VAL_BITS)) \
        | v.astype(jnp.uint64)
    (s,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
    kpart = s >> jnp.uint64(VAL_BITS)
    neq = kpart[1:] != kpart[:-1]
    run_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), neq])
    vpart16 = (s & jnp.uint64(1023)).astype(jnp.uint16)
    exc_csum = jnp.cumsum(vpart16.astype(jnp.int64)) \
        - vpart16.astype(jnp.int64)
    ngv = jnp.sum(run_start.astype(jnp.int64))
    topk_plane = (run_start.astype(jnp.uint64) << jnp.uint64(63)) \
        | (~s & jnp.uint64((1 << 63) - 1))
    return s, run_start, vpart16, exc_csum, topk_plane, ngv


res = timeit("sort+bounds+cumsum+planes", sort_stage, key, val)
s, run_start, vpart16, exc_csum, topk_plane, ngv = res
print("groups:", int(ngv), flush=True)
GG = int(ngv)


@jax.jit
def topk_starts(plane):
    vals, idx = jax.lax.top_k(plane, G)
    inv = (~vals) & jnp.uint64((1 << 63) - 1)
    keys_out = (inv >> jnp.uint64(VAL_BITS)).astype(jnp.int64)
    mins = (inv & jnp.uint64(1023)).astype(jnp.int64)
    # top_k descends; starts sorted by ~packed desc = packed asc already
    return keys_out, mins, idx


timeit("top_k starts (k=10M of 100M)", topk_starts, topk_plane)


@jax.jit
def part_sort_u64(run_start, s):
    iota = jnp.arange(N, dtype=jnp.uint32)
    payload = (s << jnp.uint64(27)) | iota.astype(jnp.uint64)
    _, p = jax.lax.sort((~run_start, payload), num_keys=1, is_stable=True)
    return p[:G]


timeit("partition sort bool + u64 payload", part_sort_u64, run_start, s)


@jax.jit
def g16(v, idx):
    return v[idx]


@jax.jit
def g64(v, idx):
    return v[idx]


keys_out, mins, st = topk_starts(topk_plane)
timeit("gather u16[st] from 100M", g16, vpart16, st)
timeit("gather i64[st] from 100M", g64, exc_csum, st)

# full candidate pipeline: sort stage + topk + 2 gathers fused

@jax.jit
def finalize(vpart16, exc_csum, topk_plane, total):
    keys_out, mins, st = topk_starts(topk_plane)
    exc0 = exc_csum[st]
    sums = jnp.concatenate([exc0[1:], total[None]]) - exc0
    st_i = st.astype(jnp.int32)
    cnts = jnp.concatenate([st_i[1:], jnp.array([N], jnp.int32)]) - st_i
    prev_end = jnp.maximum(st_i - 1, 0)
    mx_prev = vpart16[prev_end].astype(jnp.int64)
    maxs = jnp.concatenate([mx_prev[1:], vpart16[-1:].astype(jnp.int64)])
    return keys_out, mins, maxs, sums, cnts.astype(jnp.int64)


@jax.jit
def total_sum(exc_csum, vpart16):
    return exc_csum[-1] + vpart16[-1].astype(jnp.int64)


tot = total_sum(exc_csum, vpart16)
timeit("finalize fused (topk+2 gathers)", finalize, vpart16, exc_csum,
       topk_plane, tot)


def full(k, v):
    s, run_start, vpart16, exc_csum, topk_plane, ngv = sort_stage(k, v)
    tot = total_sum(exc_csum, vpart16)
    return finalize(vpart16, exc_csum, topk_plane, tot)


t0 = time.perf_counter()
o = full(key, val)
fetch(o[0])
dt1 = time.perf_counter() - t0
t0 = time.perf_counter()
o = full(key, val)
fetch(o[0])
dt_s = time.perf_counter() - t0
print(f"full packed pipeline: {dt_s:.3f}s = {N/dt_s/1e6:.1f}M rows/s "
      f"(prev {dt1:.3f})", flush=True)
