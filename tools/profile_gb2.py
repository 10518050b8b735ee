"""Sub-stage profile of the packed-sort group-by on one 125M chunk:
range scan / stage1 (pack+sort+cumsum) / ngv fetch / stage2 (top_k+gathers),
plus microbenchmarks of the primitives (sort, top_k, cumsum) at 125M.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import arrow_tpu  # noqa
import jax.numpy as jnp
from arrow_tpu import dtypes as dtp
from arrow_tpu.core.column import PrimitiveColumn
from arrow_tpu.core.table import Table
from arrow_tpu.ops import groupby as gb


def fetch(x):
    return float(np.asarray(x).ravel()[0])


GROUPS = 10_000_000
CH = 125_000_000


@jax.jit
def g_chunk(off):
    i = (jnp.arange(CH, dtype=jnp.uint64) + off.astype(jnp.uint64)
         + jnp.uint64(7))
    h = (i ^ (i >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    key = (h % jnp.uint64(GROUPS)).astype(jnp.int64)
    val = (h >> jnp.uint64(32)).astype(jnp.int64) % 1000
    return key, val


def t(label, f, reps=3):
    f()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts):.3f}s", flush=True)
    return min(ts)


key, val = g_chunk(jnp.int64(0))
fetch(key[:1])

# ---- primitives at 125M ----
u = (key.astype(jnp.uint64) << jnp.uint64(10)) | val.astype(jnp.uint64)


@jax.jit
def just_sort(u):
    (s,) = jax.lax.sort((u,), num_keys=1, is_stable=False)
    return s


@jax.jit
def sort_1pay(u):
    s = jax.lax.sort((u, u), num_keys=1, is_stable=False)
    return s[0]


@jax.jit
def just_cumsum(u):
    return jnp.cumsum(u)


s_sorted = just_sort(u)
fetch(s_sorted[:1])

B = max(0, GROUPS - 1).bit_length()
K_B = 3 << (B - 2) if B >= 2 and (3 << (B - 2)) >= GROUPS else 1 << B


@jax.jit
def just_topk(s):
    run = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
    plane = (run.astype(jnp.uint64) << jnp.uint64(63)) \
        | (~s & jnp.uint64((1 << 63) - 1))
    tv, st = jax.lax.top_k(plane, K_B)
    return st


@jax.jit
def partsort_starts(s):
    """Alternative to top_k: partition-sort compaction of run starts."""
    run = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
    iota = jnp.arange(s.shape[0], dtype=jnp.int32)
    _, st = jax.lax.sort((~run, iota), num_keys=1, is_stable=True)
    return st[:K_B]


@jax.jit
def gather_starts(s, st):
    return s[st]


t("sort u64 125M (no payload)", lambda: fetch(just_sort(u)[:1]))
t("sort u64 125M (+1 payload)", lambda: fetch(sort_1pay(u)[:1]))
t("cumsum u64 125M", lambda: fetch(just_cumsum(u)[:1]))
t(f"top_k(125M, {K_B})", lambda: fetch(just_topk(s_sorted)[:1]))
t(f"partsort starts (125M->{K_B})",
  lambda: fetch(partsort_starts(s_sorted)[:1]))
st = just_topk(s_sorted)
t(f"gather {K_B} from 125M", lambda: fetch(gather_starts(s_sorted, st)[:1]))

# ---- pallas compact as run-start extractor ----
try:
    from arrow_tpu.kernels import compact as ck

    @jax.jit
    def pallas_starts(s):
        run = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                               s[1:] != s[:-1]])
        iota = jnp.arange(s.shape[0], dtype=jnp.int32)
        os.environ["ARROW_TPU_USE_PALLAS"] = "1"
        got, cnt = ck.compact_mask_arrays(run, (iota, s))
        return got[0][:K_B], got[1][:K_B], cnt

    os.environ["ARROW_TPU_USE_PALLAS"] = "1"
    t("pallas compact starts (125M)",
      lambda: fetch(pallas_starts(s_sorted)[0][:1]))
    os.environ["ARROW_TPU_USE_PALLAS"] = "0"
except Exception as e:  # noqa: BLE001
    print(f"pallas compact: ERROR {type(e).__name__}: {e}", flush=True)

# ---- actual pipeline stages ----
tbl = Table((PrimitiveColumn(key, dtp.int64),
             PrimitiveColumn(val, dtp.int64)),
            dtp.Schema((dtp.Field("k", dtp.int64),
                        dtp.Field("v", dtp.int64))))
aggs = [gb.AggSpec("v", "sum"), gb.AggSpec("v", "count"),
        gb.AggSpec("v", "min"), gb.AggSpec("v", "max")]

scan_items = ((key, None), (val, None))
t("range scan (fused, incl fetch)",
  lambda: np.asarray(gb._bin_range_scan(scan_items)))

kplan_s = ((False, GROUPS),)
vplan_s = (("mm", "i", 0, 10, False, True),)
kmins = (jnp.asarray(0, jnp.int64),)
vmins = (jnp.asarray(0, jnp.int64),)
key_arrs = ((key, None),)
val_arrs = ((val, None),)
KB = (GROUPS - 1).bit_length()


def run_stage1():
    s0, ngv, topk_plane, slot_planes, col_planes = gb._packed_stage1(
        kplan_s, vplan_s, KB, key_arrs, kmins, val_arrs, vmins)
    return s0, ngv, topk_plane, slot_planes, col_planes


s0, ngv, topk_plane, slot_planes, col_planes = run_stage1()
t("stage1 (pack+sort+cumsum planes)", lambda: fetch(run_stage1()[0][:1]))
t("ngv fetch (after stage1 warm)", lambda: int(run_stage1()[1]), reps=1)

ng = int(ngv)
aplan = tuple((a.op, 0, "i", "int64") for a in aggs)


def run_stage2():
    key_out, agg_out, flags = gb._packed_stage2(
        kplan_s, vplan_s, aplan, KB, 10, K_B, GROUPS,
        s0, topk_plane, slot_planes, col_planes,
        jnp.asarray(ng, jnp.int64), kmins, vmins)
    return key_out, agg_out, flags


ko, ao, fl = run_stage2()
t("stage2 (top_k + gathers + decode)", lambda: fetch(run_stage2()[2]))
print("done", flush=True)
