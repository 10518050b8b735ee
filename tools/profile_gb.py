"""Profile the config4 500M x 10M-group streaming plan phase by phase.

Replicates bench.config4_variant's streamed path (GroupByAccumulator over
125M device-generated chunks) but times each update and finalize, and
optionally the packed-sort sub-stages.  Timing fetches a scalar (CLAUDE.md:
block_until_ready does not block through the axon tunnel).
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
from arrow_tpu.ops.groupby import GroupByAccumulator, AggSpec


def fetch(x):
    return float(np.asarray(x).ravel()[0])


GROUPS = 10_000_000
N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000_000
CH = int(sys.argv[2]) if len(sys.argv) > 2 else 125_000_000

aggs = [AggSpec("v", "sum"), AggSpec("v", "count"),
        AggSpec("v", "min"), AggSpec("v", "max")]


@jax.jit
def g_chunk(off):
    i = (jnp.arange(CH, dtype=jnp.uint64) + off.astype(jnp.uint64)
         + jnp.uint64(7))
    h = (i ^ (i >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    key = (h % jnp.uint64(GROUPS)).astype(jnp.int64)
    val = (h >> jnp.uint64(32)).astype(jnp.int64) % 1000
    return key, val


def run(label, use_async=False):
    acc = GroupByAccumulator(["k"], aggs)
    done = 0
    t_all = time.perf_counter()
    while done < N:
        m = min(CH, N - done)
        t0 = time.perf_counter()
        key, val = g_chunk(jnp.int64(done))
        if not use_async:
            fetch(key[:1])
        t_gen = time.perf_counter() - t0
        t0 = time.perf_counter()
        t = Table((PrimitiveColumn(key[:m], dtp.int64),
                   PrimitiveColumn(val[:m], dtp.int64)),
                  dtp.Schema((dtp.Field("k", dtp.int64),
                              dtp.Field("v", dtp.int64))))
        if use_async:
            acc.update_async(t)
        else:
            acc.update(t)
            fetch(acc._parts[-1].columns[0].values[:1])
        t_upd = time.perf_counter() - t0
        print(f"  [{label}] chunk@{done}: gen {t_gen:.3f}s update {t_upd:.3f}s",
              flush=True)
        del key, val, t
        done += m
    t0 = time.perf_counter()
    out = acc.finalize()
    fetch(out.column("v_sum").values[:1])
    t_fin = time.perf_counter() - t0
    total = time.perf_counter() - t_all
    print(f"  [{label}] finalize {t_fin:.3f}s  TOTAL {total:.3f}s "
          f"({N/total/1e6:.1f}M rows/s), groups={out.num_rows}", flush=True)
    return total


print(f"N={N} CH={CH} groups={GROUPS}", flush=True)
import sys as _sys
run("warm1")
run("warm2")
if "--async" in _sys.argv:
    run("async1", use_async=True)
    run("async2", use_async=True)
