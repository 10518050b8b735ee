import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import arrow_tpu as at
import jax
import jax.numpy as jnp
from arrow_tpu import dtypes as dtp
from arrow_tpu.core.column import PrimitiveColumn
from arrow_tpu.core.table import Table
from arrow_tpu.ops.groupby import group_by, AggSpec

N, G = 100_000_000, 10_000_000


@jax.jit
def gen():
    i = jnp.arange(N, dtype=jnp.uint64) + jnp.uint64(7)
    h = (i ^ (i >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    key = (h % jnp.uint64(G)).astype(jnp.int64)
    val = (h >> jnp.uint64(32)).astype(jnp.int64) % 1000
    return key, val


key, val = gen()
t = Table((PrimitiveColumn(key, dtp.int64), PrimitiveColumn(val, dtp.int64)),
          dtp.Schema((dtp.Field("k", dtp.int64), dtp.Field("v", dtp.int64))))
aggs = [AggSpec("v", "sum"), AggSpec("v", "count"),
        AggSpec("v", "min"), AggSpec("v", "max")]
t0 = time.perf_counter()
out = group_by(t, ["k"], aggs)
_ = np.asarray(out.column("v_sum").values[:1])
print(f"first call: {time.perf_counter()-t0:.1f}s rows={out.num_rows}")
for _ in range(2):
    t0 = time.perf_counter()
    out = group_by(t, ["k"], aggs)
    _ = np.asarray(out.column("v_sum").values[:1])
    dt_s = time.perf_counter() - t0
    print(f"warm: {dt_s:.3f}s = {N/dt_s/1e6:.1f}M rows/s")
# sanity vs known sums
s = np.asarray(out.column("v_sum").values[:5])
c = np.asarray(out.column("v_count").values[:5])
k5 = np.asarray(out.column("k").values[:5])
print("head:", k5, s, c)
