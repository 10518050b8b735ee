"""Distributed group-by on a device mesh — the engine's scale-out
pattern (SURVEY.md §2.4: hash shuffle via in-program all_to_all, local
grouped aggregation, disjoint groups per shard).

Runs on any jax device set; with no accelerators it uses 8 virtual CPU
devices so the collective path is exercised anywhere."""

import functools
import os

if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from arrow_tpu import parallel as par

AXIS = "shards"


def main():
    devs = np.array(jax.devices())
    mesh = Mesh(devs, (AXIS,))
    ndev = len(devs)
    n = 8192
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 32, n).astype(np.uint64)
    vals = rng.integers(-50, 50, n).astype(np.int64)
    valid = np.ones(n, bool)

    @jax.jit
    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                       out_specs=(P(AXIS), P(AXIS), P(AXIS), P()))
    def agg(k, v, ok):
        gk, gv, outs, overflow = par.dist_group_by(
            AXIS, k, ok, shuffle_cap=2 * n // ndev, group_cap=64,
            specs=[("sum", v)])
        return gk, gv, outs[0], overflow

    gk, gv, gsum, overflow = (np.asarray(x) for x in agg(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(valid)))
    assert not overflow, "capacity overflow flagged"
    got = {int(k): int(s) for k, v, s in zip(gk, gv, gsum) if v}
    exp = {}
    for k, v in zip(keys, vals):
        exp[int(k)] = exp.get(int(k), 0) + int(v)
    assert got == exp
    print(f"{len(got)} groups aggregated across {ndev} devices; "
          f"spot check key 0 -> {got.get(0)}")


if __name__ == "__main__":
    main()
