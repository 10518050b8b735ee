"""Scaling-efficiency harness: distributed operators at 1..N devices
(SURVEY.md §7 M6: "scaling-efficiency harness 1 chip -> N hosts").

Measures rows/s for the shard_map operators (hash-shuffle group-by,
range-partitioned sort, FK join, skew-aware join) at every power-of-two
device count available, and reports efficiency vs the 1-device run
(ideal = 1.0: N devices process N x the rows in the same time — weak
scaling).

On the single-chip axon image, run with virtual CPU devices to validate
the harness and the collective structure:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python tools/bench_scaling.py --cpu

On a real multi-chip slice, run without --cpu: the same meshes ride ICI
and the numbers are the BASELINE config-5 scaling measurement.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (virtual devices)")
    ap.add_argument("--rows-per-device", type=int, default=1 << 18)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax
        # restrict platform DISCOVERY, not just selection: merely
        # selecting cpu still initializes the axon backend, which hangs
        # ~25 min when the tunnel is dead (CLAUDE.md, measured)
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P
    import arrow_tpu  # noqa: F401
    from arrow_tpu import parallel as par

    ndev_all = jax.device_count()
    per = args.rows_per_device
    rng = np.random.default_rng(0)
    results = {}

    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev_all]
    for nd in counts:
        mesh = par.make_mesh(nd)
        axis = par.shard_axis(mesh)
        n = per * nd
        keys = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.uint64))
        vals = jnp.asarray(rng.integers(-1000, 1000, n).astype(np.int64))
        ok = jnp.ones((n,), jnp.bool_)
        bkeys = jnp.asarray(
            np.arange(per * nd, dtype=np.uint64))
        bvals = jnp.asarray(np.arange(per * nd, dtype=np.int64))

        @jax.jit
        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(P(axis),) * 5,
                           out_specs=(P(axis), P(axis), P()))
        def step(k, v, m, bk, bv):
            gk, gv, (gsum,), _gover = par.dist_group_by(
                axis, k, m, per, per, [("sum", v)])
            sk, svalid, _, _sover = par.dist_sort(axis, k, m, per * 2)
            total = par.dist_sum(axis, v, m)
            return gsum, sk, total

        def run():
            out = step(keys, vals, ok, bkeys, bvals)
            return float(np.asarray(out[-1]).ravel()[0])

        run()                                     # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            run()
        dt = (time.perf_counter() - t0) / args.reps
        results[nd] = n / dt
        print(f"devices={nd:>2}  rows={n:>10}  {dt*1e3:8.1f} ms  "
              f"{n/dt/1e6:10.2f} Mrows/s", flush=True)

    base = results[counts[0]] / counts[0]
    effs = {nd: results[nd] / (nd * base) for nd in counts}
    print(json.dumps({
        "metric": "dist_weak_scaling_efficiency",
        "per_device_rows": per,
        "rows_per_s": {str(k): round(v) for k, v in results.items()},
        "efficiency": {str(k): round(v, 3) for k, v in effs.items()},
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
