"""Snappy codec microbench: ours (hostcodec) vs pyarrow's (google
snappy) on three corpora — incompressible, long-match strings, and
bool-page-like runs (the r4-measured ~2x long-match decompress gap).

Usage: python tools/bench_snappy.py  -> one JSON line.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def corpora():
    rng = np.random.default_rng(0)
    out = {}
    out["random"] = rng.integers(0, 256, 4 << 20, dtype=np.uint8) \
        .tobytes()
    vals = ["customer_%05d_region_%02d" % (i % 3000, i % 37)
            for i in range(120_000)]
    out["strings"] = ("\x00".join(vals)).encode()
    bits = (rng.random(32 << 20) < 0.02)
    out["bools"] = np.packbits(bits).tobytes()
    return out


def time_fn(fn, reps=7):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import pyarrow as pa
    from arrow_tpu.utils import native as nt
    codec = pa.Codec("snappy")
    res = {}
    for name, raw in corpora().items():
        ours_comp = nt.snappy_compress(raw)
        pa_comp = codec.compress(raw).to_pybytes()
        n = len(raw)
        t_ours = time_fn(lambda: nt.snappy_decompress(ours_comp, n))
        t_pa = time_fn(lambda: codec.decompress(pa_comp, n))
        # cross-check: each decodes the other's stream
        assert bytes(nt.snappy_decompress(pa_comp, n)) == raw
        assert codec.decompress(bytes(ours_comp), n).to_pybytes() == raw
        res[name] = {
            "bytes": n,
            "ours_GBps": round(n / t_ours / 1e9, 3),
            "pyarrow_GBps": round(n / t_pa / 1e9, 3),
            "ratio": round(t_pa / t_ours, 3),
            "comp_ratio_ours": round(n / len(ours_comp), 2),
            "comp_ratio_pa": round(n / len(pa_comp), 2),
        }
    print(json.dumps({"metric": "snappy_decompress", "unit": "GB/s",
                      "corpora": res}))


if __name__ == "__main__":
    main()
