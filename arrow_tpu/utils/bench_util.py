"""Seeded test/bench data generators.

Mirrors the reference's bench_util (arrow/src/util/bench_util.rs:36-577):
create_primitive_array(size, null_density), create_boolean_array(size,
null_density, true_density), create_string_array(size, null_density), and
dictionary generators — deterministic under a fixed seed so goldens are
reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "create_primitive_array", "create_boolean_array", "create_string_array",
    "create_string_dict_array", "create_timestamp_array",
]


def _mask(rng, size, null_density):
    if null_density <= 0.0:
        return None
    return rng.random(size) >= null_density  # True = valid


def create_primitive_array(size: int, null_density: float = 0.0,
                           dtype=np.int64, seed: int = 42,
                           lo=None, hi=None) -> pa.Array:
    rng = np.random.default_rng(seed)
    dtype = np.dtype(dtype)
    if dtype.kind in "iu":
        lo = -1000 if lo is None and dtype.kind == "i" else (lo or 0)
        hi = 1000 if hi is None else hi
        vals = rng.integers(lo, hi, size=size, dtype=dtype)
    else:
        vals = (rng.random(size) * 1000).astype(dtype)
    valid = _mask(rng, size, null_density)
    mask = None if valid is None else ~valid
    return pa.array(vals, mask=mask)


def create_boolean_array(size: int, null_density: float = 0.0,
                         true_density: float = 0.5, seed: int = 42
                         ) -> pa.Array:
    rng = np.random.default_rng(seed)
    vals = rng.random(size) < true_density
    valid = _mask(rng, size, null_density)
    mask = None if valid is None else ~valid
    return pa.array(vals, mask=mask)


def create_string_array(size: int, null_density: float = 0.0,
                        cardinality: int = 100, max_len: int = 12,
                        seed: int = 42) -> pa.Array:
    rng = np.random.default_rng(seed)
    pool = ["".join(rng.choice(list("abcdefghij"),
                               size=rng.integers(1, max_len)))
            for _ in range(cardinality)]
    idx = rng.integers(0, cardinality, size=size)
    valid = _mask(rng, size, null_density)
    vals = [pool[i] if valid is None or valid[k] else None
            for k, i in enumerate(idx)]
    return pa.array(vals, type=pa.string())


def create_string_dict_array(size: int, null_density: float = 0.0,
                             cardinality: int = 100, seed: int = 42
                             ) -> pa.Array:
    return create_string_array(size, null_density, cardinality,
                               seed=seed).dictionary_encode()


def create_timestamp_array(size: int, null_density: float = 0.0,
                           unit: str = "us", seed: int = 42) -> pa.Array:
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2_000_000_000, size=size, dtype=np.int64)
    valid = _mask(rng, size, null_density)
    mask = None if valid is None else ~valid
    return pa.array(vals, mask=mask).cast(pa.timestamp(unit))


def create_random_batch(size: int, seed: int = 0, null_density: float = 0.1):
    """Random mixed-type Table (the reference's data_gen.rs:37 role):
    int64/float64/bool/utf8-dictionary/timestamp columns with nulls."""
    import jax.numpy as jnp
    from ..core.column import DictionaryColumn, column
    from ..core.table import Table
    from .. import dtypes as dt
    rng = np.random.default_rng(seed)

    def mask():
        return None if null_density == 0 else \
            jnp.asarray(rng.random(size) >= null_density)

    words = [f"w{i:03d}" for i in range(64)]
    cols = {
        "i64": column(rng.integers(-10**12, 10**12, size).astype(np.int64),
                      validity=mask()),
        "f64": column(rng.normal(0, 1e6, size), validity=mask()),
        "flag": column(rng.random(size) < 0.5, validity=mask()),
        "word": DictionaryColumn(
            jnp.asarray(rng.integers(0, 64, size).astype(np.int32)),
            column(words), mask()),
        "ts": column(rng.integers(0, 2**40, size).astype(np.int64),
                     dtype=dt.timestamp("us"), validity=mask()),
    }
    return Table.from_pydict(cols)
