"""Run-end encoding kernels (arrow-array/src/array/run_array.rs:63;
arrow-cast RunArray construction).

encode: boundaries via shifted inequality (one vector compare — the same
primitive as ops.sort.partition), run ends from the boundary indices.
decode: logical-row -> run lookup via searchsorted, then a take.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..core.column import Column, PrimitiveColumn
from ..core.nested import RunEndColumn
from ..errors import ArrowInvalid, ArrowTypeError

__all__ = ["run_end_encode", "run_end_decode"]


def run_end_encode(col: Column, run_end_type: dt.DataType = dt.int32
                   ) -> RunEndColumn:
    """Encode a column into runs of adjacent equal values (nulls are equal
    to nulls, like arrow-rs RunArray::from_iter)."""
    if not isinstance(col, PrimitiveColumn):
        raise ArrowTypeError("run_end_encode supports primitive columns "
                             "(dictionary-encode strings first)")
    n = len(col)
    if n == 0:
        return RunEndColumn(jnp.zeros((0,), run_end_type.to_jax()),
                            col.slice(0, 0), 0)
    v = col.values
    neq = v[1:] != v[:-1]
    if col.validity is not None:
        m = col.validity
        # values differ if validity flips, or both valid and values differ
        neq = (m[1:] != m[:-1]) | (neq & m[1:] & m[:-1])
    start = jnp.concatenate([jnp.ones((1,), jnp.bool_), neq])
    starts = np.nonzero(np.asarray(start))[0]           # host: run count
    hi = np.iinfo(np.dtype(run_end_type.to_jax())).max
    if n > hi:
        raise ArrowInvalid(
            f"run ends overflow {run_end_type!r}: length {n} > {hi}")
    run_ends = np.concatenate([starts[1:], [n]]).astype(
        np.dtype(run_end_type.to_jax()))
    from .take import take as take_kernel
    vals = take_kernel(col, PrimitiveColumn(
        jnp.asarray(starts.astype(np.int64)), dt.int64))
    return RunEndColumn(jnp.asarray(run_ends), vals, n)


def run_end_decode(col: RunEndColumn) -> Column:
    """Expand a run-end column to its logical rows (one searchsorted +
    one gather — both dense device ops)."""
    if not isinstance(col, RunEndColumn):
        raise ArrowInvalid("run_end_decode expects a RunEndColumn")
    n = len(col)
    rows = jnp.arange(n, dtype=jnp.int64)
    phys = col.row_to_run(rows)
    from .take import take as take_kernel
    return take_kernel(col.values, PrimitiveColumn(
        phys.astype(jnp.int64), dt.int64))
