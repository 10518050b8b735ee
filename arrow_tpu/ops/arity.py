"""Kernel templates: the engine's equivalent of arrow-arith/src/arity.rs.

The reference's unary/binary templates do: union the null buffers once, then
run a branch-free value loop (arity.rs:29-305).  Here the same shape holds,
but "the loop" is a jnp expression XLA fuses into one HBM pass; checked
variants thread an error-flag tensor instead of early-exit (errors cannot
unwind inside jit) — the eager wrappers sync the flag and raise.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from .. import dtypes as dt
from ..core import validity as vd
from ..core.column import Column, PrimitiveColumn
from ..core.datum import Datum, broadcast_pair
from ..errors import ArrowError

__all__ = ["unary", "binary", "binary_with_flag", "check_flag"]


def unary(col: PrimitiveColumn, fn: Callable, out_dtype: dt.DataType = None
          ) -> PrimitiveColumn:
    """Apply fn over values; validity passes through (arity.rs `unary`)."""
    out = fn(col.values)
    return PrimitiveColumn(out, out_dtype or col.dtype, col.validity,
                           _canonical=col.validity is None)


def binary(lhs: Datum, rhs: Datum, fn: Callable,
           out_dtype: Optional[dt.DataType] = None,
           require_same_type: bool = True) -> PrimitiveColumn:
    """Binary kernel: joint validity = union, values = fn(l, r)."""
    lv, rv, mask, n, ldt, rdt = broadcast_pair(lhs, rhs)
    if require_same_type and ldt != rdt:
        raise ArrowError(
            f"binary kernel type mismatch: {ldt!r} vs {rdt!r} "
            "(cast first, as in the reference)")
    out = fn(lv, rv)
    return PrimitiveColumn(out, out_dtype or ldt, mask,
                           _canonical=mask is None)


def binary_with_flag(lhs: Datum, rhs: Datum, fn: Callable,
                     out_dtype: Optional[dt.DataType] = None,
                     require_same_type: bool = True
                     ) -> Tuple[PrimitiveColumn, jnp.ndarray]:
    """Checked binary kernel (arity.rs try_binary): fn returns
    (values, elementwise_error).  Errors on null slots are ignored, matching
    try_binary's skip-null behavior.  Returns (column, scalar error flag)."""
    lv, rv, mask, n, ldt, rdt = broadcast_pair(lhs, rhs)
    if require_same_type and ldt != rdt:
        raise ArrowError(
            f"binary kernel type mismatch: {ldt!r} vs {rdt!r}")
    out, err = fn(lv, rv)
    if mask is not None:
        err = jnp.logical_and(err, mask)
    flag = jnp.any(err)
    return PrimitiveColumn(out, out_dtype or ldt, mask,
                           _canonical=mask is None), flag


def check_flag(flag, exc_type, message: str):
    """Eager-layer sync point: raise if the traced error flag fired.

    Inside a fused pipeline (arrow_tpu.fuse) the flag is a tracer and
    cannot sync — the check is skipped there (documented in fuse.py:
    checked ops behave as wrapping inside fusion; validate at stage
    boundaries when overflow detection matters)."""
    import jax as _jax
    if isinstance(flag, _jax.core.Tracer):
        return
    if bool(flag):
        raise exc_type(message)
