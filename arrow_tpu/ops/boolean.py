"""Boolean mask kernels: and/or/not (+ Kleene variants), is_null/is_not_null.

Semantics of arrow-arith/src/boolean.rs: the default and/or return null when
either input is null (validity union, boolean.rs:254,271); the Kleene
variants implement SQL three-valued logic (boolean.rs:60,155).  Where the
reference runs word-at-a-time over packed bitmaps (bitwise_bin_op_helper),
here masks are dense bool lanes on the VPU and XLA fuses the whole
expression.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import dtypes as dt
from ..core import validity as vd
from ..core.column import PrimitiveColumn
from ..core.datum import Datum, as_datum, broadcast_pair
from ..errors import ArrowTypeError

__all__ = ["and_", "or_", "not_", "and_kleene", "or_kleene",
           "is_null", "is_not_null"]


def _check_bool(*dts):
    for d in dts:
        if not d.is_boolean:
            raise ArrowTypeError(f"boolean kernel on {d!r}")


def and_(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    lv, rv, mask, n, ldt, rdt = broadcast_pair(lhs, rhs)
    _check_bool(ldt, rdt)
    return PrimitiveColumn(jnp.logical_and(lv, rv), dt.bool_, mask)


def or_(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    lv, rv, mask, n, ldt, rdt = broadcast_pair(lhs, rhs)
    _check_bool(ldt, rdt)
    return PrimitiveColumn(jnp.logical_or(lv, rv), dt.bool_, mask)


def not_(col) -> PrimitiveColumn:
    col = as_datum(col)
    _check_bool(col.dtype)
    return PrimitiveColumn(jnp.logical_not(col.values), dt.bool_,
                           col.validity)


def and_kleene(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    """false AND null = false; null AND null = null (boolean.rs:60)."""
    lv, rv, _, n, ldt, rdt = broadcast_pair(lhs, rhs)
    _check_bool(ldt, rdt)
    lm = _mask_of(lhs, n)
    rm = _mask_of(rhs, n)
    value = jnp.logical_and(jnp.logical_and(lv, lm), jnp.logical_and(rv, rm))
    # result is known (valid) if both valid, or either side is a valid false
    known = (lm & rm) | (lm & ~lv) | (rm & ~rv)
    validity = None if bool_is_static_all(known) else known
    return PrimitiveColumn(value, dt.bool_, validity)


def or_kleene(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    """true OR null = true (boolean.rs:155)."""
    lv, rv, _, n, ldt, rdt = broadcast_pair(lhs, rhs)
    _check_bool(ldt, rdt)
    lm = _mask_of(lhs, n)
    rm = _mask_of(rhs, n)
    value = jnp.logical_or(jnp.logical_and(lv, lm), jnp.logical_and(rv, rm))
    known = (lm & rm) | (lm & lv) | (rm & rv)
    validity = None if bool_is_static_all(known) else known
    return PrimitiveColumn(value, dt.bool_, validity)


def _mask_of(x, n):
    x = as_datum(x)
    from ..core.datum import Scalar
    if isinstance(x, Scalar):
        return jnp.full((n,), x.valid, jnp.bool_)
    return vd.make_mask(n, x.validity)


def bool_is_static_all(mask) -> bool:
    """Only collapses a mask we can prove all-true WITHOUT a device sync
    (i.e. never, for traced masks) — placeholder for a host fast path."""
    return False


def is_null(col) -> PrimitiveColumn:
    """Non-null output: true where slot is null (boolean.rs:325)."""
    col = as_datum(col)
    if col.validity is None:
        return PrimitiveColumn(jnp.zeros((len(col),), jnp.bool_), dt.bool_)
    return PrimitiveColumn(jnp.logical_not(col.validity), dt.bool_)


def is_not_null(col) -> PrimitiveColumn:
    col = as_datum(col)
    if col.validity is None:
        return PrimitiveColumn(jnp.ones((len(col),), jnp.bool_), dt.bool_)
    return PrimitiveColumn(col.validity, dt.bool_)
