"""Comparison kernels: eq/neq/lt/lt_eq/gt/gt_eq + distinct/not_distinct.

Mirrors arrow-ord/src/cmp.rs:79-200 on Datum pairs.  The reference builds
its output 64-bools-per-word (cmp.rs:395 collect_bool); here outputs are
dense bool lanes.  Dictionary operands compare via decoded values
(late materialization, cmp.rs:387) — see ops.strings for the
dictionary-aware entry points; this module handles primitive datums.

NaN note: these kernels are IEEE (NaN != NaN), like the reference's
`eq` on floats; total-order comparison lives in ops.sort / ops.row_format.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import dtypes as dt
from ..core import validity as vd
from ..core.column import Column, DictionaryColumn, PrimitiveColumn, StringColumn
from ..core.datum import Datum, Scalar, as_datum, broadcast_pair
from ..errors import ArrowTypeError

__all__ = ["eq", "neq", "lt", "lt_eq", "gt", "gt_eq",
           "distinct", "not_distinct"]

_OPS = {
    "eq": jnp.equal, "neq": jnp.not_equal,
    "lt": jnp.less, "lt_eq": jnp.less_equal,
    "gt": jnp.greater, "gt_eq": jnp.greater_equal,
}


def _dispatch(op: str, lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    # dictionary / string operands route through the strings module
    # (before as_datum: raw str/bytes scalars have no tensor representation)
    if _is_stringy(lhs) or _is_stringy(rhs):
        from . import strings
        return strings.compare(op, lhs, rhs)
    lhs, rhs = as_datum(lhs), as_datum(rhs)
    lv, rv, mask, n, ldt, rdt = broadcast_pair(lhs, rhs)
    if ldt != rdt and not (ldt.is_numeric and rdt.is_numeric
                           and ldt.to_jax() == rdt.to_jax()):
        raise ArrowTypeError(f"cannot compare {ldt!r} with {rdt!r}")
    return PrimitiveColumn(_OPS[op](lv, rv), dt.bool_, mask)


def _is_stringy(x: Datum) -> bool:
    if isinstance(x, (StringColumn, DictionaryColumn)):
        return True
    if isinstance(x, Scalar) and (x.dtype.is_string or x.dtype.is_binary):
        return True
    return isinstance(x, str) or isinstance(x, bytes)


def eq(lhs, rhs):
    return _dispatch("eq", lhs, rhs)


def neq(lhs, rhs):
    return _dispatch("neq", lhs, rhs)


def lt(lhs, rhs):
    return _dispatch("lt", lhs, rhs)


def lt_eq(lhs, rhs):
    return _dispatch("lt_eq", lhs, rhs)


def gt(lhs, rhs):
    return _dispatch("gt", lhs, rhs)


def gt_eq(lhs, rhs):
    return _dispatch("gt_eq", lhs, rhs)


def distinct(lhs, rhs) -> PrimitiveColumn:
    """Null-aware !=: null distinct null = false, null distinct x = true.
    Output has no nulls (cmp.rs `distinct`)."""
    lhs, rhs = as_datum(lhs), as_datum(rhs)
    lv, rv, _, n, ldt, rdt = broadcast_pair(lhs, rhs)
    lm = _mask(lhs, n)
    rm = _mask(rhs, n)
    both_valid = lm & rm
    value = jnp.where(both_valid, lv != rv, lm != rm)
    return PrimitiveColumn(value, dt.bool_)


def not_distinct(lhs, rhs) -> PrimitiveColumn:
    out = distinct(lhs, rhs)
    return PrimitiveColumn(jnp.logical_not(out.values), dt.bool_)


def _mask(x, n):
    if isinstance(x, Scalar):
        return jnp.full((n,), x.valid, jnp.bool_)
    return vd.make_mask(n, x.validity)
