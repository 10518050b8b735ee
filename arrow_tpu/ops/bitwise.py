"""Bitwise kernels (arrow-arith/src/bitwise.rs): and/or/xor/not, shifts,
wrapping semantics on the integer storage — direct VPU ops."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.column import PrimitiveColumn
from ..core.datum import Datum
from ..errors import ArrowTypeError
from .arity import binary, unary

__all__ = ["bitwise_and", "bitwise_or", "bitwise_xor", "bitwise_not",
           "bitwise_shift_left", "bitwise_shift_right"]


def _check_int(col):
    pass  # dtype agreement enforced by the arity template


def bitwise_and(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    return binary(lhs, rhs, jnp.bitwise_and)


def bitwise_or(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    return binary(lhs, rhs, jnp.bitwise_or)


def bitwise_xor(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    return binary(lhs, rhs, jnp.bitwise_xor)


def bitwise_not(col) -> PrimitiveColumn:
    from ..core.datum import as_datum
    col = as_datum(col)
    if not col.dtype.is_integer:
        raise ArrowTypeError(f"bitwise_not of {col.dtype!r}")
    return unary(col, jnp.invert)


def bitwise_shift_left(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    """Wrapping shift (bitwise.rs bitwise_shift_left: shift amount is taken
    modulo the bit width, Rust wrapping_shl semantics)."""
    def fn(l, r):
        bits = l.dtype.itemsize * 8
        return jnp.left_shift(l, (r % bits).astype(l.dtype))
    return binary(lhs, rhs, fn)


def bitwise_shift_right(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    def fn(l, r):
        bits = l.dtype.itemsize * 8
        return jnp.right_shift(l, (r % bits).astype(l.dtype))
    return binary(lhs, rhs, fn)
