"""Arithmetic kernels: add/sub/mul/div/rem/neg with checked and wrapping
variants, mirroring arrow-arith/src/numeric.rs:34-101.

Semantics matched to the reference:
  - both operands must share a primitive type (cast first); the temporal
    special cases timestamp±duration and timestamp-timestamp are supported.
  - `add` etc. are CHECKED: integer overflow raises ArithmeticOverflow
    (eagerly, by syncing an error-flag tensor); `add_wrapping` etc. wrap —
    XLA integer arithmetic wraps two's-complement natively.
  - integer division truncates toward zero and raises DivideByZero on any
    valid zero divisor (Rust semantics; jax.lax.div/rem are the C-semantics
    primitives, NOT jnp's floor-based // and %).
  - float arithmetic is IEEE (div by zero -> inf, as in Rust f64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import dtypes as dt
from ..core.column import PrimitiveColumn
from ..core.datum import Datum, as_datum
from ..errors import ArithmeticOverflow, ArrowTypeError, DivideByZero
from .arity import binary, binary_with_flag, check_flag, unary

__all__ = [
    "add", "sub", "mul", "div", "rem", "neg",
    "add_wrapping", "sub_wrapping", "mul_wrapping", "neg_wrapping",
]


def _dtype_of(x: Datum) -> dt.DataType:
    return as_datum(x).dtype


def _is_int(d: dt.DataType) -> bool:
    return d.is_integer or d.name in ("timestamp", "duration", "date32",
                                      "date64", "time32", "time64")


def _temporal_out(op: str, l: dt.DataType, r: dt.DataType):
    """Temporal type rules (arrow-arith/src/numeric.rs dispatch)."""
    if l.name == "timestamp" and r.name == "duration" and op in ("add", "sub"):
        if l.unit != r.unit:
            raise ArrowTypeError(f"unit mismatch {l!r} vs {r!r}")
        return l
    if l.name == "duration" and r.name == "timestamp" and op == "add":
        return r
    if l.name == "timestamp" and r.name == "timestamp" and op == "sub":
        if l.unit != r.unit:
            raise ArrowTypeError(f"unit mismatch {l!r} vs {r!r}")
        return dt.duration(l.unit)
    if l.name == "duration" and r.name == "duration" and op in ("add", "sub"):
        if l.unit != r.unit:
            raise ArrowTypeError(f"unit mismatch {l!r} vs {r!r}")
        return l
    return None


def _resolve(op: str, lhs: Datum, rhs: Datum):
    l, r = _dtype_of(lhs), _dtype_of(rhs)
    if l == r and (l.is_numeric or l.name == "duration"):
        return l, False
    out = _temporal_out(op, l, r)
    if out is not None:
        return out, True
    raise ArrowTypeError(f"cannot {op} {l!r} and {r!r}")


# ---- overflow detection (branch-free, on the VPU) ---------------------------

def _add_overflows(l, r, s):
    # signed: overflow iff operands share sign and result differs
    if jnp.issubdtype(l.dtype, jnp.signedinteger):
        return ((l >= 0) == (r >= 0)) & ((s >= 0) != (l >= 0))
    return s < l  # unsigned wraparound


def _sub_overflows(l, r, s):
    if jnp.issubdtype(l.dtype, jnp.signedinteger):
        return ((l >= 0) != (r >= 0)) & ((s >= 0) != (l >= 0))
    return l < r


def _mul_overflows(l, r, p):
    # p = l * r (wrapped). overflow iff r != 0 and p / r != l, plus the
    # MIN * -1 corner for signed.
    nz = r != 0
    bad = nz & (jax.lax.div(p, jnp.where(nz, r, 1)) != l)
    if jnp.issubdtype(l.dtype, jnp.signedinteger):
        lo = jnp.array(jnp.iinfo(l.dtype).min, l.dtype)
        bad = bad | ((l == lo) & (r == -1)) | ((r == lo) & (l == -1))
    return bad


# ---- checked ops (the reference's default: add/sub/mul/div/rem) -------------

def add(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    out_dt, _ = _resolve("add", lhs, rhs)
    if _is_int(out_dt):
        def fn(l, r):
            s = l + r
            return s, _add_overflows(l, r, s)
        col, flag = binary_with_flag(lhs, rhs, fn, out_dt,
                                     require_same_type=False)
        check_flag(flag, ArithmeticOverflow, "add overflowed")
        return col
    return binary(lhs, rhs, jnp.add, out_dt)


def sub(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    out_dt, _ = _resolve("sub", lhs, rhs)
    if _is_int(out_dt):
        def fn(l, r):
            s = l - r
            return s, _sub_overflows(l, r, s)
        col, flag = binary_with_flag(lhs, rhs, fn, out_dt,
                                     require_same_type=False)
        check_flag(flag, ArithmeticOverflow, "sub overflowed")
        return col
    return binary(lhs, rhs, jnp.subtract, out_dt)


def mul(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    out_dt, _ = _resolve("mul", lhs, rhs)
    if _is_int(out_dt):
        def fn(l, r):
            p = l * r
            return p, _mul_overflows(l, r, p)
        col, flag = binary_with_flag(lhs, rhs, fn, out_dt,
                                     require_same_type=False)
        check_flag(flag, ArithmeticOverflow, "mul overflowed")
        return col
    return binary(lhs, rhs, jnp.multiply, out_dt)


def div(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    out_dt, _ = _resolve("div", lhs, rhs)
    if _is_int(out_dt):
        def fn(l, r):
            zero = r == 0
            safe_r = jnp.where(zero, 1, r)
            q = jax.lax.div(l, safe_r)  # trunc toward zero (Rust semantics)
            if jnp.issubdtype(l.dtype, jnp.signedinteger):
                lo = jnp.array(jnp.iinfo(l.dtype).min, l.dtype)
                over = (l == lo) & (r == -1)
            else:
                over = jnp.zeros_like(zero)
            return jnp.where(zero, 0, q), zero | over
        col, flag = binary_with_flag(lhs, rhs, fn, out_dt,
                                     require_same_type=False)
        check_flag(flag, DivideByZero, "integer division by zero/overflow")
        return col
    return binary(lhs, rhs, jnp.divide, out_dt)


def rem(lhs: Datum, rhs: Datum) -> PrimitiveColumn:
    out_dt, _ = _resolve("rem", lhs, rhs)
    if _is_int(out_dt):
        def fn(l, r):
            zero = r == 0
            safe_r = jnp.where(zero, 1, r)
            m = jax.lax.rem(l, safe_r)  # truncated remainder (Rust %)
            return jnp.where(zero, 0, m), zero
        col, flag = binary_with_flag(lhs, rhs, fn, out_dt,
                                     require_same_type=False)
        check_flag(flag, DivideByZero, "integer remainder by zero")
        return col
    # float rem: Rust % is truncated fmod, == lax.rem
    return binary(lhs, rhs, jax.lax.rem, out_dt)


def neg(col) -> PrimitiveColumn:
    col = as_datum(col)
    if col.dtype.is_signed_integer or col.dtype.name == "duration":
        lo = jnp.iinfo(col.dtype.to_jax()).min
        bad = jnp.any(jnp.logical_and(col.values == lo,
                                      col.is_valid_mask()))
        check_flag(bad, ArithmeticOverflow, "neg overflowed")
        return unary(col, jnp.negative)
    if col.dtype.is_floating:
        return unary(col, jnp.negative)
    raise ArrowTypeError(f"cannot negate {col.dtype!r}")


# ---- wrapping variants -------------------------------------------------------

def add_wrapping(lhs, rhs):
    out_dt, _ = _resolve("add", lhs, rhs)
    return binary(lhs, rhs, jnp.add, out_dt, require_same_type=False)


def sub_wrapping(lhs, rhs):
    out_dt, _ = _resolve("sub", lhs, rhs)
    return binary(lhs, rhs, jnp.subtract, out_dt, require_same_type=False)


def mul_wrapping(lhs, rhs):
    out_dt, _ = _resolve("mul", lhs, rhs)
    return binary(lhs, rhs, jnp.multiply, out_dt, require_same_type=False)


def neg_wrapping(col):
    col = as_datum(col)
    return unary(col, lambda v: jnp.zeros_like(v) - v
                 if jnp.issubdtype(v.dtype, jnp.integer) else jnp.negative(v))
