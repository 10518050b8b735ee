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
from ..core.column import Column, PrimitiveColumn
from ..core.datum import Datum, as_datum
from ..errors import (ArithmeticOverflow, ArrowInvalid,
                      ArrowTypeError, DivideByZero)
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
        if l.unit != r.unit:
            raise ArrowTypeError(f"unit mismatch {l!r} vs {r!r}")
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
    if _any_decimal(lhs, rhs):
        return _decimal_arith("add", lhs, rhs)
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
    if _any_decimal(lhs, rhs):
        return _decimal_arith("sub", lhs, rhs)
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
    if _any_decimal(lhs, rhs):
        return _decimal_arith("mul", lhs, rhs)
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
    if _any_decimal(lhs, rhs):
        return _decimal_arith("div", lhs, rhs)
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
            if jnp.issubdtype(l.dtype, jnp.signedinteger):
                # Rust checked_rem: MIN % -1 is an overflow error
                lo = jnp.array(jnp.iinfo(l.dtype).min, l.dtype)
                bad = zero | ((l == lo) & (r == -1))
            else:
                bad = zero
            safe_r = jnp.where(bad, 1, r)
            m = jax.lax.rem(l, safe_r)  # truncated remainder (Rust %)
            return jnp.where(bad, 0, m), bad
        col, flag = binary_with_flag(lhs, rhs, fn, out_dt,
                                     require_same_type=False)
        check_flag(flag, DivideByZero, "integer remainder by zero/overflow")
        return col
    # float rem: Rust % is truncated fmod, == lax.rem
    return binary(lhs, rhs, jax.lax.rem, out_dt)


def neg(col) -> PrimitiveColumn:
    col = as_datum(col)
    d = col.dtype
    if d.is_decimal:
        # neg_checked per value (numeric.rs:114-141): any valid decimal's
        # negation stays within the precision bound, so no check needed
        # (only the storage MIN would overflow, and it exceeds every
        # precision limit)
        from ..core.nested import DecimalColumn
        if isinstance(col, DecimalColumn):
            ints = [None if v is None else -v for v in col.to_pyints()]
            return DecimalColumn.from_pyints(
                [0 if v is None else v for v in ints], d, col.validity)
        return PrimitiveColumn(-col.values, d, col.validity,
                               _canonical=True)
    if d.name == "interval":
        from ..core.nested import IntervalMDNColumn
        if isinstance(col, IntervalMDNColumn):
            # per-part neg_checked (numeric.rs:159-171)
            bad = ((col.months == jnp.iinfo(jnp.int32).min)
                   | (col.days == jnp.iinfo(jnp.int32).min)
                   | (col.nanos == jnp.iinfo(jnp.int64).min))
            check_flag(jnp.any(bad & col.is_valid_mask()),
                       ArithmeticOverflow, "neg overflowed")
            return IntervalMDNColumn(-col.months, -col.days, -col.nanos,
                                     col.validity)
        if d.unit == "day_time":
            # packed days<<32|ms: negate each i32 part (numeric.rs:147)
            x = col.values.astype(jnp.int64)
            days, ms = (x >> 32).astype(jnp.int32), x.astype(jnp.int32)
            i32min = jnp.iinfo(jnp.int32).min
            bad = (days == i32min) | (ms == i32min)
            check_flag(jnp.any(bad & col.is_valid_mask()),
                       ArithmeticOverflow, "neg overflowed")
            packed = (((-days).astype(jnp.int64) << 32)
                      | ((-ms).astype(jnp.int64)
                         & jnp.int64(0xFFFFFFFF)))
            return PrimitiveColumn(packed, d, col.validity,
                                   _canonical=True)
        # year_month falls through to the checked signed path below
    if (col.dtype.is_signed_integer or col.dtype.name == "duration"
            or col.dtype.name == "interval"):
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


# ---- decimal arithmetic (arrow-arith numeric.rs decimal cases; result
# type promotion and truncation-toward-zero division match Arrow) ------------

def _any_decimal(lhs, rhs) -> bool:
    return _dtype_of(lhs).is_decimal or _dtype_of(rhs).is_decimal


def _dec_parts(x):
    """(unscaled python ints, validity np-or-None, precision, scale)."""
    import numpy as np
    from ..core.nested import DecimalColumn
    col = as_datum(x)
    d = col.dtype
    if not d.is_decimal:
        raise ArrowTypeError(f"decimal arithmetic with {d!r}")
    if isinstance(col, DecimalColumn):
        raw = col.to_pyints()
        ints = [0 if v is None else v for v in raw]
    else:
        ints = [int(v) for v in np.asarray(col.values)]
    valid = None if col.validity is None else np.asarray(col.validity)
    return ints, valid, d.precision, d.scale, len(col)


def _dec_result_type(op, p1, s1, p2, s2):
    # precision saturates at the operand family's max (numeric.rs
    # saturating_add(..).min(MAX_PRECISION)); scale overflow errors
    mx = 38 if max(p1, p2) <= 38 else 76
    if op in ("add", "sub"):
        s = max(s1, s2)
        p = max(p1 - s1, p2 - s2) + s + 1
    elif op == "mul":
        s = s1 + s2
        p = p1 + p2 + 1
    else:                                    # div (numeric.rs:884):
        s = min(s1 + 4, mx)                  # postgres-style s1 + 4
        p = p1 - s1 + s2 + s
    if s > mx:
        raise ArrowInvalid(f"decimal scale out of range: {s}")
    return min(p, mx), s


def _decimal_arith(op, lhs, rhs) -> Column:
    import numpy as np
    import jax.numpy as jnp
    from ..core.nested import DecimalColumn
    li, lv, p1, s1, n1 = _dec_parts(lhs)
    ri, rv, p2, s2, n2 = _dec_parts(rhs)
    if n1 != n2:
        raise ArrowInvalid("decimal arithmetic length mismatch")
    p, s = _dec_result_type(op, p1, s1, p2, s2)
    out = []
    dbz = False
    for a, b in zip(li, ri):
        if op == "add":
            out.append(a * 10 ** (s - s1) + b * 10 ** (s - s2))
        elif op == "sub":
            out.append(a * 10 ** (s - s1) - b * 10 ** (s - s2))
        elif op == "mul":
            out.append(a * b)                # scales add up exactly
        else:
            if b == 0:
                dbz = True
                out.append(0)
            else:
                mul_pow = s - s1 + s2
                num, den = (a * 10 ** mul_pow, b) if mul_pow >= 0 \
                    else (a, b * 10 ** (-mul_pow))
                q = abs(num) // abs(den)     # truncate toward zero
                out.append(q if (num >= 0) == (den >= 0) else -q)
    valid = None
    if lv is not None or rv is not None:
        valid = np.ones(n1, bool)
        if lv is not None:
            valid &= lv
        if rv is not None:
            valid &= rv
    if dbz:
        # division by zero on a VALID slot raises (checked semantics)
        bad = np.asarray([b == 0 for b in ri])
        live = bad if valid is None else (bad & valid)
        if live.any():
            raise DivideByZero("decimal divide by zero")
    # storage width: at least the wider input (Arrow keeps decimal128
    # for decimal128 inputs even when the result precision fits less),
    # widened further if the result precision demands it
    rank_of = {"decimal32": 1, "decimal64": 2, "decimal128": 3,
               "decimal256": 4}
    need = 1 if p <= 9 else 2 if p <= 18 else 3 if p <= 38 else 4
    rank = max(need, rank_of[_dtype_of(lhs).name],
               rank_of[_dtype_of(rhs).name])
    ctor = [dt.decimal32, dt.decimal64, dt.decimal128,
            dt.decimal256][rank - 1]
    out_dt = ctor(p, s)
    v = None if valid is None else jnp.asarray(valid)
    if out_dt.name in ("decimal32", "decimal64"):
        phys = np.int32 if out_dt.name == "decimal32" else np.int64
        return PrimitiveColumn(jnp.asarray(np.asarray(out, phys)),
                               out_dt, v)
    return DecimalColumn.from_pyints(out, out_dt, v)
