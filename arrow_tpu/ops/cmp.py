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
    if _is_decimal(lhs) or _is_decimal(rhs):
        return _compare_decimal(op, lhs, rhs)
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


# ---- decimal comparison (cmp.rs decimal arms) ---------------------------------

def _is_decimal(x: Datum) -> bool:
    return isinstance(x, Column) and x.dtype.is_decimal


def _compare_decimal(op: str, lhs: Column, rhs: Column
                     ) -> PrimitiveColumn:
    """Compare decimals of any widths/scales: rescale to the common
    scale, then compare — decimal32/64 on device ints, decimal128/256
    lexicographically over u64 limb planes on device."""
    from ..core.nested import DecimalColumn
    from .cast import cast, CastOptions
    ld, rd = lhs.dtype, rhs.dtype
    if not (ld.is_decimal and rd.is_decimal):
        raise ArrowTypeError(f"cannot compare {ld!r} with {rd!r}")
    s_ = max(ld.scale, rd.scale)
    # rescale both sides losslessly to the common scale; width grows as
    # needed so no value can overflow during the rescale
    def rescaled(c):
        d = c.dtype
        p = d.precision + (s_ - d.scale)
        if p > 76:
            raise ArrowTypeError("decimal comparison scale overflow")
        ctor = dt.decimal32 if p <= 9 else dt.decimal64 if p <= 18 \
            else dt.decimal128 if p <= 38 else dt.decimal256
        return cast(c, ctor(p, s_), CastOptions(safe=False))
    lc, rc = rescaled(lhs), rescaled(rhs)
    mask = vd.union(lc.validity, rc.validity)

    def limbs_of(c, k):
        if isinstance(c, DecimalColumn):
            lb = c.limbs
            if lb.shape[1] < k:      # widen with sign extension
                import jax.numpy as _j
                sign = (lb[:, -1] >> _j.uint64(63)).astype(_j.uint64)
                ext = _j.where(sign[:, None] == 1,
                               _j.uint64(0xFFFFFFFFFFFFFFFF),
                               _j.uint64(0)) * _j.ones(
                    (lb.shape[0], k - lb.shape[1]), _j.uint64)
                lb = _j.concatenate([lb, ext], axis=1)
            return lb
        import jax
        import jax.numpy as _j
        v = c.values.astype(_j.int64)
        lb = jax.lax.bitcast_convert_type(v, _j.uint64)[:, None]
        if k > 1:
            sign = (lb[:, 0] >> _j.uint64(63))
            ext = _j.where(sign[:, None] == 1,
                           _j.uint64(0xFFFFFFFFFFFFFFFF), _j.uint64(0)) \
                * _j.ones((lb.shape[0], k - 1), _j.uint64)
            lb = _j.concatenate([lb, ext], axis=1)
        return lb

    if isinstance(lc, DecimalColumn) or isinstance(rc, DecimalColumn):
        k = max(lc.limbs.shape[1] if isinstance(lc, DecimalColumn) else 1,
                rc.limbs.shape[1] if isinstance(rc, DecimalColumn) else 1)
        la, ra = limbs_of(lc, k), limbs_of(rc, k)
        # lexicographic from the top limb: top compares signed, lower
        # limbs unsigned — flip the top limb's sign bit and compare the
        # whole stack unsigned
        flip = jnp.uint64(1) << jnp.uint64(63)
        la = la.at[:, -1].set(la[:, -1] ^ flip)
        ra = ra.at[:, -1].set(ra[:, -1] ^ flip)
        eq_mask = jnp.all(la == ra, axis=1)
        lt_mask = jnp.zeros(la.shape[:1], jnp.bool_)
        tied = jnp.ones(la.shape[:1], jnp.bool_)
        for j in range(k - 1, -1, -1):
            lt_mask = lt_mask | (tied & (la[:, j] < ra[:, j]))
            tied = tied & (la[:, j] == ra[:, j])
        out = {"eq": eq_mask, "neq": ~eq_mask, "lt": lt_mask,
               "lt_eq": lt_mask | eq_mask,
               "gt": ~(lt_mask | eq_mask), "gt_eq": ~lt_mask}[op]
        return PrimitiveColumn(out, dt.bool_, mask)
    return PrimitiveColumn(_OPS[op](lc.values, rc.values), dt.bool_, mask)
