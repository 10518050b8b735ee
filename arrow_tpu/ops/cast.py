"""Type conversion: the engine's arrow-cast.

Re-design of cast_with_options (arrow-cast/src/cast/mod.rs:306,696) with the
reference's CastOptions{safe} semantics (mod.rs:73):

    safe=True  -> value that cannot convert becomes NULL
    safe=False -> raises CastError

Dispatch groups (of the reference's 213 match arms, the families are):
  numeric <-> numeric          device: bounds-mask + convert
  numeric <-> boolean          device (nonzero / 0-1)
  temporal unit conversions    device: scaled int arithmetic
  numeric <-> utf8             host format/parse (strings are host-side by
                               design; hot paths keep dictionary codes)
  dictionary pack/unpack       cast values, keep codes / encode / decode
  anything -> same type        no-op
  null -> T                    all-null column

Out-of-scope this round: decimal rescale, interval casts, nested list casts
(cast/{decimal,list,map}.rs) — tracked in README parity table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..core import validity as vd
from ..core.column import (Column, DictionaryColumn, NullColumn,
                           PrimitiveColumn, StringColumn)
from ..errors import ArrowNotImplementedError, CastError

__all__ = ["CastOptions", "cast", "can_cast"]

_UNIT_NS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


@dataclass(frozen=True)
class CastOptions:
    safe: bool = True


def can_cast(from_dt: dt.DataType, to_dt: dt.DataType) -> bool:
    """can_cast_types (mod.rs:92) for the implemented subset."""
    if from_dt == to_dt:
        return True
    if from_dt.is_null or to_dt.is_null:
        return True
    prim = lambda d: d.is_numeric or d.is_boolean or d.is_temporal
    if prim(from_dt) and prim(to_dt):
        return True
    if (from_dt.is_string or from_dt.is_binary) and \
            (prim(to_dt) or to_dt.is_string or to_dt.is_dictionary):
        return True
    if prim(from_dt) and to_dt.is_string:
        return True
    if from_dt.is_dictionary or to_dt.is_dictionary:
        inner_from = from_dt.value_type if from_dt.is_dictionary else from_dt
        inner_to = to_dt.value_type if to_dt.is_dictionary else to_dt
        return can_cast(inner_from, inner_to)
    return False


def cast(col: Column, to: dt.DataType,
         options: CastOptions = CastOptions()) -> Column:
    from_dt = col.dtype
    if from_dt == to:
        return col

    if isinstance(col, NullColumn):
        return _all_null(to, len(col))

    if isinstance(col, DictionaryColumn):
        if to.is_dictionary:
            new_values = cast(col.values, to.value_type, options)
            out = DictionaryColumn(
                col.codes.astype(to.index_type.to_jax()), new_values,
                col.validity, _canonical=True)
            return out
        # unpack: decode then cast (dictionary_cast, mod.rs:742)
        from .strings import dictionary_decode
        if isinstance(col.values, StringColumn):
            return cast(dictionary_decode(col), to, options)
        from .take import take
        decoded = take(col.values,
                       PrimitiveColumn(col.codes, dt.int32, col.validity))
        return cast(decoded, to, options)

    if to.is_dictionary:
        inner = cast(col, to.value_type, options)
        if isinstance(inner, StringColumn):
            from .strings import dictionary_encode
            return dictionary_encode(inner, to.index_type.to_jax())
        raise ArrowNotImplementedError(f"pack {to.value_type!r} dictionary")

    if isinstance(col, StringColumn):
        return _cast_from_string(col, to, options)

    assert isinstance(col, PrimitiveColumn), type(col)
    if to.is_string:
        return _cast_to_string(col, to)
    return _cast_primitive(col, to, options)


def _all_null(to: dt.DataType, n: int) -> Column:
    if to.is_null:
        return NullColumn(n)
    mask = jnp.zeros((n,), jnp.bool_)
    if to.is_string or to.is_binary:
        return StringColumn(jnp.zeros((n + 1,), jnp.int32),
                            jnp.zeros((0,), jnp.uint8), to, mask)
    return PrimitiveColumn(jnp.zeros((n,), to.to_jax()), to, mask)


# ---- primitive <-> primitive -------------------------------------------------

def _temporal_scale(d: dt.DataType) -> Optional[int]:
    """Nanoseconds per unit for temporal types; None for non-temporal."""
    if d.name in ("timestamp", "duration", "time32", "time64"):
        return _UNIT_NS[d.unit]
    if d.name == "date32":
        return 86_400 * _UNIT_NS["s"]
    if d.name == "date64":
        return _UNIT_NS["ms"]
    return None


def _apply_failures(values, failed, col_validity, to, options: CastOptions
                    ) -> PrimitiveColumn:
    if col_validity is not None:
        failed = jnp.logical_and(failed, col_validity)
    if not options.safe:
        if bool(jnp.any(failed)):
            raise CastError(f"cast failed for {int(jnp.sum(failed))} values")
        return PrimitiveColumn(values, to, col_validity)
    validity = vd.union(col_validity, jnp.logical_not(failed))
    return PrimitiveColumn(values, to, validity)


def _cast_primitive(col: PrimitiveColumn, to: dt.DataType,
                    options: CastOptions) -> PrimitiveColumn:
    from_dt = col.dtype
    v = col.values
    fs, ts = _temporal_scale(from_dt), _temporal_scale(to)

    # temporal <-> temporal: rescale through the unit ratio
    if fs is not None and ts is not None:
        x = v.astype(jnp.int64)
        if fs >= ts:
            out = x * (fs // ts)
        else:
            div = ts // fs
            # timestamp->coarser floors toward -inf (chrono semantics);
            # date32 extraction from timestamp likewise
            out = jnp.floor_divide(x, div)
        failed = jnp.zeros(v.shape, jnp.bool_)
        return _apply_failures(out.astype(to.to_jax()), failed,
                               col.validity, to, options)

    # temporal -> numeric / numeric -> temporal: reinterpret storage
    if fs is not None or ts is not None:
        storage = dt.int64 if (from_dt if fs else to).byte_width == 8 \
            else dt.int32
        if fs is not None:  # temporal -> numeric
            return _cast_primitive(
                PrimitiveColumn(v, storage, col.validity, _canonical=True),
                to, options)
        # numeric -> temporal: convert to the temporal storage int first
        inner = _cast_primitive(col, dt.int64 if to.byte_width == 8
                                else dt.int32, options)
        return PrimitiveColumn(inner.values.astype(to.to_jax()), to,
                               inner.validity, _canonical=True)

    if to.is_boolean:
        if from_dt.is_floating or from_dt.is_integer:
            out = v != 0
            return PrimitiveColumn(out, to, col.validity)
        raise ArrowNotImplementedError(f"{from_dt!r} -> bool")

    if from_dt.is_boolean:
        return PrimitiveColumn(v.astype(to.to_jax()), to, col.validity)

    if to.is_floating:
        # int -> float / float -> float never fail (rounding allowed,
        # overflow -> inf), matching num::cast ToPrimitive
        return PrimitiveColumn(v.astype(to.to_jax()), to, col.validity)

    if to.is_integer:
        lo, hi = dt.integer_bounds(to)
        if from_dt.is_floating:
            # fail on NaN/inf/out-of-range; trunc toward zero
            t = jnp.trunc(v.astype(jnp.float64))
            failed = jnp.logical_not(
                jnp.isfinite(t) & (t >= float(lo)) & (t <= float(hi)))
            safe_t = jnp.where(failed, 0.0, t)
            return _apply_failures(safe_t.astype(to.to_jax()), failed,
                                   col.validity, to, options)
        # int -> int bounds check
        if from_dt.is_unsigned_integer:
            x = v.astype(jnp.uint64)
            failed = x > jnp.uint64(min(hi, 2 ** 64 - 1)) if hi < 2 ** 64 - 1 \
                else jnp.zeros(v.shape, jnp.bool_)
        else:
            x = v.astype(jnp.int64)
            failed = (x < lo) | (x > hi) if (lo > -2 ** 63 or hi < 2 ** 63 - 1) \
                else jnp.zeros(v.shape, jnp.bool_)
            if to.is_unsigned_integer:
                failed = (x < 0) | failed if lo == 0 else failed
        safe_x = jnp.where(failed, 0, x)
        return _apply_failures(safe_x.astype(to.to_jax()), failed,
                               col.validity, to, options)

    raise ArrowNotImplementedError(f"cast {from_dt!r} -> {to!r}")


# ---- string paths (host; cf. cast/parse.rs and display.rs) --------------------

def _cast_to_string(col: PrimitiveColumn, to: dt.DataType) -> StringColumn:
    vals = np.asarray(col.values)
    mask = None if col.validity is None else np.asarray(col.validity)
    d = col.dtype
    out = []
    for i in range(len(vals)):
        if mask is not None and not mask[i]:
            out.append(None)
        elif d.is_boolean:
            out.append("true" if vals[i] else "false")
        elif d.is_floating:
            out.append(_format_float(float(vals[i])))
        elif d.is_temporal:
            out.append(_format_temporal(int(vals[i]), d))
        else:
            out.append(str(int(vals[i])))
    return StringColumn.from_pylist(out, to)


def _format_float(x: float) -> str:
    """Shortest-roundtrip float formatting (the reference uses Ryu via
    lexical; Python's repr is also shortest-roundtrip).  Divergence from
    Rust Display: integral floats render '1.0' not '1'."""
    if np.isnan(x):
        return "NaN"
    if np.isinf(x):
        return "inf" if x > 0 else "-inf"
    return repr(x)


def _format_temporal(v: int, d: dt.DataType) -> str:
    import datetime
    if d.name == "date32":
        return (datetime.date(1970, 1, 1)
                + datetime.timedelta(days=v)).isoformat()
    if d.name == "timestamp":
        ns = v * _UNIT_NS[d.unit]
        ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=ns // 1000)
        return ts.isoformat(sep="T")
    return str(v)


def _cast_from_string(col: StringColumn, to: dt.DataType,
                      options: CastOptions) -> Column:
    if to.is_binary or to.is_string:
        return StringColumn(col.offsets, col.data, to, col.validity)
    lst = col.to_pylist_host()
    vals = np.zeros(len(lst), np.dtype(to.to_jax()))
    failed = np.zeros(len(lst), bool)
    for i, s in enumerate(lst):
        if s is None:
            continue
        try:
            vals[i] = _parse_one(s, to)
        except (ValueError, OverflowError):
            failed[i] = True
    out = PrimitiveColumn(jnp.asarray(vals), to, col.validity,
                          _canonical=True)
    return _apply_failures(out.values, jnp.asarray(failed), col.validity,
                           to, options)


def _parse_one(s: str, to: dt.DataType):
    s = s.strip()
    if to.is_boolean:
        low = s.lower()
        if low in ("true", "t", "1", "yes"):
            return True
        if low in ("false", "f", "0", "no"):
            return False
        raise ValueError(s)
    if to.is_integer:
        v = int(s)
        lo, hi = dt.integer_bounds(to)
        if v < lo or v > hi:
            raise OverflowError(s)
        return v
    if to.is_floating:
        return float(s)
    if to.name == "date32":
        import datetime
        return (datetime.date.fromisoformat(s)
                - datetime.date(1970, 1, 1)).days
    if to.name == "timestamp":
        import datetime
        x = datetime.datetime.fromisoformat(s.replace("Z", "+00:00"))
        if x.tzinfo is not None:
            x = x.replace(tzinfo=None)
        delta = x - datetime.datetime(1970, 1, 1)
        us = delta // datetime.timedelta(microseconds=1)
        return us * 1000 // _UNIT_NS[to.unit] if to.unit == "ns" \
            else us // (_UNIT_NS[to.unit] // 1000)
    raise ArrowNotImplementedError(f"parse to {to!r}")
