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

  decimal casts                rescale / int / float / string, any width
                               (host-exact python ints; cast/decimal.rs)
  list casts                   list <-> large_list <-> fixed_size_list,
                               child casts (cast/list.rs)

  map casts                    map <-> map (entry casts),
                               map <-> list<struct> (cast/map.rs)

  interval casts               the reference's narrow matrix
                               (mod.rs:283-298): interval unit widening to
                               month_day_nano, duration <-> month_day_nano,
                               int64/int32 reinterpret, utf8 parse
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
from ..errors import (ArrowInvalid, ArrowNotImplementedError,
                      ArrowTypeError, CastError)

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
    if from_dt.name == "interval" or to_dt.name == "interval":
        # the reference's narrow interval matrix (cast/mod.rs:283-298)
        if from_dt.name == "interval" and to_dt.name == "interval":
            return to_dt.unit == "month_day_nano"
        if from_dt.name == "interval":
            if to_dt.is_string:
                return True                   # display.rs:699-846
            if to_dt == dt.int64:
                return from_dt.unit in ("year_month", "day_time")
            return to_dt.name == "duration" and \
                from_dt.unit == "month_day_nano"
        if from_dt.is_string:
            return True                       # parse_interval (parse.rs)
        if from_dt == dt.int32:
            return to_dt.unit == "year_month"
        return from_dt.name == "duration" and to_dt.unit == "month_day_nano"
    prim = lambda d: d.is_numeric or d.is_boolean or d.is_temporal
    if from_dt.is_run_end_encoded or to_dt.is_run_end_encoded:
        # REE arms (cast/mod.rs:166-180 RunEndEncoded): value-type cast
        # with runs kept, decode-then-cast, or encode-after-cast
        inner_from = from_dt.value_type if from_dt.is_run_end_encoded \
            else from_dt
        inner_to = to_dt.value_type if to_dt.is_run_end_encoded else to_dt
        if to_dt.is_run_end_encoded and not (
                prim(inner_to) or inner_to.is_string):
            return False                      # run_end_encode surface
        return can_cast(inner_from, inner_to)
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
    if from_dt.is_decimal:
        return (to_dt.is_decimal or to_dt.is_integer or to_dt.is_floating
                or to_dt.is_string)
    if to_dt.is_decimal:
        return (from_dt.is_integer or from_dt.is_floating
                or from_dt.is_boolean or from_dt.is_string)
    lists = ("list", "large_list", "fixed_size_list", "list_view",
             "large_list_view")
    if from_dt.name in lists and to_dt.name in lists:
        return can_cast(from_dt.value_type, to_dt.value_type)
    if from_dt.name == "map" and to_dt.name == "map":
        return True
    if from_dt.name == "struct" and to_dt.name == "struct":
        return len(from_dt.fields) == len(to_dt.fields) and all(
            can_cast(f.dtype, t.dtype)
            for f, t in zip(from_dt.fields, to_dt.fields))
    if (from_dt.name == "map" and to_dt.name in lists) or \
            (from_dt.name in lists and to_dt.name == "map"):
        return True
    return False


def cast(col: Column, to: dt.DataType,
         options: CastOptions = CastOptions()) -> Column:
    from_dt = col.dtype
    if from_dt == to:
        return col

    if isinstance(col, NullColumn):
        return _all_null(to, len(col))
    if to.is_null:
        # (_, Null) arm (cast/mod.rs:306): values are discarded
        return NullColumn(len(col))

    from ..core.nested import RunEndColumn
    if isinstance(col, RunEndColumn):
        # REE source (cast/mod.rs:166 RunEndEncoded arms): cast the
        # values and keep the runs when the target is REE (re-checking
        # run-end width), else decode then cast
        if to.is_run_end_encoded:
            vals = cast(col.values, to.value_type, options)
            re_np = np.dtype(to.index_type.to_jax())
            if len(col) > np.iinfo(re_np).max:
                raise ArrowInvalid(
                    f"run ends overflow {to.index_type!r}: {len(col)}")
            return RunEndColumn(col.run_ends.astype(re_np), vals,
                                len(col))
        from .ree import run_end_decode
        return cast(run_end_decode(col), to, options)
    if to.is_run_end_encoded:
        # encode-after-cast; strings run-end encode through their
        # dictionary codes (run_end_encode is primitive-only)
        from .ree import run_end_encode
        inner = cast(col, to.value_type, options)
        if isinstance(inner, StringColumn):
            from .strings import dictionary_encode
            from .take import take
            d = dictionary_encode(inner)
            ree = run_end_encode(
                PrimitiveColumn(d.codes, dt.int32, d.validity),
                to.index_type)
            svals = take(d.values, ree.values)
            return RunEndColumn(ree.run_ends, svals, len(col))
        return run_end_encode(inner, to.index_type)

    if isinstance(col, DictionaryColumn):
        if to.is_dictionary:
            new_values = cast(col.values, to.value_type, options)
            # key narrowing goes through the checked numeric cast
            # (dictionary_cast, mod.rs:742): out-of-range codes become
            # null (safe) or raise (unsafe) instead of wrapping
            key_col = cast(PrimitiveColumn(col.codes, from_dt.index_type,
                                           col.validity),
                           to.index_type, options)
            out = DictionaryColumn(key_col.values, new_values,
                                   key_col.validity)
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

    from ..core.nested import DecimalColumn
    from ..core.column import ListColumn
    from ..core.nested import FixedSizeListColumn
    if from_dt.is_decimal or to.is_decimal:
        return _cast_decimal(col, to, options)
    from ..core.nested import MapColumn
    if isinstance(col, MapColumn) or to.name == "map":
        return _cast_map(col, to, options)
    from ..core.column import StructColumn
    if isinstance(col, StructColumn) and to.name == "struct":
        return _cast_struct(col, to, options)
    from ..core.nested import ListViewColumn
    if isinstance(col, (ListColumn, FixedSizeListColumn,
                        ListViewColumn)) or \
            to.name in ("list", "large_list", "fixed_size_list",
                        "list_view", "large_list_view"):
        return _cast_list(col, to, options)
    if from_dt.name == "interval" or to.name == "interval":
        return _cast_interval(col, to, options)

    if isinstance(col, StringColumn):
        return _cast_from_string(col, to, options)

    from ..core.nested import FixedSizeBinaryColumn
    if isinstance(col, FixedSizeBinaryColumn):
        # FixedSizeBinary -> Binary/Utf8 (and identity width changes)
        if to.is_binary or to.is_string:
            n, w = col.data.shape
            offs = jnp.arange(0, (n + 1) * w, w, dtype=jnp.int32)
            data = col.data.reshape(-1)
            if to.name == "fixed_size_binary":
                if to.list_size != w:
                    raise ArrowInvalid(
                        f"fsb width change {w}->{to.list_size}")
                return col
            return StringColumn(offs, data, to, col.validity)
        raise ArrowNotImplementedError(f"cast fsb -> {to!r}")

    assert isinstance(col, PrimitiveColumn), type(col)
    if to.is_string:
        return _cast_to_string(col, to)
    return _cast_primitive(col, to, options)


def _all_null(to: dt.DataType, n: int) -> Column:
    """All-null column of any target type (cast/mod.rs:306 Null->T arms)."""
    if to.is_null:
        return NullColumn(n)
    mask = jnp.zeros((n,), jnp.bool_) if n else None
    if (to.is_string or to.is_binary) and to.name != "fixed_size_binary":
        return StringColumn(jnp.zeros((n + 1,), jnp.int32),
                            jnp.zeros((0,), jnp.uint8), to, mask)
    from ..core.nested import (DecimalColumn, FixedSizeListColumn,
                               IntervalMDNColumn, MapColumn,
                               FixedSizeBinaryColumn)
    from ..core.column import ListColumn, StructColumn, DictionaryColumn
    name = to.name
    if name in ("decimal128", "decimal256"):
        k = 2 if name == "decimal128" else 4
        return DecimalColumn(jnp.zeros((n, k), jnp.uint64), to, mask)
    if name == "interval" and to.unit == "month_day_nano":
        z32 = jnp.zeros((n,), jnp.int32)
        return IntervalMDNColumn(z32, z32, jnp.zeros((n,), jnp.int64), mask)
    if name in ("list", "large_list"):
        return ListColumn(jnp.zeros((n + 1,), jnp.int64 if
                                    name == "large_list" else jnp.int32),
                          _all_null(to.value_type, 0), mask,
                          large=name == "large_list")
    if name in ("list_view", "large_list_view"):
        off_dt = jnp.int64 if name == "large_list_view" else jnp.int32
        from ..core.nested import ListViewColumn
        return ListViewColumn(jnp.zeros((n,), off_dt),
                              jnp.zeros((n,), off_dt),
                              _all_null(to.value_type, 0), mask, dtype=to)
    if name == "union":
        # unions carry no top-level validity (Arrow spec): an "all null"
        # union is rows of the first child with that child all-null
        from ..core.nested import UnionColumn
        ids = to.type_ids
        tid = jnp.full((n,), ids[0], jnp.int8)
        if to.mode == "sparse":
            kids = [_all_null(f.dtype, n) for f in to.fields]
            return UnionColumn(tid, None, kids, to.fields, ids)
        kids = [_all_null(f.dtype, n if i == 0 else 0)
                for i, f in enumerate(to.fields)]
        return UnionColumn(tid, jnp.arange(n, dtype=jnp.int32),
                           kids, to.fields, ids)
    if name == "run_end_encoded":
        from ..core.nested import RunEndColumn
        re_dt = to.index_type.to_jax()
        if n == 0:
            return RunEndColumn(jnp.zeros((0,), re_dt),
                                _all_null(to.value_type, 0), 0)
        return RunEndColumn(jnp.full((1,), n, re_dt),
                            _all_null(to.value_type, 1), n)
    if name == "fixed_size_list":
        return FixedSizeListColumn(_all_null(to.value_type,
                                             n * to.list_size),
                                   to.list_size, mask)
    if name == "fixed_size_binary":
        # fsb rides its width in list_size (dtypes.py fixed_size_binary)
        return FixedSizeBinaryColumn(
            jnp.zeros((n, to.list_size), jnp.uint8), mask)
    if name == "struct":
        return StructColumn(tuple(_all_null(f.dtype, n) for f in to.fields),
                            tuple(to.fields), mask)
    if name == "map":
        kv = _all_null(to.value_type, 0)       # the {key, value} struct
        entries = StructColumn(kv.children, kv.fields, None)
        return MapColumn(jnp.zeros((n + 1,), jnp.int32), entries, mask)
    if to.is_dictionary:
        return DictionaryColumn(
            jnp.zeros((n,), to.index_type.to_jax()),
            _all_null(to.value_type, 1), mask)
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
            ratio = fs // ts
            # checked_mul (cast/mod.rs:1542 unary_opt): overflow is
            # null (safe) / error (unsafe), never a wrapped value
            hi, lo = (2 ** 63 - 1) // ratio, (-2 ** 63) // ratio
            failed = (x > hi) | (x < lo) if ratio > 1 \
                else jnp.zeros(v.shape, jnp.bool_)
            out = jnp.where(failed, 0, x) * ratio
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
            failed = jnp.zeros(v.shape, jnp.bool_)
            if lo > -2 ** 63:
                failed = failed | (x < lo)
            if hi < 2 ** 63 - 1:
                # u64's hi (2^64-1) exceeds every signed value: skip —
                # comparing against it would overflow the i64 literal
                failed = failed | (x > hi)
        safe_x = jnp.where(failed, 0, x)
        return _apply_failures(safe_x.astype(to.to_jax()), failed,
                               col.validity, to, options)

    raise ArrowNotImplementedError(f"cast {from_dt!r} -> {to!r}")


# ---- interval casts (cast/mod.rs:283-298, 365-500) ----------------------------

def _cast_interval(col: Column, to: dt.DataType,
                   options: CastOptions) -> Column:
    """The reference's narrow interval matrix: unit widening to
    month_day_nano (mod.rs:365-392), duration <-> month_day_nano
    (mod.rs:395-500, zero months/days required going out), int64/int32
    reinterprets, and utf8 parse (parse.rs parse_interval)."""
    from ..core.nested import IntervalMDNColumn
    f = col.dtype
    if not can_cast(f, to):
        raise ArrowNotImplementedError(f"cast {f!r} -> {to!r}")

    if isinstance(col, StringColumn):
        return _parse_interval_strings(col, to, options)

    if to.is_string:
        return _interval_to_string(col, to)

    if isinstance(col, IntervalMDNColumn):
        if to.name == "interval":            # mdn -> mdn handled by cast()
            return col
        # mdn -> duration: only zero months/days convert; division
        # truncates toward zero (Rust / semantics, mod.rs:408)
        scale = _UNIT_NS[to.unit]
        n = col.nanos
        bad = (col.months != 0) | (col.days != 0)
        q = jnp.where(n < 0, -((-n) // scale), n // scale)
        return _apply_failures(jnp.where(bad, 0, q), bad,
                               col.validity, to, options)

    assert isinstance(col, PrimitiveColumn), type(col)
    v = col.values
    if f.name == "duration":                 # -> interval[mdn]
        scale = _UNIT_NS[f.unit]
        x = v.astype(jnp.int64)
        hi, lo = (2 ** 63 - 1) // scale, -((2 ** 63) // scale)
        bad = (x > hi) | (x < lo)            # checked_mul (mod.rs:460)
        ns = jnp.where(bad, 0, x) * scale
        validity = col.validity
        if options.safe:
            validity = vd.union(validity, jnp.logical_not(bad))
        else:
            eff = bad if validity is None else jnp.logical_and(bad, validity)
            if bool(jnp.any(eff)):
                raise CastError("duration -> interval[mdn] overflow")
        z = jnp.zeros(v.shape, jnp.int32)
        return IntervalMDNColumn(z, z, ns, validity)

    if f.name == "interval":
        if to == dt.int64:                   # reinterpret storage
            return PrimitiveColumn(v.astype(jnp.int64), to, col.validity,
                                   _canonical=True)
        if f.unit == "year_month":           # months, 0 days, 0 ns
            z = jnp.zeros(v.shape, jnp.int32)
            return IntervalMDNColumn(v.astype(jnp.int32), z,
                                     jnp.zeros(v.shape, jnp.int64),
                                     col.validity)
        # day_time (days<<32 | millis) -> days, ms * 1e6 nanoseconds
        x = v.astype(jnp.int64)
        days = (x >> 32).astype(jnp.int32)
        ms = x.astype(jnp.int32)             # truncating convert = low word
        return IntervalMDNColumn(jnp.zeros(v.shape, jnp.int32), days,
                                 ms.astype(jnp.int64) * 1_000_000,
                                 col.validity)

    assert f == dt.int32 and to.unit == "year_month"
    return PrimitiveColumn(v, to, col.validity, _canonical=True)


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (Rust / semantics)."""
    q = abs(a) // b
    return -q if a < 0 else q


def _fmt_clock(parts: list, total: int, unit_per_sec: int, digits: int):
    """Shared hours/mins/secs tail (display.rs Milliseconds/Nanoseconds
    formatters): skip zero groups, '{sign}{secs}.{frac:0N} secs'."""
    secs = _tdiv(total, unit_per_sec)
    mins = _tdiv(secs, 60)
    hours = _tdiv(mins, 60)
    secs -= mins * 60
    mins -= hours * 60
    frac = total - _tdiv(total, unit_per_sec) * unit_per_sec
    if hours:
        parts.append(f"{hours} hours")
    if mins:
        parts.append(f"{mins} mins")
    if secs or frac:
        sign = "-" if (secs < 0 or frac < 0) else ""
        parts.append(f"{sign}{abs(secs)}.{abs(frac):0{digits}d} secs")


def _interval_to_string(col: Column, to: dt.DataType) -> StringColumn:
    """display.rs:699-846 interval formatting."""
    from ..core.nested import IntervalMDNColumn
    unit = col.dtype.unit
    n = len(col)
    mask = np.asarray(col.is_valid_mask())
    out = []
    if isinstance(col, IntervalMDNColumn):
        months = np.asarray(col.months)
        days = np.asarray(col.days)
        nanos = np.asarray(col.nanos)
        for i in range(n):
            if not mask[i]:
                out.append(None)
                continue
            parts = []
            if months[i]:
                parts.append(f"{months[i]} mons")
            if days[i]:
                parts.append(f"{days[i]} days")
            if nanos[i]:
                _fmt_clock(parts, int(nanos[i]), 1_000_000_000, 9)
            out.append(" ".join(parts))
    elif unit == "year_month":
        v = np.asarray(col.values)
        for i in range(n):
            if not mask[i]:
                out.append(None)
                continue
            years = int(v[i]) // 12          # f64 floor in the reference
            out.append(f"{years} years {int(v[i]) - years * 12} mons")
    else:                                     # day_time: days<<32 | millis
        x = np.asarray(col.values).astype(np.int64)
        days = (x >> 32).astype(np.int32)
        ms = x.astype(np.int32)
        for i in range(n):
            if not mask[i]:
                out.append(None)
                continue
            parts = []
            if days[i]:
                parts.append(f"{days[i]} days")
            if ms[i]:
                _fmt_clock(parts, int(ms[i]), 1_000, 3)
            out.append(" ".join(parts))
    return StringColumn.from_pylist(out, to)


_INTERVAL_UNIT_FACTORS = {
    "year": ("months", 12), "years": ("months", 12),
    "mon": ("months", 1), "mons": ("months", 1),
    "month": ("months", 1), "months": ("months", 1),
    "week": ("days", 7), "weeks": ("days", 7),
    "day": ("days", 1), "days": ("days", 1),
    "hour": ("nanos", 3_600_000_000_000), "hours": ("nanos", 3_600_000_000_000),
    "minute": ("nanos", 60_000_000_000), "minutes": ("nanos", 60_000_000_000),
    "second": ("nanos", 1_000_000_000), "seconds": ("nanos", 1_000_000_000),
    "millisecond": ("nanos", 1_000_000), "milliseconds": ("nanos", 1_000_000),
    "microsecond": ("nanos", 1_000), "microseconds": ("nanos", 1_000),
    "nanosecond": ("nanos", 1), "nanoseconds": ("nanos", 1),
}


def _parse_one_interval(s: str):
    """Postgres-flavoured interval text -> (months, days, nanos) or None.
    Subset of parse.rs parse_interval: '<n> <unit>' pairs plus an
    optional trailing [-]HH:MM:SS[.fff] clock."""
    parts = s.strip().split()
    if not parts:
        return None
    months = days = nanos = 0
    i = 0
    while i < len(parts):
        tok = parts[i]
        if ":" in tok:                       # clock tail
            if i != len(parts) - 1:
                return None
            neg = tok.startswith("-")
            hms = tok.lstrip("+-").split(":")
            if len(hms) not in (2, 3):
                return None
            try:
                h = int(hms[0]); m = int(hms[1])
                sec = float(hms[2]) if len(hms) == 3 else 0.0
            except ValueError:
                return None
            t = h * 3_600_000_000_000 + m * 60_000_000_000 \
                + round(sec * 1e9)
            nanos += -t if neg else t
            i += 1
            continue
        if i + 1 >= len(parts):
            return None
        unit = parts[i + 1].lower().rstrip(",")
        if unit not in _INTERVAL_UNIT_FACTORS:
            return None
        field, mult = _INTERVAL_UNIT_FACTORS[unit]
        try:
            qty = float(tok) if "." in tok else int(tok)
        except ValueError:
            return None
        amt = qty * mult
        if field == "months":
            whole = int(amt)
            months += whole
            days += round((amt - whole) * 30)  # fractional month -> days
        elif field == "days":
            whole = int(amt)
            days += whole
            nanos += round((amt - whole) * 86_400_000_000_000)
        else:
            nanos += round(amt)
        i += 2
    return months, days, nanos


def _parse_interval_strings(col: StringColumn, to: dt.DataType,
                            options: CastOptions) -> Column:
    from ..core.nested import IntervalMDNColumn
    vals = col.to_pylist_host()
    n = len(vals)
    months = np.zeros(n, np.int32)
    days = np.zeros(n, np.int32)
    nanos = np.zeros(n, np.int64)
    ok = np.zeros(n, bool)
    for i, s in enumerate(vals):
        if s is None:
            continue
        r = _parse_one_interval(s)
        if r is None:
            if not options.safe:
                raise CastError(f"cannot parse interval {s!r}")
            continue
        ok[i] = True
        months[i], days[i], nanos[i] = r
    validity = vd.union(col.validity, jnp.asarray(ok))
    if to.unit == "month_day_nano":
        return IntervalMDNColumn(jnp.asarray(months), jnp.asarray(days),
                                 jnp.asarray(nanos), validity)
    if to.unit == "year_month":
        bad = ok & ((days != 0) | (nanos != 0))
        return _apply_failures(jnp.asarray(months), jnp.asarray(bad),
                               validity, to, options)
    # day_time: days<<32 | millis
    bad = ok & ((months != 0) | (nanos % 1_000_000 != 0))
    ms = (nanos // 1_000_000).astype(np.int64)
    bad |= ok & ((ms > 2 ** 31 - 1) | (ms < -2 ** 31))
    packed = (days.astype(np.int64) << 32) | (ms & 0xFFFFFFFF)
    return _apply_failures(jnp.asarray(packed), jnp.asarray(bad),
                           validity, to, options)


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
    if d.name == "date64":
        ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            milliseconds=v)
        return ts.isoformat(sep="T")
    if d.name in ("time32", "time64"):
        ns = v * _UNIT_NS[d.unit]
        secs, frac_ns = divmod(ns, 1_000_000_000)
        hh, rem = divmod(secs, 3600)
        mm, ss = divmod(rem, 60)
        digits = {"s": 0, "ms": 3, "us": 6, "ns": 9}[d.unit]
        base = f"{hh:02d}:{mm:02d}:{ss:02d}"
        if digits:
            base += "." + f"{frac_ns:09d}"[:digits]
        return base
    if d.name == "timestamp":
        ns = v * _UNIT_NS[d.unit]
        ts = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=ns // 1000)
        return ts.isoformat(sep="T")
    return str(v)


def _cast_from_string(col: StringColumn, to: dt.DataType,
                      options: CastOptions) -> Column:
    if to.name == "fixed_size_binary":
        # (Binary, FixedSizeBinary) arm (cast/mod.rs:2268): values whose
        # length != byte_width become null (safe) or raise (unsafe)
        from ..core.nested import FixedSizeBinaryColumn
        w = to.list_size
        offs = np.asarray(col.offsets).astype(np.int64)
        lens = np.diff(offs)
        valid = None if col.validity is None else np.asarray(col.validity)
        ok = lens == w
        bad = ~ok if valid is None else (~ok & valid)
        if bad.any() and not options.safe:
            raise CastError(f"value length != fixed-size width {w}")
        data = np.asarray(col.data)
        rows = np.zeros((len(col), w), np.uint8)
        idx = offs[:-1][:, None] + np.arange(w)[None, :]
        sel = np.where(ok[:, None], idx, 0)
        if len(data):
            rows = data[np.minimum(sel, len(data) - 1)]
            rows = np.where(ok[:, None], rows, 0).astype(np.uint8)
        validity = jnp.asarray(ok if valid is None else (valid & ok))
        return FixedSizeBinaryColumn(jnp.asarray(rows), validity)
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
            # normalize offset-bearing strings to UTC
            # (string_to_timestamp_nanos, arrow-cast/src/parse.rs)
            x = x.astimezone(datetime.timezone.utc) \
                 .replace(tzinfo=None)
        delta = x - datetime.datetime(1970, 1, 1)
        us = delta // datetime.timedelta(microseconds=1)
        return us * 1000 // _UNIT_NS[to.unit] if to.unit == "ns" \
            else us // (_UNIT_NS[to.unit] // 1000)
    if to.name == "date64":
        import datetime
        try:
            d_ = datetime.date.fromisoformat(s)
            return (d_ - datetime.date(1970, 1, 1)).days * 86_400_000
        except ValueError:
            x = datetime.datetime.fromisoformat(s.replace("Z", "+00:00"))
            if x.tzinfo is not None:
                x = x.astimezone(datetime.timezone.utc) \
                     .replace(tzinfo=None)
            return (x - datetime.datetime(1970, 1, 1)) \
                // datetime.timedelta(milliseconds=1)
    if to.name in ("time32", "time64"):
        # 'HH:MM[:SS[.f]]' (string_to_time_nanoseconds, parse.rs:299)
        import datetime
        x = datetime.time.fromisoformat(s)
        ns = ((x.hour * 60 + x.minute) * 60 + x.second) \
            * 1_000_000_000 + x.microsecond * 1_000
        return ns // _UNIT_NS[to.unit]
    raise ArrowNotImplementedError(f"parse to {to!r}")


# ---- decimal casts (cast/decimal.rs) -------------------------------------------

def _dec_ints(col) -> list:
    """Unscaled integers (python ints, exact at any width) + validity."""
    from ..core.nested import DecimalColumn
    if isinstance(col, DecimalColumn):
        vals = col.to_pyints()
        return [0 if v is None else v for v in vals]
    return [int(x) for x in np.asarray(col.values)]


def _dec_build(ints, to: dt.DataType, validity) -> Column:
    from ..core.nested import DecimalColumn
    if to.name in ("decimal32", "decimal64"):
        phys = np.int32 if to.name == "decimal32" else np.int64
        return PrimitiveColumn(jnp.asarray(np.asarray(ints, phys)), to,
                               validity)
    return DecimalColumn.from_pyints(ints, to, validity)


def _round_half_away(num: int, den: int) -> int:
    """num/den rounded half away from zero (arrow-rs decimal rescale)."""
    q, r = divmod(abs(num), den)
    if 2 * r >= den:
        q += 1
    return q if num >= 0 else -q


def _cast_decimal(col: Column, to: dt.DataType,
                  options: CastOptions) -> Column:
    """decimal <-> decimal/int/float/string (host-exact python ints;
    device paths for wide decimals arrive with limb arithmetic)."""
    from_dt = col.dtype
    n = len(col)
    valid = None if col.validity is None else np.asarray(col.validity)

    def finish(ints, failed):
        validity = valid
        if any(failed):
            if not options.safe:
                raise CastError("decimal cast overflow")
            bad = np.asarray(failed)
            validity = (~bad) if validity is None else (validity & ~bad)
        v = None if validity is None else jnp.asarray(validity)
        return ints, v

    if from_dt.is_decimal and to.is_decimal:
        ints = _dec_ints(col)
        ds = to.scale - from_dt.scale
        limit = 10 ** to.precision
        out, failed = [], []
        for x in ints:
            y = x * 10 ** ds if ds >= 0 else _round_half_away(x, 10 ** -ds)
            failed.append(abs(y) >= limit)
            out.append(0 if abs(y) >= limit else y)
        out, v = finish(out, failed)
        return _dec_build(out, to, v)

    if from_dt.is_decimal:
        ints = _dec_ints(col)
        scale = 10 ** from_dt.scale
        if to.is_integer:
            lo, hi = dt.integer_bounds(to)
            out, failed = [], []
            for x in ints:
                y = int(x / scale) if x >= 0 else -int(-x // scale) \
                    if (-x) % scale == 0 else -((-x) // scale)
                # truncate toward zero
                y = abs(x) // scale
                y = y if x >= 0 else -y
                bad = not (lo <= y <= hi)
                failed.append(bad)
                out.append(0 if bad else y)
            out, v = finish(out, failed)
            return PrimitiveColumn(jnp.asarray(np.asarray(out, to.to_jax())),
                                   to, v)
        if to.is_floating:
            out = np.asarray([x / scale for x in ints], np.float64)
            v = None if valid is None else jnp.asarray(valid)
            return PrimitiveColumn(jnp.asarray(out.astype(to.to_jax())),
                                   to, v)
        if to.is_string:
            s = from_dt.scale
            strs = []
            for i, x in enumerate(ints):
                if valid is not None and not valid[i]:
                    strs.append("")
                    continue
                if s == 0:
                    strs.append(str(x))
                else:
                    sign = "-" if x < 0 else ""
                    ax = abs(x)
                    strs.append(f"{sign}{ax // 10**s}."
                                f"{str(ax % 10**s).zfill(s)}")
            sc = StringColumn.from_pylist(strs, to)
            return sc.with_validity(None if valid is None
                                    else jnp.asarray(valid))
        raise ArrowNotImplementedError(f"cast {from_dt!r} -> {to!r}")

    # -> decimal
    limit = 10 ** to.precision
    if from_dt.is_integer or from_dt.is_boolean:
        src = [int(x) for x in np.asarray(col.values)]
        out, failed = [], []
        for x in src:
            y = x * 10 ** to.scale
            bad = abs(y) >= limit
            failed.append(bad)
            out.append(0 if bad else y)
        out, v = finish(out, failed)
        return _dec_build(out, to, v)
    if from_dt.is_floating:
        src = np.asarray(col.values, np.float64)
        out, failed = [], []
        for x in src:
            if not np.isfinite(x):
                failed.append(True)
                out.append(0)
                continue
            y = int(np.round(x * 10.0 ** to.scale))
            bad = abs(y) >= limit
            failed.append(bad)
            out.append(0 if bad else y)
        out, v = finish(out, failed)
        return _dec_build(out, to, v)
    if from_dt.is_string:
        texts = col.to_pylist()
        out, failed = [], []
        for t in texts:
            if t is None:
                out.append(0)
                failed.append(False)
                continue
            try:
                from decimal import Decimal
                y = int((Decimal(t) * 10 ** to.scale)
                        .to_integral_value(rounding="ROUND_HALF_UP"))
                bad = abs(y) >= limit
            except Exception:
                y, bad = 0, True
            failed.append(bad)
            out.append(0 if bad else y)
        out, v = finish(out, failed)
        return _dec_build(out, to, v)
    raise ArrowNotImplementedError(f"cast {from_dt!r} -> {to!r}")


# ---- list casts (cast/list.rs) --------------------------------------------------

def _cast_list(col: Column, to: dt.DataType,
               options: CastOptions) -> Column:
    from ..core.column import ListColumn
    from ..core.nested import FixedSizeListColumn, ListViewColumn
    from_dt = col.dtype

    if isinstance(col, ListViewColumn):
        # view -> offset layout: materialize the child in view order
        # (cast/list.rs list_view casts); view -> view just retags
        if to.name in ("list_view", "large_list_view"):
            child = cast(col.child, to.value_type, options) \
                if col.child.dtype != to.value_type else col.child
            off_t = jnp.int64 if to.name == "large_list_view" else jnp.int32
            return ListViewColumn(col.offsets.astype(off_t),
                                  col.sizes.astype(off_t), child,
                                  col.validity, to)
        offs = np.asarray(col.offsets).astype(np.int64)
        lens = np.asarray(col.sizes).astype(np.int64)
        new_offs = np.zeros(len(col) + 1, np.int64)
        np.cumsum(lens, out=new_offs[1:])
        total = int(new_offs[-1])
        src = np.repeat(offs - new_offs[:-1], lens) \
            + np.arange(total, dtype=np.int64)
        from .take import take as take_kernel
        child = take_kernel(col.child, PrimitiveColumn(
            jnp.asarray(src), dt.int64))
        as_list = ListColumn(jnp.asarray(new_offs.astype(np.int32)),
                             child, col.validity)
        return cast(as_list, to, options) if to != as_list.dtype else \
            as_list

    if to.name in ("list_view", "large_list_view"):
        # offset layout -> view: zero-copy offsets[:-1] + diffs
        if isinstance(col, FixedSizeListColumn):
            col = _cast_list(col, dt.list_(col.child.dtype), options)
        assert isinstance(col, ListColumn), type(col)
        child = cast(col.child, to.value_type, options) \
            if col.child.dtype != to.value_type else col.child
        off_t = jnp.int64 if to.name == "large_list_view" else jnp.int32
        return ListViewColumn(col.offsets[:-1].astype(off_t),
                              jnp.diff(col.offsets).astype(off_t),
                              child, col.validity, to)

    if isinstance(col, ListColumn) and to.name in ("list", "large_list"):
        child = cast(col.child, to.value_type, options) \
            if col.child.dtype != to.value_type else col.child
        offs = col.offsets.astype(jnp.int64) \
            if to.name == "large_list" else col.offsets
        return ListColumn(offs, child, col.validity,
                          large=to.name == "large_list")

    if isinstance(col, ListColumn) and to.name == "fixed_size_list":
        k = to.list_size
        offs = np.asarray(col.offsets)
        lens = np.diff(offs)
        valid = None if col.validity is None else np.asarray(col.validity)
        ok = lens == k
        if valid is not None:
            ok = ok | ~valid
        if not ok.all():
            if not options.safe:
                raise CastError(f"list lengths != {k}")
            valid = ok if valid is None else (valid & ok)
        # gather each row's k slots (null rows -> zeros)
        idx = offs[:-1][:, None] + np.arange(k)[None, :]
        idx = np.where((lens == k)[:, None], idx, 0)
        from .take import take as take_kernel
        child = take_kernel(col.child, PrimitiveColumn(
            jnp.asarray(idx.reshape(-1).astype(np.int64)), dt.int64))
        if to.value_type != child.dtype:
            child = cast(child, to.value_type, options)
        return FixedSizeListColumn(
            child, k, None if valid is None else jnp.asarray(valid))

    if isinstance(col, FixedSizeListColumn) and \
            to.name in ("list", "large_list"):
        k = col.list_size
        n = len(col)
        off_np = np.int64 if to.name == "large_list" else np.int32
        offs = (np.arange(n + 1) * k).astype(off_np)
        child = col.child
        if to.value_type != child.dtype:
            child = cast(child, to.value_type, options)
        return ListColumn(jnp.asarray(offs), child, col.validity,
                          large=to.name == "large_list")

    if isinstance(col, FixedSizeListColumn) and \
            to.name == "fixed_size_list" and to.list_size == col.list_size:
        child = cast(col.child, to.value_type, options)
        return FixedSizeListColumn(child, col.list_size, col.validity)

    raise ArrowNotImplementedError(f"cast {from_dt!r} -> {to!r}")


# ---- map casts (cast/map.rs) ----------------------------------------------------

def _cast_map(col: Column, to: dt.DataType,
              options: CastOptions) -> Column:
    from ..core.column import ListColumn, StructColumn
    from ..core.nested import MapColumn
    from_dt = col.dtype

    def cast_entries(entries: StructColumn, kv: dt.DataType
                     ) -> StructColumn:
        kf, vf = kv.fields
        keys = entries.children[0]
        items = entries.children[1]
        if keys.dtype != kf.dtype:
            keys = cast(keys, kf.dtype, options)
        if items.dtype != vf.dtype:
            items = cast(items, vf.dtype, options)
        return StructColumn((keys, items), kv.fields, entries.validity)

    if isinstance(col, MapColumn) and to.name == "map":
        return MapColumn(col.offsets, cast_entries(col.entries,
                                                   to.value_type),
                         col.validity)

    if isinstance(col, MapColumn) and to.name in ("list", "large_list"):
        if to.value_type.name != "struct":
            raise ArrowNotImplementedError(f"cast {from_dt!r} -> {to!r}")
        entries = cast_entries(col.entries, dt.struct(
            to.value_type.fields))
        return ListColumn(col.offsets, entries, col.validity,
                          large=to.name == "large_list")

    if isinstance(col, ListColumn) and to.name == "map":
        child = col.child
        if not isinstance(child, StructColumn) or len(child.fields) != 2:
            raise ArrowNotImplementedError(
                "map cast needs list<struct<2 fields>>")
        return MapColumn(col.offsets, cast_entries(child, to.value_type),
                         col.validity)

    raise ArrowNotImplementedError(f"cast {from_dt!r} -> {to!r}")


def _cast_struct(col, to: dt.DataType, options: CastOptions):
    """Struct -> Struct: children cast positionally, renamed to the
    target's field names (cast/mod.rs (Struct, Struct) arm)."""
    from ..core.column import StructColumn
    if len(col.fields) != len(to.fields):
        raise ArrowInvalid(
            f"struct cast arity mismatch: {len(col.fields)} vs "
            f"{len(to.fields)}")
    children = tuple(cast(c, f.dtype, options)
                     for c, f in zip(col.children, to.fields))
    return StructColumn(children, tuple(to.fields), col.validity)


def base64_encode(col) -> StringColumn:
    """Binary -> Utf8 standard base64 (arrow-cast/src/base64.rs
    b64_encode, STANDARD alphabet)."""
    import base64 as _b64
    import numpy as np
    if not isinstance(col, StringColumn):
        raise ArrowTypeError(f"base64_encode of {type(col).__name__}")
    offs = np.asarray(col.offsets).astype(np.int64)
    data = np.asarray(col.data).tobytes()
    parts = [_b64.b64encode(data[offs[i]:offs[i + 1]])
             for i in range(len(col))]
    lens = np.fromiter((len(p) for p in parts), np.int64, len(parts))
    out_offs = np.zeros(len(col) + 1, np.int64)
    np.cumsum(lens, out=out_offs[1:])
    out = b"".join(parts)
    import jax.numpy as jnp
    return StringColumn(jnp.asarray(out_offs.astype(np.int32)),
                        jnp.asarray(np.frombuffer(out, np.uint8).copy()),
                        dt.utf8, col.validity)


def base64_decode(col) -> StringColumn:
    """Utf8 -> Binary standard base64 decode (base64.rs b64_decode);
    malformed input raises (CastOptions.safe does not apply, matching
    the reference's explicit-error behavior)."""
    import base64 as _b64
    import numpy as np
    if not isinstance(col, StringColumn):
        raise ArrowTypeError(f"base64_decode of {type(col).__name__}")
    offs = np.asarray(col.offsets).astype(np.int64)
    data = np.asarray(col.data).tobytes()
    parts = [_b64.b64decode(data[offs[i]:offs[i + 1]], validate=True)
             for i in range(len(col))]
    lens = np.fromiter((len(p) for p in parts), np.int64, len(parts))
    out_offs = np.zeros(len(col) + 1, np.int64)
    np.cumsum(lens, out=out_offs[1:])
    out = b"".join(parts)
    import jax.numpy as jnp
    return StringColumn(jnp.asarray(out_offs.astype(np.int32)),
                        jnp.asarray(np.frombuffer(out, np.uint8).copy()),
                        dt.binary, col.validity)
