"""Temporal kernels: date_part extraction (arrow-arith/src/temporal.rs:44,146).

The reference leans on chrono per element; here extraction is branch-free
civil-calendar arithmetic on the VPU (Howard Hinnant's days-from-civil
inverse algorithm, the standard O(1) date decomposition), so year/month/day
run at elementwise bandwidth on device — no host round trip.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import dtypes as dt
from ..core.column import PrimitiveColumn
from ..errors import ArrowTypeError

__all__ = ["date_part", "year", "month", "day", "hour", "minute", "second",
           "millisecond", "microsecond", "nanosecond", "day_of_week",
           "day_of_year", "quarter", "add_interval", "sub_interval"]

_UNIT_NS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


def _epoch_days_and_time_ns(col: PrimitiveColumn):
    """(days since epoch, intra-day nanoseconds) — floor semantics for
    pre-epoch instants."""
    d = col.dtype
    v = col.values.astype(jnp.int64)
    if d.name == "date32":
        return v, jnp.zeros_like(v)
    if d.name == "date64":
        ms = v
        days = jnp.floor_divide(ms, 86_400_000)
        rem = ms - days * 86_400_000
        return days, rem * 1_000_000
    if d.name == "timestamp":
        scale = _UNIT_NS[d.unit]
        day_units = 86_400 * (1_000_000_000 // scale)
        days = jnp.floor_divide(v, day_units)
        rem = v - days * day_units
        return days, rem * scale
    if d.name in ("time32", "time64"):
        scale = _UNIT_NS[d.unit]
        return jnp.zeros_like(v), v * scale
    raise ArrowTypeError(f"date_part of {d!r}")


def _civil_from_days(z: jnp.ndarray):
    """days-since-epoch -> (year, month, day), proleptic Gregorian."""
    z = z + 719_468
    era = jnp.floor_divide(z, 146_097)
    doe = z - era * 146_097                                   # [0, 146096]
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)           # [0, 365]
    mp = (5 * doy + 2) // 153                                 # [0, 11]
    day = doy - (153 * mp + 2) // 5 + 1                       # [1, 31]
    month = jnp.where(mp < 10, mp + 3, mp - 9)                # [1, 12]
    year = jnp.where(month <= 2, y + 1, y)
    return year, month, day


def date_part(col: PrimitiveColumn, part: str) -> PrimitiveColumn:
    days, t_ns = _epoch_days_and_time_ns(col)
    if part in ("year", "month", "day", "quarter", "doy"):
        yy, mm, dd = _civil_from_days(days)
        out = {"year": yy, "month": mm, "day": dd,
               "quarter": (mm - 1) // 3 + 1,
               "doy": None}[part]
        if part == "doy":
            jan1 = _days_from_civil(yy, jnp.ones_like(mm), jnp.ones_like(dd))
            out = days - jan1 + 1
    elif part == "dow":
        # arrow DatePart::DayOfWeekMonday0: Monday=0..Sunday=6
        out = jnp.mod(days + 3, 7)
    elif part == "hour":
        out = t_ns // (3_600 * 1_000_000_000)
    elif part == "minute":
        out = (t_ns // (60 * 1_000_000_000)) % 60
    elif part == "second":
        out = (t_ns // 1_000_000_000) % 60
    elif part == "millisecond":
        out = (t_ns // 1_000_000) % 1_000
    elif part == "microsecond":
        out = (t_ns // 1_000) % 1_000_000
    elif part == "nanosecond":
        out = t_ns % 1_000_000_000
    else:
        raise ArrowTypeError(f"unknown date part {part}")
    return PrimitiveColumn(out.astype(jnp.int32), dt.int32, col.validity,
                           _canonical=col.validity is None)


def _days_from_civil(y, m, d):
    y = jnp.where(m <= 2, y - 1, y)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = 365 * yoe + yoe // 4 - yoe // 100 + doy
    return era * 146_097 + doe - 719_468


def year(col):
    return date_part(col, "year")


def month(col):
    return date_part(col, "month")


def day(col):
    return date_part(col, "day")


def hour(col):
    return date_part(col, "hour")


def minute(col):
    return date_part(col, "minute")


def second(col):
    return date_part(col, "second")


def millisecond(col):
    return date_part(col, "millisecond")


def microsecond(col):
    return date_part(col, "microsecond")


def nanosecond(col):
    return date_part(col, "nanosecond")


def day_of_week(col):
    return date_part(col, "dow")


def day_of_year(col):
    return date_part(col, "doy")


def quarter(col):
    return date_part(col, "quarter")


# ---- interval arithmetic (arrow-arith numeric.rs interval cases) --------------

def _days_in_month(y, m):
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    base = jnp.asarray([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                       jnp.int64)
    d = base[m - 1]
    return jnp.where((m == 2) & leap, 29, d)


def _add_months_days_nanos(col: PrimitiveColumn, months, days, nanos,
                           negate: bool):
    """Calendar-aware shift of a timestamp/date column: months add with
    end-of-month clamping (chrono checked_add_months semantics, the rule
    arrow-rs interval arithmetic uses), then whole days, then
    nanoseconds."""
    if negate:
        months, days, nanos = -months, -days, -nanos
    d = col.dtype
    ep_days, time_ns = _epoch_days_and_time_ns(col)
    y, m, dd = _civil_from_days(ep_days)
    m2 = m - 1 + months.astype(jnp.int64)
    y2 = y + jnp.floor_divide(m2, 12)
    m2 = m2 - jnp.floor_divide(m2, 12) * 12 + 1
    dd2 = jnp.minimum(dd, _days_in_month(y2, m2))      # clamp
    out_days = _days_from_civil(y2, m2, dd2) + days.astype(jnp.int64)
    total_ns = time_ns + nanos.astype(jnp.int64)
    out_days = out_days + jnp.floor_divide(total_ns, 86_400_000_000_000)
    total_ns = total_ns - jnp.floor_divide(
        total_ns, 86_400_000_000_000) * 86_400_000_000_000

    if d.name == "date32":
        return PrimitiveColumn(out_days.astype(jnp.int32), d, col.validity,
                               _canonical=col.validity is None)
    if d.name == "date64":
        ms = out_days * 86_400_000 + total_ns // 1_000_000
        return PrimitiveColumn(ms, d, col.validity,
                               _canonical=col.validity is None)
    scale = _UNIT_NS[d.unit]
    v = out_days * (86_400 * (1_000_000_000 // scale)) + total_ns // scale
    return PrimitiveColumn(v, d, col.validity,
                           _canonical=col.validity is None)


def add_interval(col: PrimitiveColumn, interval, *, negate: bool = False
                 ) -> PrimitiveColumn:
    """timestamp/date32/date64 + Interval column (numeric.rs interval
    arithmetic: YearMonth / DayTime / MonthDayNano, calendar-aware with
    chrono-style end-of-month clamping)."""
    from ..core import validity as vd
    from ..core.nested import IntervalMDNColumn
    if col.dtype.name not in ("timestamp", "date32", "date64"):
        raise ArrowTypeError(f"add_interval over {col.dtype!r}")
    if isinstance(interval, IntervalMDNColumn):
        months, days, nanos = (interval.months.astype(jnp.int64),
                               interval.days.astype(jnp.int64),
                               interval.nanos)
        iv_valid = interval.validity
    elif isinstance(interval, PrimitiveColumn) and \
            interval.dtype.name == "interval":
        if interval.dtype.unit == "year_month":
            months = interval.values.astype(jnp.int64)
            days = jnp.zeros_like(months)
            nanos = jnp.zeros_like(months)
        else:                                     # day_time: days<<32|ms
            packed = interval.values.astype(jnp.int64)
            days = packed >> 32
            ms = packed - (days << 32)
            months = jnp.zeros_like(days)
            nanos = ms * 1_000_000
        iv_valid = interval.validity
    else:
        raise ArrowTypeError(f"not an interval: {type(interval)}")
    out = _add_months_days_nanos(col, months, days, nanos, negate)
    validity = vd.union(out.validity, iv_valid)
    return out if validity is out.validity else out.with_validity(validity)


def sub_interval(col: PrimitiveColumn, interval) -> PrimitiveColumn:
    return add_interval(col, interval, negate=True)
