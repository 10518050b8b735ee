"""date_part + bitwise kernel goldens vs pyarrow (arrow-arith temporal.rs /
bitwise.rs parity) and BatchCoalescer behavior."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as ops
from arrow_tpu.utils.bench_util import (create_primitive_array,
                                        create_timestamp_array)
from util import assert_column_equals_pa
from arrow_tpu.io.interop import column_from_pyarrow


TS = create_timestamp_array(500, 0.1, unit="us")
NEG = pa.array([-1, -86_400_000_001, 0, 86_400_000_000 * 400]) \
    .cast(pa.timestamp("us"))
DATES = pa.array([0, -1, 18993, -719162], pa.int32()).cast(pa.date32())


@pytest.mark.parametrize("arr", [TS, NEG, DATES],
                         ids=["ts", "ts-neg", "date32"])
@pytest.mark.parametrize("part,pa_fn", [
    ("year", pc.year), ("month", pc.month), ("day", pc.day),
    ("quarter", pc.quarter), ("doy", pc.day_of_year),
])
def test_date_parts_golden(arr, part, pa_fn):
    got = ops.date_part(at.column(arr), part)
    exp = pa_fn(arr)
    assert got.to_pylist() == exp.to_pylist()


def test_time_parts_golden():
    got_h = ops.hour(at.column(TS))
    assert got_h.to_pylist() == pc.hour(TS).to_pylist()
    assert ops.minute(at.column(TS)).to_pylist() == \
        pc.minute(TS).to_pylist()
    assert ops.second(at.column(TS)).to_pylist() == \
        pc.second(TS).to_pylist()
    # arrow-rs DatePart::Microsecond is microsecond OF SECOND
    # (temporal.rs:108: nanosecond()/1000); pyarrow reports the
    # sub-millisecond component, so compose the golden:
    exp_us = pc.add(pc.multiply(pc.millisecond(TS), 1000),
                    pc.microsecond(TS))
    assert ops.microsecond(at.column(TS)).to_pylist() == exp_us.to_pylist()
    assert ops.millisecond(at.column(TS)).to_pylist() == \
        pc.millisecond(TS).to_pylist()


def test_day_of_week():
    # 1970-01-01 was a Thursday: Monday0 -> 3
    arr = pa.array([0, 1, 2, 3, 4], pa.int32()).cast(pa.date32())
    got = ops.day_of_week(at.column(arr))
    assert got.to_pylist() == [3, 4, 5, 6, 0]
    assert got.to_pylist() == pc.day_of_week(arr).to_pylist()


def test_bitwise_golden():
    a = create_primitive_array(500, 0.1, np.int64, seed=1)
    b = create_primitive_array(500, 0.1, np.int64, seed=2)
    ca, cb = at.column(a), at.column(b)
    assert_column_equals_pa(ops.bitwise_and(ca, cb), pc.bit_wise_and(a, b))
    assert_column_equals_pa(ops.bitwise_or(ca, cb), pc.bit_wise_or(a, b))
    assert_column_equals_pa(ops.bitwise_xor(ca, cb), pc.bit_wise_xor(a, b))
    assert_column_equals_pa(ops.bitwise_not(ca), pc.bit_wise_not(a))


def test_shifts():
    a = at.column([1, 2, -8, None])
    s = at.column([3, 1, 1, 2])
    assert ops.bitwise_shift_left(a, s).to_pylist() == [8, 4, -16, None]
    assert ops.bitwise_shift_right(a, s).to_pylist() == [0, 1, -4, None]
    # wrapping shift amount (Rust wrapping_shl): 65 % 64 == 1
    w = ops.bitwise_shift_left(at.column([1, 1]), at.column([65, 64]))
    assert w.to_pylist() == [2, 1]


def test_coalescer():
    c = ops.BatchCoalescer(10)
    for i in range(7):
        c.push_batch(at.Table.from_pydict({"x": list(range(4))}))
    got = []
    while c.has_completed_batch():
        got.append(c.next_completed_batch())
    c.finish()
    while c.has_completed_batch():
        got.append(c.next_completed_batch())
    sizes = [t.num_rows for t in got]
    assert sizes == [10, 10, 8]
    all_rows = [v for t in got for v in t.column("x").to_pylist()]
    assert all_rows == list(range(4)) * 7


def test_coalescer_with_filter():
    c = ops.BatchCoalescer(5)
    t = at.Table.from_pydict({"x": list(range(10))})
    c.push_batch_with_filter(t, at.column([i % 2 == 0 for i in range(10)]))
    c.finish()
    out = c.next_completed_batch()
    assert out.column("x").to_pylist() == [0, 2, 4, 6, 8]


def test_add_interval_month_day_nano(rng):
    """Calendar month addition with end-of-month clamping (the chrono
    checked_add_months rule arrow-rs interval arithmetic follows)."""
    import datetime
    import pyarrow as pa
    import arrow_tpu as at
    from arrow_tpu.io.interop import column_from_pyarrow
    from arrow_tpu.ops.temporal import add_interval, sub_interval

    ts = [datetime.datetime(2024, 1, 31, 12, 30),
          datetime.datetime(2023, 12, 15, 0, 0),
          datetime.datetime(1969, 3, 31, 23, 59)]
    col = column_from_pyarrow(pa.array(ts, pa.timestamp("us")))
    mdn = pa.array([(1, 2, 3_600_000_000_000)] * 3,
                   pa.month_day_nano_interval())
    iv = column_from_pyarrow(mdn)

    out = add_interval(col, iv)
    got = out.to_pyarrow().to_pylist()
    # +1 month (clamped), +2 days, +1 hour
    assert got[0] == datetime.datetime(2024, 3, 2, 13, 30)   # Jan31->Feb29+2d
    assert got[1] == datetime.datetime(2024, 1, 17, 1, 0)
    assert got[2] == datetime.datetime(1969, 5, 3, 0, 59)

    back = sub_interval(out, iv)
    # not an exact inverse when clamping fired (row 0), exact otherwise
    assert back.to_pyarrow().to_pylist()[1] == ts[1]


def test_add_interval_year_month_and_day_time():
    import datetime
    import numpy as np
    import pyarrow as pa
    import jax.numpy as jnp
    import arrow_tpu as at
    from arrow_tpu import dtypes as dt
    from arrow_tpu.core.column import PrimitiveColumn
    from arrow_tpu.io.interop import column_from_pyarrow
    from arrow_tpu.ops.temporal import add_interval

    col = column_from_pyarrow(pa.array(
        [datetime.date(2020, 2, 29)], pa.date32()))
    ym = PrimitiveColumn(jnp.asarray(np.array([12], np.int32)),
                         dt.interval("year_month"))
    out = add_interval(col, ym)
    assert out.to_pyarrow().to_pylist() == [datetime.date(2021, 2, 28)]

    ts = column_from_pyarrow(pa.array(
        [datetime.datetime(2024, 6, 1)], pa.timestamp("ms")))
    packed = (np.int64(3) << 32) | np.int64(90_000_000)   # 3d + 25h
    dti = PrimitiveColumn(jnp.asarray(np.array([packed], np.int64)),
                          dt.interval("day_time"))
    out = add_interval(ts, dti)
    assert out.to_pyarrow().to_pylist() == \
        [datetime.datetime(2024, 6, 5, 1, 0)]


class TestTimezoneAware:
    """tz-aware date_part (arrow-array/src/timezone.rs role): exact vs
    pyarrow over DST transitions; ISO week/year (temporal.rs:44)."""

    # (module has no interop import at top level)


    def _secs(self):
        rng = np.random.default_rng(0)
        dst_edges = np.array([
            1710050399, 1710050400, 1710054000,   # US spring-forward 2024
            1730605199, 1730610000,               # US fall-back 2024
            0, 1234567890, -86400 * 365 * 10 + 12345,
        ], np.int64)
        # random instants stay post-1920: for the pre-tzdb LMT era
        # (e.g. Kathmandu +05:41:16) we follow the tz database / chrono-tz
        # (the reference's tz backend) while pyarrow ignores sub-minute
        # LMT offsets, so the oracle diverges there by design
        return np.concatenate(
            [dst_edges, rng.integers(-1_500_000_000, 2_000_000_000, 500)])

    @pytest.mark.parametrize("tz", ["America/New_York", "Asia/Kathmandu",
                                    "+05:45", "UTC"])
    def test_tz_parts_match_pyarrow(self, tz):
        secs = self._secs()
        arr = pa.array(secs * 1_000_000, pa.timestamp("us", tz=tz))
        col = column_from_pyarrow(arr)
        for part, fn in [("year", pc.year), ("month", pc.month),
                         ("day", pc.day), ("hour", pc.hour),
                         ("minute", pc.minute), ("second", pc.second),
                         ("doy", pc.day_of_year),
                         ("week_iso", pc.iso_week),
                         ("year_iso", pc.iso_year)]:
            ours = np.asarray(ops.date_part(col, part).values)
            ref = np.asarray(fn(arr))
            assert np.array_equal(ours, ref), (tz, part)

    def test_iso_week_naive_and_dates(self):
        days = np.arange(-3650, 3650, 7).astype(np.int32)
        arr = pa.array(days, pa.date32())
        col = column_from_pyarrow(arr)
        assert np.array_equal(np.asarray(ops.iso_week(col).values),
                              np.asarray(pc.iso_week(arr)))
        assert np.array_equal(np.asarray(ops.iso_year(col).values),
                              np.asarray(pc.iso_year(arr)))
        assert np.array_equal(np.asarray(ops.week(col).values),
                              np.asarray(pc.iso_week(arr)))


def test_interval_arith_tz_aware():
    """Interval arithmetic runs in the column's LOCAL civil time
    (numeric.rs:369-426 passes Tz into add_*): +1 day across the
    spring-forward keeps the local wall-clock; month adds clamp in
    local time."""
    import datetime
    import zoneinfo
    from arrow_tpu.ops import temporal as tp
    ny = "America/New_York"
    z = zoneinfo.ZoneInfo(ny)
    utc = datetime.timezone.utc

    def to_us(local):
        return int(local.replace(tzinfo=z).astimezone(utc)
                   .replace(tzinfo=None).timestamp() * 1e6)

    def back(us):
        return (datetime.datetime(1970, 1, 1, tzinfo=utc)
                + datetime.timedelta(microseconds=us)).astimezone(z) \
            .replace(tzinfo=None)

    col = at.column([to_us(datetime.datetime(2021, 3, 13, 23, 0))],
                    dtype=at.timestamp("us", ny))
    iv = at.column([(0, 1, 0)], dtype=at.interval("month_day_nano"))
    out = tp.add_interval(col, iv)
    assert back(int(np.asarray(out.values)[0])) == \
        datetime.datetime(2021, 3, 14, 23, 0)
    col2 = at.column([to_us(datetime.datetime(2021, 1, 31, 22, 0))],
                     dtype=at.timestamp("us", ny))
    iv2 = at.column([1], dtype=at.interval("year_month"))
    out2 = tp.add_interval(col2, iv2)
    assert back(int(np.asarray(out2.values)[0])) == \
        datetime.datetime(2021, 2, 28, 22, 0)


def test_day_time_negative_millis():
    """Low 32 bits of day_time are SIGNED millis (interval.rs);
    unsigned decode turned -500ms into +49.7 days."""
    from arrow_tpu.ops import temporal as tp
    col = at.column([1_000_000], dtype=at.timestamp("us"))
    packed = (1 << 32) | (0xFFFFFFFF & -500)     # days=1, ms=-500
    iv = at.column([packed], dtype=at.interval("day_time"))
    out = tp.add_interval(col, iv)
    assert int(np.asarray(out.values)[0]) == \
        1_000_000 + 86_400_000_000 - 500_000


def test_post_2037_tz_extraction():
    """TZif footer POSIX rule governs instants past the last stored
    transition (fat tzdata ends 2037) — summer/winter 2045 NY and a
    southern-hemisphere zone extract local hours correctly."""
    import datetime
    import zoneinfo
    from arrow_tpu.ops import temporal as tp
    utc = datetime.timezone.utc

    def us_at(zname, *args):
        z = zoneinfo.ZoneInfo(zname)
        local = datetime.datetime(*args, tzinfo=z)
        return int(local.astimezone(utc).replace(tzinfo=None)
                   .timestamp() * 1e6)

    c = at.column([us_at("America/New_York", 2045, 7, 1, 15, 30)],
                  dtype=at.timestamp("us", "America/New_York"))
    assert int(np.asarray(tp.hour(c).values)[0]) == 15
    c2 = at.column([us_at("America/New_York", 2045, 1, 1, 15, 30)],
                   dtype=at.timestamp("us", "America/New_York"))
    assert int(np.asarray(tp.hour(c2).values)[0]) == 15
    c3 = at.column([us_at("Australia/Sydney", 2044, 1, 15, 10, 0)],
                   dtype=at.timestamp("us", "Australia/Sydney"))
    assert int(np.asarray(tp.hour(c3).values)[0]) == 10


def test_date_part_duration():
    """Duration date_part (temporal.rs:527-650): truncating unit
    conversion, i32-overflow -> null."""
    from arrow_tpu.ops.temporal import date_part
    d = at.column(np.array([90061, -90061], np.int64),
                  dtype=at.duration("s"))          # 1d 1h 1m 1s
    assert date_part(d, "day").to_pylist() == [1, -1]
    assert date_part(d, "hour").to_pylist() == [25, -25]
    assert date_part(d, "minute").to_pylist() == [1501, -1501]
    assert date_part(d, "second").to_pylist() == [90061, -90061]
    assert date_part(d, "millisecond").to_pylist() == [90061000, -90061000]
    # 90061 * 1e6 > i32::MAX -> null (checked_mul + try_into)
    assert date_part(d, "microsecond").to_pylist() == [None, None]
    big = at.column(np.array([2**62], np.int64), dtype=at.duration("ns"))
    assert date_part(big, "second").to_pylist() == [None]  # > i32
    with pytest.raises(at.ArrowError):
        date_part(d, "year")


def test_date_part_intervals():
    """Interval date_part (temporal.rs:424-520)."""
    from arrow_tpu.ops.temporal import date_part
    ym = at.column(np.array([25, -25], np.int32),
                   dtype=at.interval("year_month"))
    assert date_part(ym, "year").to_pylist() == [2, -2]
    assert date_part(ym, "month").to_pylist() == [1, -1]
    with pytest.raises(at.ArrowError):
        date_part(ym, "day")
    packed = (16 << 32) | (0xFFFFFFFF & 3_601_001)
    dti = at.column(np.array([packed], np.int64),
                    dtype=at.interval("day_time"))
    assert date_part(dti, "week").to_pylist() == [2]
    assert date_part(dti, "day").to_pylist() == [16]
    assert date_part(dti, "hour").to_pylist() == [1]
    assert date_part(dti, "second").to_pylist() == [1]
    assert date_part(dti, "millisecond").to_pylist() == [1001]
    assert date_part(dti, "microsecond").to_pylist() == [1001000]
    # 1001 * 1e6 fits i32 -> real value (reference i32 checked_mul)
    assert date_part(dti, "nanosecond").to_pylist() == [1001000000]
    # ms%60000 = 50000 -> 5e10 overflows i32 -> null
    dt2 = at.column(np.array([50_000], np.int64),
                    dtype=at.interval("day_time"))
    assert date_part(dt2, "nanosecond").to_pylist() == [None]
    assert date_part(dt2, "microsecond").to_pylist() == [50_000_000]
    mdn = at.column([(25, 16, 3_601_001_000_000)],
                    dtype=at.interval("month_day_nano"))
    assert date_part(mdn, "year").to_pylist() == [2]
    assert date_part(mdn, "month").to_pylist() == [1]
    assert date_part(mdn, "week").to_pylist() == [2]
    assert date_part(mdn, "hour").to_pylist() == [1]
    assert date_part(mdn, "millisecond").to_pylist() == [1001]
    assert date_part(mdn, "nanosecond").to_pylist() == [1001000000]


def test_day_of_week_sunday0():
    """DatePart::DayOfWeekSunday0 (temporal.rs ChronoDateExt)."""
    from arrow_tpu.ops.temporal import date_part
    d = at.column(np.array([0, 3], np.int32), dtype=at.date32)
    assert date_part(d, "dow_sunday0").to_pylist() == [4, 0]
    got = date_part(d, "dow_sunday0").to_pylist()
    exp = pc.day_of_week(pa.array([0, 3], pa.date32()),
                         count_from_zero=True, week_start=7).to_pylist()
    assert got == exp
