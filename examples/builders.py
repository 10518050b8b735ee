"""Building columns value-by-value with the typed builders
(arrow/examples/builders.rs re-designed for arrow_tpu: builders
accumulate on host, finish() uploads one dense tensor + validity mask).
"""

from arrow_tpu import dtypes as dt
from arrow_tpu.core.builders import (ListBuilder, PrimitiveBuilder,
                                     StringBuilder,
                                     StringDictionaryBuilder)


def main():
    # primitive builder with nulls (append(None) == append_null())
    b = PrimitiveBuilder(dt.int32)
    for v in (1, 2, None, 4):
        b.append(v)
    ints = b.finish()
    print(ints.dtype, ints.to_pylist())

    # strings
    sb = StringBuilder()
    for v in ("alpha", None, "gamma"):
        sb.append(v)
    print(sb.finish().to_pylist())

    # dictionary builder interns repeated values
    db = StringDictionaryBuilder()
    for v in ("lo", "hi", "lo", "lo", "hi"):
        db.append(v)
    d = db.finish()
    print(d.dtype, "->", d.to_pylist())

    # list<int64> builder: fill the child, close each list
    lb = ListBuilder(PrimitiveBuilder(dt.int64))
    lb.append_value([1, 2, 3])
    lb.append_null()
    lb.append_value([])
    print(lb.finish().to_pylist())


if __name__ == "__main__":
    main()
