"""Creating columns straight from Python values
(arrow/examples/collect.rs: FromIterator — here, at.column infers or
takes an explicit dtype; None is a null)."""

import arrow_tpu as at
from arrow_tpu import dtypes as dt


def main():
    print(at.column([1, 2, 3, 4], dt.int8).to_pylist())
    print(at.column([1, 2, None, 3], dt.int8).to_pylist())
    print(at.column([1.0, 2.5, None], dt.float32).to_pylist())

    # list<int32> from nested Python lists
    lst = at.column([[1, 2], None, [3]], dt.list_(dt.int32))
    print(lst.dtype, lst.to_pylist())


if __name__ == "__main__":
    main()
