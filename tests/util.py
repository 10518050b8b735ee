"""Golden-comparison helpers: arrow_tpu results vs pyarrow (the oracle —
the reference cross-validates against pyarrow in CI, SURVEY.md §4 tier 3)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import arrow_tpu as at


def assert_column_equals_pa(col: at.Column, expected: pa.Array, *,
                            check_dtype: bool = True):
    """Logical equality: same validity, same values on valid slots.
    NaN == NaN (floats compare with np.testing semantics)."""
    got = col.to_pyarrow()
    if isinstance(expected, pa.ChunkedArray):
        expected = expected.combine_chunks()
    assert len(got) == len(expected), f"len {len(got)} != {len(expected)}"
    if check_dtype:
        assert got.type == expected.type, f"{got.type} != {expected.type}"
    g_valid = np.asarray(got.is_valid())
    e_valid = np.asarray(expected.is_valid())
    np.testing.assert_array_equal(g_valid, e_valid, err_msg="validity differs")
    g = got.to_pylist()
    e = expected.to_pylist()
    for i, (a, b) in enumerate(zip(g, e)):
        if b is None:
            continue
        if isinstance(b, float):
            np.testing.assert_equal(a, b, err_msg=f"row {i}")
        else:
            assert a == b, f"row {i}: {a!r} != {b!r}"


def assert_table_equals_pa(table: at.Table, expected):
    got = table.to_pyarrow()
    if isinstance(expected, pa.Table):
        expected = expected.combine_chunks()
        cols = [expected.column(i).combine_chunks()
                for i in range(expected.num_columns)]
    else:
        cols = [expected.column(i) for i in range(expected.num_columns)]
    assert table.num_columns == len(cols)
    for i, c in enumerate(cols):
        assert_column_equals_pa(table.columns[i], c)
