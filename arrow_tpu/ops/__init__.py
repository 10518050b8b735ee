"""Compute-kernel facade, mirroring `arrow::compute`
(arrow/src/compute/mod.rs:3-23): every kernel re-exported flat."""

from .arity import unary, binary  # noqa: F401
from .numeric import (  # noqa: F401
    add, sub, mul, div, rem, neg,
    add_wrapping, sub_wrapping, mul_wrapping, neg_wrapping,
)
from .boolean import (  # noqa: F401
    and_, or_, not_, and_kleene, or_kleene, is_null, is_not_null,
)
from .cmp import (  # noqa: F401
    eq, neq, lt, lt_eq, gt, gt_eq, distinct, not_distinct,
)
from .take import take, take_table  # noqa: F401
from .filter import (  # noqa: F401
    FilterPredicate, filter, filter_table, filter_static,
)
from .concat import (  # noqa: F401
    concat, concat_tables, interleave, interleave_tables,
)
# reference-crate names (concat.rs:470, interleave.rs:359)
concat_batches = concat_tables
interleave_record_batch = interleave_tables
from .select_misc import zip_, nullif, shift, union_extract  # noqa: F401
from .ree import run_end_encode, run_end_decode  # noqa: F401
from .ord import make_comparator, make_lexicographic_comparator  # noqa: F401
from .row_format import (  # noqa: F401
    SortOptions, SortField, RowConverter, Rows,
)
from .sort import (  # noqa: F401
    SortColumn, sort_to_indices, sort, lexsort_to_indices, lexsort,
    sort_table, rank, partition, partition_mask, Partitions,
)
from .aggregate import (  # noqa: F401
    sum_, sum_checked, min_, max_, min_max, count, count_nulls,
    bool_and, bool_or, bit_and, bit_or, bit_xor,
)
from .cast import (  # noqa: F401
    cast, can_cast, CastOptions, base64_encode, base64_decode,
)
from .temporal import (  # noqa: F401
    date_part, year, month, day, hour, minute, second, millisecond,
    microsecond, nanosecond, day_of_week, day_of_year, quarter,
    week, iso_week, iso_year, add_interval, sub_interval,
)
from .bitwise import (  # noqa: F401
    # elementwise bitwise kernels use the reference's bitwise_* names
    # (arrow-arith/src/bitwise.rs) so they no longer shadow the
    # whole-array bit_and/bit_or/bit_xor aggregates imported above
    bitwise_and, bitwise_or, bitwise_xor, bitwise_not,
    bitwise_shift_left, bitwise_shift_right,
)
from .coalesce import BatchCoalescer  # noqa: F401
from .groupby import (group_by, AggSpec, GroupByAccumulator,  # noqa: F401
                      segment_aggregate)
from .join import join, join_indices  # noqa: F401
from .strings import (  # noqa: F401
    dictionary_encode, dictionary_decode,
    like, ilike, nlike, nilike, starts_with, ends_with, contains,
    regexp_is_match, regexp_match, substring, length,
    octet_length, bit_length,
    upper, lower, concat_elements,
)
