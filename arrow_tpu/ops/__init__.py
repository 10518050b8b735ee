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
