"""filter: select rows where a boolean predicate is true.

Re-design of arrow-select/src/filter.rs.  The reference picks between a
run-memcpy strategy and an index-gather strategy at selectivity 0.8
(filter.rs:42,268-285) — a CPU-cache heuristic.  On TPU the gather path wins
at every selectivity (vector gather saturates HBM; there is no run-memcpy
analogue), so the design is single-strategy:

    keep = predicate_values AND predicate_validity     (prep_null_mask,
                                                        filter.rs:116)
    count = popcount(keep)                              (filter.rs:111)
    indices = nonzero(keep, size=count)   -- one compaction, shared
    output  = take(column, indices)       -- fused gather per column

`FilterPredicate` precomputes `indices` once and is reused across all
columns of a batch, exactly like FilterBuilder::optimize + the shared
predicate in filter_record_batch (filter.rs:171-189).

The output length is data-dependent; the eager API syncs the popcount to the
host (one scalar transfer) and then runs a shape-static jitted gather.  For
fully-jitted pipelines use `filter_static`, which returns a capacity-padded
column plus valid_len — the engine's static-shape idiom (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import dtypes as dt
from ..core import validity as vd
from ..core.column import Column, PrimitiveColumn
from ..core.datum import as_datum
from ..core.table import Table
from ..errors import ArrowInvalid
from .take import take as take_kernel

__all__ = ["FilterPredicate", "filter", "filter_table", "filter_static"]


class FilterPredicate:
    """Precomputed selection, reusable across columns (FilterBuilder,
    filter.rs:202,223)."""

    def __init__(self, predicate: PrimitiveColumn):
        if not predicate.dtype.is_boolean:
            raise ArrowInvalid("filter predicate must be boolean")
        keep = predicate.values
        if predicate.validity is not None:
            keep = jnp.logical_and(keep, predicate.validity)
        self.keep = keep
        self.count = int(jnp.sum(keep))  # host sync: one scalar
        self._indices: Optional[PrimitiveColumn] = None

    @property
    def indices(self) -> PrimitiveColumn:
        if self._indices is None:
            idx = _nonzero_indices(self.keep, self.count)
            self._indices = PrimitiveColumn(idx, dt.int32)
        return self._indices


def _nonzero_indices(keep: jnp.ndarray, count: int) -> jnp.ndarray:
    (idx,) = jnp.nonzero(keep, size=count, fill_value=0)
    return idx.astype(jnp.int32)


def filter(values: Column, predicate) -> Column:
    """filter kernel (filter.rs:143)."""
    pred = predicate if isinstance(predicate, FilterPredicate) \
        else FilterPredicate(as_datum(predicate))
    if isinstance(values, Column) and len(values) != len(pred.keep):
        raise ArrowInvalid("filter length mismatch")
    return take_kernel(values, pred.indices)


def filter_table(table: Table, predicate) -> Table:
    """filter_record_batch (filter.rs:171): one predicate, all columns."""
    pred = predicate if isinstance(predicate, FilterPredicate) \
        else FilterPredicate(as_datum(predicate))
    cols = tuple(take_kernel(c, pred.indices) for c in table.columns)
    return Table(cols, table.schema, _validated=True)


def filter_static(values: jnp.ndarray, keep: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shape-static compaction for jitted pipelines.

    Returns (compacted, valid_len): `compacted` has the input's length with
    kept rows packed at the front (remainder zero-filled), `valid_len` a
    traced int32 scalar.  This is the XLA-native filter: a cumulative-sum
    scatter, no host sync, fusable into surrounding kernels.
    """
    n = keep.shape[0]
    pos = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, pos, n)  # out-of-range slot for dropped rows
    out = jnp.zeros_like(values).at[dest].set(values, mode="drop")
    return out, jnp.sum(keep, dtype=jnp.int32)
