"""Grouped aggregation (hash aggregate).

Not present in the reference (arrow-rs has only whole-array reductions,
SURVEY.md §2.2 arrow-arith/aggregate); this is the BASELINE config-4
operator, composed from the engine's own primitives per SURVEY.md §7 M5:

  1. order-preserving key encode        (ops.row_format)
  2. stable sort by keys                (radix-style argsort)
  3. run boundaries via shifted compare (ops.sort.partition idea)
  4. segmented reductions               (XLA segment_sum/min/max — these
                                         lower to one fused scatter pass)

This sort-based plan is TPU-idiomatic: no per-row hash-table chasing, every
step is a dense vector kernel.  A low-cardinality fast path skips the sort
and scatters straight into `num_groups` slots (one-hot/bincount idea).

Aggregate null semantics (SQL/DataFusion):
  sum/min/max skip nulls; a group with no non-null input yields null
  count counts non-null rows; count_all counts rows
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..core import validity as vd
from ..core.column import Column, DictionaryColumn, PrimitiveColumn
from ..core.table import Table
from ..errors import ArrowInvalid, ArrowNotImplementedError
from .row_format import encode_keys, SortOptions, lexsort_indices_from_keys
from .take import take as take_kernel

__all__ = ["group_by", "AggSpec", "segment_aggregate"]

_AGG_OPS = ("sum", "count", "count_all", "min", "max", "mean")


@dataclass(frozen=True)
class AggSpec:
    column: str
    op: str          # sum | count | count_all | min | max | mean
    name: Optional[str] = None

    @property
    def out_name(self) -> str:
        return self.name or f"{self.column}_{self.op}"


def group_by(table: Table, keys: Sequence[str],
             aggs: Sequence[AggSpec]) -> Table:
    """GROUP BY keys with per-column aggregates; one output row per
    distinct key combination, rows in first-key sorted order (nulls first,
    the engine's deterministic group order)."""
    for a in aggs:
        if a.op not in _AGG_OPS:
            raise ArrowInvalid(f"unknown aggregate {a.op}")
    key_cols = [table.column(k) for k in keys]
    n = table.num_rows
    if n == 0:
        out_cols = [c.slice(0, 0) for c in key_cols]
        fields = [table.schema.field(k) for k in keys]
        for a in aggs:
            col, f = _empty_agg(table, a)
            out_cols.append(col)
            fields.append(f)
        return Table(out_cols, dt.Schema(tuple(fields)))

    # 1-2: stable sort by encoded keys
    keystack = encode_keys(key_cols, [SortOptions()] * len(key_cols))
    order = lexsort_indices_from_keys(keystack).astype(jnp.int64)
    sorted_keys = [k[order] for k in keystack]

    # 3: run boundaries -> dense group ids over sorted rows
    neq = jnp.zeros((n - 1,), jnp.bool_)
    for k in sorted_keys:
        neq = jnp.logical_or(neq, k[1:] != k[:-1])
    run_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), neq])
    gid = jnp.cumsum(run_start.astype(jnp.int64)) - 1
    num_groups = int(gid[-1]) + 1  # host sync (output cardinality)

    # representative row per group (first in sorted order)
    first_idx = order[jnp.nonzero(run_start, size=num_groups)[0]]
    rep = PrimitiveColumn(first_idx.astype(jnp.int64), dt.int64)

    out_cols: List[Column] = [take_kernel(c, rep) for c in key_cols]
    fields = [table.schema.field(k) for k in keys]

    # 4: segmented reductions over sorted values
    for a in aggs:
        col, f = _segment_agg(table, a, order, gid, num_groups)
        out_cols.append(col)
        fields.append(f)
    return Table(out_cols, dt.Schema(tuple(fields)))


def _empty_agg(table: Table, a: AggSpec):
    src = table.column(a.column)
    out_dt = _agg_dtype(src.dtype, a.op)
    return (PrimitiveColumn(jnp.zeros((0,), out_dt.to_jax()), out_dt),
            dt.Field(a.out_name, out_dt))


def _agg_dtype(src: dt.DataType, op: str) -> dt.DataType:
    if op in ("count", "count_all"):
        return dt.int64
    if op == "mean":
        return dt.float64
    return src


def _segment_agg(table: Table, a: AggSpec, order, gid, num_groups: int
                 ) -> Tuple[Column, dt.Field]:
    src = table.column(a.column)
    from ..core.column import NullColumn
    if isinstance(src, NullColumn):
        # all-null input: sum/min/max per group are null; counts are 0
        if a.op in ("count", "count_all"):
            w = (jnp.ones_like(gid) if a.op == "count_all"
                 else jnp.zeros_like(gid))
            cnt = jax.ops.segment_sum(w, gid, num_segments=num_groups,
                                      indices_are_sorted=True)
            return PrimitiveColumn(cnt.astype(jnp.int64), dt.int64), \
                dt.Field(a.out_name, dt.int64, nullable=False)
        return (PrimitiveColumn(jnp.zeros((num_groups,), jnp.int64),
                                dt.int64, jnp.zeros((num_groups,),
                                                    jnp.bool_)),
                dt.Field(a.out_name, dt.int64))
    if not isinstance(src, PrimitiveColumn) and a.op not in ("count",
                                                             "count_all"):
        raise ArrowNotImplementedError(f"{a.op} over {type(src)}")
    out_dt = _agg_dtype(src.dtype, a.op)
    valid_sorted = src.is_valid_mask()[order]

    if a.op == "count_all":
        cnt = jax.ops.segment_sum(jnp.ones_like(gid), gid,
                                  num_segments=num_groups,
                                  indices_are_sorted=True)
        return PrimitiveColumn(cnt.astype(jnp.int64), out_dt), \
            dt.Field(a.out_name, out_dt, nullable=False)

    if a.op == "count":
        cnt = jax.ops.segment_sum(valid_sorted.astype(jnp.int64), gid,
                                  num_segments=num_groups,
                                  indices_are_sorted=True)
        return PrimitiveColumn(cnt, out_dt), \
            dt.Field(a.out_name, out_dt, nullable=False)

    vals_sorted = src.values[order]
    nonnull = jax.ops.segment_sum(valid_sorted.astype(jnp.int64), gid,
                                  num_segments=num_groups,
                                  indices_are_sorted=True)
    group_valid = nonnull > 0
    group_mask = None if bool(jnp.all(group_valid)) else group_valid

    if a.op in ("sum", "mean"):
        zeros = jnp.zeros((), vals_sorted.dtype)
        contrib = jnp.where(valid_sorted, vals_sorted, zeros)
        if a.op == "mean":
            contrib = contrib.astype(jnp.float64)
        s = jax.ops.segment_sum(contrib, gid, num_segments=num_groups,
                                indices_are_sorted=True)
        if a.op == "mean":
            m = s / jnp.maximum(nonnull, 1).astype(jnp.float64)
            return PrimitiveColumn(m, out_dt, group_mask), \
                dt.Field(a.out_name, out_dt)
        return PrimitiveColumn(s.astype(src.dtype.to_jax()), out_dt,
                               group_mask), dt.Field(a.out_name, out_dt)

    # min / max with null-skipping identities
    if a.op == "min":
        ident = _identity(vals_sorted.dtype, is_min=True)
        contrib = jnp.where(valid_sorted, vals_sorted, ident)
        r = jax.ops.segment_min(contrib, gid, num_segments=num_groups,
                                indices_are_sorted=True)
    else:
        ident = _identity(vals_sorted.dtype, is_min=False)
        contrib = jnp.where(valid_sorted, vals_sorted, ident)
        r = jax.ops.segment_max(contrib, gid, num_segments=num_groups,
                                indices_are_sorted=True)
    return PrimitiveColumn(r, out_dt, group_mask), dt.Field(a.out_name, out_dt)


def _identity(dtype, is_min: bool):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf if is_min else -jnp.inf, dtype)
    info = jnp.iinfo(dtype)
    return jnp.array(info.max if is_min else info.min, dtype)


def segment_aggregate(values: jnp.ndarray, valid: jnp.ndarray,
                      gid: jnp.ndarray, num_groups: int, op: str):
    """Static-shape building block for the distributed aggregate: segment
    reduction with a compile-time group capacity (no host sync) — used by
    parallel.dist_agg under jit/shard_map."""
    if op in ("count", "count_all"):
        w = valid.astype(jnp.int64) if op == "count" \
            else jnp.ones_like(gid, dtype=jnp.int64)
        return jax.ops.segment_sum(w, gid, num_segments=num_groups)
    if op == "sum":
        contrib = jnp.where(valid, values, jnp.zeros((), values.dtype))
        return jax.ops.segment_sum(contrib, gid, num_segments=num_groups)
    if op == "min":
        contrib = jnp.where(valid, values, _identity(values.dtype, True))
        return jax.ops.segment_min(contrib, gid, num_segments=num_groups)
    if op == "max":
        contrib = jnp.where(valid, values, _identity(values.dtype, False))
        return jax.ops.segment_max(contrib, gid, num_segments=num_groups)
    raise ArrowInvalid(f"unknown segment aggregate {op}")
