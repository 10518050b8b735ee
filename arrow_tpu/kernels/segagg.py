"""Grouped SUM/COUNT on the MXU — thin wrappers over the fused kernel.

TPU-native replacement for scatter-add hash aggregation (the hot loop of
BASELINE config 4; the reference has no grouped aggregation — SURVEY.md
§2.2 arrow-arith/aggregate — so this is the engine's own design).  See
kernels/groupagg.py for the actual Mosaic kernel and the exactness
argument (one-hot matmuls with exact 8-bit bf16 limbs and i32 carry
accumulators); this module keeps the single-column convenience API and
the shared G_MAX bound.

Scope: integer sums + counts, dense group codes in [0, G), G <= 1024.
Float sums keep the XLA segmented path (FP addition is order-sensitive;
the engine fixes one reduction order there, SURVEY.md §7 hard-part (c)).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = ["grouped_sum_count", "grouped_count", "G_MAX"]

G_MAX = 1024                     # one-hot VMEM budget cap


def grouped_sum_count(values: jnp.ndarray, codes: jnp.ndarray,
                      valid: Optional[jnp.ndarray], num_groups: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sums, counts) per group for integer `values`.

    codes: dense i32 group ids in [0, num_groups) (out-of-range rows are
    dropped); valid: optional bool mask.  Sums are i64 (wrapping,
    null-skipping — equal to a sequential i64 wrapping loop in any
    order); counts are valid-row counts as i64.
    """
    from .groupagg import grouped_aggregate, SumCol
    sums, counts, _ = grouped_aggregate(
        codes, num_groups, sum_cols=[SumCol(values, valid)])
    return sums[0], counts[0]


def grouped_count(codes: jnp.ndarray, valid: Optional[jnp.ndarray],
                  num_groups: int) -> jnp.ndarray:
    """COUNT per group (valid rows only); i64."""
    zero = jnp.zeros(codes.shape, jnp.int64)
    _, counts = grouped_sum_count(zero, codes, valid, num_groups)
    return counts
