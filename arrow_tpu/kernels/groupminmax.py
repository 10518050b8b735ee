"""Grouped MIN/MAX building blocks + thin wrapper over the fused kernel.

XLA's segment_min/max lower to scatter on TPU — measured ~0.005 Grows/s
on v5e (190x slower than a copy pass).  The engine instead reduces a
masked (rows x groups) broadcast on the VPU, entirely in VMEM, one HBM
pass — see kernels/groupagg.py for the fused Mosaic kernel; this module
holds the kernel-side reduction helpers and the order-preserving plane
encoding it shares.

64-bit values cannot live in Mosaic vectors, so ordering runs
lexicographically over two *i32-comparable* planes: map the value to an
order-preserving u64 key (signed ints: flip the sign bit; unsigned:
identity), split into hi/lo u32, then XOR each plane with 0x80000000 so
SIGNED i32 comparisons give the unsigned plane order.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["grouped_min_max", "encode_order_planes", "decode_order_value"]

_I32_MAX = 0x7FFFFFFF
_I32_MIN = -0x80000000


def _block_extreme(oh, hi, lo, *, is_min: bool):
    """Lexicographic block (hi, lo) extreme per group, inside the kernel.

    oh: (8, 128, G) bool row-in-group mask; hi/lo: (8, 128) i32.
    Two-level select: extreme of hi, then extreme of lo among rows tied
    on that hi.  Returns (G,) i32 pair.
    """
    ident = jnp.int32(_I32_MAX if is_min else _I32_MIN)
    red = (jnp.min if is_min else jnp.max)
    whi = jnp.where(oh, hi[:, :, None], ident)
    bhi = red(whi, axis=(0, 1))                       # (G,)
    tied = oh & (hi[:, :, None] == bhi[None, None, :])
    wlo = jnp.where(tied, lo[:, :, None], ident)
    blo = red(wlo, axis=(0, 1))                       # (G,)
    return bhi, blo


def _merge(acc_hi, acc_lo, bhi, blo, *, is_min: bool):
    """Lexicographic merge of a block extreme into the accumulator."""
    if is_min:
        better = (bhi < acc_hi) | ((bhi == acc_hi) & (blo < acc_lo))
    else:
        better = (bhi > acc_hi) | ((bhi == acc_hi) & (blo > acc_lo))
    return (jnp.where(better, bhi, acc_hi),
            jnp.where(better, blo, acc_lo))


def encode_order_planes(values: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """Map values to (hi, lo) i32-comparable planes: signed i32 pair order
    == value order.  Ints use the sign-flip map (the same encoding
    arrow-row uses for sort keys, arrow-row/src/fixed.rs:47)."""
    d = values.dtype
    if d in (jnp.float32, jnp.float16):
        # 32-bit float bitcasts work on this backend (f64 ones do not):
        # IEEE totalOrder map on the f32 bits as the hi plane, lo = 0
        bits = jax.lax.bitcast_convert_type(
            values.astype(jnp.float32), jnp.uint32)
        sign = bits >> jnp.uint32(31)
        key32 = jnp.where(sign == 1, ~bits, bits | jnp.uint32(0x80000000))
        hi = jax.lax.bitcast_convert_type(
            key32 ^ jnp.uint32(0x80000000), jnp.int32)
        lo = jnp.full(values.shape, -0x80000000, jnp.int32)
        return hi, lo
    if jnp.issubdtype(d, jnp.floating):
        # f64 bitcasts are unsupported by the TPU backend's X64 rewriter
        # (measured); f64 grouped min/max stays on the ops-layer fallback.
        raise NotImplementedError(
            "grouped_min_max: float64 not supported on-device")
    if jnp.issubdtype(d, jnp.unsignedinteger):
        key = values.astype(jnp.uint64)
    else:
        v64 = values.astype(jnp.int64)
        key = jax.lax.bitcast_convert_type(v64, jnp.uint64) \
            ^ jnp.uint64(0x8000000000000000)
    hi = ((key >> jnp.uint64(32)) ^ jnp.uint64(0x80000000)) \
        .astype(jnp.uint32)
    lo = ((key & jnp.uint64(0xFFFFFFFF)) ^ jnp.uint64(0x80000000)) \
        .astype(jnp.uint32)
    return (jax.lax.bitcast_convert_type(hi, jnp.int32),
            jax.lax.bitcast_convert_type(lo, jnp.int32))


def decode_order_value(hi: jnp.ndarray, lo: jnp.ndarray, dtype
                       ) -> jnp.ndarray:
    """Inverse of encode_order_planes; returns values in `dtype`."""
    hi_u = jax.lax.bitcast_convert_type(hi, jnp.uint32).astype(jnp.uint64)
    lo_u = jax.lax.bitcast_convert_type(lo, jnp.uint32).astype(jnp.uint64)
    key = (((hi_u ^ jnp.uint64(0x80000000)) << jnp.uint64(32))
           | (lo_u ^ jnp.uint64(0x80000000)))
    if dtype in (jnp.float32, jnp.float16):
        key32 = (key >> jnp.uint64(32)).astype(jnp.uint32)
        sign = key32 >> jnp.uint32(31)
        bits = jnp.where(sign == 1, key32 & jnp.uint32(0x7FFFFFFF),
                         ~key32)
        return jax.lax.bitcast_convert_type(bits, jnp.float32) \
            .astype(dtype)
    if jnp.issubdtype(dtype, jnp.unsignedinteger):
        return key.astype(dtype)
    v = jax.lax.bitcast_convert_type(
        key ^ jnp.uint64(0x8000000000000000), jnp.int64)
    return v.astype(dtype)


def grouped_min_max(values: jnp.ndarray, codes: jnp.ndarray,
                    valid: Optional[jnp.ndarray], num_groups: int,
                    want_min: bool = True, want_max: bool = True
                    ) -> Tuple[Optional[jnp.ndarray],
                               Optional[jnp.ndarray]]:
    """Null-skipping per-group (min, max) of integer / f32 / f16 dtypes
    (f64 bit manipulation is unavailable on this TPU backend; ops fall
    back for it).  Float ordering is IEEE totalOrder (NaN above +inf).
    Empty groups return identity values — callers mask them with
    per-group valid counts."""
    from .groupagg import grouped_aggregate, MinMaxCol
    _, _, mms = grouped_aggregate(
        codes, num_groups,
        mm_cols=[MinMaxCol(values, valid, want_min, want_max)])
    return mms[0]
