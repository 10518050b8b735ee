"""Grouped MIN/MAX as masked lexicographic plane reductions (scatter-free).

XLA's segment_min/max lower to scatter on TPU — measured ~0.005 Grows/s on
v5e (190x slower than a copy pass).  This kernel instead reduces a masked
(rows x groups) broadcast on the VPU, entirely in VMEM, one HBM pass.

64-bit values cannot live in Mosaic vectors, so ordering runs
lexicographically over two *i32-comparable* planes prepared by the caller:
map the value to an order-preserving u64 key (signed ints: flip the sign
bit; floats: IEEE totalOrder map; unsigned: identity), split into hi/lo
u32, then XOR each plane with 0x80000000 so SIGNED i32 comparisons give
the unsigned plane order.  The kernel computes, per group g:

    min over valid rows i with code[i]==g of (hi[i], lo[i])   [and/or max]

by a two-level select: block-min of hi, then block-min of lo among rows
tied on that hi, then a lexicographic merge into the running accumulator.
Empty groups return the identity (caller nulls them via counts).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode
from .segagg import G_MAX

__all__ = ["grouped_min_max", "encode_order_planes", "decode_order_value"]

_SUB, _LANE = 8, 128
_BLOCK = _SUB * _LANE

_I32_MAX = 0x7FFFFFFF
_I32_MIN = -0x80000000


def _block_extreme(oh, hi, lo, *, is_min: bool):
    """Lexicographic block (hi, lo) extreme per group.

    oh: (8, 128, G) bool row-in-group mask; hi/lo: (8, 128) i32.
    Returns (G,) i32 pair.
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
    if is_min:
        better = (bhi < acc_hi) | ((bhi == acc_hi) & (blo < acc_lo))
    else:
        better = (bhi > acc_hi) | ((bhi == acc_hi) & (blo > acc_lo))
    return (jnp.where(better, bhi, acc_hi),
            jnp.where(better, blo, acc_lo))


def _kernel(codes_ref, valid_ref, hi_ref, lo_ref, out_ref, acc,
            *, gpad: int, nblocks: int, want_min: bool, want_max: bool):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        acc[0, :] = jnp.full((gpad,), _I32_MAX, jnp.int32)   # min hi
        acc[1, :] = jnp.full((gpad,), _I32_MAX, jnp.int32)   # min lo
        acc[2, :] = jnp.full((gpad,), _I32_MIN, jnp.int32)   # max hi
        acc[3, :] = jnp.full((gpad,), _I32_MIN, jnp.int32)   # max lo
        acc[4:, :] = jnp.zeros_like(acc[4:, :])

    codes = codes_ref[...]
    valid = valid_ref[...]
    hi = hi_ref[...]
    lo = lo_ref[...]

    gid = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE, gpad), 2)
    oh = (codes[:, :, None] == gid) & (valid[:, :, None] != 0)

    if want_min:
        bhi, blo = _block_extreme(oh, hi, lo, is_min=True)
        nhi, nlo = _merge(acc[0, :], acc[1, :], bhi, blo, is_min=True)
        acc[0, :] = nhi
        acc[1, :] = nlo
    if want_max:
        bhi, blo = _block_extreme(oh, hi, lo, is_min=False)
        nhi, nlo = _merge(acc[2, :], acc[3, :], bhi, blo, is_min=False)
        acc[2, :] = nhi
        acc[3, :] = nlo

    @pl.when(b == nblocks - 1)
    def _emit():
        out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=(
    "num_groups", "want_min", "want_max", "interpret"))
def _grouped_min_max_impl(hi, lo, codes, valid, *, num_groups: int,
                          want_min: bool, want_max: bool, interpret: bool):
    n = codes.shape[0]
    nblocks = max(1, -(-n // _BLOCK))
    npad = nblocks * _BLOCK
    gpad = max(_LANE, -(-num_groups // _LANE) * _LANE)

    codes_p = jnp.full((npad,), num_groups, jnp.int32).at[:n].set(codes)
    valid_p = jnp.zeros((npad,), jnp.int32).at[:n].set(
        valid.astype(jnp.int32))
    hi_p = jnp.zeros((npad,), jnp.int32).at[:n].set(hi)
    lo_p = jnp.zeros((npad,), jnp.int32).at[:n].set(lo)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, gpad=gpad, nblocks=nblocks,
                              want_min=want_min, want_max=want_max),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((_SUB, _LANE), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANE), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANE), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANE), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_SUB, gpad), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((_SUB, gpad), jnp.int32),
            scratch_shapes=[pltpu.VMEM((_SUB, gpad), jnp.int32)],
            cost_estimate=pl.CostEstimate(
                flops=5 * npad * gpad,
                bytes_accessed=npad * 16 + _SUB * gpad * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(codes_p.reshape(nblocks * _SUB, _LANE),
          valid_p.reshape(nblocks * _SUB, _LANE),
          hi_p.reshape(nblocks * _SUB, _LANE),
          lo_p.reshape(nblocks * _SUB, _LANE))

    g = num_groups
    return out[0, :g], out[1, :g], out[2, :g], out[3, :g]


def encode_order_planes(values: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """Map values to (hi, lo) i32-comparable planes: signed i32 pair order
    == value order.  Ints use the sign-flip map; floats the IEEE
    totalOrder map (same encoding arrow-row uses for sort keys,
    arrow-row/src/fixed.rs:47)."""
    d = values.dtype
    if jnp.issubdtype(d, jnp.floating):
        # f64 bitcasts are unsupported by the TPU backend's X64 rewriter
        # (measured); float grouped min/max stays on the ops-layer
        # fallback until a bitcast-free two-plane encoding lands.
        raise NotImplementedError(
            "grouped_min_max: float dtypes not supported on-device")
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
    """Null-skipping per-group (min, max) of any numeric dtype.

    Integer dtypes only (float bit manipulation is unavailable on this
    TPU backend; ops fall back to XLA for floats).  Empty groups return
    identity values — callers mask them with per-group valid counts.
    """
    if num_groups > G_MAX:
        raise ValueError(f"grouped_min_max: num_groups > {G_MAX}")
    hi, lo = encode_order_planes(values)
    if valid is None:
        valid = jnp.ones(values.shape, jnp.bool_)
    mn_hi, mn_lo, mx_hi, mx_lo = _grouped_min_max_impl(
        hi, lo, codes.astype(jnp.int32), valid,
        num_groups=num_groups, want_min=want_min, want_max=want_max,
        interpret=interpret_mode())
    mn = decode_order_value(mn_hi, mn_lo, values.dtype) if want_min else None
    mx = decode_order_value(mx_hi, mx_lo, values.dtype) if want_max else None
    return mn, mx
