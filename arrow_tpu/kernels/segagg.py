"""Grouped SUM/COUNT as one-hot matmuls on the MXU.

TPU-native replacement for scatter-add hash aggregation (the hot loop of
BASELINE config 4; the reference has no grouped aggregation — SURVEY.md
§2.2 arrow-arith/aggregate — so this is the engine's own design):

    one_hot(codes) : (rows, G)  built on the VPU
    partial        : limbs_f32 @ one_hot   on the MXU
    accumulate     : exact int32 limb accumulators with manual carry

Exactness: 64-bit integers cannot ride the MXU (no 64-bit vectors in
Mosaic, and the TPU f32 matmul is internally bf16 passes — measured
inexact for 16-bit operands).  Values are split OUTSIDE the kernel into
2 x u32 planes (a pure bitcast) and INSIDE the kernel into EIGHT 8-bit
limbs, each exact in bf16, so the matmul runs at native MXU rate; f32
accumulation of <= 1024 products of (0/1 x <=255) stays exact.  Partials
are accumulated per block into int32 (lo, hi) pairs with an explicit
carry, and recombined to a u64 wrapping sum on the XLA side:

    sum mod 2^64 = sum_l (hi_l << (8 l + 8)) + (lo_l << (8 l))

which for two's-complement inputs equals the wrapped signed sum — the
same value a sequential i64 wrapping loop produces, in any order.

Scope: integer sums + counts, dense group codes in [0, G), G <= 1024.
Float sums keep the XLA segmented path (FP addition is order-sensitive;
the engine fixes one reduction order there, SURVEY.md §7 hard-part (c)).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

__all__ = ["grouped_sum_count", "grouped_count", "G_MAX"]

_SUB, _LANE = 8, 128
_BLOCK = _SUB * _LANE            # rows per grid step
_NLIMB = 8                       # 8-bit limbs of a u64
G_MAX = 1024                     # one-hot VMEM budget cap


def _kernel(codes_ref, valid_ref, planes_ref, out_ref, acc_lo, acc_hi,
            *, gpad: int, nblocks: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        acc_lo[...] = jnp.zeros_like(acc_lo)
        acc_hi[...] = jnp.zeros_like(acc_hi)

    codes = codes_ref[...]                     # (8, 128) i32
    valid = valid_ref[...]                     # (8, 128) i32 (0/1)

    # one-hot (8, 128, G): eq AND valid, f32 for the MXU
    gid = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE, gpad), 2)
    oh = jnp.where((codes[:, :, None] == gid) & (valid[:, :, None] != 0),
                   jnp.float32(1.0), jnp.float32(0.0))

    # counts: exact in f32 (<= 1024 per block), then i32
    cnt = jnp.sum(oh, axis=(0, 1)).astype(jnp.int32)       # (G,)
    acc_lo[_NLIMB, :] = acc_lo[_NLIMB, :] + cnt

    # limb sums: per 8-bit limb, contract the lane dim per sublane row
    # (exact: bf16 limbs <= 255, one-hot 0/1, f32 partials <= 128*255),
    # then exact i32 reduction over the 8 sublane partials.
    ohb = oh.astype(jnp.bfloat16)
    for p in range(planes_ref.shape[0]):
        plane = planes_ref[p]                  # (8, 128) u32
        for q in range(4):
            l = 4 * p + q
            # Mosaic has no u32->f casts; limbs are < 2^8 so a bitcast
            # to i32 is value-preserving.
            limb = jax.lax.bitcast_convert_type(
                (plane >> (8 * q)) & 0xFF,
                jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                limb[:, None, :], ohb,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # (8, 1, G)
            psum = jnp.sum(part.astype(jnp.int32), axis=(0, 1),
                           dtype=jnp.int32)                       # (G,)
            lo = acc_lo[l, :] + psum
            acc_hi[l, :] = acc_hi[l, :] + (lo >> 8)
            acc_lo[l, :] = lo & 0xFF

    @pl.when(b == nblocks - 1)
    def _emit():
        out_ref[0] = acc_lo[...]
        out_ref[1] = acc_hi[...]


@functools.partial(jax.jit, static_argnames=("num_groups", "interpret"))
def _grouped_sum_count_impl(planes, codes, valid, *, num_groups: int,
                            interpret: bool):
    n = codes.shape[0]
    nblocks = max(1, -(-n // _BLOCK))
    npad = nblocks * _BLOCK
    gpad = max(_LANE, -(-num_groups // _LANE) * _LANE)

    codes_p = jnp.full((npad,), num_groups, jnp.int32).at[:n].set(codes)
    valid_p = jnp.zeros((npad,), jnp.int32).at[:n].set(
        valid.astype(jnp.int32))
    planes_p = jnp.zeros((2, npad), jnp.uint32).at[:, :n].set(planes)

    # Mosaic is a 32-bit ISA; with the engine-wide x64 flag on, Python int
    # literals in index maps and kernel bodies trace as i64 and fail to
    # legalize.  The kernel region traces with x64 off (inputs/outputs are
    # explicitly 32-bit; the u64 recombine below runs outside).
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, gpad=gpad, nblocks=nblocks),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((_SUB, _LANE), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_SUB, _LANE), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, _SUB, _LANE), lambda b: (0, b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, _NLIMB + 8, gpad),
                                   lambda b: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, _NLIMB + 8, gpad),
                                           jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((_NLIMB + 8, gpad), jnp.int32),
                pltpu.VMEM((_NLIMB + 8, gpad), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * npad * gpad * (2 * _NLIMB + 1),
                bytes_accessed=npad * (4 + 4 + 8) + 2 * _SUB * gpad * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(codes_p.reshape(nblocks * _SUB, _LANE),
          valid_p.reshape(nblocks * _SUB, _LANE),
          planes_p.reshape(2, nblocks * _SUB, _LANE))

    lo = out[0].astype(jnp.uint64)
    hi = out[1].astype(jnp.uint64)
    g = num_groups
    total = jnp.zeros((g,), jnp.uint64)
    for l in range(_NLIMB):
        total = total + (lo[l, :g] << jnp.uint64(8 * l))
        total = total + (hi[l, :g] << jnp.uint64(8 * l + 8))
    counts = lo[_NLIMB, :g].astype(jnp.int64)
    return total, counts


def grouped_sum_count(values: jnp.ndarray, codes: jnp.ndarray,
                      valid: Optional[jnp.ndarray], num_groups: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sums, counts) per group for integer `values`.

    values: any integer dtype (n,); codes: dense i32 group ids in
    [0, num_groups) (rows with out-of-range codes are dropped); valid:
    optional bool mask.  Returns sums as i64 (wrapping, null-skipping) and
    counts of valid rows as i64.
    """
    if num_groups > G_MAX:
        raise ValueError(f"grouped_sum_count: num_groups > {G_MAX}")
    v64 = values.astype(jnp.int64)
    planes = jax.lax.bitcast_convert_type(v64, jnp.uint32).T   # (2, n)
    if valid is None:
        valid = jnp.ones(values.shape, jnp.bool_)
    total, counts = _grouped_sum_count_impl(
        planes, codes.astype(jnp.int32), valid,
        num_groups=num_groups, interpret=interpret_mode())
    return jax.lax.bitcast_convert_type(total, jnp.int64), counts


def grouped_count(codes: jnp.ndarray, valid: Optional[jnp.ndarray],
                  num_groups: int) -> jnp.ndarray:
    """COUNT per group (valid rows only); i64."""
    zero = jnp.zeros(codes.shape, jnp.int64)
    _, counts = grouped_sum_count(zero, codes, valid, num_groups)
    return counts
