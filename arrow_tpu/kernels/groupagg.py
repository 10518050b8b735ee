"""Fused grouped-aggregation kernel: one pass, all aggregates.

Combines kernels/segagg.py and kernels/groupminmax.py into a single
Mosaic kernel so the group-by fast path launches ONE pallas_call per
batch: the (rows x groups) one-hot is built once per block and shared by
every aggregate column; all sum limbs (8 x 8-bit limbs per column, plus a
0/1 validity limb for COUNT) stack into a single batched MXU matmul; each
min/max column adds two masked lexicographic plane reductions on the VPU.

See segagg.py for the exactness argument (8-bit bf16 limbs, i32 lo/hi
carry accumulators, u64 wrapping recombine) and groupminmax.py for the
i32-comparable (hi, lo) plane ordering.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode
from .segagg import G_MAX
from .groupminmax import (_I32_MAX, _I32_MIN, _merge, _block_extreme,
                          encode_order_planes, decode_order_value)

__all__ = ["grouped_aggregate", "SumCol", "MinMaxCol"]

_SUB, _LANE = 8, 128
_BLOCK = _SUB * _LANE
_NLIMB = 8                       # 8-bit limbs of a u64
_LROWS = _NLIMB + 1              # + validity limb (the COUNT row)


def _kernel(codes_ref, planes_ref, svalid_ref, mm_ref, mmvalid_ref,
            sum_out, mm_out, acc_lo, acc_hi, mm_acc,
            *, gpad: int, nblocks: int, n_sum: int, n_mm: int,
            mm_want: Tuple[Tuple[bool, bool], ...]):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        if n_sum:
            acc_lo[...] = jnp.zeros_like(acc_lo)
            acc_hi[...] = jnp.zeros_like(acc_hi)
        if n_mm:
            for m in range(n_mm):
                mm_acc[4 * m + 0, :] = jnp.full((gpad,), _I32_MAX,
                                                jnp.int32)
                mm_acc[4 * m + 1, :] = jnp.full((gpad,), _I32_MAX,
                                                jnp.int32)
                mm_acc[4 * m + 2, :] = jnp.full((gpad,), _I32_MIN,
                                                jnp.int32)
                mm_acc[4 * m + 3, :] = jnp.full((gpad,), _I32_MIN,
                                                jnp.int32)

    codes = codes_ref[...]                          # (8, 128) i32
    gid = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE, gpad), 2)
    # NOTE: the (8,128,G) one-hot is rebuilt per consumer rather than
    # shared — Mosaic rejects one i1 tensor feeding both the MXU select
    # and the VPU masks with an "invalid relayout" error (measured).

    if n_sum:
        # lhs (8, L, 128): all limbs of all sum columns + validity limbs
        rows = []
        for s in range(n_sum):
            sv = svalid_ref[s]                      # (8, 128) i32 0/1
            svf = sv.astype(jnp.float32)
            for p in range(2):
                plane = planes_ref[2 * s + p]       # (8, 128) u32
                for q in range(4):
                    limb = jax.lax.bitcast_convert_type(
                        (plane >> (8 * q)) & 0xFF,
                        jnp.int32).astype(jnp.float32)
                    rows.append(limb * svf)         # null rows contribute 0
            rows.append(svf)                        # COUNT limb
        lhs = jnp.stack(rows, axis=1).astype(jnp.bfloat16)  # (8, L, 128)
        # select in f32 tiling first: an i1 mask cannot feed a bf16
        # (16,128)-tiled select directly (Mosaic relayout error)
        ohb = jnp.where(codes[:, :, None] == gid,
                        jnp.float32(1.0),
                        jnp.float32(0.0)).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            lhs, ohb,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)     # (8, L, G)
        psum = jnp.sum(part.astype(jnp.int32), axis=0,
                       dtype=jnp.int32)             # (L, G)
        L = n_sum * _LROWS
        lo = acc_lo[0:L, :] + psum
        acc_hi[0:L, :] = acc_hi[0:L, :] + (lo >> 8)
        acc_lo[0:L, :] = lo & 0xFF

    for m in range(n_mm):
        want_min, want_max = mm_want[m]
        valid = mmvalid_ref[m]
        oh = (codes[:, :, None] == gid) & (valid[:, :, None] != 0)
        hi = mm_ref[2 * m]
        lo = mm_ref[2 * m + 1]
        if want_min:
            bhi, blo = _block_extreme(oh, hi, lo, is_min=True)
            nhi, nlo = _merge(mm_acc[4 * m + 0, :], mm_acc[4 * m + 1, :],
                              bhi, blo, is_min=True)
            mm_acc[4 * m + 0, :] = nhi
            mm_acc[4 * m + 1, :] = nlo
        if want_max:
            bhi, blo = _block_extreme(oh, hi, lo, is_min=False)
            nhi, nlo = _merge(mm_acc[4 * m + 2, :], mm_acc[4 * m + 3, :],
                              bhi, blo, is_min=False)
            mm_acc[4 * m + 2, :] = nhi
            mm_acc[4 * m + 3, :] = nlo

    @pl.when(b == nblocks - 1)
    def _emit():
        if n_sum:
            sum_out[0] = acc_lo[...]
            sum_out[1] = acc_hi[...]
        if n_mm:
            mm_out[...] = mm_acc[...]


def _pad_rows(x, npad, fill=0):
    n = x.shape[-1]
    if n == npad:
        return x
    shape = x.shape[:-1] + (npad,)
    return jnp.full(shape, fill, x.dtype).at[..., :n].set(x)


@functools.partial(jax.jit, static_argnames=(
    "num_groups", "n_sum", "n_mm", "mm_want", "interpret"))
def _grouped_aggregate_impl(codes, planes, svalid, mm_planes, mm_valid,
                            *, num_groups: int, n_sum: int, n_mm: int,
                            mm_want, interpret: bool):
    n = codes.shape[0]
    nblocks = max(1, -(-n // _BLOCK))
    npad = nblocks * _BLOCK
    gpad = max(_LANE, -(-num_groups // _LANE) * _LANE)
    nrows = nblocks * _SUB

    codes_p = _pad_rows(codes, npad, num_groups).reshape(nrows, _LANE)
    planes_p = _pad_rows(planes, npad).reshape(max(1, 2 * n_sum) if n_sum
                                               else 1, nrows, _LANE) \
        if n_sum else jnp.zeros((1, nrows, _LANE), jnp.uint32)
    svalid_p = _pad_rows(svalid, npad).reshape(max(1, n_sum), nrows, _LANE) \
        if n_sum else jnp.zeros((1, nrows, _LANE), jnp.int32)
    mm_p = _pad_rows(mm_planes, npad).reshape(max(1, 2 * n_mm), nrows,
                                              _LANE) \
        if n_mm else jnp.zeros((1, nrows, _LANE), jnp.int32)
    mmv_p = _pad_rows(mm_valid, npad).reshape(max(1, n_mm), nrows, _LANE) \
        if n_mm else jnp.zeros((1, nrows, _LANE), jnp.int32)

    lrows = max(_SUB, n_sum * _LROWS)
    mrows = max(_SUB, 4 * n_mm)

    with jax.enable_x64(False):
        sum_out, mm_out = pl.pallas_call(
            functools.partial(_kernel, gpad=gpad, nblocks=nblocks,
                              n_sum=n_sum, n_mm=n_mm, mm_want=mm_want),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((_SUB, _LANE), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((planes_p.shape[0], _SUB, _LANE),
                             lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((svalid_p.shape[0], _SUB, _LANE),
                             lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mm_p.shape[0], _SUB, _LANE),
                             lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mmv_p.shape[0], _SUB, _LANE),
                             lambda b: (0, b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((2, lrows, gpad), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mrows, gpad), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((2, lrows, gpad), jnp.int32),
                jax.ShapeDtypeStruct((mrows, gpad), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((lrows, gpad), jnp.int32),
                pltpu.VMEM((lrows, gpad), jnp.int32),
                pltpu.VMEM((mrows, gpad), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * npad * gpad * (n_sum * _LROWS + 1)
                + 5 * npad * gpad * max(1, n_mm),
                bytes_accessed=npad * (4 + n_sum * 12 + n_mm * 12),
                transcendentals=0,
            ),
            interpret=interpret,
        )(codes_p, planes_p, svalid_p, mm_p, mmv_p)

    g = num_groups
    sums: List[jnp.ndarray] = []
    counts: List[jnp.ndarray] = []
    for s in range(n_sum):
        base = s * _LROWS
        lo = sum_out[0].astype(jnp.uint64)
        hi = sum_out[1].astype(jnp.uint64)
        total = jnp.zeros((g,), jnp.uint64)
        for l in range(_NLIMB):
            total = total + (lo[base + l, :g] << jnp.uint64(8 * l))
            if l < _NLIMB - 1:
                # the last hi limb's shift would be 64 == bit width:
                # implementation-defined in XLA (CPU gives 0, a mod-64
                # lowering would give <<0); its contribution wraps away
                # mod 2^64 by definition, so skip it
                total = total + (hi[base + l, :g] << jnp.uint64(8 * l + 8))
        sums.append(jax.lax.bitcast_convert_type(total, jnp.int64))
        cnt = (lo[base + _NLIMB, :g]
               + (hi[base + _NLIMB, :g] << jnp.uint64(8))).astype(jnp.int64)
        counts.append(cnt)
    mms: List[Tuple[jnp.ndarray, ...]] = []
    for m in range(n_mm):
        mms.append((mm_out[4 * m + 0, :g], mm_out[4 * m + 1, :g],
                    mm_out[4 * m + 2, :g], mm_out[4 * m + 3, :g]))
    return sums, counts, mms


class SumCol:
    """SUM/COUNT request: integer values + optional validity."""

    def __init__(self, values: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None):
        self.values = values
        self.valid = valid


class MinMaxCol:
    """MIN/MAX request: integer values + optional validity."""

    def __init__(self, values: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None,
                 want_min: bool = True, want_max: bool = True):
        self.values = values
        self.valid = valid
        self.want_min = want_min
        self.want_max = want_max


def grouped_aggregate(codes: jnp.ndarray, num_groups: int,
                      sum_cols: Sequence[SumCol] = (),
                      mm_cols: Sequence[MinMaxCol] = (),
                      decode: bool = True):
    """All grouped aggregates in one fused kernel pass.

    Returns (sums, counts, minmaxes): sums[i]/counts[i] are i64 (G,) for
    sum_cols[i]; minmaxes[j] is an (min, max) pair (entries None when not
    requested) decoded to mm_cols[j].values.dtype.

    decode=False returns minmaxes[j] as the RAW order planes
    (mn_hi, mn_lo, mx_hi, mx_lo) — i32-comparable, with empty-group
    identities still distinguishable from real extremes; chunked
    callers merge partials in this encoded space (decoded floats
    collapse NaN and the beyond-NaN identities together) and decode
    once at the end via groupminmax.decode_order_value.
    """
    if num_groups > G_MAX:
        raise ValueError(f"grouped_aggregate: num_groups > {G_MAX}")
    n = codes.shape[0]

    def mask_of(v):
        return jnp.ones((n,), jnp.int32) if v is None \
            else v.astype(jnp.int32)

    if sum_cols:
        def limb_planes(c):
            # arithmetic split — the (n,2)->(2,n) minor-dim transpose is
            # a slow layout change on TPU (measured ~200 ms at 10M)
            xu = jax.lax.bitcast_convert_type(
                c.values.astype(jnp.int64), jnp.uint64)
            return ((xu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                    (xu >> jnp.uint64(32)).astype(jnp.uint32))
        planes = jnp.stack([p for c in sum_cols
                            for p in limb_planes(c)])       # (2S, n)
        svalid = jnp.stack([mask_of(c.valid) for c in sum_cols])  # (S, n)
    else:
        planes = jnp.zeros((0, n), jnp.uint32)
        svalid = jnp.zeros((0, n), jnp.int32)
    if mm_cols:
        hilos = []
        for c in mm_cols:
            hi, lo = encode_order_planes(c.values)
            hilos += [hi, lo]
        mm_planes = jnp.stack(hilos)                        # (2M, n)
        mm_valid = jnp.stack([mask_of(c.valid) for c in mm_cols])
    else:
        mm_planes = jnp.zeros((0, n), jnp.int32)
        mm_valid = jnp.zeros((0, n), jnp.int32)

    mm_want = tuple((c.want_min, c.want_max) for c in mm_cols)
    sums, counts, mms = _grouped_aggregate_impl(
        codes.astype(jnp.int32), planes, svalid, mm_planes, mm_valid,
        num_groups=num_groups, n_sum=len(sum_cols), n_mm=len(mm_cols),
        mm_want=mm_want, interpret=interpret_mode())

    if not decode:
        return sums, counts, [tuple(m) for m in mms]
    minmaxes = []
    for j, c in enumerate(mm_cols):
        mn_hi, mn_lo, mx_hi, mx_lo = mms[j]
        mn = decode_order_value(mn_hi, mn_lo, c.values.dtype) \
            if c.want_min else None
        mx = decode_order_value(mx_hi, mx_lo, c.values.dtype) \
            if c.want_max else None
        minmaxes.append((mn, mx))
    return sums, counts, minmaxes
