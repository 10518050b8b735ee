"""Filter compaction as MXU permutation matmuls (the Pallas take on
arrow-select filter.rs's hot loops).

The XLA path compacts by a stable partition-sort — O(n log n) comparator
passes.  This kernel is O(n): for each 256-row sub-block it builds the
compaction permutation from a prefix sum (a triangular matmul on the
MXU), applies it to the data as a one-hot matmul over exact bf16 byte
limbs, and appends the kept rows to a VMEM staging buffer.  Whenever the
staging buffer fills a 256-row chunk, it flushes to HBM with an ALIGNED
dynamic-offset DMA (Mosaic requires provably tiled offsets — arbitrary
offsets fail to compile, measured), using a dynamic lane-roll to place
each block at the running write position.

Exactness: only data MOVEMENT happens — bytes ride the MXU as 8-bit
limbs (exact in bf16; each output element is a sum with exactly one
non-zero term).  Works for any fixed-width dtype via u32 limb planes
prepared outside (pure bitcasts).

Cost model (v5e): per 256-row sub-block, the P build is 256^2 f32
compares (VPU) + two 256x256 matmuls per u32 plane (MXU at native bf16
rate) -> ~0.3 cycles/row/plane; the partition-sort alternative measured
~9x off copy bandwidth.  Wide batches amortize the P build across all
planes of all columns.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

__all__ = ["compact_planes", "compact_mask_arrays"]

_SUB, _LANE = 8, 128
_BLOCK = _SUB * _LANE            # 1024 rows per grid step
_CHUNK = 256                     # permutation sub-block (P is CHUNK^2)
_NSUB = _BLOCK // _CHUNK


def _kernel(keep_ref, planes_ref, out_ref, off_smem, pend_smem, staging,
            buf, sem, *, nplanes: int, nblocks: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        off_smem[0] = 0
        pend_smem[0] = 0
        staging[...] = jnp.zeros_like(staging)

    # triangular ones (CHUNK x CHUNK) for the prefix sum: T[i, j] = i <= j
    row_i = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _CHUNK), 1)
    tri = jnp.where(row_i <= col_j, jnp.float32(1.0), jnp.float32(0.0))

    keep = keep_ref[...]                         # (8, 128) i32 0/1
    # flatten logical order: row-major (8,128) -> 4 chunks of 256

    for c in range(_NSUB):
        rows = keep[2 * c: 2 * c + 2, :]          # (2, 128) = 256 rows
        kf = rows.reshape(1, 2, _LANE).astype(jnp.float32)
        # positions: exclusive prefix sum over the 256 linear slots.
        # reshape (2,128) -> (1,256) is a relayout Mosaic handles for
        # sublane-major pairs? safer: compute via two 128-wide cumsums.
        k0 = kf[0, 0, :]                          # first 128 rows
        k1 = kf[0, 1, :]                          # next 128 rows
        tri128 = tri[:_LANE, :_LANE]
        # inclusive cumsum of each half via (1,128)@(128,128)
        c0 = jax.lax.dot_general(k0[None, :], tri128,
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[0]
        c1 = jax.lax.dot_general(k1[None, :], tri128,
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)[0]
        total0 = c0[_LANE - 1]
        pos0 = c0 - k0                            # exclusive
        pos1 = c1 - k1 + total0
        count = (total0 + c1[_LANE - 1]).astype(jnp.int32)

        # one-hot permutation P[j, i] = keep_i & (pos_i == j), separately
        # for the two 128-row halves (target dim j spans 256)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, _LANE), 0) \
            .astype(jnp.float32)
        p0 = jnp.where((tgt == pos0[None, :]) & (k0[None, :] > 0),
                       jnp.float32(1.0), jnp.float32(0.0))
        p1 = jnp.where((tgt == pos1[None, :]) & (k1[None, :] > 0),
                       jnp.float32(1.0), jnp.float32(0.0))
        pb0 = p0.astype(jnp.bfloat16)
        pb1 = p1.astype(jnp.bfloat16)

        pend = pend_smem[0]
        # ALL planes x bytes ride two matmuls (M = 4*nplanes) — per-row
        # M=1 dots are MXU-latency-bound (measured ~2x slower)
        rows0, rows1 = [], []
        for pl_i in range(nplanes):
            plane = planes_ref[pl_i, 2 * c: 2 * c + 2, :]   # (2,128) u32
            for q in range(4):
                byte = jax.lax.bitcast_convert_type(
                    (plane >> (8 * q)) & 0xFF, jnp.int32) \
                    .astype(jnp.float32)
                rows0.append(byte[0:1, :])
                rows1.append(byte[1:2, :])
        m0 = jnp.concatenate(rows0, axis=0).astype(jnp.bfloat16)
        m1 = jnp.concatenate(rows1, axis=0).astype(jnp.bfloat16)
        r = (jax.lax.dot_general(
                m0, pb0, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
             + jax.lax.dot_general(
                m1, pb1, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)) \
            .astype(jnp.int32)                        # (4P, CHUNK)
        words = []
        for pl_i in range(nplanes):
            q0 = 4 * pl_i
            words.append(r[q0:q0 + 1] | (r[q0 + 1:q0 + 2] << 8)
                         | (r[q0 + 2:q0 + 3] << 16)
                         | (r[q0 + 3:q0 + 4] << 24))
        # append all planes to staging at [pend, pend+count) with ONE
        # dynamic roll + select.  Everything stays 2-D: Mosaic has no
        # 1-D concat/reshape, and .at[].set lowers to scatter which it
        # also lacks.
        block = words[0] if nplanes == 1 else \
            jnp.concatenate(words, axis=0)                 # (P, CHUNK)
        padded = jnp.concatenate(
            [block, jnp.zeros((nplanes, 2 * _BLOCK - _CHUNK), jnp.int32)],
            axis=1)
        rolled = pltpu.roll(padded, shift=pend, axis=1)
        slot = jax.lax.broadcasted_iota(jnp.int32,
                                        (nplanes, 2 * _BLOCK), 1)
        keepmask = (slot >= pend) & (slot < pend + count)
        staging[...] = jnp.where(keepmask, rolled, staging[...])
        pend_smem[0] = pend + count

        # flush full 1024-row chunks (BLOCK-aligned offsets only)
        @pl.when(pend_smem[0] >= _BLOCK)
        def _flush():
            buf[...] = staging[:, :_BLOCK]
            off = off_smem[0]
            aligned = pl.multiple_of(off, _BLOCK)
            cp = pltpu.make_async_copy(
                buf, out_ref.at[:, pl.ds(aligned, _BLOCK)], sem)
            cp.start()
            cp.wait()
            # circular roll by -BLOCK == +BLOCK over width 2*BLOCK
            staging[...] = pltpu.roll(staging[...], shift=_BLOCK,
                                      axis=1)
            off_smem[0] = off + _BLOCK
            pend_smem[0] = pend_smem[0] - _BLOCK

    @pl.when(b == nblocks - 1)
    def _final_flush():
        buf[...] = staging[:, :_BLOCK]
        off = off_smem[0]
        aligned = pl.multiple_of(off, _BLOCK)
        cp = pltpu.make_async_copy(
            buf, out_ref.at[:, pl.ds(aligned, _BLOCK)], sem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("nplanes", "interpret",
                                             "out_cap"))
def _compact_impl(keep, planes, *, nplanes: int, interpret: bool,
                  out_cap=None):
    n = keep.shape[0]
    nblocks = max(1, -(-n // _BLOCK))
    npad = nblocks * _BLOCK
    # callers with a PROVEN bound on the kept count (e.g. group_by run
    # starts <= the static key-domain size) shrink the output buffer:
    # at 125M rows x 8 planes the full-length buffer alone is 4 GB of
    # HBM; a 10M-group bound cuts it to ~0.34 GB.  The kernel only ever
    # DMA-writes the first ceil(count/_BLOCK) blocks, so a cap >= count
    # is safe by construction (an undersized cap would corrupt: callers
    # must pass a true upper bound).
    out_npad = npad if out_cap is None else \
        min(npad, max(1, -(-int(out_cap) // _BLOCK)) * _BLOCK)
    # plane count rounds up to the full i32 sublane tile (8): Mosaic
    # requires dim-0 slices of the HBM output aligned to the tiling, and
    # sub-tile staging shapes hit masked-op paths (measured 4x slower
    # with 4 planes than 8)
    nplanes = -(-nplanes // 8) * 8
    keep_p = jnp.zeros((npad,), jnp.int32).at[:n].set(
        keep.astype(jnp.int32))
    # pad via concat (NOT zeros().at[].set(planes)): at 125M-row calls
    # the .at[].set form materializes BOTH the stacked planes and the
    # padded copy (~2x plane bytes of HBM peak); concat lets XLA fuse
    # the producers straight into one padded buffer
    planes_p = planes
    if planes_p.shape[1] != npad:
        planes_p = jnp.concatenate(
            [planes_p, jnp.zeros((planes_p.shape[0],
                                  npad - planes_p.shape[1]),
                                 jnp.uint32)], axis=1)
    if planes_p.shape[0] != nplanes:
        planes_p = jnp.concatenate(
            [planes_p, jnp.zeros((nplanes - planes_p.shape[0], npad),
                                 jnp.uint32)], axis=0)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, nplanes=nplanes, nblocks=nblocks),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((_SUB, _LANE), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nplanes, _SUB, _LANE), lambda b: (0, b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((nplanes, out_npad + _BLOCK),
                                           jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.VMEM((nplanes, 2 * _BLOCK), jnp.int32),
                pltpu.VMEM((nplanes, _BLOCK), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(keep_p.reshape(nblocks * _SUB, _LANE),
          planes_p.reshape(nplanes, nblocks * _SUB, _LANE))
    count = jnp.sum(keep_p, dtype=jnp.int32)
    return out[:, :out_npad], count


def compact_planes(keep: jnp.ndarray, planes: jnp.ndarray,
                   out_cap=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack rows where keep, preserving order.

    planes: (P, n) u32 limb planes (bitcast views of the columns being
    filtered).  Returns (compacted (P, m) — rows >= count are garbage —
    and the kept count).  out_cap: optional PROVEN upper bound on the
    kept count; shrinks the output buffer (m = padded cap instead of
    padded n)."""
    out, count = _compact_impl(
        keep, jax.lax.bitcast_convert_type(planes, jnp.uint32)
        if planes.dtype != jnp.uint32 else planes,
        nplanes=planes.shape[0], interpret=interpret_mode(),
        out_cap=out_cap)
    return out[:planes.shape[0]], count


def supported_dtype(d) -> bool:
    """float64/float16 cannot ride this kernel on the axon backend: the
    X64 rewriter implements 64-bit INTEGER bitcasts but not float ones
    (measured; frexp also fails), so f64 bits cannot be viewed as u32
    planes on-device.  Integer/bool/f32 dtypes are fully supported."""
    d = jnp.dtype(d)
    if d == jnp.bool_ or d == jnp.float32:
        return True
    return jnp.issubdtype(d, jnp.integer)


def compact_mask_arrays(keep: jnp.ndarray, arrays: Sequence[jnp.ndarray],
                        out_cap=None
                        ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Compact several same-length arrays by one mask (the
    filter_record_batch shape).  Bool widens to u32 for the ride.
    Returns (compacted arrays, count).  Callers must check
    supported_dtype for every array first."""
    n = keep.shape[0]
    planes = []
    spec = []            # (dtype, nplanes)
    for a in arrays:
        if a.dtype == jnp.bool_:
            planes.append(a.astype(jnp.uint32)[None, :])
            spec.append((jnp.bool_, 1))
            continue
        nbytes = a.dtype.itemsize
        if nbytes < 4:
            planes.append(a.astype(jnp.uint32)[None, :]
                          if jnp.issubdtype(a.dtype, jnp.unsignedinteger)
                          else jax.lax.bitcast_convert_type(
                              a.astype(jnp.int32), jnp.uint32)[None, :])
            spec.append((a.dtype, 1))
            continue
        k = nbytes // 4
        if k == 1:
            planes.append(jax.lax.bitcast_convert_type(
                a, jnp.uint32)[None, :])
        else:
            xu = jax.lax.bitcast_convert_type(a, jnp.uint64)
            planes.append((xu & jnp.uint64(0xFFFFFFFF))
                          .astype(jnp.uint32)[None, :])
            planes.append((xu >> jnp.uint64(32))
                          .astype(jnp.uint32)[None, :])
        spec.append((a.dtype, k))
    stacked = jnp.concatenate(planes, axis=0)
    out, count = compact_planes(keep, stacked, out_cap=out_cap)
    results = []
    base = 0
    for dtype, k in spec:
        part = out[base:base + k]
        base += k
        if dtype == jnp.bool_:
            results.append(part[0] != 0)
        elif k == 1:
            if jnp.issubdtype(dtype, jnp.unsignedinteger) and \
                    dtype.itemsize < 4:
                results.append(part[0].astype(dtype))
            elif dtype.itemsize < 4:
                results.append(jax.lax.bitcast_convert_type(
                    part[0], jnp.int32).astype(dtype))
            else:
                results.append(jax.lax.bitcast_convert_type(
                    jax.lax.bitcast_convert_type(part[0], jnp.uint32),
                    dtype))
        else:
            # arithmetic limb recombine — minor-dim transposes are slow
            # layout changes on TPU (only 8-byte INTEGER dtypes get here)
            lo = jax.lax.bitcast_convert_type(
                part[0], jnp.uint32).astype(jnp.uint64)
            hi = jax.lax.bitcast_convert_type(
                part[1], jnp.uint32).astype(jnp.uint64)
            xu = lo | (hi << jnp.uint64(32))
            if jnp.issubdtype(dtype, jnp.unsignedinteger):
                results.append(xu.astype(dtype))
            else:
                results.append(jax.lax.bitcast_convert_type(xu, dtype))
    return results, count
