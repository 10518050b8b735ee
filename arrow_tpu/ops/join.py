"""Hash join (inner/left/semi/anti).

Not present in the reference (SURVEY.md §2: arrow-rs delegates joins to
query engines); BASELINE config-5 requires it.  TPU-native plan — a
sort-probe join on order-preserving keys, every stage a dense vector
kernel:

  build:  encode build keys -> u64, stable-sort them (one-time cost)
  probe:  encode probe keys -> u64, binary-search each probe key against
          the sorted build keys (vectorized searchsorted: log2(B) rounds of
          dense gathers — the TPU analogue of a hash-table lookup, with no
          pointer chasing and no collisions)
  expand: match counts -> exclusive scan -> flat (probe_idx, build_idx)
          pair expansion (output size is data-dependent: one host sync)

Multi-column keys combine per-column u64 keys through a 64-bit mixer; a
post-verification compare removes mixer collisions, preserving exactness.

SQL null semantics: NULL keys match nothing (inner/semi); left-join rows
with NULL keys emit the null-extended row.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..core import validity as vd
from ..core.column import Column, PrimitiveColumn
from ..core.table import Table
from ..errors import ArrowInvalid
from .row_format import encode_value_key
from .take import take as take_kernel

__all__ = ["join", "join_indices"]

_MIX = jnp.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio constant


def _mix64(x: jnp.ndarray) -> jnp.ndarray:
    x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return x ^ (x >> jnp.uint64(31))


def _co_encode(lcol: Column, rcol: Column):
    """Order keys for one key-column pair, in a SHARED domain.

    Primitive keys use the global order-preserving transform (consistent
    across tables by construction).  String/dictionary keys have
    batch-local dictionary ranks, so both sides re-rank against the merged
    distinct-value set (the same trick as ops.strings._compare_cols)."""
    from ..core.column import DictionaryColumn, StringColumn
    stringy = isinstance(lcol, (StringColumn, DictionaryColumn)) or \
        isinstance(rcol, (StringColumn, DictionaryColumn))
    if not stringy:
        lk, lv = encode_value_key(lcol)
        rk, rv = encode_value_key(rcol)
        return lk, lv, rk, rv
    from .strings import _as_dict, _dict_values_host, _effective_validity
    dl, dr = _as_dict(lcol), _as_dict(rcol)
    lvals, rvals = _dict_values_host(dl), _dict_values_host(dr)
    uniq = sorted({v for v in lvals + rvals if v is not None})
    rank = {v: i for i, v in enumerate(uniq)}
    lrank = np.array([rank.get(v, 0) for v in lvals], np.uint64)
    rrank = np.array([rank.get(v, 0) for v in rvals], np.uint64)
    lk = jnp.take(jnp.asarray(lrank), dl.codes, mode="clip")
    rk = jnp.take(jnp.asarray(rrank), dr.codes, mode="clip")
    return lk, _effective_validity(dl, lvals), \
        rk, _effective_validity(dr, rvals)


def combined_keys(lcols: Sequence[Column], rcols: Sequence[Column]):
    """(lkey, lvalid, rkey, rvalid) u64 row keys over both tables' key
    columns, in a shared domain.  Single column: exact (collision-free).
    Multi-column: mixed hash (collisions possible -> callers post-verify)."""
    lkeys, rkeys = [], []
    lvalid: vd.Mask = None
    rvalid: vd.Mask = None
    for lc, rc in zip(lcols, rcols):
        lk, lv, rk, rv = _co_encode(lc, rc)
        lkeys.append(lk)
        rkeys.append(rk)
        lvalid = vd.union(lvalid, lv)
        rvalid = vd.union(rvalid, rv)

    def fold(keys):
        if len(keys) == 1:
            return keys[0]
        key = jnp.zeros_like(keys[0])
        for k in keys:
            key = _mix64(key ^ (k + _MIX + (key << jnp.uint64(6))
                                + (key >> jnp.uint64(2))))
        return key

    lkey, rkey = fold(lkeys), fold(rkeys)
    return (lkey, vd.make_mask(lkey.shape[0], lvalid),
            rkey, vd.make_mask(rkey.shape[0], rvalid),
            lkeys, rkeys)


import functools


@functools.partial(jax.jit, static_argnames=("multi",))
def _probe_stage(lkey, lvalid, rkey, rvalid, multi):
    """Device half of the hash join, one XLA program: sort the build
    side, binary-search every probe key, mask NULL probes (eager per-op
    dispatch through the remote-TPU tunnel costs ~100x the kernels)."""
    r_order = jnp.argsort(rkey, stable=True)
    r_sorted = rkey[r_order]
    rvalid_sorted = rvalid[r_order]
    lo = jnp.searchsorted(r_sorted, lkey, side="left")
    hi = jnp.searchsorted(r_sorted, lkey, side="right")
    counts = (hi - lo).astype(jnp.int64)
    counts = jnp.where(lvalid, counts, 0)  # NULL probe matches nothing
    return lo, counts, r_order, rvalid_sorted


def join_indices(left: Table, right: Table, on: Sequence[str],
                 how: str = "inner",
                 right_on: Optional[Sequence[str]] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Compute (left_indices, right_indices) row pairs; -1 marks the null-
    extended side (left joins)."""
    right_on = right_on or on
    lkey, lvalid, rkey, rvalid, lkeys, rkeys = combined_keys(
        [left.column(c) for c in on],
        [right.column(c) for c in right_on])
    multi = len(on) > 1

    lo, counts, r_order, rvalid_sorted = _probe_stage(
        lkey, lvalid, rkey, rvalid, multi)

    counts_np = np.asarray(counts)
    lo_np = np.asarray(lo)
    order_np = np.asarray(r_order)
    rvalid_sorted_np = np.asarray(rvalid_sorted)

    # expansion (host offsets; the gathers stay on device via take)
    probe_idx = np.repeat(np.arange(len(counts_np)), counts_np)
    within = np.arange(counts_np.sum(), dtype=np.int64) - \
        np.repeat(np.cumsum(counts_np) - counts_np, counts_np)
    build_pos = lo_np[probe_idx] + within
    build_idx = order_np[build_pos]
    # drop NULL build entries (equal sentinel keys must not match)
    keep = rvalid_sorted_np[build_pos]
    probe_idx, build_idx = probe_idx[keep], build_idx[keep]

    if multi:
        # verify against mixer collisions with exact per-column compare
        ok = np.ones(len(probe_idx), bool)
        for lk, rk in zip(lkeys, rkeys):
            ok &= np.asarray(lk)[probe_idx] == np.asarray(rk)[build_idx]
        probe_idx, build_idx = probe_idx[ok], build_idx[ok]

    if how == "inner":
        return probe_idx, build_idx
    if how == "semi":
        mask = np.zeros(left.num_rows, bool)
        mask[probe_idx] = True
        idx = np.nonzero(mask)[0]
        return idx, np.full(len(idx), -1)
    if how == "anti":
        mask = np.ones(left.num_rows, bool)
        mask[probe_idx] = False
        idx = np.nonzero(mask)[0]
        return idx, np.full(len(idx), -1)
    if how == "left":
        matched = np.zeros(left.num_rows, bool)
        matched[probe_idx] = True
        unmatched = np.nonzero(~matched)[0]
        li = np.concatenate([probe_idx, unmatched])
        ri = np.concatenate([build_idx, np.full(len(unmatched), -1)])
        order = np.argsort(li, kind="stable")
        return li[order], ri[order]
    raise ArrowInvalid(f"unknown join type {how}")


def join(left: Table, right: Table, on: Sequence[str], how: str = "inner",
         right_on: Optional[Sequence[str]] = None,
         suffix: str = "_right") -> Table:
    """Join two tables; output = left columns + right non-key columns
    (keys taken from the left side, SQL USING semantics)."""
    right_on_l = list(right_on or on)
    li, ri = join_indices(left, right, on, how, right_on)
    l_idx = PrimitiveColumn(jnp.asarray(li), dt.int64)
    cols: List[Column] = [take_kernel(c, l_idx) for c in left.columns]
    fields = list(left.schema.fields)
    if how in ("semi", "anti"):
        return Table(tuple(cols), dt.Schema(tuple(fields)), _validated=True)

    null_ext = (ri < 0)
    r_idx = PrimitiveColumn(jnp.asarray(np.where(null_ext, 0, ri)), dt.int64,
                            None if not null_ext.any()
                            else jnp.asarray(~null_ext))
    taken_names = set(left.schema.names)
    for f, c in zip(right.schema.fields, right.columns):
        if f.name in right_on_l:
            continue
        name = f.name if f.name not in taken_names else f.name + suffix
        cols.append(take_kernel(c, r_idx))
        fields.append(dt.Field(name, f.dtype, nullable=True))
    return Table(tuple(cols), dt.Schema(tuple(fields)), _validated=True)
