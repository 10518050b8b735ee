"""zip / nullif / shift / union_extract — small selection kernels
(arrow-select/src/{zip.rs,nullif.rs,window.rs,union_extract.rs})."""

from __future__ import annotations

import jax.numpy as jnp

from .. import dtypes as dt
from ..core import validity as vd
from ..core.column import Column, DictionaryColumn, PrimitiveColumn
from ..core.datum import Scalar, as_datum
from ..errors import ArrowInvalid, ArrowTypeError

__all__ = ["zip_", "nullif", "shift", "union_extract"]


def zip_(mask, truthy, falsy) -> Column:
    """Element-wise select: mask ? truthy : falsy (zip.rs:84).
    A null mask slot takes FALSY (zip.rs doc: "Where mask is false or
    NULL, values of falsy are taken").  pyarrow's if_else DIFFERS (null
    mask -> null output); we follow arrow-rs."""
    mask = as_datum(mask)
    truthy, falsy = as_datum(truthy), as_datum(falsy)
    if not mask.dtype.is_boolean:
        raise ArrowTypeError("zip mask must be boolean")
    n = len(mask)

    def parts(x):
        if isinstance(x, Scalar):
            vals = jnp.broadcast_to(x.value, (n,))
            m = None if x.valid else jnp.zeros((n,), jnp.bool_)
            return vals, m, x.dtype
        return x.values, x.validity, x.dtype

    prim = all(isinstance(x, Scalar)
               or isinstance(x, PrimitiveColumn) for x in (truthy, falsy))
    if not prim:
        return _zip_generic(mask, truthy, falsy, n)
    tv, tm, tdt = parts(truthy)
    fv, fm, fdt = parts(falsy)
    if tdt != fdt:
        raise ArrowTypeError(f"zip type mismatch {tdt!r} vs {fdt!r}")
    cond = mask.values if mask.validity is None \
        else jnp.logical_and(mask.values, mask.validity)
    out = jnp.where(cond, tv, fv)
    validity = jnp.where(cond, vd.make_mask(n, tm), vd.make_mask(n, fm))
    return PrimitiveColumn(out, tdt, validity)


def _zip_generic(mask, truthy, falsy, n: int) -> Column:
    """zip over any layout: the reference routes non-primitive zips
    through MutableArrayData (zip.rs fallback); here the equivalent copy
    engine is interleave over [truthy, falsy] pairs."""
    import numpy as np
    from .concat import interleave
    if isinstance(truthy, Scalar) or isinstance(falsy, Scalar):
        raise ArrowTypeError("zip of non-primitive scalars is not "
                             "supported; broadcast to a column first")
    if truthy.dtype != falsy.dtype:
        raise ArrowTypeError(
            f"zip type mismatch {truthy.dtype!r} vs {falsy.dtype!r}")
    if len(truthy) != n or len(falsy) != n:
        raise ArrowInvalid("zip arrays must share the mask's length")
    cond = np.asarray(mask.values, bool)
    if mask.validity is not None:
        cond = cond & np.asarray(mask.validity)   # null mask -> falsy
    pairs = [(0 if cond[i] else 1, i) for i in range(n)]
    return interleave([truthy, falsy], pairs)


def nullif(col: Column, cond) -> Column:
    """Set slots to null where cond is true (nullif.rs:44); null cond slots
    keep the original validity."""
    cond = as_datum(cond)
    if not cond.dtype.is_boolean:
        raise ArrowTypeError("nullif condition must be boolean")
    hit = cond.values
    if cond.validity is not None:
        hit = jnp.logical_and(hit, cond.validity)
    keep = jnp.logical_not(hit)
    return col.with_validity(vd.union(col.validity, keep))


def shift(col: Column, offset: int) -> Column:
    """Window shift with null fill (window.rs:55): positive offset moves
    values toward higher indices, vacated slots become null.  Primitive
    columns shift in one fused roll; other layouts compose
    null-pad + slice + concat exactly like the reference."""
    n = len(col)
    if offset == 0:
        return col
    if not isinstance(col, PrimitiveColumn) or abs(offset) >= n:
        from .cast import _all_null
        from .concat import concat
        k = min(abs(offset), n)
        pad = _all_null(col.dtype, k)
        if k == n:
            return pad
        if offset > 0:
            return concat([pad, col.slice(0, n - k)])
        return concat([col.slice(k, n - k), pad])
    rolled = jnp.roll(col.values, offset)
    idx = jnp.arange(n)
    in_range = (idx >= offset) if offset > 0 else (idx < n + offset)
    validity = vd.make_mask(n, None if col.validity is None
                            else jnp.roll(col.validity, offset))
    validity = jnp.logical_and(validity, in_range)
    return PrimitiveColumn(jnp.where(in_range, rolled,
                                     jnp.zeros_like(rolled)),
                           col.dtype, validity, _canonical=True)


def union_extract(col, field_name: str) -> Column:
    """Extract one union child as a top-level column; rows of other type
    ids become null (union_extract.rs).  Sparse: mask the child directly.
    Dense: gather child rows via the offsets."""
    from ..core.nested import UnionColumn
    if not isinstance(col, UnionColumn):
        raise ArrowTypeError("union_extract expects a union column")
    try:
        i = [f.name for f in col.fields].index(field_name)
    except ValueError:
        raise ArrowInvalid(f"union has no field {field_name!r}")
    tid = col.ids[i]
    selected = col.type_ids == jnp.int8(tid)
    child = col.children[i]
    if len(child) == 0:
        # dense union, no rows of this type: all-null output
        # (union_extract.rs returns new_null_array)
        from .cast import cast as _cast
        from ..core.column import NullColumn
        return _cast(NullColumn(len(col)), child.dtype)
    if col.offsets is None:                       # sparse
        return child.with_validity(
            vd.union(child.validity, selected))
    from .take import take as take_kernel
    safe = jnp.where(selected, col.offsets, jnp.zeros_like(col.offsets))
    out = take_kernel(child, PrimitiveColumn(safe.astype(jnp.int64),
                                             dt.int64))
    return out.with_validity(vd.union(out.validity, selected))
