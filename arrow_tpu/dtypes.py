"""Logical type system.

TPU-native re-design of the reference's arrow-schema crate
(arrow-schema/src/datatype.rs:97-441): the same logical-type vocabulary, but
each logical type maps onto a *physical device representation* chosen for
XLA/TPU (static shapes, SoA tensors, dense bool validity masks) rather than
the reference's byte-buffer layouts.

Physical mapping summary:
  - fixed-width primitives  -> one jnp array of the matching width
  - Boolean                 -> jnp bool_ array (dense, not bit-packed; the VPU
                               operates on vector lanes, not CPU words)
  - Timestamp/Date/Time/Duration -> integer tensor + unit/tz metadata
  - Utf8/Binary             -> Arrow-layout (offsets int32/int64, data uint8)
                               device tensors, or dictionary-encoded codes
  - Dictionary              -> int code tensor + device-resident value column
  - Decimal128              -> two int64 limb tensors (hi, lo)  [round 2]
  - List/Struct             -> offset tensor + child columns (pytree nesting)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "DataType", "null", "bool_", "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64", "float16", "float32", "float64",
    "utf8", "large_utf8", "binary", "date32", "date64",
    "timestamp", "time32", "time64", "duration", "decimal128",
    "dictionary", "list_", "struct", "fixed_size_list", "map_",
    "Field", "Schema",
]


@dataclass(frozen=True)
class DataType:
    """A logical Arrow data type (cf. arrow-schema/src/datatype.rs:97)."""

    name: str
    # parametric payloads (None when not applicable)
    unit: Optional[str] = None        # 's' | 'ms' | 'us' | 'ns'
    tz: Optional[str] = None          # timestamp timezone
    precision: Optional[int] = None   # decimal precision
    scale: Optional[int] = None       # decimal scale
    index_type: Optional["DataType"] = None   # dictionary key type
    value_type: Optional["DataType"] = None   # dictionary/list value type
    fields: Optional[Tuple["Field", ...]] = None  # struct children
    list_size: Optional[int] = None   # fixed-size list

    # ---- categories ------------------------------------------------------
    @property
    def is_integer(self) -> bool:
        return self.name in _INT_NAMES

    @property
    def is_signed_integer(self) -> bool:
        return self.name in ("int8", "int16", "int32", "int64")

    @property
    def is_unsigned_integer(self) -> bool:
        return self.name in ("uint8", "uint16", "uint32", "uint64")

    @property
    def is_floating(self) -> bool:
        return self.name in ("float16", "float32", "float64")

    @property
    def is_numeric(self) -> bool:
        return self.is_integer or self.is_floating or self.is_decimal

    @property
    def is_decimal(self) -> bool:
        return self.name == "decimal128"

    @property
    def is_temporal(self) -> bool:
        return self.name in ("timestamp", "date32", "date64",
                             "time32", "time64", "duration")

    @property
    def is_boolean(self) -> bool:
        return self.name == "bool"

    @property
    def is_string(self) -> bool:
        return self.name in ("utf8", "large_utf8")

    @property
    def is_binary(self) -> bool:
        return self.name in ("binary", "large_binary")

    @property
    def is_dictionary(self) -> bool:
        return self.name == "dictionary"

    @property
    def is_nested(self) -> bool:
        return self.name in ("list", "large_list", "fixed_size_list",
                             "struct", "map")

    @property
    def is_null(self) -> bool:
        return self.name == "null"

    @property
    def is_primitive(self) -> bool:
        """Fixed-width, single-tensor representable."""
        return (self.is_numeric or self.is_boolean or self.is_temporal) \
            and not self.is_decimal

    # ---- physical mapping -------------------------------------------------
    def to_jax(self):
        """jnp dtype of the physical value tensor for this logical type."""
        m = _JAX_DTYPE.get(self.name)
        if m is not None:
            return m
        if self.name == "timestamp" or self.name == "duration":
            return jnp.int64
        if self.name == "time32":
            return jnp.int32
        if self.name == "time64":
            return jnp.int64
        if self.name == "dictionary":
            return self.index_type.to_jax()
        raise TypeError(f"{self} has no single-tensor physical dtype")

    def to_numpy(self):
        return np.dtype(self.to_jax().__name__ if hasattr(self.to_jax(), "__name__")
                        else self.to_jax())

    @property
    def byte_width(self) -> int:
        return np.dtype(self.to_jax()).itemsize

    @property
    def bit_width(self) -> int:
        if self.name == "bool":
            return 1
        return self.byte_width * 8

    def __repr__(self) -> str:
        if self.name == "timestamp":
            return f"timestamp[{self.unit}{', tz=' + self.tz if self.tz else ''}]"
        if self.name in ("time32", "time64", "duration"):
            return f"{self.name}[{self.unit}]"
        if self.name == "decimal128":
            return f"decimal128({self.precision}, {self.scale})"
        if self.name == "dictionary":
            return f"dictionary<{self.index_type!r}, {self.value_type!r}>"
        if self.name == "list":
            return f"list<{self.value_type!r}>"
        if self.name == "fixed_size_list":
            return f"fixed_size_list<{self.value_type!r}, {self.list_size}>"
        if self.name == "struct":
            inner = ", ".join(f"{f.name}: {f.dtype!r}" for f in self.fields or ())
            return f"struct<{inner}>"
        return self.name


_INT_NAMES = ("int8", "int16", "int32", "int64",
              "uint8", "uint16", "uint32", "uint64")

_JAX_DTYPE = {
    "bool": jnp.bool_,
    "int8": jnp.int8, "int16": jnp.int16, "int32": jnp.int32, "int64": jnp.int64,
    "uint8": jnp.uint8, "uint16": jnp.uint16, "uint32": jnp.uint32,
    "uint64": jnp.uint64,
    "float16": jnp.float16, "float32": jnp.float32, "float64": jnp.float64,
    "date32": jnp.int32, "date64": jnp.int64,
}

# ---- singletons -----------------------------------------------------------
null = DataType("null")
bool_ = DataType("bool")
int8 = DataType("int8")
int16 = DataType("int16")
int32 = DataType("int32")
int64 = DataType("int64")
uint8 = DataType("uint8")
uint16 = DataType("uint16")
uint32 = DataType("uint32")
uint64 = DataType("uint64")
float16 = DataType("float16")
float32 = DataType("float32")
float64 = DataType("float64")
utf8 = DataType("utf8")
large_utf8 = DataType("large_utf8")
binary = DataType("binary")
date32 = DataType("date32")
date64 = DataType("date64")


def timestamp(unit: str = "us", tz: Optional[str] = None) -> DataType:
    assert unit in ("s", "ms", "us", "ns"), unit
    return DataType("timestamp", unit=unit, tz=tz)


def time32(unit: str = "s") -> DataType:
    assert unit in ("s", "ms"), unit
    return DataType("time32", unit=unit)


def time64(unit: str = "us") -> DataType:
    assert unit in ("us", "ns"), unit
    return DataType("time64", unit=unit)


def duration(unit: str = "us") -> DataType:
    assert unit in ("s", "ms", "us", "ns"), unit
    return DataType("duration", unit=unit)


def decimal128(precision: int, scale: int) -> DataType:
    return DataType("decimal128", precision=precision, scale=scale)


def dictionary(index_type: DataType, value_type: DataType) -> DataType:
    assert index_type.is_integer
    return DataType("dictionary", index_type=index_type, value_type=value_type)


def list_(value_type: DataType) -> DataType:
    return DataType("list", value_type=value_type)


def fixed_size_list(value_type: DataType, list_size: int) -> DataType:
    return DataType("fixed_size_list", value_type=value_type,
                    list_size=list_size)


def struct(fields) -> DataType:
    return DataType("struct", fields=tuple(fields))


def map_(key_type: DataType, item_type: DataType) -> DataType:
    kv = struct([Field("key", key_type, nullable=False),
                 Field("value", item_type)])
    return DataType("map", value_type=kv)


# ---- numeric promotion helpers (used by arith kernels & cast) -------------

_RANK = {n: i for i, n in enumerate(
    ("int8", "int16", "int32", "int64"))}
_URANK = {n: i for i, n in enumerate(
    ("uint8", "uint16", "uint32", "uint64"))}
_FRANK = {n: i for i, n in enumerate(("float16", "float32", "float64"))}

INT_MIN = {n: -(2 ** (8 * 2 ** i - 1)) for i, n in enumerate(
    ("int8", "int16", "int32", "int64"))}
INT_MAX = {n: 2 ** (8 * 2 ** i - 1) - 1 for i, n in enumerate(
    ("int8", "int16", "int32", "int64"))}
UINT_MAX = {n: 2 ** (8 * 2 ** i) - 1 for i, n in enumerate(
    ("uint8", "uint16", "uint32", "uint64"))}


def integer_bounds(dt: DataType):
    """(lo, hi) inclusive value bounds of an integer logical type."""
    if dt.is_signed_integer:
        return INT_MIN[dt.name], INT_MAX[dt.name]
    if dt.is_unsigned_integer:
        return 0, UINT_MAX[dt.name]
    raise TypeError(f"not an integer type: {dt}")


# ---- Field / Schema (cf. arrow-schema/src/{field.rs,schema.rs}) ------------

@dataclass(frozen=True)
class Field:
    name: str
    dtype: DataType
    nullable: bool = True
    metadata: Tuple[Tuple[str, str], ...] = ()

    def with_name(self, name: str) -> "Field":
        return dataclasses.replace(self, name=name)

    def with_nullable(self, nullable: bool) -> "Field":
        return dataclasses.replace(self, nullable=nullable)


@dataclass(frozen=True)
class Schema:
    fields: Tuple[Field, ...]
    metadata: Tuple[Tuple[str, str], ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "fields", tuple(self.fields))

    @property
    def names(self):
        return [f.name for f in self.fields]

    def field(self, i) -> Field:
        if isinstance(i, str):
            return self.fields[self.index_of(i)]
        return self.fields[i]

    def index_of(self, name: str) -> int:
        for i, f in enumerate(self.fields):
            if f.name == name:
                return i
        raise KeyError(name)

    def project(self, indices) -> "Schema":
        return Schema(tuple(self.fields[i] for i in indices), self.metadata)

    def __len__(self):
        return len(self.fields)

    def __iter__(self):
        return iter(self.fields)
