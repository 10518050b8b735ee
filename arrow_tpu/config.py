"""Global configuration for the arrow_tpu engine.

This module MUST be imported before any other arrow_tpu module touches JAX:
Arrow semantics require true 64-bit integer / float types (Int64, UInt64,
Float64, Timestamp are first-class in the reference type system,
arrow-schema/src/datatype.rs:99-441), so we enable the x64 flag at import
time.  TPU v5e executes s64/f64 (f64 via software emulation) — measured at
import-check time in round 1 at >2.5 Grows/s elementwise, which is adequate;
hot kernels internally downcast where exactness allows.
"""

from __future__ import annotations

import os

import jax

jax.config.update("jax_enable_x64", True)


def platform() -> str:
    """Primary JAX backend platform ('tpu', 'cpu', ...)."""
    return jax.default_backend()


def on_tpu() -> bool:
    # The axon tunnel reports platform 'tpu' for the real chip.
    return platform() not in ("cpu",)


# Pallas kernels compile only on real TPU; on CPU we run them in interpreter
# mode (slow) or fall back to pure-XLA implementations.  Tests on the virtual
# 8-device CPU mesh use the XLA fallback path by default and opt in per-test
# (env read at call time so monkeypatching works).


def use_pallas() -> bool:
    flag = os.environ.get("ARROW_TPU_USE_PALLAS", "auto")
    if flag == "1":
        return True
    if flag == "0":
        return False
    return on_tpu()
