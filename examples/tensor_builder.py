"""Tensor type (arrow/examples/tensor_builder.rs): dense n-dimensional
values alongside the columnar data; converts to/from pyarrow.Tensor."""

import jax.numpy as jnp

from arrow_tpu import Tensor


def main():
    t = Tensor(jnp.arange(24, dtype=jnp.int32).reshape(2, 3, 4),
               dim_names=("batch", "row", "col"))
    print(t)
    print("shape:", t.shape, "strides:", t.strides,
          "row-major:", t.is_row_major())
    pa_t = t.to_pyarrow()
    back = Tensor.from_pyarrow(pa_t)
    print("pyarrow round-trip equal:",
          bool((back.data == t.data).all()))


if __name__ == "__main__":
    main()
