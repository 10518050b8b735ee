"""Print the arrow_tpu version and backend
(arrow/examples/version.rs)."""

import jax

import arrow_tpu as at


def main():
    print("arrow_tpu", at.__version__, "on", jax.default_backend(),
          f"({jax.device_count()} device(s))")


if __name__ == "__main__":
    main()
