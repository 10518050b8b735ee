"""Nested struct data + runtime type dispatch
(arrow/examples/dynamic_types.rs): build a table with a struct column,
then process it by inspecting dtypes dynamically."""

import arrow_tpu as at
from arrow_tpu import dtypes as dt
from arrow_tpu.core.nested import StructColumn
from arrow_tpu.core.table import Table
from arrow_tpu.utils.display import pretty_format_table


def main():
    ids = at.column([1, 2, 3, 4, 5], dt.int32)
    nested = StructColumn(
        (at.column(["a", "b", "c", "d", "e"], dt.utf8),
         at.column([1.1, 2.2, 3.3, 4.4, 5.5], dt.float64),
         at.column([2.2, 3.3, 4.4, 5.5, 6.6], dt.float64)),
        (dt.Field("a", dt.utf8, False),
         dt.Field("b", dt.float64, False),
         dt.Field("c", dt.float64, False)))
    t = Table((ids, nested),
              dt.Schema((dt.Field("id", dt.int32, False),
                         dt.Field("nested", nested.dtype, False))))
    print(pretty_format_table(t))

    # dynamic dispatch: walk the schema, process by dtype name
    for field, col in zip(t.schema.fields, t.columns):
        if field.dtype.name == "struct":
            b, c = col.children[1], col.children[2]
            product = at.compute.mul(b, c)
            print(f"{field.name}.b * {field.name}.c =",
                  product.to_pylist())


if __name__ == "__main__":
    main()
