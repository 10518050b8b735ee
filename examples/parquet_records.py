"""Row-oriented parquet records + per-column writer properties.

The parquet/src/record/ API surface (RowIter / typed getters /
to_json_value) over a file written with per-column compression and
encoding overrides (file/properties.rs set_column_* roles).
"""

import io
import json

import arrow_tpu as at
from arrow_tpu.io.parquet_io import WriterProperties, write_parquet
from arrow_tpu.io.records import RowIter


def main(tmpdir="/tmp"):
    t = at.Table.from_pydict({
        "id": [1, 2, 3],
        "name": ["anna", None, "carol"],
        "score": [9.5, 7.25, None],
        "tags": at.column([["a", "b"], [], None],
                          at.dtypes.list_(at.utf8)),
    })
    path = f"{tmpdir}/records_example.parquet"
    write_parquet(path, t, WriterProperties(
        compression="snappy",
        column_properties={"name": {"dictionary_enabled": False},
                           "score": {"encoding": "byte_stream_split"}}))

    rows = list(RowIter.from_file(path))
    assert rows[0].get_long(0) == 1
    assert rows[0].get_string(1) == "anna"
    assert rows[1].get_string(1) is None
    assert rows[0].get_list(3).elements == ["a", "b"]
    print(json.dumps([r.to_json_value() for r in rows], indent=None))


if __name__ == "__main__":
    main()
