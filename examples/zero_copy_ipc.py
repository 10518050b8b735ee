"""IPC file write + zero-copy read (arrow/examples/zero_copy_ipc.rs):
the native decoder (io/ipc.py) slices column buffers directly out of an
mmapped body — byte ranges become device uploads with no intermediate
Python copies."""

import mmap
import tempfile

import arrow_tpu as at
from arrow_tpu.io import ipc
from arrow_tpu.utils.display import pretty_format_table


def main():
    t = at.Table.from_pydict({
        "id": list(range(10)),
        "name": [f"row-{i}" for i in range(10)],
    })
    with tempfile.NamedTemporaryFile(suffix=".arrow",
                                     delete=False) as f:
        path = f.name
    ipc.write_file(path, [t, t.slice(0, 5)])

    # memory-map the file; the decoder reads from the mapped region
    with open(path, "rb") as f:
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as mm:
            batches = ipc.read_file(memoryview(mm))
            print(f"{len(batches)} batches")
            print(pretty_format_table(batches[1]))


if __name__ == "__main__":
    main()
