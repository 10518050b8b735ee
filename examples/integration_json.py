"""Cross-implementation golden data via the integration JSON format.

The arrow-integration-test role: dump a table as the Archery JSON
test-data document, rebuild it, and round-trip through a native IPC
file exactly (the arrow-json-integration-test VALIDATE mode).
"""

import json

import arrow_tpu as at
from arrow_tpu.io import integration_json as ij


def main(tmpdir="/tmp"):
    t = at.Table.from_pydict({
        "x": [1, None, 3],
        "s": ["alpha", "beta", None],
        "d": at.compute.dictionary_encode(at.column(["hi", "hi", "lo"])),
    })
    doc = ij.table_to_json(t)
    print(json.dumps(doc["schema"]["fields"][2]))     # dictionary field

    back = ij.table_from_json(json.loads(json.dumps(doc)))
    assert back.to_pydict() == t.to_pydict()

    jp, ap = f"{tmpdir}/ij_example.json", f"{tmpdir}/ij_example.arrow"
    ij.write_json_file(jp, t)
    ij.json_to_arrow(jp, ap)
    assert ij.validate(ap, jp)
    print("VALIDATE ok")


if __name__ == "__main__":
    main()
