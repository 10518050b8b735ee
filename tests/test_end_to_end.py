"""One user journey across the whole stack: CSV -> SQL -> encrypted
parquet -> IPC -> C Data Interface -> Flight.  Every hop uses the
engine's own native path; pyarrow appears only as a cross-check."""

import io

import numpy as np
import pyarrow as pa

import arrow_tpu as at


def test_full_stack_journey(tmp_path):
    # 1. native CSV parse (typed inference)
    rows = ["id,cust,amount,tag"]
    rng = np.random.default_rng(5)
    custs = rng.integers(1, 6, 300)
    amounts = rng.random(300) * 100
    for i in range(300):
        rows.append(f"{i},{custs[i]},{amounts[i]:.4f},t{i % 9}")
    csv_text = "\n".join(rows) + "\n"
    from arrow_tpu.io.csv import read_csv
    t = read_csv(io.BytesIO(csv_text.encode()))
    assert t.num_rows == 300

    # 2. SQL over engine kernels
    from arrow_tpu.sql import execute_sql
    agg = execute_sql(
        {"orders": t},
        "SELECT cust, COUNT(*) AS n, SUM(amount) AS total "
        "FROM orders WHERE amount > 10 GROUP BY cust ORDER BY cust")
    exp_mask = amounts > 10
    exp = {}
    for c, a in zip(custs[exp_mask], amounts[exp_mask]):
        n, s = exp.get(int(c), (0, 0.0))
        exp[int(c)] = (n + 1, s + round(float(a), 4))
    got = agg.to_pydict()
    assert got["cust"] == sorted(exp)
    assert got["n"] == [exp[c][0] for c in sorted(exp)]
    for g, (_, s) in zip(got["total"], [exp[c] for c in sorted(exp)]):
        assert abs(g - s) < 1e-6

    # 3. encrypted parquet with page index, native both ways
    from arrow_tpu.io.parquet_crypto import (FileDecryptionProperties,
                                             FileEncryptionProperties)
    from arrow_tpu.io.parquet_io import (WriterProperties, read_parquet,
                                         write_parquet)
    p = str(tmp_path / "agg.parquet")
    fk = b"sixteen byte key"
    write_parquet(p, agg, WriterProperties(
        write_page_index=True, data_page_version="2.0",
        encryption=FileEncryptionProperties(footer_key=fk)))
    back = read_parquet(p, decryption=FileDecryptionProperties(
        footer_key=fk))
    assert back.to_pydict() == got

    # 4. native IPC stream round-trip
    from arrow_tpu.io.ipc import read_stream, write_stream
    buf = io.BytesIO()
    write_stream(buf, [back], compression="zstd")
    [ipc_back] = read_stream(io.BytesIO(buf.getvalue()))
    assert ipc_back.to_pydict() == got

    # 5. C data interface: engine -> pyarrow without conversion code
    rb = pa.record_batch(ipc_back)
    assert rb["total"].to_pylist() == got["total"]

    # 6. Flight: serve and fetch over real gRPC
    from arrow_tpu.io.flight import FlightServer, FlightTableClient
    srv = FlightServer()
    try:
        srv.register("agg", ipc_back)
        cli = FlightTableClient(srv.uri)
        flight_back = cli.do_get("agg")
        assert flight_back.to_pydict() == got
        cli.close()
    finally:
        srv.shutdown()
