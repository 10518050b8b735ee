"""FlightSQL DML end-to-end: CREATE / bulk-ingest / INSERT / UPDATE /
DELETE / prepared statements with parameters / cancel — the full
arrow-flight sql/server.rs DoPut surface over the engine's own gRPC
protocol layer (no pyarrow.flight).

Run: python examples/flightsql_dml.py
"""

import numpy as np

import arrow_tpu as at
from arrow_tpu.io.flightsql import (FlightSQLClient, FlightSQLServer,
                                    TABLE_EXISTS_APPEND)


def main():
    srv = FlightSQLServer("grpc://127.0.0.1:0")
    cli = FlightSQLClient(srv.uri)

    # DDL + literal DML through CommandStatementUpdate
    assert cli.execute_update(
        "CREATE TABLE trades (id BIGINT, px DOUBLE)") == 0
    assert cli.execute_update(
        "INSERT INTO trades VALUES (1, 10.5), (2, 11.25)") == 2
    assert cli.execute_update(
        "UPDATE trades SET px = px * 2 WHERE id = 1") == 1

    # bulk ingest: a Table streams through DoPut CommandStatementIngest
    bulk = at.Table.from_pydict({
        "id": at.column(np.arange(10, 1010, dtype=np.int64)),
        "px": at.column(np.linspace(1.0, 2.0, 1000))})
    assert cli.execute_ingest("trades", bulk,
                              if_exists=TABLE_EXISTS_APPEND) == 1000

    # prepared statement with positional parameters, one exec per row
    h = cli.prepare("INSERT INTO trades VALUES (?, ?)")
    params = at.Table.from_pydict({"p0": [2000, 2001],
                                   "p1": [5.0, 6.0]})
    assert cli.execute_prepared_update(h, params) == 2

    n = cli.execute("SELECT COUNT(*) AS n FROM trades").to_pydict()["n"]
    print("rows now:", n[0])
    assert n == [1004]

    # cancel: get the query handle, cancel it, the ticket is dead
    info = cli.get_query_info("SELECT * FROM trades")
    assert cli.cancel_query(info) == 1      # CANCEL_RESULT_CANCELLED

    assert cli.execute_update("DELETE FROM trades WHERE id >= 10") == 1002
    assert cli.execute_update("DROP TABLE trades") == 0
    cli.close()
    srv.shutdown()
    print("flightsql dml example ok")


if __name__ == "__main__":
    main()
