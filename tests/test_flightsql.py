"""FlightSQL protocol tests with an in-process gRPC server — the same
mock-server pattern the reference uses for its 'multi-node' coverage
(arrow-flight/tests/common/server.rs)."""

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.io.flightsql import (FlightSQLServer, FlightSQLClient,
                                    simple_sql_executor)


@pytest.fixture
def server():
    srv = FlightSQLServer("grpc://127.0.0.1:0")
    srv.register("trades", at.Table.from_pydict({
        "id": at.column(np.arange(10, dtype=np.int64)),
        "px": at.column(np.arange(10, dtype=np.float64) * 1.5),
    }))
    yield srv
    srv.shutdown()


def test_execute_query(server):
    cli = FlightSQLClient(server.uri)
    t = cli.execute("SELECT id, px FROM trades WHERE id >= 7")
    assert t.to_pydict() == {"id": [7, 8, 9], "px": [10.5, 12.0, 13.5]}
    cli.close()


def test_execute_star_limit(server):
    cli = FlightSQLClient(server.uri)
    t = cli.execute("select * from trades limit 3")
    assert t.num_rows == 3 and t.column_names == ["id", "px"]
    cli.close()


def test_prepared_statement_lifecycle(server):
    cli = FlightSQLClient(server.uri)
    h = cli.prepare("SELECT id FROM trades WHERE id = 4")
    t = cli.execute_prepared(h)
    assert t.to_pydict() == {"id": [4]}
    cli.close_prepared(h)
    with pytest.raises(Exception):
        cli.execute_prepared(h)
    cli.close()


def test_catalog_metadata(server):
    cli = FlightSQLClient(server.uri)
    assert cli.get_catalogs().to_pydict()["catalog_name"] == ["default"]
    tables = cli.get_tables().to_pydict()
    assert tables["table_name"] == ["trades"]
    assert tables["table_type"] == ["TABLE"]
    cli.close()


def test_simple_executor_errors():
    with pytest.raises(Exception):
        simple_sql_executor({}, "DROP TABLE x")
    with pytest.raises(Exception):
        simple_sql_executor({}, "SELECT * FROM missing")
