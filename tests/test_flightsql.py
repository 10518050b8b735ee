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


def test_sql_executor_aggregates_and_order():
    """Demo executor grammar: aggregates, GROUP BY, ORDER BY, rejection
    of anything beyond the documented subset."""
    import numpy as np
    from arrow_tpu.io.flightsql import simple_sql_executor
    from arrow_tpu.errors import ArrowInvalid
    t = at.Table.from_pydict({
        "k": [1, 2, 1, 2, 1],
        "v": np.array([10, 20, 30, 40, 50], np.int64),
    })
    tables = {"t": t}
    r = simple_sql_executor(tables, "SELECT COUNT(*) FROM t")
    assert r.to_pydict()["count"] == [5]
    r = simple_sql_executor(tables, "SELECT SUM(v), MAX(v) FROM t")
    assert r.column("v_sum").to_pylist() == [150]
    assert r.column("v_max").to_pylist() == [50]
    r = simple_sql_executor(tables,
                            "SELECT k, SUM(v) FROM t GROUP BY k")
    got = dict(zip(r.column("k").to_pylist(),
                   r.column("v_sum").to_pylist()))
    assert got == {1: 90, 2: 60}
    r = simple_sql_executor(tables,
                            "SELECT v FROM t ORDER BY v DESC LIMIT 2")
    assert r.column("v").to_pylist() == [50, 40]
    r = simple_sql_executor(tables,
                            "SELECT AVG(v) FROM t WHERE k = 1")
    assert r.column("v_avg").to_pylist() == [30.0]
    with pytest.raises(ArrowInvalid):
        simple_sql_executor(tables, "SELECT * FROM t JOIN u ON t.x = u.x")
    with pytest.raises(ArrowInvalid):
        simple_sql_executor(tables, "DELETE FROM t")
