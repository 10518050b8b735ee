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


# ---------------------------------------------------------------------------
# round 3: GetSqlInfo / keys / xdbc / transactions
# (arrow-flight/src/sql/mod.rs:251-280 command set)
# ---------------------------------------------------------------------------

def _server_client():
    import numpy as np
    from arrow_tpu.core.table import Table
    from arrow_tpu.io.flightsql import FlightSQLServer, FlightSQLClient
    t = Table.from_pydict({"id": np.arange(5), "v": np.arange(5) * 2.0})
    srv = FlightSQLServer("grpc://127.0.0.1:0")
    srv.register("t", t)
    cli = FlightSQLClient(srv.uri)
    return srv, cli


def test_get_sql_info_all_and_filtered():
    from arrow_tpu.io import flightsql as fs
    srv, cli = _server_client()
    try:
        info = cli.get_sql_info()
        names = info.columns[0].to_pylist()
        assert fs.SQL_INFO_SERVER_NAME in names
        assert info.schema.fields[0].name == "info_name"
        assert info.schema.fields[1].dtype.name == "union"
        # dense union arms round-trip through native Flight IPC
        vals = info.columns[1].to_pylist()
        by_id = dict(zip(names, vals))
        assert by_id[fs.SQL_INFO_SERVER_NAME] == "arrow_tpu"
        assert by_id[fs.SQL_INFO_SERVER_READ_ONLY] is True
        assert by_id[fs.SQL_INFO_SERVER_TRANSACTION] == 1
        assert "SELECT" in by_id[fs.SQL_INFO_KEYWORDS]
        conv = by_id[fs.SQL_INFO_SUPPORTS_CONVERT]
        assert dict(conv)[7] == [7, 10]
        # filtered request returns only the asked ids
        one = cli.get_sql_info([fs.SQL_INFO_SERVER_NAME])
        assert one.columns[0].to_pylist() == [fs.SQL_INFO_SERVER_NAME]
    finally:
        cli.close()
        srv.shutdown()


def test_primary_and_foreign_keys():
    srv, cli = _server_client()
    try:
        srv.register_primary_key("t", ["id"], key_name="pk_t")
        srv.register_foreign_key("t", "orders", [("id", "t_id")])
        pk = cli.get_primary_keys("t")
        assert pk.num_rows == 1
        row = {f.name: c.to_pylist()[0]
               for f, c in zip(pk.schema.fields, pk.columns)}
        assert row["table_name"] == "t" and row["column_name"] == "id"
        assert row["key_sequence"] == 1 and row["key_name"] == "pk_t"
        # exported keys of t = FKs pointing at t
        exp = cli.get_exported_keys("t")
        assert exp.num_rows == 1
        erow = {f.name: c.to_pylist()[0]
                for f, c in zip(exp.schema.fields, exp.columns)}
        assert erow["pk_table_name"] == "t"
        assert erow["fk_table_name"] == "orders"
        assert erow["update_rule"] == 3
        # imported keys of orders = same edge seen from the FK side
        imp = cli.get_imported_keys("orders")
        assert imp.num_rows == 1
        # cross reference pk=t fk=orders
        xr = cli.get_cross_reference("t", "orders")
        assert xr.num_rows == 1
        # unknown table: empty but well-formed (13-column schema)
        empty = cli.get_exported_keys("nope")
        assert empty.num_rows == 0 and len(empty.schema.fields) == 13
        # schema matches the spec'd field list exactly
        assert [f.name for f in empty.schema.fields] == [
            "pk_catalog_name", "pk_db_schema_name", "pk_table_name",
            "pk_column_name", "fk_catalog_name", "fk_db_schema_name",
            "fk_table_name", "fk_column_name", "key_sequence",
            "fk_key_name", "pk_key_name", "update_rule", "delete_rule"]
    finally:
        cli.close()
        srv.shutdown()


def test_xdbc_type_info_and_table_types():
    srv, cli = _server_client()
    try:
        ti = cli.get_xdbc_type_info()
        assert ti.num_rows >= 6
        names = [f.name for f in ti.schema.fields]
        assert names[:2] == ["type_name", "data_type"]
        assert "create_params" in names and len(names) == 19
        # filter by ODBC code (negative code exercises int32 wire enc)
        big = cli.get_xdbc_type_info(-5)
        assert big.num_rows == 1
        assert big.columns[0].to_pylist() == ["BIGINT"]
        tt = cli.get_table_types()
        assert tt.columns[0].to_pylist() == ["TABLE"]
    finally:
        cli.close()
        srv.shutdown()


def test_transactions_begin_commit_rollback():
    import pytest
    from arrow_tpu.errors import ArrowInvalid
    srv, cli = _server_client()
    try:
        tid = cli.begin_transaction()
        assert len(tid) == 16
        cli.commit(tid)
        # double-commit: unknown id now
        with pytest.raises(Exception):
            cli.commit(tid)
        tid2 = cli.begin_transaction()
        cli.rollback(tid2)
        with pytest.raises(Exception):
            cli.rollback(tid2)
    finally:
        cli.close()
        srv.shutdown()


# ---- DML / bulk-ingest / cancel (sql/server.rs:399,410,553) ----------------

def test_execute_update_insert_update_delete(server):
    cli = FlightSQLClient(server.uri)
    assert cli.execute_update(
        "INSERT INTO trades VALUES (10, 99.5), (11, 1.25)") == 2
    assert cli.execute("SELECT id FROM trades WHERE id >= 10") \
        .to_pydict() == {"id": [10, 11]}
    assert cli.execute_update(
        "UPDATE trades SET px = px * 2 WHERE id = 10") == 1
    assert cli.execute("SELECT px FROM trades WHERE id = 10") \
        .to_pydict() == {"px": [199.0]}
    assert cli.execute_update("DELETE FROM trades WHERE id >= 10") == 2
    assert cli.execute("SELECT COUNT(*) AS n FROM trades") \
        .to_pydict()["n"] == [10]
    cli.close()


def test_execute_update_ddl_and_transaction(server):
    cli = FlightSQLClient(server.uri)
    assert cli.execute_update(
        "CREATE TABLE scratch (k INT, v VARCHAR)") == 0
    assert "scratch" in cli.get_tables().to_pydict()["table_name"]
    tid = cli.begin_transaction()
    assert cli.execute_update(
        "INSERT INTO scratch VALUES (1, 'a')", transaction_id=tid) == 1
    cli.commit(tid)
    with pytest.raises(Exception):      # unknown transaction id
        cli.execute_update("DELETE FROM scratch",
                           transaction_id=b"bogus-txn-id....")
    assert cli.execute_update("DROP TABLE scratch") == 0
    assert "scratch" not in cli.get_tables().to_pydict()["table_name"]
    cli.close()


def test_prepared_statement_update_with_params(server):
    cli = FlightSQLClient(server.uri)
    h = cli.prepare("INSERT INTO trades VALUES (?, ?)")
    params = at.Table.from_pydict({"p0": [20, 21, 22],
                                   "p1": [1.0, 2.0, 3.0]})
    assert cli.execute_prepared_update(h, params) == 3
    got = cli.execute("SELECT id, px FROM trades WHERE id >= 20")
    assert got.to_pydict() == {"id": [20, 21, 22],
                               "px": [1.0, 2.0, 3.0]}
    # no-param update through the same path
    h2 = cli.prepare("DELETE FROM trades WHERE id >= 20")
    assert cli.execute_prepared_update(h2) == 3
    cli.close()


def test_bind_prepared_query_params(server):
    cli = FlightSQLClient(server.uri)
    h = cli.prepare("SELECT px FROM trades WHERE id = ?")
    h = cli.bind_prepared(h, at.Table.from_pydict({"p0": [4]}))
    assert cli.execute_prepared(h).to_pydict() == {"px": [6.0]}
    cli.close()


def test_statement_ingest(server):
    from arrow_tpu.io.flightsql import (TABLE_EXISTS_APPEND,
                                        TABLE_EXISTS_FAIL,
                                        TABLE_EXISTS_REPLACE,
                                        TABLE_NOT_EXIST_FAIL)
    cli = FlightSQLClient(server.uri)
    data = at.Table.from_pydict({
        "k": at.column(np.arange(1000, dtype=np.int64)),
        "s": at.column(["v%d" % (i % 7) for i in range(1000)])})
    # create on missing
    assert cli.execute_ingest("bulk", data) == 1000
    assert cli.execute("SELECT COUNT(*) AS n FROM bulk") \
        .to_pydict()["n"] == [1000]
    # FAIL on existing
    with pytest.raises(Exception):
        cli.execute_ingest("bulk", data, if_exists=TABLE_EXISTS_FAIL)
    # append doubles it (multi-table stream too)
    assert cli.execute_ingest("bulk", [data.slice(0, 500),
                                       data.slice(500, 500)],
                              if_exists=TABLE_EXISTS_APPEND) == 1000
    assert cli.execute("SELECT COUNT(*) AS n FROM bulk") \
        .to_pydict()["n"] == [2000]
    # replace resets
    assert cli.execute_ingest("bulk", data.slice(0, 10),
                              if_exists=TABLE_EXISTS_REPLACE) == 10
    assert cli.execute("SELECT COUNT(*) AS n FROM bulk") \
        .to_pydict()["n"] == [10]
    # schema mismatch on append raises
    bad = at.Table.from_pydict({"k": [1.5], "s": ["x"]})
    with pytest.raises(Exception):
        cli.execute_ingest("bulk", bad, if_exists=TABLE_EXISTS_APPEND)
    # FAIL on missing target
    with pytest.raises(Exception):
        cli.execute_ingest("nope", data,
                           if_not_exist=TABLE_NOT_EXIST_FAIL)
    cli.close()


def test_cancel_query(server):
    cli = FlightSQLClient(server.uri)
    info = cli.get_query_info("SELECT id FROM trades")
    assert cli.cancel_query(info) == 1      # CANCEL_RESULT_CANCELLED
    # the ticket is dead now: fetching it errors
    with pytest.raises(Exception):
        cli._client.do_get_ticket(info.endpoints[0][0])
    cli.close()


def test_substrait_plan_command(server):
    """CommandStatementSubstraitPlan rides the protocol end-to-end; the
    plan executor is pluggable (the reference delegates execution to
    the application, sql/server.rs do_get_statement)."""
    from arrow_tpu.io.flightsql import FlightSQLServer
    import arrow_tpu as at

    # default server: honest not-implemented
    cli = FlightSQLClient(server.uri)
    with pytest.raises(Exception):
        cli.execute_substrait(b"\x01\x02plan")
    cli.close()

    def toy_substrait(tables, plan, version):
        # toy executor: the 'plan' is a SQL string (tests the wire
        # plumbing; real engines plug a substrait consumer here)
        assert version == "0.52.0"
        from arrow_tpu.sql import execute_sql
        return execute_sql(tables, plan.decode())

    srv2 = FlightSQLServer("grpc://127.0.0.1:0",
                           substrait_executor=toy_substrait)
    srv2.register("t", at.Table.from_pydict({"a": [1, 2, 3]}))
    cli2 = FlightSQLClient(srv2.uri)
    got = cli2.execute_substrait(b"SELECT a FROM t WHERE a > 1",
                                 version="0.52.0")
    assert got.to_pydict() == {"a": [2, 3]}
    cli2.close()
    srv2.shutdown()


def test_get_tables_filters_and_schema(server):
    """CommandGetTables filter patterns / table_types / include_schema
    and CommandGetDbSchemas pattern (the reference's metadata filter
    contract)."""
    server.register("orders", at.Table.from_pydict({"o": [1]}))
    cli = FlightSQLClient(server.uri)
    got = cli.get_tables(table_name_filter_pattern="tra%")
    assert got.to_pydict()["table_name"] == ["trades"]
    got = cli.get_tables(table_name_filter_pattern="_rders")
    assert got.to_pydict()["table_name"] == ["orders"]
    assert cli.get_tables(table_types=["VIEW"]).num_rows == 0
    got = cli.get_tables(include_schema=True)
    d = got.to_pydict()
    assert "table_schema" in d and len(d["table_schema"]) == 2
    # the embedded bytes ARE an IPC schema message
    from arrow_tpu.io.flight import schema_ipc_bytes
    i = d["table_name"].index("trades")
    assert d["table_schema"][i] == schema_ipc_bytes(
        server._tables["trades"].schema)
    assert cli.get_db_schemas(db_schema_filter_pattern="pub%") \
        .to_pydict()["db_schema_name"] == ["public"]
    assert cli.get_db_schemas(db_schema_filter_pattern="nope%") \
        .num_rows == 0
    cli.close()


def test_concurrent_updates_serialize(server):
    """DML read-modify-write cycles serialize: N concurrent INSERTs
    through separate clients must all land (no lost updates)."""
    import threading
    errs = []

    def one(i):
        try:
            c = FlightSQLClient(server.uri)
            assert c.execute_update(
                f"INSERT INTO trades VALUES ({100 + i}, 1.0)") == 1
            c.close()
        except Exception as e:         # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=one, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    cli = FlightSQLClient(server.uri)
    got = cli.execute("SELECT COUNT(*) AS n FROM trades "
                      "WHERE id >= 100").to_pydict()
    assert got["n"] == [8]
    cli.close()
