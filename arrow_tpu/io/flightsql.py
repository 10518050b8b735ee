"""FlightSQL protocol layer (arrow-flight/src/sql/, 5.1k LoC;
format/FlightSql.proto).

FlightSQL rides ordinary Flight RPC: command messages are protobuf
structs wrapped in google.protobuf.Any and carried in
FlightDescriptor.cmd / Action bodies.  arrow-rs implements the message
layer plus client/server plumbing — the SQL itself is the application's
job.  This module does the same: a hand-rolled protobuf wire codec for
the command messages (the wire format is varint tags + length-delimited
fields; no generated code), a FlightSQLServer that dispatches commands
to a pluggable query handler, and a FlightSQLClient mirroring
sql/client.rs (execute / prepared statements / catalog metadata).

A small default executor handles `SELECT [cols|*] FROM t [WHERE col <op>
literal] [LIMIT n]` over the server's registered tables so the protocol
is usable out of the box; real engines plug their own handler.
"""

from __future__ import annotations

import threading
import uuid as _uuid
from typing import Callable, Dict, Optional, Tuple

from ..core.table import Table
from ..errors import ArrowInvalid


def dt_schema(names, cols):
    from .. import dtypes as _dt
    return _dt.Schema(tuple(_dt.Field(n, c.dtype)
                            for n, c in zip(names, cols)))
from .flight import (FlightDescriptor, FlightInfo, FlightServer,
                     FlightTableClient, DESCRIPTOR_CMD, schema_ipc_bytes)

__all__ = ["FlightSQLServer", "FlightSQLClient", "simple_sql_executor"]

_TYPE_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."


# ---- protobuf wire codec shared with the Flight layer (io/pb.py) ------------

from .pb import (varint as _varint, field as _field,
                 parse_fields as _parse_fields)


def _any_pack(msg_name: str, payload: bytes) -> bytes:
    """google.protobuf.Any{type_url=1, value=2}."""
    return _field(1, (_TYPE_PREFIX + msg_name).encode()) \
        + _field(2, payload)


def _any_unpack(buf: bytes) -> Tuple[str, bytes]:
    f = _parse_fields(buf)
    url = f.get(1, [b""])[0].decode()
    val = f.get(2, [b""])[0]
    return url.rsplit(".", 1)[-1], val


# ---- command messages (FlightSql.proto field numbers) -------------------------

def cmd_statement_query(query: str) -> bytes:
    return _any_pack("CommandStatementQuery", _field(1, query.encode()))


def cmd_prepared_statement_query(handle: bytes) -> bytes:
    return _any_pack("CommandPreparedStatementQuery", _field(1, handle))


def cmd_get_catalogs() -> bytes:
    return _any_pack("CommandGetCatalogs", b"")


def cmd_get_db_schemas() -> bytes:
    return _any_pack("CommandGetDbSchemas", b"")


def cmd_get_tables(include_schema: bool = False) -> bytes:
    body = b""
    if include_schema:
        body += _varint((5 << 3) | 0) + _varint(1)
    return _any_pack("CommandGetTables", body)


def action_create_prepared(query: str) -> bytes:
    return _any_pack("ActionCreatePreparedStatementRequest",
                     _field(1, query.encode()))


def action_close_prepared(handle: bytes) -> bytes:
    return _any_pack("ActionClosePreparedStatementRequest",
                     _field(1, handle))


# ---- default SQL executor ------------------------------------------------------

_OPS = {"=": "eq", "==": "eq", "!=": "neq", "<>": "neq",
        "<": "lt", "<=": "lt_eq", ">": "gt", ">=": "gt_eq"}


def simple_sql_executor(tables: Dict[str, Table], query: str) -> Table:
    """Execute one SELECT against `tables` via the engine's SQL
    frontend (arrow_tpu/sql.py): expressions, AND/OR/NOT, IN/BETWEEN/
    LIKE/IS NULL, JOINs, GROUP BY/HAVING, ORDER BY, LIMIT/OFFSET —
    every clause lowers onto engine kernels.

    The reference ships no SQL engine (sql/server.rs delegates to the
    application); this is that application-side executor."""
    from ..sql import execute_sql
    return execute_sql(tables, query)


# ---- server --------------------------------------------------------------------

class FlightSQLServer(FlightServer):
    """FlightService with FlightSQL command dispatch
    (sql/server.rs FlightSqlService).

    get_flight_info/do_get understand wrapped FlightSQL commands;
    do_action handles prepared-statement lifecycle.  `executor` maps
    (tables, query) -> Table and defaults to simple_sql_executor.
    """

    def __init__(self, location: str = "grpc://0.0.0.0:0",
                 executor: Optional[Callable[[Dict[str, Table], str],
                                             Table]] = None, **kw):
        super().__init__(location, **kw)
        self._executor = executor or simple_sql_executor
        self._prepared: Dict[bytes, str] = {}
        self._plock = threading.Lock()
        self._results: Dict[bytes, Table] = {}   # get_flight_info cache

    # -- command plumbing ------------------------------------------------
    def _run(self, query: str) -> Table:
        return self._executor(dict(self._tables), query)

    def _table_for_cmd(self, cmd: bytes) -> Table:
        name, body = _any_unpack(cmd)
        f = _parse_fields(body)
        if name == "CommandStatementQuery":
            return self._run(f[1][0].decode())
        if name == "CommandPreparedStatementQuery":
            handle = f[1][0]
            with self._plock:
                q = self._prepared.get(handle)
            if q is None:
                raise ArrowInvalid("unknown prepared statement")
            return self._run(q)
        if name == "CommandGetCatalogs":
            from ..core.column import column
            return Table.from_pydict({"catalog_name": column(["default"])})
        if name == "CommandGetDbSchemas":
            from ..core.column import column
            return Table.from_pydict({
                "catalog_name": column(["default"]),
                "db_schema_name": column(["public"])})
        if name == "CommandGetTables":
            from ..core.column import column
            names = sorted(self._tables)
            return Table.from_pydict({
                "catalog_name": column(["default"] * len(names)),
                "db_schema_name": column(["public"] * len(names)),
                "table_name": column(names),
                "table_type": column(["TABLE"] * len(names))})
        raise ArrowInvalid(f"unsupported FlightSQL command {name}")

    # -- Flight hook overrides (native FlightServer surface) ---------------
    def get_flight_info(self, descriptor: FlightDescriptor) -> FlightInfo:
        if descriptor.type == DESCRIPTOR_CMD:
            table = self._table_for_cmd(descriptor.cmd)
            # cache for the ticket fetch: execute() would otherwise run
            # the full query TWICE (FlightInfo then DoGet)
            with self._plock:
                self._results[descriptor.cmd] = table
            return FlightInfo(schema_ipc_bytes(table.schema), descriptor,
                              [(descriptor.cmd, [self.uri])],
                              table.num_rows, -1)
        return super().get_flight_info(descriptor)

    def do_get(self, ticket: bytes):
        if ticket.startswith(b"\n") and _TYPE_PREFIX.encode() in ticket:
            with self._plock:
                cached = self._results.pop(ticket, None)
            yield cached if cached is not None \
                else self._table_for_cmd(ticket)
            return
        yield from super().do_get(ticket)

    def do_action(self, action_type: str, body: bytes):
        if action_type == "CreatePreparedStatement":
            name, inner = _any_unpack(body)
            f = _parse_fields(inner)
            query = f[1][0].decode()
            handle = _uuid.uuid4().bytes
            with self._plock:
                self._prepared[handle] = query
            yield _any_pack("ActionCreatePreparedStatementResult",
                            _field(1, handle))
            return
        if action_type == "ClosePreparedStatement":
            name, inner = _any_unpack(body)
            f = _parse_fields(inner)
            with self._plock:
                self._prepared.pop(f[1][0], None)
            return
        yield from super().do_action(action_type, body)


# ---- client --------------------------------------------------------------------

class FlightSQLClient:
    """FlightSQL client (sql/client.rs): execute / prepared statements /
    catalog metadata over any FlightSQL-speaking server — on the
    engine's own Flight transport."""

    def __init__(self, uri: str):
        self._client = FlightTableClient(uri)

    def _get(self, cmd: bytes) -> Table:
        info = self._client.get_flight_info(
            FlightDescriptor.for_command(cmd))
        ticket = info.endpoints[0][0]
        tables = self._client.do_get_ticket(ticket)
        if len(tables) == 1:
            return tables[0]
        from ..ops.concat import concat_tables
        return concat_tables(tables)

    def execute(self, query: str) -> Table:
        return self._get(cmd_statement_query(query))

    def prepare(self, query: str) -> bytes:
        results = self._client.do_action("CreatePreparedStatement",
                                         action_create_prepared(query))
        name, body = _any_unpack(results[0])
        return _parse_fields(body)[1][0]

    def execute_prepared(self, handle: bytes) -> Table:
        return self._get(cmd_prepared_statement_query(handle))

    def close_prepared(self, handle: bytes) -> None:
        self._client.do_action("ClosePreparedStatement",
                               action_close_prepared(handle))

    def get_catalogs(self) -> Table:
        return self._get(cmd_get_catalogs())

    def get_db_schemas(self) -> Table:
        return self._get(cmd_get_db_schemas())

    def get_tables(self) -> Table:
        return self._get(cmd_get_tables())

    def close(self):
        self._client.close()
