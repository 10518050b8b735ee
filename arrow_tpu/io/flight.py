"""Flight RPC ingress/egress (the arrow-flight role).

The reference's arrow-flight is the wire between processes (SURVEY.md §3.4);
in this engine intra-mesh exchange is in-program collectives
(arrow_tpu.parallel), and Flight remains exactly what the survey prescribes:
the HOST boundary — feeding device tables to/from external processes over
gRPC with IPC-framed payloads split near the ~2MB gRPC sweet spot
(arrow-flight/src/encode.rs:148).

Server: FlightServer registers named tables (or producer callables) and
serves do_get / do_put / do_exchange / list_flights.
Client: FlightTableClient mirrors the mid-level FlightClient (client.rs:70).
Transport is pyarrow.flight (gRPC); payload encode/decode goes through the
interop bridge so data lands as device tables.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, Iterator, List, Optional, Union

import pyarrow as pa
import pyarrow.flight as fl

from ..core.table import Table
from ..errors import ArrowInvalid
from .interop import table_from_pyarrow, table_to_pyarrow

__all__ = ["FlightServer", "FlightTableClient", "MAX_FLIGHT_DATA_SIZE"]

MAX_FLIGHT_DATA_SIZE = 2 * 1024 * 1024  # encode.rs:148 default target


def _split_batches(table: Table) -> List[pa.RecordBatch]:
    """Split to ~MAX_FLIGHT_DATA_SIZE chunks (FlightDataEncoder,
    encode.rs:269)."""
    batch = table_to_pyarrow(table)
    nbytes = sum(c.nbytes for c in batch.columns) or 1
    if nbytes <= MAX_FLIGHT_DATA_SIZE:
        return [batch]
    rows_per = max(int(batch.num_rows * MAX_FLIGHT_DATA_SIZE / nbytes), 1)
    return [batch.slice(i, min(rows_per, batch.num_rows - i))
            for i in range(0, batch.num_rows, rows_per)]


class FlightServer(fl.FlightServerBase):
    """Serves registered tables; accepts uploads (do_put) and echoes
    transformed streams (do_exchange)."""

    def __init__(self, location: str = "grpc://0.0.0.0:0",
                 exchange_fn: Optional[Callable[[Table], Table]] = None):
        super().__init__(location)
        self._tables: Dict[str, Table] = {}
        self._producers: Dict[str, Callable[[], Iterator[Table]]] = {}
        self._exchange_fn = exchange_fn or (lambda t: t)
        self._lock = threading.Lock()

    # -- registration ---------------------------------------------------------
    def register(self, name: str, table: Table) -> None:
        with self._lock:
            self._tables[name] = table

    def register_producer(self, name: str,
                          producer: Callable[[], Iterator[Table]]) -> None:
        with self._lock:
            self._producers[name] = producer

    def get_table(self, name: str) -> Table:
        with self._lock:
            return self._tables[name]

    @property
    def uri(self) -> str:
        return f"grpc://localhost:{self.port}"

    # -- FlightService handlers (arrow.flight.protocol.rs:861-992) -------------
    def list_flights(self, context, criteria):
        with self._lock:
            names = list(self._tables) + list(self._producers)
        for name in names:
            desc = fl.FlightDescriptor.for_path(name.encode())
            yield self.get_flight_info(context, desc)

    def get_flight_info(self, context, descriptor):
        name = descriptor.path[0].decode()
        with self._lock:
            t = self._tables.get(name)
        schema = table_to_pyarrow(t.slice(0, 0)).schema if t is not None \
            else pa.schema([])
        endpoint = fl.FlightEndpoint(name.encode(), [self.uri])
        return fl.FlightInfo(schema, descriptor, [endpoint],
                             t.num_rows if t is not None else -1, -1)

    def do_get(self, context, ticket):
        name = ticket.ticket.decode()
        with self._lock:
            producer = self._producers.get(name)
            table = self._tables.get(name)
        if producer is not None:
            def gen():
                for t in producer():
                    for b in _split_batches(t):
                        yield b
            first = producer()
            schema = table_to_pyarrow(next(iter(first)).slice(0, 0)).schema
            return fl.GeneratorStream(schema, gen())
        if table is None:
            raise fl.FlightServerError(f"unknown ticket {name!r}")
        batches = _split_batches(table)
        return fl.RecordBatchStream(
            pa.Table.from_batches(batches))

    def do_put(self, context, descriptor, reader, writer):
        name = descriptor.path[0].decode()
        batches = [chunk.data for chunk in reader]
        tbl = pa.Table.from_batches(batches).combine_chunks()
        self.register(name, table_from_pyarrow(tbl))

    def do_exchange(self, context, descriptor, reader, writer):
        started = False
        for chunk in reader:
            t = table_from_pyarrow(chunk.data)
            out = self._exchange_fn(t)
            out_b = table_to_pyarrow(out)
            if not started:
                writer.begin(out_b.schema)
                started = True
            writer.write_batch(out_b)


class FlightTableClient:
    """Mid-level client (arrow-flight/src/client.rs:70): typed tables in
    and out."""

    def __init__(self, uri: str):
        self._c = fl.connect(uri)

    def do_get(self, name: str) -> Table:
        reader = self._c.do_get(fl.Ticket(name.encode()))
        tbl = reader.read_all().combine_chunks()
        return table_from_pyarrow(tbl)

    def do_put(self, name: str, table: Table) -> None:
        desc = fl.FlightDescriptor.for_path(name.encode())
        batches = _split_batches(table)
        writer, _ = self._c.do_put(desc, batches[0].schema)
        for b in batches:
            writer.write_batch(b)
        writer.close()

    def do_exchange(self, name: str, tables) -> List[Table]:
        desc = fl.FlightDescriptor.for_path(name.encode())
        writer, reader = self._c.do_exchange(desc)
        tables = [tables] if isinstance(tables, Table) else list(tables)
        out: List[Table] = []
        writer.begin(table_to_pyarrow(tables[0].slice(0, 0)).schema)
        for t in tables:
            for b in _split_batches(t):
                writer.write_batch(b)
        writer.done_writing()
        for chunk in reader:
            out.append(table_from_pyarrow(chunk.data))
        writer.close()
        return out

    def list_flights(self) -> List[str]:
        return [fi.descriptor.path[0].decode()
                for fi in self._c.list_flights()]

    def close(self):
        self._c.close()
