"""Arrow IPC file/stream interchange (the arrow-ipc role).

The engine's wire/spill/checkpoint format IS the Arrow IPC format
(SURVEY.md §5 checkpoint/resume: IPC file w/ footer for random access).
Host-side encode/decode uses the Arrow C++ implementation via pyarrow —
byte-compatible with the reference's arrow-ipc by construction (both pass
the cross-implementation golden suite) — and bridges directly to device
tables.

Push-based incremental decoding (the reference's StreamDecoder,
arrow-ipc/src/reader/stream.rs:35) is provided by StreamDecoder below:
feed arbitrary byte chunks, batches pop out as they complete — the shape
needed by the Flight ingress path.
"""

from __future__ import annotations

import io as _io
from typing import Iterator, List, Optional

import pyarrow as pa

from ..core.table import Table
from ..errors import ArrowInvalid
from .interop import table_from_pyarrow, table_to_pyarrow

__all__ = ["write_file", "read_file", "write_stream", "read_stream",
           "FileWriter", "StreamWriter", "StreamDecoder",
           "serialize_table", "deserialize_table"]


# ---- whole-file convenience --------------------------------------------------

def write_file(path_or_sink, tables, compression: Optional[str] = None):
    """IPC file format w/ footer (arrow-ipc/src/writer.rs:934).
    compression: None | 'lz4' | 'zstd' (writer.rs compression.rs:27)."""
    tables = [tables] if isinstance(tables, Table) else list(tables)
    if not tables:
        raise ArrowInvalid("write_file of zero batches")
    batches = [table_to_pyarrow(t) for t in tables]
    options = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.OSFile(path_or_sink, "wb") if isinstance(path_or_sink, str) \
            else _nullctx(path_or_sink) as sink:
        with pa.ipc.new_file(sink, batches[0].schema, options=options) as w:
            for b in batches:
                w.write_batch(b)


def read_file(path_or_source) -> List[Table]:
    """FileReader (arrow-ipc/src/reader.rs:1153): random-access footer
    format; zero-copy mmap when given a path."""
    src = pa.memory_map(path_or_source, "r") \
        if isinstance(path_or_source, str) else path_or_source
    with pa.ipc.open_file(src) as r:
        return [table_from_pyarrow(r.get_batch(i))
                for i in range(r.num_record_batches)]


def write_stream(sink, tables, compression: Optional[str] = None):
    """Stream format (StreamWriter, writer.rs:1186)."""
    tables = [tables] if isinstance(tables, Table) else list(tables)
    batches = [table_to_pyarrow(t) for t in tables]
    options = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.ipc.new_stream(sink, batches[0].schema, options=options) as w:
        for b in batches:
            w.write_batch(b)


def read_stream(source) -> List[Table]:
    with pa.ipc.open_stream(source) as r:
        return [table_from_pyarrow(b) for b in r]


def serialize_table(table: Table, compression: Optional[str] = None
                    ) -> bytes:
    """One-shot table -> IPC stream bytes (the shuffle/spill payload)."""
    buf = _io.BytesIO()
    write_stream(buf, table, compression)
    return buf.getvalue()


def deserialize_table(data: bytes) -> Table:
    tables = read_stream(pa.py_buffer(data))
    if len(tables) == 1:
        return tables[0]
    from ..ops.concat import concat_tables
    return concat_tables(tables)


class _nullctx:
    def __init__(self, obj):
        self.obj = obj

    def __enter__(self):
        return self.obj

    def __exit__(self, *a):
        return False


# ---- incremental writers ------------------------------------------------------

class StreamWriter:
    """Push batches to a sink as IPC stream messages."""

    def __init__(self, sink, schema_table: Table,
                 compression: Optional[str] = None):
        self._schema = table_to_pyarrow(schema_table.slice(0, 0)).schema
        self._w = pa.ipc.new_stream(
            sink, self._schema,
            options=pa.ipc.IpcWriteOptions(compression=compression))

    def write(self, table: Table):
        self._w.write_batch(table_to_pyarrow(table))

    def close(self):
        self._w.close()


FileWriter = StreamWriter  # file-format variant kept simple for now


# ---- push-based stream decoding ------------------------------------------------

class StreamDecoder:
    """Incremental IPC stream decoder (reader/stream.rs:35): feed bytes in
    arbitrary chunk sizes; completed RecordBatches become available via
    next_batch().  Parses the 8-byte encapsulation headers
    (continuation 0xFFFFFFFF + i32 length) to frame messages, then hands
    framed bytes to the Arrow decoder."""

    def __init__(self):
        self._buf = bytearray()
        self._schema: Optional[pa.Schema] = None
        self._batches: List[Table] = []
        self._dict_memo = []  # raw dictionary message buffers, in order

    def feed(self, data: bytes) -> None:
        self._buf.extend(data)
        self._drain()

    def _drain(self):
        while True:
            msg_len = self._peek_message_len()
            if msg_len is None or len(self._buf) < msg_len:
                return
            raw = bytes(self._buf[:msg_len])
            del self._buf[:msg_len]
            self._consume_message(raw)

    def _peek_message_len(self) -> Optional[int]:
        import struct
        b = self._buf
        if len(b) < 8:
            return None
        cont, length = struct.unpack_from("<Ii", b, 0)
        if cont != 0xFFFFFFFF:
            # legacy (pre-0.15) framing: i32 length only
            length = struct.unpack_from("<i", b, 0)[0]
            header = 4
        else:
            header = 8
        if length == 0:  # end-of-stream marker
            return header
        if len(b) < header + length:
            return None
        return header + length + _message_body_length(
            bytes(b[header:header + length]))

    def _consume_message(self, raw: bytes):
        # raw = header + metadata + body
        import struct
        cont = struct.unpack_from("<I", raw, 0)[0]
        off = 8 if cont == 0xFFFFFFFF else 4
        meta_len = struct.unpack_from("<i", raw, off - 4)[0]
        if meta_len == 0:
            return  # EOS
        msg = pa.ipc.read_message(pa.py_buffer(raw))
        if self._schema is None:
            # first message must be the schema
            reader = pa.ipc.open_stream(pa.py_buffer(raw))
            self._schema = reader.schema
            self._sbytes = raw
            return
        if str(msg.type).startswith("dictionary"):
            self._dict_memo.append(raw)
            return
        if str(msg.type) == "record batch":
            # decode with schema + accumulated dictionaries
            stream = self._sbytes + b"".join(self._dict_memo) + raw
            reader = pa.ipc.open_stream(pa.py_buffer(stream))
            batches = list(reader)
            self._batches.append(table_from_pyarrow(batches[-1]))

    def next_batch(self) -> Optional[Table]:
        if self._batches:
            return self._batches.pop(0)
        return None

    @property
    def schema(self):
        return self._schema


def _message_body_length(metadata: bytes) -> int:
    """Extract Message.bodyLength from the metadata flatbuffer.

    Minimal flatbuffer walk (format/Message.fbs): root table, field id 3
    (bodyLength, long).  Avoids a dependency on the flatbuffers package.
    """
    import struct

    root = struct.unpack_from("<i", metadata, 0)[0]
    vtable_off = root - struct.unpack_from("<i", metadata, root)[0]
    vtable_len = struct.unpack_from("<H", metadata, vtable_off)[0]
    # field order in Message.fbs: version(0), header(1,2: type+offset),
    # bodyLength... vtable slots: [version, header_type, header,
    # bodyLength, custom_metadata]
    slot = 4 + 2 * 3  # 4 bytes header + slot index 3
    if slot + 2 > vtable_len:
        return 0
    field_off = struct.unpack_from("<H", metadata, vtable_off + slot)[0]
    if field_off == 0:
        return 0
    return struct.unpack_from("<q", metadata, root + field_off)[0]
