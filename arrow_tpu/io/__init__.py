"""I/O & interchange layer (SURVEY.md §2.3 L4/L5): pyarrow interop,
Arrow IPC file/stream, CSV, JSON, Parquet, Avro, Flight RPC."""

from .interop import (  # noqa: F401
    column_from_pyarrow, column_to_pyarrow,
    table_from_pyarrow, table_to_pyarrow,
    dtype_from_pyarrow, dtype_to_pyarrow,
)
from . import ipc  # noqa: F401
from . import csv  # noqa: F401
from . import json_io  # noqa: F401
from . import parquet_io  # noqa: F401
from . import avro  # noqa: F401
from . import integration_json  # noqa: F401
from . import records  # noqa: F401
