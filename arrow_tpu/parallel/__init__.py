"""Multi-host scale-out: mesh, hash-partitioned shuffle, distributed
operators (SURVEY.md §2.4 / §7 M6 — the arrow-flight role, in-program)."""

from .mesh import make_mesh, shard_axis, table_sharding, P  # noqa: F401
from .partition import (  # noqa: F401
    hash_u64, bucketize, exchange, repartition_arrays, ShuffleResult,
)
from .dist import (  # noqa: F401
    local_group_aggregate, dist_group_by, dist_group_by_stream,
    dist_join_unique,
    dist_join, dist_join_stream, dist_join_skew, dist_sort,
    dist_sum,
)
from .api import (  # noqa: F401
    dist_table_group_by, dist_table_sort, dist_table_join,
    pack_key_columns,
)
