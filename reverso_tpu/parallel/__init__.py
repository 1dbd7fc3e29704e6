from .sharding import (
    make_mesh,
    shard_rows,
    replicate,
    row_sharding,
    replicated_sharding,
    local_row_count,
)
