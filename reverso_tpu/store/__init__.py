from .persist import (
    VectorStore,
    StoreError,
    StoreLockedError,
    list_databases,
    delete_database,
    unlock_database,
    collection_name,
)
from .index import DeviceIndex, HostIndex, SearchResult
from .ivf import IVFIndex
from .filter import (
    Filter,
    FilterError,
    parse_filter,
    payload_mask,
)
