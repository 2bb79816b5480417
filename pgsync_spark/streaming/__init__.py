from .cdc import (  # noqa: F401
    CDC_SCHEMA,
    TableMaterializer,
    debezium_to_cdc,
    payloads_from_rows,
)
from .incremental import IncrementalEngine  # noqa: F401
from .metrics import EngineMetricsListener  # noqa: F401
from .runner import SyncRunner  # noqa: F401
from .index_sync import (  # noqa: F401
    HASH64_ID_EXPR,
    SearchIndexMaintainer,
    VectorIndexMaintainer,
)
