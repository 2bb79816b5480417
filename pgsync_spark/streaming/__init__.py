from .cdc import CDC_SCHEMA, TableMaterializer, payloads_from_rows  # noqa: F401
from .incremental import IncrementalEngine  # noqa: F401
from .metrics import EngineMetricsListener  # noqa: F401
