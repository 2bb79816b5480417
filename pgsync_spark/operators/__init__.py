from .filters import build_filters, filters_to_sql  # noqa: F401
