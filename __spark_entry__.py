"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship denormalization (orders → customer →
nation + lineitems nested docs) at sf0.001; queries()/oracle_sql()
expose every implemented operator from SURVEY.md §2 with DuckDB
oracles (see pgsync_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """Driver may hand us a session it built itself — apply the runtime
    confs our plans rely on (UTC for canonical JSON, AQE, nano reads)."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pgsync_spark.queries import REGISTRY

    _configure(spark)
    return REGISTRY["denorm_orders_full"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pgsync_spark.queries import REGISTRY

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, qdef in REGISTRY.items():
        fn = qdef.fn

        def wrapped(spark, sf_dir, _fn=fn):
            return _fn(_configure(spark), sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from pgsync_spark.queries import REGISTRY

    return {
        name: qdef.oracle
        for name, qdef in REGISTRY.items()
        if qdef.oracle is not None
    }
