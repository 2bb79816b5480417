"""Local mirror of the driver's correctness gate: run a Spark DataFrame
and a DuckDB oracle SQL over the same parquet tables and compare
row-count + order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _sql_str(path: str) -> str:
    """Escape a filesystem path for embedding in a SQL string literal.
    CREATE VIEW can't take bound parameters (the view stores the query
    text), so quoting is the only option — and CLI --validate points
    this at arbitrary user --data-dir values that may contain quotes."""
    return "'" + path.replace("'", "''") + "'"


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    seen = set()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW \"{t}\" AS "
                f"SELECT * FROM read_parquet({_sql_str(path)})"
            )
            seen.add(t)
    # any other <table>.parquet in the dir registers too (CLI --validate
    # against a user data dir whose tables aren't the testdata set);
    # directory-style parquet globs its part files
    import glob as _glob

    for path in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        t = os.path.basename(path)[: -len(".parquet")]
        if t in seen or not t.isidentifier():
            continue
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW \"{t}\" AS "
            f"SELECT * FROM read_parquet({_sql_str(src)})"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is None:
        return "NULL"
    return str(v)


def _rows_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, sql: str, sf_dir: str, limit_diff: int = 5):
    """Returns (ok, message). Sorts columns by name (like the driver),
    compares row multisets."""
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(sql)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        con.close()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    msgs = []
    if sorted(s_cols) != sorted(o_cols):
        msgs.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        msgs.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")
    if msgs:
        return False, "; ".join(msgs)
    sm = _rows_multiset(s_rows, s_cols)
    om = _rows_multiset(o_rows, o_cols)
    if sm != om:
        diffs = []
        oset = set(om)
        sset = set(sm)
        for r in sm:
            if r not in oset:
                diffs.append(f"spark-only: {r[:400]}")
                if len(diffs) >= limit_diff:
                    break
        for r in om:
            if r not in sset:
                diffs.append(f"oracle-only: {r[:400]}")
                if len(diffs) >= 2 * limit_diff:
                    break
        return False, "value mismatch:\n" + "\n".join(diffs)
    return True, f"ok ({len(s_rows)} rows)"
