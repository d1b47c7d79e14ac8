"""DuckDB oracle comparison harness.

Replicates (strictly) what the driver's t2 check does: run the Spark query
and the ANSI-SQL oracle on the same parquet tables, sort columns by name,
compare row multisets. Our comparison is *bit-exact* by default — queries in
this repo are written so that every output value is deterministic across
engines (see ``queries/`` docstrings: exact-decimal sums, IEEE-deterministic
scalar ops, md5-based portable hashing).
"""

from __future__ import annotations

import math
from typing import Iterable

import duckdb
from pyspark.sql import DataFrame

from btrblocks_spark.tables import TABLE_NAMES


def duck_connect(sf_dir: str, tables: Iterable[str] = TABLE_NAMES) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            # canonicalize -0.0: rows are SORTED by repr but COMPARED with
            # == — repr(-0.0) != repr(0.0) while -0.0 == 0.0, so a
            # sign-of-zero difference between engines would zip-misalign
            # the sorted rows and report equal multisets as a mismatch
            return 0.0
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_normalize_cell(x) for x in v)
    return v


def rows_key(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, then sort rows — order-insensitive multiset."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(
    spark_df: DataFrame,
    oracle_sql: str,
    sf_dir: str,
    float_tol: float = 0.0,
) -> tuple[bool, str]:
    """Return (match, message). float_tol=0 → bit-exact compare."""
    s_cols = [f.name for f in spark_df.schema.fields]
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duck_connect(sf_dir)
    try:
        res = con.execute(oracle_sql)
        d_cols = [d[0] for d in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()  # a raising oracle must not leak the connection

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"

    sk = rows_key(s_cols, s_rows)
    dk = rows_key(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sk, dk)):
        if a == b:
            continue
        if float_tol > 0 and _rows_close(a, b, float_tol):
            continue
        return False, f"value mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}"
    return True, f"ok ({len(s_rows)} rows)"


def _rows_close(a: tuple, b: tuple, tol: float) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                continue
        return False
    return True
