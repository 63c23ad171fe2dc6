"""Local replica of the driver's duckdb-oracle comparison: row count +
column names + order-insensitive value comparison (floats canonicalized)."""

from __future__ import annotations

import math

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    import decimal
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # canonicalize float noise: 12 significant digits
        return f"{v:.12g}"
    return str(v)


def rows_key(columns: list[str], rows: list) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == match)."""
    problems = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    sk, ok = rows_key(s_cols, s_rows), rows_key(o_cols, o_rows)
    if sk != ok:
        diff_s = [r for r in sk if r not in set(ok)][:5]
        diff_o = [r for r in ok if r not in set(sk)][:5]
        problems.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
    return problems
