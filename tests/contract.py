"""Local mirror of the driver's correctness gate: run each
__spark_entry__ query AND its DuckDB oracle on the same parquet dir,
compare row-count + column names + order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("␀")
            elif isinstance(v, float):
                vals.append(f"{v:.10g}")
            elif isinstance(v, pd.Timestamp):
                vals.append(v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat())
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    eng = spark_df.toPandas()
    # go through arrow with date_as_object so DATE columns stay
    # datetime.date on both sides (.df() widens them to datetime64)
    ora = con.sql(sql).arrow().to_pandas(date_as_object=True)
    if sorted(eng.columns) != sorted(ora.columns):
        return False, f"columns differ: {sorted(eng.columns)} vs {sorted(ora.columns)}"
    if len(eng) != len(ora):
        return False, f"row counts differ: {len(eng)} vs {len(ora)}"
    ce, co = _canon(eng), _canon(ora)
    if ce != co:
        diff_e = [r for r in ce if r not in set(co)][:3]
        diff_o = [r for r in co if r not in set(ce)][:3]
        return False, f"values differ; engine-only={diff_e} oracle-only={diff_o}"
    return True, "ok"
