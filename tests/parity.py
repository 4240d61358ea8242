"""Spark ↔ DuckDB comparison helper, mirroring the driver's gate:
row count + schema (column names) + order-insensitive value equality."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from rdf_n3_spark.session import TABLES


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif not pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_match(spark_df, duck_df: pd.DataFrame, name: str = "") -> None:
    a = _normalize(spark_df.toPandas())
    b = _normalize(duck_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            ok = np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = a[c].equals(b[c])
        if not ok:
            diff = a[c] != b[c]
            idx = diff[diff].index[:5]
            raise AssertionError(
                f"{name}: column {c} mismatch at rows {list(idx)}: "
                f"spark={a.loc[idx, c].tolist()} duck={b.loc[idx, c].tolist()}"
            )
