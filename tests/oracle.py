"""Local differential-test harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 check (SURVEY §5.2): row-count + column names +
order-insensitive exact value comparison. Strictly as strict as a
value-hash: we canonicalize both frames (sort columns by name, unify
dtypes, sort rows) and require exact equality — floats included, which
is why every declared query rounds floats (determinism rule D2).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from pg2ch_spark.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, unify dtypes, sort rows, reset index."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = {}
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_bool_dtype(s.dtype):
            out[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s.dtype):
            out[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s.dtype):
            out[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s.dtype):
            out[c] = s.astype("datetime64[us]")
        else:
            out[c] = s.astype("string")
    pdf = pd.DataFrame(out)
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="last", kind="mergesort")
    return pdf.reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    errors: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for e in self.errors:
            msg += f"\n    {e}"
        return msg


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name, True, len(spark_pdf), len(oracle_pdf))

    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        res.ok = False
        res.errors.append(f"schema mismatch: spark={s_cols} oracle={o_cols}")
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.errors.append("row count mismatch")
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if res.ok and not a.equals(b):
        res.ok = False
        for c in a.columns:
            col_a, col_b = a[c], b[c]
            if col_a.equals(col_b):
                continue
            if pd.api.types.is_float_dtype(col_a.dtype):
                diff = (col_a - col_b).abs()
                res.errors.append(
                    f"column {c!r} differs: max_abs_diff={np.nanmax(diff.to_numpy()):.3g} "
                    f"n_diff={(~((col_a == col_b) | (col_a.isna() & col_b.isna()))).sum()}"
                )
            else:
                neq = ~((col_a == col_b) | (col_a.isna() & col_b.isna()))
                idx = neq[neq].index[:3].tolist()
                samples = [(c, i, col_a[i], col_b[i]) for i in idx]
                res.errors.append(f"column {c!r} differs at {int(neq.sum())} rows; e.g. {samples}")
    return res


def run_compare(name: str, spark_df, sql: str, con: duckdb.DuckDBPyConnection) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    oracle_pdf = con.execute(sql).df()
    return compare_frames(name, spark_pdf, oracle_pdf)
