"""Distributed table profiling: one stats row per column.

The data-engine "describe" surface: row/null counts plus type-aware
min/max for every column, computed as fixed-size per-batch partials
(one row per column per batch — transfer independent of row count)
merged by a small grouped reduction. Numeric/timestamp min-max are
comparison-based, so the values are exact and dtype-strict against the
SQL twin; timestamps are reported as epoch microseconds (int64) to
keep the compared projection integer.

Output schema (a measure that does not apply to the column's type is
the sentinel -1 / -1.0 rather than NULL — nullable-int columns do not
survive a dtype-strict hash compare, and the dtype column makes the
sentinel unambiguous):
    column:str, dtype:str, n:int64, n_null:int64,
    min_i:int64, max_i:int64,          -- int64 + timestamp columns
    min_f:double, max_f:double,        -- float columns
    min_len:int64, max_len:int64       -- string columns (codepoints)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MEASURES = ["n", "n_null", "min_i", "max_i", "min_f", "max_f",
             "min_len", "max_len"]


def _dtype_name(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_integer(t):
        return "int64"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    return str(t)


# min/max identities: partials carry these instead of NULLs so the
# combine's Arrow->pandas hop never sees a nullable int64 column —
# pandas would upcast it to float64 and silently corrupt values beyond
# 2^53 (phash / audio_fp / content-derived ids live up there)
_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)


def _partial(t: pa.Table) -> pa.Table:
    rows = []
    for name in t.column_names:
        col = t.column(name)
        kind = _dtype_name(col.type)
        r = {"column": name, "dtype": kind,
             "n": len(col), "n_null": col.null_count,
             "min_i": _I64_MAX, "max_i": _I64_MIN,
             "min_f": np.inf, "max_f": -np.inf,
             "min_len": _I64_MAX, "max_len": _I64_MIN}
        valid = len(col) - col.null_count
        if valid:
            if kind == "int64":
                mm = pc.min_max(col)
                r["min_i"], r["max_i"] = mm["min"].as_py(), mm["max"].as_py()
            elif kind == "timestamp":
                mm = pc.min_max(col.cast(pa.int64()))
                r["min_i"], r["max_i"] = mm["min"].as_py(), mm["max"].as_py()
            elif kind == "double":
                mm = pc.min_max(col)
                r["min_f"], r["max_f"] = mm["min"].as_py(), mm["max"].as_py()
            elif kind == "string":
                ln = pc.utf8_length(col)
                mm = pc.min_max(ln)
                r["min_len"], r["max_len"] = (mm["min"].as_py(),
                                              mm["max"].as_py())
        rows.append(r)
    return pa.Table.from_pylist(rows, schema=_partial_schema())


def _partial_schema() -> pa.Schema:
    return pa.schema([("column", pa.string()), ("dtype", pa.string()),
                      ("n", pa.int64()), ("n_null", pa.int64()),
                      ("min_i", pa.int64()), ("max_i", pa.int64()),
                      ("min_f", pa.float64()), ("max_f", pa.float64()),
                      ("min_len", pa.int64()), ("max_len", pa.int64())])


def profile_table(ds, num_buckets: int = 8):
    """Dataset -> Dataset of one profile row per column, sorted by
    column name downstream of a tiny grouped combine."""
    from osm_merge_ray.ops import grouped_reduce

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("column", sort=False)
        out = g.agg(dtype=("dtype", "first"),
                    n=("n", "sum"), n_null=("n_null", "sum"),
                    min_i=("min_i", "min"), max_i=("max_i", "max"),
                    min_f=("min_f", "min"), max_f=("max_f", "max"),
                    min_len=("min_len", "min"),
                    max_len=("max_len", "max")).reset_index()
        for c in ("n", "n_null"):
            out[c] = out[c].astype(np.int64)
        # replace the identities with the -1 sentinel wherever the
        # measure does not apply (wrong dtype, or zero valid rows) —
        # decided by dtype+count, never by value comparison, so a real
        # column whose min/max equals an identity still reports exactly
        valid = (out["n"] - out["n_null"]).to_numpy() > 0
        int_ok = out["dtype"].isin(["int64", "timestamp"]).to_numpy() & valid
        flt_ok = (out["dtype"] == "double").to_numpy() & valid
        str_ok = (out["dtype"] == "string").to_numpy() & valid
        for c in ("min_i", "max_i"):
            out[c] = np.where(int_ok, out[c].to_numpy(np.int64),
                              np.int64(-1))
        for c in ("min_len", "max_len"):
            out[c] = np.where(str_ok, out[c].to_numpy(np.int64),
                              np.int64(-1))
        for c in ("min_f", "max_f"):
            out[c] = np.where(flt_ok, out[c].to_numpy(np.float64), -1.0)
        return out

    return grouped_reduce(partials, ["column"], combine,
                          num_buckets=num_buckets).sort("column")
