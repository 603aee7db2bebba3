"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf and compare row-count + schema + order-insensitive
value hash against oracle_sql() via DuckDB.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep + os.environ.get("PYTHONPATH", "")
)

import duckdb
import numpy as np
import pandas as pd


TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for a DRIVER-STRICT compare: int width is unified to
    int64 (value-hashing is width-insensitive) but float vs int dtypes are
    preserved so an oracle emitting float64 (e.g. DuckDB HUGEINT sums)
    against an engine int64 FAILS here, like the driver's value hash."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].astype(object).where(pd.notna(df[c]), None).astype(str)
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype) == "bool" or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype(bool)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs = E.queries()
    sqls = E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:  # noqa: BLE001
            print(f"[ERR ] {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"[rows] {name}: {len(got)} rows, cols={list(got.columns)} (rows-only)")
            continue
        exp = canon(con.execute(sqls[name]).df())
        status = "OK  "
        if list(got.columns) != list(exp.columns):
            status = "COLS"
        elif len(got) != len(exp):
            status = "ROWS"
        else:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                              check_exact=True)
            except AssertionError as ex:
                status = "VALS"
                if "--debug" in sys.argv:
                    print(ex)
        if status != "OK  ":
            failures += 1
            print(f"[{status}] {name}: engine {len(got)}x{len(got.columns)} "
                  f"{list(got.columns)} vs oracle {len(exp)}x{len(exp.columns)} {list(exp.columns)}")
        else:
            print(f"[OK  ] {name}: {len(got)} rows")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
