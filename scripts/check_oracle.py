"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB at the given
sf, compare row-count / schema / order-insensitive canonical values."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "∅"
        return repr(round(float(v), 9))
    if isinstance(v, (np.floating,)):
        return canon_cell(float(v))
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return repr(bool(v))
    return repr(v)


def canon_col(s: pd.Series):
    """Canonicalize ONE column from its typed array.

    Column-wise on purpose: the old iterrows() path let pandas upcast a
    mixed int/float row to float64, so an int64 Spark column and a
    float64 oracle column (e.g. DuckDB HUGEINT from a bare SUM) both
    canonicalized to '137.0' and the drift shipped (round-3 verdict).
    The driver hashes columns dtype-sensitively; so must we.
    """
    vals = s.tolist()
    if pd.api.types.is_float_dtype(s.dtype):
        return ["∅" if v is None or v != v else repr(round(float(v), 9))
                for v in vals]
    if pd.api.types.is_integer_dtype(s.dtype):
        return ["∅" if v is None or v is pd.NA else repr(int(v))
                for v in vals]
    if pd.api.types.is_bool_dtype(s.dtype):
        return [repr(bool(v)) for v in vals]
    return [canon_cell(v) for v in vals]


def dtype_class(dt) -> str:
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "other"


def dtype_drift(sdf: pd.DataFrame, odf: pd.DataFrame):
    """Columns whose canonical dtype class differs between engines."""
    return [(c, str(sdf[c].dtype), str(odf[c].dtype))
            for c in sorted(sdf.columns)
            if dtype_class(sdf[c].dtype) != dtype_class(odf[c].dtype)]


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    colvals = [canon_col(df[c]) for c in cols]
    rows = sorted("|".join(cells) for cells in zip(*colvals))
    return cols, rows


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .appName("oracle-check").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    passed, failed = [], []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failed.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"✗ {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"~ {name}: no oracle ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append((name, f"ORACLE ERROR: {e}"))
            print(f"✗ {name}: oracle error {e}")
            continue
        if len(sdf) != len(odf):
            failed.append((name, f"rowcount {len(sdf)} vs {len(odf)}"))
            print(f"✗ {name}: rowcount {len(sdf)} vs {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failed.append((name, f"cols {sorted(sdf.columns)} vs "
                                 f"{sorted(odf.columns)}"))
            print(f"✗ {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        drift = dtype_drift(sdf, odf)
        if drift:
            failed.append((name, f"dtype drift {drift}"))
            print(f"✗ {name}: dtype drift {drift}")
            continue
        sc, sr = canon(sdf)
        oc, orows = canon(odf)
        if sr == orows:
            passed.append(name)
            print(f"✓ {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
        else:
            bad = sum(1 for a, b in zip(sr, orows) if a != b)
            failed.append((name, f"{bad}/{len(sr)} row mismatches"))
            print(f"✗ {name}: {bad}/{len(sr)} rows differ")
            for a, b in list(zip(sr, orows))[:200]:
                if a != b:
                    print(f"   spark:  {a[:200]}")
                    print(f"   oracle: {b[:200]}")
                    break
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    if failed:
        for n, r in failed:
            print(f"  FAIL {n}: {r[:200]}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
