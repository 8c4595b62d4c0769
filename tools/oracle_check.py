#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB oracle (t2 correctness gate).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
the parquet tables in <sfDir>, load the Spark result parquet, sort columns by
name, canonicalize values, and compare row-by-row. Queries without oracle SQL
get a rows-only check (>0 rows).

Two phases per query, BOTH must pass (r14 verdict missing #1: the old
canon-string compare passed rows the real driver fails):
 1. canon diff — column names sorted, values canonicalized to strings,
    row-by-row compare (the readable debugging phase);
 2. driver-faithful hash — pandas frames (Spark side via pyarrow,
    oracle side via duckdb's .df(), preserving dtype units), canonical
    sort_values over ALL columns, then pd.util.hash_pandas_object.
    This phase is deliberately dtype-sensitive (timestamp[ns] vs
    timestamp[us] hash differently even when the instants are equal)
    and chokes on raw binary cells (bytearray is unhashable in the
    lexsort) — exactly the failure modes the external driver has.

Driver-side tooling only — NOT part of the engine.
"""
import hashlib
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match a rounded double regardless of repr noise
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_rows(tbl):
    """pyarrow.Table -> (sorted cols, canonicalized row tuples)."""
    cols = sorted(tbl.column_names)
    pylists = {c: tbl.column(c).to_pylist() for c in cols}
    rows = [tuple(canon(pylists[c][i]) for c in cols) for i in range(tbl.num_rows)]
    return cols, rows


def driver_hash(df):
    """The external driver's canonicalization, replicated: sort columns
    by name, pandas-lexsort the rows over all columns, hash the frame
    with pandas' dtype-sensitive row hash. Returns a hex digest, or
    raises exactly where the driver raises (e.g. TypeError on
    unhashable binary cells in the lexsort)."""
    import pandas as pd
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="last")
    df = df.reset_index(drop=True)
    h = pd.util.hash_pandas_object(df, index=False)
    return hashlib.md5(h.values.tobytes()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    import glob
    import pyarrow.parquet as pq
    import pyarrow as pa
    present = set(x.split("/")[-1] for x in glob.glob(f"{out_dir}/*")
                  if not x.endswith(".json"))
    # every oracle key must have a Spark output — a query that crashed in
    # Verify leaves no dir and must count as FAIL, not be skipped
    names = sorted(present | set(oracle))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output (query crashed in Verify?)")
            n_fail += 1
            continue
        spark_df = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        if name not in oracle:
            ok = spark_df.num_rows > 0
            print(f"{'pass' if ok else 'FAIL'} {name}: rows-only ({spark_df.num_rows} rows)")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            duck_df = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = frame_rows(spark_df)
        dc, dr = frame_rows(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
        elif sr != dr:
            n_fail += 1
            diff = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            print(f"FAIL {name}: {len(sr)} vs {len(dr)} rows, "
                  f"{len(diff)} mismatched; first: "
                  f"{diff[0] if diff else ('len', sr[:1], dr[:1])}")
        else:
            # canon phase green: now the driver-faithful hash phase
            try:
                sh = driver_hash(spark_df.to_pandas())
            except Exception as e:
                print(f"FAIL {name}: driver hash (spark side) raised "
                      f"{type(e).__name__}: {e}")
                n_fail += 1
                continue
            try:
                dh = driver_hash(con.execute(oracle[name]).df())
            except Exception as e:
                print(f"FAIL {name}: driver hash (oracle side) raised "
                      f"{type(e).__name__}: {e}")
                n_fail += 1
                continue
            if sh != dh:
                print(f"FAIL {name}: values match but driver hash differs "
                      f"({sh[:12]} vs {dh[:12]}) — dtype/unit divergence "
                      f"(spark dtypes: "
                      f"{dict(spark_df.to_pandas().dtypes.astype(str))})")
                n_fail += 1
            else:
                print(f"pass {name}: {len(sr)} rows")
                n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
