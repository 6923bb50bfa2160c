#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same source tables and compare (columns sorted by name, rows sorted,
values compared LOSSLESSLY, physical types compared by name).

The compare is deliberately strict — the driver's hash is sensitive to both
exact values and physical types (decimal widths, int32 vs int64, timestamp
units). An earlier 6-significant-figure canonicalization here certified a
real value bug (q02 revenue off by cents) as green; never again. The lossy
mode survives only behind --lenient for debugging.

Usage: check_oracles.py <verify_out_dir> <sf_dir> [--lenient]
"""
import datetime
import decimal
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

LENIENT = "--lenient" in sys.argv


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}" if LENIENT else repr(v)
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.6g}" if LENIENT else str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def table_sig(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        spark_cols = list(rel.columns)
        spark_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
        spark_rows = rel.fetchall()
        if name not in oracle:
            n_rowsonly += 1
            print(f"  rows-only  {name}: {len(spark_rows)} rows")
            continue
        try:
            orel = con.sql(oracle[name])
            o_cols = list(orel.columns)
            o_types = {c: str(t) for c, t in zip(orel.columns, orel.types)}
            o_rows = orel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"✗ ORACLE-ERR {name}: {e}")
            continue
        if sorted(spark_cols) != sorted(o_cols):
            n_fail += 1
            print(f"✗ SCHEMA     {name}: spark={sorted(spark_cols)} oracle={sorted(o_cols)}")
            continue
        type_diffs = [(c, spark_types[c], o_types[c])
                      for c in sorted(spark_cols) if spark_types[c] != o_types[c]]
        if type_diffs and not LENIENT:
            n_fail += 1
            print(f"✗ TYPE       {name}:")
            for c, st, ot in type_diffs:
                print(f"    {c}: spark={st} oracle={ot}")
            continue
        s_sig, o_sig = table_sig(spark_rows, spark_cols), table_sig(o_rows, o_cols)
        if s_sig == o_sig:
            n_pass += 1
            print(f"✓ MATCH      {name}: {len(spark_rows)} rows")
        else:
            n_fail += 1
            diff_s = [r for r in s_sig if r not in set(o_sig)][:3]
            diff_o = [r for r in o_sig if r not in set(s_sig)][:3]
            print(f"✗ MISMATCH   {name}: spark {len(s_sig)} rows vs oracle {len(o_sig)} rows")
            for d in diff_s:
                print(f"    spark-only:  {d}")
            for d in diff_o:
                print(f"    oracle-only: {d}")
    print(f"\n{n_pass} match, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
