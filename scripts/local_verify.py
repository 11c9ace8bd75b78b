#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`. Compares each query's parquet
dump against its DuckDB oracle over the same tables. Dev tooling only (the
shipped Scala library has no python dependency)."""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, bool):
                v = int(v)
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.6g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]

ok = fail = 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING {name}: no spark output"); fail += 1; continue
    try:
        spark_tbl = pq.read_table(res_dir)
        s_cols = spark_tbl.column_names
        s_rows = [tuple(d[c] for c in s_cols) for d in spark_tbl.to_pylist()]
        duck = con.sql(oracle[name])
        d_cols = [c[0] for c in duck.description]
        d_rows = duck.fetchall()
    except Exception as e:
        print(f"ERROR   {name}: {e}"); fail += 1; continue
    s_canon, s_names = canon(s_cols, s_rows)
    d_canon, d_names = canon(d_cols, d_rows)
    if s_names != d_names:
        print(f"SCHEMA  {name}: spark={s_names} duck={d_names}"); fail += 1
    elif len(s_canon) != len(d_canon):
        print(f"ROWS    {name}: spark={len(s_canon)} duck={len(d_canon)}"); fail += 1
    elif s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
        print(f"VALUES  {name}: first diffs {diffs}"); fail += 1
    else:
        print(f"OK      {name} ({len(s_canon)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail (of {len(oracle)} oracled; "
      f"{len(glob.glob(out_dir + '/q_*')) } spark outputs total)")
