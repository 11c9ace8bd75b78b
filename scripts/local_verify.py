#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`. Compares each query's parquet
dump against its DuckDB oracle over the same tables. Dev tooling only (the
shipped Scala library has no python dependency).

Both sides are fetched THROUGH PANDAS, because that is the driver's path and
pandas conversion is lossy in ways fetchall() is not: DuckDB's windowed
sum(INTEGER) returns HUGEINT, which pandas renders as float64 (`9.0`) while
Spark emits int64 (`9`) — fetchall() hid exactly that mismatch for three
rounds (q_gap_sessions). We additionally hard-fail any oracle whose output
contains HUGEINT/UHUGEINT/DECIMAL columns, so the class of bug is caught at
the type level before hashing."""
import json, math, sys, glob, os
import duckdb
import numpy as np
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# Types whose pandas conversion silently changes the value's repr vs Spark's
# parquet dump (HUGEINT -> float64, DECIMAL -> decimal.Decimal objects).
BANNED_TYPE_FRAGMENTS = ("HUGEINT", "UHUGEINT", "DECIMAL")


def canon_val(v):
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, list):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        # repr = shortest round-trip: bit-faithful like the driver's compare.
        # %.6g (used through round 5) hid a +/-1e3 absolute delta on ~1e14
        # values (q_asof_attribution, driver-red/local-green round 5) —
        # rounding discipline must live in the queries (round(_, 6) both
        # sides), never in the gate.
        return "NaN" if math.isnan(f) else repr(f)
    return str(v)


def dtype_mismatches(sdf, ddf):
    """Compare dtype KINDS explicitly. Since the repr() switch the value
    compare does see int-vs-float divergence ('9' vs '9.0'), so this check's
    remaining job is the OTHER direction: legitimizing pandas' null-induced
    int→float64 promotion (tolerated only when the float side actually
    contains NaN) while still failing promotions with no NaN to excuse
    them — and failing them as a clear DTYPE line, not a value diff."""
    out = []
    for c in sorted(set(sdf.columns) & set(ddf.columns)):
        ks = {"u": "i"}.get(sdf[c].dtype.kind, sdf[c].dtype.kind)
        kd = {"u": "i"}.get(ddf[c].dtype.kind, ddf[c].dtype.kind)
        if ks == kd:
            continue
        if {ks, kd} == {"i", "f"}:
            fcol = sdf[c] if ks == "f" else ddf[c]
            if fcol.isna().any():
                continue
        out.append(f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}")
    return out


def canon_df(df):
    cols = sorted(df.columns)
    rows = [tuple(canon_val(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows), list(cols)


ok = fail = 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING {name}: no spark output"); fail += 1; continue
    try:
        spark_df = pq.read_table(res_dir).to_pandas()
        duck = con.sql(oracle[name])
        bad = [f"{c}:{t}" for c, t in zip(duck.columns, duck.types)
               if any(frag in str(t).upper() for frag in BANNED_TYPE_FRAGMENTS)]
        if bad:
            print(f"ORACLE-TYPE {name}: {bad} — CAST to BIGINT/DOUBLE in the "
                  f"oracle SQL (pandas mangles these types)"); fail += 1; continue
        duck_df = duck.df()
    except Exception as e:
        print(f"ERROR   {name}: {e}"); fail += 1; continue
    # The driver's compare sorts rows via pandas sort_values, which dies on
    # array/struct cells (`unhashable type: numpy.ndarray` — q_encode,
    # round 7's red cell). canon_df below tolerates arrays, so without this
    # guard the gate is local-green/driver-red: ban nested cells outright.
    nested = [c for df in (spark_df, duck_df) for c in df.columns
              if df[c].map(lambda v: isinstance(v, (np.ndarray, list, dict))).any()]
    if nested:
        print(f"NESTED  {name}: array/struct columns {sorted(set(nested))} — "
              f"driver's sort_values crashes on these; serialize to a string "
              f"on BOTH sides (array_join / string_agg)"); fail += 1; continue
    s_canon, s_names = canon_df(spark_df)
    d_canon, d_names = canon_df(duck_df)
    dtype_bad = dtype_mismatches(spark_df, duck_df)
    if s_names != d_names:
        print(f"SCHEMA  {name}: spark={s_names} duck={d_names}"); fail += 1
    elif dtype_bad:
        print(f"DTYPE   {name}: {dtype_bad}"); fail += 1
    elif len(s_canon) != len(d_canon):
        print(f"ROWS    {name}: spark={len(s_canon)} duck={len(d_canon)}"); fail += 1
    elif s_canon != d_canon:
        diffs = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
        print(f"VALUES  {name}: first diffs {diffs}"); fail += 1
    else:
        print(f"OK      {name} ({len(s_canon)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail (of {len(oracle)} oracled; "
      f"{len(glob.glob(out_dir + '/q_*')) } spark outputs total)")
sys.exit(1 if fail else 0)
