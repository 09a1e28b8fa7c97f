#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
test tables, sorts columns by name and rows by value, and compares
cell-by-cell EXACTLY (floats via their %.9g rendering — queries are
expected to produce bit-identical values through graft.util.Exact;
note that when a float does drift, the string row-sort can misalign
pairs, so read the first diff, not the cascade).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def frame_rows(df):
    # df: pandas DataFrame -> sorted column names, sorted row tuples
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # builder-side big-replica runs (sf10) OOM without a cap: DuckDB
    # buffers unbounded by default. Opt-in via env so the driver's
    # default invocation is untouched.
    mem = os.environ.get("GRAFT_DUCKDB_MEMLIMIT")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written tables (e.g. graft.tools.Sf1Gen output) are
            # directories of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # iterate the DECLARED query set, not just whatever dirs exist —
    # a query that threw inside Verify must fail here, not vanish
    result_dirs = set(d for d in os.listdir(outdir)
                      if os.path.isdir(os.path.join(outdir, d)))
    # optional 3rd arg: comma-separated query names (builder-side
    # targeted re-checks / per-query isolation on big replicas)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    for name in sorted(result_dirs | set(oracle)):
        if only is not None and name not in only:
            continue
        if name not in result_dirs:
            print(f"[FAIL] {name}: declared but Verify wrote no output")
            n_bad += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: cannot read spark output: {e}"); n_bad += 1; continue
        if name not in oracle:
            print(f"[rows-only] {name}: {len(spark_df)} rows "
                  f"({'OK' if len(spark_df) > 0 else 'EMPTY!'})")
            if len(spark_df) == 0: n_bad += 1
            else: n_ok += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_bad += 1; continue
        # int-vs-float dtype skew renders identically through %.9g here
        # but NOT through a plain str() hasher (0 vs 0.0) — the exact
        # class that made the driver flag pack_sequences in round 3
        # while this script stayed green. Fail it loudly.
        skew = [c for c in spark_df.columns if c in duck_df.columns
                and (str(spark_df[c].dtype).startswith(("int", "uint"))
                     != str(duck_df[c].dtype).startswith(("int", "uint")))]
        if skew:
            print(f"[FAIL] {name}: int/float dtype skew on {skew} "
                  f"(spark={[str(spark_df[c].dtype) for c in skew]}, "
                  f"duck={[str(duck_df[c].dtype) for c in skew]}) — "
                  f"CAST the oracle column so both engines agree")
            n_bad += 1; continue
        sc, sr = frame_rows(spark_df)
        dc, dr = frame_rows(duck_df)
        if sc != dc:
            print(f"[FAIL] {name}: schema mismatch spark={sc} duck={dc}"); n_bad += 1; continue
        if len(sr) != len(dr):
            print(f"[FAIL] {name}: rowcount spark={len(sr)} duck={len(dr)}")
            for i in range(min(3, len(sr))): print("  spark:", sr[i])
            for i in range(min(3, len(dr))): print("  duck :", dr[i])
            n_bad += 1; continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"[FAIL] {name}: {len(bad)}/{len(sr)} rows differ; first:")
            for a, b in bad[:3]:
                print("  spark:", a); print("  duck :", b)
            n_bad += 1
        else:
            print(f"[OK]   {name}: {len(sr)} rows hash-match")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
