#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage:
  python3 tools/check.py [sfdir] [outdir] [--run] [query...]

With --run, first runs `sbt runMain graft.Verify <sfdir> <outdir>`. Then for
every query in <outdir>/oracle_sql.json: execute the oracle SQL in DuckDB
(tables = parquet files in sfdir), read the engine's parquet output, sort
columns by name, canonicalize (round doubles to 6dp, timestamps to us), sort
rows, and hash-compare.
"""
import glob
import json, os, subprocess, sys, hashlib, tempfile
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(6)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])
    if "--run" in sys.argv:
        names = " ".join(sorted(only))
        subprocess.run(["sbt", "-batch",
                        f"runMain graft.Verify {sfdir} {outdir} {names}".strip()],
                       check=True, capture_output=True, text=True)
    con = duckdb.connect()
    # big-shard oracles (e.g. the 10x ScaleShard correctness leg) need
    # spill-to-disk and don't care about insertion order (canon() sorts).
    # The spill dir is a managed tempdir (removed at interpreter exit) — a
    # fixed /tmp path would accrete spill files across runs forever.
    spill = tempfile.TemporaryDirectory(prefix="duckdb_spill_")
    con.execute(f"SET temp_directory='{spill.name}'")
    con.execute("SET preserve_insertion_order=false")
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    n_views = 0
    for t in tables:
        # driver testdata ships single-file parquet; Spark-written dirs
        # (e.g. a ScaleShard output) need the part-file glob, and a shard
        # dir legitimately lacks the tables its queries never touch
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            # a notice, not an error: a shard dir legitimately lacks tables
            # its queries never touch, but a PARTIAL shard write should be
            # distinguishable from that at a glance, not via 380 per-query
            # 'table not found' failures
            print(f"note: no {t} parquet under {sfdir} — view skipped")
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        n_views += 1
    if n_views == 0:
        # a shard dir may lack SOME tables, but zero tables means a typo'd
        # sfdir — fail fast with one clear error, not 380 per-query ones
        print(f"FATAL: no table parquet found under {sfdir}")
        sys.exit(2)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        try:
            # Read engine output via pyarrow/pandas (NOT DuckDB): the driver
            # does the same, so decimal columns stay Decimal objects and a
            # decimal-vs-double mismatch against the oracle is caught here.
            parts = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            if not parts:
                print(f"FAIL {name}: no parquet parts found in {outdir}/{name}")
                fail += 1
                continue
            got = pd.concat([pd.read_parquet(p) for p in parts],
                            ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: engine output missing: {e}")
            fail += 1
            continue
        exp_c, got_c = canon(exp), canon(got)
        if list(exp_c.columns) != list(got_c.columns):
            print(f"FAIL {name}: schema exp={list(exp_c.columns)} got={list(got_c.columns)}")
            fail += 1
            continue
        if len(exp_c) != len(got_c):
            print(f"FAIL {name}: rows exp={len(exp_c)} got={len(got_c)}")
            fail += 1
            continue
        if h(exp_c) != h(got_c):
            diff = (exp_c != got_c) & ~(exp_c.isna() & got_c.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: hash mismatch ({bad.sum()} rows differ)")
            with pd.option_context("display.width", 200):
                print("  exp:", exp_c[bad].head(3).to_dict("records"))
                print("  got:", got_c[bad].head(3).to_dict("records"))
            fail += 1
            continue
        print(f"ok   {name} ({len(exp_c)} rows)")
        ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
