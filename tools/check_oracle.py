#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare exactly (columns sorted by name,
rows sorted by all columns). Usage:
    python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]
"""
import json, sys, glob, os
import duckdb

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # ORACLE_RECONNECT=1: fresh DuckDB connection per query (large-sf local
    # sweeps accumulate allocator state and OOM ~3/4 through the alphabet;
    # the driver's own gate at sf0.01 doesn't need this). ORACLE_MEM caps
    # the allocator (e.g. "48GB").
    reconnect = os.environ.get("ORACLE_RECONNECT") == "1"
    mem = os.environ.get("ORACLE_MEM")
    def connect():
        c = duckdb.connect()
        if mem:
            c.execute(f"SET memory_limit='{mem}'")
        for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        return c
    con = connect()
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        # reconnect only for queries that will actually run (ADVICE r14:
        # reconnecting before the files check paid a full close/connect/
        # view-registration cycle for queries with no output)
        if reconnect:
            con.close(); con = connect()
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {type(e).__name__}: {str(e)[:300]}"); n_bad += 1; continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}"); n_bad += 1; continue
        if len(s) != len(d):
            print(f"ROWCOUNT {name}: spark={len(s)} duck={len(d)}"); n_bad += 1; continue
        try:
            import pandas as pd
            eq = s.equals(d)
            if not eq:
                # find first differing cell for diagnostics
                diffs = []
                for c in s.columns:
                    neq = ~(s[c].eq(d[c]) | (s[c].isna() & d[c].isna()))
                    if neq.any():
                        i = neq.idxmax()
                        diffs.append(f"{c}[{i}]: spark={s[c][i]!r} duck={d[c][i]!r}")
                        if len(diffs) >= 3: break
                print(f"VALUES   {name}: rows={len(s)} " + "; ".join(diffs)); n_bad += 1; continue
        except Exception as e:
            print(f"CMPERR   {name}: {e}"); n_bad += 1; continue
        print(f"OK       {name} ({len(s)} rows)"); n_ok += 1
    con.close()
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
