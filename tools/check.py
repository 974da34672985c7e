#!/usr/bin/env python3
"""Local stand-in for the driver's duckdb-oracle gate (t2).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB over the same tables, canonicalizes both
results (columns sorted by name, rows sorted, floats rounded), and reports
match/mismatch per query. Tooling only — the shipped Scala library never
depends on this.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = n_rows_only = 0
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_bad += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        gcols = [c[0] for c in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"rows  {name}: {len(grows)} rows (rows-only check)")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [c[0] for c in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_bad += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL  {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            n_bad += 1; continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        if g == e:
            print(f"ok    {name}: {len(g)} rows"); n_ok += 1
        else:
            print(f"FAIL  {name}: {len(g)} vs {len(e)} rows; first diffs:")
            diff = [(a, b) for a, b in zip(g, e) if a != b]
            for a, b in diff[:3]:
                print(f"        spark: {a}\n        duck : {b}")
            if len(g) != len(e):
                sg, se = set(g), set(e)
                for x in list(sg - se)[:2]: print(f"        only-spark: {x}")
                for x in list(se - sg)[:2]: print(f"        only-duck : {x}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} FAIL, {n_rows_only} rows-only ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
