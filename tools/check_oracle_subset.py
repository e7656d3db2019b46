#!/usr/bin/env python3
"""Targeted mirror of check_oracle.py: compare only the named queries
(builder-side re-gate loop — the full sf0.1 DuckDB pass costs ~75 min,
a subset runs in seconds-to-minutes).

Usage: python3 tools/check_oracle_subset.py <sfdir> <verify_out_dir> <name,name,...>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    return f"{v:.12g}" if isinstance(v, float) else v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(norm(r[i]) for i in order) for r in rows],
                  key=lambda t: tuple(str(x) for x in t))

def main(sfdir, outdir, names):
    con = duckdb.connect()
    con.sql("SET memory_limit='24GB'")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_match = 0
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        sp = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols, srows = [d[0] for d in sp.description], sp.fetchall()
        du = con.sql(oracles[name])
        dcols, drows = [d[0] for d in du.description], du.fetchall()
        ok_schema = sorted(scols) == sorted(dcols)
        a, b = canon(srows, scols), canon(drows, dcols)
        ok = ok_schema and a == b
        n_match += ok
        print(f"{name}: rows {len(srows)}/{len(drows)} schema {ok_schema} "
              f"values {'MATCH' if a == b else 'MISMATCH'}")
        if not ok:
            for x, y in zip(a, b):
                if x != y:
                    print(f"  first diff: {x} vs {y}")
                    break
    print(f"{n_match}/{len(names)} MATCH")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3].split(","))
