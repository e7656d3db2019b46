#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and compare.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>

NOT part of the library (driver-side python only); this is the builder's
local feedback loop, mirroring CORRECTNESS_r{N}.json.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        # compare floats at 12 significant digits to tolerate last-ulp noise
        return f"{v:.12g}"
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(outdir, name)
        status = {}
        try:
            files = glob.glob(os.path.join(spark_dir, "*.parquet"))
            sp = con.sql(f"SELECT * FROM read_parquet({files!r})")
            spark_cols, spark_rows = [d[0] for d in sp.description], sp.fetchall()
        except Exception as e:
            results[name] = {"status": "SPARK_READ_FAIL", "err": str(e)[:200]}
            continue
        try:
            du = con.sql(sql)
            duck_cols, duck_rows = [d[0] for d in du.description], du.fetchall()
        except Exception as e:
            results[name] = {"status": "ORACLE_FAIL", "err": str(e)[:300]}
            continue
        status["rows"] = (len(spark_rows), len(duck_rows))
        if sorted(spark_cols) != sorted(duck_cols):
            results[name] = {"status": "SCHEMA_MISMATCH",
                             "spark": sorted(spark_cols), "duck": sorted(duck_cols)}
            continue
        # r5 verdict #2/#3: the driver's hasher serializes by DuckDB type, so a
        # HUGEINT oracle column (un-cast sum(BIGINT)) hash-fails even when every
        # value matches — and Python fetchall() collapses it to int, hiding the
        # failure from this script's value compare. Mechanically exclude the
        # class: the oracle's column types must equal the Spark parquet types
        # up to machine-integer width (INTEGER vs BIGINT is hasher-benign —
        # five r5 queries pass the driver with exactly that skew — but
        # HUGEINT/DECIMAL/float-width skews are not in the benign class).
        def norm_type(t):
            return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
        spark_types = dict(zip(spark_cols, [norm_type(str(t)) for t in sp.types]))
        duck_types = dict(zip(duck_cols, [norm_type(str(t)) for t in du.types]))
        type_diffs = {c: (spark_types[c], duck_types[c])
                      for c in spark_cols if spark_types[c] != duck_types[c]}
        if type_diffs:
            results[name] = {"status": "TYPE_MISMATCH",
                             "diffs": {c: f"spark={a} duck={b}"
                                       for c, (a, b) in type_diffs.items()}}
            continue
        # r10 verdict #1: a >18-digit DECIMAL output column is hash-unsafe
        # even when BOTH sides declare it (DECIMAL(38,0) serializes
        # differently across the driver hasher's two read paths, so the
        # r5 guard above — which only compares spark vs duck — missed it).
        # Reject the TYPE itself: wide decimals are fine as internal math
        # but must be cast to BIGINT/DOUBLE before the output projection.
        def wide_decimal(t):
            t = str(t)
            if not t.startswith("DECIMAL"):
                return False
            try:
                prec = int(t.split("(")[1].split(",")[0])
            except (IndexError, ValueError):
                return True  # un-parenthesized DECIMAL: assume max precision
            return prec > 18
        unsafe = sorted({c for c, t in list(zip(spark_cols, sp.types)) +
                         list(zip(duck_cols, du.types)) if wide_decimal(t)})
        if unsafe:
            results[name] = {"status": "HASH_UNSAFE_TYPE",
                             "cols": unsafe,
                             "hint": "cast DECIMAL(p>18) to BIGINT/DOUBLE in the output projection"}
            continue
        a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if a == b:
            results[name] = {"status": "MATCH", "rows": len(a)}
            if len(a) == 0:
                # a 0-row result matches trivially on both engines — the
                # gate proves nothing (q131 shipped a whole round on an
                # empty 1994 date window this way, r13); surface it
                results[name]["warn"] = "EMPTY_RESULT: gate is vacuous"
        else:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            results[name] = {"status": "VALUE_MISMATCH", "rows": status["rows"],
                             "first_diffs": [f"spark={x} duck={y}" for x, y in diff]}
    ok = sum(1 for r in results.values() if r["status"] == "MATCH")
    empty = [k for k, r in results.items() if r.get("warn")]
    if empty:
        print(f"WARN vacuous (0-row) gates: {', '.join(empty)}")
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{ok}/{len(results)} MATCH")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
