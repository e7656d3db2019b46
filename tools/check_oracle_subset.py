#!/usr/bin/env python3
"""Targeted mirror of check_oracle.py: compare only the named queries
(builder-side re-gate loop — the full sf0.1 DuckDB pass costs ~75 min,
a subset runs in seconds-to-minutes).

Thin wrapper over check_oracle.compare_one — the SAME guards
(type-skew, hash-unsafe decimals, vacuous-gate warning) apply, so a
subset MATCH means what a full-gate MATCH means. Exits nonzero on any
non-MATCH.

Usage: python3 tools/check_oracle_subset.py <sfdir> <verify_out_dir> <name,name,...>
"""
import sys, os, json

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check_oracle


def main(sfdir, outdir, names):
    con = check_oracle.connect(sfdir)  # shared engine config (memory_limit lives in connect)
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_match = 0
    for name in names:
        r = check_oracle.compare_one(con, outdir, name, oracles[name])
        ok = r["status"] == "MATCH"
        n_match += ok
        print(f"{name}: {r['status']}"
              + (f" rows {r['rows']}" if "rows" in r else "")
              + (f" [{r['warn']}]" if r.get("warn") else ""))
        if not ok:
            print("  " + json.dumps(r, default=str)[:500])
    print(f"{n_match}/{len(names)} MATCH")
    return 0 if n_match == len(names) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3].split(",")))
