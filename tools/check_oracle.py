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

def _cgroup_limit_paths():
    """Candidate cgroup memory-limit files for THIS process: its own
    cgroup (from /proc/self/cgroup) and every ancestor up to the mount
    root, then the roots themselves. In a nested/delegated cgroup (a
    systemd slice, say) the limit lives on the slice path, not the root
    — reading only the root silently falls back to host RAM, the exact
    OOM-kill scenario the limit exists to prevent (r14 ADVICE)."""
    paths = []
    try:
        for line in open("/proc/self/cgroup"):
            # v2: "0::/path"; v1: "N:controller,...:/path"
            parts = line.strip().split(":", 2)
            if len(parts) != 3:
                continue
            rel = parts[2].lstrip("/")
            if parts[0] == "0":  # v2 unified hierarchy
                base, fname = "/sys/fs/cgroup", "memory.max"
            elif "memory" in parts[1].split(","):
                base, fname = "/sys/fs/cgroup/memory", "memory.limit_in_bytes"
            else:
                continue
            node = os.path.join(base, rel) if rel else base
            while len(node) >= len(base):
                paths.append(os.path.join(node, fname))
                if node == base:
                    break
                node = os.path.dirname(node)
    except OSError:
        pass
    # roots last — also the fallback when /proc/self/cgroup was unreadable
    paths.append("/sys/fs/cgroup/memory.max")
    paths.append("/sys/fs/cgroup/memory/memory.limit_in_bytes")
    return paths

def _mem_limit_mb():
    """80% of AVAILABLE memory: min(physical RAM, tightest cgroup limit
    on the process's own cgroup path). A bare SC_PHYS_PAGES reads the
    HOST's RAM inside a memory-limited container and would let DuckDB
    grow until the kernel OOM-kills the gate instead of spilling; MB
    granularity keeps small hosts honest (no GB floor that overcommits
    a 4GB box)."""
    avail = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    for p in _cgroup_limit_paths():
        try:
            v = open(p).read().strip()
            if v.isdigit():  # "max" / "-1" mean unlimited at that node
                avail = min(avail, int(v))
        except OSError:
            pass
    return max(256, int(avail / 2**20 * 0.8))


def connect(sfdir):
    """DuckDB connection with the harness tables mounted as views.

    The memory limit lives HERE so every entry point (full gate and
    check_oracle_subset.py's re-gate loop) runs the same engine config —
    a heavy graph/ER oracle must not pass the subset loop under a limit
    the full gate doesn't grant. The limit derives from the HOST (80% of
    physical RAM, DuckDB's own default fraction) rather than a fixed
    constant: a fixed 24GB would silently SHRINK the full gate's
    envelope on a big host and overcommit a small one."""
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{_mem_limit_mb()}MB'")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def compare_one(con, outdir, name, sql):
    """Full per-query gate (the ONE definition — check_oracle_subset.py
    imports this, so the two tools cannot drift): read the Verify dump,
    run the oracle, and apply every guard the driver's hasher implies."""
    spark_dir = os.path.join(outdir, name)
    try:
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        sp = con.sql(f"SELECT * FROM read_parquet({files!r})")
        spark_cols, spark_rows = [d[0] for d in sp.description], sp.fetchall()
    except Exception as e:
        return {"status": "SPARK_READ_FAIL", "err": str(e)[:200]}
    try:
        du = con.sql(sql)
        duck_cols, duck_rows = [d[0] for d in du.description], du.fetchall()
    except Exception as e:
        return {"status": "ORACLE_FAIL", "err": str(e)[:300]}
    n_rows = (len(spark_rows), len(duck_rows))
    if sorted(spark_cols) != sorted(duck_cols):
        return {"status": "SCHEMA_MISMATCH",
                "spark": sorted(spark_cols), "duck": sorted(duck_cols)}
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
        return {"status": "TYPE_MISMATCH",
                "diffs": {c: f"spark={a} duck={b}"
                          for c, (a, b) in type_diffs.items()}}
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
        return {"status": "HASH_UNSAFE_TYPE",
                "cols": unsafe,
                "hint": "cast DECIMAL(p>18) to BIGINT/DOUBLE in the output projection"}
    a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
    if a == b:
        result = {"status": "MATCH", "rows": len(a)}
        if len(a) == 0:
            # a 0-row result matches trivially on both engines — the
            # gate proves nothing (q131 shipped a whole round on an
            # empty 1994 date window this way, r13); surface it
            result["warn"] = "EMPTY_RESULT: gate is vacuous"
        return result
    # first diffs: pairwise where both sides have rows, plus rows only on
    # one side (a prefix-equal length mismatch would otherwise print
    # MISMATCH with no pointer at all)
    diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
    diffs = [f"spark={x} duck={y}" for x, y in diff]
    if not diffs:
        sa, sb = set(a), set(b)
        only_a = sorted(sa - sb, key=str)[:3]
        only_b = sorted(sb - sa, key=str)[:3]
        diffs = ([f"spark-only={x}" for x in only_a] +
                 [f"duck-only={y}" for y in only_b])
    return {"status": "VALUE_MISMATCH", "rows": n_rows, "first_diffs": diffs}

def main(sfdir, outdir):
    con = connect(sfdir)
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {name: compare_one(con, outdir, name, sql)
               for name, sql in sorted(oracles.items())}
    ok = sum(1 for r in results.values() if r["status"] == "MATCH")
    empty = [k for k, r in results.items() if r.get("warn")]
    if empty:
        print(f"WARN vacuous (0-row) gates: {', '.join(empty)}")
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{ok}/{len(results)} MATCH")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
