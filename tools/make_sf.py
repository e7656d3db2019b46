#!/usr/bin/env python3
"""Builder-side scale-factor inflator (driver-side python tooling, like
check_oracle.py — NOT part of the library): replicate the sf0.1 tables
FACTOR-fold with FK-consistent key shifts into an output dir, so the
bench hotspots can be profiled at a real row-count jump (the r11
verdict's standing sf0.3 suggestion — the in-memory inflated-docs
ScaleProbes cover the dedup/ER/graph operators but not the relational
plans reading many tables).

Shift discipline: entity keys (orderkey/partkey/suppkey/custkey/doc_id/
vec_id/event_id/user_id) shift by replica*SHIFT so every FK join stays
WITHIN its replica (replicas are disconnected copies); dimension keys
(nation/region) do NOT shift and the dims are not replicated — facts of
every replica share them, exactly how a real scale-up grows facts
against stable dims. Document text gets a replica token prefix (the
ScaleProbe device) so shingle/fingerprint families don't collapse to
cross-replica exact duplicates; n_chars is kept consistent with the
prefix.
"""
import os
import sys

import duckdb

SHIFT = 100000000

# table -> columns to shift per replica (r * SHIFT added)
PLAN = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, shifts in PLAN.items():
        path = os.path.join(src, f"{table}.parquet")
        out = os.path.join(dst, f"{table}.parquet")
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()]
        # r12 advice: sel is built by intersecting PLAN with the actual
        # schema implicitly, so a typo'd/drifted shift column silently
        # emitted replicas with UNSHIFTED keys (FK-inconsistent data, no
        # error). Fail loudly instead.
        missing = set(shifts) - set(cols)
        assert not missing, (
            f"{table}: PLAN shift columns {sorted(missing)} not in schema {cols}")
        if shifts:
            # Refuse to inflate an already-inflated dir: base keys at or
            # above SHIFT would alias across replicas (replica r of key k
            # collides with replica r+1 of key k-SHIFT), silently merging
            # the 'disconnected copies'.
            maxes = con.execute(
                "SELECT " + ", ".join(f"max({c})" for c in shifts) +
                f" FROM read_parquet('{path}')").fetchone()
            for c, m in zip(shifts, maxes):
                # an empty table cannot alias anything — but it is not a
                # valid inflation source either; say which problem it is
                assert m is not None, f"{table}.{c}: source table is empty"
                assert m < SHIFT, (
                    f"{table}.{c}: max key {m} >= SHIFT {SHIFT} — source dir "
                    f"looks already inflated; refusing to alias replicas")
        if not shifts:
            # dims: single copy, unshifted
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{path}')) TO '{out}' (FORMAT PARQUET)")
            continue
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"{c} + r * {SHIFT} AS {c}")
            elif table == "documents" and c == "text":
                sel.append("CASE WHEN r = 0 THEN text ELSE 'r' || r || ' ' || text END AS text")
            elif table == "documents" and c == "n_chars":
                # prefix is 'r' || r || ' ': 2 + digits(r) chars, not a
                # constant 3 — at factor > 10 replicas r >= 10 get a
                # 4-char prefix and a hardcoded +3 would desync n_chars
                # from length(text)
                sel.append(
                    "CASE WHEN r = 0 THEN n_chars"
                    " ELSE n_chars + 2 + length(r::VARCHAR) END AS n_chars")
            elif table == "embeddings" and c == "embedding":
                # perturb the first component per replica: unperturbed
                # clones would make every vector's nearest neighbor a
                # 0-distance copy of itself, so ANN/semantic-dedup
                # hotspots would profile pathological duplicate mass
                # instead of a scale-up (the text-prefix device, for the
                # vector column)
                sel.append(
                    "CASE WHEN r = 0 THEN embedding ELSE"
                    " list_concat([CAST(embedding[1] + r * 0.01 AS FLOAT)],"
                    " embedding[2:]) END AS embedding")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM read_parquet('{path}'), "
            f"range({factor}) t(r)) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf0.3"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    main(src, dst, factor)
