#!/usr/bin/env python3
"""Local replay of the driver's t2 correctness gate (test tooling only).

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet dump (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sf_dir tables,
then compares: columns sorted by name, rows sorted, values hashed exactly
(floats must match bit-for-bit after the engine-side rounding).
"""
import json, math, sys
from pathlib import Path

import duckdb


def canon(rows, cols):
    """Column-name-sorted, row-sorted canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), \
        [cols[i] for i in order]


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_match = n_mismatch = n_noracle = 0
    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        got_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        got_rows, got_cols = got_rel.fetchall(), [d[0] for d in got_rel.description]
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got_rows)} rows")
            continue
        try:
            rel = con.sql(oracle[name])
            want_rows, want_cols = rel.fetchall(), [d[0] for d in rel.description]
        except Exception as e:
            n_mismatch += 1
            print(f"✗ {name}: oracle SQL failed: {e}")
            continue
        g, gc = canon(got_rows, got_cols)
        w, wc = canon(want_rows, want_cols)
        if gc != wc:
            n_mismatch += 1
            print(f"✗ {name}: column mismatch spark={gc} duckdb={wc}")
            continue
        if g == w:
            n_match += 1
            print(f"✓ {name}: MATCH ({len(g)} rows)")
            continue
        n_mismatch += 1
        print(f"✗ {name}: VALUE MISMATCH (spark {len(g)} rows, duckdb {len(w)} rows, cols {gc})")
        shown = 0
        for i in range(max(len(g), len(w))):
            a = g[i] if i < len(g) else None
            b = w[i] if i < len(w) else None
            if a != b:
                print(f"    spark : {a}")
                print(f"    duckdb: {b}")
                shown += 1
                if shown >= 3:
                    break
    print(f"\n{n_match} match, {n_mismatch} mismatch, {n_noracle} rows-only")
    sys.exit(1 if n_mismatch else 0)


if __name__ == "__main__":
    main()
