#!/usr/bin/env python3
"""Local DuckDB oracle for the partsupp spec-only twins (test tooling only).

Usage: python3 scripts/check_partsupp.py <dump_dir> <sf_dir>

The driver testdata has no partsupp table, so ps1_min_cost_full /
ps2_excess_stock_full never got a driver oracle row; the scale fixtures
(scripts/make_scale.py) do carry one, so this script lifts both to the same
evidence standard: run `Test/runMain graft.DumpPartsupp` against the fixture,
then replay the equivalent ANSI SQL in DuckDB over the same parquet tables
and compare exactly the way the driver's gate does (column-name-sorted,
row-sorted, REPRESENTATION-sensitive cells — see check_oracle.py).
"""
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).parent))
from check_oracle import canon  # the one canonical-form definition

ORACLE = {
    # TPC-H Q2 full form (fixture-adapted): min-cost supplier per wanted
    # part in EUROPE, ties kept, cost as exact micros
    "ps1_min_cost_full": """
        WITH regsup AS (SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
          wanted AS (SELECT p_partkey, p_type FROM part
            WHERE p_size = 15 AND p_type LIKE '%O%'),
          offers AS (SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal,
              n_name,
              CAST(round(ps_supplycost * 1000000) AS BIGINT) AS cost_micros
            FROM partsupp JOIN wanted ON ps_partkey = p_partkey
            JOIN regsup ON ps_suppkey = s_suppkey)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost_micros
        FROM (SELECT *, min(cost_micros) OVER (PARTITION BY p_partkey) AS mn
          FROM offers) t
        WHERE cost_micros = mn
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""",
    # TPC-H Q20 full form (fixture-adapted): NATION_19 suppliers holding
    # excess stock of %a% parts vs half their 1995 shipped quantity.
    # Non-default params (DumpPartsupp carries the same ones): the scale
    # fixture's partsupp ps_suppkey stream is 10x wider than the supplier
    # dim, so the spec defaults select an empty — vacuous — excess set.
    "ps2_excess_stock_full": """
        WITH interesting AS (SELECT p_partkey FROM part
            WHERE p_name LIKE '%a%'),
          shipped AS (SELECT l_partkey, l_suppkey,
              CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                AS qty_units
            FROM lineitem JOIN interesting ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1996-01-01'
            GROUP BY 1, 2),
          excess AS (SELECT DISTINCT ps_suppkey FROM partsupp
            JOIN interesting ON ps_partkey = p_partkey
            JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
            WHERE CAST(ps_availqty AS BIGINT) * 2 > qty_units)
        SELECT s_suppkey, s_name FROM supplier
        JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_19'
        WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
        ORDER BY s_name""",
}


def main():
    dump_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "part", "lineitem", "partsupp"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    bad = 0
    for name, sql in ORACLE.items():
        got_df = pq.read_table(dump_dir / name).to_pandas()
        want_df = con.sql(sql).df()
        g, gc = canon(got_df)
        w, wc = canon(want_df)
        if gc != wc:
            bad += 1
            print(f"x {name}: column mismatch spark={gc} duckdb={wc}")
        elif g == w and len(g) > 0:
            print(f"+ {name}: MATCH ({len(g)} rows)")
        elif len(g) == 0:
            bad += 1
            print(f"x {name}: EMPTY result — predicate selects nothing, "
                  "the check proves nothing")
        else:
            bad += 1
            print(f"x {name}: MISMATCH (spark {len(g)} rows, duckdb {len(w)})")
            for i in range(max(len(g), len(w))):
                a = g[i] if i < len(g) else None
                b = w[i] if i < len(w) else None
                if a != b:
                    print(f"    spark : {a}\n    duckdb: {b}")
                    break
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
