#!/usr/bin/env python3
"""Oracle result-type lint (round-6 verdict item #2).

The driver's correctness gate hashes oracle results TYPED: a DuckDB
result column typed HUGEINT (what sum(BIGINT) yields) or DECIMAL
canonicalizes differently from Spark's BIGINT/DOUBLE even when every
value is identical — exactly how q86_rebalance_upsample failed round 5
while check.py (value-level) passed it. This lint types every oracle
query against the sf tables WITHOUT executing it (lazy relation) and
fails if any RESULT column is HUGEINT/UHUGEINT/DECIMAL, i.e. if an
oracle dropped a CAST that a sibling oracle carries.

Usage: python3 tools/oracle_type_lint.py [sfDir] [oracle_sql.json]
  oracle_sql.json defaults to stdin if not given a path; Verify dumps
  one at <outDir>/oracle_sql.json, and OracleTypeLintSpec feeds one
  straight from SparkEntry.oracleSql.
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    oracle = (json.load(open(sys.argv[2])) if len(sys.argv) > 2
              else json.load(sys.stdin))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    nfail = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)  # lazy: binds + types, does not execute
        except Exception as e:
            print(f"FAIL {name}: oracle does not bind: {e}")
            nfail += 1
            continue
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if any(b in str(t).upper() for b in BANNED)]
        if bad:
            print(f"FAIL {name}: driver-hash-divergent column types {bad} "
                  f"(add CAST(... AS BIGINT/DOUBLE) in the oracle SQL)")
            nfail += 1
        else:
            print(f"PASS {name}")
    print(f"== type lint: {len(oracle) - nfail} pass / {nfail} fail ==")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
