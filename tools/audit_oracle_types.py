"""Audit oracle_sql() result column types in DuckDB.

The driver's correctness gate hashes Spark and DuckDB values after a
pandas round-trip; DuckDB HUGEINT (int128, from sum() over integers)
and DECIMAL (from decimal-literal arithmetic) do not round-trip the
same way Spark's BIGINT/DOUBLE do, so any oracle output column with
one of those types is a representation-level hash-fail waiting to
happen (see VERDICT.md round 1: batch_stats_rollup,
conciliation_export). This tool flags them without running Spark.

Usage: python tools/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

OK_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
            "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE"}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    flagged = []
    for name, sql in E.oracle_sql().items():
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            types = [str(t).upper() for t in rel.types]
        except Exception as ex:
            print(f"ERR  {name}: {ex}")
            flagged.append(name)
            continue
        bad = [(c, t) for c, t in zip(rel.columns, types)
               if t not in OK_TYPES and not t.endswith("[]")]
        if bad:
            print(f"FLAG {name}: {bad}")
            flagged.append(name)
    print(f"\n{len(flagged)} flagged of {len(E.oracle_sql())}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
