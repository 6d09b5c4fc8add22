"""Cross-engine output-dtype audit.

For every oracle-gated query, compare the Spark result schema against
DuckDB's DESCRIBE of the oracle SQL. Widths must match exactly
(int32 vs int64, VARCHAR vs JSON, ...): if the driver's comparator
hashes arrow buffers or checks dtypes, a width mismatch fails even
when every value is equal.

Usage: python tools/dtype_audit.py   (exits 1 on any difference)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DUCK_NORM = {
    "INTEGER": "int32",
    "BIGINT": "int64",
    "DOUBLE": "float64",
    "VARCHAR": "str",
    "FLOAT": "float32",
    "SMALLINT": "int16",
    "HUGEINT": "int128",
}
SPARK_NORM = {
    "int": "int32",
    "bigint": "int64",
    "double": "float64",
    "string": "str",
    "float": "float32",
    "smallint": "int16",
}


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    import __spark_entry__ as entrymod
    from pg_auto_dw_spark.session import get_spark

    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = 0
    for name, sql in osql.items():
        sdt = {k: SPARK_NORM.get(v, v) for k, v in qs[name](spark, sf).dtypes}
        ddt = {r[0]: DUCK_NORM.get(r[1], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        diffs = {
            c: (sdt.get(c), ddt.get(c)) for c in set(sdt) | set(ddt) if sdt.get(c) != ddt.get(c)
        }
        if diffs:
            bad += 1
            print(f"DIFF {name}: {diffs}")
    print("no dtype differences" if not bad else f"{bad} queries with dtype differences")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
