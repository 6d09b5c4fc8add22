"""Cross-engine output-dtype audit.

For every oracle-gated query, compare the Spark result schema against
DuckDB's DESCRIBE of the oracle SQL.

Severity model (r8 VERDICT What's-wrong #2): the driver's comparator has
empirically tolerated <=64-bit width differences (int32 vs int64 rows have
passed driver hashing for rounds) but NOT 128-bit values — the only
hash-mismatch whose cause was ever a dtype was ``text_word_entropy``'s
HUGEINT (int128) column. So:

- **ERROR** (exit 1): any int128 / uint128 / decimal128-class output, or a
  type-class mismatch (numeric vs string vs temporal) the normalization
  can't reconcile.
- **WARN** (exit 0): width-only diffs within 64 bits (int32 vs int64,
  float32 vs float64). Fix when convenient; the driver tolerates them.

A clean hard-error run over all registered oracles is a mandatory
pre-registration gate (rotation checklist, queries_catalog.py).

Usage: python tools/dtype_audit.py [name ...]   (exits 1 on any ERROR)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DUCK_NORM = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "UHUGEINT": "uint128",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamptz",
    "TIME": "time",
    "BLOB": "binary",
    "JSON": "str",  # both engines emit JSON as text
}
SPARK_NORM = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}

# element-type normalization inside array<...> / LIST(...)
_DUCK_LIST = re.compile(r"^(.*)\[\]$")
_SPARK_ARRAY = re.compile(r"^array<(.*)>$")

# width-ladder per type class; a diff within one ladder and <=64 bits is a
# warning, not an error.
_WIDTH_CLASS = {
    "int8": ("int", 8),
    "int16": ("int", 16),
    "int32": ("int", 32),
    "int64": ("int", 64),
    "int128": ("int", 128),
    "uint8": ("uint", 8),
    "uint16": ("uint", 16),
    "uint32": ("uint", 32),
    "uint64": ("uint", 64),
    "uint128": ("uint", 128),
    "float32": ("float", 32),
    "float64": ("float", 64),
}

_DECIMAL = re.compile(r"^decimal\((\d+)\s*,\s*(\d+)\)$", re.IGNORECASE)


def norm_duck(t: str) -> str:
    t = t.strip()
    m = _DUCK_LIST.match(t)
    if m:
        return f"list<{norm_duck(m.group(1))}>"
    m = _DECIMAL.match(t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return DUCK_NORM.get(t.upper(), t)


def norm_spark(t: str) -> str:
    t = t.strip()
    m = _SPARK_ARRAY.match(t)
    if m:
        return f"list<{norm_spark(m.group(1))}>"
    m = _DECIMAL.match(t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return SPARK_NORM.get(t.lower(), t)


def _is_128(norm: str) -> bool:
    if norm in ("int128", "uint128"):
        return True
    m = _DECIMAL.match(norm)
    # DuckDB stores DECIMAL(p>18) as int128 buffers
    return bool(m and int(m.group(1)) > 18)


def classify(spark_t: str | None, duck_t: str | None) -> str:
    """'ok' | 'warn' | 'error' for one column's (spark, duck) pair."""
    if spark_t == duck_t:
        return "ok"
    if spark_t is None or duck_t is None:
        return "error"  # column present on one side only
    if _is_128(spark_t) or _is_128(duck_t):
        return "error"
    ws, wd = _WIDTH_CLASS.get(spark_t), _WIDTH_CLASS.get(duck_t)
    if ws and wd and ws[0] == wd[0] and max(ws[1], wd[1]) <= 64:
        return "warn"
    # int-vs-float of <=64 bits: values can still hash apart; treat as warn
    # only for the empirically-tolerated int/float pairing, error otherwise.
    if ws and wd and max(ws[1], wd[1]) <= 64:
        return "warn"
    return "error"


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    import __spark_entry__ as entrymod
    from pg_auto_dw_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    errors = warns = 0
    for name, sql in osql.items():
        if only and name not in only:
            continue
        sdt = {k: norm_spark(v) for k, v in qs[name](spark, sf).dtypes}
        ddt = {r[0]: norm_duck(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        for c in sorted(set(sdt) | set(ddt)):
            sev = classify(sdt.get(c), ddt.get(c))
            if sev == "error":
                errors += 1
                print(f"ERROR {name}.{c}: spark={sdt.get(c)} duckdb={ddt.get(c)}")
            elif sev == "warn":
                warns += 1
                print(f"WARN  {name}.{c}: spark={sdt.get(c)} duckdb={ddt.get(c)}")
    print(f"\n{errors} hard errors, {warns} width warnings")
    spark.stop()
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
