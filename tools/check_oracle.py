"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from dtype_audit import classify, norm_duck, norm_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr; collapse -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(rows: list[tuple], cols: list[str]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), sorted(cols), h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from pg_auto_dw_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    names = args.names or list(qmap)
    failures = 0
    for name in names:
        fn = qmap[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in omap:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        try:
            res = con.execute(omap[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sn, sc, sh = frame_fingerprint(srows, scols)
        on, oc, oh = frame_fingerprint(orows, ocols)
        # Type-class gate (r8 VERDICT directive 2): the local str()-level
        # canonicalization is blind to integer width, but the driver's
        # typed/Arrow-buffer hash is not (int128 != int64 even when every
        # value is equal — text_word_entropy, 3 rounds red). Compare the
        # engines' declared output types and fail on hard-error diffs.
        dtype_errs = []
        try:
            sdt = {k: norm_spark(v) for k, v in sdf.dtypes}
            ddt = {
                r[0]: norm_duck(r[1])
                for r in con.execute(f"DESCRIBE {omap[name]}").fetchall()
            }
            for c in sorted(set(sdt) | set(ddt)):
                if classify(sdt.get(c), ddt.get(c)) == "error":
                    dtype_errs.append(f"{c}: spark={sdt.get(c)} duckdb={ddt.get(c)}")
        except Exception as e:  # DESCRIBE can fail on exotic SQL; don't mask values
            print(f"      (dtype check skipped: {e})")
        status = "OK  " if (sn, sc, sh) == (on, oc, oh) and not dtype_errs else "FAIL"
        if dtype_errs:
            for d in dtype_errs:
                print(f"DTYPE {name}.{d}")
        if status == "FAIL":
            failures += 1
            print(f"{status}  {name}: rows {sn}/{on} cols {sc}/{oc} hash {'=' if sh==oh else '!='}")
            if sn == on and sc == oc:
                # dump first differing line for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x01".join(canon_cell(r[i]) for i in order_s) for r in srows)
                lo = sorted("\x01".join(canon_cell(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"      spark:  {a[:300]}")
                        print(f"      duckdb: {b[:300]}")
                        break
        else:
            print(f"{status}  {name}: {sn} rows [{t_spark:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
